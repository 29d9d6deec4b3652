"""Model wrapper: the user-facing handle around (architecture, config, params).

TPU-native analog of the reference's ``nam::DSP`` base class
(reference: NAM/dsp.h:70-231). Where the reference mutates per-instance ring
buffers inside ``process()``, here all runtime state is an explicit pytree the
caller threads through a jitted block-step function:

    model = load_model("model.nam")
    state = model.reset(batch=1024, max_buffer_size=64)   # allocate + prewarm
    y, state = model.process(x, state)                     # x: (B, T, Cin)

``reset`` == trace/compile + allocate + prewarm (the Reset()/prewarm()
semantics of NAM/dsp.cpp:67-140); after it, ``process`` is allocation-free and
retrace-free for fixed (B, T) — the TPU analog of the reference's real-time
safety contract (tools/test/allocation_tracking.cpp).
"""

from __future__ import annotations

import threading
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import ModelMetadata
from ..registry import ArchDef

# Default max buffer size used by prewarm when none has been set
# (reference: NAM/dsp.h:25-27).
DEFAULT_MAX_BUFFER_SIZE = 4096

# Thread-local prewarm-on-reset default (reference: thread_local
# gPrewarmOnResetDefault, NAM/dsp.cpp:20,44-53).
_tls = threading.local()


def _get_prewarm_default() -> bool:
    return getattr(_tls, "prewarm_on_reset_default", True)


class ScopedPrewarmOnResetDefault:
    """Temporarily change the thread-local prewarm-on-reset default for newly
    constructed models (reference: NAM/dsp.h:44-57)."""

    def __init__(self, prewarm_on_reset: bool):
        self._new = prewarm_on_reset
        self.previous_prewarm_on_reset = _get_prewarm_default()

    def __enter__(self):
        self.previous_prewarm_on_reset = _get_prewarm_default()
        _tls.prewarm_on_reset_default = self._new
        return self

    def __exit__(self, *exc):
        _tls.prewarm_on_reset_default = self.previous_prewarm_on_reset
        return False


class Model:
    """A loaded NAM model: static config + weight pytree + metadata."""

    def __init__(self, arch: ArchDef, config: Any, params: Any, metadata: ModelMetadata):
        self._arch = arch
        self.config = config
        self.params = params
        self.metadata = metadata
        self.prewarm_on_reset: bool = _get_prewarm_default()
        self._max_buffer_size: int = 0
        self._external_sample_rate: Optional[float] = None
        # jitted step: (params, state, x) -> (y, state'); config closed over as
        # a static; jax.jit caches per (B, T) shape.
        self._jitted_step = jax.jit(partial(arch.step, config), donate_argnums=(1,))

    # -- identity / metadata -------------------------------------------------

    @property
    def architecture(self) -> str:
        return self._arch.name

    @property
    def num_input_channels(self) -> int:
        return self._arch.in_channels(self.config)

    @property
    def num_output_channels(self) -> int:
        return self._arch.out_channels(self.config)

    @property
    def expected_sample_rate(self) -> float:
        return self.metadata.sample_rate

    @property
    def max_buffer_size(self) -> int:
        return self._max_buffer_size

    def has_loudness(self) -> bool:
        return self.metadata.loudness is not None

    def get_loudness(self) -> float:
        """(reference: DSP::GetLoudness, throws if unknown)"""
        if self.metadata.loudness is None:
            raise RuntimeError("Model doesn't know its loudness.")
        return self.metadata.loudness

    def has_input_level(self) -> bool:
        return self.metadata.input_level_dbu is not None

    def get_input_level(self) -> float:
        if self.metadata.input_level_dbu is None:
            raise RuntimeError("Model doesn't know its input level.")
        return self.metadata.input_level_dbu

    def has_output_level(self) -> bool:
        return self.metadata.output_level_dbu is not None

    def get_output_level(self) -> float:
        if self.metadata.output_level_dbu is None:
            raise RuntimeError("Model doesn't know its output level.")
        return self.metadata.output_level_dbu

    def set_loudness(self, loudness: float) -> None:
        """(reference: DSP::SetLoudness, NAM/dsp.h:185-189 — hosts may
        override/provide the calibration after load)"""
        self.metadata.loudness = float(loudness)

    def set_input_level(self, input_level_dbu: float) -> None:
        """(reference: DSP::SetInputLevel, NAM/dsp.h:181-183)"""
        self.metadata.input_level_dbu = float(input_level_dbu)

    def set_output_level(self, output_level_dbu: float) -> None:
        """(reference: DSP::SetOutputLevel, NAM/dsp.h:191-195)"""
        self.metadata.output_level_dbu = float(output_level_dbu)

    # -- state management ----------------------------------------------------

    def get_prewarm_samples(self) -> int:
        """(reference: DSP::GetPrewarmSamples overrides; see each arch)"""
        sr = self._external_sample_rate
        if sr is None:
            sr = self.expected_sample_rate
        return self._arch.prewarm_samples(self.config, sr)

    def init_state(self, batch: int = 1) -> Any:
        """Fresh zero state (no prewarm)."""
        return self._arch.init_state(self.config, self.params, batch)

    def prewarm(self, state: Any, max_buffer_size: Optional[int] = None) -> Any:
        """Settle initial conditions by processing zeros
        (reference: DSP::prewarm, NAM/dsp.cpp:67-101). Don't expect zero
        output afterwards — models may legitimately be 'noisy' at zero input
        (NAM/dsp.h:86-88)."""
        n = self.get_prewarm_samples()
        if n <= 0:
            return state
        block = max_buffer_size or self._max_buffer_size or DEFAULT_MAX_BUFFER_SIZE
        batch = jax.tree_util.tree_leaves(state)[0].shape[0]
        zeros = jnp.zeros((batch, block, self.num_input_channels), dtype=jnp.float32)
        remaining = n
        # Process exactly n zero samples, mirroring DSP::prewarm's loop
        # (NAM/dsp.cpp:95-100): full blocks, then one short remainder block.
        while remaining >= block:
            _, state = self._jitted_step(self.params, state, zeros)
            remaining -= block
        if remaining > 0:
            tail = jnp.zeros((batch, remaining, self.num_input_channels), dtype=jnp.float32)
            _, state = self._jitted_step(self.params, state, tail)
        return state

    def reset(
        self,
        batch: int = 1,
        sample_rate: Optional[float] = None,
        max_buffer_size: int = DEFAULT_MAX_BUFFER_SIZE,
    ) -> Any:
        """Allocate a fresh state and (by default) prewarm it
        (reference: DSP::Reset, NAM/dsp.cpp:130-140)."""
        if sample_rate is not None:
            self._external_sample_rate = float(sample_rate)
        self._max_buffer_size = int(max_buffer_size)
        state = self.init_state(batch)
        if self.prewarm_on_reset:
            state = self.prewarm(state, max_buffer_size)
        return state

    # -- processing ----------------------------------------------------------

    def step_fn(self):
        """The raw jitted step: (params, state, x[B,T,Cin]) -> (y, state')."""
        return self._jitted_step

    def process(self, x: Any, state: Any):
        """Process one block. x: (B, T, Cin) or (B, T) for mono; returns
        (y, state') with y matching x's channel convention.

        NOTE: ``state`` is CONSUMED (its buffers are donated to the step for
        in-place updates — the allocation-free contract). Always continue
        with the returned state; reusing a consumed state raises."""
        want64 = getattr(x, "dtype", None) == jnp.float64
        x = jnp.asarray(x, dtype=jnp.float32)
        squeeze = False
        if x.ndim == 2:
            x = x[..., None]
            squeeze = True
        y, state = self._jitted_step(self.params, state, x)
        if squeeze and y.shape[-1] == 1:
            y = y[..., 0]
        if want64:
            # NAM_SAMPLE=double I/O surface (reference: NAM/dsp.h:18-22):
            # float64 in -> float64 out. Internal math stays float32 on both
            # sides of the boundary here (docs/deviations.md #1); the output
            # cast is a real widen only under jax_enable_x64 (without it JAX
            # keeps float32, matching the reference's NAM_SAMPLE_FLOAT build).
            y = y.astype(jnp.float64)
        return y, state

    def render(self, x: Any, batch_is_leading: bool = True, prewarm: bool = True):
        """Offline full-sequence render: reset state, optionally prewarm, then
        process the whole signal in one traced call (block-size invariance
        guarantees equivalence with streaming; see tests).

        x: (T,), (B, T), or (B, T, C). Returns same rank. float64 input
        yields float64 output (the NAM_SAMPLE=double I/O surface; see
        ``process``).
        """
        want64 = getattr(x, "dtype", None) == jnp.float64
        x = jnp.asarray(x, dtype=jnp.float32)
        orig_ndim = x.ndim
        if x.ndim == 1:
            x = x[None, :, None]
        elif x.ndim == 2:
            x = x[..., None]
        batch = x.shape[0]
        state = self.init_state(batch)
        if prewarm and self.prewarm_on_reset:
            n = self.get_prewarm_samples()
            if n > 0:
                zeros = jnp.zeros((batch, n, self.num_input_channels), dtype=jnp.float32)
                _, state = self._jitted_step(self.params, state, zeros)
        y, _ = self._jitted_step(self.params, state, x)
        if want64:
            y = y.astype(jnp.float64)
        if orig_ndim == 1:
            return y[0, :, 0]
        if orig_ndim == 2:
            return y[..., 0]
        return y

    # -- introspection helpers ----------------------------------------------

    def num_params(self) -> int:
        return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(self.params))
