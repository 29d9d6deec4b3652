"""StreamEngine: the production serving path — fixed block size, ring states.

The reference pre-allocates everything for a fixed maxBufferSize at Reset
(reference: DSP::Reset + SetMaxBufferSize cascade, NAM/dsp.cpp:130-140,
NAM/wavenet/model.cpp:647-690) and then guarantees allocation-free process().
The engine is the TPU analog: block size T is fixed at construction, conv
states are chunked-FIFO rings with O(T) per-block HBM traffic (ops/ring.py),
and the step is compiled once — steady-state processing is retrace-free and
allocation-free.

    engine = StreamEngine(model, batch=4096, block_size=64)
    state = engine.reset()                    # zero state + exact prewarm
    y, state = engine.process(x, state)       # x: (batch, block_size[, C])

Semantics are identical to Model.process with the same block size (tested in
tests/test_engine.py); only the state layout and traffic differ.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .. import registry
from .base import Model


class StreamEngine:
    def __init__(self, model, batch: int, block_size: int, kernel: str = "auto"):
        # Meta-models (container/slimmable) resolve to their active model —
        # switching widths/submodels means building a new engine, matching
        # the reference's "distinct compiled executables per width" story.
        if hasattr(model, "active_model") and not isinstance(model, Model):
            model = model.active_model
        self.model = model
        self.batch = int(batch)
        self.block_size = int(block_size)
        arch = model._arch
        # Kernel tiers: "pallas" = the fused whole-stack kernel
        # (ops/pallas/stack.py, VMEM-resident layer pipeline); "xla" = the
        # per-op compiled step (models/wavenet.py engine_step). "auto" takes
        # pallas whenever the config qualifies and we're actually on TPU.
        if kernel not in ("auto", "pallas", "xla", "wavefront"):
            raise ValueError(f"kernel must be auto|pallas|xla|wavefront, got {kernel!r}")
        #: Blocks of extra output latency vs the generic step (nonzero only
        #: for the wavefront tier).
        self.pipeline_blocks = 0
        if kernel == "wavefront":
            # Opt-in XLA tier with block-diagonal cross-layer M-packing
            # (models/wavefront.py): trades ONE block of uniform output
            # latency for fuller MXU rows on the eligible (flagship-family)
            # configs. Never chosen by "auto" — its in-kernel analog
            # measured slower than the fused Pallas kernel on v5e
            # (ops/pallas/stack.py WAVEFRONT note); the tier exists for
            # hardware where the packing wins and as the measured design
            # the kernel experiment was ported from.
            from . import wavefront as _wf

            reason = _wf.wavefront_ineligible_reason(model.config)
            if reason is not None:
                raise ValueError(f"wavefront tier does not support this model: {reason}")
            groups = 8 if self.batch % 8 == 0 else 4 if self.batch % 4 == 0 else 1
            self._prepare_fn = lambda cfg, params, T, batch: _wf.wavefront_prepare(
                cfg, params, T, batch, groups
            )
            self._eparams, self._state0 = self._prepare_fn(
                model.config, model.params, self.block_size, self.batch
            )
            self._jitted_step = jax.jit(
                partial(_wf.wavefront_step, model.config, self.block_size, groups),
                donate_argnums=(1,),
            )
            self.kernel = "wavefront"
            self.pipeline_blocks = _wf.WavefrontEngine.pipeline_blocks
            return
        use_pallas = False
        if kernel != "xla":
            import jax as _jax

            from ..ops.pallas import backend_for

            _backend = backend_for(model.config)
            reason = _backend.supports(model.config, self.block_size, self.batch)
            # auto picks the measured-fastest tier. WaveNet condition chains
            # FUSE into the kernel (stack._fused_chain) — no pre-pass, so
            # auto takes pallas for them. Only non-fusable condition DSPs
            # still need the hybrid XLA-prepass + pallas-main program, which
            # measured ~4x SLOWER than the pure XLA step on the example
            # corpus (tools/diag: 736 vs 196 us/block at B=512) — the
            # pallas_call serializes against the pre-pass and the main nets
            # of such models are tiny. Explicit kernel="pallas" still takes
            # the fused path.
            needs_prepass = (
                reason is None
                and getattr(_backend, "cond_mode", lambda c, t: "none")(
                    model.config, self.block_size
                )
                == "prepass"
            )
            if reason is None and (
                kernel == "pallas"
                or (_jax.default_backend() == "tpu" and not needs_prepass)
            ):
                use_pallas = True
            elif kernel == "pallas":
                raise ValueError(f"pallas kernel does not support this model: {reason}")
        if use_pallas:
            prepare_fn, step_fn = _backend.prepare, _backend.step
            self.kernel = "pallas"
        else:
            prepare_fn, step_fn = registry.engine_fns(arch)
            self.kernel = "xla"
        self._prepare_fn = prepare_fn
        self._step_raw = step_fn  # unjitted; prewarm's remainder step reuses it
        # Engine params are layout-transformed once at construction
        # (transposed / tap-stacked weights for the CTB layout).
        self._eparams, self._state0 = prepare_fn(
            model.config, model.params, self.block_size, self.batch
        )
        self._jitted_step = jax.jit(
            partial(step_fn, model.config, self.block_size), donate_argnums=(1,)
        )

    @property
    def params(self):
        return self._eparams

    def init_state(self) -> Any:
        _, state = self._prepare_fn(
            self.model.config, self.model.params, self.block_size, self.batch
        )
        return state

    def prewarm(self, state: Any) -> Any:
        """Process the prewarm samples as zero blocks. For the feedforward
        architectures ceil(prewarm/T) blocks reach the exact zero-input
        fixed point, so the (< T) extra zero samples beyond the reference's
        exact count are idempotent (state is a function of the last rf
        inputs, all zero). RECURRENT architectures (LSTM) have no such fixed
        point within the prewarm horizon: extra zero steps keep moving
        (h, c), so the reference's exact count (NAM/lstm.cpp:127-134) is
        honored by running the `n mod T` remainder through a step jitted at
        the remainder block size — legal because a recurrent engine's
        eparams/state layouts are block-size independent."""
        n = self.model.get_prewarm_samples()
        if n <= 0 and self.pipeline_blocks == 0:
            return state
        cin = self.model.num_input_channels
        full, rem = divmod(max(n, 0), self.block_size)
        arch = registry.arch_for_config(self.model.config)
        if rem and not arch.recurrent:
            full, rem = full + 1, 0  # ceil: idempotent at the fixed point
        # The wavefront tier needs pipeline_blocks extra zero blocks to fill
        # its stage pipeline from the zero-input fixed point.
        zeros = jnp.zeros((cin, self.block_size, self.batch), dtype=jnp.float32)
        for _ in range(full + self.pipeline_blocks):
            _, state = self._jitted_step(self.params, state, zeros)
        if rem:
            rem_step = jax.jit(
                partial(self._step_raw, self.model.config, rem), donate_argnums=(1,)
            )
            _, state = rem_step(
                self.params, state, jnp.zeros((cin, rem, self.batch), jnp.float32)
            )
        return state

    def reset(self, prewarm: Optional[bool] = None) -> Any:
        state = self.init_state()
        do_prewarm = self.model.prewarm_on_reset if prewarm is None else prewarm
        if do_prewarm:
            state = self.prewarm(state)
        return state

    def step_fn(self):
        """Raw jitted step: (eparams, state, x[C,T,B]) -> (y[C,T,B], state').
        Note the engine-internal CTB layout (streams on the lane axis)."""
        return self._jitted_step

    def process(self, x, state):
        """Public boundary keeps the (B, T[, C]) convention; the tiny I/O
        transposes in/out of the CTB layout happen here."""
        x = jnp.asarray(x, dtype=jnp.float32)
        squeeze = x.ndim == 2
        if squeeze:
            x = x[..., None]
        if x.shape[1] != self.block_size:
            raise ValueError(
                f"StreamEngine is specialized to block_size={self.block_size}; got {x.shape[1]} "
                "frames (use Model.process for variable block sizes)"
            )
        y, state = self._jitted_step(self.params, state, x.transpose(2, 1, 0))
        y = y.transpose(2, 1, 0)
        if squeeze and y.shape[-1] == 1:
            y = y[..., 0]
        return y, state
