"""Primitive NN ops: Conv1x1, streaming dilated Conv1D, FiLM, gating/blending.

TPU-native re-implementation of the reference's L1 kernels
(reference: NAM/dsp.{h,cpp} Conv1x1, NAM/conv1d.{h,cpp}, NAM/film.h,
NAM/gating_activations.h, NAM/ring_buffer.{h,cpp}).

Design notes (idiomatic JAX, not a translation):
  - Data layout is (batch, time, channels). The reference is per-block
    column-major (channels x frames) on a single stream; here the batch axis
    carries thousands of independent streams so matmuls have a big M dim.
  - The reference's RingBuffer (per-layer time-history ring with lookback
    reads, NAM/ring_buffer.cpp) becomes *carried halo state*: a
    (batch, receptive_field, in_channels) array concatenated in front of each
    incoming block. Identical semantics (the `RingBuffer::Read(n, lookback)`
    contract), static shapes, jit-friendly.
  - Grouped convs build dense block-diagonal weights and run one matmul,
    exactly like the reference's single-GEMM approach
    (NAM/dsp.cpp:426-428 "block-diagonal zero structure handles grouping").
  - All matmuls run with float32 accumulation at HIGHEST precision by default
    so outputs match the reference's float32 Eigen GEMMs within fp error; the
    performance tier can relax this.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import WeightReader

Params = Dict[str, Any]

# Matmul precision ladder (measured on TPU v5e, 20-layer WaveNet output
# error vs exact): HIGHEST = float32-exact (bf16x6 passes on the MXU; the
# default — matches the reference's Eigen f32 GEMMs to ~1e-6). HIGH = bf16x3
# (~2x faster; ~7e-5 — near the reference's 5e-5 equivalence tolerance,
# tools/test/test_a2_fast.cpp:276-278; bench.py gates it per model).
# DEFAULT = single-pass bf16 on this backend (~2e-2 — throughput mode only).
# Switch with set_matmul_precision(); changing it retraces jitted steps.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def set_matmul_precision(precision) -> None:
    """precision: 'highest' | 'default' | a jax.lax.Precision value."""
    global MATMUL_PRECISION
    if isinstance(precision, str):
        precision = {
            "highest": jax.lax.Precision.HIGHEST,
            "float32": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "bfloat16_3x": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
            "bfloat16": jax.lax.Precision.DEFAULT,
        }[precision.lower()]
    MATMUL_PRECISION = precision


def _matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(x, w, precision=MATMUL_PRECISION)


def _validate_groups(in_channels: int, out_channels: int, groups: int) -> None:
    """(reference: NAM/dsp.cpp:313-323, NAM/conv1d.cpp:59-69)"""
    if in_channels % groups != 0:
        raise ValueError(f"in_channels ({in_channels}) must be divisible by numGroups ({groups})")
    if out_channels % groups != 0:
        raise ValueError(f"out_channels ({out_channels}) must be divisible by numGroups ({groups})")


def _is_depthwise(in_channels: int, out_channels: int, groups: int) -> bool:
    """Depthwise := groups == in == out (reference: NAM/dsp.cpp:331, conv1d.cpp:77)."""
    return groups == in_channels and in_channels == out_channels


# =============================================================================
# Conv1x1: pointwise linear layer
# =============================================================================


@dataclasses.dataclass(frozen=True)
class Conv1x1Spec:
    """Static config of a 1x1 conv (reference: nam::Conv1x1, NAM/dsp.h:273-340)."""

    in_channels: int
    out_channels: int
    bias: bool
    groups: int = 1

    @property
    def depthwise(self) -> bool:
        return _is_depthwise(self.in_channels, self.out_channels, self.groups)

    @property
    def num_weights(self) -> int:
        if self.depthwise:
            n = self.in_channels
        else:
            n = (self.out_channels // self.groups) * (self.in_channels // self.groups) * self.groups
        return n + (self.out_channels if self.bias else 0)


def conv1x1_params(spec: Conv1x1Spec, reader: WeightReader) -> Params:
    """Consume weights in reference order (NAM/dsp.cpp:363-398):
    depthwise: one weight per channel; grouped: per group, (out_pg, in_pg)
    row-major; then bias."""
    _validate_groups(spec.in_channels, spec.out_channels, spec.groups)
    p: Params = {}
    if spec.depthwise:
        p["dw"] = jnp.asarray(reader.take(spec.in_channels))
    else:
        out_pg = spec.out_channels // spec.groups
        in_pg = spec.in_channels // spec.groups
        w = np.zeros((spec.in_channels, spec.out_channels), dtype=np.float32)
        for g in range(spec.groups):
            block = reader.take(out_pg * in_pg).reshape(out_pg, in_pg)
            # Stored transposed (in, out) so apply is x @ w.
            w[g * in_pg : (g + 1) * in_pg, g * out_pg : (g + 1) * out_pg] = block.T
        p["w"] = jnp.asarray(w)
    if spec.bias:
        p["b"] = jnp.asarray(reader.take(spec.out_channels))
    return p


def conv1x1_apply(spec: Conv1x1Spec, p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (..., in_channels) -> (..., out_channels)
    (reference: NAM/dsp.cpp:414-434)."""
    if spec.depthwise:
        y = x * p["dw"]
    else:
        y = _matmul(x, p["w"])
    if spec.bias:
        y = y + p["b"]
    return y


# =============================================================================
# Conv1D: streaming dilated causal conv
# =============================================================================


@dataclasses.dataclass(frozen=True)
class Conv1dSpec:
    """Static config of a dilated causal conv (reference: nam::Conv1D,
    NAM/conv1d.h:14-136)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    dilation: int
    bias: bool
    groups: int = 1

    @property
    def depthwise(self) -> bool:
        return _is_depthwise(self.in_channels, self.out_channels, self.groups)

    @property
    def receptive_field(self) -> int:
        """Zero-indexed lookback: (K-1)*dilation (reference: NAM/conv1d.cpp:129)."""
        return (self.kernel_size - 1) * self.dilation if self.kernel_size > 0 else 0

    @property
    def num_weights(self) -> int:
        if self.depthwise:
            n = self.in_channels * self.kernel_size
        else:
            n = (
                (self.out_channels // self.groups)
                * (self.in_channels // self.groups)
                * self.kernel_size
                * self.groups
            )
        return n + (self.out_channels if self.bias else 0)


def conv1d_params(spec: Conv1dSpec, reader: WeightReader) -> Params:
    """Consume weights in reference order (NAM/conv1d.cpp:10-54):
    depthwise: for each channel c, for each tap k;
    grouped: for g, for out i, for in j, for tap k ("crazy ordering because
    that's how it gets flattened"); then bias."""
    _validate_groups(spec.in_channels, spec.out_channels, spec.groups)
    K = spec.kernel_size
    p: Params = {}
    if spec.depthwise:
        # (c, k) order -> store (K, C)
        dw = reader.take(spec.in_channels * K).reshape(spec.in_channels, K)
        p["dw"] = jnp.asarray(dw.T.copy())
    else:
        out_pg = spec.out_channels // spec.groups
        in_pg = spec.in_channels // spec.groups
        w = np.zeros((K, spec.in_channels, spec.out_channels), dtype=np.float32)
        for g in range(spec.groups):
            block = reader.take(out_pg * in_pg * K).reshape(out_pg, in_pg, K)
            # (i_out, j_in, k) -> (k, j_in, i_out)
            w[:, g * in_pg : (g + 1) * in_pg, g * out_pg : (g + 1) * out_pg] = block.transpose(2, 1, 0)
        p["w"] = jnp.asarray(w)
    if spec.bias:
        p["b"] = jnp.asarray(reader.take(spec.out_channels))
    return p


def conv1d_init_state(spec: Conv1dSpec, batch: int, dtype=jnp.float32) -> jnp.ndarray:
    """Zero halo history, shape (batch, receptive_field, in_channels).

    Replaces the reference's RingBuffer, whose storage is zeroed on Reset
    (NAM/ring_buffer.cpp:17-27)."""
    return jnp.zeros((batch, spec.receptive_field, spec.in_channels), dtype=dtype)


def conv1d_apply_full(spec: Conv1dSpec, p: Params, full: jnp.ndarray) -> jnp.ndarray:
    """Convolve over a block that already has the halo prepended.

    full: (B, rf + T, Cin) -> y: (B, T, Cout).
    Tap k reads at lookback dilation*(K-1-k) (reference: NAM/conv1d.cpp:244-252).
    """
    K, d, rf = spec.kernel_size, spec.dilation, spec.receptive_field
    T = full.shape[1] - rf
    if spec.depthwise:
        y = None
        for k in range(K):
            start = rf - (K - 1 - k) * d
            xk = jax.lax.dynamic_slice_in_dim(full, start, T, axis=1)
            contrib = xk * p["dw"][k]
            y = contrib if y is None else y + contrib
    else:
        y = None
        for k in range(K):
            start = rf - (K - 1 - k) * d
            xk = jax.lax.dynamic_slice_in_dim(full, start, T, axis=1)
            contrib = _matmul(xk, p["w"][k])
            y = contrib if y is None else y + contrib
    if spec.bias:
        y = y + p["b"]
    return y


def conv1d_step(spec: Conv1dSpec, p: Params, state: jnp.ndarray, x: jnp.ndarray):
    """Streaming step: (state (B, rf, Cin), x (B, T, Cin)) -> (y (B, T, Cout), state').

    Equivalent to RingBuffer::Write + per-tap Read(n, lookback) + Advance
    (reference: NAM/conv1d.cpp:146-257)."""
    rf = spec.receptive_field
    if rf == 0:
        return conv1d_apply_full(spec, p, x), state
    full = jnp.concatenate([state, x], axis=1)
    y = conv1d_apply_full(spec, p, full)
    T = x.shape[1]
    new_state = jax.lax.dynamic_slice_in_dim(full, T, rf, axis=1)
    return y, new_state


# =============================================================================
# FiLM: feature-wise linear modulation
# =============================================================================


@dataclasses.dataclass(frozen=True)
class FiLMSpec:
    """(reference: nam::FiLM, NAM/film.h:20-210)"""

    condition_dim: int
    input_dim: int
    shift: bool
    groups: int = 1

    @property
    def cond_spec(self) -> Conv1x1Spec:
        # condition -> (shift ? 2 : 1) * input_dim, with bias (NAM/film.h:28-31).
        return Conv1x1Spec(
            in_channels=self.condition_dim,
            out_channels=(2 if self.shift else 1) * self.input_dim,
            bias=True,
            groups=self.groups,
        )

    @property
    def num_weights(self) -> int:
        return self.cond_spec.num_weights


def film_params(spec: FiLMSpec, reader: WeightReader) -> Params:
    return conv1x1_params(spec.cond_spec, reader)


def film_apply(spec: FiLMSpec, p: Params, x: jnp.ndarray, condition: jnp.ndarray) -> jnp.ndarray:
    """out = x * scale (+ shift); scale/shift are the top/bottom halves of
    Conv1x1(condition) (reference: NAM/film.h:76-190)."""
    ss = conv1x1_apply(spec.cond_spec, p, condition)
    if spec.shift:
        scale = ss[..., : spec.input_dim]
        shift = ss[..., spec.input_dim :]
        return x * scale + shift
    return x * ss


# =============================================================================
# Gating / blending activations (consume 2C channels -> C)
# =============================================================================

from . import activations as _act


def gated_apply(
    primary: _act.ActivationConfig,
    secondary: _act.ActivationConfig,
    z: jnp.ndarray,
    bottleneck: int,
) -> jnp.ndarray:
    """GATED: act1(top) * act2(bottom)
    (reference: GatingActivation, NAM/gating_activations.h:59-114)."""
    top = z[..., :bottleneck]
    bottom = z[..., bottleneck:]
    return _act.apply(primary, top) * _act.apply(secondary, bottom)


def blended_apply(
    primary: _act.ActivationConfig,
    secondary: _act.ActivationConfig,
    z: jnp.ndarray,
    bottleneck: int,
) -> jnp.ndarray:
    """BLENDED: alpha*act1(top) + (1-alpha)*top with alpha = act2(bottom)
    (reference: BlendingActivation, NAM/gating_activations.h:165-228)."""
    top = z[..., :bottleneck]
    bottom = z[..., bottleneck:]
    alpha = _act.apply(secondary, bottom)
    return alpha * _act.apply(primary, top) + (1.0 - alpha) * top
