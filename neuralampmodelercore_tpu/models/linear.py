"""Linear: impulse-response (FIR) convolution.

TPU-native re-implementation of the reference Linear model
(reference: NAM/linear.{h,cpp}).

Semantics: y[t] = bias + sum_{j=0..rf-1} w[j] * x[t-j], each input channel
processed independently to the corresponding output channel; extra output
channels are zero (reference: linear.cpp:168-199). Weight stream: the
impulse response (rf floats, w[0] = current-sample tap), then optional bias
(reference: linear.cpp:61-78).

Implementation selection mirrors the reference's Auto/Direct/FFT knob
(reference: LinearImplementation, NAM/linear.h:11-16; parse at
linear.cpp:280-293; Auto picks direct for rf <= 256, linear.cpp:99-113).
  - direct: one dilated=1 causal conv over the block (a single
    lax.conv_general_dilated call — the TPU-idiomatic form of the
    reference's per-sample dot products).
  - fft: whole-block FFT overlap-save convolution. The reference's
    zero-latency *partitioned* FFT (linear.cpp:115-278) exists to bound
    per-sample cost in a real-time C++ callback; on TPU the block is the unit
    of work, so a block-sized frequency-domain convolution is the idiomatic
    equivalent and computes the identical convolution.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import registry
from ..formats import WeightReader


def parse_implementation(s: str) -> str:
    """(reference: linear::parse_implementation, linear.cpp:280-293)"""
    n = s.lower()
    if n == "auto":
        return "auto"
    if n in ("direct", "legacy", "old"):
        return "direct"
    if n in ("fft", "partitioned_fft", "partitioned-fft"):
        return "fft"
    raise ValueError(f"Unsupported Linear implementation: {s}")


_AUTO_DIRECT_MAX_TAPS = 256  # (reference: linear.cpp:14)


@dataclasses.dataclass(frozen=True)
class LinearConfig:
    """(reference: linear::parse_config_json, linear.cpp:306-316)"""

    receptive_field: int
    bias: bool
    in_channels: int = 1
    out_channels: int = 1
    implementation: str = "auto"

    @property
    def active_implementation(self) -> str:
        if self.implementation == "auto":
            return "direct" if self.receptive_field <= _AUTO_DIRECT_MAX_TAPS else "fft"
        return self.implementation


def build(config: dict, weights: np.ndarray, sample_rate: float):
    cfg = LinearConfig(
        receptive_field=int(config["receptive_field"]),
        bias=bool(config["bias"]),
        in_channels=int(config.get("in_channels", 1)),
        out_channels=int(config.get("out_channels", 1)),
        implementation=parse_implementation(config.get("implementation", "auto")),
    )
    expected = cfg.receptive_field + (1 if cfg.bias else 0)
    if weights.size != expected:
        raise ValueError(
            "Params vector does not match expected size based on architecture parameters"
        )
    reader = WeightReader(weights)
    ir = reader.take(cfg.receptive_field)  # w[0] = current-sample tap
    b = reader.take_scalar() if cfg.bias else 0.0
    reader.assert_exhausted()
    params = {"ir": jnp.asarray(ir), "bias": jnp.float32(b)}
    return cfg, params


def init_state(cfg: LinearConfig, params, batch: int):
    """History of the previous rf-1 input samples per channel."""
    h = max(cfg.receptive_field - 1, 0)
    return {"history": jnp.zeros((batch, h, cfg.in_channels), dtype=jnp.float32)}


def _direct_conv(full: jnp.ndarray, ir: jnp.ndarray, T: int) -> jnp.ndarray:
    """full: (B, rf-1+T, C) -> (B, T, C); per-channel causal FIR."""
    rf = ir.shape[0]
    B, _, C = full.shape
    # feature-group conv: each channel with the same kernel, independently.
    lhs = jnp.swapaxes(full, 1, 2)  # (B, C, L)
    # kernel (out=C, in/groups=1, W=rf), reversed so w[0] hits the newest sample.
    kernel = jnp.broadcast_to(ir[::-1], (C, 1, rf))
    y = jax.lax.conv_general_dilated(
        lhs,
        kernel,
        window_strides=(1,),
        padding="VALID",
        feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.swapaxes(y, 1, 2)  # (B, T, C)


def _fft_conv(full: jnp.ndarray, ir: jnp.ndarray, T: int) -> jnp.ndarray:
    """Frequency-domain overlap-save convolution of the block."""
    rf = ir.shape[0]
    L = full.shape[1]  # rf - 1 + T
    nfft = 1
    while nfft < L:
        nfft *= 2
    X = jnp.fft.rfft(full, n=nfft, axis=1)
    H = jnp.fft.rfft(ir, n=nfft)[None, :, None]
    y = jnp.fft.irfft(X * H, n=nfft, axis=1)
    # Valid region: outputs with full history start at index rf-1.
    return y[:, rf - 1 : rf - 1 + T, :].astype(full.dtype)


def step(cfg: LinearConfig, params, state, x):
    """x: (B, T, in_channels) -> (y (B, T, out_channels), state')."""
    B, T = x.shape[0], x.shape[1]
    n_proc = min(cfg.in_channels, cfg.out_channels)
    full = jnp.concatenate([state["history"], x], axis=1)  # (B, rf-1+T, Cin)
    if cfg.active_implementation == "fft":
        y_proc = _fft_conv(full[..., :n_proc], params["ir"], T)
    else:
        y_proc = _direct_conv(full[..., :n_proc], params["ir"], T)
    y_proc = y_proc + params["bias"]
    if cfg.out_channels > n_proc:
        pad = jnp.zeros((B, T, cfg.out_channels - n_proc), dtype=x.dtype)
        y = jnp.concatenate([y_proc, pad], axis=-1)
    else:
        y = y_proc
    h = max(cfg.receptive_field - 1, 0)
    new_history = (
        jax.lax.dynamic_slice_in_dim(full, full.shape[1] - h, h, axis=1)
        if h > 0
        else state["history"]
    )
    return y, {"history": new_history}


def prewarm_samples(cfg: LinearConfig, sample_rate: float) -> int:
    # The reference Linear inherits DSP's default of 0 prewarm samples
    # (NAM/dsp.h:155); its Buffer history starts zeroed.
    return 0


registry.register_architecture(
    registry.ArchDef(
        name="Linear",
        config_cls=LinearConfig,
        build=build,
        init_state=init_state,
        step=step,
        prewarm_samples=prewarm_samples,
        in_channels=lambda c: c.in_channels,
        out_channels=lambda c: c.out_channels,
    )
)
