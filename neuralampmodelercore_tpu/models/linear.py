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
  - fft (generic tier, variable block size): whole-block FFT overlap-save
    convolution — O((rf+T) log(rf+T)) per block.
  - fft (ENGINE tier, fixed block size — the production path): the
    zero-latency uniform-partitioned scheme matching the reference's cost
    model (reference: linear.cpp:14-31,115-278): partition size
    Q in {256, 512, 1024} chosen by rf, a Q-tap head convolved per block,
    and the remaining lags as a frequency-domain delay line — a ring of the
    last ceil((rf-Q)/Q) input-block spectra carried as engine state, one
    rfft/irfft + one (P, F) complex MAC per completed Q-block. Per-T-block
    cost is O(Q log Q + rf*T/Q) — flat in rf up to the 1/Q-slope spectra
    MAC the reference's scheme shares — instead of the whole-window path's
    O((rf+T) log(rf+T)); a 480k-tap cab IR costs ~Q/T fewer FLOPs per block
    than re-transforming its full window.
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


# =============================================================================
# Engine tier: zero-latency uniform-partitioned FFT (fixed block size)
# =============================================================================

# Partition-size table (reference: _choose_linear_fft_block_size,
# linear.cpp:24-31) and the Auto direct cutoff (linear.cpp:14).
def _choose_fft_partition(receptive_field: int) -> int:
    if receptive_field <= 2048:
        return 256
    if receptive_field <= 8192:
        return 512
    return 1024


def _engine_partition(cfg: LinearConfig, T: int) -> int:
    """Effective partition size: the table value when the block size divides
    it (a partition completes every Q/T blocks), else the block size itself
    (every block completes one partition — still bounded cost; covers odd
    block sizes)."""
    q = _choose_fft_partition(cfg.receptive_field)
    return q if q % T == 0 else T


def engine_prepare(cfg: LinearConfig, params, T: int, batch: int):
    """Engine-layout (C, T, B) weights + carried FFT state.

    Partitioned state (active when implementation resolves to fft and
    rf > Q — the reference's num_partitions > 0 case, linear.cpp:119-125):
      hist    (C, Q-1, B)      head history (the Q-tap direct region)
      accQ    (C, Q, B)        current partial input partition
      spec_re/im (P, C, F, B)  spectra ring, newest first, F = Q+1 rfft bins
      outbuf  (C, 2Q, B)       scheduled tail outputs (overlap-add ring)
      c       int32            T-blocks into the current partition
    """
    n_proc = min(cfg.in_channels, cfg.out_channels)
    ir = np.asarray(params["ir"], dtype=np.float32)
    rf = cfg.receptive_field
    eparams = {"bias": params["bias"]}
    impl = cfg.active_implementation
    Q = _engine_partition(cfg, T)
    if impl == "fft" and rf > Q:
        P = -(-(rf - Q) // Q)
        segs = np.zeros((P, Q), np.float32)
        tail_ir = ir[Q:]
        for j in range(P):
            seg = tail_ir[j * Q : (j + 1) * Q]
            segs[j, : seg.shape[0]] = seg
        H = np.fft.rfft(segs, n=2 * Q, axis=1)  # (P, F)
        eparams.update(
            {
                "head_ir": jnp.asarray(ir[:Q]),
                "H_re": jnp.asarray(np.real(H).astype(np.float32)),
                "H_im": jnp.asarray(np.imag(H).astype(np.float32)),
            }
        )
        F = Q + 1
        state = {
            "hist": jnp.zeros((n_proc, Q - 1, batch), jnp.float32),
            "accQ": jnp.zeros((n_proc, Q, batch), jnp.float32),
            "spec_re": jnp.zeros((P, n_proc, F, batch), jnp.float32),
            "spec_im": jnp.zeros((P, n_proc, F, batch), jnp.float32),
            "outbuf": jnp.zeros((n_proc, 2 * Q, batch), jnp.float32),
            "c": jnp.zeros((), jnp.int32),
        }
    else:
        eparams["ir"] = jnp.asarray(ir)
        h = max(rf - 1, 0)
        state = {"hist": jnp.zeros((n_proc, h, batch), jnp.float32)}
    return eparams, state


def _fft_conv_ctb(full: jnp.ndarray, ir: jnp.ndarray, T: int) -> jnp.ndarray:
    """(C, L, B) overlap-save FFT conv along the time axis -> (C, T, B)."""
    rf = ir.shape[0]
    L = full.shape[1]
    nfft = 1
    while nfft < L:
        nfft *= 2
    X = jnp.fft.rfft(full, n=nfft, axis=1)
    H = jnp.fft.rfft(ir, n=nfft)[None, :, None]
    y = jnp.fft.irfft(X * H, n=nfft, axis=1)
    return y[:, rf - 1 : rf - 1 + T, :].astype(full.dtype)


def engine_step(cfg: LinearConfig, T: int, eparams, state, x):
    """x: (Cin, T, B) -> (y (Cout, T, B), state'). Fixed block size."""
    n_proc = min(cfg.in_channels, cfg.out_channels)
    B = x.shape[2]
    xp = x[:n_proc]
    rf = cfg.receptive_field
    impl = cfg.active_implementation
    Q = _engine_partition(cfg, T)

    if not (impl == "fft" and rf > Q):
        # Short-IR path: whole-window conv over [hist, x], direct or FFT.
        full = jnp.concatenate([state["hist"], xp], axis=1)  # (C, rf-1+T, B)
        if impl == "fft":
            y_proc = _fft_conv_ctb(full, eparams["ir"], T)
        else:
            y_btc = _direct_conv(full.transpose(2, 1, 0), eparams["ir"], T)
            y_proc = y_btc.transpose(2, 1, 0)
        y_proc = y_proc + eparams["bias"]
        h = max(rf - 1, 0)
        new_hist = (
            jax.lax.dynamic_slice_in_dim(full, full.shape[1] - h, h, axis=1)
            if h > 0
            else state["hist"]
        )
        new_state = {"hist": new_hist}
    else:
        steps_per = Q // T
        c = state["c"]
        # Head: the first Q lags, overlap-save over [hist(Q-1), x].
        full = jnp.concatenate([state["hist"], xp], axis=1)  # (C, Q-1+T, B)
        y_head = _fft_conv_ctb(full, eparams["head_ir"], T)
        # Tail: scheduled frequency-domain delay-line output for this slice.
        tail = jax.lax.dynamic_slice_in_dim(state["outbuf"], c * T, T, axis=1)
        y_proc = y_head + tail + eparams["bias"]

        accQ = jax.lax.dynamic_update_slice(state["accQ"], xp, (0, c * T, 0))

        def complete(ops):
            accQ, spec_re, spec_im, outbuf = ops
            # Push this partition's spectrum (newest first) and run the FDL
            # MAC: contribution of completed partition m spans output samples
            # [(m+1)Q, (m+3)Q) — entirely in the future, zero latency
            # (reference: _run_fft_block, linear.cpp:244-278).
            X = jnp.fft.rfft(accQ, n=2 * Q, axis=1)  # (C, F, B) complex
            spec_re = jnp.concatenate([jnp.real(X)[None], spec_re[:-1]], axis=0)
            spec_im = jnp.concatenate([jnp.imag(X)[None], spec_im[:-1]], axis=0)
            Hr = eparams["H_re"][:, None, :, None]
            Hi = eparams["H_im"][:, None, :, None]
            acc_re = jnp.sum(spec_re * Hr - spec_im * Hi, axis=0)
            acc_im = jnp.sum(spec_re * Hi + spec_im * Hr, axis=0)
            contrib = jnp.fft.irfft(jax.lax.complex(acc_re, acc_im), n=2 * Q, axis=1)
            outbuf = (
                jnp.concatenate(
                    [outbuf[:, Q:], jnp.zeros((n_proc, Q, B), outbuf.dtype)], axis=1
                )
                + contrib
            )
            return accQ, spec_re, spec_im, outbuf

        ops = (accQ, state["spec_re"], state["spec_im"], state["outbuf"])
        accQ, spec_re, spec_im, outbuf = jax.lax.cond(
            c == steps_per - 1, complete, lambda o: o, ops
        )
        new_state = {
            "hist": full[:, -(Q - 1) :, :],
            "accQ": accQ,
            "spec_re": spec_re,
            "spec_im": spec_im,
            "outbuf": outbuf,
            "c": jax.lax.rem(c + 1, steps_per),
        }

    if cfg.out_channels > n_proc:
        pad = jnp.zeros((cfg.out_channels - n_proc, T, B), dtype=x.dtype)
        y = jnp.concatenate([y_proc, pad], axis=0)
    else:
        y = y_proc
    return y, new_state


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
        engine_prepare=engine_prepare,
        engine_step=engine_step,
    )
)
