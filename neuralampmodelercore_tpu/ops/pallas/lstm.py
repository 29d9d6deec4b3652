"""Fused LSTM Pallas kernel: the whole block's recurrence in ONE kernel.

Why: the XLA engine tier (models/lstm.py engine_step, lax.scan) round-trips
the (h, c) carry and the per-step activations through HBM on every one of
the T sequential steps — measured 440 us/block at B=18432/T=64 on v5e where
the state traffic floor is ~85 us. This kernel keeps h and c VMEM-resident
for the whole block: the grid tiles the stream batch, each tile loads its
(L, H, w) carries once, runs the T-step recurrence entirely in VMEM
(weights are tiny and live in VMEM too), collects the top-layer h into a
scratch, and finishes with ONE (O, H) x (H, T*w) head matmul.

Semantics are identical to the XLA engine step (itself pinned to the
reference per-sample loop, NAM/lstm.cpp:31-68,103-168):

  ifgo = W @ [x; h] + b            (gate order i, f, g, o; lstm.cpp:19-23)
  c' = sig(f) * c + sig(i) * tanh(g)
  h' = sig(o) * tanh(c')
  y  = head_W @ h_top + head_b

with the fast_sigmoid/fast_tanh variants when global fast-tanh mode is on
(lstm.cpp:48-58), and initial h/c from the weight stream (lstm.cpp:24-28)
broadcast per stream by ``prepare``. Gate weights are pre-split and
zero-padded to the 8-row sublane grid, so padded state rows stay inert.

Equivalence is tested in interpret mode (tests/test_pallas_lstm.py) and
on-device by tools/ondevice_agreement.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import activations as act
from .stack import (
    SUBLANE,
    VMEM_BUDGET,
    VMEM_LIMIT,
    W_TILE,
    _pad8,
    _small_dot,
)

# Interpret mode for CPU testing (tests set this).
INTERPRET = False


def supports(cfg, T: int, batch: int) -> Optional[str]:
    """None if the fused kernel handles this config, else the reason."""
    from ...models.lstm import LSTMConfig

    if not isinstance(cfg, LSTMConfig):
        return f"not an LSTMConfig: {type(cfg).__name__}"
    if cfg.num_layers < 1:
        return "passthrough LSTM (num_layers == 0)"
    if cfg.input_size != cfg.in_channels:
        return f"input_size {cfg.input_size} != in_channels {cfg.in_channels}"
    if batch % W_TILE != 0 or batch < W_TILE:
        return f"batch {batch} not a multiple of {W_TILE}"
    if T % SUBLANE != 0:
        return f"block size {T} not a multiple of {SUBLANE}"
    if _pick_w(cfg, T, batch) == 0:
        return "VMEM budget exceeded"
    return None


def _tile_bytes(cfg, T: int, w: int) -> int:
    Hp = _pad8(cfg.hidden_size)
    io_rows = cfg.in_channels + cfg.out_channels  # x/y grid blocks
    state = 2 * cfg.num_layers * Hp * w * 4  # h + c carries
    # x/y are double-buffered by the grid pipeline; the h_all scratch (Hp
    # rows) and the carries are single VMEM allocations.
    return (2 * io_rows + Hp) * T * w * 4 + state


def _pick_w(cfg, T: int, batch: int) -> int:
    for w in (1024, 512, 256, 128):
        if batch % w == 0 and _tile_bytes(cfg, T, w) <= VMEM_BUDGET:
            return w
    return 0


def prepare(cfg, params, T: int, batch: int):
    """Gate-split zero-padded weights + broadcast initial state."""
    reason = supports(cfg, T, batch)
    if reason is not None:
        raise ValueError(f"pallas lstm kernel does not support this config: {reason}")
    H, Hp = cfg.hidden_size, _pad8(cfg.hidden_size)
    weights = []
    for li, lp in enumerate(params["layers"]):
        isz = cfg.input_size if li == 0 else H
        w = np.asarray(lp["w"]).T  # (4H, I+H), rows i,f,g,o
        b = np.asarray(lp["b"])
        cols = cfg.in_channels if li == 0 else Hp  # layer 0 reads x, rest read h
        # All four gates in ONE (4Hp)-row operand: one x-dot + one h-dot per
        # step, and the per-gate slices land on 8-row sublane boundaries.
        wx = np.zeros((4 * Hp, cols), np.float32)
        wh = np.zeros((4 * Hp, Hp), np.float32)
        bg = np.zeros((4 * Hp, 1), np.float32)
        for gi in range(4):
            wx[gi * Hp : gi * Hp + H, :isz] = w[gi * H : (gi + 1) * H, :isz]
            wh[gi * Hp : gi * Hp + H, :H] = w[gi * H : (gi + 1) * H, isz:]
            bg[gi * Hp : gi * Hp + H, 0] = b[gi * H : (gi + 1) * H]
        weights += [jnp.asarray(wx), jnp.asarray(wh), jnp.asarray(bg)]
    hw = np.zeros((cfg.out_channels, Hp), np.float32)
    hw[:, :H] = np.asarray(params["head_w"]).T
    hb = np.asarray(params["head_b"]).reshape(cfg.out_channels, 1)
    weights += [jnp.asarray(hw), jnp.asarray(hb)]

    def bcast(v):  # (L, Hp, batch), padded rows zero
        out = np.zeros((cfg.num_layers, Hp, 1), np.float32)
        for li, lp in enumerate(params["layers"]):
            out[li, :H, 0] = np.asarray(v(lp))
        return jnp.broadcast_to(jnp.asarray(out), (cfg.num_layers, Hp, batch))

    state = {"h": bcast(lambda l: l["h0"]), "c": bcast(lambda l: l["c0"])}
    return {"weights": weights}, state


# (O, S) x (S, N): the stack kernel's broadcast-sum-for-tiny-S dot, falling
# back to an f32-exact MXU dot (stack.DOT_PRECISION) for larger S.
_gdot = _small_dot


def _make_kernel(cfg, T: int, w: int):
    L, H, Hp = cfg.num_layers, cfg.hidden_size, _pad8(cfg.hidden_size)
    O = cfg.out_channels
    if act.using_fast_tanh:
        sig, th = act.fast_sigmoid, act.fast_tanh
    else:
        sig, th = jax.nn.sigmoid, jnp.tanh
    # Serving blocks (T <= 128) unroll the recurrence at trace time: static
    # offsets let Mosaic pipeline the per-step dots. Larger blocks run a
    # fori_loop body instead — same math, dynamic sublane indexing into
    # x/hall — which removes the old T <= 512 trace-size gate entirely
    # (VERDICT r3 ask #8) at a small per-step indexing cost that long
    # offline blocks amortize.
    unroll = T <= 128

    def cell(wr, inp, h_l, c_l, l):
        wx, wh, b = wr[3 * l][:], wr[3 * l + 1][:], wr[3 * l + 2][:]
        z = _gdot(wx, inp) + _gdot(wh, h_l) + b  # (4Hp, w)
        zi, zf = z[0:Hp], z[Hp : 2 * Hp]
        zg, zo = z[2 * Hp : 3 * Hp], z[3 * Hp :]
        cn = sig(zf) * c_l + sig(zi) * th(zg)
        hn = sig(zo) * th(cn)
        return hn, cn

    def kernel(*refs):
        x_ref = refs[0]
        wr = refs[1 : 1 + 3 * L + 2]
        h_ref, c_ref = refs[1 + 3 * L + 2], refs[2 + 3 * L + 2]
        y_ref, ho_ref, co_ref = refs[3 + 3 * L + 2 : 6 + 3 * L + 2]
        hall = refs[6 + 3 * L + 2]

        if unroll:
            h = [h_ref[l] for l in range(L)]
            c = [c_ref[l] for l in range(L)]
            for t in range(T):
                inp = x_ref[:, t]  # (Cin, w)
                for l in range(L):
                    h[l], c[l] = cell(wr, inp, h[l], c[l], l)
                    inp = h[l]
                hall[:, t] = inp
            for l in range(L):
                ho_ref[l] = h[l]
                co_ref[l] = c[l]
        else:
            # working state lives in the (aliased) output refs
            for l in range(L):
                ho_ref[l] = h_ref[l]
                co_ref[l] = c_ref[l]

            def body(t, carry):
                inp = x_ref[:, pl.ds(t, 1)][:, 0]
                for l in range(L):
                    hn, cn = cell(wr, inp, ho_ref[l], co_ref[l], l)
                    ho_ref[l] = hn
                    co_ref[l] = cn
                    inp = hn
                hall[:, pl.ds(t, 1)] = inp[:, None]
                return carry

            jax.lax.fori_loop(0, T, body, 0)
        # head over the whole block in one dot (O, Hp) x (Hp, T*w)
        y = _gdot(wr[3 * L][:], hall[:].reshape(Hp, T * w)) + wr[3 * L + 1][:]
        y_ref[:] = y.reshape(O, T, w)

    return kernel


def step(cfg, T: int, eparams, state, x):
    """Block step, engine CTB convention: x (Cin, T, B) -> (y (Cout, T, B), state')."""
    B = x.shape[2]
    w = _pick_w(cfg, T, B)
    if w == 0:
        raise ValueError("pallas lstm kernel: no tile width fits")
    nt = B // w
    L, Hp = cfg.num_layers, _pad8(cfg.hidden_size)
    weights = eparams["weights"]

    state_spec = pl.BlockSpec((L, Hp, w), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(cfg, T, w),
        grid=(nt,),
        in_specs=[pl.BlockSpec((cfg.in_channels, T, w), lambda i: (0, 0, i), memory_space=pltpu.VMEM)]
        + [
            pl.BlockSpec(wt.shape, (lambda i, nd=wt.ndim: (0,) * nd), memory_space=pltpu.VMEM)
            for wt in weights
        ]
        + [state_spec, state_spec],
        out_specs=[
            pl.BlockSpec((cfg.out_channels, T, w), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
        ],
        out_shape=(
            jax.ShapeDtypeStruct((cfg.out_channels, T, B), jnp.float32),
            jax.ShapeDtypeStruct((L, Hp, B), jnp.float32),
            jax.ShapeDtypeStruct((L, Hp, B), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((Hp, T, w), jnp.float32)],
        # h/c update in place (inputs 1+len(weights), +1 -> outputs 1, 2)
        input_output_aliases={1 + len(weights): 1, 2 + len(weights): 2},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=INTERPRET,
    )(x, *weights, state["h"], state["c"])
    y, h, c = out
    return y, {"h": h, "c": c}
