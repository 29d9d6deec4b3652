"""LSTM: multi-layer LSTM with a linear head.

TPU-native re-implementation of the reference LSTM (reference:
NAM/lstm.{h,cpp}). The reference runs a strictly-sequential per-sample loop of
GEMVs (NAM/lstm.cpp:103-168); here the recurrence is a ``lax.scan`` over time
with (h, c) carry, and each cell update is a batched matmul over all streams —
the single biggest arithmetic-intensity win over the reference on TPU.

Weight-stream contract (reference: NAM/lstm.cpp:9-29, 82-98):
  per layer: W (4H x (input+H)) row-major, b (4H), then INITIAL h (H), then
  INITIAL c (H); afterwards head W (out x H) row-major, then head bias (out).
  Gate order within the 4H axis: i, f, g, o.

Cell math (reference: NAM/lstm.cpp:31-68):
  ifgo = W @ [x; h] + b
  c' = sigmoid(f) * c + sigmoid(i) * tanh(g)
  h' = sigmoid(o) * tanh(c')
When global fast-tanh mode is on, the cell uses fast_sigmoid/fast_tanh
(reference: NAM/lstm.cpp:48-58).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from .. import registry
from ..formats import WeightReader
from ..ops import activations as act
from ..ops import layers as _L


@dataclasses.dataclass(frozen=True)
class LSTMConfig:
    """(reference: LSTMConfig, NAM/lstm.h + parse_config_json lstm.cpp:171-181)"""

    num_layers: int
    input_size: int
    hidden_size: int
    in_channels: int = 1
    out_channels: int = 1


def build(config: dict, weights: np.ndarray, sample_rate: float):
    cfg = LSTMConfig(
        num_layers=int(config["num_layers"]),
        input_size=int(config["input_size"]),
        hidden_size=int(config["hidden_size"]),
        in_channels=int(config.get("in_channels", 1)),
        out_channels=int(config.get("out_channels", 1)),
    )
    reader = WeightReader(weights)
    H = cfg.hidden_size
    layers = []
    for li in range(cfg.num_layers):
        isz = cfg.input_size if li == 0 else H
        w = reader.take(4 * H * (isz + H)).reshape(4 * H, isz + H)  # row-major
        b = reader.take(4 * H)
        h0 = reader.take(H)
        c0 = reader.take(H)
        layers.append(
            {
                # store transposed for xh @ W^T
                "w": jnp.asarray(w.T.copy()),
                "b": jnp.asarray(b),
                "h0": jnp.asarray(h0),
                "c0": jnp.asarray(c0),
            }
        )
    head_w = reader.take(cfg.out_channels * H).reshape(cfg.out_channels, H)
    head_b = reader.take(cfg.out_channels)
    params = {
        "layers": layers,
        "head_w": jnp.asarray(head_w.T.copy()),
        "head_b": jnp.asarray(head_b),
    }
    reader.assert_exhausted()
    return cfg, params


def init_state(cfg: LSTMConfig, params, batch: int):
    """Initial h and c are part of the weight stream (reference: lstm.cpp:24-28),
    broadcast across the batch of streams."""
    return {
        "h": [jnp.broadcast_to(l["h0"], (batch, cfg.hidden_size)) for l in params["layers"]],
        "c": [jnp.broadcast_to(l["c0"], (batch, cfg.hidden_size)) for l in params["layers"]],
    }


def _cell(cfg: LSTMConfig, lp, h, c, x):
    """One cell update, batched over streams: x (B, in), h/c (B, H)."""
    H = cfg.hidden_size
    xh = jnp.concatenate([x, h], axis=-1)
    ifgo = jnp.matmul(xh, lp["w"], precision=_L.MATMUL_PRECISION) + lp["b"]
    i = ifgo[..., 0 * H : 1 * H]
    f = ifgo[..., 1 * H : 2 * H]
    g = ifgo[..., 2 * H : 3 * H]
    o = ifgo[..., 3 * H : 4 * H]
    if act.using_fast_tanh:
        sig, th = act.fast_sigmoid, act.fast_tanh
    else:
        sig, th = jax.nn.sigmoid, jnp.tanh
    c_new = sig(f) * c + sig(i) * th(g)
    h_new = sig(o) * th(c_new)
    return h_new, c_new


def step(cfg: LSTMConfig, params, state, x):
    """x: (B, T, in_channels) -> (y (B, T, out_channels), state').

    lax.scan over time; the reference's per-sample loop (lstm.cpp:103-125).
    Note in_channels maps onto the cell input (input_size == in_channels for
    all known models; reference copies input[ch][i] into _input directly,
    lstm.cpp:110-114).
    """

    def scan_body(carry, xt):
        hs, cs = carry
        new_hs, new_cs = [], []
        inp = xt
        for li in range(cfg.num_layers):
            h, c = _cell(cfg, params["layers"][li], hs[li], cs[li], inp)
            new_hs.append(h)
            new_cs.append(c)
            inp = h
        y = jnp.matmul(inp, params["head_w"], precision=_L.MATMUL_PRECISION) + params["head_b"]
        return (new_hs, new_cs), y

    if cfg.num_layers == 0:
        # Pass-through (reference: lstm.cpp:141-151).
        B, T = x.shape[0], x.shape[1]
        n = min(cfg.in_channels, cfg.out_channels)
        y = jnp.zeros((B, T, cfg.out_channels), dtype=x.dtype)
        y = y.at[..., :n].set(x[..., :n])
        return y, state

    carry = (state["h"], state["c"])
    # scan over time: move T to the leading axis.
    xt = jnp.swapaxes(x, 0, 1)  # (T, B, C)
    (hs, cs), yt = jax.lax.scan(scan_body, carry, xt)
    y = jnp.swapaxes(yt, 0, 1)  # (B, T, out)
    return y, {"h": hs, "c": cs}


def prewarm_samples(cfg: LSTMConfig, sample_rate: float) -> int:
    """Half a second of samples (reference: lstm.cpp:127-134)."""
    n = int(0.5 * sample_rate)
    return n if n > 0 else 1


# -- engine path ((H, B) layout: streams on the lane axis) -------------------


def engine_prepare(cfg: LSTMConfig, params, T: int, batch: int):
    import numpy as _np

    eparams = {
        "layers": [
            {
                "w": jnp.asarray(_np.asarray(l["w"]).T.copy()),  # (4H, I+H)
                "b": l["b"],
                "h0": l["h0"],
                "c0": l["c0"],
            }
            for l in params["layers"]
        ],
        "head_w": jnp.asarray(_np.asarray(params["head_w"]).T.copy()),  # (O, H)
        "head_b": params["head_b"],
    }
    state = {
        "h": [jnp.broadcast_to(l["h0"][:, None], (cfg.hidden_size, batch)) for l in params["layers"]],
        "c": [jnp.broadcast_to(l["c0"][:, None], (cfg.hidden_size, batch)) for l in params["layers"]],
    }
    return eparams, state


def engine_step(cfg: LSTMConfig, T: int, eparams, state, x):
    """x: (C, T, B) -> (y (O, T, B), state'). Cell matmuls run with the
    stream batch on the lane axis: dot((4H, I+H), (I+H, B))."""
    H = cfg.hidden_size

    def cell(lp, h, c, inp):
        xh = jnp.concatenate([inp, h], axis=0)  # (I+H, B)
        ifgo = (
            jax.lax.dot_general(
                lp["w"], xh, (((1,), (0,)), ((), ())), precision=_L.MATMUL_PRECISION
            )
            + lp["b"][:, None]
        )
        i, f, g, o = ifgo[:H], ifgo[H : 2 * H], ifgo[2 * H : 3 * H], ifgo[3 * H :]
        if act.using_fast_tanh:
            sig, th = act.fast_sigmoid, act.fast_tanh
        else:
            sig, th = jax.nn.sigmoid, jnp.tanh
        c_new = sig(f) * c + sig(i) * th(g)
        h_new = sig(o) * th(c_new)
        return h_new, c_new

    def scan_body(carry, xt):  # xt: (C, B)
        hs, cs = carry
        new_hs, new_cs = [], []
        inp = xt
        for li in range(cfg.num_layers):
            h, c = cell(eparams["layers"][li], hs[li], cs[li], inp)
            new_hs.append(h)
            new_cs.append(c)
            inp = h
        y = (
            jax.lax.dot_general(
                eparams["head_w"], inp, (((1,), (0,)), ((), ())), precision=_L.MATMUL_PRECISION
            )
            + eparams["head_b"][:, None]
        )
        return (new_hs, new_cs), y

    if cfg.num_layers == 0:
        C, B = x.shape[0], x.shape[2]
        n = min(cfg.in_channels, cfg.out_channels)
        y = jnp.zeros((cfg.out_channels, T, B), dtype=x.dtype)
        y = y.at[:n].set(x[:n])
        return y, state

    xt = jnp.moveaxis(x, 1, 0)  # (T, C, B)
    (hs, cs), yt = jax.lax.scan(scan_body, (state["h"], state["c"]), xt)
    y = jnp.moveaxis(yt, 0, 1)  # (O, T, B)
    return y, {"h": hs, "c": cs}


registry.register_architecture(
    registry.ArchDef(
        name="LSTM",
        config_cls=LSTMConfig,
        build=build,
        init_state=init_state,
        step=step,
        prewarm_samples=prewarm_samples,
        in_channels=lambda c: c.in_channels,
        out_channels=lambda c: c.out_channels,
        engine_prepare=engine_prepare,
        engine_step=engine_step,
        recurrent=True,
    )
)
