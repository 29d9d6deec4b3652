"""Chunked-FIFO ring state for streaming dilated convs: O(block) traffic,
lane-aligned (C, T, B) layout.

Two problems with the naive streaming state (ops/layers.py conv1d_step):

1. It concatenates and re-writes the full receptive-field history every
   block — O(rf) HBM traffic (rf up to 1024 frames for the standard WaveNet).
2. The (batch, time, channels) layout puts the tiny channel count (1-16) on
   the TPU's 128-wide lane dimension, so XLA pads every tensor 8-128x in
   memory — measured 3.3 GB of HBM traffic per 1024-stream block where the
   logical data is ~0.4 GB.

This module is the production fix, the TPU-native equivalent of the
reference's constant-cost ring buffers (reference: NAM/ring_buffer.{h,cpp};
the A2 fast path's pow2 rings, NAM/wavenet/a2_fast.cpp:340-402):

  - Layout is (C, T, B): the stream batch rides the 128-lane minor axis
    (B should be a multiple of 128), time on sublanes, channels leading.
    Zero padding waste; matmuls become dot(W[O, K*C], taps[K*C, T*B]) with a
    huge N dimension.
  - state = {"chunks": (M, C, T, B), "n": int32 write slot}, M = rf//T + 2.
    A tap with lookback a reads at most two chunks (the intra-chunk split is
    STATIC — it depends only on a and T); the write is one aligned
    dynamic_update_slice into slot n, in place under donation.
  - All K tap windows are concatenated along C and contracted in a single
    matmul (tap-stacking: K=3, C=16 -> a 48-deep contraction instead of
    three 16-deep ones).

Block size T is fixed at trace time — the production contract, mirroring the
reference's Reset(maxBufferSize) pre-allocation (NAM/dsp.cpp:130-140).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as _layers
from .layers import Conv1dSpec, Conv1x1Spec, Params


def dot_ctb(w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """w: (O, I), x: (I, T, B) -> (O, T, B). The engine's one matmul form:
    contraction over channels, N = T*B on the minor axes."""
    I, T, B = x.shape
    y = jax.lax.dot_general(
        w,
        x.reshape(I, T * B),
        dimension_numbers=(((1,), (0,)), ((), ())),
        # read live so set_matmul_precision() applies to the engine tier
        precision=_layers.MATMUL_PRECISION,
        preferred_element_type=jnp.float32,
    )
    return y.reshape(w.shape[0], T, B)


def conv1x1_w_ctb(spec: Conv1x1Spec, p: Params) -> Dict:
    """Engine-layout weights for a Conv1x1 built from the generic params
    (w stored (I, O) there)."""
    ep: Dict = {}
    if spec.depthwise:
        ep["dw"] = jnp.asarray(np.asarray(p["dw"]))  # (C,)
    else:
        ep["w"] = jnp.asarray(np.asarray(p["w"]).T.copy())  # (O, I)
    if spec.bias:
        ep["b"] = jnp.asarray(np.asarray(p["b"]))
    return ep


def conv1x1_ctb(spec: Conv1x1Spec, ep: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (I, T, B) -> (O, T, B)."""
    if spec.depthwise:
        y = x * ep["dw"][:, None, None]
    else:
        y = dot_ctb(ep["w"], x)
    if spec.bias:
        y = y + ep["b"][:, None, None]
    return y


def conv1d_w_ctb(spec: Conv1dSpec, p: Params) -> Dict:
    """Tap-stacked engine weights from generic conv params (w: (K, I, O))."""
    ep: Dict = {}
    if spec.depthwise:
        ep["dw"] = jnp.asarray(np.asarray(p["dw"]))  # (K, C)
    else:
        w = np.asarray(p["w"])  # (K, I, O)
        K, I, O = w.shape
        # W_all[o, k*I + i] = w[k, i, o]
        ep["w"] = jnp.asarray(w.transpose(2, 0, 1).reshape(O, K * I).copy())
    if spec.bias:
        ep["b"] = jnp.asarray(np.asarray(p["b"]))
    return ep


def ring_num_slots(receptive_field: int, T: int) -> int:
    return receptive_field // T + 2


def ring_conv_init(spec: Conv1dSpec, T: int, batch: int, dtype=jnp.float32) -> Dict:
    if spec.receptive_field == 0:
        return {}
    M = ring_num_slots(spec.receptive_field, T)
    return {
        "chunks": jnp.zeros((M, spec.in_channels, T, batch), dtype=dtype),
        "n": jnp.zeros((), dtype=jnp.int32),
    }


def _chunk_rel(state: Dict, x: jnp.ndarray, m_back: int) -> jnp.ndarray:
    """Logical chunk m_back blocks in the past (m_back=0 -> the current x).
    x/chunk: (C, T, B)."""
    if m_back == 0:
        return x
    chunks, n = state["chunks"], state["n"]
    M = chunks.shape[0]
    slot = jax.lax.rem(n - m_back + 2 * M, M)
    return jax.lax.dynamic_slice_in_dim(chunks, slot, 1, axis=0)[0]


def _tap_window(state: Dict, x: jnp.ndarray, a: int, T: int, slab=None) -> jnp.ndarray:
    """Logical window [-a, -a+T) of the conv input stream, (C, T, B).

    ``slab`` is an optional precomputed concat(chunk(-1), x) covering logical
    [-T, T): all taps with lookback <= T slice it STATICALLY, so each layer
    pays for at most one sublane-axis concat instead of one per tap
    (concats on the time/sublane axis are relayouts — measured ~28% of the
    engine step before this)."""
    if a == 0:
        return x
    if a <= T and slab is not None:
        return jax.lax.slice_in_dim(slab, T - a, 2 * T - a, axis=1)
    j, o = divmod(a, T)
    if o == 0:
        return _chunk_rel(state, x, j)
    left = _chunk_rel(state, x, j + 1)[:, T - o :, :]
    right = _chunk_rel(state, x, j)[:, : T - o, :]
    return jnp.concatenate([left, right], axis=1)


def ring_conv_step(
    spec: Conv1dSpec, T: int, ep: Params, state: Dict, x: jnp.ndarray, extra: jnp.ndarray = None
):
    """Streaming dilated conv over one T-frame block, (C, T, B) layout.

    Semantically identical to ops.layers.conv1d_step (the RingBuffer
    Read(n, lookback) contract, NAM/conv1d.cpp:244-252); traffic is O(T).

    ``extra``: optional additional input rows (E, T, B) appended to the
    tap-stacked contraction — used to fuse the WaveNet input-mixin's
    condition projection into the same matmul (ep["w"] must then be the
    (O, K*C + E) fused weight)."""
    K, d, rf = spec.kernel_size, spec.dilation, spec.receptive_field
    assert x.shape[1] == T, f"ring engine requires fixed block size {T}, got {x.shape[1]}"

    lookbacks = [(K - 1 - k) * d for k in range(K)]
    slab = None
    if any(0 < a <= T for a in lookbacks) and rf > 0:
        slab = jnp.concatenate([_chunk_rel(state, x, 1), x], axis=1)  # logical [-T, T)

    if spec.depthwise:
        y = None
        for k, a in enumerate(lookbacks):
            contrib = _tap_window(state, x, a, T, slab) * ep["dw"][k][:, None, None]
            y = contrib if y is None else y + contrib
        if extra is not None:
            raise ValueError("extra rows unsupported for depthwise ring conv")
    else:
        # Tap-stack: one matmul over a K*C(+E)-deep contraction.
        windows = [_tap_window(state, x, a, T, slab) for a in lookbacks]
        if extra is not None:
            windows.append(extra)
        stacked = jnp.concatenate(windows, axis=0) if len(windows) > 1 else windows[0]
        y = dot_ctb(ep["w"], stacked)
    if spec.bias:
        y = y + ep["b"][:, None, None]

    if rf == 0:
        return y, state
    chunks, n = state["chunks"], state["n"]
    M = chunks.shape[0]
    new_chunks = jax.lax.dynamic_update_slice_in_dim(chunks, x[None], n, axis=0)
    return y, {"chunks": new_chunks, "n": jax.lax.rem(n + 1, M)}
