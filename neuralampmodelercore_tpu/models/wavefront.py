"""Wavefront-packed StreamEngine: block-diagonal layer packing for WaveNet.

The serving engine's matmuls are tiny — the flagship WaveNet-standard layer
is a (16 x 48) weight against a (48, T*B) operand, using 16 of the MXU's 128
rows (reference shapes: NAM/wavenet/model.cpp:381-383, dilated layer stack
model.cpp:450-511). Per-shape analysis (docs/performance.md "roofline") shows
the engine step is pass-bound on these partial tiles: filling the MXU's M
dimension is worth ~2.5x on the dot pipeline.

This module fills M with a *software wavefront* (the "layer-pipelined
block-diagonal packing" design from docs/performance.md): split the B streams
into G groups and keep group g exactly g pipeline stages behind group 0.
At every micro-step the G groups sit at G *distinct* consecutive stages, so
their G different layer weights pack into one block-diagonal matmul

    W_packed = blockdiag(W_conv[l_0], ..., W_conv[l_{G-1}])   # (sum O, sum K*C)
    y_packed = W_packed @ concat_g(tap_windows_g)              # cols = T * (B/G)

with M = sum(O_g) up to 128 (8 groups x 16 channels) instead of 16. The
layer1x1 residual projections pack the same way. The off-diagonal zeros
contribute exact float zeros in every MXU pass, so the only numerical
difference vs the unpacked engine is K-tile accumulation grouping — the same
FMA-reordering noise class as the reference's inline-GEMM vs Eigen dual
build (within the 5e-5 tolerance of tools/test/test_a2_fast.cpp:276-278).

Semantics: one wall-block invocation consumes one input block and emits one
output block per stream, but every stream's output is delayed by exactly ONE
block (the pipeline fill) relative to the unpacked engine:

    y_t(wavefront) == y_{t-1}(engine)

a uniform, documented serving latency trade (T/48k extra seconds) — the TPU
analog of the latency/throughput staging in the reference's A2 ring design
(NAM/wavenet/a2_fast.cpp:340-402). Equivalence is pinned by
tests/test_wavefront.py, the same contract as the reference's A2-fast vs
generic gate (tools/test/test_a2_fast.cpp:270-311) with the one-block shift.

Cold-start caveat: from an UN-prewarmed zero state, groups that begin
mid-pipeline execute the tail stages of a phantom pre-stream block with zero
registers, seeding their rings with bias-driven values instead of the
engine's literal zero history; the shifted equivalence then holds only after
ceil(receptive_field / T) + 1 blocks. prewarm (the default on reset, as in
the reference — DSP::prewarm, NAM/dsp.cpp:67-101) reaches the zero-input
fixed point and removes the transient entirely.

Eligible configs (wavefront_ineligible_reason returns None): WaveNet without
FiLM/gating/groups/bottleneck/head1x1/post-head/condition-DSP, scalar
condition (the flagship + the whole legacy a1 family). Everything else stays
on the generic engine — mirroring the reference's shape-gated A2 dispatch
(NAM/wavenet/a2_fast.cpp:758-910).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import activations as act
from ..ops.layers import Conv1dSpec
from ..ops.ring import dot_ctb, ring_conv_init, ring_conv_step, conv1d_w_ctb
from .wavenet import (
    NONE,
    FILM_SITES,
    WaveNetConfig,
    _head_rechannel_spec,
    _layer_conv_spec,
    _layer_film_spec,
    _rechannel_spec,
)


# =============================================================================
# Eligibility gate (the analog of is_a2_shape, NAM/wavenet/a2_fast.cpp:758-910)
# =============================================================================


def wavefront_ineligible_reason(cfg: WaveNetConfig) -> Optional[str]:
    """None if the config can run on the wavefront engine, else why not."""
    if cfg.condition_config is not None:
        return "nested condition DSP"
    if cfg.head is not None:
        return "post-stack head"
    if cfg.in_channels != 1:
        return "multi-channel input"
    for ac in cfg.layer_arrays:
        if ac.condition_size != 1:
            return "condition_size != 1"
        if ac.bottleneck != ac.channels:
            return "bottleneck != channels"
        if not ac.layer1x1_active:
            return "layer1x1 inactive"
        if ac.head1x1_active:
            return "head1x1 active"
        if ac.groups_input != 1 or ac.groups_input_mixin != 1 or ac.layer1x1_groups != 1:
            return "grouped convs"
        if any(m != NONE for m in ac.gating_modes):
            return "gating/blending"
        for i in range(ac.num_layers):
            for site in FILM_SITES:
                if _layer_film_spec(ac, i, site) is not None:
                    return "FiLM"
    return None


# =============================================================================
# Stage schedule
# =============================================================================
#
# The model flattens into a linear list of stages; the wavefront advances
# every group by one stage per micro-step, S micro-steps per wall block.
#
#   RECHANNEL(ai)      x: (in, T, Bg) -> (C_ai, T, Bg); starts a new block
#   LAYER(ai, i)       dilated conv + bias + mixin + act + layer1x1 residual,
#                      head accumulation (reference: model.cpp:166-376)
#   HEAD_RECHANNEL(ai) head_acc -> next array's head input / final output
#                      (reference: model.cpp:382-383, 510)


@dataclasses.dataclass(frozen=True)
class _Stage:
    kind: str  # "rechannel" | "layer" | "head_rechannel"
    ai: int
    li: int = -1


def _build_stages(cfg: WaveNetConfig) -> List[_Stage]:
    stages: List[_Stage] = []
    for ai, ac in enumerate(cfg.layer_arrays):
        stages.append(_Stage("rechannel", ai))
        for i in range(ac.num_layers):
            stages.append(_Stage("layer", ai, i))
        stages.append(_Stage("head_rechannel", ai))
    return stages


def _reg_channels_after(cfg: WaveNetConfig, stage_idx: int, stages: List[_Stage]) -> int:
    """Channel count of the residual register after executing stages[stage_idx]."""
    st = stages[stage_idx]
    return cfg.layer_arrays[st.ai].channels


def _head_channels_after(cfg: WaveNetConfig, stage_idx: int, stages: List[_Stage]) -> int:
    """Channel count of the head accumulator after executing stages[stage_idx]."""
    st = stages[stage_idx]
    ac = cfg.layer_arrays[st.ai]
    if st.kind == "head_rechannel":
        return ac.head_size
    return ac.head_output_size


# =============================================================================
# Engine prepare
# =============================================================================


def _packed_layer_weights(cfg, params, active: List[Tuple[int, _Stage]]):
    """Block-diagonal conv / layer1x1 weights for one micro-step's active
    LAYER stages. active is [(g, stage)] sorted by g; shapes are static."""
    convs = []  # (O_g, K_g * C_g) engine-layout conv weights
    l1x1s = []  # (C_g, C_g)
    conv_b = []
    mix_w = []
    l1_b = []
    for g, st in active:
        lp = params["arrays"][st.ai]["layers"][st.li]
        w = np.asarray(lp["conv"]["w"])  # (K, C, O)
        K, C, O = w.shape
        convs.append(w.transpose(2, 0, 1).reshape(O, K * C))
        conv_b.append(np.asarray(lp["conv"]["b"]))
        mix_w.append(np.asarray(lp["mixin"]["w"]).reshape(-1))  # (1, O) -> (O,)
        l1x1s.append(np.asarray(lp["layer1x1"]["w"]).T)  # stored (in, out) -> (O, I)
        l1_b.append(np.asarray(lp["layer1x1"]["b"]))
    M = sum(w.shape[0] for w in convs)
    Kt = sum(w.shape[1] for w in convs)
    Wc = np.zeros((M, Kt), dtype=np.float32)
    r = c = 0
    for w in convs:
        Wc[r : r + w.shape[0], c : c + w.shape[1]] = w
        r += w.shape[0]
        c += w.shape[1]
    Mi = sum(w.shape[1] for w in l1x1s)
    Wl = np.zeros((sum(w.shape[0] for w in l1x1s), Mi), dtype=np.float32)
    r = c = 0
    for w in l1x1s:
        Wl[r : r + w.shape[0], c : c + w.shape[1]] = w
        r += w.shape[0]
        c += w.shape[1]
    return {
        "conv_w": jnp.asarray(Wc),
        "conv_b": jnp.asarray(np.concatenate(conv_b)),
        "mix_w": jnp.asarray(np.concatenate(mix_w)),
        "l1_w": jnp.asarray(Wl),
        "l1_b": jnp.asarray(np.concatenate(l1_b)),
    }


def wavefront_prepare(
    cfg: WaveNetConfig, params, T: int, batch: int, groups: int
) -> Tuple[Dict, Dict]:
    """Engine-layout packed weights + ring/pipeline state.

    batch must divide into `groups` equal lane-aligned slices.
    """
    reason = wavefront_ineligible_reason(cfg)
    if reason is not None:
        raise ValueError(f"config not eligible for the wavefront engine: {reason}")
    stages = _build_stages(cfg)
    S = len(stages)
    G = int(groups)
    if not (1 <= G <= S):
        raise ValueError(f"wavefront groups must be in [1, {S}], got {G}")
    if batch % G != 0:
        raise ValueError(f"batch ({batch}) must be divisible by wavefront groups ({G})")
    Bg = batch // G

    eparams: Dict[str, Any] = {
        "head_scale": params["head_scale"],
        "rechannel": [],
        "head_rechannel": [],
        "phases": [],
    }
    for ai, ac in enumerate(cfg.layer_arrays):
        ap = params["arrays"][ai]
        # rechannel is a no-bias 1x1; scalar input -> keep as (C, in) matrix.
        eparams["rechannel"].append(jnp.asarray(np.asarray(ap["rechannel"]["w"]).T.copy()))
        eparams["head_rechannel"].append(conv1d_w_ctb(_head_rechannel_spec(ac), ap["head_rechannel"]))

    # Per micro-step packed weights for the active LAYER stages.
    for s in range(S):
        active = []
        for g in range(G):
            st = stages[(s - g) % S]
            if st.kind == "layer":
                active.append((g, st))
        eparams["phases"].append(_packed_layer_weights(cfg, params, active) if active else None)

    # Ring state per conv stage (full-B chunks; groups write their B-slice).
    state: Dict[str, Any] = {"rings": {}, "groups": []}
    for idx, st in enumerate(stages):
        ac = cfg.layer_arrays[st.ai]
        if st.kind == "layer":
            spec = _layer_conv_spec(ac, st.li)
        elif st.kind == "head_rechannel":
            spec = _head_rechannel_spec(ac)
        else:
            continue
        if spec.receptive_field > 0:
            state["rings"][idx] = ring_conv_init(spec, T, batch)

    # Pipeline registers: group g sits g stages behind group 0. At the
    # invocation boundary group g has just executed stage S-1-g; its residual
    # register / head accumulator / in-flight condition block carry over.
    for g in range(G):
        if g == 0:
            state["groups"].append({"y": jnp.zeros((cfg.out_channels_, T, Bg), jnp.float32)})
            continue
        boundary = S - 1 - g  # last stage executed in the previous invocation
        creg = _reg_channels_after(cfg, boundary, stages)
        chead = _head_channels_after(cfg, boundary, stages)
        state["groups"].append(
            {
                "reg": jnp.zeros((creg, T, Bg), jnp.float32),
                "head": jnp.zeros((chead, T, Bg), jnp.float32),
                "cond": jnp.zeros((cfg.in_channels, T, Bg), jnp.float32),
            }
        )
    return eparams, state


# =============================================================================
# Step
# =============================================================================


def _ring_windows(spec: Conv1dSpec, T: int, ring, x_g, g0: int, Bg: int):
    """Tap windows for one group's B-slice of a shared full-B ring.

    Returns (windows list [(C, T, Bg)], taps K..1 oldest-first then current),
    mirroring ops.ring._tap_window (the RingBuffer Read(n, lookback) contract,
    NAM/conv1d.cpp:244-252) with a static B-slice."""
    K, d = spec.kernel_size, spec.dilation
    lookbacks = [(K - 1 - k) * d for k in range(K)]

    def chunk_rel(m_back):
        if m_back == 0:
            return x_g
        chunks, n = ring["chunks"], ring["n"]
        M, C = chunks.shape[0], chunks.shape[1]
        slot = jax.lax.rem(n - m_back + 2 * M, M)
        # ONE fused dynamic_slice for (slot, :, :, group) — slicing the slot
        # first would copy the full-B chunk and throw away (G-1)/G of it.
        zero = jnp.zeros((), jnp.int32)
        c = jax.lax.dynamic_slice(
            chunks, (slot, zero, zero, jnp.int32(g0)), (1, C, T, Bg)
        )
        return c[0]

    slab = None
    if any(0 < a <= T for a in lookbacks) and spec.receptive_field > 0:
        slab = jnp.concatenate([chunk_rel(1), x_g], axis=1)  # logical [-T, T)

    windows = []
    for a in lookbacks:
        if a == 0:
            windows.append(x_g)
        elif a <= T and slab is not None:
            windows.append(jax.lax.slice_in_dim(slab, T - a, 2 * T - a, axis=1))
        else:
            j, o = divmod(a, T)
            if o == 0:
                windows.append(chunk_rel(j))
            else:
                left = chunk_rel(j + 1)[:, T - o :, :]
                right = chunk_rel(j)[:, : T - o, :]
                windows.append(jnp.concatenate([left, right], axis=1))
    return windows


def _ring_write(ring, x_g, g0: int):
    """Write one group's B-slice into the shared ring at the current slot."""
    chunks, n = ring["chunks"], ring["n"]
    upd = jax.lax.dynamic_update_slice(chunks, x_g[None], (n, 0, 0, g0))
    return {"chunks": upd, "n": n}


def wavefront_step(cfg: WaveNetConfig, T: int, groups: int, eparams, state, x):
    """One wall-block: x (in, T, B) -> (y (out, T, B), state').

    y is the previous block's result for every stream (uniform one-block
    pipeline latency; see module docstring)."""
    stages = _build_stages(cfg)
    S = len(stages)
    G = int(groups)
    B = x.shape[2]
    Bg = B // G

    rings = dict(state["rings"])
    # Mutable per-group registers for this invocation.
    regs: List[Optional[jnp.ndarray]] = [None] * G
    heads: List[Optional[jnp.ndarray]] = [None] * G
    conds: List[Optional[jnp.ndarray]] = [None] * G
    outs: List[Optional[jnp.ndarray]] = [None] * G
    for g in range(1, G):
        regs[g] = state["groups"][g]["reg"]
        heads[g] = state["groups"][g]["head"]
        conds[g] = state["groups"][g]["cond"]

    def x_slice(g):
        return jax.lax.slice_in_dim(x, g * Bg, (g + 1) * Bg, axis=2)

    for s in range(S):
        # --- non-layer stages + window building for the packed dot ---------
        active: List[Tuple[int, _Stage, int]] = []  # (g, stage, stage_idx)
        win_stack: List[jnp.ndarray] = []
        for g in range(G):
            idx = (s - g) % S
            st = stages[idx]
            ac = cfg.layer_arrays[st.ai]
            if st.kind == "rechannel":
                if idx == 0:
                    # Group g begins a fresh input block.
                    conds[g] = x_slice(g)
                    heads[g] = None
                h_in = conds[g] if idx == 0 else regs[g]
                regs[g] = dot_ctb(eparams["rechannel"][st.ai], h_in)
            elif st.kind == "layer":
                spec = _layer_conv_spec(ac, st.li)
                ring = rings.get(idx)
                wins = _ring_windows(spec, T, ring, regs[g], g * Bg, Bg) if ring is not None else [regs[g]] * spec.kernel_size
                win_stack.extend(wins)
                active.append((g, st, idx))
            else:  # head_rechannel
                spec = _head_rechannel_spec(ac)
                ring = rings.get(idx)
                if ring is not None:
                    wins = _ring_windows(spec, T, ring, heads[g], g * Bg, Bg)
                    stacked = jnp.concatenate(wins, axis=0) if len(wins) > 1 else wins[0]
                    rings[idx] = _ring_write(ring, heads[g], g * Bg)
                else:
                    stacked = heads[g]
                ho = dot_ctb(eparams["head_rechannel"][st.ai]["w"], stacked)
                if "b" in eparams["head_rechannel"][st.ai]:
                    ho = ho + eparams["head_rechannel"][st.ai]["b"][:, None, None]
                if st.ai + 1 < len(cfg.layer_arrays):
                    heads[g] = ho  # carried into the next array's accumulator
                else:
                    outs[g] = eparams["head_scale"] * ho

        if not active:
            continue

        # --- packed LAYER stages -------------------------------------------
        pw = eparams["phases"][s]
        stacked = jnp.concatenate(win_stack, axis=0) if len(win_stack) > 1 else win_stack[0]
        z = dot_ctb(pw["conv_w"], stacked)
        z = z + pw["conv_b"][:, None, None]
        # Input mixin: scalar condition broadcast per group's row block
        # (reference: detail.h:47-49; condition_size == 1 by eligibility).
        cond_rows = jnp.concatenate(
            [jnp.broadcast_to(conds[g], (cfg.layer_arrays[st.ai].channels, T, Bg)) for g, st, _ in active],
            axis=0,
        )
        z = z + pw["mix_w"][:, None, None] * cond_rows

        # Activation per group block (all-identical activations fuse anyway).
        a_blocks = []
        r = 0
        for g, st, _ in active:
            C = cfg.layer_arrays[st.ai].channels
            a_blocks.append(act.apply(cfg.layer_arrays[st.ai].activations[st.li], z[r : r + C], channel_axis=0))
            r += C
        a = jnp.concatenate(a_blocks, axis=0) if len(a_blocks) > 1 else a_blocks[0]

        l1 = dot_ctb(pw["l1_w"], a) + pw["l1_b"][:, None, None]

        # Unpack: residual update, head accumulation, ring writes.
        r = 0
        for g, st, idx in active:
            C = cfg.layer_arrays[st.ai].channels
            a_g = jax.lax.slice_in_dim(a, r, r + C, axis=0)
            l_g = jax.lax.slice_in_dim(l1, r, r + C, axis=0)
            if idx in rings:
                rings[idx] = _ring_write(rings[idx], regs[g], g * Bg)
            heads[g] = a_g if heads[g] is None else heads[g] + a_g
            regs[g] = regs[g] + l_g
            r += C

    # Advance every ring's slot once per wall block.
    for idx in list(rings.keys()):
        ring = rings[idx]
        M = ring["chunks"].shape[0]
        rings[idx] = {"chunks": ring["chunks"], "n": jax.lax.rem(ring["n"] + 1, M)}

    # Uniform one-block latency: emit last invocation's group-0 output now,
    # stage this invocation's.
    y_parts = [state["groups"][0]["y"]] + [outs[g] for g in range(1, G)]
    y = jnp.concatenate(y_parts, axis=2) if G > 1 else y_parts[0]

    new_groups = [{"y": outs[0]}]
    for g in range(1, G):
        head = heads[g]
        if head is None:  # boundary right after an idx==0 stage (G == S)
            head = jnp.zeros(
                (cfg.layer_arrays[0].head_output_size, T, Bg), dtype=jnp.float32
            )
        new_groups.append({"reg": regs[g], "head": head, "cond": conds[g]})
    return y, {"rings": rings, "groups": new_groups}


# =============================================================================
# Engine wrapper
# =============================================================================


class WavefrontEngine:
    """StreamEngine-compatible wrapper (fixed T, (C, T, B) layout) running the
    wavefront-packed step. Output is uniformly delayed by one block."""

    #: Extra blocks of latency vs the unpacked engine.
    pipeline_blocks = 1

    def __init__(self, model, batch: int, block_size: int, groups: int = 8):
        if hasattr(model, "active_model"):
            model = model.active_model
        self.model = model
        self.batch = int(batch)
        self.block_size = int(block_size)
        self.groups = int(groups)
        cfg = model.config
        if not isinstance(cfg, WaveNetConfig):
            raise ValueError("WavefrontEngine supports WaveNet models only")
        self._eparams, self._state0 = wavefront_prepare(
            cfg, model.params, self.block_size, self.batch, self.groups
        )
        self._jitted_step = jax.jit(
            partial(wavefront_step, cfg, self.block_size, self.groups), donate_argnums=(1,)
        )

    @property
    def params(self):
        return self._eparams

    def init_state(self):
        _, state = wavefront_prepare(
            self.model.config, self.model.params, self.block_size, self.batch, self.groups
        )
        return state

    def prewarm(self, state):
        n = self.model.get_prewarm_samples()
        blocks = -(-n // self.block_size) + self.pipeline_blocks if n > 0 else self.pipeline_blocks
        zeros = jnp.zeros(
            (self.model.num_input_channels, self.block_size, self.batch), dtype=jnp.float32
        )
        for _ in range(blocks):
            _, state = self._jitted_step(self.params, state, zeros)
        return state

    def reset(self, prewarm: Optional[bool] = None):
        state = self.init_state()
        do_prewarm = self.model.prewarm_on_reset if prewarm is None else prewarm
        if do_prewarm:
            state = self.prewarm(state)
        return state

    def step_fn(self):
        return self._jitted_step

    def process(self, x, state):
        x = jnp.asarray(x, dtype=jnp.float32)
        squeeze = x.ndim == 2
        if squeeze:
            x = x[..., None]
        if x.shape[1] != self.block_size:
            raise ValueError(
                f"WavefrontEngine is specialized to block_size={self.block_size}; got {x.shape[1]}"
            )
        y, state = self._jitted_step(self.params, state, x.transpose(2, 1, 0))
        y = y.transpose(2, 1, 0)
        if squeeze and y.shape[-1] == 1:
            y = y[..., 0]
        return y, state
