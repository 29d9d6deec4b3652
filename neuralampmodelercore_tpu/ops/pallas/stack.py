"""Fused WaveNet-stack Pallas kernel: the whole block step in ONE kernel.

Why this exists (measured on TPU v5e, flagship wavenet_a1_standard, B=1024,
T=64, f32-exact): the XLA engine step costs ~870-980 us/block, of which only
~190 us is MXU/VPU compute (tools/microbench_pallas_dots.py) — the rest is
HBM traffic: every layer's tap-stacked (K*C, T*B) operand is materialized to
HBM by the concat and re-read by the dot, and every ring-chunk read is a
full-chunk HBM->HBM copy. This kernel keeps the entire layer stack
VMEM-resident:

  - activations flow layer-to-layer inside VMEM; nothing intermediate touches
    HBM;
  - dilated-conv tap windows are assembled in VMEM from ring chunks DMA'd
    directly from HBM (one 512 KB contiguous copy per chunk, one layer of
    read lookahead);
  - ring state is updated in place via aliased kernel outputs (the TPU
    analog of the reference's constant-cost pow2 rings,
    NAM/wavenet/a2_fast.cpp:340-402) — O(T) write traffic per layer;
  - shallow layers (receptive field rf <= T) carry only a TAIL of rf
    columns instead of full T-column ring chunks: their windows never look
    further back than the previous block's last rf samples, so storing /
    fetching whole chunks wastes (T - rf)/T of the traffic. On the flagship
    (dilations 1..512) 6-7 of every 10 layers are shallow at T=128, and the
    tail path removes ~40% of the kernel's HBM traffic exactly (no precision
    change). This is the TPU analog of sizing each reference ring buffer to
    its own receptive field (NAM/conv1d.cpp:122-143) rather than the block;
  - dots run at f32-exact precision (Mosaic's default f32 dot is a single
    bf16 pass, ~9e-2 absolute error on unit-variance operands — measured,
    rejected; HIGHEST is ~3e-6).

Layout: everything is 2D (channels, T*W) per 128-stream tile; the stream
batch rides the lane axis (W = 128 lanes), time rides lane-tile blocks, so a
time slice at a block-size multiple is lane-tile aligned and free. Ring
chunks are stored (M, n_tiles, C, T*W) so a chunk fetch is one contiguous
DMA.

Semantics are identical to models.wavenet.engine_step (itself pinned to the
generic step and the reference renders): reference graph Layer::Process,
NAM/wavenet/model.cpp:166-376; ring-read contract NAM/conv1d.cpp:244-252.
Equivalence is tested in tests/test_pallas_stack.py (interpret mode) and
enforced on-device by cli.bench_engine's agreement gate.

Capability gate (``supports``): groups == 1, no FiLM sites, no LUT-mode
activations, head_kernel_size == 1, no post-stack head, no nested condition
DSP, batch % 128 == 0. Everything else — any kernel sizes/dilations, gated /
blended modes, bottleneck != channels, layer1x1 / head1x1 — is handled.
Unsupported configs fall back to the XLA engine step (models.engine picks
automatically).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import activations as act

W_TILE = 128  # streams per half-tile (one lane tile)

# VMEM budget for the footprint model below. v5e/v5p cores have 128 MB of
# VMEM; Mosaic's *default* scoped limit is only 16 MB, so `step` raises it
# via CompilerParams(vmem_limit_bytes=VMEM_LIMIT). The budget leaves
# headroom for Mosaic-internal scratch and the double-buffered in/out grid
# blocks that the footprint model doesn't count.
VMEM_LIMIT = 128 * (1 << 20)
VMEM_BUDGET = 96 * (1 << 20)


def _footprint_rows(cfg, T: int) -> int:
    """Worst-layer VMEM footprint in units of (rows x T*W) f32 buffers:
    layer input scratch (2C), chunk scratch (2*nc*C), the stacked operand
    (K*C), live values (~4C: z/aout/next/hd). Tail layers (rf <= T) use one
    chunk buffer."""
    rows = 0
    for ac in cfg.layer_arrays:
        for li in range(ac.num_layers):
            K, d = ac.kernel_sizes[li], ac.dilations[li]
            rf = (K - 1) * d
            if 0 < rf <= T:
                nc = 1
            else:
                js = set()
                for k in range(K):
                    a_lb = (K - 1 - k) * d
                    if a_lb == 0:
                        continue
                    j, o = divmod(a_lb, T)
                    js.update((j,) if o == 0 else ((j + 1, j) if j >= 1 else (j + 1,)))
                nc = len(js)
            rows = max(rows, (2 + 2 * nc + K + 4) * ac.channels)
    return rows


def _pick_w(cfg, T: int, batch: int) -> int:
    """Largest tile width (512/256/128 streams) that divides the batch and
    keeps the kernel's VMEM footprint inside budget. Measured on v5e
    (tools/ablate_pallas_stack.py): 256-stream tiles are ~30% faster than
    128 on the flagship — fewer grid steps amortize per-tile DMA waits and
    stores. A tile is processed as H = width/128 half-tiles of 128 streams
    whose compute stages are software-pipelined against each other (heavy
    VPU activations of one half overlap MXU dots of the next)."""
    rows = _footprint_rows(cfg, T)
    for w in (512, 256, 128):
        if batch % w == 0 and rows * T * w * 4 <= VMEM_BUDGET:
            return w
    return 0  # not even a 128-stream tile fits: caller must fall back

# Interpret mode for CPU testing (tests/test_pallas_stack.py sets this).
INTERPRET = False

# f32-exact. See module docstring for the measured default-precision failure.
DOT_PRECISION = jax.lax.Precision.HIGHEST

NONE, GATED, BLENDED = "none", "gated", "blended"


# =============================================================================
# Static plan
# =============================================================================


@dataclasses.dataclass(frozen=True)
class _LayerPlan:
    K: int
    d: int
    conv_out: int
    bn: int
    rf: int  # receptive field (K-1)*d
    lookbacks: Tuple[int, ...]  # per tap, k ascending => lookback descending
    js: Tuple[int, ...]  # distinct past-chunk indices to fetch (all >= 1)
    M: int  # ring slots (0 => no ring)
    ring: int  # ring index (-1 => none)
    tail: int  # tail-state index for shallow layers (rf <= T); -1 => none
    slot_base: int  # offset into the slots vector (-1 => none)
    conv_w: int
    conv_b: int
    mixin_w: int
    l1_w: int  # -1 => inactive
    l1_b: int
    h1_w: int
    h1_b: int
    gating: str
    act1: Any
    act2: Any


@dataclasses.dataclass(frozen=True)
class _ArrayPlan:
    C: int  # channels
    I: int  # input size
    S: int  # condition size
    L: int
    head_in: int  # head accumulation channels (head_output_size)
    head_out: int  # head_size
    rech_w: int
    hr_w: int
    hr_b: int
    layers: Tuple[_LayerPlan, ...]
    # scratch indices
    cur_scr: int
    chunk_scr: int  # -1 if no ring layers
    rsem: int
    wsem: int
    n_chunk_bufs: int


@dataclasses.dataclass(frozen=True)
class _Plan:
    T: int
    W: int  # streams per half-tile (always 128)
    H: int  # half-tiles per grid step
    nt: int  # grid size (batch // (H*W))
    Cin: int
    Cout: int
    n_weights: int
    n_rings: int
    n_tails: int
    n_slots: int
    arrays: Tuple[_ArrayPlan, ...]
    ring_shapes: Tuple[Tuple[int, int, int, int], ...]
    tail_shapes: Tuple[Tuple[int, int, int], ...]  # (nt, C, H*rf*W)
    scratch_shapes: Tuple[Any, ...]


def supports(cfg, T: int, batch: int) -> Optional[str]:
    """None if the fused kernel handles this config, else the reason why not."""
    from ...models.wavenet import WaveNetConfig

    if not isinstance(cfg, WaveNetConfig):
        return f"not a WaveNetConfig: {type(cfg).__name__}"
    if cfg.head is not None:
        return "post-stack head"
    if cfg.condition_config is not None:
        return "nested condition DSP"
    if batch % W_TILE != 0 or batch < W_TILE:
        return f"batch {batch} not a multiple of {W_TILE}"
    for ai, ac in enumerate(cfg.layer_arrays):
        if ac.groups_input != 1 or ac.groups_input_mixin != 1:
            return f"array {ai}: grouped conv/mixin"
        if ac.layer1x1_active and ac.layer1x1_groups != 1:
            return f"array {ai}: grouped layer1x1"
        if ac.head1x1_active and ac.head1x1_groups != 1:
            return f"array {ai}: grouped head1x1"
        for name, f in ac.films:
            if f.active:
                return f"array {ai}: FiLM site {name}"
        if ac.head_kernel_size != 1 or ac.head_dilation != 1:
            return f"array {ai}: head rechannel kernel_size/dilation != 1"
        for a_cfg in list(ac.activations) + list(ac.secondary_activations):
            if a_cfg.type in act._luts:
                return f"LUT-mode activation {a_cfg.type}"
    if _pick_w(cfg, T, batch) == 0:
        return f"VMEM budget exceeded at T={T} (block too large for the fused kernel)"
    return None


def _build_plan(cfg, params, T: int, batch: int):
    """Static plan + flat weight list. Deterministic given (cfg, T, batch)."""
    if batch % W_TILE:
        raise ValueError(f"batch must be a multiple of {W_TILE}")
    width = _pick_w(cfg, T, batch)
    if width == 0:
        raise ValueError(f"fused kernel VMEM budget exceeded at T={T}")
    W = W_TILE
    H = width // W
    nt = batch // width
    TW = T * width  # columns per grid tile (H half-tiles of T*W)

    weights: List[jnp.ndarray] = []
    scratch: List[Any] = []
    ring_shapes: List[Tuple[int, int, int, int]] = []
    tail_shapes: List[Tuple[int, int, int]] = []
    arrays: List[_ArrayPlan] = []
    n_slots = 0

    def add_w(a: np.ndarray) -> int:
        weights.append(jnp.asarray(np.ascontiguousarray(a, dtype=np.float32)))
        return len(weights) - 1

    for ai, ac in enumerate(cfg.layer_arrays):
        ap = params["arrays"][ai]
        C, I, S, L = ac.channels, ac.input_size, ac.condition_size, ac.num_layers
        rech_w = add_w(np.asarray(ap["rechannel"]["w"]).T)  # (C, I)

        layer_plans: List[_LayerPlan] = []
        n_chunk_bufs = 0
        for li in range(L):
            lp = ap["layers"][li]
            K, d = ac.kernel_sizes[li], ac.dilations[li]
            conv_out = ac.conv_out_channels(li)
            rf = (K - 1) * d
            lookbacks = tuple((K - 1 - k) * d for k in range(K))
            M, ring, tail, slot_base = 0, -1, -1, -1
            js_t: Tuple[int, ...] = ()
            if 0 < rf <= T:
                # Shallow layer: carry only the last rf columns as state.
                tail = len(tail_shapes)
                tail_shapes.append((nt, C, H * rf * W))
                n_chunk_bufs = max(n_chunk_bufs, 1)
            elif rf > 0:
                js: set = set()
                for a_lb in lookbacks:
                    if a_lb == 0:
                        continue
                    j, o = divmod(a_lb, T)
                    if o == 0:
                        js.add(j)
                    else:
                        js.add(j + 1)
                        if j >= 1:
                            js.add(j)
                js_t = tuple(sorted(js))
                M = rf // T + 2
                ring = len(ring_shapes)
                ring_shapes.append((M, nt, C, TW))
                slot_base = n_slots
                n_slots += len(js_t) + 1  # reads + write slot
                n_chunk_bufs = max(n_chunk_bufs, len(js_t))

            w = np.asarray(lp["conv"]["w"])  # (K, C, conv_out)
            conv_w = add_w(w.transpose(2, 0, 1).reshape(conv_out, K * C))
            conv_b = add_w(np.asarray(lp["conv"]["b"])[:, None])
            mixin_w = add_w(np.asarray(lp["mixin"]["w"]).T)  # (conv_out, S)
            l1_w = l1_b = h1_w = h1_b = -1
            if ac.layer1x1_active:
                l1_w = add_w(np.asarray(lp["layer1x1"]["w"]).T)  # (C, bn)
                l1_b = add_w(np.asarray(lp["layer1x1"]["b"])[:, None])
            if ac.head1x1_active:
                h1_w = add_w(np.asarray(lp["head1x1"]["w"]).T)
                h1_b = add_w(np.asarray(lp["head1x1"]["b"])[:, None])
            layer_plans.append(
                _LayerPlan(
                    K=K, d=d, conv_out=conv_out, bn=ac.bottleneck, rf=rf,
                    lookbacks=lookbacks, js=js_t, M=M, ring=ring, tail=tail,
                    slot_base=slot_base, conv_w=conv_w, conv_b=conv_b,
                    mixin_w=mixin_w, l1_w=l1_w, l1_b=l1_b, h1_w=h1_w, h1_b=h1_b,
                    gating=ac.gating_modes[li],
                    act1=ac.activations[li], act2=ac.secondary_activations[li],
                )
            )

        hr = np.asarray(ap["head_rechannel"]["w"])  # (1, head_in, head_out)
        hr_w = add_w(hr[0].T)  # (head_out, head_in)
        hr_b = add_w(np.asarray(ap["head_rechannel"]["b"])[:, None]) if "b" in ap["head_rechannel"] else -1

        cur_scr = len(scratch)
        scratch.append(pltpu.VMEM((2, C, TW), jnp.float32))
        if n_chunk_bufs > 0:
            chunk_scr = len(scratch)
            scratch.append(pltpu.VMEM((2, n_chunk_bufs, C, TW), jnp.float32))
            rsem = len(scratch)
            scratch.append(pltpu.SemaphoreType.DMA((2, max(n_chunk_bufs, 1))))
        else:
            chunk_scr = rsem = -1
        # Write semaphores: [p, 0..H-1] for per-half tail writes, [p, H] for
        # the full-chunk ring write.
        wsem = len(scratch)
        scratch.append(pltpu.SemaphoreType.DMA((2, H + 1)))

        arrays.append(
            _ArrayPlan(
                C=C, I=I, S=S, L=L,
                head_in=ac.head_output_size, head_out=ac.head_size,
                rech_w=rech_w, hr_w=hr_w, hr_b=hr_b,
                layers=tuple(layer_plans),
                cur_scr=cur_scr, chunk_scr=chunk_scr, rsem=rsem, wsem=wsem,
                n_chunk_bufs=n_chunk_bufs,
            )
        )

    plan = _Plan(
        T=T, W=W, H=H, nt=nt, Cin=cfg.in_channels, Cout=cfg.out_channels_,
        n_weights=len(weights), n_rings=len(ring_shapes),
        n_tails=len(tail_shapes),
        n_slots=max(n_slots, 1),
        arrays=tuple(arrays), ring_shapes=tuple(ring_shapes),
        tail_shapes=tuple(tail_shapes),
        scratch_shapes=tuple(scratch),
    )
    return plan, weights


# =============================================================================
# Kernel
# =============================================================================


def _dot(w, x):
    return jax.lax.dot_general(
        w, x, (((1,), (0,)), ((), ())),
        precision=DOT_PRECISION, preferred_element_type=jnp.float32,
    )


def _small_dot(w, x):
    """(O, S) x (S, N): VPU broadcast-sum for tiny contraction dims (the
    input-mixin / input-rechannel case, S typically 1)."""
    S = w.shape[1]
    if S == 1:
        return w * x
    if S <= 4:
        y = w[:, 0:1] * x[0:1, :]
        for s in range(1, S):
            y = y + w[:, s : s + 1] * x[s : s + 1, :]
        return y
    return _dot(w, x)


def _make_kernel(plan: _Plan):
    NW, NR, NT = plan.n_weights, plan.n_rings, plan.n_tails
    T, W, H = plan.T, plan.W, plan.H
    TWh = T * W  # columns per half-tile

    def hslice(v, h):
        return v[:, h * TWh : (h + 1) * TWh]

    def kernel(slots_ref, *refs):
        x_ref = refs[0]
        wr = refs[1 : 1 + NW]
        rr = refs[1 + NW : 1 + NW + NR]
        ti = refs[1 + NW + NR : 1 + NW + NR + NT]
        y_ref = refs[1 + NW + NR + NT]
        ro = refs[2 + NW + NR + NT : 2 + NW + 2 * NR + NT]
        to = refs[2 + NW + 2 * NR + NT : 2 + NW + 2 * NR + 2 * NT]
        scr = refs[2 + NW + 2 * NR + 2 * NT :]
        i = pl.program_id(0)

        x_full = x_ref[:]  # (Cin, H*TWh) — condition == raw input (no cond DSP)
        cond = [hslice(x_full, h) for h in range(H)]
        prev_out = list(cond)
        head_acc = [None] * H

        for ap in plan.arrays:
            cur = scr[ap.cur_scr]  # (2, C, H*TWh) layer-input scratch
            chunks = scr[ap.chunk_scr] if ap.chunk_scr >= 0 else None
            rsem = scr[ap.rsem] if ap.rsem >= 0 else None
            wsem = scr[ap.wsem]
            pending_w = {0: [], 1: []}

            def issue_reads(li):
                lp = ap.layers[li]
                ds = []
                if lp.tail >= 0:
                    # one contiguous DMA: the whole (C, H*rf*W) tail into the
                    # front columns of chunk buffer 0
                    dma = pltpu.make_async_copy(
                        ti[lp.tail].at[i],
                        chunks.at[li % 2, 0, :, pl.ds(0, H * lp.rf * W)],
                        rsem.at[li % 2, 0],
                    )
                    dma.start()
                    ds.append(dma)
                    return ds
                for bi, j in enumerate(lp.js):
                    s = slots_ref[lp.slot_base + bi]
                    dma = pltpu.make_async_copy(
                        rr[lp.ring].at[s, i], chunks.at[li % 2, bi], rsem.at[li % 2, bi]
                    )
                    dma.start()
                    ds.append(dma)
                return ds

            def needs_read(lp):
                return bool(lp.js) or lp.tail >= 0

            # rechannel -> layer 0 input
            for h in range(H):
                cur[0, :, h * TWh : (h + 1) * TWh] = _small_dot(wr[ap.rech_w][:], prev_out[h])
            reads = issue_reads(0) if ap.layers and needs_read(ap.layers[0]) else []

            for li, lp in enumerate(ap.layers):
                p = li % 2
                last = li + 1 == ap.L
                pn = (li + 1) % 2
                for dma in reads:
                    dma.wait()
                xin = cur[p]  # (C, H*TWh) value

                # state write: this layer's input becomes history (in place,
                # aliased outputs; ring write slot never collides with read
                # slots; the tail read above completed before this write)
                if lp.tail >= 0:
                    rfW = lp.rf * W
                    for h in range(H):
                        wd = pltpu.make_async_copy(
                            cur.at[p, :, pl.ds(h * TWh + (T - lp.rf) * W, rfW)],
                            to[lp.tail].at[i, :, pl.ds(h * rfW, rfW)],
                            wsem.at[p, h],
                        )
                        wd.start()
                        pending_w[p].append(wd)
                elif lp.M:
                    wslot = slots_ref[lp.slot_base + len(lp.js)]
                    wd = pltpu.make_async_copy(
                        cur.at[p], ro[lp.ring].at[wslot, i], wsem.at[p, H]
                    )
                    wd.start()
                    pending_w[p].append(wd)

                # one-layer read lookahead: start the next layer's chunk DMAs
                # before this layer's compute (their parity buffers are free)
                if not last and needs_read(ap.layers[li + 1]):
                    reads = issue_reads(li + 1)
                else:
                    reads = []

                # free cur[pn] for this layer's output stores
                if not last:
                    for wd in pending_w[pn]:
                        wd.wait()
                    pending_w[pn] = []

                def chunk_val(j, li=li, lp=lp, xin=xin):
                    if j == 0:
                        return xin
                    return chunks[li % 2, lp.js.index(j)]

                # ---- per-half compute stages, software-pipelined so that
                # one half's heavy VPU activation overlaps the sibling
                # half's MXU dots (the single biggest serial cost: exact
                # tanh measured ~40% of the step, tools/ablate_pallas_stack.py)
                ctx = [dict() for _ in range(H)]

                def st_assemble(h, lp=lp, li=li, xin=xin, chunk_val=chunk_val, ctx=ctx):
                    wins = []
                    for a_lb in lp.lookbacks:
                        if a_lb == 0:
                            wins.append(hslice(xin, h))
                            continue
                        if lp.tail >= 0:
                            # window = [tail's last a_lb cols, block's first
                            # T - a_lb cols]
                            base = h * lp.rf * W
                            left = chunks[
                                li % 2, 0, :,
                                base + (lp.rf - a_lb) * W : base + lp.rf * W,
                            ]
                            if a_lb == T:
                                wins.append(left)
                            else:
                                wins.append(
                                    jnp.concatenate(
                                        [left, hslice(xin, h)[:, : (T - a_lb) * W]],
                                        axis=1,
                                    )
                                )
                            continue
                        j, o = divmod(a_lb, T)
                        if o == 0:
                            wins.append(hslice(chunk_val(j), h))
                        else:
                            left = hslice(chunk_val(j + 1), h)[:, (T - o) * W :]
                            right = hslice(chunk_val(j), h)[:, : (T - o) * W]
                            wins.append(jnp.concatenate([left, right], axis=1))
                    ctx[h]["stacked"] = (
                        jnp.concatenate(wins, axis=0) if len(wins) > 1 else wins[0]
                    )

                def st_conv(h, lp=lp, ctx=ctx):
                    ctx[h]["z"] = _dot(wr[lp.conv_w][:], ctx[h].pop("stacked"))

                def st_epilogue(h, lp=lp, ctx=ctx):
                    ctx[h]["z"] = (
                        ctx[h]["z"] + wr[lp.conv_b][:] + _small_dot(wr[lp.mixin_w][:], cond[h])
                    )

                def st_act(h, lp=lp, ctx=ctx):
                    z = ctx[h].pop("z")
                    bn = lp.bn
                    if lp.gating == NONE:
                        aout = act.apply(lp.act1, z, channel_axis=0)
                    elif lp.gating == GATED:
                        aout = act.apply(lp.act1, z[:bn], channel_axis=0) * act.apply(
                            lp.act2, z[bn:], channel_axis=0
                        )
                    else:  # BLENDED
                        alpha = act.apply(lp.act2, z[bn:], channel_axis=0)
                        aout = (
                            alpha * act.apply(lp.act1, z[:bn], channel_axis=0)
                            + (1.0 - alpha) * z[:bn]
                        )
                    ctx[h]["a"] = aout

                def st_l1(h, lp=lp, ctx=ctx):
                    if lp.l1_w >= 0:
                        ctx[h]["l1"] = _dot(wr[lp.l1_w][:], ctx[h]["a"]) + wr[lp.l1_b][:]

                def st_tail(h, lp=lp, li=li, xin=xin, ctx=ctx, last=last, pn=pn):
                    aout = ctx[h].pop("a")
                    nxt = hslice(xin, h)
                    if lp.l1_w >= 0:
                        nxt = nxt + ctx[h].pop("l1")
                    hd = aout if lp.h1_w < 0 else _dot(wr[lp.h1_w][:], aout) + wr[lp.h1_b][:]
                    head_acc[h] = hd if head_acc[h] is None else head_acc[h] + hd
                    if last:
                        prev_out[h] = nxt
                    else:
                        cur[pn, :, h * TWh : (h + 1) * TWh] = nxt

                stages = (st_assemble, st_conv, st_epilogue, st_act, st_l1, st_tail)
                # wavefront order: stage s of half h runs at wave s + h, so
                # (act, h) sits next to (conv/l1, h+1) in issue order
                for wave in range(len(stages) + H - 1):
                    for h in range(H):
                        s = wave - h
                        if 0 <= s < len(stages):
                            stages[s](h)

            for p in (0, 1):
                for wd in pending_w[p]:
                    wd.wait()
                pending_w[p] = []

            # head rechannel (k=1 by the capability gate)
            for h in range(H):
                ha = _dot(wr[ap.hr_w][:], head_acc[h])
                if ap.hr_b >= 0:
                    ha = ha + wr[ap.hr_b][:]
                head_acc[h] = ha

        for h in range(H):
            y_ref[:, h * TWh : (h + 1) * TWh] = head_acc[h]

    return kernel


# =============================================================================
# Engine-facing API (mirrors models.wavenet.engine_prepare / engine_step)
# =============================================================================


def prepare(cfg, params, T: int, batch: int):
    """Engine-layout weights + ring state for the fused kernel."""
    reason = supports(cfg, T, batch)
    if reason is not None:
        raise ValueError(f"pallas stack kernel does not support this config: {reason}")
    plan, weights = _build_plan(cfg, params, T, batch)
    state = {
        "rings": [jnp.zeros(s, jnp.float32) for s in plan.ring_shapes],
        "tails": [jnp.zeros(s, jnp.float32) for s in plan.tail_shapes],
        "n": jnp.zeros((), jnp.int32),
    }
    eparams = {"weights": weights, "head_scale": jnp.asarray(params["head_scale"], jnp.float32)}
    return eparams, state


def step(cfg, T: int, eparams, state, x):
    """Block step, engine CTB convention: x (Cin, T, B) -> (y (Cout, T, B), state')."""
    B = x.shape[2]
    plan, _ = _build_plan_cached(cfg, T, B)
    W, H, nt = plan.W, plan.H, plan.nt
    TW = H * T * W  # columns per grid tile

    # slots vector: per ring layer, read slots then write slot
    n = state["n"]
    vals = []
    for ap in plan.arrays:
        for lp in ap.layers:
            if lp.M:
                for j in lp.js:
                    vals.append(jax.lax.rem(n - j + 2 * lp.M, lp.M))
                vals.append(jax.lax.rem(n, lp.M))
    slots = (
        jnp.stack(vals).astype(jnp.int32) if vals else jnp.zeros((1,), jnp.int32)
    )

    # global layout: 128-stream tiles on columns (col = tile128*T*W + t*W + w);
    # each grid step covers H consecutive 128-tiles as one contiguous block
    x2 = x.reshape(plan.Cin, T, nt * H, W).transpose(0, 2, 1, 3).reshape(plan.Cin, nt * TW)

    weights = eparams["weights"]
    rings = state["rings"]
    tails = state["tails"]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec((plan.Cin, TW), lambda i, s: (0, i), memory_space=pltpu.VMEM)]
        + [
            pl.BlockSpec(w.shape, (lambda i, s, nd=w.ndim: (0,) * nd), memory_space=pltpu.VMEM)
            for w in weights
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in rings]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in tails],
        out_specs=[pl.BlockSpec((plan.Cout, TW), lambda i, s: (0, i), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in rings]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in tails],
        scratch_shapes=list(plan.scratch_shapes),
    )
    # input operand r (0=slots, 1=x, 2..=weights, then rings, then tails)
    # -> output 1+r (0=y, rings, tails): all state updates in place
    NWt, NRt, NTt = len(weights), len(rings), len(tails)
    aliases = {2 + NWt + r: 1 + r for r in range(NRt + NTt)}
    out = pl.pallas_call(
        _make_kernel(plan),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((plan.Cout, nt * TW), jnp.float32),
            *[jax.ShapeDtypeStruct(r.shape, r.dtype) for r in rings],
            *[jax.ShapeDtypeStruct(t.shape, t.dtype) for t in tails],
        ),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=INTERPRET,
    )(slots, x2, *weights, *rings, *tails)
    y2 = out[0]
    new_rings = list(out[1 : 1 + NRt])
    new_tails = list(out[1 + NRt :])

    y = y2.reshape(plan.Cout, nt * H, T, W).transpose(0, 2, 1, 3).reshape(plan.Cout, T, B)
    y = eparams["head_scale"] * y
    return y, {"rings": new_rings, "tails": new_tails, "n": n + 1}


# Plans are static pure-Python; cache by config identity (configs are built
# once per model and never mutated).
_PLAN_CACHE: Dict[Tuple[int, int, int], Any] = {}


def _build_plan_cached(cfg, T: int, B: int):
    key = (id(cfg), T, B)
    hit = _PLAN_CACHE.get(key)
    if hit is not None and hit[2] is cfg:
        return hit[0], hit[1]
    plan, weights = _build_plan(cfg, _params_shape_only(cfg), T, B)
    _PLAN_CACHE[key] = (plan, None, cfg)
    return plan, None


def _params_shape_only(cfg):
    """Zero params with the right shapes — _build_plan only uses shapes to
    assign weight indices; ``step`` never uses the weight VALUES from the
    plan build (they come in via eparams)."""
    arrays = []
    for ac in cfg.layer_arrays:
        layers = []
        for li in range(ac.num_layers):
            K = ac.kernel_sizes[li]
            co = ac.conv_out_channels(li)
            lp = {
                "conv": {"w": np.zeros((K, ac.channels, co), np.float32), "b": np.zeros(co, np.float32)},
                "mixin": {"w": np.zeros((ac.condition_size, co), np.float32)},
            }
            if ac.layer1x1_active:
                lp["layer1x1"] = {
                    "w": np.zeros((ac.bottleneck, ac.channels), np.float32),
                    "b": np.zeros(ac.channels, np.float32),
                }
            if ac.head1x1_active:
                lp["head1x1"] = {
                    "w": np.zeros((ac.bottleneck, ac.head1x1_out_channels), np.float32),
                    "b": np.zeros(ac.head1x1_out_channels, np.float32),
                }
            layers.append(lp)
        a = {
            "rechannel": {"w": np.zeros((ac.input_size, ac.channels), np.float32)},
            "layers": layers,
            "head_rechannel": {"w": np.zeros((1, ac.head_output_size, ac.head_size), np.float32)},
        }
        if ac.head_bias:
            a["head_rechannel"]["b"] = np.zeros(ac.head_size, np.float32)
        arrays.append(a)
    return {"arrays": arrays, "head_scale": np.float32(0)}
