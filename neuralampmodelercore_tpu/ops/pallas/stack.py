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
    directly from HBM (one 512 KB copy per chunk, contiguous on the HBM
    side, one layer of read lookahead);
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
chunks are stored (M, n_tiles, C, T*W) so a chunk fetch is one DMA whose
HBM source is contiguous.

Semantics are identical to models.wavenet.engine_step (itself pinned to the
generic step and the compiled-reference renders, tests/test_ref_goldens.py):
reference graph Layer::Process, NAM/wavenet/model.cpp:166-376; ring-read
contract NAM/conv1d.cpp:244-252; FiLM NAM/film.h:76-190; head rechannel
model.cpp:382-383,510; post-stack head model.cpp:21-86,776-805.
Equivalence is tested in tests/test_pallas_stack.py (interpret mode) and
enforced on-device by cli.bench_engine's agreement gate.

Coverage (``supports``): any kernel sizes / dilations, gated / blended
modes, bottleneck != channels, layer1x1 / head1x1, all 8 FiLM sites,
grouped and depthwise convs everywhere (block-diagonal weights are
densified at prepare time — zeros contribute nothing, and at these channel
counts the MXU runs the dense dot at the same cost), head rechannel with
kernel_size > 1 / dilation > 1 (receptive field <= T, carried as tail
state — covers the A2 family's k=16 head, NAM/wavenet/a2_fast.h:30-43),
the post-stack head, and nested condition DSPs: WaveNet condition chains
FUSE into the kernel itself as prelude nets (deepest first, each feeding
the next net's condition — `_fused_chain`; round 2 measured the hybrid
XLA-prepass + pallas program ~4x slower than pure XLA because the
pallas_call serialized against the pre-pass, so fusion is what makes the
condition-DSP corpus models pallas-viable), while non-WaveNet condition
DSPs (e.g. LSTM) run as an XLA engine-tier pre-pass whose output enters
the kernel as a second input.
LUT-mode activations run in-kernel too (round 3): `_lut_apply` is
gather-free — it re-evaluates the base function at the bracketing grid
points instead of fetching table entries (a real gather serializes
per-element on TPU: measured 170x slower, tools/bench_lut.py).
Remaining gate: batch % 128 != 0, head/post-head receptive field > T, and
configs whose VMEM footprint exceeds the budget — those fall back to the
XLA engine step (models.engine picks automatically).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import activations as act

W_TILE = 128  # streams per half-tile (one lane tile)

# f32 sublane tile. Every buffer that is the source or destination of a
# manual DMA (ring chunks, tail states, their scratch) pads its channel dim
# to this multiple: Mosaic rejects memref slices whose second-to-minor dim
# is not tile-aligned (hit on-device by C=3 models like wavenet.nam /
# A2-nano). Compute slices values back to the logical C; padding rows carry
# don't-care data end to end.
SUBLANE = 8


def _pad8(c: int) -> int:
    return -(-c // SUBLANE) * SUBLANE

# VMEM budget for the footprint model below. v5e/v5p cores have 128 MB of
# VMEM; Mosaic's *default* scoped limit is only 16 MB, so `step` raises it
# via CompilerParams(vmem_limit_bytes=VMEM_LIMIT). The budget leaves
# headroom for Mosaic-internal scratch and the double-buffered in/out grid
# blocks that the footprint model doesn't count.
VMEM_LIMIT = 128 * (1 << 20)
VMEM_BUDGET = 96 * (1 << 20)


def _layer_num_chunks(K: int, d: int, T: int) -> int:
    """Distinct past ring chunks a deep layer (rf > T) fetches per block."""
    js = set()
    for k in range(K):
        a_lb = (K - 1 - k) * d
        if a_lb == 0:
            continue
        j, o = divmod(a_lb, T)
        if o == 0:
            js.add(j)
        else:
            js.add(j + 1)
            if j >= 1:
                js.add(j)
    return len(js)


def _footprint_rows(cfg, T: int) -> int:
    """Worst-layer VMEM footprint in units of (rows x T*W) f32 buffers:
    layer input scratch (2C), chunk scratch (2*nc*C), the stacked operand
    (K*C), live values (~4C: z/aout/next/hd), FiLM scratch (2C when
    conv_pre_film needs a filmed-input buffer). Tail layers (rf <= T) use
    one chunk buffer. Head-rechannel / post-stack-head tail convs add their
    store+fetch buffers and stacked operand on top (they coexist with the
    layer scratch). Fused condition-DSP nets add their own whole footprint
    (their scratch buffers are statically allocated alongside the main
    net's). The per-layer part is pinned to the on-device sweep
    (tools/sweep_vmem_tiles.py) by tests/test_pallas_stack.py."""
    chain = _fused_chain(cfg, T)
    extra_nets = sum(_footprint_rows_single(c, T) for c in chain) if chain else 0
    return _footprint_rows_single(cfg, T) + extra_nets


def _footprint_rows_single(cfg, T: int) -> int:
    rows = 0
    for ac in cfg.layer_arrays:
        # Count PHYSICAL rows: every VMEM buffer pads its sublane
        # (second-to-minor) dim to a multiple of 8 — both the explicitly
        # _pad8-allocated DMA buffers and Mosaic's tiling of compute values
        # — so a logical-C count undercounts by up to 8/3x for C=3 models.
        C = _pad8(ac.channels)
        any_pre_film = dict(ac.films)["conv_pre_film"].active
        for li in range(ac.num_layers):
            K, d = ac.kernel_sizes[li], ac.dilations[li]
            rf = (K - 1) * d
            if 0 < rf <= T:
                nc = 1
            elif rf > T:
                nc = _layer_num_chunks(K, d, T)
            else:
                nc = 0
            layer_rows = (2 + 2 * nc + K + 4) * max(C, _pad8(ac.conv_out_channels(li)))
            if any_pre_film:
                layer_rows += 2 * C
            rows = max(rows, layer_rows)
    extra = 0
    for ac in cfg.layer_arrays:
        hr_rf = (ac.head_kernel_size - 1) * ac.head_dilation
        if hr_rf > 0:
            extra += (2 + ac.head_kernel_size) * _pad8(ac.head_output_size) + _pad8(ac.head_size)
    if cfg.head is not None:
        cin = _pad8(cfg.head.in_channels)
        for k in cfg.head.kernel_sizes:
            if k > 1:
                extra += (2 + k) * cin + _pad8(cfg.head.channels)
            cin = _pad8(cfg.head.channels)
    return rows + extra


def _pick_w(cfg, T: int, batch: int) -> int:
    """Largest tile width (1024/512/256/128 streams) that divides the batch
    and keeps the kernel's VMEM footprint inside budget. Measured on v5e
    (tools/ablate_pallas_stack.py + round-2 probes): wider is monotonically
    faster while it fits — 256 is ~30% over 128, and 1024 shaves another
    ~2.5% over 512 at flagship T=64 B=4096 — fewer grid steps amortize
    per-tile DMA waits and stores. A tile is processed as H = width/128
    half-tiles of 128 streams whose compute stages are software-pipelined
    against each other (heavy VPU activations of one half overlap MXU dots
    of the next)."""
    if _wavefront_reason(cfg, T) is None:
        rows = _footprint_rows_wf(cfg, T)
    else:
        rows = _footprint_rows(cfg, T)
    for w in (1024, 512, 256, 128):
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
class _TailConv:
    """A conv whose history (rf <= T) is carried as a tail state: the
    per-array head rechannel (any kernel_size/dilation with rf <= T — the A2
    family's k=16 head, NAM/wavenet/a2_fast.h:30-43) and the post-stack head
    convs (k >= 1, d = 1, model.cpp:21-44). rf == 0 means a plain 1x1 dot."""

    K: int
    d: int
    cin: int
    cout: int
    rf: int
    w: int  # stacked weight idx: (cout, K*cin)
    b: int  # -1 => no bias
    tail: int  # tail-state idx (-1 iff rf == 0)
    store: int  # scratch idx: (cin, TW) DMA-source buffer (-1 iff rf == 0)
    chunk: int  # scratch idx: (cin, TW) tail-fetch buffer (-1 iff rf == 0)
    sem: int  # scratch idx: DMA sem (2,) [0]=read [1]=write (-1 iff rf == 0)


@dataclasses.dataclass(frozen=True)
class _WfMicro:
    """One wavefront micro-step: the active (layer, sub-tile) pairs plus the
    packed block-diagonal weight indices for their fused dots."""

    active: Tuple[Tuple[int, int], ...]  # (li, tau), ascending li
    conv_w: int  # (sum C, sum K*C) block-diagonal
    conv_b: int  # (sum C, 1)
    mix_w: int  # (sum C, 1) — scalar condition per group
    l1_w: int  # (sum C, sum C) block-diagonal
    l1_b: int  # (sum C, 1)


@dataclasses.dataclass(frozen=True)
class _WfSegment:
    """A schedule segment: either a wavefront-packed run of consecutive
    shallow layers or a single whole-block (deep / unpacked) layer."""

    kind: str  # "wf" | "layer"
    li: int = -1  # for "layer"
    lis: Tuple[int, ...] = ()  # for "wf": consecutive layer indices
    micros: Tuple[_WfMicro, ...] = ()


@dataclasses.dataclass(frozen=True)
class _WfPlan:
    """Time-axis wavefront packing for one array (docs/performance.md
    "layer-pipelined block-diagonal packing"; the XLA-tier prototype was
    models/wavefront.py). The block's T frames split into G sub-tiles;
    inside a run of shallow layers, (layer l, sub-tile tau) executes at
    micro-step l + tau, so up to G *different* layers' conv / layer1x1
    weights pack block-diagonally into ONE dot — M rises from C (16 on the
    flagship) toward G*C, and MXU pass count per micro is
    ceil(sum(K*C)/128) instead of one pass per layer. Pure compute
    reordering: zero added latency, same state layout, outputs within
    FMA-reorder noise of the unpacked path (the same noise class as the
    reference's inline-GEMM vs Eigen builds, tools/test/test_a2_fast.cpp:
    276-278)."""

    G: int
    D: int  # depth of the layer-input buffer ring (>= G + 2)
    segments: Tuple[_WfSegment, ...]
    cur_scr: int  # (D, C_pad, TW) layer-input ring
    head_scr: int  # (head_in_pad, TW) head accumulator
    tail_scrs: Tuple[int, ...]  # per-layer dedicated tail buf (-1 if none)
    rsem: int  # DMA sems (L,) tail reads
    wsem: int  # DMA sems (L, H+1) tail/ring writes


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
    # Per-tap (conv_out, C) weight indices (same values as conv_w, split on
    # the tap axis). TAP_DOTS consumes these: z = sum_k W_k @ window_k, which
    # skips materializing the (K*C, T*W) stacked operand entirely.
    conv_w_taps: Tuple[int, ...]
    mixin_w: int
    l1_w: int  # -1 => inactive
    l1_b: int
    h1_w: int
    h1_b: int
    gating: str
    act1: Any
    act2: Any
    # Active FiLM sites: (site, w_idx, b_idx, input_dim, shift)
    # (reference: NAM/film.h:76-190; sites detail.h:103-154)
    films: Tuple[Tuple[str, int, int, int, bool], ...]


@dataclasses.dataclass(frozen=True)
class _ArrayPlan:
    C: int  # channels
    I: int  # input size
    S: int  # condition size
    L: int
    head_in: int  # head accumulation channels (head_output_size)
    head_out: int  # head_size
    rech_w: int
    hr: _TailConv  # head rechannel
    layers: Tuple[_LayerPlan, ...]
    # scratch indices
    cur_scr: int
    film_scr: int  # (2, C, TW) filmed-input buffer; -1 if no conv_pre_film
    chunk_scr: int  # -1 if no ring layers
    rsem: int
    wsem: int
    n_chunk_bufs: int
    wf: Optional[_WfPlan] = None  # wavefront packing (None => unpacked path)


@dataclasses.dataclass(frozen=True)
class _NetPlan:
    """One full WaveNet in the fused chain. nets[:-1] are nested condition
    DSPs (deepest first), each consuming the raw input as both its input and
    its condition and feeding its output as the NEXT net's condition; the
    last net is the main model (reference: WaveNet::_process_condition runs
    the nested DSP on the input, NAM/wavenet/model.cpp:699-729)."""

    arrays: Tuple[_ArrayPlan, ...]
    head_scale_w: int
    head_act: Any  # post-stack head activation (None if no post head)
    pheads: Tuple[_TailConv, ...]


@dataclasses.dataclass(frozen=True)
class _Plan:
    T: int
    W: int  # streams per half-tile (always 128)
    H: int  # half-tiles per grid step
    nt: int  # grid size (batch // (H*W))
    Cin: int
    Cout: int
    S: int  # condition channels entering the kernel
    has_cond: bool  # separate condition input (XLA pre-pass condition DSP)
    n_weights: int
    n_rings: int
    n_tails: int
    n_slots: int
    nets: Tuple[_NetPlan, ...]  # condition chain (deepest first) + main
    ring_shapes: Tuple[Tuple[int, int, int, int], ...]
    tail_shapes: Tuple[Tuple[int, int, int], ...]  # (nt, C, H*rf*W)
    scratch_shapes: Tuple[Any, ...]

    @property
    def all_arrays(self) -> Tuple[_ArrayPlan, ...]:
        return tuple(ap for net in self.nets for ap in net.arrays)


def _single_cfg_gate(cfg, T: int) -> Optional[str]:
    """Per-WaveNetConfig kernel gates (ignoring condition DSP and batch).
    LUT-mode activations are NOT gated: _lut_apply is gather-free (it
    re-evaluates the base function at the bracketing grid points,
    ops/activations.py), so it runs inside the kernel like any other
    elementwise activation."""
    for ai, ac in enumerate(cfg.layer_arrays):
        hr_rf = (ac.head_kernel_size - 1) * ac.head_dilation
        if hr_rf > T:
            return f"array {ai}: head rechannel receptive field {hr_rf} > T={T}"
    if cfg.head is not None:
        for k in cfg.head.kernel_sizes:
            if k - 1 > T:
                return f"post-stack head conv receptive field {k - 1} > T={T}"
    return None


def _fused_chain(cfg, T: int) -> Optional[Tuple[Any, ...]]:
    """The nested-condition-DSP chain (deepest first) when EVERY nested
    condition DSP is itself a WaveNetConfig the kernel handles — those fuse
    into the same kernel as prelude nets, eliminating the XLA pre-pass
    entirely (round-2 measurement: the hybrid XLA-prepass + pallas program
    ran ~4x slower than pure XLA because the pallas_call serialized against
    the pre-pass). None => no condition, or fall back to the pre-pass."""
    from ...models.wavenet import WaveNetConfig

    chain = []
    c = cfg.condition_config
    while c is not None:
        if not isinstance(c, WaveNetConfig) or _single_cfg_gate(c, T) is not None:
            return None
        chain.append(c)
        c = c.condition_config
    return tuple(reversed(chain)) if chain else None


def cond_mode(cfg, T: int) -> str:
    """'none' | 'fused' (condition chain runs inside the kernel) |
    'prepass' (XLA engine tier pre-pass feeding a second kernel input)."""
    if getattr(cfg, "condition_config", None) is None:
        return "none"
    return "fused" if _fused_chain(cfg, T) is not None else "prepass"


# Wavefront packing (see _WfPlan) — implemented, equivalence-tested (CPU
# interpret + on-device 1.9e-6 agreement), and measured on v5e at the
# headline point (flagship, T=128, B=4096, tools/probe_wavefront.py):
#
#   unpacked W=512: 2530 us   unpacked W=256: 2610 us
#   wavefront W=512: 3062 us  wavefront W=256: 3101-3155 us
#
# i.e. the packing is ~20% SLOWER at equal tile width, in both the
# fused-halves and half-pipelined forms. Root cause per the ablations: at
# wide shapes the kernel is NOT dot-pass-bound (M=16 vs M=64 packing moves
# nothing) and NOT activation-bound (identity-activation ablation measures
# the SAME 2517 us as exact tanh at T=128/B=4096 — the T=64/B=1024 "tanh is
# 40%" finding does not transfer to wide shapes), so the packed schedule's
# extra fine-grained window-slice/concat ops and head-buffer read-modify-
# write traffic cost more than the pass-count reduction saves. Kept
# default-OFF as a documented negative result (the same class as round 3's
# W=1024 finding); the flag remains for A/B re-testing on future hardware
# where the MXU/VPU balance differs.
WAVEFRONT = False

# Per-tap conv dots (measured NEGATIVE, round 5): z = sum_k W_k @ window_k
# instead of one dot on the row-concatenated (K*C, T*W) operand. On-device at
# the headline point (B=4096, T=128) this is 1.6x SLOWER (3,086 -> 4,966
# us/block raw-loop): the row concat it removes is cheap, while each extra
# dot call costs ~1.5 us regardless of its contraction depth (the MXU tiles
# M and K to 128 either way). That measurement pinned the dot cost law in
# the plateau note below. Kept for A/B re-testing; equivalence-tested both
# ways.
TAP_DOTS = False

# Round-5 kernel-plateau attribution (measured on-device via _ABLATE at
# B=4096, T=128, flagship; docs/performance.md has the full table). The
# step decomposes ADDITIVELY: dots ~1,880 us + exposed DMA ~290 us + VPU
# floor ~400 us ~= the 2,5xx us step — VPU work does not hide under the
# MXU here. Dot time follows a strict cost law: proportional to OUTPUT
# ROWS x COLUMNS, independent of contraction depth up to the 128-deep MXU
# tile, and 3x cheaper at 1-pass DEFAULT precision (1,371 us whole-step —
# but 4.5e-2 error, far outside the 5e-5 reference gate). Five structural
# restructurings all landed on the same plateau, each implemented, tested
# and then removed (git history): per-tap dots (+60%: tripled call count
# at fixed M*N), block-diagonal MXU-call coalescing (2 convs + 2 layer1x1
# per call, K=128: -7%..0), W_TILE 256/512 (0), W=1024 tiles (VMEM
# thrash), deferred-layer1x1 K-folding (-10% M*N volume: 0). Conclusion:
# at C=16 channels and 3-pass f32, the headline step is at its structural
# floor; the remaining levers are precision (blocked by the reference
# equivalence gate) and hardware with a different small-M matmul rate.
WF_G = 4  # time sub-tiles; 4 quantizes best against 128-row K-tiles at the
#           flagship's K*C=48 (ceil(48*4/128)=2 passes for 4 packed layers)
#           and keeps the input-ring VMEM footprint at parity with the
#           unpacked path (G=8 computes the same pass count at 1.7x VMEM).


def _wavefront_reason(cfg, T: int) -> Optional[str]:
    """None if every array qualifies for time-axis wavefront packing, else
    why not. The gate mirrors the XLA prototype's eligibility
    (models/wavefront.py wavefront_ineligible_reason): the plain dilated
    stack without FiLM / gating / head1x1 / condition DSP — the flagship a1
    family and the slimmable wavenet."""
    from ...models.wavenet import FILM_SITES, _layer_film_spec

    if not WAVEFRONT:
        return "disabled"
    if getattr(cfg, "condition_config", None) is not None:
        return "condition DSP"
    if cfg.in_channels != 1:
        return "multi-channel input"
    if T % WF_G:
        return f"T={T} not divisible by G={WF_G}"
    packable = False
    for ac in cfg.layer_arrays:
        if ac.condition_size != 1:
            return "condition_size != 1"
        if ac.bottleneck != ac.channels:
            return "bottleneck != channels"
        if not ac.layer1x1_active:
            return "layer1x1 inactive"
        if ac.head1x1_active:
            return "head1x1 active"
        run = 0
        for li in range(ac.num_layers):
            if ac.gating_modes[li] != NONE:
                return "gating/blending"
            for site in FILM_SITES:
                if _layer_film_spec(ac, li, site) is not None:
                    return "FiLM"
            rf = (ac.kernel_sizes[li] - 1) * ac.dilations[li]
            run = run + 1 if rf <= T else 0
            packable = packable or run >= 2
    if not packable:
        return "no run of >= 2 consecutive shallow layers to pack"
    return None


def _wf_segments(ac, T: int) -> List[Tuple[str, Any]]:
    """Partition an array's layers into ("wf", [lis]) runs of >= 2
    consecutive shallow layers and ("layer", li) whole-block singles."""
    segs: List[Tuple[str, Any]] = []
    run: List[int] = []

    def flush():
        nonlocal run
        if len(run) >= 2:
            segs.append(("wf", run))
        else:
            segs.extend(("layer", li) for li in run)
        run = []

    for li in range(ac.num_layers):
        rf = (ac.kernel_sizes[li] - 1) * ac.dilations[li]
        if rf <= T:
            run.append(li)
        else:
            flush()
            segs.append(("layer", li))
    flush()
    return segs


def _blockdiag(mats: List[np.ndarray]) -> np.ndarray:
    M = sum(w.shape[0] for w in mats)
    K = sum(w.shape[1] for w in mats)
    out = np.zeros((M, K), dtype=np.float32)
    r = c = 0
    for w in mats:
        out[r : r + w.shape[0], c : c + w.shape[1]] = w
        r += w.shape[0]
        c += w.shape[1]
    return out


def _footprint_rows_wf(cfg, T: int) -> int:
    """VMEM footprint (rows x T*W units) of the wavefront path: per array,
    the persistent D-deep input ring + head accumulator + dedicated shallow
    tail buffers SUM across arrays (all statically allocated), plus the
    worst transient of a whole-block deep layer (chunk bufs + stacked
    operand + live values)."""
    G = WF_G
    D = G + 2
    rows = 0.0
    transient = 0
    for ac in cfg.layer_arrays:
        C = _pad8(ac.channels)
        rows += D * C + _pad8(ac.head_output_size)
        nc_max = 0
        for li in range(ac.num_layers):
            K, d = ac.kernel_sizes[li], ac.dilations[li]
            rf = (K - 1) * d
            if 0 < rf <= T:
                rows += C * (rf / T)  # dedicated tail buffer (C, H*rf*W)
            elif rf > T:
                nc_max = max(nc_max, _layer_num_chunks(K, d, T))
                # whole-block transient: stacked operand + ~4 live values
                transient = max(transient, (K + 4) * C)
        rows += 2 * nc_max * C  # per-array chunk scratch is static
        hr_rf = (ac.head_kernel_size - 1) * ac.head_dilation
        if hr_rf > 0:
            rows += (2 + ac.head_kernel_size) * _pad8(ac.head_output_size) + _pad8(ac.head_size)
    if cfg.head is not None:
        cin = _pad8(cfg.head.in_channels)
        for k in cfg.head.kernel_sizes:
            if k > 1:
                rows += (2 + k) * cin + _pad8(cfg.head.channels)
            cin = _pad8(cfg.head.channels)
    return int(math.ceil(rows)) + transient


def supports(cfg, T: int, batch: int) -> Optional[str]:
    """None if the fused kernel handles this config, else the reason why not."""
    from ...models.wavenet import WaveNetConfig

    if not isinstance(cfg, WaveNetConfig):
        return f"not a WaveNetConfig: {type(cfg).__name__}"
    if batch % W_TILE != 0 or batch < W_TILE:
        return f"batch {batch} not a multiple of {W_TILE}"
    reason = _single_cfg_gate(cfg, T)
    if reason is not None:
        return reason
    if cfg.condition_config is not None and _fused_chain(cfg, T) is None:
        # Pre-pass runs the nested DSP on the XLA engine tier; anything the
        # registry can build qualifies.
        from ... import registry

        try:
            sub = registry.arch_for_config(cfg.condition_config)
            registry.engine_fns(sub)
        except Exception as e:  # pragma: no cover - defensive
            return f"condition DSP has no engine tier: {e}"
    if _pick_w(cfg, T, batch) == 0:
        return f"VMEM budget exceeded at T={T} (block too large for the fused kernel)"
    return None


def _dense_1x1_w(p: Dict, cin: int, cout: int) -> np.ndarray:
    """Dense (cin, cout) weight from conv1x1 params (depthwise -> diagonal).
    Grouped weights are already stored dense block-diagonal
    (ops/layers.py conv1x1_params)."""
    if "dw" in p:
        return np.diag(np.asarray(p["dw"], dtype=np.float32))
    return np.asarray(p["w"], dtype=np.float32)


def _dense_conv_w(p: Dict, K: int, cin: int, cout: int) -> np.ndarray:
    """Dense (K, cin, cout) weight from conv1d params (depthwise -> per-tap
    diagonal)."""
    if "dw" in p:
        dw = np.asarray(p["dw"], dtype=np.float32)  # (K, C)
        w = np.zeros((K, cin, cout), dtype=np.float32)
        for k in range(K):
            np.fill_diagonal(w[k], dw[k])
        return w
    return np.asarray(p["w"], dtype=np.float32)


def _build_plan(cfg, params, T: int, batch: int):
    """Static plan + flat weight list. Deterministic given (cfg, T, batch)."""
    from ...models.wavenet import FILM_SITES, _layer_film_spec

    if batch % W_TILE:
        raise ValueError(f"batch must be a multiple of {W_TILE}")
    width = _pick_w(cfg, T, batch)
    if width == 0:
        raise ValueError(f"fused kernel VMEM budget exceeded at T={T}")
    W = W_TILE
    H = width // W
    nt = batch // width
    TW = T * width  # columns per grid tile (H half-tiles of T*W)

    # Fused condition chain: each nested WaveNet condition DSP becomes a
    # prelude net inside the same kernel (deepest first), its output feeding
    # the next net's condition — no XLA pre-pass, no kernel input for cond.
    chain = _fused_chain(cfg, T)
    net_specs: List[Tuple[Any, Any]] = []
    if chain:
        ps: List[Any] = []
        c, p = cfg, params
        while c.condition_config is not None:
            p = p["condition"]
            c = c.condition_config
            ps.append(p)  # shallowest condition first
        net_specs = list(zip(chain, reversed(ps)))  # deepest first
    net_specs.append((cfg, params))

    weights: List[jnp.ndarray] = []
    scratch: List[Any] = []
    ring_shapes: List[Tuple[int, int, int, int]] = []
    tail_shapes: List[Tuple[int, int, int]] = []
    nets: List[_NetPlan] = []
    n_slots = 0

    def add_w(a: np.ndarray) -> int:
        weights.append(jnp.asarray(np.ascontiguousarray(a, dtype=np.float32)))
        return len(weights) - 1

    def add_tail_conv(p: Dict, K: int, d: int, cin: int, cout: int, has_bias: bool) -> _TailConv:
        rf = (K - 1) * d
        w3 = _dense_conv_w(p, K, cin, cout)  # (K, cin, cout)
        w = add_w(w3.transpose(2, 0, 1).reshape(cout, K * cin))
        b = add_w(np.asarray(p["b"])[:, None]) if has_bias else -1
        if rf == 0:
            return _TailConv(K, d, cin, cout, 0, w, b, -1, -1, -1, -1)
        tail = len(tail_shapes)
        tail_shapes.append((nt, _pad8(cin), H * rf * W))
        store = len(scratch)
        scratch.append(pltpu.VMEM((_pad8(cin), TW), jnp.float32))
        chunk = len(scratch)
        scratch.append(pltpu.VMEM((_pad8(cin), TW), jnp.float32))
        sem = len(scratch)
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
        return _TailConv(K, d, cin, cout, rf, w, b, tail, store, chunk, sem)

    # Wavefront packing applies only to a single-net plan whose config passes
    # the gate (condition DSPs are excluded by the gate, so chains never mix).
    wf_top = _wavefront_reason(cfg, T) is None

    for net_cfg, net_params in net_specs:
      arrays: List[_ArrayPlan] = []
      for ai, ac in enumerate(net_cfg.layer_arrays):
        ap = net_params["arrays"][ai]
        C, I, S, L = ac.channels, ac.input_size, ac.condition_size, ac.num_layers
        rech_w = add_w(_dense_1x1_w(ap["rechannel"], I, C).T)  # (C, I)

        layer_plans: List[_LayerPlan] = []
        n_chunk_bufs = 0
        any_pre_film = False
        # Per-layer dense engine-layout weights, stashed for the wavefront
        # packed-weight build below (values identical to the unpacked
        # weights; the packing is block-diagonal concatenation).
        dense: List[Dict[str, np.ndarray]] = []
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
                tail_shapes.append((nt, _pad8(C), H * rf * W))
                if not wf_top:
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
                ring_shapes.append((M, nt, _pad8(C), TW))
                slot_base = n_slots
                n_slots += len(js_t) + 1  # reads + write slot
                n_chunk_bufs = max(n_chunk_bufs, len(js_t))

            w = _dense_conv_w(lp["conv"], K, C, conv_out)  # (K, C, conv_out)
            conv_np = w.transpose(2, 0, 1).reshape(conv_out, K * C)
            conv_w = add_w(conv_np)
            conv_w_taps = tuple(add_w(w[k].T) for k in range(K))  # (conv_out, C) each
            conv_b = add_w(np.asarray(lp["conv"]["b"])[:, None])
            mixin_w = add_w(_dense_1x1_w(lp["mixin"], S, conv_out).T)  # (conv_out, S)
            l1_w = l1_b = h1_w = h1_b = -1
            if ac.layer1x1_active:
                l1_np = _dense_1x1_w(lp["layer1x1"], ac.bottleneck, C).T  # (C, bn)
                l1_w = add_w(l1_np)
                l1_b = add_w(np.asarray(lp["layer1x1"]["b"])[:, None])
            if ac.head1x1_active:
                h1_np = _dense_1x1_w(lp["head1x1"], ac.bottleneck, ac.head1x1_out_channels).T
                h1_w = add_w(h1_np)
                h1_b = add_w(np.asarray(lp["head1x1"]["b"])[:, None])
            films: List[Tuple[str, int, int, int, bool]] = []
            for site in FILM_SITES:
                fspec = _layer_film_spec(ac, li, site)
                if fspec is None:
                    continue
                cs = fspec.cond_spec
                fw = add_w(_dense_1x1_w(lp[site], cs.in_channels, cs.out_channels).T)
                fb = add_w(np.asarray(lp[site]["b"])[:, None])
                films.append((site, fw, fb, fspec.input_dim, fspec.shift))
                if site == "conv_pre_film":
                    any_pre_film = True
            if wf_top:
                dense.append(
                    {
                        "conv": w.transpose(2, 0, 1).reshape(conv_out, K * C),
                        "conv_b": np.asarray(lp["conv"]["b"], np.float32)[:, None],
                        "mix": _dense_1x1_w(lp["mixin"], S, conv_out).T,
                        "l1": _dense_1x1_w(lp["layer1x1"], ac.bottleneck, C).T,
                        "l1_b": np.asarray(lp["layer1x1"]["b"], np.float32)[:, None],
                    }
                )
            layer_plans.append(
                _LayerPlan(
                    K=K, d=d, conv_out=conv_out, bn=ac.bottleneck, rf=rf,
                    lookbacks=lookbacks, js=js_t, M=M, ring=ring, tail=tail,
                    slot_base=slot_base, conv_w=conv_w, conv_b=conv_b,
                    conv_w_taps=conv_w_taps,
                    mixin_w=mixin_w, l1_w=l1_w, l1_b=l1_b, h1_w=h1_w, h1_b=h1_b,
                    gating=ac.gating_modes[li],
                    act1=ac.activations[li], act2=ac.secondary_activations[li],
                    films=tuple(films),
                )
            )

        hr = add_tail_conv(
            ap["head_rechannel"], ac.head_kernel_size, ac.head_dilation,
            ac.head_output_size, ac.head_size, "b" in ap["head_rechannel"],
        )

        wf: Optional[_WfPlan] = None
        if wf_top:
            # Wavefront mode: packed per-micro weights + dedicated scratch.
            G = WF_G
            D = G + 2  # input-ring depth: layer l's buffer lives micros
            #            [l-1, l+G-1]; slot l%D is first rewritten at micro
            #            l+D-1 = l+G+1, two micros after its last read.
            segs: List[_WfSegment] = []
            for kind, v in _wf_segments(ac, T):
                if kind == "layer":
                    segs.append(_WfSegment(kind="layer", li=v))
                    continue
                lis = tuple(v)
                micros: List[_WfMicro] = []
                for m in range(len(lis) + G - 1):
                    active = tuple(
                        (lis[j], m - j) for j in range(len(lis)) if 0 <= m - j < G
                    )
                    micros.append(
                        _WfMicro(
                            active=active,
                            conv_w=add_w(_blockdiag([dense[li]["conv"] for li, _ in active])),
                            conv_b=add_w(np.concatenate([dense[li]["conv_b"] for li, _ in active])),
                            mix_w=add_w(np.concatenate([dense[li]["mix"] for li, _ in active])),
                            l1_w=add_w(_blockdiag([dense[li]["l1"] for li, _ in active])),
                            l1_b=add_w(np.concatenate([dense[li]["l1_b"] for li, _ in active])),
                        )
                    )
                segs.append(_WfSegment(kind="wf", lis=lis, micros=tuple(micros)))
            wf_cur = len(scratch)
            scratch.append(pltpu.VMEM((D, _pad8(C), TW), jnp.float32))
            wf_head = len(scratch)
            scratch.append(pltpu.VMEM((_pad8(ac.head_output_size), TW), jnp.float32))
            tail_scrs: List[int] = []
            for lpn in layer_plans:
                if lpn.tail >= 0:
                    tail_scrs.append(len(scratch))
                    scratch.append(pltpu.VMEM((_pad8(C), H * lpn.rf * W), jnp.float32))
                else:
                    tail_scrs.append(-1)
            wf_rsem = len(scratch)
            scratch.append(pltpu.SemaphoreType.DMA((L,)))
            wf_wsem = len(scratch)
            scratch.append(pltpu.SemaphoreType.DMA((L, H + 1)))
            wf = _WfPlan(
                G=G, D=D, segments=tuple(segs), cur_scr=wf_cur,
                head_scr=wf_head, tail_scrs=tuple(tail_scrs),
                rsem=wf_rsem, wsem=wf_wsem,
            )
            cur_scr = film_scr = -1
        else:
            cur_scr = len(scratch)
            scratch.append(pltpu.VMEM((2, _pad8(C), TW), jnp.float32))
            if any_pre_film:
                film_scr = len(scratch)
                scratch.append(pltpu.VMEM((2, _pad8(C), TW), jnp.float32))
            else:
                film_scr = -1
        if n_chunk_bufs > 0:
            chunk_scr = len(scratch)
            scratch.append(pltpu.VMEM((2, n_chunk_bufs, _pad8(C), TW), jnp.float32))
            rsem = len(scratch)
            scratch.append(pltpu.SemaphoreType.DMA((2, max(n_chunk_bufs, 1))))
        else:
            chunk_scr = rsem = -1
        if wf is None:
            # Write semaphores: [p, 0..H-1] for per-half tail writes, [p, H]
            # for the full-chunk ring write.
            wsem = len(scratch)
            scratch.append(pltpu.SemaphoreType.DMA((2, H + 1)))
        else:
            wsem = -1

        arrays.append(
            _ArrayPlan(
                C=C, I=I, S=S, L=L,
                head_in=ac.head_output_size, head_out=ac.head_size,
                rech_w=rech_w, hr=hr,
                layers=tuple(layer_plans),
                cur_scr=cur_scr, film_scr=film_scr, chunk_scr=chunk_scr,
                rsem=rsem, wsem=wsem,
                n_chunk_bufs=n_chunk_bufs,
                wf=wf,
            )
        )

      head_scale_w = add_w(
          np.asarray(net_params["head_scale"], dtype=np.float32).reshape(1, 1)
      )
      pheads: List[_TailConv] = []
      head_act = None
      if net_cfg.head is not None:
          from ...models.wavenet import _head_conv_specs

          head_act = net_cfg.head.activation
          for si, spec in enumerate(_head_conv_specs(net_cfg.head)):
              pheads.append(
                  add_tail_conv(
                      net_params["head"][si], spec.kernel_size, spec.dilation,
                      spec.in_channels, spec.out_channels, spec.bias,
                  )
              )
      nets.append(
          _NetPlan(
              arrays=tuple(arrays), head_scale_w=head_scale_w,
              head_act=head_act, pheads=tuple(pheads),
          )
      )

    has_cond = cfg.condition_config is not None and chain is None
    plan = _Plan(
        T=T, W=W, H=H, nt=nt, Cin=cfg.in_channels, Cout=cfg.out_channels_,
        S=(cfg.layer_arrays[0].condition_size if has_cond else cfg.in_channels),
        has_cond=has_cond,
        n_weights=len(weights), n_rings=len(ring_shapes),
        n_tails=len(tail_shapes),
        n_slots=max(n_slots, 1),
        nets=tuple(nets), ring_shapes=tuple(ring_shapes),
        tail_shapes=tuple(tail_shapes),
        scratch_shapes=tuple(scratch),
    )
    return plan, weights


# =============================================================================
# Kernel
# =============================================================================


# Diagnostic ablations (tools/ablate_pallas_stack.py): "no_dot" replaces
# every MXU dot with a slice (wrong values, right shapes), "no_dma" skips
# all ring/tail state copies (stale windows). Never set in production.
_ABLATE: frozenset = frozenset()


class _NoDma:
    def start(self):
        pass

    def wait(self):
        pass


def _mk_copy(src, dst, sem):
    if "no_dma" in _ABLATE:
        return _NoDma()
    return pltpu.make_async_copy(src, dst, sem)


def _dot(w, x):
    if "no_dot" in _ABLATE:
        m = w.shape[0]
        return x[:m] if x.shape[0] >= m else jnp.concatenate([x] * (-(-m // x.shape[0])), axis=0)[:m]
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
    NC = 1 if plan.has_cond else 0

    def hslice(v, h):
        return v[:, h * TWh : (h + 1) * TWh]

    def kernel(slots_ref, *refs):
        x_ref = refs[0]
        cond_ref = refs[1] if plan.has_cond else refs[0]
        wr = refs[1 + NC : 1 + NC + NW]
        rr = refs[1 + NC + NW : 1 + NC + NW + NR]
        ti = refs[1 + NC + NW + NR : 1 + NC + NW + NR + NT]
        y_ref = refs[1 + NC + NW + NR + NT]
        ro = refs[2 + NC + NW + NR + NT : 2 + NC + NW + 2 * NR + NT]
        to = refs[2 + NC + NW + 2 * NR + NT : 2 + NC + NW + 2 * NR + 2 * NT]
        scr = refs[2 + NC + NW + 2 * NR + 2 * NT :]
        i = pl.program_id(0)

        x_full = x_ref[:]  # (Cin, H*TWh)
        x_halves = [hslice(x_full, h) for h in range(H)]
        # Condition: external pre-pass input (has_cond), else the raw input;
        # fused condition nets rebind `cond` to their output below.
        cond = [hslice(cond_ref[:], h) for h in range(H)] if plan.has_cond else x_halves
        prev_out = list(x_halves)
        head_acc = [None] * H
        pending_tail = []  # (dma, sem) pairs to wait before kernel end

        def film(v, fw, fb, dim, shift, h):
            # ss = W_f @ cond + b_f; out = v*scale (+ shift)
            # (reference: NAM/film.h:76-190)
            ss = _small_dot(wr[fw][:], cond[h]) + wr[fb][:]
            if shift:
                return v * ss[:dim] + ss[dim:]
            return v * ss

        def tail_conv_start_read(tc: _TailConv):
            """Prefetch the tail history; returns the DMA to wait on."""
            if tc.rf == 0:
                return None
            dma = _mk_copy(
                ti[tc.tail].at[i],
                scr[tc.chunk].at[:, pl.ds(0, H * tc.rf * W)],
                scr[tc.sem].at[0],
            )
            dma.start()
            return dma

        def tail_conv_apply(tc: _TailConv, vals, read_dma):
            """vals: per-half (cin, TWh) conv inputs -> per-half (cout, TWh).
            Handles state store + new-tail write + window assembly + dot."""
            if tc.rf > 0:
                st = scr[tc.store]
                for h in range(H):
                    st[: tc.cin, h * TWh : (h + 1) * TWh] = vals[h]
                read_dma.wait()  # old tail in chunk buf; HBM slot now reusable
                rfW = tc.rf * W
                for h in range(H):
                    wd = _mk_copy(
                        st.at[:, pl.ds(h * TWh + (T - tc.rf) * W, rfW)],
                        to[tc.tail].at[i, :, pl.ds(h * rfW, rfW)],
                        scr[tc.sem].at[1],
                    )
                    wd.start()
                    pending_tail.append(wd)
            outs = []
            for h in range(H):
                wins = []
                for k in range(tc.K):
                    a_lb = (tc.K - 1 - k) * tc.d
                    if a_lb == 0:
                        wins.append(vals[h])
                        continue
                    base = h * tc.rf * W
                    left = scr[tc.chunk][
                        : tc.cin, base + (tc.rf - a_lb) * W : base + tc.rf * W
                    ]
                    if a_lb == T:
                        wins.append(left)
                    else:
                        wins.append(
                            jnp.concatenate([left, vals[h][:, : (T - a_lb) * W]], axis=1)
                        )
                stacked = jnp.concatenate(wins, axis=0) if len(wins) > 1 else wins[0]
                y = _dot(wr[tc.w][:], stacked)
                if tc.b >= 0:
                    y = y + wr[tc.b][:]
                outs.append(y)
            return outs

        def wf_array(ap, prev_out, head_acc):
            """Wavefront-packed array body (see _WfPlan). Executes the
            static (layer, sub-tile) schedule: shallow runs as packed
            block-diagonal micro-dots, deep layers as whole-block barriers
            reusing the ring-chunk DMA machinery. Pure reordering of the
            unpacked body's compute — identical state layout and contents."""
            wf = ap.wf
            G, D = wf.G, wf.D
            Tg = T // G
            TgW = Tg * W
            C = ap.C
            Hc = ap.head_in  # == bottleneck == C by the wavefront gate
            cur = scr[wf.cur_scr]  # (D, C_pad, TW) layer-input ring
            headb = scr[wf.head_scr]
            chunks = scr[ap.chunk_scr] if ap.chunk_scr >= 0 else None
            crsem = scr[ap.rsem] if ap.rsem >= 0 else None
            trsem = scr[wf.rsem]
            twsem = scr[wf.wsem]

            hr_read = tail_conv_start_read(ap.hr)

            # Incoming head accumulation from the previous array (reference:
            # head flows through arrays, model.cpp:382-383, 510).
            have_head = head_acc[0] is not None
            if have_head:
                for h in range(H):
                    headb[:Hc, h * TWh : (h + 1) * TWh] = head_acc[h]

            # rechannel -> layer 0 input (slot 0)
            for h in range(H):
                cur[0, :C, h * TWh : (h + 1) * TWh] = _small_dot(
                    wr[ap.rech_w][:], prev_out[h]
                )

            # Prefetch every shallow layer's tail state into its dedicated
            # buffer (independent DMAs; each is waited at the layer's first
            # use, well after issue).
            tail_dma: Dict[int, Any] = {}
            for li, lp in enumerate(ap.layers):
                if lp.tail >= 0:
                    dma = _mk_copy(
                        ti[lp.tail].at[i], scr[wf.tail_scrs[li]], trsem.at[li]
                    )
                    dma.start()
                    tail_dma[li] = dma
            waited_tails: set = set()

            # ---- static schedule (python; trace-time only) ----------------
            positions: List[Tuple[str, Any]] = []
            for seg in wf.segments:
                if seg.kind == "layer":
                    positions.append(("whole", seg.li))
                else:
                    positions.extend(("wf", mi) for mi in seg.micros)
            pos_of: Dict[Any, int] = {}
            first_use: Dict[int, int] = {}
            for p_i, (kind, a) in enumerate(positions):
                if kind == "whole":
                    pos_of[a] = p_i
                    first_use.setdefault(a, p_i)
                else:
                    for li, tau in a.active:
                        pos_of[(li, tau)] = p_i
                        first_use.setdefault(li, p_i)
            comp: Dict[int, int] = {}  # position after which li's input is complete
            for li in range(ap.L):
                if li == 0:
                    comp[0] = -1
                elif (li - 1) in pos_of:
                    comp[li] = pos_of[li - 1]
                else:
                    comp[li] = pos_of[(li - 1, G - 1)]
            issue_tail: Dict[int, List[int]] = {}
            for li, lp in enumerate(ap.layers):
                if lp.tail >= 0:
                    issue_tail.setdefault(max(comp[li], first_use[li]), []).append(li)

            pending_by_slot: Dict[int, List[Any]] = {}
            cleared: set = set()

            def ensure_clear(s):
                """Wait DMAs still sourcing ring slot s before rewriting it."""
                for dma in pending_by_slot.pop(s, []):
                    dma.wait()

            def wait_tail_read(li):
                if li in tail_dma and li not in waited_tails:
                    tail_dma[li].wait()
                    waited_tails.add(li)

            def head_write(cols, val, first):
                if first:
                    headb[:Hc, cols] = val
                else:
                    headb[:Hc, cols] = headb[:Hc, cols] + val

            def tap_piece(li, lp, tau, a_lb, h):
                s0 = tau * Tg - a_lb
                hoff = h * TWh
                if s0 >= 0:
                    return cur[li % D, :C, hoff + s0 * W : hoff + s0 * W + TgW]
                tb = scr[wf.tail_scrs[li]]
                rf = lp.rf
                if s0 + Tg <= 0:
                    off = h * rf * W + (rf + s0) * W
                    return tb[:C, off : off + TgW]
                left = tb[:C, h * rf * W + (rf + s0) * W : h * rf * W + rf * W]
                right = cur[li % D, :C, hoff : hoff + (Tg + s0) * W]
                return jnp.concatenate([left, right], axis=1)

            def cat(parts, axis):
                return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else parts[0]

            def wf_micro(mi):
                # Per-HALF packed dots, stage-interleaved across halves in
                # wave order (stage s of half h at wave s + h): consecutive
                # micros form a serial dependency chain (each group's input
                # is written by its upstream group one micro earlier), so the
                # H independent half-chains are the kernel's only ILP — the
                # first fused-halves version serialized the heavy VPU
                # activation against the MXU dots and measured 20% SLOWER
                # than the unpacked path; this form restores the overlap
                # while keeping the M-packed pass-count win.
                for li, tau in mi.active:
                    if tau == 0:
                        wait_tail_read(li)
                        ensure_clear((li + 1) % D)
                ctx = [dict() for _ in range(H)]
                acts = [ap.layers[li].act1 for li, _ in mi.active]
                uniform = all(a == acts[0] for a in acts)

                def st_conv(h, mi=mi, ctx=ctx):
                    ops = []
                    for li, tau in mi.active:
                        lp = ap.layers[li]
                        ops.append(
                            cat([tap_piece(li, lp, tau, a_lb, h) for a_lb in lp.lookbacks], 0)
                        )
                    z = _dot(wr[mi.conv_w][:], cat(ops, 0)) + wr[mi.conv_b][:]
                    mixs = []
                    for g, (li, tau) in enumerate(mi.active):
                        cg = cond[h][:, tau * TgW : (tau + 1) * TgW]
                        mixs.append(wr[mi.mix_w][g * C : (g + 1) * C] * cg)
                    ctx[h]["z"] = z + cat(mixs, 0)

                def st_act(h, mi=mi, ctx=ctx, uniform=uniform, acts=acts):
                    z = ctx[h].pop("z")
                    if uniform:
                        ctx[h]["a"] = act.apply(acts[0], z, channel_axis=0)
                    else:
                        ctx[h]["a"] = cat(
                            [
                                act.apply(
                                    ap.layers[li].act1, z[g * C : (g + 1) * C], channel_axis=0
                                )
                                for g, (li, _) in enumerate(mi.active)
                            ],
                            0,
                        )

                def st_l1(h, mi=mi, ctx=ctx):
                    ctx[h]["l1"] = _dot(wr[mi.l1_w][:], ctx[h]["a"]) + wr[mi.l1_b][:]

                def st_wr(h, mi=mi, ctx=ctx):
                    av = ctx[h].pop("a")
                    l1 = ctx[h].pop("l1")
                    for g, (li, tau) in enumerate(mi.active):
                        c0 = h * TWh + tau * TgW
                        xin = cur[li % D, :C, c0 : c0 + TgW]
                        cur[(li + 1) % D, :C, c0 : c0 + TgW] = (
                            xin + l1[g * C : (g + 1) * C]
                        )
                        head_write(
                            slice(c0, c0 + TgW),
                            av[g * C : (g + 1) * C],
                            first=(li == 0 and not have_head),
                        )

                stages = (st_conv, st_act, st_l1, st_wr)
                for wave in range(len(stages) + H - 1):
                    for h in range(H):
                        s = wave - h
                        if 0 <= s < len(stages):
                            stages[s](h)

            def issue_deep_reads(li, p_i):
                lp = ap.layers[li]
                ds_ = []
                for bi, j in enumerate(lp.js):
                    s = slots_ref[lp.slot_base + bi]
                    dma = _mk_copy(
                        rr[lp.ring].at[s, i], chunks.at[p_i % 2, bi], crsem.at[p_i % 2, bi]
                    )
                    dma.start()
                    ds_.append(dma)
                return ds_

            def whole_layer(li, p_i, reads):
                lp = ap.layers[li]
                wait_tail_read(li)
                for dma in reads:
                    dma.wait()
                ensure_clear((li + 1) % D)
                xin = cur[li % D, :C]
                if lp.M:
                    # deep layer: write this block's input into the ring
                    wslot = slots_ref[lp.slot_base + len(lp.js)]
                    wd = _mk_copy(
                        cur.at[li % D], ro[lp.ring].at[wslot, i], twsem.at[li, H]
                    )
                    wd.start()
                    pending_by_slot.setdefault(li % D, []).append(wd)
                chunk_cache = {
                    j: chunks[p_i % 2, bi, :C] for bi, j in enumerate(lp.js)
                }

                def cval(j, xin=xin, chunk_cache=chunk_cache):
                    return xin if j == 0 else chunk_cache[j]

                # per-half stages in wave order — the same half-pipelining
                # as the unpacked body (activation of one half overlaps the
                # sibling half's MXU dots)
                ctx = [dict() for _ in range(H)]

                def st_conv(h, li=li, lp=lp, xin=xin, cval=cval, ctx=ctx):
                    wins = []
                    for a_lb in lp.lookbacks:
                        if a_lb == 0:
                            wins.append(hslice(xin, h))
                            continue
                        if lp.tail >= 0:
                            tb = scr[wf.tail_scrs[li]]
                            rf = lp.rf
                            left = tb[:C, h * rf * W + (rf - a_lb) * W : h * rf * W + rf * W]
                            if a_lb == T:
                                wins.append(left)
                            else:
                                wins.append(
                                    jnp.concatenate(
                                        [left, hslice(xin, h)[:, : (T - a_lb) * W]], axis=1
                                    )
                                )
                            continue
                        j, o = divmod(a_lb, T)
                        if o == 0:
                            wins.append(hslice(cval(j), h))
                        else:
                            left = hslice(cval(j + 1), h)[:, (T - o) * W :]
                            right = hslice(cval(j), h)[:, : (T - o) * W]
                            wins.append(jnp.concatenate([left, right], axis=1))
                    z = _dot(wr[lp.conv_w][:], cat(wins, 0)) + wr[lp.conv_b][:]
                    ctx[h]["z"] = z + _small_dot(wr[lp.mixin_w][:], cond[h])

                def st_act(h, lp=lp, ctx=ctx):
                    ctx[h]["a"] = act.apply(lp.act1, ctx[h].pop("z"), channel_axis=0)

                def st_l1(h, lp=lp, ctx=ctx):
                    ctx[h]["l1"] = _dot(wr[lp.l1_w][:], ctx[h]["a"]) + wr[lp.l1_b][:]

                def st_wr(h, li=li, xin=xin, ctx=ctx):
                    av = ctx[h].pop("a")
                    l1v = ctx[h].pop("l1")
                    hoff = h * TWh
                    cur[(li + 1) % D, :C, hoff : hoff + TWh] = hslice(xin, h) + l1v
                    head_write(
                        slice(hoff, hoff + TWh),
                        av,
                        first=(li == 0 and not have_head),
                    )

                stages = (st_conv, st_act, st_l1, st_wr)
                for wave in range(len(stages) + H - 1):
                    for h in range(H):
                        s = wave - h
                        if 0 <= s < len(stages):
                            stages[s](h)

            def issue_tail_writes(lis_):
                for li in lis_:
                    lp = ap.layers[li]
                    wait_tail_read(li)  # in-place alias: read before rewrite
                    rfW = lp.rf * W
                    for h in range(H):
                        wd = _mk_copy(
                            cur.at[li % D, :, pl.ds(h * TWh + (T - lp.rf) * W, rfW)],
                            to[lp.tail].at[i, :, pl.ds(h * rfW, rfW)],
                            twsem.at[li, h],
                        )
                        wd.start()
                        pending_by_slot.setdefault(li % D, []).append(wd)

            deep_reads: List[Any] = []
            if positions and positions[0][0] == "whole" and ap.layers[positions[0][1]].js:
                deep_reads = issue_deep_reads(positions[0][1], 0)
            for p_i, (kind, a) in enumerate(positions):
                # one-position read lookahead for deep layers
                deep_reads_next: List[Any] = []
                if p_i + 1 < len(positions) and positions[p_i + 1][0] == "whole":
                    nli = positions[p_i + 1][1]
                    if ap.layers[nli].js:
                        deep_reads_next = issue_deep_reads(nli, p_i + 1)
                if kind == "whole":
                    whole_layer(a, p_i, deep_reads)
                else:
                    wf_micro(a)
                deep_reads = deep_reads_next
                lis_ = issue_tail.get(p_i)
                if lis_:
                    issue_tail_writes(lis_)

            for s in list(pending_by_slot):
                ensure_clear(s)

            head_halves = [headb[:Hc, h * TWh : (h + 1) * TWh] for h in range(H)]
            new_head = tail_conv_apply(ap.hr, head_halves, hr_read)
            last_slot = ap.L % D
            new_prev = [
                cur[last_slot, :C, h * TWh : (h + 1) * TWh] for h in range(H)
            ]
            return new_prev, new_head

        for ni, net in enumerate(plan.nets):
          # Each net (fused condition DSPs first, then the main model)
          # consumes the raw input; non-final nets' outputs become the next
          # net's condition (WaveNet::_process_condition,
          # NAM/wavenet/model.cpp:699-729).
          prev_out = list(x_halves)
          head_acc = [None] * H
          for ap in net.arrays:
            if ap.wf is not None:
                prev_out, head_acc = wf_array(ap, prev_out, head_acc)
                continue
            cur = scr[ap.cur_scr]  # (2, C, H*TWh) layer-input scratch
            fil = scr[ap.film_scr] if ap.film_scr >= 0 else None
            chunks = scr[ap.chunk_scr] if ap.chunk_scr >= 0 else None
            rsem = scr[ap.rsem] if ap.rsem >= 0 else None
            wsem = scr[ap.wsem]
            pending_w = {0: [], 1: []}
            hr_read = tail_conv_start_read(ap.hr)

            def issue_reads(li, ap=ap, chunks=chunks, rsem=rsem):
                lp = ap.layers[li]
                ds = []
                if lp.tail >= 0:
                    # one DMA (contiguous in HBM): the whole (C, H*rf*W) tail
                    # into the front columns of chunk buffer 0
                    dma = _mk_copy(
                        ti[lp.tail].at[i],
                        chunks.at[li % 2, 0, :, pl.ds(0, H * lp.rf * W)],
                        rsem.at[li % 2, 0],
                    )
                    dma.start()
                    ds.append(dma)
                    return ds
                for bi, j in enumerate(lp.js):
                    s = slots_ref[lp.slot_base + bi]
                    dma = _mk_copy(
                        rr[lp.ring].at[s, i], chunks.at[li % 2, bi], rsem.at[li % 2, bi]
                    )
                    dma.start()
                    ds.append(dma)
                return ds

            def needs_read(lp):
                return bool(lp.js) or lp.tail >= 0

            # rechannel -> layer 0 input
            for h in range(H):
                cur[0, : ap.C, h * TWh : (h + 1) * TWh] = _small_dot(wr[ap.rech_w][:], prev_out[h])
            reads = issue_reads(0) if ap.layers and needs_read(ap.layers[0]) else []

            for li, lp in enumerate(ap.layers):
                p = li % 2
                last = li + 1 == ap.L
                pn = (li + 1) % 2
                for dma in reads:
                    dma.wait()
                xin = cur[p, : ap.C]  # (C, H*TWh) value: raw layer input (residual src)
                films = dict(
                    (site, (fw, fb, dim, shift)) for site, fw, fb, dim, shift in lp.films
                )

                # conv_pre_film: the conv (and its carried history!) consumes
                # the FILMED input — the reference rings store the filmed
                # value (model.cpp:172-177 feeds FiLM output into
                # Conv1D::Process which writes its ring). So the state write
                # below must source the filmed buffer, not cur.
                if "conv_pre_film" in films:
                    fw, fb, dim, shift = films["conv_pre_film"]
                    for h in range(H):
                        fil[p, : ap.C, h * TWh : (h + 1) * TWh] = film(
                            hslice(xin, h), fw, fb, dim, shift, h
                        )
                    hin = fil[p, : ap.C]  # filmed value for windows
                    state_src, state_scr = fil, ap.film_scr
                else:
                    hin = xin
                    state_src, state_scr = cur, ap.cur_scr

                # state write: this layer's (possibly filmed) input becomes
                # history (in place, aliased outputs; ring write slot never
                # collides with read slots; the tail read above completed
                # before this write)
                if lp.tail >= 0:
                    rfW = lp.rf * W
                    for h in range(H):
                        wd = _mk_copy(
                            state_src.at[p, :, pl.ds(h * TWh + (T - lp.rf) * W, rfW)],
                            to[lp.tail].at[i, :, pl.ds(h * rfW, rfW)],
                            wsem.at[p, h],
                        )
                        wd.start()
                        pending_w[p].append(wd)
                elif lp.M:
                    wslot = slots_ref[lp.slot_base + len(lp.js)]
                    wd = _mk_copy(
                        state_src.at[p], ro[lp.ring].at[wslot, i], wsem.at[p, H]
                    )
                    wd.start()
                    pending_w[p].append(wd)

                # one-layer read lookahead: start the next layer's chunk DMAs
                # before this layer's compute (their parity buffers are free)
                if not last and needs_read(ap.layers[li + 1]):
                    reads = issue_reads(li + 1)
                else:
                    reads = []

                # free cur[pn] (and fil[pn]) for this layer's output stores
                if not last:
                    for wd in pending_w[pn]:
                        wd.wait()
                    pending_w[pn] = []

                def chunk_val(j, li=li, lp=lp, hin=hin, C=ap.C):
                    if j == 0:
                        return hin
                    return chunks[li % 2, lp.js.index(j), :C]

                # ---- per-half compute stages, software-pipelined so that
                # one half's heavy VPU activation overlaps the sibling
                # half's MXU dots (the single biggest serial cost: exact
                # tanh measured ~40% of the step, tools/ablate_pallas_stack.py)
                ctx = [dict() for _ in range(H)]

                def win_for(a_lb, h, lp=lp, li=li, hin=hin, chunk_val=chunk_val, C=ap.C):
                    """The (C, TWh) conv window of half h at lookback a_lb:
                    the current block (a_lb == 0), a slice of the tail /
                    whole past chunk, or a time-concat where the window
                    spans a block boundary."""
                    if a_lb == 0:
                        return hslice(hin, h)
                    if lp.tail >= 0:
                        # window = [tail's last a_lb cols, block's first
                        # T - a_lb cols]
                        base = h * lp.rf * W
                        left = chunks[
                            li % 2, 0, :C,
                            base + (lp.rf - a_lb) * W : base + lp.rf * W,
                        ]
                        if a_lb == T:
                            return left
                        return jnp.concatenate(
                            [left, hslice(hin, h)[:, : (T - a_lb) * W]], axis=1
                        )
                    j, o = divmod(a_lb, T)
                    if o == 0:
                        return hslice(chunk_val(j), h)
                    left = hslice(chunk_val(j + 1), h)[:, (T - o) * W :]
                    right = hslice(chunk_val(j), h)[:, : (T - o) * W]
                    return jnp.concatenate([left, right], axis=1)

                def st_assemble(h, lp=lp, win_for=win_for, ctx=ctx):
                    if "no_stack" in _ABLATE:
                        return
                    wins = [win_for(a_lb, h) for a_lb in lp.lookbacks]
                    ctx[h]["stacked"] = (
                        jnp.concatenate(wins, axis=0) if len(wins) > 1 else wins[0]
                    )

                def st_conv(h, lp=lp, ctx=ctx, win_for=win_for, hin=hin):
                    if "no_stack" in _ABLATE:
                        # diagnostic: single-tap dot on the raw input — same
                        # M*N as the real conv, no window assembly at all
                        ctx[h].pop("stacked", None)
                        ctx[h]["z"] = _dot(wr[lp.conv_w][:][:, : hin.shape[0]], hslice(hin, h))
                        return
                    if TAP_DOTS:
                        # z = sum_k W_k @ window_k: no (K*C, TWh) stacked
                        # operand; windows feed the MXU as slices.
                        z = None
                        for k, a_lb in enumerate(lp.lookbacks):
                            zk = _dot(wr[lp.conv_w_taps[k]][:], win_for(a_lb, h))
                            z = zk if z is None else z + zk
                        ctx[h]["z"] = z
                    else:
                        ctx[h]["z"] = _dot(wr[lp.conv_w][:], ctx[h].pop("stacked"))

                def st_epilogue(h, lp=lp, ctx=ctx, films=films):
                    c = ctx[h]["z"] + wr[lp.conv_b][:]
                    if "conv_post_film" in films:
                        c = film(c, *films["conv_post_film"], h)
                    m_in = cond[h]
                    if "input_mixin_pre_film" in films:
                        m_in = film(m_in, *films["input_mixin_pre_film"], h)
                    m = _small_dot(wr[lp.mixin_w][:], m_in)
                    if "input_mixin_post_film" in films:
                        m = film(m, *films["input_mixin_post_film"], h)
                    z = c + m
                    if "activation_pre_film" in films:
                        z = film(z, *films["activation_pre_film"], h)
                    ctx[h]["z"] = z

                def st_act(h, lp=lp, ctx=ctx, films=films):
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
                    if "activation_post_film" in films:
                        aout = film(aout, *films["activation_post_film"], h)
                    ctx[h]["a"] = aout

                def st_l1(h, lp=lp, ctx=ctx, films=films):
                    if lp.l1_w >= 0:
                        l = _dot(wr[lp.l1_w][:], ctx[h]["a"]) + wr[lp.l1_b][:]
                        # Reference quirk: layer1x1_post_film only in blended
                        # mode (model.cpp:262-270).
                        if "layer1x1_post_film" in films and lp.gating == BLENDED:
                            l = film(l, *films["layer1x1_post_film"], h)
                        ctx[h]["l1"] = l

                def st_tail(h, lp=lp, li=li, xin=xin, ctx=ctx, last=last, pn=pn, films=films):
                    aout = ctx[h].pop("a")
                    nxt = hslice(xin, h)
                    if lp.l1_w >= 0:
                        nxt = nxt + ctx[h].pop("l1")
                    if lp.h1_w < 0:
                        hd = aout
                    else:
                        hd = _dot(wr[lp.h1_w][:], aout) + wr[lp.h1_b][:]
                        if "head1x1_post_film" in films:
                            hd = film(hd, *films["head1x1_post_film"], h)
                    head_acc[h] = hd if head_acc[h] is None else head_acc[h] + hd
                    if last:
                        prev_out[h] = nxt
                    else:
                        cur[pn, : ap.C, h * TWh : (h + 1) * TWh] = nxt

                stages = (
                    (st_conv, st_epilogue, st_act, st_l1, st_tail)
                    if TAP_DOTS
                    else (st_assemble, st_conv, st_epilogue, st_act, st_l1, st_tail)
                )
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

            # head rechannel (k=1 is a plain dot; k>1 streams via tail state —
            # the A2 family's k=16 head, NAM/wavenet/a2_fast.h:30-43)
            head_acc = tail_conv_apply(ap.hr, head_acc, hr_read)

          hs = wr[net.head_scale_w][0, 0]
          work = [hs * head_acc[h] for h in range(H)]

          # post-stack head: scale, then repeated (activation -> Conv1D)
          # (reference: model.cpp:776-805, Head::process model.cpp:69-86)
          for tc in net.pheads:
              rd = tail_conv_start_read(tc)
              work = [act.apply(net.head_act, v, channel_axis=0) for v in work]
              work = tail_conv_apply(tc, work, rd)

          if ni + 1 < len(plan.nets):
              cond = work  # this net was a condition DSP: feed the next net

        for h in range(H):
            y_ref[:, h * TWh : (h + 1) * TWh] = work[h]

        for wd in pending_tail:
            wd.wait()

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
    eparams = {"weights": weights}
    if plan.has_cond:
        # Non-fusable nested condition DSP (e.g. LSTM): pre-pass runs on the
        # XLA engine tier (reference: WaveNet::_process_condition,
        # model.cpp:699-729). WaveNet condition chains fuse into the kernel
        # itself (_fused_chain) and need no pre-pass state.
        from ... import registry

        sub_arch = registry.arch_for_config(cfg.condition_config)
        sub_prepare, _ = registry.engine_fns(sub_arch)
        eparams["condition"], state["condition"] = sub_prepare(
            cfg.condition_config, params["condition"], T, batch
        )
    return eparams, state


def step(cfg, T: int, eparams, state, x):
    """Block step, engine CTB convention: x (Cin, T, B) -> (y (Cout, T, B), state')."""
    B = x.shape[2]
    plan, _ = _build_plan_cached(cfg, T, B)
    W, H, nt = plan.W, plan.H, plan.nt
    TW = H * T * W  # columns per grid tile

    new_state = {}
    cond2 = None
    if plan.has_cond:
        from ... import registry

        sub_arch = registry.arch_for_config(cfg.condition_config)
        _, sub_step = registry.engine_fns(sub_arch)
        cond, cstate = sub_step(
            cfg.condition_config, T, eparams["condition"], state["condition"], x
        )
        new_state["condition"] = cstate
        cond2 = (
            cond.reshape(plan.S, T, nt * H, W).transpose(0, 2, 1, 3).reshape(plan.S, nt * TW)
        )

    # Block counter: slot math below is invariant mod the LCM of the ring
    # sizes, so normalize first — an unbounded int32 counter would overflow
    # negative after 2^31 blocks (~33 days of continuous streaming at T=64)
    # and silently corrupt every slot index, and even `n + 2M` overflows for
    # a legacy checkpoint carrying n near 2^31. The generic tier wraps
    # per-ring the same way (ops/ring.py ring_conv_step); the reference's
    # rings cannot overflow by construction (NAM/ring_buffer.cpp:69-95).
    wrap = 1
    for ap in plan.all_arrays:
        for lp in ap.layers:
            if lp.M:
                wrap = wrap * lp.M // math.gcd(wrap, lp.M)
    n = jax.lax.rem(state["n"], wrap)

    # slots vector: per ring layer, read slots then write slot
    vals = []
    for ap in plan.all_arrays:
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
    cond_inputs = [cond2] if plan.has_cond else []
    cond_specs = (
        [pl.BlockSpec((plan.S, TW), lambda i, s: (0, i), memory_space=pltpu.VMEM)]
        if plan.has_cond
        else []
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec((plan.Cin, TW), lambda i, s: (0, i), memory_space=pltpu.VMEM)]
        + cond_specs
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
    # input operand r (0=slots, 1=x, [cond], 2..=weights, then rings/tails)
    # -> output 1+r (0=y, rings, tails): all state updates in place
    NWt, NRt, NTt = len(weights), len(rings), len(tails)
    base = 2 + len(cond_inputs) + NWt
    aliases = {base + r: 1 + r for r in range(NRt + NTt)}
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
    )(slots, x2, *cond_inputs, *weights, *rings, *tails)
    y2 = out[0]
    new_rings = list(out[1 : 1 + NRt])
    new_tails = list(out[1 + NRt :])

    y = y2.reshape(plan.Cout, nt * H, T, W).transpose(0, 2, 1, 3).reshape(plan.Cout, T, B)
    new_state.update(
        {"rings": new_rings, "tails": new_tails, "n": jax.lax.rem(n + 1, wrap)}
    )
    return y, new_state


# Plans are static pure-Python; cache by config identity (configs are built
# once per model and never mutated). Bounded FIFO so many distinct
# (cfg, T, B) engines in one process can't leak plans.
_PLAN_CACHE: Dict[Tuple[int, int, int], Any] = {}
_PLAN_CACHE_MAX = 64


def _build_plan_cached(cfg, T: int, B: int):
    # WAVEFRONT in the key: toggling the flag (tests / ablations) must not
    # serve a stale plan. Engines prepared under one flag value must step
    # under the same value (weight lists differ).
    key = (id(cfg), T, B, WAVEFRONT)
    hit = _PLAN_CACHE.get(key)
    if hit is not None and hit[2] is cfg:
        return hit[0], hit[1]
    plan, weights = _build_plan(cfg, _params_shape_only(cfg), T, B)
    while len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
        _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
    _PLAN_CACHE[key] = (plan, None, cfg)
    return plan, None


def _params_shape_only(cfg):
    """Zero params with the right shapes — _build_plan only uses shapes to
    assign weight indices; ``step`` never uses the weight VALUES from the
    plan build (they come in via eparams). Must walk the exact same add_w
    sequence as real params (dense shapes; the depthwise 'dw' storage
    densifies to the same dense shapes via _dense_*_w)."""
    from ...models.wavenet import FILM_SITES, _head_conv_specs, _layer_film_spec

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
            for site in FILM_SITES:
                fspec = _layer_film_spec(ac, li, site)
                if fspec is not None:
                    cs = fspec.cond_spec
                    lp[site] = {
                        "w": np.zeros((cs.in_channels, cs.out_channels), np.float32),
                        "b": np.zeros(cs.out_channels, np.float32),
                    }
            layers.append(lp)
        a = {
            "rechannel": {"w": np.zeros((ac.input_size, ac.channels), np.float32)},
            "layers": layers,
            "head_rechannel": {
                "w": np.zeros(
                    (ac.head_kernel_size, ac.head_output_size, ac.head_size), np.float32
                )
            },
        }
        if ac.head_bias:
            a["head_rechannel"]["b"] = np.zeros(ac.head_size, np.float32)
        arrays.append(a)
    params = {"arrays": arrays, "head_scale": np.float32(0)}
    if cfg.head is not None:
        params["head"] = [
            {
                "w": np.zeros((s.kernel_size, s.in_channels, s.out_channels), np.float32),
                "b": np.zeros(s.out_channels, np.float32),
            }
            for s in _head_conv_specs(cfg.head)
        ]
    if cfg.condition_config is not None and isinstance(cfg.condition_config, type(cfg)):
        # WaveNet condition chains fuse into the kernel, so _build_plan walks
        # their params too (unused when the plan falls back to the pre-pass).
        params["condition"] = _params_shape_only(cfg.condition_config)
    return params
