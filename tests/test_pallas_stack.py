"""Fused Pallas stack kernel vs XLA engine step equivalence.

The third implementation tier (generic step / XLA engine / fused Pallas
kernel) pinned to the other two — the analog of the reference's dual-build
Eigen vs inline-GEMM equivalence CI (reference: .github/workflows/build.yml:
38-44) and the A2-fast vs generic contract (tools/test/test_a2_fast.cpp:
270-311). Runs the kernel in interpret mode on CPU; on-device agreement is
additionally gated by cli.bench_engine.
"""

import os

import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from neuralampmodelercore_tpu.models.engine import StreamEngine
from neuralampmodelercore_tpu.ops.pallas import stack
from neuralampmodelercore_tpu.tools.generate import make_nam
from conftest import EXAMPLE_MODELS

B = 128  # one lane tile — the smallest supported batch


@pytest.fixture(autouse=True)
def _interpret_mode():
    stack.INTERPRET = True
    yield
    stack.INTERPRET = False


def _run_equivalence(model, T, n_blocks=8, atol=2e-5, seed=0):
    model.prewarm_on_reset = False
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((B, n_blocks * T)) * 0.3).astype(np.float32)

    ex = StreamEngine(model, batch=B, block_size=T, kernel="xla")
    ep = StreamEngine(model, batch=B, block_size=T, kernel="pallas")
    assert ex.kernel == "xla" and ep.kernel == "pallas"
    sx = ex.reset(prewarm=False)
    sp = ep.reset(prewarm=False)
    for i in range(n_blocks):
        blk = x[:, i * T : (i + 1) * T]
        yx, sx = ex.process(blk, sx)
        yp, sp = ep.process(blk, sp)
        np.testing.assert_allclose(
            np.asarray(yp), np.asarray(yx), atol=atol, err_msg=f"block {i} (T={T})"
        )


def _wavenet_model(config: dict, seed=7):
    return nam.load_model(make_nam("WaveNet", config, seed=seed))


def test_flagship_shape_T64():
    """The flagship wavenet_a1_standard architecture: whole-chunk tap
    windows (dilations are multiples of T) plus slab-path layers."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_a1_standard.nam"))
    _run_equivalence(m, T=64, n_blocks=4)


def test_flagship_shape_small_T_ring_wrap():
    """T=16 makes deep dilations wrap the chunk FIFO many times and puts
    every splice offset in play."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    _run_equivalence(m, T=16, n_blocks=12)


def test_offset_splice_dilations():
    """Dilations not aligned to T: every tap window is a two-chunk splice."""
    config = {
        "layers": [
            {
                "input_size": 1,
                "condition_size": 1,
                "channels": 8,
                "head_size": 1,
                "kernel_size": 3,
                "dilations": [3, 12, 28, 52],
                "activation": "Tanh",
                "gated": False,
                "head_bias": True,
            }
        ],
        "head": None,
    }
    _run_equivalence(_wavenet_model(config), T=16, n_blocks=10)


def test_gated_and_bottleneck():
    config = {
        "layers": [
            {
                "input_size": 1,
                "condition_size": 1,
                "channels": 8,
                "bottleneck": 4,
                "head_size": 4,
                "kernel_size": 2,
                "dilations": [1, 4, 16],
                "activation": "Tanh",
                "gated": True,
                "head_bias": False,
            },
            {
                "input_size": 8,
                "condition_size": 1,
                "channels": 4,
                "head_size": 1,
                "kernel_size": 3,
                "dilations": [2, 8],
                "activation": "ReLU",
                "gated": False,
                "head_bias": True,
            },
        ],
        "head": None,
    }
    _run_equivalence(_wavenet_model(config), T=16, n_blocks=8)


def test_blended_head1x1():
    config = {
        "layers": [
            {
                "input_size": 1,
                "condition_size": 1,
                "channels": 6,
                "head_size": 1,
                "kernel_sizes": [3, 3],
                "dilations": [1, 5],
                "activation": "Sigmoid",
                "gating_mode": "blended",
                "secondary_activation": "Hardtanh",
                "head_bias": True,
                "head1x1": {"active": True, "out_channels": 6, "groups": 1},
            }
        ],
        "head": None,
    }
    _run_equivalence(_wavenet_model(config), T=8, n_blocks=10)


def test_eight_half_tiles_wavefront():
    """B=1024 engages W=1024 tiles (H=8) — the widest ladder rung."""
    global B
    old = B
    try:
        globals()["B"] = 1024
        m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
        assert stack._pick_w(m.config, 8, 1024) == 1024
        _run_equivalence(m, T=8, n_blocks=3)
    finally:
        globals()["B"] = old


def test_two_half_tiles_wavefront():
    """B=256 engages H=2 half-tiles with the stage-interleaved wavefront."""
    global B
    old = B
    try:
        globals()["B"] = 256
        m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
        _run_equivalence(m, T=16, n_blocks=8)
    finally:
        globals()["B"] = old


def test_supports_gate():
    """Unsupported configs are refused with a reason and StreamEngine falls
    back to the XLA step; round-2 coverage (FiLM, groups, condition DSP,
    A2 head conv, post-stack head) is admitted."""
    # The whole example corpus qualifies at T=64 / B=128 now.
    for name in ("wavenet_condition_dsp", "wavenet_a2_max", "wavenet_a1_standard"):
        m = nam.load_model(os.path.join(EXAMPLE_MODELS, name + ".nam"))
        assert stack.supports(m.config, 64, B) is None, name
    # batch gate
    m2 = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    assert stack.supports(m2.config, 64, 96) is not None
    assert stack.supports(m2.config, 64, 256) is None
    # head-rechannel receptive field > T is refused (A2's k=16 head at T=8)
    a2 = nam.load_model(os.path.join(EXAMPLE_MODELS, "A2.nam"))
    sub = a2.active_model
    assert stack.supports(sub.config, 8, B) is not None
    assert stack.supports(sub.config, 64, B) is None
    with pytest.raises(ValueError, match="does not support"):
        StreamEngine(sub, batch=B, block_size=8, kernel="pallas")
    eng = StreamEngine(sub, batch=B, block_size=8, kernel="auto")
    assert eng.kernel == "xla"


def test_a2_architecture_head_conv():
    """The A2 family (single array, k=16 head rechannel with bias,
    NAM/wavenet/a2_fast.h:30-43): the head conv streams via tail state."""
    a2 = nam.load_model(os.path.join(EXAMPLE_MODELS, "A2.nam"))
    sub = a2.active_model  # A2-nano (channels=3)
    _run_equivalence(sub, T=64, n_blocks=6)


def test_a2_standard_submodel():
    a2 = nam.load_model(os.path.join(EXAMPLE_MODELS, "A2.nam"))
    st = a2.set_slimmable_size(1.0)  # A2-standard (channels=8)
    del st
    _run_equivalence(a2.active_model, T=64, n_blocks=4)


def test_condition_dsp_fused():
    """WaveNet condition chains fuse INTO the kernel as prelude nets — no
    XLA pre-pass (round-2 measured the hybrid 4x slower). Same semantics as
    WaveNet::_process_condition (model.cpp:699-729)."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_condition_dsp.nam"))
    assert stack.cond_mode(m.config, 16) == "fused"
    _run_equivalence(m, T=16, n_blocks=8)


def test_condition_dsp_chain_depth2_fused():
    """A WaveNet condition DSP that itself has a WaveNet condition DSP:
    the whole chain fuses as nets [deepest, middle, main] inside one kernel
    (reference recursion: NAM/wavenet/model.cpp:841-852)."""
    from neuralampmodelercore_tpu.tools.generate import make_nam as mk, with_condition_dsp

    def layers(ch, ks, dil, head):
        return {
            "layers": [
                {
                    "input_size": 1,
                    "condition_size": 1,
                    "channels": ch,
                    "head_size": head,
                    "kernel_size": ks,
                    "dilations": dil,
                    "activation": "Tanh",
                    "gated": False,
                    "head_bias": True,
                }
            ],
            "head": None,
        }

    deepest = mk("WaveNet", layers(3, 2, [1, 4], 2), seed=21)
    mid_cfg = with_condition_dsp(layers(4, 3, [1, 8], 3), deepest)
    mid = mk("WaveNet", mid_cfg, seed=22)
    main_cfg = with_condition_dsp(layers(6, 3, [1, 4, 16], 1), mid)
    m = _wavenet_model(main_cfg, seed=23)
    assert stack.cond_mode(m.config, 16) == "fused"
    plan, _ = stack._build_plan_cached(m.config, 16, B)
    assert len(plan.nets) == 3
    _run_equivalence(m, T=16, n_blocks=8)


def test_condition_dsp_lstm_prepass():
    """A non-WaveNet (LSTM) condition DSP cannot fuse: the kernel falls back
    to the XLA engine pre-pass feeding its external condition input."""
    from neuralampmodelercore_tpu.tools.generate import with_condition_dsp

    sub = make_nam("LSTM", {"input_size": 1, "hidden_size": 3, "num_layers": 1}, seed=3)
    config = {
        "layers": [
            {
                "input_size": 1,
                "condition_size": 1,
                "channels": 6,
                "head_size": 1,
                "kernel_size": 3,
                "dilations": [1, 4, 16],
                "activation": "Tanh",
                "gated": False,
                "head_bias": True,
            }
        ],
        "head": None,
    }
    config = with_condition_dsp(config, sub)
    m = _wavenet_model(config, seed=9)
    assert stack.cond_mode(m.config, 16) == "prepass"
    _run_equivalence(m, T=16, n_blocks=6)


def test_a2_max_films_groups_gating():
    """wavenet_a2_max: all 8 FiLM sites, grouped conv/mixin/1x1s, gated +
    blended + PReLU/Softsign/LeakyHardtanh, nested condition DSP — the
    everything-on corpus model."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_a2_max.nam"))
    _run_equivalence(m, T=16, n_blocks=8)


def test_post_stack_head():
    """Post-stack head: scale -> repeated (activation -> Conv1D), k>1 convs
    carried as tail state (model.cpp:776-805)."""
    config = {
        "layers": [
            {
                "input_size": 1,
                "condition_size": 1,
                "channels": 6,
                "head_size": 4,
                "kernel_size": 3,
                "dilations": [1, 4],
                "activation": "Tanh",
                "gated": False,
                "head_bias": True,
            }
        ],
        "head": {
            "channels": 5,
            "out_channels": 1,
            "kernel_sizes": [3, 1, 4],
            "activation": "ReLU",
        },
    }
    _run_equivalence(_wavenet_model(config), T=16, n_blocks=8)


def test_depthwise_convs():
    """Depthwise conv + depthwise mixin densify to diagonal weights."""
    config = {
        "layers": [
            {
                "input_size": 1,
                "condition_size": 1,
                "channels": 4,
                "head_size": 2,
                "kernel_size": 3,
                "dilations": [1, 2, 4],
                "activation": "SiLU",
                "gated": False,
                "head_bias": False,
                "groups_input": 4,
                "layer1x1": {"active": True, "groups": 4},
            }
        ],
        "head": None,
    }
    _run_equivalence(_wavenet_model(config), T=8, n_blocks=8)


def test_film_sites_individually():
    """Each FiLM site alone, pinned against the XLA engine (shift on/off)."""
    for site, shift in (
        ("conv_pre_film", True),
        ("conv_post_film", False),
        ("input_mixin_pre_film", True),
        ("input_mixin_post_film", True),
        ("activation_pre_film", False),
        ("activation_post_film", True),
    ):
        config = {
            "layers": [
                {
                    "input_size": 1,
                    "condition_size": 1,
                    "channels": 4,
                    "head_size": 2,
                    "kernel_size": 2,
                    "dilations": [1, 8, 32],
                    "activation": "Tanh",
                    "gated": False,
                    "head_bias": True,
                    site: {"active": True, "shift": shift, "groups": 1},
                }
            ],
            "head": None,
        }
        _run_equivalence(_wavenet_model(config), T=16, n_blocks=6, seed=hash(site) % 1000)


def test_engine_state_checkpoint_roundtrip():
    """Pallas-engine ring state snapshots/restores exactly (the serializable
    runtime-state extension, docs/deviations.md item 6)."""
    from neuralampmodelercore_tpu.utils.checkpoint import load_state, save_state

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    eng = StreamEngine(m, batch=B, block_size=16, kernel="pallas")
    st = eng.reset(prewarm=False)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((B, 16)) * 0.3).astype(np.float32)
    for _ in range(3):
        _, st = eng.process(x, st)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "state.npz")
        save_state(p, st)
        st2 = load_state(p, like=st)
    y1, _ = eng.process(x, st)
    y2, _ = eng.process(x, st2)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_lut_mode_in_kernel():
    """LUT-mode activations run INSIDE the fused kernel (round 3): the
    gather-free _lut_apply needs no table constant, so supports() admits
    LUT configs and both tiers produce the same piecewise-linear output."""
    from neuralampmodelercore_tpu.ops import activations as act

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    act.enable_lut("Tanh", -5.0, 5.0, 512)
    try:
        assert stack.supports(m.config, 16, B) is None
        _run_equivalence(m, T=16, n_blocks=6, seed=13)
    finally:
        act.disable_lut("Tanh")
    # sanity: LUT output differs from exact tanh (the mode is actually on)
    x = np.linspace(-3, 3, 101).astype(np.float32)
    act.enable_lut("Tanh", -5.0, 5.0, 32)
    try:
        import jax.numpy as jnp

        y = np.asarray(act.apply(act.ActivationConfig.simple("Tanh"), jnp.asarray(x)))
    finally:
        act.disable_lut("Tanh")
    assert not np.allclose(y, np.tanh(x), atol=1e-5)


def test_ring_counter_wrap_soak():
    """Long-uptime safety: the block counter wraps at the LCM of the ring
    sizes, so a stream running past 2^31 blocks (~33 days at T=64) — or a
    legacy checkpoint carrying an arbitrarily large n — cannot corrupt slot
    math. A state whose counter sits just below int32 max (and ≡ 0 mod the
    wrap) must produce bit-identical output to a fresh stream, across the
    wrap point."""
    import math

    import jax.numpy as jnp

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    T = 8  # rf=16 > T engages the ring path (M=4) for the second array
    eng = StreamEngine(m, batch=B, block_size=T, kernel="pallas")
    plan, _ = stack._build_plan_cached(m.config, T, B)
    wrap = 1
    for ap in plan.all_arrays:
        for lp in ap.layers:
            if lp.M:
                wrap = wrap * lp.M // math.gcd(wrap, lp.M)
    assert wrap > 1  # the model must actually have ring layers at this T

    s_ref = eng.reset(prewarm=False)
    s_big = eng.reset(prewarm=False)
    big = (2**31 - 1) // wrap * wrap  # ≡ 0 (mod wrap), within int32
    s_big = dict(s_big, n=jnp.asarray(big, jnp.int32))

    rng = np.random.default_rng(11)
    for i in range(2 * wrap + 3):  # crosses the wrap point at least twice
        blk = (rng.standard_normal((B, T)) * 0.3).astype(np.float32)
        y1, s_ref = eng.process(blk, s_ref)
        y2, s_big = eng.process(blk, s_big)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2), err_msg=f"block {i}")
        assert 0 <= int(s_big["n"]) < wrap  # bounded after the first step


def test_tile_width_budget_model():
    """Pin the VMEM tile-width picker to the on-device sweep results
    (tools/sweep_vmem_tiles.py, v5e): configs the budget admits all compile,
    and the one it rejects (flagship T=240 W=512, est ~128 MB) OOMs at the
    Mosaic limit. Flagship footprint: worst layer K=3, nc chunk reads as
    below -> rows = (2 + 2*nc + K + 4) * 16."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_a1_standard.nam"))
    cfg = m.config
    # Unpacked-path model (what non-wavefront configs use):
    # T=128: dilations all divide into whole chunks -> nc=2, rows=208
    assert stack._footprint_rows(cfg, 128) == 208
    # T=240: offset splices double the chunk reads -> nc=4, rows=272
    assert stack._footprint_rows(cfg, 240) == 272
    # Default (wavefront off — measured negative, stack.py WAVEFRONT note):
    # the unpacked picks, pinned to the on-device sweep.
    assert stack._pick_w(cfg, 64, 2048) == 1024    # 55 MB
    assert stack._pick_w(cfg, 128, 2048) == 512    # 52 MB; 1024 would be 109 MB
    assert stack._pick_w(cfg, 240, 2048) == 256    # 64 MB; 512 would be 128 MB
    assert stack._pick_w(cfg, 240, 2048 + 256) == 256  # width must divide batch
    assert stack._pick_w(cfg, 128, 128) == 128
    # With the wavefront enabled, _pick_w budgets the wavefront footprint:
    # D=6-deep input rings + head accumulators + dedicated shallow-tail
    # buffers + static chunk scratch, per array, summed.
    old = stack.WAVEFRONT
    try:
        stack.WAVEFRONT = True
        assert stack._footprint_rows_wf(cfg, 64) == 424
        assert stack._footprint_rows_wf(cfg, 128) == 424
        assert stack._pick_w(cfg, 64, 2048) == 512   # 56 MB; 1024 would be 111 MB
        assert stack._pick_w(cfg, 128, 2048) == 256  # 56 MB; 512 would be 111 MB
        assert stack._pick_w(cfg, 240, 2048) == 128  # 61 MB
    finally:
        stack.WAVEFRONT = old
    # budget never admits a footprint beyond the raised Mosaic limit
    assert 272 * 240 * 256 * 4 <= stack.VMEM_BUDGET < stack.VMEM_LIMIT


def test_wavefront_on_vs_off_exact():
    """The wavefront-packed schedule is a pure reordering of the unpacked
    kernel body: same outputs (within block-diagonal FMA-reorder noise, far
    inside the reference's 5e-5 equivalence slack) AND identical carried
    state layout/content (rings + tails), so checkpoints transfer between
    the two paths."""
    import jax.tree_util as jtu

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_a1_standard.nam"))
    m.prewarm_on_reset = False
    rng = np.random.default_rng(3)
    T, n_blocks = 16, 6
    x = (rng.standard_normal((B, n_blocks * T)) * 0.3).astype(np.float32)

    outs, states = {}, {}
    old = stack.WAVEFRONT
    try:
        for flag in (True, False):
            stack.WAVEFRONT = flag
            eng = StreamEngine(m, batch=B, block_size=T, kernel="pallas")
            # wavefront applies (or not) per the flag
            plan, _ = stack._build_plan_cached(m.config, T, B)
            assert all(
                (ap.wf is not None) == flag for net in plan.nets for ap in net.arrays
            )
            s = eng.reset(prewarm=False)
            ys = []
            for i in range(n_blocks):
                y, s = eng.process(x[:, i * T : (i + 1) * T], s)
                ys.append(np.asarray(y))
            outs[flag] = np.concatenate(ys, axis=1)
            states[flag] = s
    finally:
        stack.WAVEFRONT = old
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-5)
    # identical state tree: rings and tails match leaf for leaf (ring
    # contents are upstream layer inputs, so they carry the accumulated
    # packed-dot FMA-reorder noise — measured 1.6e-5 after 6 blocks, inside
    # the reference's own 5e-5 implementation-equivalence slack)
    la, lb = jtu.tree_leaves(states[True]), jtu.tree_leaves(states[False])
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_wavefront_slimmable_and_odd_T():
    """Slimmable wavenet (width 1.0) is wavefront-eligible; T=20 exercises
    Tg=5 sub-tiles with off-power-of-2 splices."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "slimmable_wavenet.nam"))
    m.set_slimmable_size(1.0)
    active = m.active_model
    old = stack.WAVEFRONT
    try:
        stack.WAVEFRONT = True
        assert stack._wavefront_reason(active.config, 20) is None
        _run_equivalence(active, T=20, n_blocks=6)
    finally:
        stack.WAVEFRONT = old


def test_wavefront_gate_refuses_featureful_configs():
    old = stack.WAVEFRONT
    try:
        stack.WAVEFRONT = True
        m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_a2_max.nam"))
        assert stack._wavefront_reason(m.config, 64) is not None
        m2 = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_condition_dsp.nam"))
        assert stack._wavefront_reason(m2.config, 64) is not None
    finally:
        stack.WAVEFRONT = old
