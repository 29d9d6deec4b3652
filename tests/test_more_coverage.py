"""Additional coverage: custom loaders, Linear implementations, engine on A2,
profiling utilities, time-sharded render."""

import json
import os

import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from neuralampmodelercore_tpu import registry
from neuralampmodelercore_tpu.tools import generate
from conftest import EXAMPLE_MODELS


def test_register_custom_loader():
    """External architectures can take over loading entirely
    (reference analog: factory::Helper, NAM/registry.h:20-67)."""

    class Doubler:
        architecture = "DoublerArch"
        num_input_channels = 1
        num_output_channels = 1

        def __init__(self, data):
            self.gain = float(data.weights[0])

    registry.register_custom_loader("DoublerArch", lambda data: Doubler(data))
    try:
        m = nam.load_model(
            {
                "version": "0.5.4",
                "architecture": "DoublerArch",
                "config": {},
                "weights": [2.0],
            }
        )
        assert isinstance(m, Doubler) and m.gain == 2.0
    finally:
        registry._CUSTOM_LOADERS.pop("DoublerArch", None)


def test_linear_direct_vs_fft_equivalence():
    """The FFT implementation computes the identical convolution
    (reference analog: the Linear FFT path produces the same outputs as
    direct, NAM/linear.cpp)."""
    config = {"receptive_field": 300, "bias": True}
    doc = generate.make_nam("Linear", config, seed=2, scale=0.1)
    x = (np.random.default_rng(0).standard_normal(1024) * 0.5).astype(np.float32)

    outs = {}
    for impl in ["direct", "fft"]:
        doc_i = dict(doc, config=dict(config, implementation=impl))
        m = nam.load_model(doc_i)
        assert m.config.active_implementation == impl
        outs[impl] = np.asarray(m.render(x))
    np.testing.assert_allclose(outs["direct"], outs["fft"], atol=2e-5)


def test_linear_auto_selection():
    """Auto: direct for rf <= 256, fft beyond (reference: linear.cpp:99-113)."""
    small = nam.load_model(generate.make_nam("Linear", {"receptive_field": 256, "bias": False}))
    big = nam.load_model(generate.make_nam("Linear", {"receptive_field": 257, "bias": False}))
    assert small.config.active_implementation == "direct"
    assert big.config.active_implementation == "fft"


def test_linear_streaming_continuity():
    config = {"receptive_field": 300, "bias": True, "implementation": "fft"}
    m = nam.load_model(generate.make_nam("Linear", config, seed=4, scale=0.1))
    x = (np.random.default_rng(1).standard_normal((1, 512)) * 0.3).astype(np.float32)
    st = m.init_state(1)
    y_full, _ = m.process(x, st)
    st = m.init_state(1)
    parts = []
    for i in range(0, 512, 64):
        y, st = m.process(x[:, i : i + 64], st)
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts, axis=1), np.asarray(y_full), atol=2e-5)


def test_engine_on_a2_submodel():
    """The engine handles the A2 architecture (23 layers, kernels 6-16,
    mixed dilations) — the reference needs a dedicated fast path for this
    shape (NAM/wavenet/a2_fast.cpp); here the same engine covers it."""
    from neuralampmodelercore_tpu.models.engine import StreamEngine

    j = json.load(open(os.path.join(EXAMPLE_MODELS, "A2.nam")))
    sub = nam.load_model(j["config"]["submodels"][0]["model"])  # A2 nano
    sub.prewarm_on_reset = False
    rng = np.random.default_rng(0)
    T, n_blocks = 64, 30
    x = (rng.standard_normal((1, n_blocks * T)) * 0.3).astype(np.float32)

    gstate = sub.init_state(1)
    eng = StreamEngine(sub, batch=1, block_size=T)
    estate = eng.reset(prewarm=False)
    for i in range(n_blocks):
        blk = x[:, i * T : (i + 1) * T]
        yg, gstate = sub.process(blk, gstate)
        ye, estate = eng.process(blk, estate)
        np.testing.assert_allclose(np.asarray(ye), np.asarray(yg), atol=5e-5)


def test_profiling_block_timer():
    from neuralampmodelercore_tpu.utils.profiling import BlockTimer

    bt = BlockTimer(deadline_s=1.0)
    for _ in range(10):
        with bt:
            pass
    s = bt.stats()
    assert s["min"] <= s["p50"] <= s["p99"] <= s["max"]
    assert s["rtf"] > 1.0


def test_compiled_stats():
    import jax
    from neuralampmodelercore_tpu.utils.profiling import compiled_stats

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    import jax.numpy as jnp

    stats = compiled_stats(
        m.step_fn(), m.params, m.init_state(1), jnp.zeros((1, 64, 1), jnp.float32)
    )
    assert stats["flops"] and stats["flops"] > 0


def test_time_sharded_render_matches_unsharded():
    """SP overlap-save render == unsharded render (exercised on the 8-device
    CPU mesh; the dryrun covers it too, this pins it in the suite)."""
    from neuralampmodelercore_tpu.parallel.sharding import TIME_AXIS, make_mesh, time_sharded_render

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    mesh = make_mesh(axis_names=(TIME_AXIS,))
    n = mesh.shape[TIME_AXIS]
    T = 128 * n
    x = (np.random.default_rng(2).standard_normal(T) * 0.3).astype(np.float32)
    y_sp = np.asarray(time_sharded_render(m, mesh, x))
    y_ref = np.asarray(m.render(x))
    np.testing.assert_allclose(y_sp, y_ref, atol=1e-5)


def test_dp_sharded_step_matches_single_device():
    from neuralampmodelercore_tpu.parallel.sharding import (
        STREAM_AXIS,
        dp_sharded_step,
        make_mesh,
        replicate_params,
        shard_state,
    )

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    mesh = make_mesh(axis_names=(STREAM_AXIS,))
    n = mesh.shape[STREAM_AXIS]
    B = 2 * n
    x = (np.random.default_rng(3).standard_normal((B, 64, 1)) * 0.3).astype(np.float32)

    import jax.numpy as jnp

    params = replicate_params(m.params, mesh)
    state = shard_state(m.init_state(B), mesh)
    step = dp_sharded_step(m, mesh)
    y_sharded, _ = step(params, state, jnp.asarray(x))

    y_ref, _ = m.process(x[..., 0], m.init_state(B))
    np.testing.assert_allclose(np.asarray(y_sharded)[..., 0], np.asarray(y_ref), atol=1e-6)


def test_dp_sharded_engine_matches_single_device():
    """The ring-state engine shards over streams on a mesh (the production
    multi-chip serving path): sharded output == unsharded."""
    from neuralampmodelercore_tpu.models.engine import StreamEngine
    from neuralampmodelercore_tpu.parallel.sharding import (
        STREAM_AXIS,
        dp_sharded_engine_step,
        make_mesh,
    )
    import jax.numpy as jnp

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    mesh = make_mesh(axis_names=(STREAM_AXIS,))
    n = mesh.shape[STREAM_AXIS]
    B, T = 2 * n, 64
    eng = StreamEngine(m, batch=B, block_size=T)

    eparams, state, step = dp_sharded_engine_step(eng, mesh)
    rng = np.random.default_rng(8)
    x = (rng.standard_normal((1, T, B)) * 0.3).astype(np.float32)
    y1, state = step(eparams, state, jnp.asarray(x))
    y2, state = step(eparams, state, jnp.asarray(x))

    st = eng.init_state()
    r1, st = eng.step_fn()(eng.params, st, jnp.asarray(x))
    r2, st = eng.step_fn()(eng.params, st, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(r1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(r2), atol=1e-6)


def test_gradients_flow_through_render():
    """The engine is differentiable end-to-end (beyond the reference, which
    is inference-only): gradients of a loss on rendered audio w.r.t. model
    weights are finite and nonzero — the training-step building block."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    x = jnp.asarray((np.random.default_rng(0).standard_normal((1, 128, 1)) * 0.3).astype(np.float32))
    target = jnp.zeros((1, 128, 1))
    step = partial(m._arch.step, m.config)

    def loss(params):
        state = m._arch.init_state(m.config, params, 1)
        y, _ = step(params, state, x)
        return jnp.mean((y - target) ** 2)

    val, grads = jax.value_and_grad(loss)(m.params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_multichannel_wavenet_io():
    """Multi-channel in/out WaveNet (reference analog: the 3-in/2-out
    real-time-safety tests, tools/test/test_wavenet/test_real_time_safe.cpp).
    With no condition DSP, the condition is the raw multi-channel input."""
    config = {
        "in_channels": 2,
        "layers": [
            {
                "input_size": 2, "condition_size": 2, "head_size": 3,
                "channels": 4, "kernel_size": 3, "dilations": [1, 2],
                "activation": "Tanh", "gated": False, "head_bias": True,
            }
        ],
        "head": None,
        "head_scale": 0.5,
    }
    doc = generate.make_nam("WaveNet", config, seed=6, scale=0.2)
    m = nam.load_model(doc)
    m.prewarm_on_reset = False
    assert m.num_input_channels == 2 and m.num_output_channels == 3
    x = (np.random.default_rng(0).standard_normal((1, 64, 2)) * 0.3).astype(np.float32)
    y, _ = m.process(x, m.init_state(1))
    assert np.asarray(y).shape == (1, 64, 3)

    # three-way agreement on multi-channel too
    ref = build_ref_model_mc(doc)
    y_ref = ref(np.asarray(x[0]).T).T
    np.testing.assert_allclose(np.asarray(y)[0], y_ref, atol=1e-4)

    from neuralampmodelercore_tpu.models.engine import StreamEngine
    eng = StreamEngine(m, batch=1, block_size=64)
    ye, _ = eng.process(x, eng.reset(prewarm=False))
    np.testing.assert_allclose(np.asarray(ye), np.asarray(y), atol=2e-5)


def build_ref_model_mc(doc):
    from ref_engine import build_ref_model

    return build_ref_model(doc)


def test_time_sharded_render_linear():
    """Linear prewarms 0 samples but its FIR reads receptive_field-1 history
    samples — the SP halo must cover the FIR history, and a zero context must
    not become a whole-chunk halo (x[-0:] pitfall). Regression for both."""
    from neuralampmodelercore_tpu.parallel.sharding import TIME_AXIS, make_mesh, time_sharded_render

    config = {"receptive_field": 48, "bias": True}
    doc = generate.make_nam("Linear", config, seed=5, scale=0.1)
    m = nam.load_model(doc)
    mesh = make_mesh(axis_names=(TIME_AXIS,))
    n = mesh.shape[TIME_AXIS]
    T = 64 * n
    x = (np.random.default_rng(7).standard_normal(T) * 0.3).astype(np.float32)
    y_sp = np.asarray(time_sharded_render(m, mesh, x))
    y_ref = np.asarray(m.render(x))
    assert y_sp.shape == y_ref.shape
    np.testing.assert_allclose(y_sp, y_ref, atol=1e-6)


def test_time_sharded_render_guards():
    """Loud failures instead of silently wrong audio: context > chunk
    (halo would span >1 neighbor) and nested-LSTM condition DSPs (unbounded
    recurrence) are rejected; make_mesh refuses to shrink silently."""
    import pytest

    from neuralampmodelercore_tpu.parallel.sharding import TIME_AXIS, make_mesh, time_sharded_render

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    mesh = make_mesh(axis_names=(TIME_AXIS,))
    n = mesh.shape[TIME_AXIS]
    ctx = m.get_prewarm_samples()
    short = np.zeros(max(n, (ctx - 1) // n * n), np.float32)  # chunk < context
    with pytest.raises(ValueError, match="context"):
        time_sharded_render(m, mesh, short)

    cond = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_condition_dsp.nam"))
    from neuralampmodelercore_tpu.models.lstm import LSTMConfig

    if isinstance(cond.config.condition_config, LSTMConfig):
        with pytest.raises(ValueError, match="recurrence"):
            time_sharded_render(cond, mesh, np.zeros(8192 * n, np.float32))

    with pytest.raises(ValueError, match="devices"):
        make_mesh(n_devices=n + 1)


def test_slimmable_size_out_of_range():
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "slimmable_wavenet.nam"))
    import pytest

    # Negative ratios are UB in the reference (out-of-bounds index) — raise.
    with pytest.raises(ValueError, match=">= 0"):
        m.set_slimmable_size(-0.01)
    # Ratios > 1 clamp to the largest width (the reference's min(), which a
    # float knob rounding to 1.0+epsilon relies on): same as 1.0 => no-op.
    m.set_slimmable_size(1.0)
    assert m.set_slimmable_size(1.0 + 1e-9) is None
    assert m.set_slimmable_size(1.5) is None


def test_checkpoint_path_without_extension_roundtrips(tmp_path):
    """np.savez appends '.npz' to bare string paths; save_state must not, or
    save/load with the same path breaks."""
    from neuralampmodelercore_tpu.utils.checkpoint import load_state, save_state

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"))
    st = m.init_state(2)
    p = str(tmp_path / "ckpt.state")  # no .npz
    save_state(p, st)
    assert os.path.exists(p)
    st2 = load_state(p, m.init_state(2))
    for a, b in zip(
        __import__("jax").tree_util.tree_leaves(st),
        __import__("jax").tree_util.tree_leaves(st2),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
