"""Fused Pallas LSTM kernel vs the XLA engine scan (interpret mode).

Same contract as tests/test_pallas_stack.py: the kernel
(ops/pallas/lstm.py) is pinned to the XLA engine tier, itself pinned to the
reference per-sample loop (NAM/lstm.cpp:31-68,103-168).
"""

import os

import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from neuralampmodelercore_tpu.models.engine import StreamEngine
from neuralampmodelercore_tpu.ops.pallas import lstm as plstm
from neuralampmodelercore_tpu.tools.generate import make_nam
from conftest import EXAMPLE_MODELS

B = 128


@pytest.fixture(autouse=True)
def _interpret_mode():
    plstm.INTERPRET = True
    yield
    plstm.INTERPRET = False


def _run_equivalence(model, T, n_blocks=6, atol=2e-5, seed=0):
    model.prewarm_on_reset = False
    ex = StreamEngine(model, batch=B, block_size=T, kernel="xla")
    ep = StreamEngine(model, batch=B, block_size=T, kernel="pallas")
    assert ep.kernel == "pallas"
    sx, sp = ex.reset(prewarm=False), ep.reset(prewarm=False)
    rng = np.random.default_rng(seed)
    C = model.num_input_channels
    for i in range(n_blocks):
        blk = (rng.standard_normal((B, T, C)) * 0.4).astype(np.float32)
        yx, sx = ex.process(blk, sx)
        yp, sp = ep.process(blk, sp)
        np.testing.assert_allclose(
            np.asarray(yp), np.asarray(yx), atol=atol, err_msg=f"block {i} (T={T})"
        )


def test_corpus_lstm():
    """lstm.nam (1 layer, H=3, 70 weights incl. initial h/c): the first
    block from a fresh state exercises the broadcast h0/c0 initial carry."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"))
    _run_equivalence(m, T=16)


def test_corpus_lstm_T64():
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"))
    _run_equivalence(m, T=64, n_blocks=3)


def test_multilayer_wide():
    """2 layers, H=8 (dot path instead of the broadcast-sum path), 2 outs."""
    doc = make_nam(
        "LSTM",
        {"num_layers": 2, "input_size": 1, "hidden_size": 8, "out_channels": 2},
        seed=5,
    )
    _run_equivalence(nam.load_model(doc), T=16, seed=2)


def test_hidden_not_multiple_of_8():
    """H=5: padded state rows must stay inert through the recurrence."""
    doc = make_nam(
        "LSTM", {"num_layers": 1, "input_size": 1, "hidden_size": 5}, seed=6
    )
    _run_equivalence(nam.load_model(doc), T=16, seed=3)


def test_fast_tanh_mode():
    """Global fast-tanh switches the cell to fast_sigmoid/fast_tanh
    (reference: NAM/lstm.cpp:48-58) in BOTH tiers."""
    from neuralampmodelercore_tpu.ops import activations as act

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"))
    act.enable_fast_tanh()
    try:
        _run_equivalence(m, T=16, seed=4)
    finally:
        act.disable_fast_tanh()


def test_supports_gate():
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"))
    assert plstm.supports(m.config, 16, 128) is None
    assert plstm.supports(m.config, 16, 96) is not None  # batch grid
    assert plstm.supports(m.config, 12, 128) is not None  # T % 8
    import dataclasses

    assert plstm.supports(dataclasses.replace(m.config, num_layers=0), 16, 128) is not None


def test_dp_sharded_pallas_lstm():
    """The LSTM kernel under stream-DP shard_map: h/c (L, H, B) shard on
    their trailing stream axis."""
    from neuralampmodelercore_tpu.parallel.sharding import (
        STREAM_AXIS,
        dp_sharded_engine_step,
        make_mesh,
    )
    import jax.numpy as jnp

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"))
    m.prewarm_on_reset = False
    n = 2
    mesh = make_mesh(n_devices=n, axis_names=(STREAM_AXIS,))
    Bg = 128 * n
    ep = StreamEngine(m, batch=Bg, block_size=16, kernel="pallas")
    eparams, sstate, sstep = dp_sharded_engine_step(ep, mesh)
    up = ep.reset(prewarm=False)
    rng = np.random.default_rng(8)
    for i in range(3):
        blk = (rng.standard_normal((Bg, 16)) * 0.4).astype(np.float32)
        ys, sstate = sstep(eparams, sstate, jnp.asarray(blk.T[None]))
        yu, up = ep.process(blk, up)
        np.testing.assert_allclose(
            np.asarray(ys)[0].T, np.asarray(yu), atol=1e-6, err_msg=f"block {i}"
        )


def test_fori_loop_long_block():
    """T > 128 takes the fori_loop recurrence (dynamic sublane indexing);
    T=1024 used to be refused by the unrolled-trace gate (VERDICT r3 ask
    #8) and must now be supported and equivalent."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"))
    assert plstm.supports(m.config, 1024, B) is None
    _run_equivalence(m, T=160, n_blocks=2)


def test_engine_prewarm_exact_count_pallas_tier():
    """The exact-count recurrent prewarm (full blocks + remainder step,
    models/engine.py) must hold on the PALLAS tier too: the remainder step
    re-jits the kernel at the remainder block size against the same
    eparams/state (both are T-independent for the LSTM kernel). Uses a
    small sample_rate so 0.5 s of prewarm (reference NAM/lstm.cpp:127-134)
    stays cheap in interpret mode: sr=496 -> 248 samples = 15 x T=16 + 8."""
    doc = make_nam(
        "LSTM", {"num_layers": 1, "input_size": 1, "hidden_size": 8},
        seed=9, sample_rate=496,
    )
    m = nam.load_model(doc)
    T = 16
    assert m.get_prewarm_samples() == 248 and 248 % T != 0
    ex = StreamEngine(m, batch=B, block_size=T, kernel="xla")
    ep = StreamEngine(m, batch=B, block_size=T, kernel="pallas")
    sx, sp = ex.reset(prewarm=True), ep.reset(prewarm=True)
    rng = np.random.default_rng(11)
    blk = (rng.standard_normal((B, T, 1)) * 0.4).astype(np.float32)
    yx, _ = ex.process(blk, sx)
    yp, _ = ep.process(blk, sp)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yx), atol=2e-5)


def test_fori_matches_unrolled_across_boundary():
    """The two kernel forms agree through a block-size change (same state
    semantics either side of the T=128 form boundary)."""
    doc = make_nam("LSTM", {"input_size": 1, "hidden_size": 12, "num_layers": 2}, seed=3)
    m = nam.load_model(doc)
    _run_equivalence(m, T=136, n_blocks=2, seed=5)
