"""Fused Pallas kernel composed with multi-chip stream-DP sharding.

The headline claim is "4096 real-time streams/chip x N chips"; the x only
holds if the fused kernel (ops/pallas/stack.py) actually partitions across a
device mesh. A pallas_call does not auto-partition under jit shardings the
way plain XLA ops do, so the composition is explicit shard_map
(parallel/sharding.py dp_sharded_pallas_engine_step): each device runs its
own grid over its local stream tiles. These tests prove, on the 8-virtual-
device CPU mesh in interpret mode, that

  sharded-pallas == unsharded-pallas == XLA engine tier

block by block, including the nested-condition-DSP pre-pass state subtree.
(Reference analog: none — the reference is single-chip, SURVEY.md 2.7; this
is the north star's scaling axis.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from neuralampmodelercore_tpu.models.engine import StreamEngine
from neuralampmodelercore_tpu.ops.pallas import stack
from neuralampmodelercore_tpu.parallel.sharding import (
    STREAM_AXIS,
    dp_sharded_engine_step,
    dp_sharded_pallas_engine_step,
    make_mesh,
)
from conftest import EXAMPLE_MODELS


@pytest.fixture(autouse=True)
def _interpret_mode():
    from neuralampmodelercore_tpu.ops.pallas import convnet as pconv

    stack.INTERPRET = True
    pconv.INTERPRET = True
    yield
    stack.INTERPRET = False
    pconv.INTERPRET = False


def _compare_sharded(model, n_devices, T, n_blocks=3, atol_xla=2e-5, seed=0):
    mesh = make_mesh(n_devices=n_devices, axis_names=(STREAM_AXIS,))
    B = 128 * n_devices
    model.prewarm_on_reset = False
    ep = StreamEngine(model, batch=B, block_size=T, kernel="pallas")
    ex = StreamEngine(model, batch=B, block_size=T, kernel="xla")
    # dp_sharded_engine_step must route pallas engines to the shard_map path
    eparams, sstate, sstep = dp_sharded_engine_step(ep, mesh)
    up = ep.reset(prewarm=False)
    ux = ex.reset(prewarm=False)
    rng = np.random.default_rng(seed)
    for i in range(n_blocks):
        blk = (rng.standard_normal((B, T)) * 0.3).astype(np.float32)
        x_ctb = jnp.asarray(blk.T[None])  # (1, T, B)
        ys, sstate = sstep(eparams, sstate, x_ctb)
        yp, up = ep.process(blk, up)
        yx, ux = ex.process(blk, ux)
        ys_bt = np.asarray(ys)[0].T  # (B, T)
        # Per-stream math is identical between the sharded and unsharded
        # kernels (same per-128-tile op sequence) — near-bit-exact.
        np.testing.assert_allclose(
            ys_bt, np.asarray(yp), atol=1e-6, err_msg=f"sharded vs pallas, block {i}"
        )
        np.testing.assert_allclose(
            ys_bt, np.asarray(yx), atol=atol_xla, err_msg=f"sharded vs xla, block {i}"
        )


def test_dp_sharded_pallas_8dev():
    """wavenet.nam on the full 8-device mesh: tail layers + ring layers
    (rf=16 > T=8), 8 x 128 streams."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    _compare_sharded(m, n_devices=8, T=8)


def test_dp_sharded_pallas_flagship_2dev():
    """Flagship architecture (deep dilations, 2 arrays) on a 2-device mesh."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_a1_standard.nam"))
    _compare_sharded(m, n_devices=2, T=16, n_blocks=2)


def test_dp_sharded_pallas_convnet_2dev():
    """The fused ConvNet kernel (ops/pallas/convnet.py) under stream-DP
    shard_map: same rings/tails state layout as the stack kernel, so the
    sharding specs apply unchanged."""
    from neuralampmodelercore_tpu.tools.generate import make_nam

    m = nam.load_model(
        make_nam(
            "ConvNet",
            {"channels": 8, "dilations": [1, 4, 16], "batchnorm": True,
             "activation": "Tanh"},
            seed=7,
        )
    )
    _compare_sharded(m, n_devices=2, T=8, n_blocks=4)


def test_dp_sharded_pallas_condition_dsp():
    """Nested WaveNet condition DSP: the chain FUSES into the kernel
    (stack._fused_chain), so the sharded state carries its rings/tails in
    the flat lists — no pre-pass subtree."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_condition_dsp.nam"))
    assert stack.cond_mode(m.config, 16) == "fused"
    _compare_sharded(m, n_devices=2, T=16, n_blocks=2)


def test_dp_sharded_pallas_lstm_condition_prepass():
    """Non-fusable (LSTM) condition DSP under sharding: the XLA pre-pass
    state subtree ('condition', trailing-B leaves incl. LSTM h/c) must
    shard on the stream axis inside the same shard_map."""
    from neuralampmodelercore_tpu.tools.generate import make_nam, with_condition_dsp

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
    m = nam.load_model(make_nam("WaveNet", with_condition_dsp(config, sub), seed=9))
    assert stack.cond_mode(m.config, 16) == "prepass"
    # explicit kernel="pallas": auto would avoid the pre-pass hybrid
    eng = StreamEngine(m, batch=256, block_size=16, kernel="pallas")
    assert "condition" in eng.init_state()
    _compare_sharded(m, n_devices=2, T=16, n_blocks=3, seed=4)


def test_dp_sharded_pallas_local_width_differs_from_global():
    """B=1024 on 8 devices: the unsharded plan picks a 1024-wide tile while
    each device's local plan can only use 128 — the state must be built from
    the LOCAL plan (the failure mode the docstring warns about)."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    assert stack._pick_w(m.config, 8, 1024) == 1024
    assert stack._pick_w(m.config, 8, 128) == 128
    _compare_sharded(m, n_devices=8, T=8, n_blocks=2, seed=5)


def test_dp_sharded_pallas_rejects_indivisible_batch():
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    mesh = make_mesh(n_devices=8, axis_names=(STREAM_AXIS,))
    eng = StreamEngine(m, batch=128, block_size=8, kernel="pallas")
    with pytest.raises(ValueError, match="per-device batch|not divisible"):
        dp_sharded_pallas_engine_step(eng, mesh)
    ex = StreamEngine(m, batch=128, block_size=8, kernel="xla")
    with pytest.raises(ValueError, match="pallas"):
        dp_sharded_pallas_engine_step(ex, mesh)
