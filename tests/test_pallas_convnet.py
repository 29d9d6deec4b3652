"""Fused Pallas ConvNet kernel vs the XLA engine tier (interpret mode).

Same contract as tests/test_pallas_stack.py: the kernel
(ops/pallas/convnet.py) is pinned to the XLA engine tier, itself pinned to
the generic step and the NumPy reference oracle
(reference: ConvNet::process, NAM/convnet.cpp:206-278).
"""

import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from neuralampmodelercore_tpu.models.engine import StreamEngine
from neuralampmodelercore_tpu.ops.pallas import convnet as pconv
from neuralampmodelercore_tpu.tools.generate import make_nam

B = 128


@pytest.fixture(autouse=True)
def _interpret_mode():
    pconv.INTERPRET = True
    yield
    pconv.INTERPRET = False


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


def _convnet(config, seed=7):
    return nam.load_model(make_nam("ConvNet", config, seed=seed))


def test_shallow_tail_layers():
    """All dilations <= T: every layer runs the tail-state path."""
    m = _convnet({"channels": 8, "dilations": [1, 2, 4, 8], "batchnorm": True,
                  "activation": "Tanh"})
    _run_equivalence(m, T=16)


def test_deep_ring_layers():
    """Dilations > T with T | d: the shifted tap is a whole ring chunk;
    enough blocks that reads cross the ring's LCM wrap."""
    m = _convnet({"channels": 8, "dilations": [1, 16, 32, 64], "batchnorm": True,
                  "activation": "Tanh"})
    _run_equivalence(m, T=16, n_blocks=12)


def test_amp_sized_config():
    """The bench's realistic amp ConvNet (channels=16, dilations 1..512) at a
    serving block size."""
    m = _convnet({"channels": 16,
                  "dilations": [1, 2, 4, 8, 16, 32, 64, 128, 256, 512],
                  "batchnorm": True, "activation": "Tanh"})
    _run_equivalence(m, T=64, n_blocks=10)


def test_no_batchnorm_bias_path():
    """batchnorm=False: conv carries a bias instead (NAM/convnet.cpp:57)."""
    m = _convnet({"channels": 8, "dilations": [1, 2, 4], "batchnorm": False,
                  "activation": "ReLU"})
    _run_equivalence(m, T=16)


def test_multichannel_io():
    m = _convnet({"channels": 8, "dilations": [1, 2, 4], "batchnorm": True,
                  "activation": "SiLU", "in_channels": 2, "out_channels": 3})
    _run_equivalence(m, T=16, seed=3)


def test_grouped_convs():
    """Grouped convs densify to block-diagonal weights at prepare time."""
    m = _convnet({"channels": 8, "dilations": [1, 2], "batchnorm": True,
                  "activation": "Tanh", "groups": 2, "in_channels": 2})
    _run_equivalence(m, T=16, seed=4)


def test_supports_gate():
    m = _convnet({"channels": 8, "dilations": [1, 24], "batchnorm": True,
                  "activation": "Tanh"})
    # d=24 > T=16 and 24 % 16 != 0 -> cross-chunk window, refused
    assert pconv.supports(m.config, 16, B) is not None
    # at T=8, d=24 is a whole-chunk lag (24 % 8 == 0) -> supported
    assert pconv.supports(m.config, 8, B) is None
    assert pconv.supports(m.config, 16, 96) is not None  # batch grid
    assert pconv.supports(m.config, 12, B) is not None  # T % 8


def test_block_size_change_preserves_stream():
    """The kernel at two block sizes produces the same audio for the same
    stream (state semantics independent of T)."""
    cfgd = {"channels": 8, "dilations": [1, 4, 16], "batchnorm": True,
            "activation": "Tanh"}
    x = (np.random.default_rng(9).standard_normal((B, 96)) * 0.4).astype(np.float32)

    outs = []
    for T in (16, 32):
        m = _convnet(cfgd)
        m.prewarm_on_reset = False
        ep = StreamEngine(m, batch=B, block_size=T, kernel="pallas")
        st = ep.reset(prewarm=False)
        ys = []
        for i in range(0, 96, T):
            y, st = ep.process(x[:, i : i + T], st)
            ys.append(np.asarray(y))
        outs.append(np.concatenate(ys, axis=1))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5)
