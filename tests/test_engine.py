"""StreamEngine (ring-state, fixed-T) vs generic step equivalence.

The analog of the reference's A2-fast vs generic WaveNet equivalence test
(reference: tools/test/test_a2_fast.cpp:270-311): same weights, same input,
two implementations, tight tolerance.
"""

import os

import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from neuralampmodelercore_tpu.models.engine import StreamEngine
from conftest import EXAMPLE_MODELS

MODELS = ["wavenet.nam", "my_model.nam", "wavenet_a2_max.nam", "wavenet_condition_dsp.nam", "lstm.nam"]


@pytest.mark.parametrize("name", MODELS)
@pytest.mark.parametrize("T", [64, 16])
def test_engine_matches_generic(name, T):
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, name))
    m.prewarm_on_reset = False
    rng = np.random.default_rng(9)
    n_blocks = 40  # enough that deep-dilation taps cross chunk boundaries
    x = (rng.standard_normal((2, n_blocks * T)) * 0.3).astype(np.float32)

    gstate = m.init_state(2)
    eng = StreamEngine(m, batch=2, block_size=T)
    estate = eng.reset(prewarm=False)

    for i in range(n_blocks):
        blk = x[:, i * T : (i + 1) * T]
        yg, gstate = m.process(blk, gstate)
        ye, estate = eng.process(blk, estate)
        np.testing.assert_allclose(
            np.asarray(ye), np.asarray(yg), atol=2e-5, err_msg=f"{name} T={T} block {i}"
        )


def test_engine_prewarm_matches_generic_prewarm():
    """Engine prewarm (ceil to block grid) reaches the same zero-input fixed
    point as the exact-count generic prewarm for feedforward models."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    gstate = m.reset(1, max_buffer_size=64)  # exact prewarm
    eng = StreamEngine(m, batch=1, block_size=64)
    estate = eng.reset()  # ceil prewarm

    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, 64)) * 0.3).astype(np.float32)
    yg, _ = m.process(x, gstate)
    ye, _ = eng.process(x, estate)
    np.testing.assert_allclose(np.asarray(ye), np.asarray(yg), atol=1e-6)


def test_engine_prewarm_exact_count_for_recurrent():
    """LSTM prewarm is 0.5 s = 24,000 samples (reference NAM/lstm.cpp:127-134)
    and (h, c) has no zero-input fixed point within that horizon, so the
    engine must honor the EXACT count even when T does not divide it
    (T=128 -> 187 full blocks + a 64-sample remainder step): the prewarmed
    engine must produce the same first output block as the exact-count
    generic prewarm."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"))
    assert m.get_prewarm_samples() == 24000
    T = 128
    assert m.get_prewarm_samples() % T != 0

    gstate = m.reset(1, max_buffer_size=T)  # generic: exact count
    eng = StreamEngine(m, batch=1, block_size=T)
    estate = eng.reset()  # engine: full blocks + remainder step

    rng = np.random.default_rng(5)
    x = (rng.standard_normal((1, T)) * 0.3).astype(np.float32)
    yg, _ = m.process(x, gstate)
    ye, _ = eng.process(x, estate)
    np.testing.assert_allclose(np.asarray(ye), np.asarray(yg), atol=1e-6)

    # Sensitivity check: the ceil-to-block-grid count (64 extra recurrence
    # steps) produces a measurably different state — i.e. the remainder
    # logic is load-bearing, not vacuously passing.
    ceil_state = eng.init_state()
    import jax.numpy as jnp

    zeros = jnp.zeros((1, T, 1), np.float32)
    for _ in range(-(-24000 // T)):
        _, ceil_state = eng.step_fn()(eng.params, ceil_state, zeros)
    y_ceil, _ = eng.process(x, ceil_state)
    assert np.abs(np.asarray(y_ceil) - np.asarray(yg)).max() > 0


def test_engine_rejects_wrong_block():
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    eng = StreamEngine(m, batch=1, block_size=64)
    st = eng.reset(prewarm=False)
    with pytest.raises(ValueError, match="specialized to block_size"):
        eng.process(np.zeros((1, 32), np.float32), st)


def test_engine_no_retrace():
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    eng = StreamEngine(m, batch=2, block_size=64)
    st = eng.reset(prewarm=False)
    x = np.zeros((2, 64), np.float32)
    _, st = eng.process(x, st)
    before = eng.step_fn()._cache_size()
    for _ in range(5):
        _, st = eng.process(x, st)
    assert eng.step_fn()._cache_size() == before
