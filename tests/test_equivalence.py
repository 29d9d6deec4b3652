"""Implementation-equivalence oracle: the vectorized JAX engine vs the
independent per-sample NumPy reference engine, on every example model.

This is the analog of the reference's dual-build equivalence strategy (Eigen
vs NAM_USE_INLINE_GEMM kernels run in CI as a numerical cross-check;
SURVEY.md §4.6) and of the render-oracle comparison (tools/render.cpp).
"""

import json
import os

import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from conftest import EXAMPLE_MODELS
from ref_engine import ref_render

# (model, samples, min SNR dB, max abs diff)
CASES = [
    ("wavenet.nam", 1024, 70, 1e-4),
    ("lstm.nam", 1024, 55, 1e-4),
    ("my_model.nam", 1024, 70, 2e-4),
    ("wavenet_condition_dsp.nam", 1024, 70, 1e-4),
    ("wavenet_a2_max.nam", 1024, 70, 1e-3),  # large dynamic range (~10 peak)
    ("slimmable_wavenet.nam", 1024, 70, 1e-3),
    ("slimmable_container.nam", 1024, 70, 1e-4),
    ("A2.nam", 1024, 70, 1e-4),
]

SLOW_CASES = [
    ("wavenet_a1_standard.nam", 2048, 70, 2e-4),
]


def _run_case(name, T, min_snr, max_diff):
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(T) * 0.3).astype(np.float32)
    j = json.load(open(os.path.join(EXAMPLE_MODELS, name)))
    y_ref = ref_render(j, x, block_size=64, prewarm=True)

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, name))
    state = m.reset(1, max_buffer_size=4096)
    y, _ = m.process(x[None, :], state)
    y = np.asarray(y)[0]

    diff = np.abs(y - y_ref).max()
    rms = np.sqrt(np.mean(y_ref**2)) + 1e-12
    err = np.sqrt(np.mean((y - y_ref) ** 2)) + 1e-30
    snr = 20 * np.log10(rms / err)
    assert diff < max_diff, f"{name}: maxdiff {diff}"
    assert snr > min_snr, f"{name}: SNR {snr:.1f} dB"


@pytest.mark.parametrize("name,T,min_snr,max_diff", CASES)
def test_equivalence(name, T, min_snr, max_diff):
    _run_case(name, T, min_snr, max_diff)


@pytest.mark.slow
@pytest.mark.parametrize("name,T,min_snr,max_diff", SLOW_CASES)
def test_equivalence_slow(name, T, min_snr, max_diff):
    _run_case(name, T, min_snr, max_diff)


def test_prewarm_matters():
    """Prewarm settles bias-driven transients: output right after reset must
    equal output after a long zero run (reference: test_dsp.cpp prewarm)."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    x = np.full((1, 64), 0.1, np.float32)

    state = m.reset(1, max_buffer_size=64)  # prewarmed
    y1, _ = m.process(x, state)

    m.prewarm_on_reset = False
    state = m.reset(1, max_buffer_size=64)  # not prewarmed
    # settle manually with zeros
    zeros = np.zeros((1, 64), np.float32)
    for _ in range(m.get_prewarm_samples() // 64 + 2):
        _, state = m.process(zeros, state)
    y2, _ = m.process(x, state)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
