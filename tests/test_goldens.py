"""Committed golden renders: every example model's output on a fixed input,
captured from the independent NumPy reference engine (tests/goldens/,
regenerate with the snippet in the repo history if semantics legitimately
change).

This pins the E2E render contract against *correlated* regressions — a bug
introduced symmetrically into both live implementations would pass the
runtime cross-check but fail here (SURVEY.md §4 item (e): E2E renders vs
committed reference outputs).
"""

import os

import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from conftest import EXAMPLE_MODELS

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "renders.npz")

CASES = [
    ("wavenet.nam", 1e-4),
    ("lstm.nam", 1e-4),
    ("my_model.nam", 2e-4),
    ("wavenet_a1_standard.nam", 2e-4),
    ("wavenet_condition_dsp.nam", 1e-4),
    ("wavenet_a2_max.nam", 1e-3),  # ~10 peak output
    ("A2.nam", 1e-4),
    ("slimmable_container.nam", 1e-4),
    ("slimmable_wavenet.nam", 1e-3),  # ~8 peak output
]


@pytest.fixture(scope="module")
def goldens():
    return np.load(GOLDENS)


@pytest.mark.parametrize("name,tol", CASES)
def test_render_matches_golden(goldens, name, tol):
    x = goldens["input"]
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, name))
    state = m.reset(1, max_buffer_size=4096)
    y, _ = m.process(x[None], state)
    np.testing.assert_allclose(np.asarray(y)[0], goldens[name], atol=tol)
