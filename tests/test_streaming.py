"""Streaming-state property tests: block-size invariance and retrace-freedom.

Block-size invariance is the reference's core streaming contract — identical
output regardless of how the stream is chopped into blocks (reference:
tools/test/test_wavenet/test_full.cpp buffer-size invariance, SURVEY.md §4.2).
Retrace-freedom in the steady state is the TPU analog of the reference's
allocation-free real-time safety (tools/test/allocation_tracking.cpp:
malloc-interposition; here, a jit cache that stops growing).
"""

import json
import os

import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from conftest import EXAMPLE_MODELS

MODELS = ["wavenet.nam", "lstm.nam", "wavenet_a2_max.nam", "wavenet_condition_dsp.nam"]


def _blocked(m, x, sizes):
    state = m.init_state(1)
    outs = []
    i = 0
    k = 0
    T = x.shape[1]
    while i < T:
        n = min(sizes[k % len(sizes)], T - i)
        y, state = m.process(x[:, i : i + n], state)
        outs.append(np.asarray(y))
        i += n
        k += 1
    return np.concatenate(outs, axis=1)


@pytest.mark.parametrize("name", MODELS)
def test_block_size_invariance(name):
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, name))
    m.prewarm_on_reset = False
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((1, 512)) * 0.3).astype(np.float32)

    state = m.init_state(1)
    y_full, _ = m.process(x, state)
    y_full = np.asarray(y_full)

    for sizes in [[64], [256], [1], [17, 3, 64, 128]]:
        if sizes == [1] and name != "wavenet.nam":
            continue  # block size 1 everywhere is slow; one model suffices
        y = _blocked(m, x, sizes)
        np.testing.assert_allclose(y, y_full, atol=1e-5, err_msg=f"{name} sizes={sizes}")


def test_state_continuity_lstm():
    """Hidden state must evolve across calls (reference: test_lstm.cpp:246)."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"))
    m.prewarm_on_reset = False
    state0 = m.init_state(1)
    x = np.full((1, 16), 0.5, np.float32)
    _, state1 = m.process(x, state0)
    h0 = np.asarray(m.init_state(1)["h"][0])
    h1 = np.asarray(state1["h"][0])
    assert not np.allclose(h0, h1)


def test_no_retrace_steady_state():
    """After the first block, repeated same-shape process calls must not
    recompile (TPU analog of allocation-free process,
    tools/test/test_wavenet/test_real_time_safe.cpp)."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    state = m.init_state(4)
    x = np.zeros((4, 64), np.float32)
    _, state = m.process(x, state)
    step = m.step_fn()
    before = step._cache_size()
    for _ in range(10):
        _, state = m.process(x, state)
    assert step._cache_size() == before, "process() retraced in steady state"


def test_batched_streams_independent():
    """Streams in a batch are independent: batched processing equals
    per-stream processing (the DP axis contract, SURVEY.md §2.7)."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((3, 256)) * 0.3).astype(np.float32)

    state = m.init_state(3)
    y_batch, _ = m.process(x, state)
    y_batch = np.asarray(y_batch)

    for b in range(3):
        state = m.init_state(1)
        y, _ = m.process(x[b : b + 1], state)
        np.testing.assert_allclose(np.asarray(y)[0], y_batch[b], atol=1e-6)


def test_render_equals_streaming():
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(512) * 0.3).astype(np.float32)
    y_render = np.asarray(m.render(x))

    state = m.reset(1, max_buffer_size=64)
    outs = []
    for i in range(0, 512, 64):
        y, state = m.process(x[None, i : i + 64], state)
        outs.append(np.asarray(y)[0])
    y_stream = np.concatenate(outs)
    np.testing.assert_allclose(y_render, y_stream, atol=1e-5)
