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


def test_retrace_detector_detects():
    """Prove the retrace detector DETECTS: a deliberate shape change must
    grow the jit cache the counter reads — the analog of the reference's
    allocation-tracker `_fail` self-tests (tools/run_tests.cpp:164,210),
    which assert the malloc interposition itself works before trusting the
    allocation-free assertions."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    state = m.init_state(4)
    _, state = m.process(np.zeros((4, 64), np.float32), state)
    step = m.step_fn()
    before = step._cache_size()
    # New block length = new traced shape: the counter MUST move.
    state2 = m.init_state(4)
    m.process(np.zeros((4, 32), np.float32), state2)
    assert step._cache_size() > before, (
        "retrace detector failed to count a deliberate shape-change retrace"
    )


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


def test_flagship_depth_block_invariance():
    """The flagship (receptive field 4,092) through the GENERIC tier with
    mixed block sizes including 1, over >= 2x its receptive field — the
    deep-ring analog of the reference's buffer-size invariance
    (tools/test/test_wavenet/test_full.cpp). Engine/pallas tiers are pinned
    to this tier elsewhere (tests/test_engine.py, tests/test_pallas_stack.py)."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_a1_standard.nam"))
    m.prewarm_on_reset = False
    rng = np.random.default_rng(11)
    n = 8192
    x = (rng.standard_normal((1, n)) * 0.3).astype(np.float32)

    state = m.init_state(1)
    y_full, _ = m.process(x, state)
    y_full = np.asarray(y_full)

    # Mixed sizes incl. 1 force every splice offset through the deep rings;
    # the cycle repeats every 1+64+37+1+512+128 = 743 samples (not a divisor
    # of any dilation) so phases keep shifting.
    y = _blocked(m, x, [1, 64, 37, 1, 512, 128])
    np.testing.assert_allclose(y, y_full, atol=2e-5)


def test_fuse_mixin_hook_pinned_disabled_but_correct():
    """_can_fuse_mixin is measured-off (docs/performance.md: stack alignment
    beats op count) but the ring_conv_step(extra=...) hook it reserves must
    stay correct so a padded-stack variant can re-enable it. Pin both."""
    import jax.numpy as jnp

    from neuralampmodelercore_tpu.models.wavenet import _can_fuse_mixin
    from neuralampmodelercore_tpu.ops.layers import Conv1dSpec, Conv1x1Spec
    from neuralampmodelercore_tpu.ops.ring import (
        conv1x1_ctb,
        ring_conv_init,
        ring_conv_step,
    )

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet_a1_standard.nam"))
    for ac in m.config.layer_arrays:
        for i in range(ac.num_layers):
            assert _can_fuse_mixin(ac, i) is False  # pinned: disabled

    # The hook itself: fused [W_conv | W_mixin] @ [taps; cond] must equal
    # conv(x) + mixin(cond).
    rng = np.random.default_rng(0)
    C, O, S, K, d, T, B = 6, 5, 3, 3, 2, 16, 4
    spec = Conv1dSpec(C, O, K, d, bias=True)
    w = rng.standard_normal((O, K * C)).astype(np.float32)
    b = rng.standard_normal(O).astype(np.float32)
    mw = rng.standard_normal((O, S)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((C, T, B)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((S, T, B)).astype(np.float32))

    st = ring_conv_init(spec, T, B)
    y_sep, _ = ring_conv_step(spec, T, {"w": jnp.asarray(w), "b": jnp.asarray(b)}, st, x)
    y_sep = y_sep + conv1x1_ctb(Conv1x1Spec(S, O, bias=False), {"w": jnp.asarray(mw)}, cond)

    st = ring_conv_init(spec, T, B)
    fused = {"w": jnp.asarray(np.concatenate([w, mw], axis=1)), "b": jnp.asarray(b)}
    y_fused, _ = ring_conv_step(spec, T, fused, st, x, extra=cond)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_sep), atol=1e-5)
