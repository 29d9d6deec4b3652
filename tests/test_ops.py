"""Op-level unit tests with hand-computable goldens and torch cross-checks.

Mirrors the reference's op tests (reference: tools/test/test_conv1d.cpp,
test_conv_1x1.cpp, test_film.cpp, test_activations.cpp, test_fast_lut.cpp,
test_gating_activations.cpp; SURVEY.md §4.1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from neuralampmodelercore_tpu.formats import WeightReader
from neuralampmodelercore_tpu.ops import activations as act
from neuralampmodelercore_tpu.ops.layers import (
    Conv1dSpec,
    Conv1x1Spec,
    FiLMSpec,
    blended_apply,
    conv1d_init_state,
    conv1d_params,
    conv1d_step,
    conv1x1_apply,
    conv1x1_params,
    film_apply,
    film_params,
    gated_apply,
)


def rng():
    return np.random.default_rng(1234)


# -- Conv1x1 -----------------------------------------------------------------


def test_conv1x1_identity():
    spec = Conv1x1Spec(2, 2, bias=False)
    w = np.eye(2, dtype=np.float32).reshape(-1)  # row-major (out, in)
    p = conv1x1_params(spec, WeightReader(w))
    x = rng().standard_normal((1, 5, 2)).astype(np.float32)
    y = conv1x1_apply(spec, p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), x, rtol=1e-6)


def test_conv1x1_matches_matmul():
    spec = Conv1x1Spec(3, 4, bias=True)
    w = rng().standard_normal(3 * 4 + 4).astype(np.float32)
    p = conv1x1_params(spec, WeightReader(w))
    W = w[:12].reshape(4, 3)  # row-major (out, in)
    b = w[12:]
    x = rng().standard_normal((2, 7, 3)).astype(np.float32)
    y = conv1x1_apply(spec, p, jnp.asarray(x))
    expected = np.einsum("oi,bti->bto", W, x) + b
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-6)


def test_conv1x1_grouped_isolation():
    """Group g's outputs depend only on group g's inputs
    (reference: test_conv_1x1.cpp grouped tests)."""
    spec = Conv1x1Spec(4, 4, bias=False, groups=2)
    w = rng().standard_normal(spec.num_weights).astype(np.float32)
    p = conv1x1_params(spec, WeightReader(w.copy()))
    x = rng().standard_normal((1, 3, 4)).astype(np.float32)
    y0 = np.asarray(conv1x1_apply(spec, p, jnp.asarray(x)))
    x2 = x.copy()
    x2[..., 2:] = 99.0  # perturb group 1 inputs
    y1 = np.asarray(conv1x1_apply(spec, p, jnp.asarray(x2)))
    np.testing.assert_allclose(y0[..., :2], y1[..., :2], rtol=1e-6)  # group 0 unchanged
    assert not np.allclose(y0[..., 2:], y1[..., 2:])


def test_conv1x1_depthwise():
    spec = Conv1x1Spec(3, 3, bias=False, groups=3)
    assert spec.depthwise
    w = np.array([2.0, 3.0, 4.0], np.float32)
    p = conv1x1_params(spec, WeightReader(w))
    x = np.ones((1, 2, 3), np.float32)
    y = np.asarray(conv1x1_apply(spec, p, jnp.asarray(x)))
    np.testing.assert_allclose(y[0, 0], [2, 3, 4])


# -- Conv1D ------------------------------------------------------------------


def test_conv1d_identity_k1():
    spec = Conv1dSpec(1, 1, kernel_size=1, dilation=1, bias=False)
    p = conv1d_params(spec, WeightReader(np.array([1.0], np.float32)))
    x = rng().standard_normal((1, 8, 1)).astype(np.float32)
    st = conv1d_init_state(spec, 1)
    y, _ = conv1d_step(spec, p, st, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), x, rtol=1e-6)


def test_conv1d_delay():
    """kernel [1, 0] with dilation d == delay by d samples."""
    d = 3
    spec = Conv1dSpec(1, 1, kernel_size=2, dilation=d, bias=False)
    # weight order (out, in, tap): tap 0 = oldest
    p = conv1d_params(spec, WeightReader(np.array([1.0, 0.0], np.float32)))
    x = np.arange(1, 9, dtype=np.float32).reshape(1, 8, 1)
    st = conv1d_init_state(spec, 1)
    y, _ = conv1d_step(spec, p, st, jnp.asarray(x))
    expected = np.concatenate([np.zeros(d), np.arange(1, 9 - d)]).reshape(1, 8, 1)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-6)


def test_conv1d_vs_torch():
    """Cross-check against torch.nn.functional.conv1d with left padding."""
    torch = pytest.importorskip("torch")
    cin, cout, K, dil, T, B = 3, 5, 4, 2, 32, 2
    spec = Conv1dSpec(cin, cout, kernel_size=K, dilation=dil, bias=True)
    w = rng().standard_normal(spec.num_weights).astype(np.float32)
    p = conv1d_params(spec, WeightReader(w.copy()))
    x = rng().standard_normal((B, T, cin)).astype(np.float32)
    st = conv1d_init_state(spec, B)
    y, _ = conv1d_step(spec, p, st, jnp.asarray(x))
    #

    # torch: weight (out, in, K) — .nam stream is (out, in, tap) row-major,
    # which matches torch Conv1d weight layout directly.
    tw = torch.tensor(w[: cout * cin * K].reshape(cout, cin, K))
    tb = torch.tensor(w[cout * cin * K :])
    tx = torch.tensor(x.transpose(0, 2, 1))  # (B, C, T)
    tx = torch.nn.functional.pad(tx, ((K - 1) * dil, 0))
    ty = torch.nn.functional.conv1d(tx, tw, tb, dilation=dil)
    np.testing.assert_allclose(
        np.asarray(y), ty.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5
    )


def test_conv1d_multi_call_continuity():
    """Splitting the input across calls gives identical output
    (reference: test_conv1d.cpp multi-call continuity)."""
    spec = Conv1dSpec(2, 3, kernel_size=3, dilation=4, bias=True)
    w = rng().standard_normal(spec.num_weights).astype(np.float32)
    p = conv1d_params(spec, WeightReader(w))
    x = rng().standard_normal((1, 40, 2)).astype(np.float32)
    st = conv1d_init_state(spec, 1)
    y_full, _ = conv1d_step(spec, p, st, jnp.asarray(x))
    st = conv1d_init_state(spec, 1)
    parts = []
    for lo, hi in [(0, 7), (7, 8), (8, 29), (29, 40)]:
        y, st = conv1d_step(spec, p, st, jnp.asarray(x[:, lo:hi]))
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts, axis=1), np.asarray(y_full), rtol=1e-5, atol=1e-6)


def test_conv1d_depthwise_weight_order():
    """Depthwise stream order is (channel, tap) (reference: conv1d.cpp:12-24)."""
    spec = Conv1dSpec(2, 2, kernel_size=2, dilation=1, bias=False, groups=2)
    assert spec.depthwise
    # c0: taps [1, 2]; c1: taps [3, 4]  (tap 0 oldest)
    p = conv1d_params(spec, WeightReader(np.array([1, 2, 3, 4], np.float32)))
    x = np.zeros((1, 3, 2), np.float32)
    x[0, 0] = [1.0, 1.0]  # impulse at t=0
    st = conv1d_init_state(spec, 1)
    y, _ = conv1d_step(spec, p, st, jnp.asarray(x))
    # response: t0 = newest tap (k=K-1), t1 = oldest tap
    np.testing.assert_allclose(np.asarray(y)[0], [[2, 4], [1, 3], [0, 0]], rtol=1e-6)


# -- FiLM --------------------------------------------------------------------


def test_film_scale_shift():
    """(reference: test_film.cpp)"""
    spec = FiLMSpec(condition_dim=1, input_dim=2, shift=True)
    # Conv1x1 1->4 with bias: w rows [s0, s1, sh0, sh1], then bias
    w = np.array([1.0, 2.0, 0.5, -0.5, 0.0, 0.0, 1.0, 2.0], np.float32)
    p = film_params(spec, WeightReader(w))
    x = np.ones((1, 1, 2), np.float32)
    cond = np.ones((1, 1, 1), np.float32)
    y = np.asarray(film_apply(spec, p, jnp.asarray(x), jnp.asarray(cond)))
    # scale = [1*1+0, 2*1+0] = [1,2]; shift = [0.5*1+1, -0.5*1+2] = [1.5, 1.5]
    np.testing.assert_allclose(y[0, 0], [1 * 1 + 1.5, 1 * 2 + 1.5], rtol=1e-6)


def test_film_scale_only():
    spec = FiLMSpec(condition_dim=1, input_dim=2, shift=False)
    w = np.array([3.0, 4.0, 0.0, 0.0], np.float32)  # w(2x1) + bias(2)
    p = film_params(spec, WeightReader(w))
    x = np.full((1, 1, 2), 2.0, np.float32)
    cond = np.ones((1, 1, 1), np.float32)
    y = np.asarray(film_apply(spec, p, jnp.asarray(x), jnp.asarray(cond)))
    np.testing.assert_allclose(y[0, 0], [6.0, 8.0], rtol=1e-6)


# -- activations -------------------------------------------------------------


@pytest.mark.parametrize(
    "cfg,fn",
    [
        ("Tanh", np.tanh),
        ("ReLU", lambda x: np.maximum(x, 0)),
        ("Sigmoid", lambda x: 1 / (1 + np.exp(-x))),
        ("SiLU", lambda x: x / (1 + np.exp(-x))),
        ("Hardtanh", lambda x: np.clip(x, -1, 1)),
        ("Softsign", lambda x: x / (1 + np.abs(x))),
        ("Hardswish", lambda x: x * np.clip(x + 3, 0, 6) / 6),
    ],
)
def test_simple_activations(cfg, fn):
    x = np.linspace(-4, 4, 101).astype(np.float32).reshape(1, 101, 1)
    y = np.asarray(act.apply(act.ActivationConfig.from_json(cfg), jnp.asarray(x)))
    np.testing.assert_allclose(y, fn(x), rtol=1e-5, atol=1e-6)


def test_leaky_relu_slope():
    cfg = act.ActivationConfig.from_json({"type": "LeakyReLU", "negative_slope": 0.2})
    x = np.array([-1.0, 2.0], np.float32).reshape(1, 2, 1)
    y = np.asarray(act.apply(cfg, jnp.asarray(x)))
    np.testing.assert_allclose(y.ravel(), [-0.2, 2.0], rtol=1e-6)


def test_prelu_per_channel():
    cfg = act.ActivationConfig.from_json({"type": "PReLU", "negative_slopes": [0.1, 0.5]})
    x = np.full((1, 3, 2), -1.0, np.float32)
    y = np.asarray(act.apply(cfg, jnp.asarray(x)))
    np.testing.assert_allclose(y[0, 0], [-0.1, -0.5], rtol=1e-6)


def test_leaky_hardtanh():
    cfg = act.ActivationConfig.from_json(
        {"type": "LeakyHardtanh", "min_val": -1.0, "max_val": 1.0, "min_slope": 0.1, "max_slope": 0.2}
    )
    x = np.array([-2.0, 0.5, 3.0], np.float32).reshape(1, 3, 1)
    y = np.asarray(act.apply(cfg, jnp.asarray(x)))
    np.testing.assert_allclose(y.ravel(), [(-2 + 1) * 0.1 - 1, 0.5, (3 - 1) * 0.2 + 1], rtol=1e-6)


def test_fast_tanh_accuracy():
    """Rational approx close to tanh (reference: test_activations.cpp)."""
    x = np.linspace(-5, 5, 1001).astype(np.float32)
    y = np.asarray(act.fast_tanh(jnp.asarray(x)))
    assert np.abs(y - np.tanh(x)).max() < 1e-2


def test_fast_tanh_mode_rebinds_tanh():
    x = jnp.asarray(np.linspace(-2, 2, 11).astype(np.float32))
    cfg = act.ActivationConfig.simple("Tanh")
    act.enable_fast_tanh()
    try:
        y_fast = np.asarray(act.apply(cfg, x))
    finally:
        act.disable_fast_tanh()
    np.testing.assert_allclose(y_fast, np.asarray(act.fast_tanh(x)), rtol=1e-6)
    assert not np.allclose(y_fast, np.tanh(np.asarray(x)), atol=1e-7)


def test_lut_accuracy():
    """(reference: test_fast_lut.cpp)"""
    act.enable_lut("Tanh", -6.0, 6.0, 4096)
    try:
        x = np.linspace(-5.9, 5.9, 777).astype(np.float32)
        cfg = act.ActivationConfig.simple("Tanh")
        y = np.asarray(act.apply(cfg, jnp.asarray(x)))
        assert np.abs(y - np.tanh(x)).max() < 1e-4
        # Clamping beyond range
        y2 = np.asarray(act.apply(cfg, jnp.asarray(np.array([100.0], np.float32))))
        np.testing.assert_allclose(y2, np.tanh(6.0), rtol=1e-5)
    finally:
        act.disable_lut("Tanh")


# -- gating / blending (reference: test_gating_activations.cpp,
#    test_blending_detailed.cpp) --------------------------------------------


def test_gated_math():
    p = act.ActivationConfig.simple("Tanh")
    s = act.ActivationConfig.simple("Sigmoid")
    z = rng().standard_normal((1, 5, 6)).astype(np.float32)
    y = np.asarray(gated_apply(p, s, jnp.asarray(z), 3))
    expected = np.tanh(z[..., :3]) * (1 / (1 + np.exp(-z[..., 3:])))
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_blended_math():
    p = act.ActivationConfig.simple("Tanh")
    s = act.ActivationConfig.simple("Sigmoid")
    z = rng().standard_normal((1, 5, 6)).astype(np.float32)
    y = np.asarray(blended_apply(p, s, jnp.asarray(z), 3))
    alpha = 1 / (1 + np.exp(-z[..., 3:]))
    expected = alpha * np.tanh(z[..., :3]) + (1 - alpha) * z[..., :3]
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)
