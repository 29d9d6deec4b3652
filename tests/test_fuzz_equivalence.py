"""Randomized cross-implementation fuzzing: random WaveNet feature
combinations -> generator -> (JAX generic, JAX engine, NumPy per-sample
reference) must all agree.

This is the property-based hardening of the weight-stream and compute-graph
contracts: any divergence between three independently-written paths on a
random config flags a fidelity bug.
"""

import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from neuralampmodelercore_tpu.models.engine import StreamEngine
from neuralampmodelercore_tpu.tools import generate
from ref_engine import build_ref_model


def _random_wavenet_config(rng) -> dict:
    """A random small WaveNet layer-array config spanning the feature space."""

    def film():
        if rng.random() < 0.5:
            return None
        return {
            "active": True,
            "shift": bool(rng.random() < 0.7),
            "groups": 1,
        }

    layers = []
    channels_in = 1
    n_arrays = int(rng.integers(1, 3))
    for a in range(n_arrays):
        channels = int(rng.choice([2, 3, 4]))
        use_bottleneck = rng.random() < 0.4
        bottleneck = int(rng.choice([1, 2])) if use_bottleneck else channels
        n_layers = int(rng.integers(1, 4))
        dilations = [int(d) for d in rng.choice([1, 2, 3, 4, 8], size=n_layers)]
        gating_choices = ["none", "gated", "blended"]
        gating = [str(rng.choice(gating_choices)) for _ in range(n_layers)]
        acts = [
            str(rng.choice(["Tanh", "ReLU", "Sigmoid", "Softsign", "Hardswish", "LeakyReLU"]))
            for _ in range(n_layers)
        ]
        head1x1_active = rng.random() < 0.4
        lc = {
            "input_size": channels_in,
            "condition_size": 1,
            "channels": channels,
            "bottleneck": bottleneck,
            "kernel_sizes": [int(k) for k in rng.choice([1, 2, 3], size=n_layers)],
            "dilations": dilations,
            "activation": acts,
            "gating_mode": gating,
            "secondary_activation": "Sigmoid",
            "layer1x1": {"active": True, "groups": 1},
            "head1x1": {
                "active": bool(head1x1_active),
                "out_channels": int(rng.choice([2, 3])),
                "groups": 1,
            },
        }
        # head of this array
        if rng.random() < 0.5:
            head_size = int(rng.choice([1, 2, 3]))
            lc["head"] = {
                "out_channels": head_size,
                "kernel_size": int(rng.choice([1, 2])),
                "bias": bool(rng.random() < 0.5),
            }
        else:
            head_size = int(rng.choice([1, 2, 3]))
            lc["head_size"] = head_size
            lc["head_bias"] = bool(rng.random() < 0.5)
        # FiLM sites (only valid combos: layer1x1_post needs layer1x1 active,
        # head1x1_post needs head1x1)
        for site in [
            "conv_pre_film",
            "conv_post_film",
            "input_mixin_pre_film",
            "input_mixin_post_film",
            "activation_pre_film",
            "activation_post_film",
            "layer1x1_post_film",
        ]:
            f = film()
            if f:
                lc[site] = f
        if head1x1_active:
            f = film()
            if f:
                lc["head1x1_post_film"] = f
        layers.append(lc)
        channels_in = head_size
    # Chaining constraints (reference: model.cpp:604-611 + the head-input
    # copy, model.cpp:435-448): array i's channels == array i-1's head_size,
    # and array i's head accumulator width == array i-1's head_size — so for
    # i >= 1 force bottleneck = channels = prev head_size and no head1x1.
    for i in range(1, len(layers)):
        prev_head = _head_size_of(layers[i - 1])
        layers[i]["input_size"] = layers[i - 1]["channels"]  # layer-output chain
        layers[i]["channels"] = prev_head  # head chain (model.cpp:604-611)
        layers[i]["bottleneck"] = prev_head
        layers[i]["head1x1"]["active"] = False
        layers[i].pop("head1x1_post_film", None)
    return {"layers": layers, "head": None, "head_scale": float(rng.normal() * 0.1 + 0.3)}


def _head_size_of(lc):
    return lc["head"]["out_channels"] if "head" in lc else lc["head_size"]


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_three_way_equivalence(seed):
    rng = np.random.default_rng(seed + 100)
    config = _random_wavenet_config(rng)
    doc = generate.make_nam("WaveNet", config, seed=seed, scale=0.2, version="0.6.0")

    T, n_blocks = 32, 8
    x = (rng.standard_normal(T * n_blocks) * 0.3).astype(np.float32)

    # NumPy per-sample reference: (C_out, T_total) -> (T_total, C_out)
    ref = build_ref_model(doc)
    y_ref = np.concatenate(
        [ref(x[i * T : (i + 1) * T].reshape(1, -1)) for i in range(n_blocks)], axis=1
    ).T

    # JAX generic: feed with explicit channel axis -> (1, T_total, C_out)
    m = nam.load_model(doc)
    m.prewarm_on_reset = False
    st = m.init_state(1)
    y_gen, _ = m.process(x[None, :, None], st)
    y_gen = np.asarray(y_gen)[0]

    # JAX engine
    eng = StreamEngine(m, batch=1, block_size=T)
    est = eng.reset(prewarm=False)
    parts = []
    for i in range(n_blocks):
        y, est = eng.process(x[None, i * T : (i + 1) * T, None], est)
        parts.append(np.asarray(y)[0])
    y_eng = np.concatenate(parts, axis=0)

    np.testing.assert_allclose(y_gen, y_ref, atol=1e-4, err_msg=f"generic vs ref, seed {seed}")
    np.testing.assert_allclose(y_eng, y_gen, atol=2e-5, err_msg=f"engine vs generic, seed {seed}")


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_condition_dsp_and_groups(seed):
    """Nested condition DSPs (WaveNet/LSTM) and grouped/depthwise convs,
    cross-checked three ways."""
    rng = np.random.default_rng(seed + 500)

    # nested condition model: a tiny WaveNet or LSTM producing cond_size channels
    cond_size = int(rng.choice([2, 4]))
    if rng.random() < 0.5:
        sub_cfg = {
            "layers": [
                dict(input_size=1, condition_size=1, head_size=cond_size, channels=4,
                     kernel_size=2, dilations=[1, 2], activation="Tanh", gated=False,
                     head_bias=True)
            ],
            "head": None, "head_scale": 0.5,
        }
        sub_doc = generate.make_nam("WaveNet", sub_cfg, seed=seed, scale=0.2, version="0.6.0")
    else:
        sub_cfg = {"input_size": 1, "hidden_size": 4, "num_layers": 1,
                   "out_channels": cond_size}
        sub_doc = generate.make_nam("LSTM", sub_cfg, seed=seed, scale=0.2, version="0.6.0")

    groups = int(rng.choice([1, 2]))
    channels = 4
    config = {
        "condition_dsp": sub_doc,
        "layers": [
            dict(input_size=1, condition_size=cond_size, head_size=1, channels=channels,
                 kernel_size=3, dilations=[1, 2, 4],
                 activation="Tanh", gated=bool(rng.random() < 0.5), head_bias=True,
                 groups_input=groups,
                 groups_input_mixin=int(rng.choice([1, 2])) if cond_size % 2 == 0 else 1)
        ],
        "head": None,
        "head_scale": 0.3,
    }
    doc = generate.make_nam("WaveNet", config, seed=seed + 50, scale=0.2, version="0.6.0")

    T, n_blocks = 32, 6
    x = (rng.standard_normal(T * n_blocks) * 0.3).astype(np.float32)

    ref = build_ref_model(doc)
    y_ref = np.concatenate(
        [ref(x[i * T : (i + 1) * T].reshape(1, -1)) for i in range(n_blocks)], axis=1
    ).T

    m = nam.load_model(doc)
    m.prewarm_on_reset = False
    y_gen, _ = m.process(x[None, :, None], m.init_state(1))
    y_gen = np.asarray(y_gen)[0]

    eng = StreamEngine(m, batch=1, block_size=T)
    est = eng.reset(prewarm=False)
    parts = []
    for i in range(n_blocks):
        y, est = eng.process(x[None, i * T : (i + 1) * T, None], est)
        parts.append(np.asarray(y)[0])
    y_eng = np.concatenate(parts, axis=0)

    np.testing.assert_allclose(y_gen, y_ref, atol=1e-4, err_msg=f"generic vs ref, seed {seed}")
    np.testing.assert_allclose(y_eng, y_gen, atol=2e-5, err_msg=f"engine vs generic, seed {seed}")
