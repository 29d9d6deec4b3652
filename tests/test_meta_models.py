"""Slimmable / container meta-model tests.

(reference: tools/test/test_slimmable_wavenet.cpp, test_container.cpp,
test_render_slim.cpp; SURVEY.md §4.6-4.7)
"""

import json
import os

import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from neuralampmodelercore_tpu.models.slimmable import extract_slimmed_weights, _slim_config
from conftest import EXAMPLE_MODELS


def _load(name):
    return nam.load_model(os.path.join(EXAMPLE_MODELS, name))


# -- SlimmableWavenet --------------------------------------------------------


def test_slimmable_full_size_matches_plain_wavenet():
    """At ratio 1.0 the slimmable model must equal the plain WaveNet built
    from the same config without the slimmable key."""
    j = json.load(open(os.path.join(EXAMPLE_MODELS, "slimmable_wavenet.nam")))
    sm = nam.load_model(j)
    j2 = json.loads(json.dumps(j))
    for lc in j2["config"]["layers"]:
        lc.pop("slimmable", None)
    pm = nam.load_model(j2)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(512) * 0.3).astype(np.float32)
    y_s = np.asarray(sm.render(x))
    y_p = np.asarray(pm.render(x))
    np.testing.assert_allclose(y_s, y_p, atol=1e-6)


def test_slimmed_matches_independently_built():
    """Slimmed model == WaveNet built directly from extracted weights
    (reference: test_slimmable_wavenet.cpp)."""
    j = json.load(open(os.path.join(EXAMPLE_MODELS, "slimmable_wavenet.nam")))
    sm = nam.load_model(j)
    full_cfg = sm._full_cfg
    slim_w = extract_slimmed_weights(full_cfg, np.asarray(j["weights"], np.float32), [2])

    # Build an independent plain WaveNet at channels=2 from the slimmed stream.
    j2 = json.loads(json.dumps(j))
    lc = j2["config"]["layers"][0]
    lc.pop("slimmable")
    lc["channels"] = 2
    j2["weights"] = [float(v) for v in slim_w]
    pm = nam.load_model(j2)

    sm.reset(1, max_buffer_size=4096)
    st = sm.set_slimmable_size(0.5)  # allowed [1,2,3], ratio 0.5 -> idx 1 -> 2ch
    assert st is not None

    rng = np.random.default_rng(1)
    x = (rng.standard_normal(512) * 0.3).astype(np.float32)
    y_s, _ = sm.process(x[None], st)
    y_p = np.asarray(pm.render(x))
    np.testing.assert_allclose(np.asarray(y_s)[0], y_p, atol=1e-6)


def test_slimmable_breakpoints():
    sm = _load("slimmable_wavenet.nam")
    bps = sm.get_slimmable_size_breakpoints()
    np.testing.assert_allclose(bps, [1 / 3, 2 / 3])


def test_slimmable_ratio_mapping():
    """idx = min(floor(ratio*len), len-1) (reference: slimmable.cpp:100-106)."""
    sm = _load("slimmable_wavenet.nam")
    assert sm._channels_for_size(0.0) == (1,)
    assert sm._channels_for_size(0.32) == (1,)
    assert sm._channels_for_size(0.34) == (2,)
    assert sm._channels_for_size(0.67) == (3,)
    assert sm._channels_for_size(1.0) == (3,)


def test_slimmable_same_size_returns_none():
    sm = _load("slimmable_wavenet.nam")
    sm.reset(1)
    assert sm.set_slimmable_size(1.0) is None  # already full


def test_slimmable_output_channels_stable():
    sm = _load("slimmable_wavenet.nam")
    sm.reset(1, max_buffer_size=64)
    st = sm.set_slimmable_size(0.0)
    y, _ = sm.process(np.zeros((1, 64), np.float32), st)
    assert np.asarray(y).shape == (1, 64)


# -- SlimmableContainer ------------------------------------------------------


def test_container_selection_boundaries():
    """Submodel selection: first with val < max_value
    (reference: test_container.cpp, container.cpp:85-97)."""
    c = _load("slimmable_container.nam")
    # max_values 0.33 / 0.66 / 1.0
    assert c._index_for_slimmable_size(0.0) == 0
    assert c._index_for_slimmable_size(0.32) == 0
    assert c._index_for_slimmable_size(0.33) == 1
    assert c._index_for_slimmable_size(0.65) == 1
    assert c._index_for_slimmable_size(0.66) == 2
    assert c._index_for_slimmable_size(1.0) == 2
    assert c._index_for_slimmable_size(2.0) == 2


def test_container_default_active_is_last():
    c = _load("slimmable_container.nam")
    assert c.active_index == len(c.submodels) - 1


def test_container_switch_resets_before_activation():
    c = _load("slimmable_container.nam")
    c.prewarm_on_reset = False
    c.reset(1, max_buffer_size=64)
    st = c.set_slimmable_size(0.1)
    assert st is not None and c.active_index == 0
    y, _ = c.process(np.zeros((1, 64), np.float32), st)
    assert np.isfinite(np.asarray(y)).all()


def test_container_matches_submodel():
    """Container output == directly loaded submodel output."""
    j = json.load(open(os.path.join(EXAMPLE_MODELS, "slimmable_container.nam")))
    c = nam.load_model(j)
    sub = nam.load_model(j["config"]["submodels"][-1]["model"])
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(256) * 0.3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(c.render(x)), np.asarray(sub.render(x)), atol=1e-7)


def test_container_validation():
    j = json.load(open(os.path.join(EXAMPLE_MODELS, "slimmable_container.nam")))
    j2 = json.loads(json.dumps(j))
    j2["config"]["submodels"] = list(reversed(j2["config"]["submodels"]))
    with pytest.raises(ValueError, match="ascending"):
        nam.load_model(j2)
    j3 = json.loads(json.dumps(j))
    j3["config"]["submodels"] = j3["config"]["submodels"][:1]  # max 0.33 < 1.0
    with pytest.raises(ValueError, match="max_value"):
        nam.load_model(j3)


# -- Non-blocking switching (reference: staged atomic swap,
#    NAM/wavenet/slimmable.cpp:309-348,465-498) ------------------------------


def test_precompile_all_widths():
    sm = _load("slimmable_wavenet.nam")
    sm.prewarm_on_reset = False
    sm.reset(1, max_buffer_size=64)
    n = sm.precompile_slimmable_sizes()
    # allowed [1,2,3] -> three distinct widths, all built
    assert n == 3
    assert len(sm._models) == 3


def test_staged_switch_matches_synchronous():
    """stage + poll produces the same model/state semantics as the blocking
    set_slimmable_size, while the current width keeps serving."""
    sm = _load("slimmable_wavenet.nam")
    sm.prewarm_on_reset = False
    st_cur = sm.reset(1, max_buffer_size=64)
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((1, 64)) * 0.3).astype(np.float32)

    assert sm.stage_slimmable_size(0.5) is True
    # current (full) width keeps serving while the switch builds
    y_serve, st_cur = sm.process(x, st_cur)
    assert np.isfinite(np.asarray(y_serve)).all()
    st_new = sm.wait_slimmable_switch()
    assert st_new is not None
    assert sm._current_size_key() == (2,)
    y_staged, _ = sm.process(x, st_new)

    ref = _load("slimmable_wavenet.nam")
    ref.prewarm_on_reset = False
    ref.reset(1, max_buffer_size=64)
    st_ref = ref.set_slimmable_size(0.5)
    y_sync, _ = ref.process(x, st_ref)
    np.testing.assert_allclose(np.asarray(y_staged), np.asarray(y_sync), atol=1e-7)


def test_stage_noop_for_current_size():
    sm = _load("slimmable_wavenet.nam")
    sm.prewarm_on_reset = False
    sm.reset(1, max_buffer_size=64)
    assert sm.stage_slimmable_size(1.0) is False  # already full width
    assert sm.poll_slimmable_switch() is None


def test_stage_to_current_cancels_pending():
    """A completed-but-unadopted stage must NOT be adopted after a newer
    request resolves to the current size: the newest request always wins."""
    sm = _load("slimmable_wavenet.nam")
    sm.prewarm_on_reset = False
    sm.reset(1, max_buffer_size=64)
    sm.stage_slimmable_size(0.0)  # width 1
    t = sm._stage_slot["_stage_thread"]
    t.join(60)  # let it complete and publish
    assert sm.stage_slimmable_size(1.0) is False  # newest request: stay full
    assert sm.poll_slimmable_switch() is None  # stale width-1 switch dropped
    assert sm._current_size_key() == (3,)


def test_stage_superseded_by_newer():
    sm = _load("slimmable_wavenet.nam")
    sm.prewarm_on_reset = False
    sm.reset(1, max_buffer_size=64)
    sm.stage_slimmable_size(0.0)  # width 1
    sm.stage_slimmable_size(0.5)  # width 2 supersedes
    st = sm.wait_slimmable_switch(timeout=60)
    assert st is not None
    assert sm._current_size_key() == (2,)


def test_container_staged_switch():
    c = _load("slimmable_container.nam")
    c.prewarm_on_reset = False
    c.reset(1, max_buffer_size=64)
    assert c.precompile_slimmable_sizes() == 3
    assert c.stage_slimmable_size(0.1) is True
    st = c.wait_slimmable_switch(timeout=60)
    assert st is not None and c.active_index == 0
    y, _ = c.process(np.zeros((1, 64), np.float32), st)
    assert np.isfinite(np.asarray(y)).all()
