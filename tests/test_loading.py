"""Loader / registry / version tests.

Mirrors the reference's loader test strategy (reference:
tools/test/test_get_dsp.cpp, tools/test/test_extensible.cpp; SURVEY.md §4.4-4.5).
"""

import copy
import json
import os

import numpy as np
import pytest

import neuralampmodelercore_tpu as nam
from neuralampmodelercore_tpu import registry
from neuralampmodelercore_tpu.version import Supported, is_version_supported

from conftest import EXAMPLE_MODELS

ALL_MODELS = [
    "wavenet.nam",
    "wavenet_a1_standard.nam",
    "my_model.nam",
    "lstm.nam",
    "wavenet_condition_dsp.nam",
    "wavenet_a2_max.nam",
    "slimmable_wavenet.nam",
    "slimmable_container.nam",
    "A2.nam",
]


@pytest.mark.parametrize("name", ALL_MODELS)
def test_load_example_model(name):
    """All 9 example models load with exact weight-stream consumption
    (the reference's end-to-end loader test, test_get_dsp.cpp:185-207)."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, name))
    assert m is not None
    assert m.num_input_channels >= 1
    assert m.num_output_channels >= 1


@pytest.mark.parametrize("name", ["wavenet.nam", "lstm.nam"])
def test_load_and_process_finite(name):
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, name))
    m.prewarm_on_reset = False
    state = m.reset(batch=1, max_buffer_size=64)
    x = np.zeros((1, 64), np.float32)
    for _ in range(3):
        y, state = m.process(x, state)
        assert np.isfinite(np.asarray(y)).all()


# -- version gate (reference: test_get_dsp.cpp:235-311) ----------------------


def _lstm_json(version):
    j = json.load(open(os.path.join(EXAMPLE_MODELS, "lstm.nam")))
    j["version"] = version
    return j


def test_version_supported_matrix():
    assert is_version_supported("0.5.0") == Supported.YES
    assert is_version_supported("0.7.0") == Supported.YES
    assert is_version_supported("0.7.1") == Supported.PARTIAL  # patch-beyond
    assert is_version_supported("0.8.0") == Supported.NO  # minor-beyond
    assert is_version_supported("1.0.0") == Supported.NO  # major-beyond
    assert is_version_supported("0.4.9") == Supported.NO  # too early
    assert is_version_supported("garbage") == Supported.NO
    assert is_version_supported("0.5") == Supported.NO


def test_load_patch_beyond_warns_but_loads(capsys):
    m = nam.load_model(_lstm_json("0.7.1"))
    assert m.architecture == "LSTM"
    assert "partially-supported" in capsys.readouterr().err


def test_load_minor_beyond_throws():
    with pytest.raises(Exception, match="unsupported version"):
        nam.load_model(_lstm_json("0.8.0"))


def test_load_too_early_throws():
    with pytest.raises(Exception, match="unsupported version"):
        nam.load_model(_lstm_json("0.4.0"))


def test_custom_version_checker():
    """(reference: test_get_dsp.cpp:313-320)"""
    from neuralampmodelercore_tpu.version import register_version_support_checker, _checkers

    def checker(v):
        return Supported.YES if v == "99.0.0" else Supported.NO

    register_version_support_checker(checker)
    try:
        assert is_version_supported("99.0.0") == Supported.YES
    finally:
        _checkers.remove(checker)


# -- weight-count contract ---------------------------------------------------


def test_truncated_weights_raise():
    j = json.load(open(os.path.join(EXAMPLE_MODELS, "wavenet.nam")))
    j["weights"] = j["weights"][:-5]
    with pytest.raises(ValueError, match="[Ww]eight"):
        nam.load_model(j)


def test_extra_weights_raise():
    j = json.load(open(os.path.join(EXAMPLE_MODELS, "wavenet.nam")))
    j["weights"] = j["weights"] + [0.0]
    with pytest.raises(ValueError, match="[Ww]eight"):
        nam.load_model(j)


def test_missing_weights_raise():
    j = json.load(open(os.path.join(EXAMPLE_MODELS, "lstm.nam")))
    del j["weights"]
    with pytest.raises(ValueError, match="missing weights"):
        nam.load_model(j)


def test_unknown_architecture_raises():
    j = json.load(open(os.path.join(EXAMPLE_MODELS, "lstm.nam")))
    j["architecture"] = "NotAThing"
    with pytest.raises(ValueError, match="Unrecognized architecture"):
        nam.load_model(j)


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        nam.load_model("/tmp/does_not_exist_12345.nam")


# -- metadata (reference: test_get_dsp.cpp:107-130, issue 129) ---------------


def test_metadata_levels():
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"))
    assert m.has_loudness() and m.has_input_level() and m.has_output_level()
    assert m.get_input_level() == pytest.approx(18.3)
    assert m.get_output_level() == pytest.approx(12.3)


def test_metadata_null_loudness():
    j = json.load(open(os.path.join(EXAMPLE_MODELS, "lstm.nam")))
    j["metadata"]["loudness"] = None
    m = nam.load_model(j)
    assert not m.has_loudness()
    with pytest.raises(RuntimeError):
        m.get_loudness()


def test_metadata_absent():
    j = json.load(open(os.path.join(EXAMPLE_MODELS, "my_model.nam")))
    assert "metadata" not in j
    m = nam.load_model(j)
    assert not m.has_loudness()


def test_sample_rate_sentinel():
    """Missing sample_rate -> -1 sentinel (reference: NAM/dsp.h:30)."""
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "my_model.nam"))
    assert m.expected_sample_rate == -1.0


# -- prewarm policy (reference: test_dsp.cpp prewarm matrix :81-92) -----------


def test_prewarm_option_overrides_load_default():
    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"), prewarm=False)
    # Restored to ambient default after load (reference: get_dsp.cpp:268-278).
    assert m.prewarm_on_reset is True


def test_scoped_prewarm_default():
    with nam.ScopedPrewarmOnResetDefault(False):
        m = nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"))
        assert m.prewarm_on_reset is False
    m2 = nam.load_model(os.path.join(EXAMPLE_MODELS, "lstm.nam"))
    assert m2.prewarm_on_reset is True


# -- extensibility (reference: test_extensible.cpp:24-134) -------------------


def test_register_external_architecture(tmp_path):
    import dataclasses
    import jax.numpy as jnp
    from neuralampmodelercore_tpu.formats import WeightReader

    @dataclasses.dataclass(frozen=True)
    class GainConfig:
        pass

    def build(config, weights, sr):
        r = WeightReader(weights)
        gain = r.take_scalar()
        r.assert_exhausted()
        return GainConfig(), {"gain": jnp.float32(gain)}

    arch = registry.ArchDef(
        name="DummyGain",
        config_cls=GainConfig,
        build=build,
        init_state=lambda c, p, b: {},
        step=lambda c, p, s, x: (x * p["gain"], s),
        prewarm_samples=lambda c, sr: 0,
        in_channels=lambda c: 1,
        out_channels=lambda c: 1,
    )
    registry.register_architecture(arch)

    j = {
        "version": "0.5.4",
        "architecture": "DummyGain",
        "config": {},
        "weights": [2.0],
        "sample_rate": 48000,
    }
    path = tmp_path / "dummy.nam"
    path.write_text(json.dumps(j))
    m = nam.load_model(str(path))
    state = m.reset(1)
    y, _ = m.process(np.ones((1, 8), np.float32), state)
    np.testing.assert_allclose(np.asarray(y), 2.0)


def test_get_dsp_legacy_raises_with_pointer():
    """The reference declares get_dsp_legacy(dirname) but ships no definition
    (NAM/dsp.h:368) — callers fail at link time. We fail at call time with a
    pointer to the supported path."""
    with pytest.raises(NotImplementedError, match="load_model"):
        nam.get_dsp_legacy("/some/model/dir")


def test_float64_io_surface():
    """NAM_SAMPLE=double I/O (reference: NAM/dsp.h:18-22): float64 in ->
    float64 out, numerically identical to the float32 path (internal math is
    float32 either way, docs/deviations.md #1)."""
    import jax

    m = nam.load_model(os.path.join(EXAMPLE_MODELS, "wavenet.nam"))
    m.prewarm_on_reset = False
    x32 = (np.linspace(-0.5, 0.5, 128, dtype=np.float32)).reshape(1, -1)
    y32 = np.asarray(m.process(x32, m.init_state(1))[0])
    with jax.enable_x64():
        y64, _ = m.process(x32.astype(np.float64), m.init_state(1))
        assert y64.dtype == np.float64
        r64 = m.render(x32[0].astype(np.float64))
        assert r64.dtype == np.float64
    np.testing.assert_allclose(np.asarray(y64, np.float32), y32, atol=0)
