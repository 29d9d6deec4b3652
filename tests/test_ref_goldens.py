"""Golden renders from the COMPILED C++ reference (the declared oracle).

tests/goldens/ref/*.wav were produced by building the unmodified reference
sources (tools/refbuild/CMakeLists.txt) and running its render tool
(/root/reference/tools/render.cpp:64-206) on the reference's own 2 s fixture
(/root/reference/example_audio/input.wav, mono 48 kHz 24-bit) for every
example model plus --slim variants. The compiled binary passes the
reference's full run_tests suite in this environment.

These tests stream the same input through this framework exactly like the
reference renderer (Reset(sr, 64) with prewarm, 64-frame blocks) and gate
the output at the reference's own implementation-equivalence tolerance
(max abs diff 5e-5, tools/test/test_a2_fast.cpp:276-278). Measured
agreement is far tighter: LSTM / condition-DSP / a2_max are bit-exact,
WaveNets ~1e-8 (FMA ordering).

The default lane truncates to 4,096 samples (enough to cover every model's
receptive field and prewarm transient); the slow lane runs the full 96,000
samples of all 17 configs.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import compare_ref_goldens as crg

GOLDEN_DIR = crg.GOLDENS
ATOL = 5e-5

pytestmark = pytest.mark.skipif(
    not os.path.exists(crg.INPUT_WAV), reason="reference fixture not mounted"
)


def _check(stem: str, model: str, slim, samples: int):
    from neuralampmodelercore_tpu.utils.audio import read_wav

    x, _ = read_wav(crg.INPUT_WAV)
    x = x[:samples].astype(np.float32)
    mine = crg.render(os.path.join(crg.EXAMPLE_MODELS, model + ".nam"), x, slim=slim)
    r = crg.compare(stem, mine)
    assert r["maxabs"] <= ATOL, f"{stem}: maxabs {r['maxabs']:.3e} > {ATOL} (snr {r['snr_db']:.1f} dB)"


@pytest.mark.parametrize(
    "stem,model,slim",
    [
        ("wavenet", "wavenet", None),
        ("lstm", "lstm", None),
        ("wavenet_condition_dsp", "wavenet_condition_dsp", None),
        ("wavenet_a2_max", "wavenet_a2_max", None),
        ("slimmable_wavenet_slim0.5", "slimmable_wavenet", 0.5),
        ("slimmable_container_slim0.2", "slimmable_container", 0.2),
        ("A2_slim0.3", "A2", 0.3),
    ],
)
def test_matches_compiled_reference(stem, model, slim):
    _check(stem, model, slim, samples=4096)


@pytest.mark.slow
def test_flagship_matches_compiled_reference():
    _check("wavenet_a1_standard", "wavenet_a1_standard", None, samples=8192)


@pytest.mark.slow
def test_full_corpus_full_length():
    """All 17 configs, all 96,000 samples — the exhaustive oracle sweep."""
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(crg.__file__), "compare_ref_goldens.py")],
        capture_output=True,
        text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, r.stdout + r.stderr
