"""Full-length comparison of this framework's renders against the
compiled-reference goldens (tests/goldens/ref/*.wav, produced by
/root/reference tools/render built via tools/refbuild/).

Usage: python tools/compare_ref_goldens.py [--models a,b,c] [--samples N]

Prints one line per render config: max abs diff + SNR vs the golden. The
pytest gate (tests/test_ref_goldens.py) runs truncated versions of the same
comparison; this tool is the exhaustive full-length sweep (2 s of audio,
96,000 samples — the reference's own fixture, tools/render.cpp:64-206).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
GOLDENS = os.path.join(REPO, "tests", "goldens", "ref")
EXAMPLE_MODELS = "/root/reference/example_models"
INPUT_WAV = "/root/reference/example_audio/input.wav"

# (golden stem, model file, slim value or None)
CONFIGS = [
    ("wavenet", "wavenet", None),
    ("wavenet_a1_standard", "wavenet_a1_standard", None),
    ("my_model", "my_model", None),
    ("lstm", "lstm", None),
    ("wavenet_condition_dsp", "wavenet_condition_dsp", None),
    ("wavenet_a2_max", "wavenet_a2_max", None),
    ("slimmable_wavenet", "slimmable_wavenet", None),
    ("slimmable_container", "slimmable_container", None),
    ("A2", "A2", None),
    ("slimmable_wavenet_slim0.0", "slimmable_wavenet", 0.0),
    ("slimmable_wavenet_slim0.5", "slimmable_wavenet", 0.5),
    ("slimmable_wavenet_slim1.0", "slimmable_wavenet", 1.0),
    ("slimmable_container_slim0.2", "slimmable_container", 0.2),
    ("slimmable_container_slim0.5", "slimmable_container", 0.5),
    ("slimmable_container_slim1.0", "slimmable_container", 1.0),
    ("A2_slim0.3", "A2", 0.3),
    ("A2_slim0.9", "A2", 0.9),
]


def render(model_path: str, x: np.ndarray, slim=None, block: int = 64) -> np.ndarray:
    """Stream-render exactly like the reference tools/render.cpp:148-197:
    Reset(sr, 64) with prewarm, 64-frame blocks, zero-padded tail."""
    import neuralampmodelercore_tpu as nam
    from neuralampmodelercore_tpu.models.container import SlimmableModelMixin

    model = nam.load_model(model_path)
    state = model.reset(batch=1, sample_rate=48000, max_buffer_size=block)
    if slim is not None:
        assert isinstance(model, SlimmableModelMixin)
        new_state = model.set_slimmable_size(slim)
        if new_state is not None:
            state = new_state
    outs = []
    n = len(x)
    for i in range(0, n, block):
        blk = x[i : i + block]
        if len(blk) < block:
            blk = np.pad(blk, (0, block - len(blk)))
        y, state = model.process(blk[None, :], state)
        outs.append(np.asarray(y)[0])
    return np.concatenate(outs)[:n]


def compare(name: str, mine: np.ndarray, atol_warn: float = 5e-5) -> dict:
    from neuralampmodelercore_tpu.utils.audio import read_wav

    g, _ = read_wav(os.path.join(GOLDENS, name + ".wav"))
    n = min(len(g), len(mine))
    d = np.abs(g[:n] - mine[:n])
    sig = float(np.sqrt(np.mean(g[:n] ** 2)))
    noi = float(np.sqrt(np.mean((g[:n] - mine[:n]) ** 2)))
    snr = 20 * np.log10(sig / max(noi, 1e-30)) if sig > 0 else float("inf")
    return {"name": name, "n": n, "maxabs": float(d.max()), "snr_db": snr}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=None, help="comma-separated golden stems")
    ap.add_argument("--samples", type=int, default=None, help="truncate input")
    ap.add_argument("--atol", type=float, default=5e-5,
                    help="fail threshold on max abs diff (reference's own "
                         "fast-vs-generic tolerance, test_a2_fast.cpp:276-278)")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "device"],
                    help="cpu (default): force the host platform — required on "
                         "this sandbox, whose sitecustomize overrides the "
                         "JAX_PLATFORMS env var and would route these per-block "
                         "single-stream renders over the TPU tunnel (~24 ms "
                         "round-trip per block = hours, or a wedged backend); "
                         "device: use whatever backend jax picks")
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        # Mirrors tests/conftest.py: the env var alone is not enough here.
        import jax

        jax.config.update("jax_platforms", "cpu")

    from neuralampmodelercore_tpu.utils.audio import read_wav

    x, sr = read_wav(INPUT_WAV)
    x = x.astype(np.float32)
    if args.samples:
        x = x[: args.samples]
    sel = set(args.models.split(",")) if args.models else None

    ok = True
    for stem, model, slim in CONFIGS:
        if sel is not None and stem not in sel:
            continue
        mine = render(os.path.join(EXAMPLE_MODELS, model + ".nam"), x, slim=slim)
        r = compare(stem, mine)
        status = "OK " if r["maxabs"] <= args.atol else "FAIL"
        if r["maxabs"] > args.atol:
            ok = False
        print(
            f"{status} {stem:32s} n={r['n']:6d} maxabs={r['maxabs']:.3e} snr={r['snr_db']:7.1f} dB",
            flush=True,
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
