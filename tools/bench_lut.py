"""Measure LUT-mode activation cost in both tiers (VERDICT r2 ask #8).

LUT mode (reference: FastLUTActivation, NAM/activations.h:374-425) exists to
make tanh/sigmoid cheap on CPUs. History: a literal table gather measured
339 ms/block on TPU (vs 2 ms exact tanh, B=2048 — gathers serialize
per-element), so round 3 made `_lut_apply` gather-free: the base function is
re-evaluated at the two bracketing grid points (ops/activations.py), which
reproduces the interpolation to ~1 ulp, runs on the VPU, and lifted the
fused-kernel gate — `supports()` now admits LUT configs. This tool measures:

  1. exact-tanh, fused Pallas kernel
  2. LUT-tanh,   fused Pallas kernel  (what LUT corpora now run under auto)
  3. LUT-tanh,   XLA engine tier

Usage: python tools/bench_lut.py [--batch 2048] [--block 64]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

MODEL = "/root/reference/example_models/wavenet_a1_standard.nam"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--block", type=int, default=64)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    import neuralampmodelercore_tpu as nam
    from neuralampmodelercore_tpu.models.engine import StreamEngine
    from neuralampmodelercore_tpu.ops import activations as act
    from bench import _bench_batch

    model = nam.load_model(MODEL)
    model.prewarm_on_reset = False
    B, T = args.batch, args.block
    deadline_us = 1e6 * T / 48000.0

    if jax.default_backend() != "tpu":
        # CPU smoke-test path only — interpret-mode numbers are meaningless.
        from neuralampmodelercore_tpu.ops.pallas import stack as _stack

        _stack.INTERPRET = True
        print("# WARNING: not on TPU; pallas row runs in interpret mode", flush=True)

    from neuralampmodelercore_tpu.ops.pallas import stack

    rows = []
    for label, lut, kernel in (
        ("exact-tanh pallas", False, "pallas"),
        ("LUT-tanh pallas", True, "pallas"),
        ("LUT-tanh xla", True, "xla"),
    ):
        if lut:
            act.enable_lut("Tanh", -5.0, 5.0, 1024)
            assert stack.supports(model.config, T, B) is None  # gate lifted
        try:
            stats = _bench_batch(model, B, block=T, n_iters=150, warmup=15, kernel=kernel)
            rows.append((label, stats))
            print(
                f"{label}: kernel={stats['kernel']} p50={stats['p50']*1e6:.0f}us "
                f"p99={stats['p99']*1e6:.0f}us (deadline {deadline_us:.0f}us)",
                flush=True,
            )
        finally:
            if lut:
                act.disable_lut("Tanh")
    if len(rows) == 3:
        p = {l: s["p50"] for l, s in rows}
        print(
            f"LUT-vs-exact in the fused kernel: "
            f"{p['LUT-tanh pallas'] / p['exact-tanh pallas']:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
