"""Measure the LUT-activation kernel gate (VERDICT r2 ask #8).

LUT mode (reference: FastLUTActivation, NAM/activations.h:374-425) exists to
make tanh/sigmoid cheap on CPUs. The fused Pallas kernel refuses LUT configs
(ops/pallas/stack.py supports()) because a per-element table gather doesn't
vectorize on the TPU VPU — so LUT corpora run the XLA engine tier. This tool
quantifies that gate at a fixed operating point:

  1. exact-tanh, fused Pallas kernel   (what non-LUT corpora get)
  2. exact-tanh, XLA engine tier       (the tier LUT configs fall back to)
  3. LUT-tanh,   XLA engine tier       (what LUT corpora actually run)

(3) vs (2) shows the LUT itself buys nothing on TPU (exact tanh is a cheap
VPU op; the interpolation's gather/round work costs about as much); (2) vs
(1) is the price of losing the fused kernel — the real cost of enabling LUT
mode on TPU, which is why the gate is justified by measurement rather than
by a VPU gather implementation.

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

    rows = []
    for label, lut, kernel in (
        ("exact-tanh pallas", False, "pallas"),
        ("exact-tanh xla", False, "xla"),
        ("LUT-tanh xla (auto)", True, "auto"),
    ):
        if lut:
            act.enable_lut("Tanh", -5.0, 5.0, 1024)
        try:
            from neuralampmodelercore_tpu.ops.pallas import stack

            if kernel == "auto":  # LUT row: prove the gate actually fires
                reason = stack.supports(model.config, T, B)
                assert reason is not None and "LUT" in reason, reason
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
            f"LUT-vs-exact on the XLA tier: {p['LUT-tanh xla (auto)'] / p['exact-tanh xla']:.2f}x; "
            f"cost of losing the fused kernel: "
            f"{p['LUT-tanh xla (auto)'] / p['exact-tanh pallas']:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
