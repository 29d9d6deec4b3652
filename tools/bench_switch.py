"""Measure slimmable width-switch latency: cold vs precompiled vs staged.

Evidence for the non-blocking switching story (VERDICT r2 ask #5; reference
analog: staged atomic swap, NAM/wavenet/slimmable.cpp:309-348,465-498):

  - cold switch: first set_slimmable_size to a new width (trace + compile
    + prewarm) — the thing that must NOT happen on the dispatch loop;
  - warm switch: same width again after precompile_slimmable_sizes
    (cached executables; alloc + prewarm only);
  - staged switch: stage_slimmable_size on a background thread while the
    serving loop keeps processing blocks; reports the serving loop's worst
    block time during the build (proving it never blocks) and the
    poll_slimmable_switch adoption cost.

Usage: python tools/bench_switch.py [--model PATH] [--batch 1024] [--block 64]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import neuralampmodelercore_tpu as nam  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--model",
        default="/root/reference/example_models/slimmable_wavenet.nam",
    )
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--serve-blocks", type=int, default=200)
    args = ap.parse_args()

    m = nam.load_model(args.model)
    st = m.reset(args.batch, max_buffer_size=args.block)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((args.batch, args.block)) * 0.3).astype(np.float32)

    # settle the serving width's compile
    for _ in range(3):
        y, st = m.process(x, st)
    np.asarray(y)

    # cold switch (new width: trace + compile + prewarm)
    t0 = time.perf_counter()
    st2 = m.set_slimmable_size(0.5)
    import jax

    jax.block_until_ready(st2)
    cold_ms = (time.perf_counter() - t0) * 1e3

    # back to full, then precompile everything and re-switch (warm)
    st = m.set_slimmable_size(1.0)
    m.precompile_slimmable_sizes()
    t0 = time.perf_counter()
    st2 = m.set_slimmable_size(0.5)
    jax.block_until_ready(st2)
    warm_ms = (time.perf_counter() - t0) * 1e3

    # staged switch while serving: worst serving-block time during the build.
    # Use a FRESH model instance — the precompile above warmed every width on
    # `m`, and the point of this phase is overlapping a genuinely cold
    # trace+compile+prewarm with the serving loop.
    m = nam.load_model(args.model)
    st = m.reset(args.batch, max_buffer_size=args.block)
    for _ in range(3):
        y, st = m.process(x, st)
    np.asarray(y)
    base = []
    for _ in range(20):
        t0 = time.perf_counter()
        y, st = m.process(x, st)
        np.asarray(y)
        base.append(time.perf_counter() - t0)
    base_us = float(np.median(base) * 1e6)

    m.stage_slimmable_size(0.0)  # cold width: full build on the worker thread
    worst_us, adopted_ms = 0.0, None
    for i in range(args.serve_blocks):
        t0 = time.perf_counter()
        ns = m.poll_slimmable_switch()
        if ns is not None:
            adopted_ms = (time.perf_counter() - t0) * 1e3
            st = ns
            x_serve = x  # same shape; new width model consumes it
            y, st = m.process(x_serve, st)
            np.asarray(y)
            break
        y, st = m.process(x, st)
        np.asarray(y)
        worst_us = max(worst_us, (time.perf_counter() - t0) * 1e6)
    print(
        f"cold_switch_ms={cold_ms:.1f} warm_switch_ms={warm_ms:.1f} "
        f"staged: serve_p50_us={base_us:.0f} serve_worst_us_during_build={worst_us:.0f} "
        f"adopt_ms={adopted_ms if adopted_ms is None else round(adopted_ms, 2)}"
    )


if __name__ == "__main__":
    main()
