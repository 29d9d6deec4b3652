"""Farm throughput benchmark: host dataplane vs bare engine step.

Measures whether the StreamFarm's host loop (queue assembly -> device step
-> demux, double-buffered) can sustain the same stream count as the bare
engine step (bench.py's number). Producers run on feeder threads pushing
through the native SPSC ring pool, exactly the production topology
(SURVEY.md §7 hard part #3). Reports per-block wall percentiles for both and
the farm/bare overhead ratio.

Usage: python tools/bench_farm.py [--batch 2048] [--block 64] [--blocks 300]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

MODEL = "/root/reference/example_models/wavenet_a1_standard.nam"


def _percentiles(ts):
    t = np.asarray(ts) * 1e6
    return {k: float(np.percentile(t, q)) for k, q in
            (("p50", 50), ("p90", 90), ("p99", 99))} | {"mean": float(t.mean())}


def bench_bare(model, B, T, n_blocks, precision):
    import jax.numpy as jnp

    from neuralampmodelercore_tpu.models.engine import StreamEngine

    eng = StreamEngine(model, batch=B, block_size=T)
    step = eng.step_fn()
    params, state = eng.params, eng.init_state()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, T, B)).astype(np.float32) * 0.1)
    y, state = step(params, state, x)
    float(jnp.sum(y[0, 0]))
    times = []
    chunk = 10
    for _ in range(max(n_blocks // chunk, 1)):
        t0 = time.perf_counter()
        for _ in range(chunk):
            y, state = step(params, state, x)
        float(jnp.sum(y[0, 0]))
        times.append((time.perf_counter() - t0) / chunk)
    return _percentiles(times), eng.kernel


def bench_farm(model, B, T, n_blocks, feeders):
    from neuralampmodelercore_tpu.utils.streaming import StreamFarm

    farm = StreamFarm(model, batch=B, block_size=T, queue_depth=8)
    farm.start()

    rng = np.random.default_rng(1)
    per = B // feeders
    stop = threading.Event()
    produced = [0] * feeders

    def feeder(fi):
        first = fi * per
        n = per if fi < feeders - 1 else B - first
        blocks = (rng.standard_normal((n, T)) * 0.1).astype(np.float32)
        while not stop.is_set():
            got = farm.push_range(first, blocks)
            produced[fi] += got
            if got < n:
                time.sleep(0.0002)  # backpressure: dispatch is behind

    threads = [threading.Thread(target=feeder, args=(fi,), daemon=True) for fi in range(feeders)]
    for t in threads:
        t.start()

    # consumer drain thread: pop everything so output rings never fill
    drained = [0]

    def drainer():
        buf = np.zeros((T, B), np.float32)
        while not stop.is_set():
            n = farm._out.pop_all_tb(buf)
            drained[0] += n
            if n == 0:
                time.sleep(0.0002)

    dt = threading.Thread(target=drainer, daemon=True)
    dt.start()

    # warm the pipeline
    for _ in range(5):
        farm.dispatch()

    times = []
    fed_total = 0
    for _ in range(n_blocks):
        t0 = time.perf_counter()
        fed_total += farm.dispatch()
        times.append(time.perf_counter() - t0)
    farm.flush()
    stop.set()
    for t in threads:
        t.join(timeout=1)
    dt.join(timeout=1)
    return _percentiles(times), fed_total / n_blocks


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=300)
    ap.add_argument("--feeders", type=int, default=4)
    ap.add_argument("--precision", default="high")
    args = ap.parse_args(argv)

    import neuralampmodelercore_tpu as nam
    from neuralampmodelercore_tpu.ops.layers import set_matmul_precision
    from neuralampmodelercore_tpu.utils.native import have_native

    set_matmul_precision(args.precision)
    model = nam.load_model(MODEL)
    model.prewarm_on_reset = False
    deadline_us = 1e6 * args.block / 48000.0

    print(f"# native dataplane: {have_native()}", flush=True)
    bare, kernel = bench_bare(model, args.batch, args.block, args.blocks, args.precision)
    print(f"bare engine ({kernel}): p50={bare['p50']:.0f} p90={bare['p90']:.0f} "
          f"p99={bare['p99']:.0f} mean={bare['mean']:.0f} us/block "
          f"(deadline {deadline_us:.0f} us)", flush=True)

    farm, fed = bench_farm(model, args.batch, args.block, args.blocks, args.feeders)
    print(f"farm        : p50={farm['p50']:.0f} p90={farm['p90']:.0f} "
          f"p99={farm['p99']:.0f} mean={farm['mean']:.0f} us/block "
          f"(avg {fed:.0f}/{args.batch} streams fed)", flush=True)
    overhead = farm["p50"] / bare["p50"] - 1.0
    rt = farm["p50"] <= deadline_us and farm["p99"] <= deadline_us * 1.5
    print(f"farm overhead over bare step: {overhead * 100:.1f}% "
          f"(p50); real-time at B={args.batch}: {rt}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
