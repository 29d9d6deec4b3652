"""Farm throughput benchmark: host dataplane vs bare engine step.

Measures whether the StreamFarm's host loop (queue assembly -> device step
-> demux, double-buffered) can sustain the same stream count as the bare
engine step (bench.py's number). Producers run on feeder threads pushing
through the native SPSC ring pool, exactly the production topology
(SURVEY.md §7 hard part #3).

Three numbers:
  1. bare engine step (chained, single sync, tunnel round-trip subtracted) —
     the device-only floor;
  2. host dataplane cost per block (feeder push + fused assembly + fused
     demux, no device) — the work the double-buffered pipeline overlaps
     with the device step;
  3. the sustained farm rate. On THIS sandbox the TPU is behind an HTTP
     tunnel (~8 MB/s device->host), so fetching each block's (T, B) output
     dominates (3); that transfer is ~50 us on a locally attached chip.
     The deployable rate is max(1, 2) — reported as "projected".

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


def bench_bare(model, B, T, n_blocks):
    """Chained steps, one scalar sync at the end, tunnel RTT subtracted —
    the same protocol as bench.py."""
    import jax.numpy as jnp

    from neuralampmodelercore_tpu.models.engine import StreamEngine

    eng = StreamEngine(model, batch=B, block_size=T)
    step = eng.step_fn()
    params, state = eng.params, eng.init_state()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, T, B)).astype(np.float32) * 0.1)
    y, state = step(params, state, x)
    float(jnp.sum(y[0, 0]))
    t0 = time.perf_counter()
    float(jnp.sum(y[0, 0]))
    rtt = time.perf_counter() - t0
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            y, state = step(params, state, x)
        float(jnp.sum(y[0, 0]))
        runs.append(max(time.perf_counter() - t0 - rtt, 1e-9) / n_blocks)
    runs.sort()
    return {"p50": runs[1] * 1e6, "p99": runs[-1] * 1e6}, eng.kernel


def bench_host_only(B, T, n_blocks, feeders):
    """The host dataplane alone: feeder threads push through the ring pool,
    the 'dispatch' does fused assembly + fused demux of a ready (T, B)
    buffer — everything the pipeline must overlap with the device step."""
    from neuralampmodelercore_tpu.utils.native import RingPool

    pool_in = RingPool(B, 8, T)
    pool_out = RingPool(B, 8, T)
    assembly = np.zeros((T, B), np.float32)
    result = np.zeros((T, B), np.float32)  # stand-in for the fetched output

    stop = threading.Event()
    per = B // feeders

    def feeder(fi):
        rng = np.random.default_rng(fi)
        first = fi * per
        n = per if fi < feeders - 1 else B - first
        blocks = (rng.standard_normal((n, T)) * 0.1).astype(np.float32)
        while not stop.is_set():
            if pool_in.push_range(first, blocks) < n:
                time.sleep(0.0002)

    def drainer():
        buf = np.zeros((T, B), np.float32)
        while not stop.is_set():
            if pool_out.pop_all_tb(buf) == 0:
                time.sleep(0.0002)

    threads = [threading.Thread(target=feeder, args=(fi,), daemon=True) for fi in range(feeders)]
    threads.append(threading.Thread(target=drainer, daemon=True))
    for t in threads:
        t.start()
    time.sleep(0.05)

    times = []
    fed_total = 0
    for _ in range(n_blocks):
        t0 = time.perf_counter()
        fed_total += pool_in.pop_all_tb(assembly)
        pool_out.push_all_tb(result)
        times.append(time.perf_counter() - t0)
    stop.set()
    for t in threads:
        t.join(timeout=1)
    return _percentiles(times), fed_total / n_blocks


def bench_farm(model, B, T, n_blocks, feeders):
    from neuralampmodelercore_tpu.utils.streaming import StreamFarm

    farm = StreamFarm(model, batch=B, block_size=T, queue_depth=8)
    farm.start()

    per = B // feeders
    stop = threading.Event()

    def feeder(fi):
        rng = np.random.default_rng(fi)
        first = fi * per
        n = per if fi < feeders - 1 else B - first
        blocks = (rng.standard_normal((n, T)) * 0.1).astype(np.float32)
        while not stop.is_set():
            if farm.push_range(first, blocks) < n:
                time.sleep(0.0002)

    def drainer():
        buf = np.zeros((T, B), np.float32)
        while not stop.is_set():
            if farm._out.pop_all_tb(buf) == 0:
                time.sleep(0.0002)

    threads = [threading.Thread(target=feeder, args=(fi,), daemon=True) for fi in range(feeders)]
    threads.append(threading.Thread(target=drainer, daemon=True))
    for t in threads:
        t.start()

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
    return _percentiles(times), fed_total / n_blocks


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=200)
    ap.add_argument("--feeders", type=int, default=4)
    ap.add_argument("--precision", default="high")
    ap.add_argument("--host-only", action="store_true", help="skip device benches")
    args = ap.parse_args(argv)

    from neuralampmodelercore_tpu.utils.native import have_native

    deadline_us = 1e6 * args.block / 48000.0
    print(f"# native dataplane: {have_native()}", flush=True)

    host, fed = bench_host_only(args.batch, args.block, args.blocks, args.feeders)
    print(f"host dataplane only: p50={host['p50']:.0f} p90={host['p90']:.0f} "
          f"p99={host['p99']:.0f} us/block (avg {fed:.0f}/{args.batch} streams fed; "
          f"deadline {deadline_us:.0f} us)", flush=True)
    if args.host_only:
        return 0

    import neuralampmodelercore_tpu as nam
    from neuralampmodelercore_tpu.ops.layers import set_matmul_precision

    set_matmul_precision(args.precision)
    model = nam.load_model(MODEL)
    model.prewarm_on_reset = False

    bare, kernel = bench_bare(model, args.batch, args.block, args.blocks)
    print(f"bare engine ({kernel}): p50={bare['p50']:.0f} p99={bare['p99']:.0f} us/block",
          flush=True)

    projected = max(bare["p50"], host["p50"])
    print(f"projected farm rate (host || device overlap): {projected:.0f} us/block "
          f"-> real-time at B={args.batch}: {projected <= deadline_us} "
          f"(host adds {max(0.0, (projected / bare['p50'] - 1)) * 100:.1f}% over bare)",
          flush=True)

    farm, fed = bench_farm(model, args.batch, args.block, args.blocks, args.feeders)
    print(f"farm (this sandbox; ~8 MB/s tunnel D2H dominates): p50={farm['p50']:.0f} "
          f"p90={farm['p90']:.0f} p99={farm['p99']:.0f} us/block "
          f"(avg {fed:.0f}/{args.batch} streams fed)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
