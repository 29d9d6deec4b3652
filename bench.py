"""Benchmark: concurrent real-time 48 kHz WaveNet-standard streams per chip.

Methodology mirrors the reference's benchmodel/bench_a2_fast protocol
(reference: tools/benchmodel.cpp:103-143, tools/bench_a2_fast.cpp:99-237):
stream 48 kHz audio through the flagship WaveNet-standard model
(wavenet_a1_standard.nam) in 64-frame blocks and measure per-block wall time
percentiles against the real-time deadline (64/48000 s = 1333 us/block). Here
the block step is batched over B independent streams; we find the largest B
that sustains real time and report it as streams/chip.

Prints ONE JSON line:
  {"metric": "realtime_streams_per_chip", "value": N, "unit": "streams",
   "vs_baseline": N/1000, ...}
vs_baseline is against the BASELINE.json north-star target of 1000
real-time streams per chip.
"""

import json
import sys
import time

import numpy as np


BLOCK = 64
SR = 48000
DEADLINE_S = BLOCK / SR  # per-block real-time budget
MODEL = "/root/reference/example_models/wavenet_a1_standard.nam"
NORTH_STAR = 1000.0


def _bench_batch(model, B, n_iters=100, warmup=20):
    """Per-block latency stats for batch size B (sequential dependent steps,
    per-block sync — the reference's per-block timing discipline)."""
    import jax

    step = model.step_fn()
    params = model.params
    state = model.init_state(B)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    x = jnp.asarray(rng.standard_normal((B, BLOCK, 1)).astype(np.float32) * 0.1)
    # compile + warm
    y, state = step(params, state, x)
    y.block_until_ready()
    for _ in range(warmup):
        y, state = step(params, state, x)
    y.block_until_ready()

    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        y, state = step(params, state, x)
        y.block_until_ready()
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)

    # sustained (pipelined dispatch) throughput: chain without per-block sync
    t0 = time.perf_counter()
    for _ in range(n_iters):
        y, state = step(params, state, x)
    y.block_until_ready()
    sustained = (time.perf_counter() - t0) / n_iters

    return {
        "p50": float(np.percentile(times, 50)),
        "p99": float(np.percentile(times, 99)),
        "mean": float(times.mean()),
        "min": float(times.min()),
        "max": float(times.max()),
        "sustained": float(sustained),
    }


def main():
    import neuralampmodelercore_tpu as nam

    model = nam.load_model(MODEL)
    model.prewarm_on_reset = False

    best_B = 0
    best_stats = None
    results = {}
    B = 128
    max_B = 1 << 20
    while B <= max_B:
        try:
            stats = _bench_batch(model, B)
        except Exception as e:
            print(f"# B={B} failed: {type(e).__name__}: {e}", file=sys.stderr)
            break
        results[B] = stats
        rt = stats["sustained"] <= DEADLINE_S and stats["p50"] <= DEADLINE_S * 1.5
        print(
            f"# B={B}: p50={stats['p50']*1e6:.0f}us p99={stats['p99']*1e6:.0f}us "
            f"sustained={stats['sustained']*1e6:.0f}us deadline={DEADLINE_S*1e6:.0f}us rt={rt}",
            file=sys.stderr,
        )
        if rt:
            best_B, best_stats = B, stats
            B *= 2
        else:
            break

    if best_B == 0:
        out = {
            "metric": "realtime_streams_per_chip",
            "value": 0,
            "unit": "streams",
            "vs_baseline": 0.0,
        }
    else:
        out = {
            "metric": "realtime_streams_per_chip",
            "value": best_B,
            "unit": "streams",
            "vs_baseline": best_B / NORTH_STAR,
            "p50_block_us": round(best_stats["p50"] * 1e6, 1),
            "p99_block_us": round(best_stats["p99"] * 1e6, 1),
            "sustained_block_us": round(best_stats["sustained"] * 1e6, 1),
            "deadline_us": round(DEADLINE_S * 1e6, 1),
            "block": BLOCK,
            "model": "wavenet_a1_standard",
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
