"""bench_sweep: streams-per-chip across WaveNet channel widths.

The analog of the reference's channel-count benchmark sweep (reference:
tools/benchmark_wavenet_a1.sh + tools/plot_wavenet_a1_benchmark.py — sweep
wavenet_a1 models over channel widths, median-of-N, time vs channels).
Generates a1-style models at the requested widths with tools.generate and
reports the max real-time stream batch for each (CSV).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _bench(model, B, block, iters=60):
    import jax.numpy as jnp

    from neuralampmodelercore_tpu.models.engine import StreamEngine

    eng = StreamEngine(model, batch=B, block_size=block)
    step, params = eng.step_fn(), eng.params
    st = eng.init_state()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, block, B)).astype(np.float32) * 0.1
    )
    y, st = step(params, st, x)
    float(jnp.sum(y[0, 0]))
    for _ in range(5):
        y, st = step(params, st, x)
    float(jnp.sum(y[0, 0]))
    t0 = time.perf_counter()
    float(jnp.sum(y[0, 0]))
    rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        y, st = step(params, st, x)
    float(jnp.sum(y[0, 0]))
    return max(time.perf_counter() - t0 - rt, 1e-9) / iters


def _a1_config(channels: int) -> dict:
    """a1-family config scaled to the given width (second array half-width,
    matching wavenet_a1_standard's 16/8 ratio)."""
    c2 = max(channels // 2, 1)
    dil = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512]
    return {
        "layers": [
            dict(input_size=1, condition_size=1, head_size=c2, channels=channels,
                 kernel_size=3, dilations=dil, activation="Tanh", gated=False, head_bias=False),
            dict(input_size=channels, condition_size=1, head_size=1, channels=c2,
                 kernel_size=3, dilations=dil, activation="Tanh", gated=False, head_bias=True),
        ],
        "head": None,
        "head_scale": 0.02,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nam-bench-sweep", description=__doc__)
    ap.add_argument("--channels", default="8,16,24,32")
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--start-batch", type=int, default=256)
    args = ap.parse_args(argv)

    import gc

    import neuralampmodelercore_tpu as nam
    from neuralampmodelercore_tpu.tools import generate

    deadline = args.block / 48000.0
    print("channels,weights,rt_streams,us_per_block_at_max")
    for ch in (int(c) for c in args.channels.split(",")):
        doc = generate.make_nam("WaveNet", _a1_config(ch), seed=0, scale=0.2)
        model = nam.load_model(doc)
        model.prewarm_on_reset = False
        best, best_dt = 0, 0.0
        B = args.start_batch
        while True:
            try:
                dt = _bench(model, B, args.block)
            except Exception as e:
                print(f"# ch={ch} B={B} failed: {type(e).__name__}", file=sys.stderr)
                break
            finally:
                gc.collect()
            print(f"# ch={ch} B={B}: {dt*1e6:.0f}us", file=sys.stderr)
            if dt <= deadline:
                best, best_dt = B, dt
                B *= 2
            else:
                break
        print(f"{ch},{len(doc['weights'])},{best},{best_dt*1e6:.0f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
