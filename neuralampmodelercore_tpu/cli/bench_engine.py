"""bench_engine: engine (ring-state) vs generic step, per-block percentiles.

The analog of the reference's fast-vs-generic A2 benchmark (reference:
tools/bench_a2_fast.cpp:99-237): per-block timing {min, p50, p99, p99.9,
max, mean}, the per-block audio deadline, real-time factor (deadline/p50),
and the engine-vs-generic speedup. Also verifies the two paths agree within
the reference's 5e-5 equivalence tolerance (test_a2_fast.cpp:276-278).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _percentiles(times_us):
    t = np.asarray(times_us)
    return {
        "min": t.min(),
        "p50": np.percentile(t, 50),
        "p99": np.percentile(t, 99),
        "p99.9": np.percentile(t, 99.9),
        "max": t.max(),
        "mean": t.mean(),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nam-bench-engine", description=__doc__)
    ap.add_argument("model")
    ap.add_argument("--buffer", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--blocks", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=20,
                    help="blocks per timed chain (sync overhead amortization)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    import neuralampmodelercore_tpu as nam
    from neuralampmodelercore_tpu.models.engine import StreamEngine

    model = nam.load_model(args.model)
    model.prewarm_on_reset = False
    sr = model.expected_sample_rate
    if sr <= 0:
        sr = 48000.0
    deadline_us = 1e6 * args.buffer / sr

    rng = np.random.default_rng(0)
    x_btc = jnp.asarray(
        (rng.standard_normal((args.batch, args.buffer, model.num_input_channels)) * 0.1).astype(
            np.float32
        )
    )
    x_ctb = jnp.asarray(np.asarray(x_btc).transpose(2, 1, 0).copy())

    def run(step, params, state, x):
        # warm
        y, state = step(params, state, x)
        float(jnp.sum(y.ravel()[0]))
        times = []
        n_chains = max(args.blocks // args.chunk, 1)
        for _ in range(n_chains):
            t0 = time.perf_counter()
            for _ in range(args.chunk):
                y, state = step(params, state, x)
            float(jnp.sum(y.ravel()[0]))
            times.append((time.perf_counter() - t0) / args.chunk * 1e6)
        return _percentiles(times), np.asarray(y)

    gstats, y_g = run(model.step_fn(), model.params, model.init_state(args.batch), x_btc)

    engine = StreamEngine(model, batch=args.batch, block_size=args.buffer)
    estats, y_e = run(engine.step_fn(), engine.params, engine.init_state(), x_ctb)
    y_e_btc = y_e.transpose(2, 1, 0)

    diff = float(np.abs(y_g - y_e_btc).max())
    print(f"numerical agreement (last block): max abs diff = {diff:.2e} "
          f"({'OK' if diff < 5e-5 else 'EXCEEDS'} 5e-5 tolerance)")
    for name, s in [("generic", gstats), ("engine", estats)]:
        rtf = deadline_us / s["p50"]
        print(
            f"{name:8s}: min={s['min']:.0f} p50={s['p50']:.0f} p99={s['p99']:.0f} "
            f"p99.9={s['p99.9']:.0f} max={s['max']:.0f} mean={s['mean']:.0f} us/block "
            f"(deadline {deadline_us:.0f} us, RTF {rtf:.2f}x)"
        )
    print(f"engine speedup over generic: {gstats['p50'] / estats['p50']:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
