"""Capture an xprof device trace of the headline engine step and summarise it.

The committed plateau attribution (docs/performance.md "Round-5 findings")
decomposes the fused stack kernel's time with in-kernel _ABLATE lanes; this
tool supplies the complementary OUTSIDE view from the profiler (the
reference's analog is perf/nsys over bench_a2_fast): per-step device-op
durations proving (a) the benched block time is device-busy time, not
transport, and (b) how little lives outside the Pallas custom call. The
kernel body is a single opaque custom call to xprof — which is exactly why
the in-kernel ablation lanes exist.

Writes a JSON summary (device ops, us/step) for the round trail.

Usage: python tools/xprof_summary.py [--batch 3072] [--block 128]
                                     [--json TRACE_SUMMARY.json]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

MODEL = "/root/reference/example_models/wavenet_a1_standard.nam"


def capture(model_path, B, T, kernel, steps, logdir):
    import jax
    import jax.numpy as jnp

    import neuralampmodelercore_tpu as nam
    from neuralampmodelercore_tpu.models.engine import StreamEngine

    m = nam.load_model(model_path)
    m.prewarm_on_reset = False
    eng = StreamEngine(m, batch=B, block_size=T, kernel=kernel)
    step = eng.step_fn()
    params, state = eng.params, eng.init_state()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, T, B)).astype(np.float32) * 0.1
    )
    y, state = step(params, state, x)  # compile
    for _ in range(5):  # settle
        y, state = step(params, state, x)
    float(jnp.sum(y[0, 0]))
    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        y, state = step(params, state, x)
    float(jnp.sum(y[0, 0]))
    jax.profiler.stop_trace()
    return eng.kernel


def summarise(logdir, steps):
    """Aggregate the perfetto trace's complete events per device track."""
    paths = glob.glob(os.path.join(logdir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    names = {
        e["pid"]: e["args"].get("name")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = [p for p, n in names.items() if n and "TPU" in n]
    agg = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e["pid"] in device_pids:
            agg[e["name"]] += e.get("dur", 0)
    total = sum(d for n, d in agg.items() if not n.startswith("jit"))
    ops = [
        {"op": n, "us_per_step": round(d / steps, 1)}
        for n, d in agg.most_common(12)
    ]
    return {
        "device": [names[p] for p in device_pids],
        "steps": steps,
        "device_busy_us_per_step": round(total / steps, 1),
        "ops": ops,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=MODEL)
    ap.add_argument("--batch", type=int, default=3072)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--kernel", default="auto")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    with tempfile.TemporaryDirectory(prefix="xprof_") as logdir:
        kernel = capture(args.model, args.batch, args.block, args.kernel,
                         args.steps, logdir)
        out = summarise(logdir, args.steps)
    out |= {"model": os.path.basename(args.model), "batch": args.batch,
            "block": args.block, "kernel": kernel}
    for op in out["ops"]:
        print(f"{op['us_per_step']:10.1f} us/step  {op['op'][:80]}")
    print(f"device busy: {out['device_busy_us_per_step']:.1f} us/step "
          f"({out['kernel']} tier, B={args.batch} T={args.block})")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"# wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
