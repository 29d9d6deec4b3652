"""On-device check of the fused Pallas stack kernel vs the XLA engine step:
numerical agreement at B=128 and sustained per-block latency at large B.

Run alone (tunneled TPU backend wedges under concurrent processes):
  timeout 900 python tools/bench_pallas_stack.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import neuralampmodelercore_tpu as nam
from neuralampmodelercore_tpu.models.engine import StreamEngine

MODEL = "/root/reference/example_models/wavenet_a1_standard.nam"
T = 64


def _sync(y):
    return float(jnp.sum(y[0, 0]))


def agreement(model, B):
    ex = StreamEngine(model, batch=B, block_size=T, kernel="xla")
    ep = StreamEngine(model, batch=B, block_size=T, kernel="pallas")
    sx = ex.reset(prewarm=False)
    sp = ep.reset(prewarm=False)
    rng = np.random.default_rng(0)
    worst = 0.0
    for i in range(40):
        blk = (rng.standard_normal((B, T)) * 0.3).astype(np.float32)
        yx, sx = ex.process(blk, sx)
        yp, sp = ep.process(blk, sp)
        worst = max(worst, float(np.abs(np.asarray(yx) - np.asarray(yp)).max()))
    print(f"agreement over 40 blocks (B={B}): max abs diff = {worst:.2e} (gate 5e-5)")
    return worst


def bench(model, B, kernel, iters=200):
    eng = StreamEngine(model, batch=B, block_size=T, kernel=kernel)
    step = eng.step_fn()
    params, state = eng.params, eng.init_state()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, T, B)).astype(np.float32) * 0.1
    )
    y, state = step(params, state, x)
    _sync(y)
    for _ in range(20):
        y, state = step(params, state, x)
    _sync(y)
    t0 = time.perf_counter()
    _sync(y)
    rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        y, state = step(params, state, x)
    _sync(y)
    dt = max(time.perf_counter() - t0 - rt, 1e-9) / iters
    print(f"{kernel:6s} B={B:5d}: {dt*1e6:8.1f} us/block (deadline 1333 us)")
    return dt


def main():
    print("device:", jax.devices())
    model = nam.load_model(MODEL)
    model.prewarm_on_reset = False
    for Bagree in (128, 256):  # exercises both W=128 and W=256 tile kernels
        worst = agreement(model, Bagree)
        assert worst < 5e-5, "agreement gate FAILED"
    bench(model, 1024, "xla")
    for B in (1024, 2048, 2304, 2560, 3072):
        bench(model, B, "pallas")


if __name__ == "__main__":
    main()
