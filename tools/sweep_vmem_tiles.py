"""On-device sweep: fused-stack tile width (128/256/512) x block size with the
raised Mosaic VMEM limit (CompilerParams.vmem_limit_bytes). Finds the fastest
(width, T) for the flagship and validates the VMEM_BUDGET model empirically.

Run alone:  timeout 1200 python tools/sweep_vmem_tiles.py
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
from neuralampmodelercore_tpu.ops.pallas import stack

MODEL = "/root/reference/example_models/wavenet_a1_standard.nam"
B = 2048


def _sync(y):
    return float(jnp.sum(y[0, 0]))


def bench(model, T, width, iters=150):
    stack._PLAN_CACHE.clear()
    orig = stack._pick_w
    stack._pick_w = lambda cfg, t, batch: width
    try:
        eng = StreamEngine(model, batch=B, block_size=T, kernel="pallas")
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
        deadline = T / 48000
        est = stack._footprint_rows(model.config, T) * T * width * 4 / (1 << 20)
        print(
            f"T={T:4d} W={width:3d}: {dt*1e6:8.1f} us/block "
            f"deadline={deadline*1e6:7.1f} rt_headroom={deadline/dt:5.2f}x "
            f"est_vmem={est:6.1f}MB",
            flush=True,
        )
        return dt
    except Exception as e:
        msg = str(e)
        if len(msg) > 300:
            msg = msg[:300]
        print(f"T={T:4d} W={width:3d}: FAILED {type(e).__name__}: {msg}", flush=True)
        return None
    finally:
        stack._pick_w = orig
        stack._PLAN_CACHE.clear()


def main():
    print("device:", jax.devices(), flush=True)
    model = nam.load_model(MODEL)
    model.prewarm_on_reset = False
    for T in (64, 128, 240):
        for width in (128, 256, 512):
            bench(model, T, width)


if __name__ == "__main__":
    main()
