"""Ablate the fused stack kernel's cost components on-device.

A: as-is (exact jnp.tanh)
B: fast-tanh mode (reference's benchmodel default, activations.cpp:168-187)
C: identity activation (isolates all activation cost)
D: no read lookahead (isolates DMA overlap win)
E: bf16x3-equivalent dot precision ladder
F: decomposition lanes via stack._ABLATE — no_dma (all ring/tail state
   copies skipped: stale windows, wrong values, same op structure),
   no_dot (every MXU dot replaced by a slice), no_stack (no window
   assembly, single-tap dots), and no_dma+no_dot (the VPU/loop floor).
   Round-5 attribution at B=4096/T=128: dots ~1,880 us + exposed DMA
   ~290 us + VPU floor ~400 us, additive (docs/performance.md).
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
from neuralampmodelercore_tpu.ops import activations as act

MODEL = "/root/reference/example_models/wavenet_a1_standard.nam"
T, B = 64, 1024


def _sync(y):
    return float(jnp.sum(y[0, 0]))


def bench(model, label, iters=200):
    eng = StreamEngine(model, batch=B, block_size=T, kernel="pallas")
    step = eng.step_fn()
    params, state = eng.params, eng.init_state()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, T, B)).astype(np.float32) * 0.1)
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
    print(f"{label:28s}: {dt*1e6:8.1f} us/block @B={B}")
    return dt


def main():
    from neuralampmodelercore_tpu.ops.pallas import stack

    print("device:", jax.devices())
    model = nam.load_model(MODEL)
    model.prewarm_on_reset = False

    which = set(sys.argv[1:]) or {"A", "B", "C", "D", "E"}

    if "A" in which:
        bench(model, "A exact tanh")

    if "B" in which:
        act.enable_fast_tanh()
        try:
            bench(model, "B fast-tanh")
        finally:
            act.disable_fast_tanh()

    if "C" in which:
        orig_apply = act.apply
        act.apply = lambda cfg, x, channel_axis=-1: x
        try:
            bench(model, "C identity act")
        finally:
            act.apply = orig_apply

    if "D" in which:
        stack.W_TILE = 256
        stack._PLAN_CACHE.clear()
        try:
            bench(model, "D exact tanh W=256")
        except Exception as e:
            print(f"D W=256 FAILED: {type(e).__name__}: {str(e)[:120]}")
        finally:
            stack.W_TILE = 128
            stack._PLAN_CACHE.clear()

    if "E" in which:
        # Mosaic rejects Precision.HIGH; DEFAULT is the 1-pass bf16 floor
        # (numerically unusable — timing calibration only: the 3-pass
        # HIGHEST/DEFAULT gap is the dot-time share of the step)
        stack.DOT_PRECISION = jax.lax.Precision.DEFAULT
        try:
            bench(model, "E 1-pass DEFAULT dots (timing only)")
        finally:
            stack.DOT_PRECISION = jax.lax.Precision.HIGHEST

    if "F" in which:
        for name, flags in (
            ("F no_dma", {"no_dma"}),
            ("F no_dot", {"no_dot"}),
            ("F no_stack", {"no_stack"}),
            ("F no_dma+no_dot (floor)", {"no_dma", "no_dot"}),
        ):
            stack._ABLATE = frozenset(flags)
            stack._PLAN_CACHE.clear()
            jax.clear_caches()
            try:
                bench(model, name)
            finally:
                stack._ABLATE = frozenset()


if __name__ == "__main__":
    main()
