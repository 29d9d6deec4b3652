"""On-device A/B probe for the wavefront-packed stack kernel.

Usage: python tools/probe_wavefront.py [check|bench] [T] [B]

check: small-batch on-device agreement (wavefront pallas vs XLA tier, the
       reference's 5e-5 gate) — catches Mosaic-only issues interpret mode
       can't see.
bench: sustained us/block with WAVEFRONT on vs off at (T, B).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODEL = "/root/reference/example_models/wavenet_a1_standard.nam"


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import jax.numpy as jnp

    import neuralampmodelercore_tpu as nam
    from neuralampmodelercore_tpu.models.engine import StreamEngine
    from neuralampmodelercore_tpu.ops.pallas import stack

    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    model = nam.load_model(MODEL)
    model.prewarm_on_reset = False

    def _sync(y):
        return float(jnp.sum(y[0, 0]))

    if mode == "check":
        stack.WAVEFRONT = True
        T, B = 64, 256
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((B, 4 * T)) * 0.3).astype(np.float32)
        ex = StreamEngine(model, batch=B, block_size=T, kernel="xla")
        ep = StreamEngine(model, batch=B, block_size=T, kernel="pallas")
        plan, _ = stack._build_plan_cached(model.config, T, B)
        assert all(ap.wf is not None for net in plan.nets for ap in net.arrays)
        sx, sp = ex.reset(prewarm=False), ep.reset(prewarm=False)
        worst = 0.0
        for i in range(4):
            blk = x[:, i * T : (i + 1) * T]
            yx, sx = ex.process(blk, sx)
            yp, sp = ep.process(blk, sp)
            d = float(np.abs(np.asarray(yx) - np.asarray(yp)).max())
            worst = max(worst, d)
            print(f"block {i}: max|diff| = {d:.3e}")
        print(f"agreement {'OK' if worst < 5e-5 else 'FAIL'} (gate 5e-5, worst {worst:.3e})")
        return

    def bench(label):
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
        rtt = time.perf_counter() - t0
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(150):
                y, state = step(params, state, x)
            _sync(y)
            runs.append(max(time.perf_counter() - t0 - rtt, 1e-9) / 150)
        runs.sort()
        w = stack._pick_w(model.config, T, B)
        print(f"{label:24s} W={w:4d}: p50 {runs[1]*1e6:8.1f} us  worst {runs[-1]*1e6:8.1f} us")
        return runs[1]

    for flag in (True, False):
        stack.WAVEFRONT = flag
        bench(f"wavefront={'on' if flag else 'off'}")


if __name__ == "__main__":
    main()
