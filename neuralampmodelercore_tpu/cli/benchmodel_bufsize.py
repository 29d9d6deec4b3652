"""benchmodel_bufsize: buffer-size sweep, CSV output.

The reference protocol (reference: tools/benchmodel_bufsize.cpp:60-110):
for each buffer size, a warm-up pass plus N averaged iterations over
``--seconds`` of silence; prints ``bufsize,us`` CSV rows.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nam-benchmodel-bufsize", description=__doc__)
    ap.add_argument("model")
    ap.add_argument("--sizes", default="16,32,64,128,256,512,1024,2048,4096")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--iters", type=int, default=3, help="averaged iterations")
    ap.add_argument("--engine", action="store_true")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    import neuralampmodelercore_tpu as nam
    from neuralampmodelercore_tpu.models.engine import StreamEngine

    model = nam.load_model(args.model)
    sr = model.expected_sample_rate
    if sr <= 0:
        sr = 48000.0

    print("bufsize,us")
    for size in (int(s) for s in args.sizes.split(",")):
        num_buffers = max(int((sr / size) * args.seconds), 1)
        if args.engine:
            engine = StreamEngine(model, batch=args.batch, block_size=size)
            state = engine.reset()
            step, params = engine.step_fn(), engine.params
            x = jnp.zeros((model.num_input_channels, size, args.batch), jnp.float32)
        else:
            state = model.reset(batch=args.batch, sample_rate=sr, max_buffer_size=size)
            step, params = model.step_fn(), model.params
            x = jnp.zeros((args.batch, size, model.num_input_channels), jnp.float32)
        # warm-up pass
        y, state = step(params, state, x)
        float(jnp.sum(y.ravel()[0]))
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            for _ in range(num_buffers):
                y, state = step(params, state, x)
            float(jnp.sum(y.ravel()[0]))
            times.append((time.perf_counter() - t0) * 1e6)
        print(f"{size},{np.mean(times):.0f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
