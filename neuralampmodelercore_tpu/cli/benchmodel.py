"""benchmodel: wall-clock time to process 2 seconds of audio.

The reference protocol (reference: tools/benchmodel.cpp:103-143): process
(48000/64)*2 buffers of 64 frames of silence at 48 kHz and print wall-clock
ms; the real-time bar is 2000 ms. Extended here with --batch (concurrent
streams — the TPU scaling axis) and --engine (ring-state serving path).

Note the reference enables fast-tanh for benching (benchmodel.cpp:69-78); on
TPU the native tanh is already fast, so this is exposed as --fast-tanh rather
than forced.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nam-benchmodel", description=__doc__)
    ap.add_argument("model", help=".nam model file")
    ap.add_argument("--buffer", type=int, default=64, help="buffer size (default 64)")
    ap.add_argument("--batch", type=int, default=1, help="concurrent streams (default 1)")
    ap.add_argument("--seconds", type=float, default=2.0, help="audio length (default 2 s)")
    ap.add_argument("--engine", action="store_true", help="use the ring-state StreamEngine")
    ap.add_argument("--fast-tanh", action="store_true", help="enable fast-tanh mode")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    import neuralampmodelercore_tpu as nam
    from neuralampmodelercore_tpu.models.engine import StreamEngine

    if args.fast_tanh:
        nam.activations.enable_fast_tanh()

    model = nam.load_model(args.model)
    sr = model.expected_sample_rate
    if sr <= 0:
        sr = 48000.0
    num_buffers = int((sr / args.buffer) * args.seconds)

    if args.engine:
        engine = StreamEngine(model, batch=args.batch, block_size=args.buffer)
        state = engine.reset()
        step = engine.step_fn()
        params = engine.params
        x = jnp.zeros((model.num_input_channels, args.buffer, args.batch), jnp.float32)
    else:
        state = model.reset(batch=args.batch, sample_rate=sr, max_buffer_size=args.buffer)
        step = model.step_fn()
        params = model.params
        x = jnp.zeros((args.batch, args.buffer, model.num_input_channels), jnp.float32)

    # warm (compile)
    y, state = step(params, state, x)
    float(jnp.sum(y.ravel()[0]))

    t0 = time.perf_counter()
    for _ in range(num_buffers):
        y, state = step(params, state, x)
    float(jnp.sum(y.ravel()[0]))  # true device sync (value fetch)
    ms = (time.perf_counter() - t0) * 1e3

    bar = args.seconds * 1e3
    print(f"{ms:.1f} ms to process {args.seconds} s x {args.batch} streams "
          f"(buffer {args.buffer}); real-time bar {bar:.0f} ms; "
          f"{'REAL-TIME' if ms <= bar else 'not real-time'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
