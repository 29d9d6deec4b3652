"""Microbenchmark: in-kernel Pallas dot-chain cost for the fused-stack design.

Question to answer before building ops/pallas/stack.py: how fast can a
20-layer chain of (C, K*C) x (K*C, T*W) dots run when every operand is
VMEM-resident?  The fused engine can only beat the XLA step (~870-980 us
@B=1024, flagship) if the in-kernel compute floor is well under that.

Variants:
  chain_f32     per-layer dot, f32 operands (Mosaic picks passes)
  chain_f32_hi  per-layer dot, precision=HIGHEST
  chain_bf16    per-layer dot, bf16 operands, f32 accumulate (1 MXU pass)
  packed_f32    G=8 layers packed block-diagonally: (G*C, G*K*C) weight
  wide tiles    W in {128, 256, 512}

Run alone (the tunneled TPU wedges under concurrent processes):
  timeout 600 python tools/microbench_pallas_dots.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, K, T, B, L = 16, 3, 64, 1024, 20


def _sync(y):
    return float(jnp.sum(y[0, 0]))


def timeit(fn, *args, iters=50):
    y = fn(*args)
    _sync(y)
    for _ in range(5):
        y = fn(*args)
    _sync(y)
    t0 = time.perf_counter()
    _sync(y)
    rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y if y.shape == args[0].shape else args[0], *args[1:])
    _sync(y)
    return max(time.perf_counter() - t0 - rt, 1e-9) / iters


# --- per-layer dot chain -----------------------------------------------------
def chain_kernel(x_ref, w_ref, o_ref, *, dtype, precision):
    # x: (KC, T*W) resident; w: (L, C, K*C)
    x = x_ref[:]
    for l in range(L):
        w = w_ref[l]
        y = jax.lax.dot_general(
            w.astype(dtype),
            x.astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (C, T*W)
        # cheap VPU epilogue + rebuild a (KC, T*W) operand (simulates
        # window assembly cost being elsewhere; here just tile it)
        y = jnp.tanh(y)
        x = jnp.concatenate([y, y, y], axis=0)
    o_ref[:] = x


def make_chain(W, dtype, precision):
    kern = partial(chain_kernel, dtype=dtype, precision=precision)

    @jax.jit
    def run(x, w):
        # grid over stream tiles
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((K * C, T * B), jnp.float32),
            grid=(B // W,),
            in_specs=[
                pl.BlockSpec((K * C, T * W), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, C, K * C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K * C, T * W), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(x, w)

    return run


# --- packed block-diagonal chain ---------------------------------------------
def packed_kernel(x_ref, w_ref, o_ref, *, G, dtype, precision):
    # x: (G*KC, T*W); w: (steps, G*C, G*KC) block-diagonal
    x = x_ref[:]
    steps = L // G
    for s in range(steps):
        w = w_ref[s]
        y = jax.lax.dot_general(
            w.astype(dtype),
            x.astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (G*C, T*W)
        y = jnp.tanh(y)
        x = jnp.concatenate([y, y, y], axis=0)  # (3*G*C = G*KC, T*W)
    o_ref[:] = x


def make_packed(W, G, dtype, precision):
    kern = partial(packed_kernel, G=G, dtype=dtype, precision=precision)

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((G * K * C, T * B), jnp.float32),
            grid=(B // W,),
            in_specs=[
                pl.BlockSpec((G * K * C, T * W), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (L // G, G * C, G * K * C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec((G * K * C, T * W), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(x, w)

    return run


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()}")
    results = {}
    for W in (128, 256, 512):
        x = jnp.asarray(rng.standard_normal((K * C, T * B)).astype(np.float32) * 0.1)
        w = jnp.asarray(rng.standard_normal((L, C, K * C)).astype(np.float32) * 0.1)
        for name, dtype, prec in (
            ("f32_default", jnp.float32, None),
            ("f32_highest", jnp.float32, jax.lax.Precision.HIGHEST),
            ("bf16", jnp.bfloat16, None),
        ):
            try:
                dt = timeit(make_chain(W, dtype, prec), x, w)
                key = f"chain W={W} {name}"
                results[key] = dt
                print(f"{key}: {dt*1e6:8.1f} us/block-of-B{B}")
            except Exception as e:
                print(f"chain W={W} {name}: FAILED {type(e).__name__}: {e}")
    for W in (128, 256):
        for G in (4, 8):
            xg = jnp.asarray(rng.standard_normal((G * K * C, T * B)).astype(np.float32) * 0.1)
            wg = jnp.asarray(
                rng.standard_normal((L // G, G * C, G * K * C)).astype(np.float32) * 0.1
            )
            for name, dtype, prec in (
                ("f32_default", jnp.float32, None),
                ("bf16", jnp.bfloat16, None),
            ):
                try:
                    dt = timeit(make_packed(W, G, dtype, prec), xg, wg)
                    key = f"packed W={W} G={G} {name}"
                    results[key] = dt
                    print(f"{key}: {dt*1e6:8.1f} us/block-of-B{B}")
                except Exception as e:
                    print(f"packed W={W} G={G} {name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
