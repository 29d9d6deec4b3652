"""Prototype: mechanics for the fused-stack kernel (ops/pallas/stack.py).

Validates on the real TPU:
  1. PrefetchScalarGridSpec with slot indices computed in-jit (traced values)
  2. manual DMA read of ring[slot, tile] from an ANY-space input
  3. in-place ring write via aliased ANY-space output + manual DMA
  4. input_output_aliases index convention under scalar prefetch
  5. that the non-written ring slots are preserved (true in-place aliasing)
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, NT, C, T, W = 4, 2, 8, 16, 128
TW = T * W


def kernel(slots_ref, x_ref, ring_ref, y_ref, ring_out_ref, chunk, cur, sems):
    i = pl.program_id(0)
    rslot = slots_ref[0]
    wslot = slots_ref[1]
    # read chunk at rslot
    rd = pltpu.make_async_copy(ring_ref.at[rslot, i], chunk, sems.at[0])
    rd.start()
    rd.wait()
    y_ref[:] = chunk[:] * 2.0 + x_ref[:]
    # write x into ring at wslot (in-place on the aliased buffer)
    cur[:] = x_ref[:]
    wr = pltpu.make_async_copy(cur, ring_out_ref.at[wslot, i], sems.at[1])
    wr.start()
    wr.wait()


@jax.jit
def step(ring, x, n):
    slots = jnp.stack([jax.lax.rem(n + 1, M), jax.lax.rem(n, M)]).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((C, TW), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((C, TW), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, TW), jnp.float32),
            pltpu.VMEM((C, TW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    y, ring_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((C, NT * TW), jnp.float32),
            jax.ShapeDtypeStruct(ring.shape, ring.dtype),
        ),
        input_output_aliases={2: 1},  # ring input (arg idx incl. scalar) -> ring output
    )(slots, x, ring)
    return y, ring_out


def main():
    rng = np.random.default_rng(0)
    ring0 = rng.standard_normal((M, NT, C, TW)).astype(np.float32)
    x = rng.standard_normal((C, NT * TW)).astype(np.float32)
    n = jnp.asarray(2, jnp.int32)  # wslot=2, rslot=3
    y, ring1 = step(jnp.asarray(ring0), jnp.asarray(x), n)
    y = np.asarray(y)
    ring1 = np.asarray(ring1)

    # expected
    exp_y = np.concatenate([ring0[3, i] * 2.0 + x[:, i * TW : (i + 1) * TW] for i in range(NT)], axis=1)
    err_y = np.abs(y - exp_y).max()
    exp_ring = ring0.copy()
    for i in range(NT):
        exp_ring[2, i] = x[:, i * TW : (i + 1) * TW]
    err_r = np.abs(ring1 - exp_ring).max()
    print(f"y err: {err_y:.2e}   ring err: {err_r:.2e}")
    assert err_y == 0.0 and err_r == 0.0, "mismatch"
    print("prototype OK")


if __name__ == "__main__":
    main()
