"""Probe: blocked SMEM inputs/outputs over a batch via the (B,1,N) trick,
uint32 scalars in SMEM, and register-accumulated word writes."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N = 4, 4096


def kern(x_ref, out_ref):
    # x_ref, out_ref: (1, 1, N) SMEM blocks of (B, 1, N) arrays
    def body(i, acc):
        v = x_ref[0, 0, i]
        out_ref[0, 0, i] = v + acc
        return acc + 1
    lax.fori_loop(0, N, body, jnp.int32(0))


def run(x):
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, N), jnp.int32),
    )(x)


def kern_u32(x_ref, out_ref):
    def body(i, acc):
        v = x_ref[0, 0, i]
        out_ref[0, 0, i] = (v << jnp.uint32(1)) | (acc & jnp.uint32(1))
        return acc + jnp.uint32(1)
    lax.fori_loop(0, N, body, jnp.uint32(0))


def run_u32(x):
    return pl.pallas_call(
        kern_u32,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, N), jnp.uint32),
    )(x)


def main():
    x = jnp.asarray(np.arange(B * N, dtype=np.int32).reshape(B, 1, N))
    try:
        t0 = time.time()
        out = jax.jit(run)(x)
        jax.block_until_ready(out)
        ref = np.asarray(x) + np.arange(N, dtype=np.int32)[None, None, :]
        print(f"blocked-smem i32: OK={np.array_equal(np.asarray(out), ref)} {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"blocked-smem i32: FAILED {str(e)[:300]}", flush=True)
    xu = x.astype(jnp.uint32)
    try:
        out = jax.jit(run_u32)(xu)
        jax.block_until_ready(out)
        ref = (np.asarray(xu) << 1) | (np.arange(N, dtype=np.uint32)[None, None, :] & 1)
        print(f"blocked-smem u32: OK={np.array_equal(np.asarray(out), ref)}", flush=True)
    except Exception as e:
        print(f"blocked-smem u32: FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
