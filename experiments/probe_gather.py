"""Probe tpu.dynamic_gather via jnp.take_along_axis inside a Pallas kernel:
supported table widths (lane-dim gather) and throughput."""
import sys, time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/experiments")
from probe_scalar import trace_seconds


def make(R, N, reps):
    # table x: (R, N) in VMEM; idx: (R, N); out[i,j] = x[i, idx[i,j]]
    def kern(x_ref, idx_ref, out_ref):
        x = x_ref[:, :]
        idx = idx_ref[:, :]

        def body(_, acc):
            g = jnp.take_along_axis(x, (idx + acc[0, 0]) % N, axis=1)
            return g

        out_ref[:, :] = lax.fori_loop(0, reps, body, idx)

    def run(x, idx):
        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec((R, N), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, N), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, N), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, N), jnp.int32),
        )(x, idx)

    return run


def main():
    rng = np.random.default_rng(0)
    for R, N in [(8, 128), (8, 1024), (8, 32768), (32, 8192)]:
        x = jnp.asarray(rng.integers(0, N, (R, N), dtype=np.int64).astype(np.int32))
        idx = jnp.asarray(rng.integers(0, N, (R, N), dtype=np.int64).astype(np.int32))
        REPS = 64
        try:
            fn = make(R, N, REPS)
            out = jax.jit(fn)(x, idx)
            jax.block_until_ready(out)
            sec = trace_seconds(lambda: jax.jit(fn)(x, idx), 5, f"g{R}x{N}")
            nel = R * N * REPS
            print(f"gather ({R},{N}): OK {sec*1e9/nel:.3f} ns/elem ({nel/sec/1e9:.2f} G elem/s)", flush=True)
        except Exception as e:
            print(f"gather ({R},{N}): FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
