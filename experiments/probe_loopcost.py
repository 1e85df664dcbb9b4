"""What dominates the ~60ns/iteration of the symbol loop? Ablation probes:
  A. bare while_loop, tiny body
  B. + two dependent SMEM loads
  C. + not-taken lax.cond with a large body (nested loops)
  D. + taken pl.when SMEM RMW write
"""
import sys, time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/experiments")
from probe_scalar import trace_seconds

K = 100_000
N = 32768


def make(variant):
    def kern(tab_ref, out_ref):
        def cond(st):
            i, x, b = st
            return (i < K) & ~b

        def body(st):
            i, x, b = st
            if variant >= 1:
                x = tab_ref[0, x & (N - 1)]
                x = tab_ref[0, (x + 1) & (N - 1)]
            if variant >= 2:
                def big(args):
                    x, b = args
                    y = tab_ref[0, (x + 3) & (N - 1)]
                    z = tab_ref[0, (y + 5) & (N - 1)]

                    def inner(j, a):
                        return a + tab_ref[0, (z + j) & (N - 1)]

                    s = lax.fori_loop(0, y & 7, inner, jnp.int32(0))

                    def inner2(j, a):
                        out_ref[0, (a + j) & (N - 1)] = a + j
                        return a + 1

                    lax.fori_loop(0, z & 7, inner2, jnp.int32(0))
                    return x + s, b

                x, b = lax.cond(x < 0, big, lambda a: a, (x, b))  # never taken
            if variant >= 3:
                wi = (i >> 2) & (N - 1)
                w = out_ref[0, wi]
                out_ref[0, wi] = (w & jnp.uint32(0xFFFFFF00).astype(jnp.int32)) | (x & 0xFF)
            return i + 1, x, b

        i, x, b = lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0), jnp.bool_(False)))
        out_ref[0, 0] = x

    def run(tab):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((1, N), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, N), memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
        )(tab)

    return run


def main():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.permutation(N).astype(np.int32)[None, :])
    for v, name in [(0, "bare"), (1, "2loads"), (2, "+cond_bigbody_nottaken"), (3, "+rmw_write")]:
        fn = make(v)
        t0 = time.time()
        out = jax.jit(fn)(tab)
        jax.block_until_ready(out)
        sec = trace_seconds(lambda: jax.jit(fn)(tab), 5, f"lc{v}")
        print(f"{name}: {sec*1e9/K:.2f} ns/iter (compile {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
