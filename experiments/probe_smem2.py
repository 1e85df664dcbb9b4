"""Probe SMEM capacity + scalar throughput on the chip."""
import sys, time, json, os, glob, gzip as gz

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probe_scalar import trace_seconds

K = 100_000


def cap_kernel_factory(nwords):
    def kern(out_ref, smem):
        def init(i, _):
            smem[0, i] = i
            return 0
        lax.fori_loop(0, nwords, init, 0, unroll=False)
        out_ref[0, 0] = smem[0, nwords - 1]
    return kern


def try_capacity(nwords):
    fn = pl.pallas_call(
        cap_kernel_factory(nwords),
        out_specs=pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, nwords), jnp.int32)],
    )
    out = jax.jit(fn)()
    jax.block_until_ready(out)
    return int(np.asarray(out)[0, 0])


def arith_kernel(out_ref):
    def body(i, x):
        # ~6 scalar ops per iteration
        y = (x * jnp.int32(-1640531535)) ^ (x >> 5)
        return (y + i) & jnp.int32(0x7FFFFFFF)
    x = lax.fori_loop(0, K, body, jnp.int32(1))
    out_ref[0, 0] = x


def run_arith():
    return pl.pallas_call(
        arith_kernel,
        out_specs=pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )()


def indep_kernel(tab_ref, out_ref):
    # 4 independent load streams per iteration (ILP probe)
    def body(i, st):
        a, b, c, d = st
        j = i & 0x3FFF
        a += tab_ref[0, j]
        b += tab_ref[0, j + 4096]
        c += tab_ref[0, j + 8192]
        d += tab_ref[0, j + 12288]
        return a, b, c, d
    a, b, c, d = lax.fori_loop(0, K, body, (jnp.int32(0),) * 4)
    out_ref[0, 0] = a + b + c + d


def run_indep(tab):
    return pl.pallas_call(
        indep_kernel,
        in_specs=[pl.BlockSpec((1, 32768), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )(tab)


def main():
    # capacity ladder
    for kib in ():
        nwords = kib * 1024 // 4
        try:
            v = try_capacity(nwords)
            print(f"smem scratch {kib} KiB: OK (v={v})", flush=True)
        except Exception as e:
            print(f"smem scratch {kib} KiB: FAILED {str(e)[:200]}", flush=True)
            break

    t0 = time.time()
    out = jax.jit(run_arith)()
    jax.block_until_ready(out)
    print(f"arith compiled {time.time()-t0:.1f}s", flush=True)
    sec = trace_seconds(lambda: jax.jit(run_arith)(), 5, "arith")
    if sec:
        print(f"arith: {sec*1e9/K:.2f} ns/iter (~6 scalar ops)", flush=True)

    tab = jnp.asarray(np.arange(32768, dtype=np.int32)[None, :])
    t0 = time.time()
    out = jax.jit(run_indep)(tab)
    jax.block_until_ready(out)
    print(f"indep compiled {time.time()-t0:.1f}s", flush=True)
    sec = trace_seconds(lambda: jax.jit(run_indep)(tab), 5, "indep")
    if sec:
        print(f"indep4: {sec*1e9/K:.2f} ns/iter (4 indep loads + 4 adds)", flush=True)


if __name__ == "__main__":
    main()
