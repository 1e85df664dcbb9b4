"""Ablate the literal decode path op by op to find the 60ns/symbol."""
import sys, time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/experiments")
from probe_scalar import trace_seconds

K = 50_000  # symbols
TW = 512    # table
OW = 32768


def make(variant):
    # variant bitmask: 1=second table load, 2=advance reload, 4=write,
    # 8=not-taken cond, 16=win32 ALU
    def kern(words_ref, tab_ref, out_ref):
        def cond(st):
            i, bp, w0, w1, op, b = st
            return (i < K) & ~b

        def body(st):
            i, bp, w0, w1, op, b = st
            if variant & 16:
                sh = (bp & 31).astype(jnp.uint32)
                w = jnp.where(sh > 0, (w0 >> sh) | (w1 << (jnp.uint32(32) - sh)), w0)
            else:
                w = w0
            i0 = (w & jnp.uint32(TW - 1)).astype(jnp.int32)
            e0 = tab_ref[0, i0]
            if variant & 1:
                idx2 = (e0 & jnp.uint32(TW - 1)).astype(jnp.int32)
                e = tab_ref[0, idx2]
            else:
                e = e0
            nb = ((e >> jnp.uint32(16)) & jnp.uint32(15)).astype(jnp.int32) + 1
            val = e & jnp.uint32(0xFF)
            if variant & 4:
                wi = op >> 2
                shw = ((op & 3) << 3).astype(jnp.uint32)
                wv = out_ref[0, wi]
                out_ref[0, wi] = (wv & ~(jnp.uint32(0xFF) << shw)) | (val << shw)
            nbp = bp + nb
            if variant & 2:
                moved = (nbp >> 5) != (bp >> 5)
                w0n = jnp.where(moved, w1, w0)
                w1n = jnp.where(moved, words_ref[0, (nbp >> 5) & 8191], w1)
            else:
                w0n, w1n = w0, w1
            if variant & 8:
                def big(args):
                    op2, b2 = args
                    x = tab_ref[0, (op2 + 3) & (TW - 1)]
                    def ib(j, a):
                        return a + tab_ref[0, (a + j) & (TW - 1)].astype(jnp.int32)
                    s = lax.fori_loop(jnp.int32(0), (x & jnp.uint32(7)).astype(jnp.int32), ib, jnp.int32(0))
                    return op2 + s, b2
                op, b = lax.cond(val > jnp.uint32(0xFFFF), big, lambda a: a, (op, b))
            return i + 1, nbp & 0x7FFFFFF, w0n, w1n, (op + 1) & (OW * 4 - 5), b

        i, bp, w0, w1, op, b = lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0), jnp.uint32(0x12345678),
             jnp.uint32(0x9ABCDEF0), jnp.int32(0), jnp.bool_(False)),
        )
        out_ref[0, 0] = i + bp + op

    def run(words, tab):
        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec((1, 8192), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, TW), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, OW), memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, OW), jnp.int32),
        )(words, tab)

    return run


def main():
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 2**32, (1, 8192), dtype=np.uint64).astype(np.uint32))
    tab = jnp.asarray(rng.integers(0, 2**20, (1, TW), dtype=np.uint64).astype(np.uint32))
    cases = [
        (0, "1load only"),
        (16, "+win32"),
        (17, "+2nd load"),
        (19, "+advance"),
        (23, "+write"),
        (31, "+cond(nt)"),
    ]
    for v, name in cases:
        fn = make(v)
        out = jax.jit(fn)(words, tab)
        jax.block_until_ready(out)
        sec = trace_seconds(lambda: jax.jit(fn)(words, tab), 5, f"lp{v}")
        print(f"{name}: {sec*1e9/K:.1f} ns/sym", flush=True)


if __name__ == "__main__":
    main()
