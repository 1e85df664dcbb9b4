"""Probe 4: which vector-decoder ops are pathological in Mosaic?

Measures per-iteration cost of each suspect op class in isolation:
variable per-lane shifts, dynamic tape-row stores, the rev15 butterfly,
lane gathers, the masked-reduce — inside the same while-loop shape the
vhuff kernel uses.

Run on chip:  python experiments/probe_vops.py
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _timeit(fn, *args, iters=5):
    fn(*args)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters


def run(variant, rounds=512, K=64, cap=512):
    u32 = jnp.uint32

    def kernel(fifo_ref, idx_ref, out_ref, tape_ref):
        fifo = fifo_ref[:]
        kio = lax.broadcasted_iota(jnp.int32, (K, 8, 128), 0)

        def body(carry):
            it, x = carry
            xi = x.astype(jnp.int32)
            if variant == "varshift":
                n = (xi & 15).astype(u32)
                y = (x >> n) | ((x << 1) << (31 - (xi & 15)).astype(u32))
            elif variant == "fixshift":
                y = (x >> u32(3)) | (x << u32(7))
            elif variant == "rev15":
                y = x
                y = ((y >> 1) & u32(0x5555)) | ((y & u32(0x5555)) << 1)
                y = ((y >> 2) & u32(0x3333)) | ((y & u32(0x3333)) << 2)
                y = ((y >> 4) & u32(0x0F0F)) | ((y & u32(0x0F0F)) << 4)
                y = ((y >> 8) & u32(0x00FF)) | ((y & u32(0x00FF)) << 8)
            elif variant == "lanegather":
                t = fifo[0]
                y = jnp.take_along_axis(t, xi & 127, axis=1).astype(u32)
            elif variant == "maskreduce":
                y = jnp.sum(
                    jnp.where(kio == (xi % K)[None], fifo, 0), axis=0
                ).astype(u32)
            elif variant == "tapestore":
                tape_ref[pl.ds(it % cap, 1)] = x[None]
                y = x
            elif variant == "cascade":
                t = fifo[0]
                ln = jnp.ones_like(xi)
                for l in range(1, 15):
                    col = lax.broadcast_in_dim(t[:, l], xi.shape, (0,))
                    ln = ln + (xi >= col).astype(jnp.int32)
                y = ln.astype(u32)
            elif variant == "anyreduce":
                y = x + jnp.any(xi > 0).astype(u32)
            elif variant == "baseline":
                y = x + u32(1)
            else:
                raise ValueError(variant)
            return (it + 1, (x ^ y) + u32(1))

        def cond(carry):
            return carry[0] < rounds

        _, x = lax.while_loop(cond, body, (jnp.int32(0), idx_ref[:].astype(u32)))
        out_ref[:] = x.astype(jnp.int32)

    fifo = (jnp.arange(K * 8 * 128, dtype=jnp.int32).reshape(K, 8, 128) * 131) % 1024
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 13) % 128
    fn = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
            jax.ShapeDtypeStruct((cap, 8, 128), jnp.uint32),
        ],
    )
    jitted = jax.jit(lambda f, i: tuple(fn(f, i)))
    t0 = time.perf_counter()
    try:
        dt = _timeit(jitted, fifo, idx)
    except Exception as e:  # noqa: BLE001
        print(f"{variant:12s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return
    tc = time.perf_counter() - t0
    ns = dt / rounds * 1e9
    print(f"{variant:12s} {ns:9.2f} ns/round   (compile+5it: {tc:.1f}s)")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].platform}")
    variants = sys.argv[1:] or [
        "baseline", "fixshift", "varshift", "rev15", "lanegather",
        "maskreduce", "tapestore", "cascade", "anyreduce",
    ]
    for v in variants:
        run(v)
