"""Probe 3: cost of building per-walker input FIFOs, and 3D masked-reduce.

fifo[b, s, k] = words[b, start[b, s] + k]  -- the XLA staging gather a
vector token decoder needs once per call. Also: does a (K, 8, 128)
jnp.sum(where(iota==idx), axis=0) masked-reduce lower inside Pallas?

Run on chip:  python experiments/probe_fifo.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _timeit(fn, *args, iters=5):
    fn(*args)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters


def fifo_gather(B=256, Lw=8192, S=128, K=72):
    words = jnp.arange(B * Lw, dtype=jnp.int32).reshape(B, Lw)
    rng = np.random.default_rng(0)
    start = jnp.asarray(
        np.sort(rng.integers(0, Lw - K, (B, S)), axis=1), jnp.int32
    )

    def build(words, start):
        idx = start[:, :, None] + jnp.arange(K, dtype=jnp.int32)[None, None, :]
        flat = jnp.take_along_axis(words, idx.reshape(B, S * K), axis=1)
        return (flat.reshape(B, S, K),)

    f = jax.jit(build)
    dt = _timeit(f, words, start)
    n = B * S * K
    print(f"fifo_gather  B={B} S={S} K={K}: {dt*1e3:.2f} ms "
          f"({dt/n*1e9:.2f} ns/elem, {n} elems)")


def masked_reduce_3d(K=72, rounds=256):
    def kernel(fifo_ref, idx_ref, out_ref):
        fifo = fifo_ref[:]          # (K, 8, 128)
        kio = jax.lax.broadcasted_iota(jnp.int32, (K, 8, 128), 0)

        def body(_, x):
            y = jnp.sum(jnp.where(kio == (x % K)[None], fifo, 0), axis=0)
            return (x + y) % K

        x = jax.lax.fori_loop(0, rounds, body, idx_ref[:])
        out_ref[:] = x

    fifo = (jnp.arange(K * 8 * 128, dtype=jnp.int32).reshape(K, 8, 128) * 131) % K
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 13) % K
    fn = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32)
    )
    jitted = jax.jit(lambda f, i: (fn(f, i),))
    try:
        dt = _timeit(jitted, fifo, idx)
    except Exception as e:  # noqa: BLE001
        print(f"masked_reduce_3d K={K} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return
    ns = dt / rounds * 1e9
    print(f"masked_reduce_3d K={K}: {ns:9.2f} ns/round (1024 lanes)")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].platform}")
    fifo_gather()
    fifo_gather(B=64, S=128, K=264, Lw=32768)
    masked_reduce_3d(K=72)
    masked_reduce_3d(K=136)
    masked_reduce_3d(K=264)
