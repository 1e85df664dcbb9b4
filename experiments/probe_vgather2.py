"""Probe 2: the memory patterns a lane-parallel vector decoder needs.

1. axis-0 dynamic gather: out[0, j] = table[idx[j], j] — per-lane ROW
   selection (refill from per-walker word FIFOs, match-history reads).
2. masked-reduce fallback for the same (sum over k of (idx==k)*table[k]).
3. wide-table lane gather: take_along_axis on (8, 1024) tables.

Run on chip:  python experiments/probe_vgather2.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

INTERPRET = bool(int(os.environ.get("ZRS_INTERPRET", "0")))


def _timeit(fn, *args, iters=5):
    fn(*args)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters


def run(variant, rounds=256, K=128, W=128):
    """table: (K, W) i32; per-round, gather one row-element per lane column."""

    def kernel(table_ref, idx_ref, out_ref):
        table = table_ref[:]   # (K, W)
        idx = idx_ref[:]       # (1, W) i32 in [0, K)

        def body(_, x):
            if variant == "axis0_gather":
                y = jnp.take_along_axis(table, x % K, axis=0)  # (1, W)
            elif variant == "masked_reduce":
                k_iota = jax.lax.broadcasted_iota(jnp.int32, (K, W), 0)
                y = jnp.sum(
                    jnp.where(k_iota == (x % K), table, 0), axis=0, keepdims=True
                )
            elif variant == "wide_lane_gather":
                # (8, 1024) table; gather along lanes with 10-bit indices
                t8 = table.reshape(8, (K * W) // 8)
                y = jnp.take_along_axis(
                    t8, jnp.broadcast_to(x, (8, W)) % t8.shape[1], axis=1
                )[0:1, :W]
            else:
                raise ValueError(variant)
            return (x + y) % K

        x = jax.lax.fori_loop(0, rounds, body, idx)
        out_ref[0:1, :] = x

    table = (jnp.arange(K * W, dtype=jnp.int32).reshape(K, W) * 131) % K
    idx = (jnp.arange(W, dtype=jnp.int32).reshape(1, W) * 13) % K
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
        interpret=INTERPRET,
    )
    jitted = jax.jit(lambda t, i: (fn(t, i),))
    try:
        dt = _timeit(jitted, table, idx)
    except Exception as e:  # noqa: BLE001
        print(f"{variant:18s} K={K:5d} W={W:4d} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return
    ns = dt / rounds * 1e9
    print(f"{variant:18s} K={K:5d} W={W:4d} {ns:9.2f} ns/round ({ns / W * 1000:.1f} ps/lane)")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].platform}, interpret={INTERPRET}")
    run("axis0_gather", K=128, W=128)
    run("axis0_gather", K=512, W=128)
    run("axis0_gather", K=1024, W=128)
    run("masked_reduce", K=128, W=128)
    run("masked_reduce", K=512, W=128)
    run("wide_lane_gather", K=64, W=128)   # (8,1024) table
