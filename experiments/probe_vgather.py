"""Probe: per-lane dynamic table lookups on the VPU inside Pallas.

The round-3 ARCHITECTURE.md claim to test: "canonical Huffman's
code->symbol mapping ... needs a per-lane dynamic table lookup — exactly
the gather the VPU lacks".  Mosaic in fact has a lane-wise dynamic-gather
op; the question is which jnp spellings lower to it in this JAX, for which
table shapes, and at what issue rate (ns per (8,128) lookup round).

Run on chip:  python experiments/probe_vgather.py
Interpret:    ZRS_INTERPRET=1 python experiments/probe_vgather.py
"""
import functools
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


def make_kernel(rounds, variant):
    """A loop of `rounds` dependent per-lane table lookups."""

    def kernel(table_ref, idx_ref, out_ref):
        table = table_ref[:]          # (8, 128) or (R, 128) i32
        idx = idx_ref[:]              # (8, 128) i32 in [0, 128)

        def body(_, x):
            # dependent chain: next index = looked-up value
            if variant == "take_along_axis":
                # per-sublane table: out[i,j] = table[i, x[i,j]]
                y = jnp.take_along_axis(table, x & 127, axis=1)
            elif variant == "take_flat":
                # single shared 128-entry table broadcast to all sublanes
                t0 = jnp.broadcast_to(table[0:1, :], (8, 128))
                y = jnp.take_along_axis(t0, x & 127, axis=1)
            elif variant == "big_row":
                # 1024-entry table spread over 8 sublane rows:
                # row = x >> 7, col = x & 127 -> gather each row and select
                acc = jnp.zeros_like(x)
                col = x & 127
                row = (x >> 7) & 7
                for r in range(8):
                    tr = jnp.broadcast_to(table[r : r + 1, :], (8, 128))
                    g = jnp.take_along_axis(tr, col, axis=1)
                    acc = jnp.where(row == r, g, acc)
                y = acc
            elif variant == "independent8":
                # 8 mutually independent lookup chains -> issue throughput
                ys = [
                    jnp.take_along_axis(table, (x + k) & 127, axis=1)
                    for k in range(8)
                ]
                y = functools.reduce(lambda a, b: a ^ b, ys)
            else:
                raise ValueError(variant)
            return (x + y) & 1023 if variant == "big_row" else (x + y) & 127

        x = jax.lax.fori_loop(0, rounds, body, idx)
        out_ref[:] = x

    return kernel


def run(variant, rounds=1024, table_rows=8):
    table = jnp.arange(table_rows * 128, dtype=jnp.int32).reshape(table_rows, 128) * 7 % 128
    if variant == "big_row":
        table = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 131) % 1024
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 13) % 128

    fn = pl.pallas_call(
        make_kernel(rounds, variant),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        interpret=INTERPRET,
    )
    jitted = jax.jit(lambda t, i: (fn(t, i),))
    try:
        dt = _timeit(jitted, table, idx)
    except Exception as e:  # noqa: BLE001 - probe reports any lowering failure
        print(f"{variant:18s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return
    ns_per_round = dt / rounds * 1e9
    lanes = 8 * 128
    print(
        f"{variant:18s} {ns_per_round:8.2f} ns/round "
        f"({ns_per_round / lanes * 1000:.2f} ps/lane-lookup, "
        f"{lanes / ns_per_round:.1f} lookups/ns)"
    )


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].platform}, interpret={INTERPRET}")
    for v in ("take_along_axis", "take_flat", "big_row", "independent8"):
        run(v)
