"""Chip probes for the sorted-space vectorized match-table encode design.

Primitives to price (per 32 KiB chunk + 32 KiB dict = 64 Ki positions):
  1. batched stable sort by (hash<<16 | pos) with payload operands
  2. row-gather of 66 contiguous words per sorted position (G table)
  3. back-sort (key = original position) to undo the permutation
  4. a j-loop rolled compare pass (XLA flavor, small j count) for scale
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_trace_seconds


def main():
    B, N = 8, 65536
    rng = np.random.default_rng(0)
    h = rng.integers(0, 1 << 15, (B, N)).astype(np.int32)
    pos = np.broadcast_to(np.arange(N, dtype=np.int32), (B, N)).copy()
    key = (h << 16) | pos
    keyd = jnp.asarray(key)
    payload = jnp.asarray(rng.integers(0, 1 << 30, (B, N)).astype(np.int32))
    words = jnp.asarray(rng.integers(0, 1 << 30, (B, N // 2)).astype(np.int32))

    @jax.jit
    def do_sort(k, p1, p2):
        return jax.lax.sort((k, p1, p2), dimension=1, num_keys=1)

    @jax.jit
    def do_gather(w, idx):
        # G[k, j] = words[idx[k] + j], j in 0..65 (fifo-style pattern)
        ii = jnp.clip(idx[:, :, None] + jnp.arange(66, dtype=jnp.int32)[None, None, :],
                      0, w.shape[1] - 1)
        return jnp.take_along_axis(w[:, :, None], ii.reshape(B, -1, 1), axis=1)

    @jax.jit
    def do_compare(g, nj):
        # rolled compare: for j in 1..nj, eq-words vs row k-j, running max of
        # first-diff-word index (coarse stand-in for the real L computation)
        gp = jnp.pad(g, ((0, 0), (128, 0), (0, 0)))
        acc = jnp.zeros(g.shape[:2], jnp.int32)

        def body(j, acc):
            shifted = jax.lax.dynamic_slice_in_dim(gp, 128 - j, g.shape[1], axis=1)
            eq = (g == shifted)
            fd = jnp.argmin(eq, axis=2).astype(jnp.int32)
            allm = jnp.all(eq, axis=2)
            L = jnp.where(allm, g.shape[2], fd)
            return jnp.maximum(acc, L)

        return jax.lax.fori_loop(1, nj + 1, body, acc)

    out = jax.block_until_ready(do_sort(keyd, payload, payload))
    s, _ = _device_trace_seconds(lambda: do_sort(keyd, payload, payload), 5, "sort", 240)
    print(f"sort (B={B}, N={N}, 2 payloads): {s*1e3:.3f} ms/batch = {s/B*1e3:.3f} ms/chunk")

    idx = out[0] & 0xFFFF
    jax.block_until_ready(do_gather(words, idx // 2))
    s, _ = _device_trace_seconds(lambda: do_gather(words, idx // 2), 5, "gather", 240)
    print(f"row-gather 66 words x {N}: {s*1e3:.3f} ms/batch = {s/B*1e3:.3f} ms/chunk")

    g = jnp.asarray(rng.integers(0, 4, (B, N, 17)).astype(np.int32))
    jax.block_until_ready(do_compare(g, 8))
    s8, _ = _device_trace_seconds(lambda: do_compare(g, 8), 3, "cmp8", 240)
    print(f"XLA rolled compare, 17 words, j=8: {s8*1e3:.2f} ms/batch = {s8/B*1e3:.3f} ms/chunk -> x16 for j=128: {s8/B*16*1e3:.2f} ms/chunk")


if __name__ == "__main__":
    main()
