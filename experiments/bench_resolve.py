"""Measure resolve_tokens (XLA pointer-doubling LZ expansion) standalone.

This is the stage a vectorized Pallas token decoder would feed; its
throughput bounds that whole decode architecture.

Run on chip:  python experiments/bench_resolve.py
"""
import sys
import time
import zlib

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from zlib_rs_tpu.parallel.device_inflate import (  # noqa: E402
    TOK_LIT,
    TOK_MATCH,
    TOK_NULL,
    resolve_tokens,
)


def synth_tokens(rng, out_size, lit_frac=0.5):
    """Realistic-ish token tape for one chunk: literal runs + matches."""
    kinds, aa, bb = [], [], []
    pos = 0
    while pos < out_size:
        if rng.random() < lit_frac or pos < 4:
            n = min(int(rng.integers(1, 12)), out_size - pos)
            for _ in range(n):
                kinds.append(TOK_LIT)
                aa.append(1)
                bb.append(int(rng.integers(0, 256)))
            pos += n
        else:
            ln = min(int(rng.integers(3, 60)), out_size - pos)
            dist = int(rng.integers(1, min(pos, 32768) + 1))
            kinds.append(TOK_MATCH)
            aa.append(ln)
            bb.append(dist)
            pos += ln
    return kinds, aa, bb


def main():
    rng = np.random.default_rng(7)
    out_size = 1 << 17  # 128 KiB per chunk
    B = 8
    S = 0
    taps = []
    for _ in range(B):
        taps.append(synth_tokens(rng, out_size))
        S = max(S, len(taps[-1][0]))
    S = -(-S // 512) * 512
    tk = np.full((B, S), TOK_NULL, np.uint8)
    ta = np.zeros((B, S), np.int32)
    tb = np.zeros((B, S), np.int32)
    for i, (k, a, b) in enumerate(taps):
        tk[i, : len(k)] = k
        ta[i, : len(a)] = a
        tb[i, : len(b)] = b
    comp = np.zeros((B, 64), np.uint8)
    win = np.zeros((B, 0), np.uint8)

    f = jax.jit(
        lambda c, k, a, b, w: resolve_tokens(c, k, a, b, w, out_size, 0)
    )
    args = tuple(map(jnp.asarray, (comp, tk, ta, tb, win)))
    out, produced = f(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out, produced = f(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    total = B * out_size
    print(f"resolve_tokens: {B}x{out_size} bytes, S={S}: {dt*1e3:.2f} ms "
          f"-> {total/dt/1e6:.1f} MB/s")

    # correctness spot check vs a host expansion of chunk 0
    k, a, b = taps[0]
    buf = bytearray()
    for kk, av, bv in zip(k, a, b):
        if kk == TOK_LIT:
            buf.append(bv)
        else:
            for j in range(av):
                buf.append(buf[len(buf) - bv])
    got = np.asarray(out[0][: len(buf)]).tobytes()
    assert got == bytes(buf), "mismatch"
    print("exactness: ok")


if __name__ == "__main__":
    main()
