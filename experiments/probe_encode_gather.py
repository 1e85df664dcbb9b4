"""Chip probes for the vectorized match-finder plan (VERDICT r4 item 4).

The candidate design: precompute per-position longest-match tables
(full-budget and quartered-budget variants — the anchor-independence
argument in STATUS.md makes zlib-exact lazy decisions reproducible from
them) on the VPU/XLA, then run the cheap scalar decision walk in SMEM.
Its feasibility hangs on gather throughput at the real shapes:

  probe 1: XLA gather, 8K-word table (a 32 KiB window), 1M indices —
           the window byte-load primitive of any XLA-side matcher.
  probe 2: one full phase-A round at chunk scale: chain-step gather
           (prev table) + two window-word gathers + compare + running
           max, 32768 positions, K rounds.
  probe 3: same pattern but batched over 16 chunks (the real batch).

Run on the chip: python experiments/probe_encode_gather.py
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def trace_seconds(fn, reps, tag):
    out = fn()
    jax.block_until_ready(out)  # compile
    trace_dir = f"/tmp/zrs_probe_{tag}_{os.getpid()}"
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        return None
    tr = json.load(gzip.open(files[-1]))
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in tr.get("traceEvents", [])
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tot = sum(
        e.get("dur", 0) / 1e6
        for e in tr.get("traceEvents", [])
        if e.get("ph") == "X"
        and "TPU" in pid_names.get(e.get("pid"), "")
        and e.get("name", "").startswith("jit_")
    )
    return tot / reps if tot else None


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    # probe 1: plain gather throughput
    table = jnp.asarray(rng.integers(0, 1 << 30, 8192, dtype=np.int64).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 8192, 1 << 20, dtype=np.int64).astype(np.int32))

    @jax.jit
    def g1(t, i):
        return jnp.sum(t[i], dtype=jnp.int32)

    sec = trace_seconds(lambda: g1(table, idx), 10, "g1")
    if sec:
        n = 1 << 20
        print(
            f"probe1 gather 8K-table x 1M idx: {sec*1e6:.0f} us/call, "
            f"{n/sec/1e9:.2f} G gathered-elems/s", flush=True,
        )

    # probe 2: one phase-A candidate round at chunk scale (B=1)
    P = 32768
    prev = jnp.asarray(rng.integers(0, P, P, dtype=np.int64).astype(np.int32))
    words = jnp.asarray(
        rng.integers(0, 1 << 30, P // 4 + 64, dtype=np.int64).astype(np.int32)
    )
    pos = jnp.arange(P, dtype=jnp.int32)

    @jax.jit
    def round_step(cand, best_len, best_dist):
        # one candidate per position: word compare at cand vs pos (4-byte
        # granularity stand-in for the real byte-aligned compare)
        w_pos = words[pos >> 2]
        w_cand = words[jnp.clip(cand, 0, P - 1) >> 2]
        eq = (w_pos == w_cand).astype(jnp.int32) * 4
        better = eq > best_len
        best_len = jnp.where(better, eq, best_len)
        best_dist = jnp.where(better, pos - cand, best_dist)
        cand2 = prev[jnp.clip(cand, 0, P - 1)]
        return cand2, best_len, best_dist

    @jax.jit
    def phase_a(K):
        def body(_, st):
            return round_step(*st)

        cand0 = prev[pos]
        z = jnp.zeros(P, jnp.int32)
        return jax.lax.fori_loop(0, K, body, (cand0, z, z))

    for K in (16, 64, 128):
        sec = trace_seconds(lambda K=K: phase_a(K), 5, f"pa{K}")
        if sec:
            print(
                f"probe2 phase-A {K} rounds x 32768 pos: {sec*1e3:.2f} ms "
                f"({sec/K*1e6:.0f} us/round; {32768/sec/1e6:.1f} M pos-chains/s)",
                flush=True,
            )

    # probe 3: batched over 16 chunks
    B = 16
    prevB = jnp.asarray(rng.integers(0, P, (B, P), dtype=np.int64).astype(np.int32))
    wordsB = jnp.asarray(
        rng.integers(0, 1 << 30, (B, P // 4 + 64), dtype=np.int64).astype(np.int32)
    )

    @jax.jit
    def phase_a_batch(K):
        def one(prev1, words1):
            def rstep(cand, bl, bd):
                w_pos = words1[pos >> 2]
                w_cand = words1[jnp.clip(cand, 0, P - 1) >> 2]
                eq = (w_pos == w_cand).astype(jnp.int32) * 4
                better = eq > bl
                bl = jnp.where(better, eq, bl)
                bd = jnp.where(better, pos - cand, bd)
                return prev1[jnp.clip(cand, 0, P - 1)], bl, bd

            def body(_, st):
                return rstep(*st)

            z = jnp.zeros(P, jnp.int32)
            return jax.lax.fori_loop(0, K, body, (prev1[pos], z, z))

        return jax.vmap(one)(prevB, wordsB)

    for K in (32, 128):
        sec = trace_seconds(lambda K=K: phase_a_batch(K), 3, f"pab{K}")
        if sec:
            tot_bytes = B * P
            print(
                f"probe3 batched phase-A B=16 K={K}: {sec*1e3:.2f} ms/batch "
                f"-> {tot_bytes/sec/1e6:.1f} MB of positions/s", flush=True,
            )


if __name__ == "__main__":
    main()
