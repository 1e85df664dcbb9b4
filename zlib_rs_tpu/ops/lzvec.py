"""Vectorized (VPU) LZ77 match-table construction in sorted hash space.

The round-4 answer to the encode-side scalar ceiling (the SMEM hash-chain
scan kernel walks chains at ~2.7 MB/s/chip — every candidate is a serial
dependent SMEM load). The insight making vectorization possible: in the
deflate_slow regime every position is inserted into its hash chain
exactly once, in position order, so the chain contents are a pure
function of the DATA — candidate lists can be precomputed without
running the parse (the reference walks them lazily per position,
longest_match.rs:38-80; we batch them).

Pipeline (all XLA vector ops, no per-pair gathers — chip-measured
arbitrary gathers cost ~8.7 ns/element, which killed every gather
formulation):

  1. zlib's 3-byte rolling hash for every position (elementwise).
  2. ONE stable sort by (hash << 16 | pos): hash groups become
     contiguous runs ordered by position — the j-th predecessor of a row
     in sorted space IS the j-th chain candidate (newest-first), exactly
     zlib's walk order. The first W_G words of every position's suffix
     ride the sort as payload operands (chip-measured ~0.025 ms/chunk
     per operand), so candidate compares become ROLLED VECTOR COMPARES
     in sorted space: row k vs row k-j, j = 1..max_chain.
  3. A fori over j maintains, per position, the running (best_len,
     first-achieving dist) under zlib's exact walk rules: budget in
     chain steps, inclusive stop at the first candidate reaching
     nice_eff = min(nice, cap), chain truncation at the first
     out-of-window candidate. Both budget variants (full, quartered)
     come out of one pass — zlib quarters the budget at walk entry when
     the pending match is already `good` (longest_match.rs:76-79), so
     the walk needs both.
  4. ONE back-sort by position returns packed (len << 16 | dist) tables
     the scalar parse kernel reads instead of walking chains.

Equivalence argument (vs the anchored scalar walk): the anchor reject
(candidate byte at offset best_len) can only reject candidates that
cannot raise the running best, and zlib updates best only on strictly
greater — so the walk's result is exactly (prefix max, first index
achieving it) over the examined prefix, which is what the fori
computes. The examined prefix itself is independent of the pending
match length (it only gates whether the result is USED), so the
precomputation is exact for every pending state.

Lengths are capped at 4 * W_G bytes; the parse kernel extends
cap-hitting winners byte-exactly in SMEM (cheap: only actual long
matches pay), so only the CHOICE among multiple >=cap candidates is
approximate — a measured-ratio question, not a correctness one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

HASH_BITS = 15
HSIZE = 1 << HASH_BITS
MIN_MATCH = 3
MAX_MATCH = 258
MAX_DIST = 32768

_SENTINEL = jnp.int32(0x7FFFFFFF)


def _unaligned_words(words4):
    """uint32[B, W] aligned LE words -> uint32[B, 4W] word-at-every-byte
    (U[p] = bytes p..p+3 LE), using the aligned array's own zero tail."""
    B, W = words4.shape
    b = jnp.stack(
        [
            words4 & 0xFF,
            (words4 >> 8) & 0xFF,
            (words4 >> 16) & 0xFF,
            (words4 >> 24) & 0xFF,
        ],
        axis=-1,
    ).reshape(B, 4 * W)
    bp = jnp.pad(b, ((0, 0), (0, 4)))
    return (
        bp[:, : 4 * W]
        | (bp[:, 1 : 4 * W + 1] << 8)
        | (bp[:, 2 : 4 * W + 2] << 16)
        | (bp[:, 3 : 4 * W + 3] << 24)
    ).astype(jnp.uint32)


def _tail_bytes(xr):
    """Equal leading bytes (0..3) of a nonzero XOR word."""
    t0 = (xr & 0xFF) == 0
    t1 = t0 & ((xr & 0xFFFF) == 0)
    t2 = t1 & ((xr & 0xFFFFFF) == 0)
    return t0.astype(jnp.int32) + t1.astype(jnp.int32) + t2.astype(jnp.int32)


def _make_compare_kernel(R: int, depth: int, nice: int, w_g: int):
    """VMEM-resident candidate-compare stage as one Pallas kernel.

    The XLA fori version re-reads every operand from HBM per j step
    (~3.5 ms per 8-chunk batch); here the sorted arrays live in VMEM
    (~0.3 MB each) and the j loop is UNROLLED with static shifts, so the
    whole scan is compute-bound VPU work. A flat shift by j over the
    (R, 128) layout is two static rolls + an iota select (lane l >= j%128
    takes the lane-rolled row, below takes the row above it).
    """
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental.pallas import tpu as pltpu

    def shl(x, j):
        q, r = divmod(j, 128)
        if r == 0:
            return pltpu.roll(x, shift=q, axis=0)
        y1 = pltpu.roll(x, shift=r, axis=1)
        ya = pltpu.roll(y1, shift=q, axis=0)
        yb = pltpu.roll(y1, shift=q + 1, axis=0)
        lane = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        return jnp.where(lane >= r, ya, yb)

    def kernel(meta_ref, ks_ref, *rest):
        g_refs = rest[:w_g]
        outf_ref, outq_ref = rest[w_g], rest[w_g + 1]
        n_valid = meta_ref[0, 0, 0]

        ks = ks_ref[:]
        G = [g[:] for g in g_refs]
        flat = (
            lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
            + lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        )
        pos_k = ks & 0xFFFF
        hash_k = ks >> 16
        cap_k = jnp.clip(n_valid - pos_k, 0, MAX_MATCH)
        nice_eff = jnp.minimum(jnp.int32(nice), cap_k)

        z = jnp.zeros((R, 128), jnp.int32)
        M, D = z, z
        M32, D32 = z, z
        frozen = jnp.zeros((R, 128), jnp.bool_)
        for j in range(1, depth + 1):
            kprev = shl(ks, j)
            same = ((kprev >> 16) == hash_k) & (flat >= j)
            dist = pos_k - (kprev & 0xFFFF)
            valid = same & (dist >= 1) & (dist <= MAX_DIST)
            L = z
            pe = valid
            for w in range(w_g):
                xr = G[w] ^ shl(G[w], j)
                eq = xr == 0
                L = L + jnp.where(pe, jnp.where(eq, 4, _tail_bytes(xr)), 0)
                pe = pe & eq
            L = jnp.minimum(L, cap_k)
            live = ~frozen
            better = live & (L > M)
            M = jnp.where(better, L, M)
            D = jnp.where(better, dist, D)
            frozen = frozen | (live & valid & (L >= nice_eff))
            if j == depth >> 2:
                M32, D32 = M, D
        outf_ref[:] = jnp.where(M >= MIN_MATCH, (M << 16) | D, 0)
        outq_ref[:] = jnp.where(M32 >= MIN_MATCH, (M32 << 16) | D32, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("depth", "nice", "w_g"))
def _compare_stage_pallas(ks, payloads, n_valid, *, depth, nice, w_g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, P = ks.shape
    Pp = -(-P // 128) * 128
    R = Pp // 128
    ks2 = jnp.pad(ks, ((0, 0), (0, Pp - P)), constant_values=_SENTINEL
                  ).reshape(B, R, 128)
    g2 = [jnp.pad(g, ((0, 0), (0, Pp - P))).reshape(B, R, 128)
          for g in payloads]
    spec = pl.BlockSpec((None, R, 128), lambda b: (b, 0, 0))
    f = pl.pallas_call(
        _make_compare_kernel(R, depth, nice, w_g),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ] + [spec] * (1 + w_g),
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, R, 128), jnp.int32),
        ],
    )
    meta = jnp.pad(n_valid.astype(jnp.int32).reshape(B, 1), ((0, 0), (0, 7)))
    outf, outq = f(meta.reshape(B, 1, 8), ks2, *g2)
    return (outf.reshape(B, Pp)[:, :P], outq.reshape(B, Pp)[:, :P])


@functools.partial(jax.jit, static_argnames=("depth", "nice", "w_g"))
def _compare_stage_xla(ks, G, n_valid, *, depth, nice, w_g):
    """Reference fori-loop compare stage (CPU / interpret path; also the
    model the Pallas stage is differential-tested against). Each j step
    re-reads the operands from HBM, which is why TPU uses the
    VMEM-resident kernel instead."""
    B, P = ks.shape
    pos_k = ks & 0xFFFF
    hash_k = ks >> 16
    cap_k = jnp.clip(n_valid[:, None] - pos_k, 0, MAX_MATCH)
    nice_eff = jnp.minimum(jnp.int32(nice), cap_k)

    pad = depth
    ks_p = jnp.pad(ks, ((0, 0), (pad, 0)), constant_values=-1)
    G_p = [jnp.pad(g, ((0, 0), (pad, 0))) for g in G]

    def step(j, st):
        M, D, frozen, M32, D32 = st
        kprev = lax.dynamic_slice_in_dim(ks_p, pad - j, P, axis=1)
        same = (kprev >> 16) == hash_k
        dist = pos_k - (kprev & 0xFFFF)
        valid = same & (dist >= 1) & (dist <= MAX_DIST)

        L = jnp.zeros((B, P), jnp.int32)
        pe = jnp.ones((B, P), jnp.bool_)
        for w in range(w_g):
            gw = G[w]
            gp = lax.dynamic_slice_in_dim(G_p[w], pad - j, P, axis=1)
            xr = gw ^ gp
            eq = xr == 0
            L = L + jnp.where(pe, jnp.where(eq, 4, _tail_bytes(xr)), 0)
            pe = pe & eq
        L = jnp.where(valid, jnp.minimum(L, cap_k), 0)

        live = ~frozen
        better = live & (L > M)
        M = jnp.where(better, L, M)
        D = jnp.where(better, dist, D)
        frozen = frozen | (live & valid & (L >= nice_eff))
        take = j == (depth >> 2)
        M32 = jnp.where(take, M, M32)
        D32 = jnp.where(take, D, D32)
        return M, D, frozen, M32, D32

    z = jnp.zeros((B, P), jnp.int32)
    M, D, _f, M32, D32 = lax.fori_loop(
        1, depth + 1, step, (z, z, jnp.zeros((B, P), jnp.bool_), z, z)
    )
    packed = jnp.where(M >= MIN_MATCH, (M << 16) | D, 0)
    packed32 = jnp.where(M32 >= MIN_MATCH, (M32 << 16) | D32, 0)
    return packed, packed32


@functools.partial(
    jax.jit, static_argnames=("depth", "nice", "w_g")
)
def build_match_tables(
    words4, n_valid, ins_from, *, depth: int, nice: int, w_g: int = 16
):
    """Per-position zlib longest_match summaries for a batch of chunks.

    words4: uint32[B, W] aligned words (>= 2 zero pad words at the tail).
    n_valid/ins_from: int32[B] — positions [ins_from, n_valid) are
    chain-inserted (the deflate_slow invariant); candidates are walked
    newest-first within the 15-bit rolling-hash group.

    Returns (tab_full, tab_quart): int32[B, 4W], position-indexed packed
    (len << 16 | dist) results for budget `depth` and `depth >> 2`
    (0 where the walk finds nothing). len is capped at 4 * w_g.
    """
    B, W = words4.shape
    P = 4 * W
    cap_g = 4 * w_g

    U = _unaligned_words(words4)
    pos = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], (B, P))

    # zlib's rolling 3-byte hash, evaluated directly (deflate_kernel.hash_at)
    h = (
        ((U & jnp.uint32(0xFF)) << 10)
        ^ (((U >> 8) & jnp.uint32(0xFF)) << 5)
        ^ ((U >> 16) & jnp.uint32(0xFF))
    ).astype(jnp.int32) & (HSIZE - 1)

    real = (pos >= ins_from[:, None]) & (pos < n_valid[:, None])
    key = jnp.where(real, (h << 16) | pos, _SENTINEL)

    # suffix words ride the sort: payload w = U shifted by 4w bytes
    Upad = jnp.pad(U, ((0, 0), (0, cap_g)))
    payloads = [Upad[:, 4 * w : 4 * w + P].astype(jnp.int32) for w in range(w_g)]

    sorted_ops = lax.sort([key] + payloads, dimension=1, num_keys=1)
    ks = sorted_ops[0]
    G = sorted_ops[1:]

    # the Pallas compare stage is chip-verified EQUAL but measured SLOWER
    # (6.4 vs 5.0 ms/batch: the per-j flat-shift costs 3 roll relayouts
    # per operand, and the 128-way unroll compiles for ~6 minutes), so
    # the HBM-streaming XLA loop stays the default on every backend
    import os as _os

    if jax.default_backend() == "tpu" and _os.environ.get("ZRS_TPU_PALLAS_CMP"):
        packed, packed32 = _compare_stage_pallas(
            ks, list(G), n_valid, depth=depth, nice=nice, w_g=w_g
        )
    else:
        packed, packed32 = _compare_stage_xla(
            ks, list(G), n_valid, depth=depth, nice=nice, w_g=w_g
        )

    # undo the permutation: one more sort, keyed by position (sentinels
    # carry pos-field 0xFFFF and sink to the tail)
    back = lax.sort([ks & 0xFFFF, packed, packed32], dimension=1, num_keys=1)
    return _align_tables(back, ins_from, P)


def _align_tables(back, ins_from, P):
    _bpos, btab, btab32 = back

    # align rows to absolute positions: real rows start at ins_from
    def align(tab):
        # row r holds position ins_from + r; shift right by ins_from
        def one(t, s):
            rolled = jnp.roll(t, s)
            idx = jnp.arange(P, dtype=jnp.int32)
            return jnp.where(idx >= s, rolled, 0)

        return jax.vmap(one)(tab, ins_from.astype(jnp.int32))

    return align(btab), align(btab32)


# ---------------------------------------------------------------------------
# hop tables: the lazy chain itself, vectorized
# ---------------------------------------------------------------------------

def _shift_fwd(x, k, P):
    """y[p] = x[p + k] (zero fill past the end); k is a traced scalar."""
    xp = jnp.pad(x, ((0, 0), (0, x.shape[1])))
    return lax.dynamic_slice_in_dim(xp, k, P, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "nice", "good", "max_lazy", "w_g"),
)
def build_hop_tables(
    words4, n_valid, ins_from, *,
    depth: int, nice: int, good: int, max_lazy: int, w_g: int = 8,
):
    """Vectorize the one-step-lazy DECISION CHAIN on top of the match
    tables, so the scalar pass degenerates to a pointer chase.

    Key observation: from a clean arrival at position p, deflate_slow's
    deferral chain is a pure function of p — pending length strictly
    increases each deferral and the search is skipped once it reaches
    max_lazy, so the chain has at most (max_lazy - MIN_MATCH) hops, and
    hop k of EVERY position reads tables at p + k: a constant shift, not
    a gather. One bounded fori computes, for every position at once, the
    number of deferred literals, the emitted (len, dist), and thus the
    parse successor.

    Returns htab int32[B, 4W], position-indexed:
      0                                    -> literal (successor p + 1)
      (1 << 30) | h << 23 | len << 16 | d  -> h literals, then a match of
                                              (len, d) at p + h
    len is capped at 4 * w_g (the parse kernel extends at emit); callers
    must keep 4 * w_g < 128 and max_lazy - MIN_MATCH < 128 so the fields
    fit. Decision-equivalent to scan_chunks_tab_pallas's walk by
    construction (differential-tested in tests/test_lzvec.py).
    """
    if 4 * w_g >= 128 or max_lazy - MIN_MATCH >= 128:
        raise ValueError("hop-table field widths need 4*w_g < 128 and "
                         "max_lazy - MIN_MATCH < 128")
    B, W = words4.shape
    P = 4 * W
    tabf, tabq = build_match_tables(
        words4, n_valid, ins_from, depth=depth, nice=nice, w_g=w_g
    )
    Mf, Df = tabf >> 16, tabf & 0xFFFF
    Mq, Dq = tabq >> 16, tabq & 0xFFFF

    pos = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], (B, P))
    cap = jnp.clip(n_valid[:, None] - pos, 0, MAX_MATCH)
    nice_eff = jnp.minimum(jnp.int32(nice), cap)

    # hop 0: the clean-arrival search (full budget, threshold 0)
    is_lit = (Mf < MIN_MATCH) | ((Mf == MIN_MATCH) & (Df > 4096))
    plen = Mf
    pdist = Df
    h = jnp.zeros((B, P), jnp.int32)
    alive = ~is_lit

    def hop(k, st):
        plen, pdist, h, alive = st
        mf = _shift_fwd(Mf, k, P)
        df = _shift_fwd(Df, k, P)
        mq = _shift_fwd(Mq, k, P)
        dq = _shift_fwd(Dq, k, P)
        ne = _shift_fwd(nice_eff, k, P)
        quart = plen >= good
        cand = jnp.where(quart, mq, mf)
        cdist = jnp.where(quart, dq, df)
        found = (
            alive
            & (pos + k < n_valid[:, None])
            & (plen < max_lazy)
            & (plen < ne)
            & (cand > plen)
        )
        plen = jnp.where(found, cand, plen)
        pdist = jnp.where(found, cdist, pdist)
        h = jnp.where(found, k, h)
        return plen, pdist, h, found

    plen, pdist, h, _ = lax.fori_loop(
        1, max_lazy - MIN_MATCH + 1, hop, (plen, pdist, h, alive)
    )
    htab = jnp.where(
        is_lit,
        0,
        (jnp.int32(1) << 30) | (h << 23) | (plen << 16) | pdist,
    )
    return htab
