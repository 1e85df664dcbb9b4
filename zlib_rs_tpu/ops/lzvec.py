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

# byte-precise candidate lengths up to _PRECISE_WORDS * 4 bytes; granular
# (whole words) beyond. Lengths <= 8 cover the bulk of matches, so the
# choice/defer decisions stay near-exact while long candidates drop ~6
# vector ops per word per chain step (full granularity measured 1.0112x
# zlib-6 on the bench corpus — over the 1.005 bar; this split recovers it)
_PRECISE_WORDS = 2


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


def _unaligned_words_from_bytes(bytes_arr, P):
    """uint8[B, L] -> uint32[B, P] word-at-every-byte via four SHIFTED
    SLICES of the byte array — the stack/reshape interleave in
    _unaligned_words is a lane-crossing relayout XLA executes slowly
    (part of the 2.4 ms prep fusion in the r4 encode-batch trace); byte
    slices + widening adds are pure elementwise streams."""
    B, L = bytes_arr.shape
    need = P + 3
    bp = (
        jnp.pad(bytes_arr, ((0, 0), (0, need - L)))
        if L < need
        else bytes_arr[:, :need]
    )
    b = bp.astype(jnp.uint32)
    return (
        b[:, :P]
        | (b[:, 1 : P + 1] << 8)
        | (b[:, 2 : P + 2] << 16)
        | (b[:, 3 : P + 3] << 24)
    )


def _tail_bytes(xr):
    """Equal leading bytes (0..3) of a nonzero XOR word."""
    t0 = (xr & 0xFF) == 0
    t1 = t0 & ((xr & 0xFFFF) == 0)
    t2 = t1 & ((xr & 0xFFFFFF) == 0)
    return t0.astype(jnp.int32) + t1.astype(jnp.int32) + t2.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("depth", "nice", "w_g", "precise")
)
def _compare_stage_xla(ks, G, n_valid, *, depth, nice, w_g, precise=False):
    """HBM-streaming fori-loop compare stage.

    Cost shape (r5 trace): this loop dominated the encode batch (~6.3 ms
    of 12.4 at depth 128), so three structural cuts:

      * ONE packed (len << 16 | dist) carry array instead of (M, D, M32,
        D32, frozen) — the quartered-budget snapshot comes from SPLITTING
        the fori at depth >> 2 instead of carrying two extra arrays
        through every step;
      * candidate lengths are byte-precise within the first word and
        WORD-GRANULAR beyond it (precise=False, the default): the scalar
        parse kernel already extends every emitted match byte-exactly, so
        granularity only coarsens the CHOICE between candidates and the
        lazy-defer thresholds — a measured-ratio trade that deletes ~6
        vector ops per payload word per chain step;
      * `precise=True` restores zlib's byte-exact lengths (the
        differential-test reference and the fallback if granular ratio
        regresses).

    (A VMEM-resident Pallas variant was chip-measured SLOWER — 6.4 vs
    5.0 ms/batch: the per-j flat shift over the (R, 128) layout costs 3
    roll relayouts per operand and the 128-way unroll compiled for ~6
    minutes — so the XLA loop is the only compare stage; the negative
    result is recorded in experiments/README.md.)"""
    B, P = ks.shape
    pos_k = (ks & jnp.uint32(0xFFFF)).astype(jnp.int32)
    hash_k = (ks >> 16).astype(jnp.int32)  # 0x8000 marks non-inserted rows
    searcher = hash_k < 0x8000
    cap_k = jnp.clip(n_valid[:, None] - pos_k, 0, MAX_MATCH)
    nice_eff = jnp.minimum(jnp.int32(nice), cap_k)

    pad = depth
    ks_p = jnp.pad(ks, ((0, 0), (pad, 0)),
                   constant_values=jnp.uint32(0xFFFFFFFF))
    G_p = [jnp.pad(g, ((0, 0), (pad, 0))) for g in G]

    def step(j, st):
        packed, frozen = st
        kprev = lax.dynamic_slice_in_dim(ks_p, pad - j, P, axis=1)
        same = (kprev >> 16).astype(jnp.int32) == hash_k
        dist = pos_k - (kprev & jnp.uint32(0xFFFF)).astype(jnp.int32)
        valid = searcher & same & (dist >= 1) & (dist <= MAX_DIST)

        gp0 = lax.dynamic_slice_in_dim(G_p[0], pad - j, P, axis=1)
        xr0 = G[0] ^ gp0
        pe = xr0 == 0
        L = jnp.where(pe, 4, _tail_bytes(xr0))
        for w in range(1, w_g):
            gp = lax.dynamic_slice_in_dim(G_p[w], pad - j, P, axis=1)
            if precise or w < _PRECISE_WORDS:
                xr = G[w] ^ gp
                eq = xr == 0
                L = L + jnp.where(pe, jnp.where(eq, 4, _tail_bytes(xr)), 0)
                pe = pe & eq
            else:
                pe = pe & (G[w] == gp)
                L = L + jnp.where(pe, 4, 0)
        L = jnp.where(valid, jnp.minimum(L, cap_k), 0)

        live = ~frozen
        better = live & (L > (packed >> 16))
        packed = jnp.where(better, (L << 16) | dist, packed)
        frozen = frozen | (live & valid & (L >= nice_eff))
        return packed, frozen

    z = jnp.zeros((B, P), jnp.int32)
    q = depth >> 2  # 0 => quartered budget finds nothing (matches zlib's
    #                 degenerate chain>>2 == 0 case for depth < 4)
    init = (z, jnp.zeros((B, P), jnp.bool_))
    U = 4  # partial unroll: the loop carry (packed + frozen, ~2.5 MB)
    #        round-trips HBM once per fori step; U steps per iteration
    #        cut that churn U-fold at modest compile cost
    if q % U == 0 and (depth - q) % U == 0 and q >= U:

        def stepU1(jq, st):
            for u in range(U):
                st = step(jq * U + u + 1, st)
            return st

        def stepU2(jq, st):
            for u in range(U):
                st = step(q + jq * U + u + 1, st)
            return st

        packed32, frozen32 = lax.fori_loop(0, q // U, stepU1, init)
        packed, _ = lax.fori_loop(
            0, (depth - q) // U, stepU2, (packed32, frozen32)
        )
    else:
        packed32, frozen32 = lax.fori_loop(1, q + 1, step, init)
        packed, _ = lax.fori_loop(
            q + 1, depth + 1, step, (packed32, frozen32)
        )
    keep = (packed >> 16) >= MIN_MATCH
    keep32 = (packed32 >> 16) >= MIN_MATCH
    return (
        jnp.where(keep, packed, 0),
        jnp.where(keep32, packed32, 0),
    )


@functools.partial(
    jax.jit, static_argnames=("depth", "nice", "w_g", "precise")
)
def build_match_tables(
    words4, n_valid, ins_from, *, depth: int, nice: int, w_g: int = 16,
    bytes_arr=None, precise: bool = False,
):
    """Per-position zlib longest_match summaries for a batch of chunks.

    words4: uint32[B, W] aligned words (>= 2 zero pad words at the tail).
    n_valid/ins_from: int32[B] — positions [ins_from, n_valid) are
    chain-inserted (the deflate_slow invariant); candidates are walked
    newest-first within the 15-bit rolling-hash group. `bytes_arr`
    (uint8[B, L], the same data bytewise) enables the cheap slice-based
    unaligned-word construction.

    Returns (tab_full, tab_quart): int32[B, 4W], position-indexed packed
    (len << 16 | dist) results for budget `depth` and `depth >> 2`
    (0 where the walk finds nothing). len is capped at 4 * w_g.
    """
    B, W = words4.shape
    P = 4 * W
    cap_g = 4 * w_g

    if bytes_arr is not None:
        U = _unaligned_words_from_bytes(bytes_arr, P)
    else:
        U = _unaligned_words(words4)
    pos = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], (B, P))

    # zlib's rolling 3-byte hash, evaluated directly (deflate_kernel.hash_at)
    h = (
        ((U & jnp.uint32(0xFF)) << 10)
        ^ (((U >> 8) & jnp.uint32(0xFF)) << 5)
        ^ ((U >> 16) & jnp.uint32(0xFF))
    ).astype(jnp.int32) & (HSIZE - 1)

    # uint32 keys; non-inserted rows get hash field 0x8000 (> any real
    # 15-bit hash) and KEEP their position field, so the back-sort keyed
    # by position alone is a complete permutation landing every result at
    # its absolute position — the r4 per-row roll alignment stage (part
    # of the 2.4 ms prep/align fusion) disappears entirely.
    real = (pos >= ins_from[:, None]) & (pos < n_valid[:, None])
    key = jnp.where(
        real,
        (h.astype(jnp.uint32) << 16) | pos.astype(jnp.uint32),
        jnp.uint32(0x8000 << 16) | pos.astype(jnp.uint32),
    )

    # suffix words ride the sort: payload w = U shifted by 4w bytes
    Upad = jnp.pad(U, ((0, 0), (0, cap_g)))
    payloads = [Upad[:, 4 * w : 4 * w + P].astype(jnp.int32) for w in range(w_g)]

    sorted_ops = lax.sort([key] + payloads, dimension=1, num_keys=1)
    ks = sorted_ops[0]
    G = sorted_ops[1:]

    packed, packed32 = _compare_stage_xla(
        ks, list(G), n_valid, depth=depth, nice=nice, w_g=w_g,
        precise=precise,
    )

    # undo the permutation: one more sort keyed by position (unique per
    # row, real or not), landing row p at index p directly
    back = lax.sort(
        [(ks & jnp.uint32(0xFFFF)).astype(jnp.int32), packed, packed32],
        dimension=1,
        num_keys=1,
    )
    return back[1], back[2]


# ---------------------------------------------------------------------------
# hop tables: the lazy chain itself, vectorized
# ---------------------------------------------------------------------------

def _shift_fwd(x, k, P):
    """y[p] = x[p + k] (zero fill past the end); k is a traced scalar."""
    xp = jnp.pad(x, ((0, 0), (0, x.shape[1])))
    return lax.dynamic_slice_in_dim(xp, k, P, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "nice", "good", "max_lazy", "w_g", "precise"),
)
def build_hop_tables(
    words4, n_valid, ins_from, *,
    depth: int, nice: int, good: int, max_lazy: int, w_g: int = 8,
    bytes_arr=None, precise: bool = False,
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
        words4, n_valid, ins_from, depth=depth, nice=nice, w_g=w_g,
        bytes_arr=bytes_arr, precise=precise,
    )
    Mf, Df = tabf >> 16, tabf & 0xFFFF

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
        # shift the PACKED tables (2 sliced streams instead of 4) and
        # unpack in-register; nice_eff at p + k is computed from the
        # position directly instead of shifting a third array
        plen, pdist, h, alive = st
        tf = _shift_fwd(tabf, k, P)
        tq = _shift_fwd(tabq, k, P)
        quart = plen >= good
        t = jnp.where(quart, tq, tf)
        cand = t >> 16
        cdist = t & 0xFFFF
        ne = jnp.minimum(
            jnp.int32(nice), jnp.clip(n_valid[:, None] - (pos + k), 0, MAX_MATCH)
        )
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

    # max_lazy is static and small (<= 13 hops at level 6): a python-level
    # unroll lets XLA fuse the whole chain into one pass instead of
    # round-tripping the 4-array carry through HBM per fori step
    st = (plen, pdist, h, alive)
    for k in range(1, max_lazy - MIN_MATCH + 1):
        st = hop(k, st)
    plen, pdist, h, _ = st
    match_ent = (jnp.int32(1) << 30) | (h << 23) | (plen << 16) | pdist
    # literal slots carry the DELTA to the next match stop (>= 1, < 2^30)
    # instead of 0: the parse kernel crosses a whole literal run in ONE
    # SMEM read, deleting the per-literal sprint iteration (~20 ns/byte of
    # pure loop floor). Computed as a reverse running-min of stop
    # positions; runs with no following stop jump past the end (the
    # kernel's i < n_valid guard stops them).
    stoppos = jnp.where(is_lit, jnp.int32(2 * P), pos)
    ns = lax.cummin(stoppos, axis=1, reverse=True)
    htab = jnp.where(is_lit, ns - pos, match_ent)
    return htab
