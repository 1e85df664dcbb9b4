"""Pallas TPU kernel: sequential LZ77 scan (hash-chain match + parse) of
one chunk per grid step, every operand SMEM-resident.

The XLA matcher pays the HBM gather tax (~10ns per gathered element, ~40
elements per input byte — the measured reason the device encode sat at
~1 MB/s/chip). This kernel runs the classic hash-chain scan — the
reference's deflate_fast/slow loop (zlib-rs/src/deflate/algorithm/fast.rs,
slow.rs; longest_match.rs with the anchored-byte early reject,
longest_match.rs:38-51) — on the TensorCore scalar unit with the whole
working set in SMEM (chip-measured ~5.3ns per dependent scalar load;
scalar VMEM access is unsupported, experiments/probe_scalar.py):

  * input bytes as packed LE32 words (any 32-bit window = 2 loads),
  * a 2^14-entry hash head table,
  * the prev chain packed two u16 positions per word (NIL = 0xFFFF),
  * the PARSE emitted as a compact match stream (position + len/dist) —
    literals are implicit gaps, so the stream caps at CAP_M entries and
    an overflowing (pathological) chunk flags `bad` for an exact-engine
    fallback.

Chunk buffers are limited to <= 65024 bytes (dict prefix + data) so
positions fit the packed u16 chain. Downstream (tree build + bit packing)
stays on the XLA path via the positional-array wrapper `lz_scan_pallas`.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HASH_BITS = 15  # zlib's hash_bits: 3-byte rolling hash, 32K heads
HSIZE = 1 << HASH_BITS
MIN_MATCH = 3
MAX_MATCH = 258
MAX_DIST = 32768
CAP_M = 12288  # max matches per chunk; >= this flags bad (degrades the
#                chunk to an all-literal parse). A 32 KiB data span can
#                emit at most 32768/3 = 10923 matches, so real chunks
#                never trip this; the bound exists for oversized custom
#                chunk configs and SMEM budgeting (r5: the interleaved
#                chase keeps K chunks' streams resident at once)
MAX_BUF = 65024  # dict + data ceiling (u16 chain positions, 0xFFFF = NIL)

# zlib's CONFIGURATION_TABLE (good, max_lazy, nice, chain) — the scan
# reproduces deflate_slow's decision rules, so the knobs map 1:1
# (reference: zlib-rs/src/deflate/algorithm/mod.rs:69-82)
ZLIB_CONFIG = {
    1: (4, 4, 8, 4),
    2: (4, 5, 16, 8),
    3: (4, 6, 32, 32),
    4: (4, 4, 16, 16),
    5: (8, 16, 32, 32),
    6: (8, 16, 128, 128),
    7: (8, 32, 128, 256),
    8: (32, 128, 258, 1024),
    9: (32, 258, 258, 4096),
}


def _kernel(meta_ref, words_ref, mpos_ref, mld_ref, st_ref, head, prev):
    _U1 = jnp.uint32(1)
    n_valid = meta_ref[0, 0, 0]
    start = meta_ref[0, 0, 1]
    ins_from = meta_ref[0, 0, 2]
    depth = meta_ref[0, 0, 3]
    nice = meta_ref[0, 0, 4]
    good = meta_ref[0, 0, 5]
    max_lazy = meta_ref[0, 0, 6]

    def get32(p):
        wi = p >> 2
        sh = ((p & 3) << 3).astype(jnp.uint32)
        w0 = words_ref[0, 0, wi]
        w1 = words_ref[0, 0, wi + 1]
        return jnp.where(sh > 0, (w0 >> sh) | (w1 << (jnp.uint32(32) - sh)), w0)

    def byte_at(p):
        w = words_ref[0, 0, p >> 2]
        return (w >> ((p & 3) << 3).astype(jnp.uint32)) & jnp.uint32(0xFF)

    def hash_at(i):
        # zlib's 3-byte rolling hash evaluated directly: after inserting
        # b0,b1,b2 with h = ((h << 5) ^ b) the accumulated value is
        # (b0 << 10) ^ (b1 << 5) ^ b2, masked to hash_bits
        # (deflate.rs hash_calc.rs RollHashCalc semantics)
        w = get32(i)
        h = (
            ((w & jnp.uint32(0xFF)) << jnp.uint32(10))
            ^ (((w >> jnp.uint32(8)) & jnp.uint32(0xFF)) << jnp.uint32(5))
            ^ ((w >> jnp.uint32(16)) & jnp.uint32(0xFF))
        )
        return (h & jnp.uint32(HSIZE - 1)).astype(jnp.int32)

    def prev_set(i, v):
        v16 = jnp.where(v < 0, jnp.uint32(0xFFFF), v.astype(jnp.uint32))
        wi = i >> 1
        w = prev[0, wi]
        prev[0, wi] = jnp.where(
            (i & 1) > 0,
            (w & jnp.uint32(0xFFFF)) | (v16 << jnp.uint32(16)),
            (w & jnp.uint32(0xFFFF0000)) | v16,
        )

    def prev_get(p):
        w = prev[0, p >> 1]
        v = jnp.where((p & 1) > 0, w >> jnp.uint32(16), w) & jnp.uint32(0xFFFF)
        return jnp.where(v == jnp.uint32(0xFFFF), -1, v.astype(jnp.int32))

    def insert(i):
        h = hash_at(i)
        prev_set(i, head[0, h])
        head[0, h] = i

    def zh(i, _):
        head[0, i] = -1
        return 0

    lax.fori_loop(0, HSIZE, zh, 0)

    def pre_ins(i, _):
        insert(i)
        return 0

    lax.fori_loop(ins_from, start, pre_ins, 0)

    def match_len(i, cand, cap):
        def mcond(st):
            k, go = st
            return go & (k < cap)

        def mbody(st):
            k, _go = st
            eq = get32(i + k) == get32(cand + k)
            return jnp.where(eq, k + 4, k), eq

        k, _ = lax.while_loop(mcond, mbody, (jnp.int32(0), True))
        k = jnp.minimum(k, cap)
        x = get32(i + k) ^ get32(cand + k)
        t0 = (x & jnp.uint32(0xFF)) == 0
        t1 = t0 & ((x & jnp.uint32(0xFFFF)) == 0)
        t2 = t1 & ((x & jnp.uint32(0xFFFFFF)) == 0)
        tail = t0.astype(jnp.int32) + t1.astype(jnp.int32) + t2.astype(jnp.int32)
        return jnp.minimum(k + jnp.where(x == 0, 0, tail), cap)

    def best_match(i, cand0, plen_in):
        """zlib's longest_match, decision-for-decision: best_len starts at
        the pending match length, the chain budget quarters ONCE at entry
        when the pending match is already good (longest_match.rs:76-79),
        every visited candidate costs one budget unit, and the walk stops
        at nice_match. Returns (len, dist) only when strictly better than
        the pending match, else (0, 0); the TOO_FAR demotion (a len-3
        match further than 4096 back) also returns (0, 0).

        Structure: most candidates die on the anchored-byte reject
        (longest_match.rs:38-51), so they burn through a SKIP-SPRINT
        whose whole cost is the anchor load in the loop condition plus a
        prev-chain step (~4 ops) — the full extension (match_len + best
        update) runs once per anchor-passing candidate in the outer body.
        Same candidates visited, same budget accounting, same results as
        the flat walk; only the per-rejected-candidate op count changes
        (the decode kernel's sprint lesson: the scalar unit is
        issue-bound, experiments/bench_ilk.py)."""
        cap = jnp.minimum(n_valid - i, MAX_MATCH)
        nice_eff = jnp.minimum(nice, cap)
        budget = jnp.where(plen_in >= good, depth >> 2, depth)
        bl0 = plen_in

        def alive(cand, d, bl):
            return (cand >= 0) & (i - cand <= MAX_DIST) & (d < budget) & (
                bl < nice_eff
            )

        def sk_cond(st):
            cand, d, bl, _bd, endb = st
            return alive(cand, d, bl) & (byte_at(cand + bl) != endb)

        def sk_body(st):
            cand, d, bl, bd, endb = st
            return prev_get(cand), d + 1, bl, bd, endb

        def w_cond(st):
            cand, d, bl, _bd, _eb = st
            return alive(cand, d, bl)

        def w_body(st):
            st = lax.while_loop(sk_cond, sk_body, st)
            cand, d, bl, bd, endb = st

            def extend(st2):
                cand, d, bl, bd, endb = st2
                ml = match_len(i, cand, cap)
                better = ml > bl
                nbl = jnp.where(better, ml, bl)
                return (
                    prev_get(cand),
                    d + 1,
                    nbl,
                    jnp.where(better, i - cand, bd),
                    jnp.where(
                        better, byte_at(i + jnp.minimum(ml, cap - 1)), endb
                    ),
                )

            return lax.cond(alive(cand, d, bl), extend, lambda s: s, st)

        _c, _d, bl, bd, _eb = lax.while_loop(
            w_cond,
            w_body,
            (cand0, jnp.int32(0), bl0, jnp.int32(0), byte_at(i + bl0)),
        )
        found = bl > bl0
        reject = (
            ~found
            | (bl < MIN_MATCH)
            | ((bl == MIN_MATCH) & (bd > 4096))
        )
        return jnp.where(reject, 0, bl), jnp.where(reject, 0, bd)

    def emit(mc, pos, mlen, mdist, do_it, b):
        # branchless append: dead writes land in the CAP_M.. slack slots.
        # dist is stored as dist-1 so the full legal range 1..32768 fits
        # the 15-bit field (dist=32768 would otherwise wrap to 0)
        slot = jnp.where(do_it & (mc < CAP_M), mc, CAP_M)
        mpos_ref[0, 0, slot] = pos
        mld_ref[0, 0, slot] = (
            (mlen - MIN_MATCH).astype(jnp.uint32) << jnp.uint32(15)
        ) | (mdist - 1).astype(jnp.uint32)
        b = b | (do_it & (mc >= CAP_M))
        return mc + do_it.astype(jnp.int32), b

    def ins_span(frm, to):
        # insert positions [frm, to) (match interiors), bounded
        hi = jnp.minimum(to, n_valid)

        def one(j, _):
            insert(j)
            return 0

        lax.fori_loop(frm, hi, one, 0)

    def cond(st):
        iw, _pl_, _pd, _avail, _mc, b = st
        return (iw[0] < n_valid) & ~b

    def body(st):
        iw, plen, pdist, avail, mc, b = st
        i = iw[0]
        h = hash_at(i)
        cand0 = head[0, h]
        prev_set(i, cand0)
        head[0, h] = i
        # deflate_slow's max_lazy rule: a pending match at least max_lazy
        # long skips the search entirely (the single biggest walk saver)
        do_search = (~avail | (plen < max_lazy)) & (cand0 >= 0)
        blen, bdist = lax.cond(
            do_search,
            lambda a: best_match(*a),
            lambda a: (jnp.int32(0), jnp.int32(0)),
            (i, cand0, jnp.where(avail, plen, 0)),
        )

        # one-step lazy (deflate_slow's deferral): a pending match at i-1
        # is emitted unless this position matches strictly longer
        # (best_match returns 0 unless it beat plen)
        emit_prev = avail & (blen == 0) & (plen >= MIN_MATCH)
        mc, b = emit(mc, i - 1, plen, pdist, emit_prev, b)

        @pl.when(emit_prev)
        def _():
            # insert interiors; i itself was inserted at the top
            ins_span(i + 1, i - 1 + plen)

        new_avail = jnp.where(emit_prev, False, blen >= MIN_MATCH)
        nxt = jnp.where(emit_prev, i - 1 + plen, i + 1)
        new_plen = jnp.where(new_avail, blen, 0)
        new_pdist = jnp.where(new_avail, bdist, 0)
        return nxt[None], new_plen, new_pdist, new_avail, mc, b

    iw, plen, pdist, avail, mc, b = lax.while_loop(
        cond,
        body,
        (
            start[None],
            jnp.int32(0),
            jnp.int32(0),
            jnp.bool_(False),
            jnp.int32(0),
            jnp.bool_(False),
        ),
    )
    i = iw[0]
    # flush a pending match at i-1 (it may extend past n_valid: trim)
    fits = avail & (plen >= MIN_MATCH) & (i - 1 + plen <= n_valid)
    mc, b = emit(mc, i - 1, plen, pdist, fits, b)
    st_ref[0, 0, 0] = mc
    st_ref[0, 0, 1] = b.astype(jnp.int32)
    st_ref[0, 0, 2] = 0
    st_ref[0, 0, 3] = 0


def _make_kernel_tab(cap_g: int):
    """Table-driven parse kernel: the deflate_slow decision loop with the
    hash-chain walk REPLACED by reads of the ops/lzvec precomputed
    longest_match tables (the round-4 encode vectorization: candidate
    compares run on the VPU in sorted hash space; the scalar unit keeps
    only the one-step-lazy parse, ~20 ops per emitted symbol instead of
    a ~300-op chain walk per position).

    tabf/tabq are packed (len << 16 | dist) for the full and quartered
    chain budgets, indexed by (position - start); len is capped at cap_g
    bytes, and the kernel extends cap-hitting winners byte-exactly
    against the SMEM words (only real long matches pay).
    """

    def kernel(meta_ref, words_ref, tabf_ref, tabq_ref, mpos_ref, mld_ref,
               st_ref):
        n_valid = meta_ref[0, 0, 0]
        start = meta_ref[0, 0, 1]
        nice = meta_ref[0, 0, 4]
        good = meta_ref[0, 0, 5]
        max_lazy = meta_ref[0, 0, 6]

        def get32(p):
            wi = p >> 2
            sh = ((p & 3) << 3).astype(jnp.uint32)
            w0 = words_ref[0, 0, wi]
            w1 = words_ref[0, 0, wi + 1]
            return jnp.where(
                sh > 0, (w0 >> sh) | (w1 << (jnp.uint32(32) - sh)), w0
            )

        def extend(i, blen, dist, cap):
            """Byte-exact continuation of a table-capped match."""

            def mcond(st):
                k, go = st
                return go & (k < cap)

            def mbody(st):
                k, _go = st
                eq = get32(i + k) == get32(i - dist + k)
                return jnp.where(eq, k + 4, k), eq

            k, _ = lax.while_loop(mcond, mbody, (blen, True))
            k = jnp.minimum(k, cap)
            x = get32(i + k) ^ get32(i - dist + k)
            t0 = (x & jnp.uint32(0xFF)) == 0
            t1 = t0 & ((x & jnp.uint32(0xFFFF)) == 0)
            t2 = t1 & ((x & jnp.uint32(0xFFFFFF)) == 0)
            tail = t0.astype(jnp.int32) + t1.astype(jnp.int32) + t2.astype(jnp.int32)
            return jnp.minimum(k + jnp.where(x == 0, 0, tail), cap)

        def table_match(i, plen_in, want):
            """Branch-free longest_match summary from the tables (the
            10-15ns a lax.cond costs per position is the dominant tax at
            this op count). Extension of cap-hitting winners is DEFERRED
            to emit time — once per emitted match, not per position; the
            lazy compare then sees the capped pending length, a tie rule
            noise the cap already implies."""
            cap = jnp.minimum(n_valid - i, MAX_MATCH)
            nice_eff = jnp.minimum(nice, cap)
            t = jnp.where(
                plen_in >= good, tabq_ref[0, 0, i - start], tabf_ref[0, 0, i - start]
            )
            m = jnp.minimum(t >> 16, cap)
            d = t & 0xFFFF
            found = want & (plen_in < nice_eff) & (m > plen_in)
            reject = ~found | (m < MIN_MATCH) | ((m == MIN_MATCH) & (d > 4096))
            return jnp.where(reject, 0, m), jnp.where(reject, 0, d)

        def emit(mc, pos, mlen, mdist, do_it, b):
            slot = jnp.where(do_it & (mc < CAP_M), mc, CAP_M)
            mpos_ref[0, 0, slot] = pos
            mld_ref[0, 0, slot] = (
                (mlen - MIN_MATCH).astype(jnp.uint32) << jnp.uint32(15)
            ) | (mdist - 1).astype(jnp.uint32)
            b = b | (do_it & (mc >= CAP_M))
            return mc + do_it.astype(jnp.int32), b

        def cond(st):
            iw, _pl, _pd, _avail, _mc, b = st
            return (iw[0] < n_valid) & ~b

        def byte_at(p):
            w = words_ref[0, 0, p >> 2]
            return (
                (w >> ((p & 3) << 3).astype(jnp.uint32)) & jnp.uint32(0xFF)
            ).astype(jnp.int32)

        def emit_ext(mc, pos, mlen, mdist, do_it, b):
            """Emit with cap-extension: a pending match that maxed the
            table cap is continued byte-exactly before it lands in the
            stream (one cond per EMITTED match — ~2.9K/chunk, not 32K).
            Also folds the symbol histogram (the separate freq kernel's
            whole reason to exist) into the same walk. Since lzvec's
            default lengths are word-granular beyond the first word,
            every emitted match is extended, not just cap-hitters."""
            mlen = lax.cond(
                do_it,
                lambda a: extend(
                    a[0], a[1], a[2],
                    jnp.minimum(n_valid - a[0], MAX_MATCH),
                ),
                lambda a: a[1],
                (pos, mlen, mdist),
            )
            mc, b = emit(mc, pos, mlen, mdist, do_it, b)
            return mc, b, mlen

        def body(st):
            iw, plen, pdist, avail, mc, b = st
            i = iw[0]

            # LITERAL SPRINT: with no pending match, a position whose
            # full-budget table entry is 0 is a literal outright (the
            # quartered prefix is a subset, so its entry is 0 too) — run
            # them through a dedicated loop whose whole cost is the
            # condition (folding the symbol histogram in here was
            # chip-measured a net LOSS vs the tight separate freq kernel)
            def sp_cond(p):
                return (
                    ~avail & (p < n_valid) & (tabf_ref[0, 0, p - start] == 0)
                )

            i = lax.while_loop(sp_cond, lambda p: p + 1, i)

            do_search = ~avail | (plen < max_lazy)
            blen, bdist = table_match(
                i, jnp.where(avail, plen, 0), do_search
            )
            emit_prev = avail & (blen == 0) & (plen >= MIN_MATCH)
            mc, b, plen_e = emit_ext(mc, i - 1, plen, pdist, emit_prev, b)
            new_avail = jnp.where(emit_prev, False, blen >= MIN_MATCH)
            nxt = jnp.where(emit_prev, i - 1 + plen_e, i + 1)
            new_plen = jnp.where(new_avail, blen, 0)
            new_pdist = jnp.where(new_avail, bdist, 0)
            return nxt[None], new_plen, new_pdist, new_avail, mc, b

        iw, plen, pdist, avail, mc, b = lax.while_loop(
            cond,
            body,
            (
                start[None],
                jnp.int32(0),
                jnp.int32(0),
                jnp.bool_(False),
                jnp.int32(0),
                jnp.bool_(False),
            ),
        )
        i = iw[0]
        fits = avail & (plen >= MIN_MATCH) & (i - 1 + plen <= n_valid)
        mc, b, _pl = emit_ext(mc, i - 1, plen, pdist, fits, b)

        st_ref[0, 0, 0] = mc
        st_ref[0, 0, 1] = b.astype(jnp.int32)
        st_ref[0, 0, 2] = 0
        st_ref[0, 0, 3] = 0

    return kernel


def _make_kernel_hop(cap_g: int):
    """Pointer-chase parse kernel over ops/lzvec HOP tables.

    With the lazy deferral chain precomputed on the VPU
    (lzvec.build_hop_tables) AND literal runs pre-measured (literal table
    slots hold the delta to the next match stop), the scalar pass is ONE
    iteration per emitted match: read the delta, land on the match entry,
    extend the table-granular length byte-exactly, emit, jump. The
    per-literal sprint ITERATION (~20 ns/byte of pure loop floor — the
    dominant chase cost through round 4) is gone; the literal histogram
    is counted WORD-WISE over each run span (4 bytes per loop iteration;
    exact — a VPU all-bytes approximation was measured at 1.056x zlib-6
    on the bench corpus and rejected)."""

    def kernel(meta_ref, words_ref, htab_ref, mpos_ref, mld_ref, st_ref,
               freq_ref):
        n_valid = meta_ref[0, 0, 0]
        start = meta_ref[0, 0, 1]

        def zf(i, _):
            freq_ref[0, 0, i] = 0
            return 0

        lax.fori_loop(0, 4 * 320, zf, 0)

        def get32(p):
            wi = p >> 2
            sh = ((p & 3) << 3).astype(jnp.uint32)
            w0 = words_ref[0, 0, wi]
            w1 = words_ref[0, 0, wi + 1]
            return jnp.where(
                sh > 0, (w0 >> sh) | (w1 << (jnp.uint32(32) - sh)), w0
            )

        def extend(i, blen, dist, cap):
            def mcond(st):
                k, go = st
                return go & (k < cap)

            def mbody(st):
                k, _go = st
                eq = get32(i + k) == get32(i - dist + k)
                return jnp.where(eq, k + 4, k), eq

            k, _ = lax.while_loop(mcond, mbody, (blen, True))
            k = jnp.minimum(k, cap)
            x = get32(i + k) ^ get32(i - dist + k)
            t0 = (x & jnp.uint32(0xFF)) == 0
            t1 = t0 & ((x & jnp.uint32(0xFFFF)) == 0)
            t2 = t1 & ((x & jnp.uint32(0xFFFFFF)) == 0)
            tail = t0.astype(jnp.int32) + t1.astype(jnp.int32) + t2.astype(jnp.int32)
            return jnp.minimum(k + jnp.where(x == 0, 0, tail), cap)

        def emit(mc, pos, mlen, mdist, do_it, b):
            slot = jnp.where(do_it & (mc < CAP_M), mc, CAP_M)
            mpos_ref[0, 0, slot] = pos
            mld_ref[0, 0, slot] = (
                (mlen - MIN_MATCH).astype(jnp.uint32) << jnp.uint32(15)
            ) | (mdist - 1).astype(jnp.uint32)
            b = b | (do_it & (mc >= CAP_M))
            return mc + do_it.astype(jnp.int32), b

        def cond(st):
            iw, _mc, b = st
            return (iw[0] < n_valid) & ~b

        def count_span(frm, to):
            """Literal histogram over [frm, to), 4 bytes per iteration
            (unaligned word read + 4 histogram bumps; bytes past `to`
            land in dead slot 319, which nothing downstream reads)."""

            def wcond(p):
                return p < to

            def wbody(p):
                w = get32(p)
                rem = to - p
                s0 = (w & jnp.uint32(0xFF)).astype(jnp.int32)
                s1 = jnp.where(
                    rem >= 2,
                    ((w >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(jnp.int32),
                    319,
                ) + 320
                s2 = jnp.where(
                    rem >= 3,
                    ((w >> jnp.uint32(16)) & jnp.uint32(0xFF)).astype(jnp.int32),
                    319,
                ) + 640
                s3 = jnp.where(
                    rem >= 4,
                    (w >> jnp.uint32(24)).astype(jnp.int32),
                    319,
                ) + 960
                freq_ref[0, 0, s0] = freq_ref[0, 0, s0] + 1
                freq_ref[0, 0, s1] = freq_ref[0, 0, s1] + 1
                freq_ref[0, 0, s2] = freq_ref[0, 0, s2] + 1
                freq_ref[0, 0, s3] = freq_ref[0, 0, s3] + 1
                return p + 4

            lax.while_loop(wcond, wbody, frm)

        def body(st):
            iw, mc, b = st
            i0 = iw[0]

            # literal-run delta: table slots at literal positions hold the
            # distance to the next match stop, so the whole run costs one
            # SMEM read; a match entry (bit 30) is its own stop
            ht = htab_ref[0, 0, i0 - start]
            is_m = (ht >> 30) > 0
            # clamp: a run with no following stop jumps to 2*P (clamping
            # here keeps every subsequent speculative read in bounds)
            i = jnp.where(is_m, i0, jnp.minimum(i0 + ht, n_valid))
            ht = jnp.where(
                is_m, ht, htab_ref[0, 0, jnp.minimum(i, n_valid - 1) - start]
            )
            do = i < n_valid
            h = (ht >> 23) & 0x7F
            mlen = (ht >> 16) & 0x7F
            dist = ht & 0xFFFF
            ip = i + h
            # run literals [i0, i) plus deferred literals [i, ip) are one
            # contiguous span; when the jump ran off the end the tail
            # [i0, n_valid) is all literals
            count_span(i0, jnp.where(do, ip, n_valid))
            # recover the byte-exact length: cap-hitting winners walk the
            # full word extension (rare, cond'ed); every other granular
            # length is short of the truth by AT MOST the sub-word tail
            # of its first unequal word — one branchless xor+tail, no
            # loop (running the full extend per match measured +1.7 ms
            # per batch)
            mlen = lax.cond(
                do & (mlen == cap_g),
                lambda a: extend(
                    a[0], a[1], a[2], jnp.minimum(n_valid - a[0], MAX_MATCH)
                ),
                lambda a: a[1],
                (ip, mlen, dist),
            )
            # clamp the source read: when do is False the fields are
            # garbage and ip - dist could go negative (result discarded)
            xt = get32(ip + mlen) ^ get32(jnp.maximum(ip - dist + mlen, 0))
            t0 = (xt & jnp.uint32(0xFF)) == 0
            t1 = t0 & ((xt & jnp.uint32(0xFFFF)) == 0)
            t2 = t1 & ((xt & jnp.uint32(0xFFFFFF)) == 0)
            tail = (
                t0.astype(jnp.int32) + t1.astype(jnp.int32)
                + t2.astype(jnp.int32)
            )
            mlen = jnp.minimum(
                mlen + tail, jnp.minimum(n_valid - ip, MAX_MATCH)
            )
            mc, b = emit(mc, ip, mlen, dist, do, b)
            # len/dist symbol counts come from a VPU pass over the compact
            # match stream (scan_chunks_hop_pallas) — ~24 ALU ops per
            # match deleted from this issue-bound loop
            nxt = jnp.where(do, ip + mlen, n_valid)
            return nxt[None], mc, b

        iw, mc, b = lax.while_loop(
            cond, body, (start[None], jnp.int32(0), jnp.bool_(False))
        )

        @pl.when(b)
        def _():
            # overflow lane degrades to an all-literal parse downstream —
            # recount so the histogram matches that parse
            lax.fori_loop(0, 320, zf, 0)
            count_span(start, n_valid)

        st_ref[0, 0, 0] = mc
        st_ref[0, 0, 1] = b.astype(jnp.int32)
        st_ref[0, 0, 2] = 0
        st_ref[0, 0, 3] = 0

    return kernel



def _make_kernel_hop_il(cap_g: int, K: int):
    """K-way CROSS-CHUNK interleaved hop chase (r5).

    The single-lane chase measured ~73 ns per emitted match — latency-
    bound, not issue-bound (the body is ~25 ops): each iteration's two
    dependent SMEM loads plus the loop machinery dominate. The fix is the
    probe_ilp lesson (8 interleaved SMEM chases run at 1.3 ns/step vs 6.6
    serial): one grid step drives K chunks' INDEPENDENT chase chains in
    lockstep, so their load latencies overlap. (This is the opposite call
    from the decode kernel, whose K-interleave LOST — that loop is
    issue-bound, experiments/inflate_ilk.py.)

    Phase 1 chases matches only (one iteration per match, K lanes
    predicated). Phase 2 replays the literal spans from the emitted match
    stream and counts the literal histogram word-wise, again K lanes in
    lockstep — span TOTALS balance across chunks, so lane waste stays
    small where a per-run lockstep would straggle.
    """

    def kernel(meta_ref, words_ref, htab_ref, mpos_ref, mld_ref, st_ref,
               freq_ref):
        nv = [meta_ref[0, k, 0] for k in range(K)]
        st0 = [meta_ref[0, k, 1] for k in range(K)]

        def zf(i, _):
            for k in range(K):
                freq_ref[0, k, i] = 0
            return 0

        lax.fori_loop(0, 4 * 320, zf, 0)

        def get32(k, p):
            wi = p >> 2
            sh = ((p & 3) << 3).astype(jnp.uint32)
            w0 = words_ref[0, k, wi]
            w1 = words_ref[0, k, wi + 1]
            return jnp.where(
                sh > 0, (w0 >> sh) | (w1 << (jnp.uint32(32) - sh)), w0
            )

        # ---- phase 1: K predicated match chases ------------------------
        def p1_cond(s):
            iv, _mc, bv = s
            alive = (iv[0] < nv[0]) & ~bv[0]
            for k in range(1, K):
                alive = alive | ((iv[k] < nv[k]) & ~bv[k])
            return alive

        def p1_body(s):
            iv, mcv, bv = s
            act, i1, ht2 = [], [], []
            # stage A: delta-jump (each lane: load, jump, reload)
            for k in range(K):
                a = (iv[k] < nv[k]) & ~bv[k]
                i0c = jnp.minimum(iv[k], nv[k] - 1)
                ht = htab_ref[0, k, i0c - st0[k]]
                is_m = (ht >> 30) > 0
                ii = jnp.where(is_m, iv[k], jnp.minimum(iv[k] + ht, nv[k]))
                h2 = jnp.where(
                    is_m, ht,
                    htab_ref[0, k, jnp.minimum(ii, nv[k] - 1) - st0[k]],
                )
                act.append(a)
                i1.append(ii)
                ht2.append(h2)
            do = [act[k] & (i1[k] < nv[k]) for k in range(K)]
            hh = [(ht2[k] >> 23) & 0x7F for k in range(K)]
            ml = [(ht2[k] >> 16) & 0x7F for k in range(K)]
            dd = [ht2[k] & 0xFFFF for k in range(K)]
            ip = [i1[k] + hh[k] for k in range(K)]
            cap = [jnp.minimum(nv[k] - ip[k], MAX_MATCH) for k in range(K)]

            # stage B: SHARED cap-extension loop — all lanes that hit the
            # table cap word-extend together; the common case (no lane
            # capped) costs one condition evaluation
            need = [do[k] & (ml[k] == cap_g) for k in range(K)]

            def e_cond(es):
                kk, al = es
                a = al[0]
                for k in range(1, K):
                    a = a | al[k]
                return a

            def e_body(es):
                kk, al = es
                nkk, nal = [], []
                for k in range(K):
                    pre = al[k] & (kk[k] < cap[k])
                    eq = get32(k, ip[k] + kk[k]) == get32(
                        k, jnp.maximum(ip[k] - dd[k] + kk[k], 0)
                    )
                    nkk.append(jnp.where(pre & eq, kk[k] + 4, kk[k]))
                    nal.append(pre & eq)
                return tuple(nkk), tuple(nal)

            kk, _ = lax.while_loop(
                e_cond, e_body, (tuple(ml), tuple(need))
            )
            ml = [
                jnp.where(need[k], jnp.minimum(kk[k], cap[k]), ml[k])
                for k in range(K)
            ]

            # stage C: branchless sub-word tail + emit + len/dist freq
            niv, nmc, nbv = [], [], []
            for k in range(K):
                xt = get32(k, ip[k] + ml[k]) ^ get32(
                    k, jnp.maximum(ip[k] - dd[k] + ml[k], 0)
                )
                t0 = (xt & jnp.uint32(0xFF)) == 0
                t1 = t0 & ((xt & jnp.uint32(0xFFFF)) == 0)
                t2 = t1 & ((xt & jnp.uint32(0xFFFFFF)) == 0)
                tail = (
                    t0.astype(jnp.int32) + t1.astype(jnp.int32)
                    + t2.astype(jnp.int32)
                )
                mlen = jnp.minimum(ml[k] + tail, cap[k])
                slot = jnp.where(do[k] & (mcv[k] < CAP_M), mcv[k], CAP_M)
                mpos_ref[0, k, slot] = ip[k]
                mld_ref[0, k, slot] = (
                    (mlen - MIN_MATCH).astype(jnp.uint32) << jnp.uint32(15)
                ) | (dd[k] - 1).astype(jnp.uint32)
                b2 = bv[k] | (do[k] & (mcv[k] >= CAP_M))
                niv.append(
                    jnp.where(
                        act[k],
                        jnp.where(do[k], ip[k] + mlen, nv[k]),
                        iv[k],
                    )
                )
                nmc.append(mcv[k] + do[k].astype(jnp.int32))
                nbv.append(b2)
            return tuple(niv), tuple(nmc), tuple(nbv)

        z = jnp.int32(0)
        iv, mcv, bv = lax.while_loop(
            p1_cond,
            p1_body,
            (
                tuple(st0[k] * 1 for k in range(K)),
                tuple(z for _ in range(K)),
                tuple(jnp.bool_(False) for _ in range(K)),
            ),
        )

        # bad lanes degrade to an all-literal parse downstream (phase 2
        # recounts their whole span as literals; len/dist counts are a
        # VPU pass outside the kernel, masked by kbad there)
        mc_eff = [jnp.where(bv[k], 0, mcv[k]) for k in range(K)]

        # ---- phase 2: literal histogram over the span structure --------
        # per lane: walk words of [prev_end, mpos_j) for every j, then the
        # final [last_end, nv) tail; 4 bytes per lane per iteration into 4
        # independent histogram banks
        def first_e(k):
            return jnp.where(
                mc_eff[k] > 0, mpos_ref[0, k, 0], nv[k]
            )

        def p2_cond(s):
            jv, pv, ev = s
            a = pv[0] < nv[0]
            for k in range(1, K):
                a = a | (pv[k] < nv[k])
            return a

        def p2_body(s):
            jv, pv, ev = s
            njv, npv, nev = [], [], []
            for k in range(K):
                a = pv[k] < nv[k]
                inspan = a & (pv[k] < ev[k])
                w = get32(k, jnp.minimum(pv[k], nv[k] - 1))
                rem = ev[k] - pv[k]
                s0 = jnp.where(
                    inspan, (w & jnp.uint32(0xFF)).astype(jnp.int32), 319
                )
                s1 = jnp.where(
                    inspan & (rem >= 2),
                    ((w >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(
                        jnp.int32
                    ),
                    319,
                ) + 320
                s2 = jnp.where(
                    inspan & (rem >= 3),
                    ((w >> jnp.uint32(16)) & jnp.uint32(0xFF)).astype(
                        jnp.int32
                    ),
                    319,
                ) + 640
                s3 = jnp.where(
                    inspan & (rem >= 4),
                    (w >> jnp.uint32(24)).astype(jnp.int32),
                    319,
                ) + 960
                freq_ref[0, k, s0] = freq_ref[0, k, s0] + 1
                freq_ref[0, k, s1] = freq_ref[0, k, s1] + 1
                freq_ref[0, k, s2] = freq_ref[0, k, s2] + 1
                freq_ref[0, k, s3] = freq_ref[0, k, s3] + 1
                p2 = jnp.where(inspan, pv[k] + 4, pv[k])
                # span exhausted: hop over match j to the next literal run
                advance = a & (p2 >= ev[k])
                jc = jnp.minimum(jv[k], CAP_M - 1)
                mp_j = mpos_ref[0, k, jc]
                ml_j = (
                    mld_ref[0, k, jc] >> jnp.uint32(15)
                ).astype(jnp.int32) + MIN_MATCH
                in_m = jv[k] < mc_eff[k]
                newp = jnp.where(in_m, mp_j + ml_j, nv[k])
                jn = jv[k] + (advance & in_m).astype(jnp.int32)
                jnc = jnp.minimum(jn, CAP_M - 1)
                nexte = jnp.where(
                    jn < mc_eff[k], mpos_ref[0, k, jnc], nv[k]
                )
                njv.append(jnp.where(advance, jn, jv[k]))
                npv.append(jnp.where(advance, newp, p2))
                nev.append(jnp.where(advance, nexte, ev[k]))
            return tuple(njv), tuple(npv), tuple(nev)

        lax.while_loop(
            p2_cond,
            p2_body,
            (
                tuple(z for _ in range(K)),
                tuple(st0[k] * 1 for k in range(K)),
                tuple(first_e(k) for k in range(K)),
            ),
        )

        for k in range(K):
            st_ref[0, k, 0] = mcv[k]
            st_ref[0, k, 1] = bv[k].astype(jnp.int32)
            st_ref[0, k, 2] = 0
            st_ref[0, k, 3] = 0

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "start", "depth", "nice", "good", "max_lazy", "w_g", "interpret",
        "precise",
    ),
)
def scan_chunks_hop_pallas(
    words4, n_valid, ins_from, *,
    start: int, depth: int, nice: int, good: int = 8, max_lazy: int = 16,
    w_g: int = 8, interpret: bool = False, bytes_arr=None,
    precise: bool = False,
):
    """Hop-table variant of scan_chunks_tab_pallas: lzvec precomputes the
    whole lazy decision chain, the kernel only chases parse successors.
    Same output contract; requires max_lazy - MIN_MATCH < 128 (true for
    zlib levels 1-8; level 9 uses the tab walk)."""
    from ...ops import lzvec

    B, W = words4.shape
    htab = lzvec.build_hop_tables(
        words4, n_valid.astype(jnp.int32), ins_from.astype(jnp.int32),
        depth=depth, nice=nice, good=good, max_lazy=max_lazy, w_g=w_g,
        bytes_arr=bytes_arr, precise=precise,
    )
    tabn = 4 * W - start
    htab = htab[:, start : start + tabn]
    meta = jnp.stack(
        [n_valid.astype(jnp.int32), jnp.full((B,), start, jnp.int32)], axis=1
    )
    meta = jnp.pad(meta, ((0, 0), (0, 6)))
    # Cross-chunk interleaving (_make_kernel_hop_il) was chip-measured
    # NEUTRAL at K=2 (1.15 ms per 2-chunk group vs 1.05 single-lane):
    # the chase body is issue-bound (~60 ops/match), not latency-bound,
    # so overlapping the lanes' SMEM chains buys nothing — the same
    # lesson as the decode kernel's K-interleave (inflate_ilk). Kept
    # selectable for re-measurement; K=1 is the shipping default.
    # (SMEM note: 1.00 MB budget; a multi-step grid double-buffers every
    # block, so K>1 groups run as single-step pallas_calls.)
    K = 2 if (B % 2 == 0 and os.environ.get("ZRS_TPU_HOP_IL") == "2") else 1
    if K == 1:
        # the shipping path: ONE grid over the whole batch (the per-group
        # single-step calls below exist for the K>1 SMEM budget; at K=1
        # they would emit B separate launches — measured 2.7s of extra
        # device wait on a 128-chunk super-batch)
        mpos, mld, st, freq = pl.pallas_call(
            _make_kernel_hop(4 * w_g),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, tabn), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, CAP_M + 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, CAP_M + 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 4 * 320), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, 1, CAP_M + 8), jnp.int32),
                jax.ShapeDtypeStruct((B, 1, CAP_M + 8), jnp.uint32),
                jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
                jax.ShapeDtypeStruct((B, 1, 4 * 320), jnp.int32),
            ],
            interpret=interpret,
        )(meta.reshape(B, 1, 8), words4.reshape(B, 1, W),
          htab.reshape(B, 1, tabn))
        mpos = mpos[:, 0]
        mld = mld[:, 0]
        st = st[:, 0]
        freq = freq[:, 0]
        return _hop_post(mpos, mld, st, freq, B)
    kern = _make_kernel_hop_il(4 * w_g, K)
    call = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, K, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, W), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, tabn), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, CAP_M + 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, CAP_M + 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, 4 * 320), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, K, CAP_M + 8), jnp.int32),
            jax.ShapeDtypeStruct((1, K, CAP_M + 8), jnp.uint32),
            jax.ShapeDtypeStruct((1, K, 8), jnp.int32),
            jax.ShapeDtypeStruct((1, K, 4 * 320), jnp.int32),
        ],
        interpret=interpret,
    )
    metaG = meta.reshape(B // K, 1, K, 8)
    wordsG = words4.reshape(B // K, 1, K, W)
    htabG = htab.reshape(B // K, 1, K, tabn)
    parts = [call(metaG[g], wordsG[g], htabG[g]) for g in range(B // K)]
    mpos = jnp.concatenate([p[0] for p in parts]).reshape(B, CAP_M + 8)
    mld = jnp.concatenate([p[1] for p in parts]).reshape(B, CAP_M + 8)
    st = jnp.concatenate([p[2] for p in parts]).reshape(B, 8)
    freq = jnp.concatenate([p[3] for p in parts]).reshape(B, 4 * 320)
    return _hop_post(mpos, mld, st, freq, B)


def _hop_post(mpos, mld, st, freq, B):
    """Shared hop-kernel post-processing: sum the 4 literal histogram
    banks, then the len/dist symbol histogram on the VPU from the compact
    match stream (deleted from the issue-bound scalar loop; kbad lanes
    contribute nothing — their parse degrades to all-literal downstream)."""
    fq = freq.reshape(B, 4 * 320)
    total_freq = (
        fq[:, :320] + fq[:, 320:640] + fq[:, 640:960] + fq[:, 960:1280]
    )
    nmatch = st[:, 0]
    kbad = st[:, 1] > 0
    ml = (mld >> jnp.uint32(15)).astype(jnp.int32) + MIN_MATCH
    dd = (mld & jnp.uint32(0x7FFF)).astype(jnp.int32) + 1
    slot = jnp.arange(CAP_M + 8, dtype=jnp.int32)[None]
    validm = slot < jnp.where(kbad, 0, nmatch)[:, None]
    lc, _eb, _ev = _len_sym(jnp.where(validm, ml, MIN_MATCH))
    dc, _db, _dv = _dist_sym(jnp.where(validm, dd, 1))
    lhist = jnp.sum(
        validm[:, :, None]
        & (lc[:, :, None] == jnp.arange(29, dtype=jnp.int32)[None, None]),
        axis=1,
        dtype=jnp.int32,
    )
    dhist = jnp.sum(
        validm[:, :, None]
        & (dc[:, :, None] == jnp.arange(30, dtype=jnp.int32)[None, None]),
        axis=1,
        dtype=jnp.int32,
    )
    total_freq = total_freq.at[:, 257:286].add(lhist)
    total_freq = total_freq.at[:, 288:318].add(dhist)
    return mpos, mld, nmatch, kbad, total_freq


@functools.partial(
    jax.jit,
    static_argnames=(
        "start", "depth", "nice", "good", "max_lazy", "w_g", "interpret",
        "precise",
    ),
)
def scan_chunks_tab_pallas(
    words4, n_valid, ins_from, *,
    start: int, depth: int, nice: int, good: int = 8, max_lazy: int = 16,
    w_g: int = 16, interpret: bool = False, precise: bool = False,
):
    """Vectorized-matcher variant of scan_chunks_pallas: ops/lzvec builds
    the per-position longest_match tables on the VPU, then the scalar
    kernel does only the one-step-lazy parse. Same output contract as
    scan_chunks_pallas; `start` (the first emittable position == dict
    bytes) must be static so the tables can be sliced to the data span.
    """
    from ...ops import lzvec

    B, W = words4.shape
    tabf, tabq = lzvec.build_match_tables(
        words4, n_valid.astype(jnp.int32), ins_from.astype(jnp.int32),
        depth=depth, nice=nice, w_g=w_g, precise=precise,
    )
    tabn = 4 * W - start
    tabf = tabf[:, start : start + tabn]
    tabq = tabq[:, start : start + tabn]
    meta = jnp.stack(
        [
            n_valid.astype(jnp.int32),
            jnp.full((B,), start, jnp.int32),
            ins_from.astype(jnp.int32),
            jnp.full((B,), depth, jnp.int32),
            jnp.full((B,), nice, jnp.int32),
            jnp.full((B,), good, jnp.int32),
            jnp.full((B,), max_lazy, jnp.int32),
        ],
        axis=1,
    )
    meta = jnp.pad(meta, ((0, 0), (0, 1))).reshape(B, 1, 8)
    words3 = words4.reshape(B, 1, W)
    mpos, mld, st = pl.pallas_call(
        _make_kernel_tab(4 * w_g),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tabn), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tabn), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, CAP_M + 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, CAP_M + 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, CAP_M + 8), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, CAP_M + 8), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
        ],
        interpret=interpret,
    )(meta, words3, tabf.reshape(B, 1, tabn), tabq.reshape(B, 1, tabn))
    return mpos[:, 0], mld[:, 0], st[:, 0, 0], st[:, 0, 1] > 0


@functools.partial(
    jax.jit, static_argnames=("depth", "nice", "good", "max_lazy", "interpret")
)
def scan_chunks_pallas(
    words4, n_valid, start, ins_from, *,
    depth: int, nice: int, good: int = 8, max_lazy: int = 16,
    interpret: bool = False,
):
    """Hash-chain scan of B chunks (grid-sequential, DMA-overlapped).

    words4: uint32[B, W] ALIGNED LE32-packed chunk bytes (>= 2 words zero
    tail padding; dict prefix + data <= MAX_BUF). n_valid: total valid
    bytes; start: first emittable position; ins_from: first hashable
    position (dict priming inserts [ins_from, start)).
    (depth, nice, good, max_lazy) are zlib's (max_chain, nice_length,
    good_length, max_lazy) level knobs — see ZLIB_CONFIG.
    Returns (mpos i32[B, CAP_M+8], mld u32[B, CAP_M+8], nmatch i32[B],
    bad bool[B]); mld packs (len-3) << 15 | (dist-1).
    """
    B, W = words4.shape
    if (W - 2) * 4 > MAX_BUF + 8:
        raise ValueError(
            f"chunk buffer {(W - 2) * 4} exceeds MAX_BUF={MAX_BUF} "
            "(positions must fit the packed u16 prev chain)"
        )
    meta = jnp.stack(
        [
            n_valid.astype(jnp.int32),
            start.astype(jnp.int32),
            ins_from.astype(jnp.int32),
            jnp.full((B,), depth, jnp.int32),
            jnp.full((B,), nice, jnp.int32),
            jnp.full((B,), good, jnp.int32),
            jnp.full((B,), max_lazy, jnp.int32),
        ],
        axis=1,
    )
    meta = jnp.pad(meta, ((0, 0), (0, 1))).reshape(B, 1, 8)
    words3 = words4.reshape(B, 1, W)
    mpos, mld, st = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, CAP_M + 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, CAP_M + 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, CAP_M + 8), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, CAP_M + 8), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1, HSIZE), jnp.int32),
            pltpu.SMEM((1, (MAX_BUF + 2) // 2), jnp.uint32),
        ],
        interpret=interpret,
    )(meta, words3)
    return mpos[:, 0], mld[:, 0], st[:, 0, 0], st[:, 0, 1] > 0


def _to_positional(mpos, mld, nmatch, L, n_valid, start):
    """Compact match stream -> positional (tok u8[L], length i32[L],
    dist i32[L]) arrays, all-XLA (scatters + one cumsum)."""
    C = mpos.shape[0]
    valid = jnp.arange(C, dtype=jnp.int32) < nmatch
    pos = jnp.where(valid, mpos, L)  # park dead entries out of range
    mlen = (mld >> jnp.uint32(15)).astype(jnp.int32) + MIN_MATCH
    mdist = (mld & jnp.uint32(0x7FFF)).astype(jnp.int32) + 1
    length = jnp.zeros((L + 1,), jnp.int32).at[pos].set(jnp.where(valid, mlen, 0), mode="drop")[:L]
    dist = jnp.zeros((L + 1,), jnp.int32).at[pos].set(jnp.where(valid, mdist, 0), mode="drop")[:L]
    # interior mask via +1/-1 deltas and a prefix sum
    delta = jnp.zeros((L + 2,), jnp.int32)
    delta = delta.at[jnp.where(valid, pos + 1, L + 1)].add(1, mode="drop")
    delta = delta.at[jnp.where(valid, pos + mlen, L + 1)].add(-1, mode="drop")
    interior = jnp.cumsum(delta[: L + 1])[:L] > 0
    idx = jnp.arange(L, dtype=jnp.int32)
    tok = (~interior) & (idx >= start) & (idx < n_valid)
    return tok.astype(jnp.uint8), length, dist


@functools.partial(
    jax.jit, static_argnames=("depth", "nice", "good", "max_lazy", "interpret")
)
def lz_scan_pallas(
    words, n_valid, start, *,
    depth: int, nice: int, good: int = 8, max_lazy: int = 16,
    interpret: bool = False,
):
    """Sequential match+parse of B chunks; positional-array API.

    words: uint32[B, L] LE32 at every byte offset (the lz77.words_le32
    layout; only the aligned stride-4 words are read). Returns
    (tokens u8[B, L], length i32[B, L], dist i32[B, L]) — a one-step-lazy
    tokenization whose spans tile [start, n_valid) exactly. Lanes whose
    match stream overflowed CAP_M return all-literal parses (callers that
    care about density should use scan_chunks_pallas and check `bad`).
    """
    B, L = words.shape
    w4 = words[:, ::4]
    pad = jnp.zeros((B, 2), jnp.uint32)
    w4 = jnp.concatenate([w4, pad], axis=1)
    mpos, mld, nmatch, bad = scan_chunks_pallas(
        w4, n_valid, start, start, depth=depth, nice=nice, good=good,
        max_lazy=max_lazy, interpret=interpret
    )
    nm_eff = jnp.where(bad, 0, nmatch)
    tok, length, dist = jax.vmap(
        lambda mp, ml, nm, nv, stt: _to_positional(mp, ml, nm, L, nv, stt)
    )(mpos, mld, nm_eff, n_valid.astype(jnp.int32), start.astype(jnp.int32))
    return tok, length, dist


@functools.partial(
    jax.jit,
    static_argnames=("depth", "nice", "good", "max_lazy", "pad", "interpret"),
)
def scan_from_bytes(
    chunks_u8, n_valid, start, ins_from, *,
    depth: int, nice: int, good: int = 8, max_lazy: int = 16,
    pad: int, interpret: bool = False,
):
    """Pipeline entry point: uint8[B, L] padded chunk buffers (dict prefix +
    data + `pad` tail zeros, L % 4 == 0) -> positional (tok, length, dist)
    of length L - pad each, via the SMEM scan kernel."""
    B, L = chunks_u8.shape
    if L % 4:
        raise ValueError("chunk buffer length must be a multiple of 4")
    b = chunks_u8.reshape(B, L // 4, 4).astype(jnp.uint32)
    w4 = b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16) | (b[:, :, 3] << 24)
    mpos, mld, nmatch, bad = scan_chunks_pallas(
        w4, n_valid, start, ins_from, depth=depth, nice=nice, good=good,
        max_lazy=max_lazy, interpret=interpret
    )
    n = L - pad
    nm_eff = jnp.where(bad, 0, nmatch)
    tok, length, dist = jax.vmap(
        lambda mp, ml, nm, nv, stt: _to_positional(mp, ml, nm, n, nv, stt)
    )(mpos, mld, nm_eff, n_valid.astype(jnp.int32), start.astype(jnp.int32))
    return tok, length, dist


# ---------------------------------------------------------------------------
# Frequency + bitstream-pack kernels: with these, the whole dynamic-Huffman
# encode path runs on the TensorCore from the scan's COMPACT match stream —
# the XLA positional stages (scatter tokenization, compare-reduce freqs,
# per-token gathers, segmented-scan packing) measured ~half of the encode
# batch and disappear. The tree build (Kraft lengths + canonical codes over
# 286+30 symbols) stays in XLA: it is tiny.
# ---------------------------------------------------------------------------


def _len_sym(mlen):
    """(length code 0..28, extra_bits, extra_val) — arithmetic, matches
    lz77.length_symbol_arith exactly."""
    v = mlen - MIN_MATCH
    vs = jnp.maximum(v, 8)
    e = (32 - lax.clz(vs)) - 3
    lc = jnp.where(v < 8, v, 4 + 4 * e + ((vs >> e) & 3))
    lc = jnp.where(v == 255, 28, lc)
    small = (v < 8) | (v == 255)
    eb = jnp.where(small, 0, e)
    ev = jnp.where(small, 0, v & ((jnp.int32(1) << jnp.maximum(e, 0)) - 1))
    return lc, eb, ev


def _dist_sym(dist):
    """(dist code 0..29, extra_bits, extra_val) — matches
    lz77.dist_symbol_arith exactly."""
    d = dist - 1
    ds = jnp.maximum(d, 4)
    e = (32 - lax.clz(ds)) - 2
    dc = jnp.where(d < 4, d, 2 * (e + 1) + ((ds >> e) & 1))
    eb = jnp.where(d < 4, 0, e)
    ev = jnp.where(d < 4, 0, d & ((jnp.int32(1) << jnp.maximum(e, 0)) - 1))
    return dc, eb, ev


def _freq_kernel(meta_ref, words_ref, mpos_ref, mld_ref, freq_ref):
    """Symbol histogram from the compact match stream: literal bytes in the
    gaps between matches + length/dist codes per match. Layout of freq_ref
    (1,1,320): ll symbols at 0..285 (EOB left to the caller), dist codes at
    288..317."""
    n_valid = meta_ref[0, 0, 0]
    start = meta_ref[0, 0, 1]
    nmatch = meta_ref[0, 0, 2]

    def byte_at(p):
        w = words_ref[0, 0, p >> 2]
        return ((w >> ((p & 3) << 3).astype(jnp.uint32)) & jnp.uint32(0xFF)).astype(
            jnp.int32
        )

    def zf(i, _):
        freq_ref[0, 0, i] = 0
        return 0

    lax.fori_loop(0, 320, zf, 0)

    def lits(frm, to):
        def one(p, _):
            b = byte_at(p)
            freq_ref[0, 0, b] = freq_ref[0, 0, b] + 1
            return 0

        lax.fori_loop(frm, to, one, 0)

    def mstep(k, pos):
        mp = mpos_ref[0, 0, k]
        ml = (mld_ref[0, 0, k] >> jnp.uint32(15)).astype(jnp.int32) + MIN_MATCH
        md = (mld_ref[0, 0, k] & jnp.uint32(0x7FFF)).astype(jnp.int32) + 1
        lits(pos, mp)
        lc, _leb, _lev = _len_sym(ml)
        dc, _deb, _dev = _dist_sym(md)
        freq_ref[0, 0, 257 + lc] = freq_ref[0, 0, 257 + lc] + 1
        freq_ref[0, 0, 288 + dc] = freq_ref[0, 0, 288 + dc] + 1
        return mp + ml

    pos = lax.fori_loop(0, nmatch, mstep, start)
    lits(pos, n_valid)


def _make_pack_kernel(with_seeds: bool):
    """Pack-kernel factory: without seeds the per-literal seed_check
    while-cond (~5 ns x every literal) compiles out entirely — the bench
    and non-indexed pipeline configuration."""

    def kernel(*refs):
        return _pack_kernel(*refs, with_seeds=with_seeds)

    return kernel


def _pack_kernel(
    meta_ref,   # i32 (1,1,8): n_valid, start, nmatch, n_seeds, seed_stride
    words_ref,  # u32 (1,1,W): chunk bytes
    mpos_ref,   # i32 (1,1,CAP_M+8)
    mld_ref,    # u32 (1,1,CAP_M+8)
    lltab_ref,  # u32 (1,1,288): canonical code | (nbits << 16)
    dtab_ref,   # u32 (1,1,32)
    owords_ref,  # u32 (1,1,OWW): packed LSB-first body bits
    st_ref,     # i32 (1,1,8): total_bits, bad
    sbit_ref,   # i32 (1,1,NS): seed body-relative bit offsets
    sout_ref,   # i32 (1,1,NS): seed chunk-relative output offsets
    tab_echo_ref,  # u32 (1,1,320): the EXACT tables this kernel consumed
    with_seeds: bool = True,
):
    # echo the consumed code tables: the caller derives the header length
    # arrays from THIS copy, so header and body agree by construction even
    # if XLA materializes divergent recomputations of the (float-tie
    # nondeterministic) Kraft builder upstream (chip-debugged round 3 —
    # optimization_barrier alone did not stop the divergence)
    def _echo(i, _):
        tab_echo_ref[0, 0, i] = lltab_ref[0, 0, jnp.minimum(i, 287)]
        return 0

    lax.fori_loop(0, 288, _echo, 0)

    def _echo_d(i, _):
        tab_echo_ref[0, 0, 288 + i] = dtab_ref[0, 0, i]
        return 0

    lax.fori_loop(0, 32, _echo_d, 0)
    n_valid = meta_ref[0, 0, 0]
    start = meta_ref[0, 0, 1]
    nmatch = meta_ref[0, 0, 2]
    n_seeds = meta_ref[0, 0, 3]
    stride = meta_ref[0, 0, 4]
    OWW = owords_ref.shape[2]
    DEADW = OWW - 1

    def byte_at(p):
        w = words_ref[0, 0, p >> 2]
        return ((w >> ((p & 3) << 3).astype(jnp.uint32)) & jnp.uint32(0xFF)).astype(
            jnp.int32
        )

    # bit accumulator in registers; one plain store per filled word
    def put(st, v, nb):
        acc, cnt, owi, b = st
        acc = acc | (v << cnt.astype(jnp.uint32))
        ncnt = cnt + nb
        spill = ncnt >= 32
        owi_st = jnp.where(spill, jnp.minimum(owi, DEADW), DEADW)
        owords_ref[0, 0, owi_st] = acc
        # nb < 32 and spill implies cnt >= 1, so 32 - cnt <= 31
        acc = jnp.where(spill, v >> (jnp.uint32(32) - cnt.astype(jnp.uint32)), acc)
        b = b | (spill & (owi >= DEADW))
        return (acc, jnp.where(spill, ncnt - 32, ncnt),
                owi + spill.astype(jnp.int32), b)

    def emit_lit(st, p):
        e = lltab_ref[0, 0, byte_at(p)]
        return put(st, e & jnp.uint32(0xFFFF), (e >> jnp.uint32(16)).astype(jnp.int32))

    def seed_check(st, p):
        # record every seed target the next token at p satisfies
        if not with_seeds:
            return st
        acc, cnt, owi, b, sidx = st

        def s_cond(s):
            return (s[4] < n_seeds) & (p >= start + s[4] * stride)

        def s_body(s):
            acc, cnt, owi, b, sidx = s
            slot = jnp.minimum(sidx, sbit_ref.shape[2] - 1)
            sbit_ref[0, 0, slot] = owi * 32 + cnt
            sout_ref[0, 0, slot] = p - start
            return acc, cnt, owi, b, sidx + 1

        return lax.while_loop(s_cond, s_body, st)

    def lits(st, frm, to):
        # (a paired-emission variant — two lookups + one fused put — was
        # built and chip-measured NEUTRAL, the recurring issue-bound
        # lesson: the put ALU already hides under the table-load latency)
        def one(p, s):
            s = seed_check(s, p)
            acc, cnt, owi, b, sidx = s
            acc, cnt, owi, b = emit_lit((acc, cnt, owi, b), p)
            return (acc, cnt, owi, b, sidx)

        return lax.fori_loop(frm, to, one, st)

    def mstep(k, carry):
        pos, st = carry
        mp = mpos_ref[0, 0, k]
        ml = (mld_ref[0, 0, k] >> jnp.uint32(15)).astype(jnp.int32) + MIN_MATCH
        md = (mld_ref[0, 0, k] & jnp.uint32(0x7FFF)).astype(jnp.int32) + 1
        st = lits(st, pos, mp)
        st = seed_check(st, mp)
        acc, cnt, owi, b, sidx = st
        lc, leb, lev = _len_sym(ml)
        le = lltab_ref[0, 0, 257 + lc]
        v1 = (le & jnp.uint32(0xFFFF)) | (
            lev.astype(jnp.uint32) << (le >> jnp.uint32(16))
        )
        s4 = put((acc, cnt, owi, b),
                 v1, (le >> jnp.uint32(16)).astype(jnp.int32) + leb)
        dc, deb, dev = _dist_sym(md)
        de = dtab_ref[0, 0, dc]
        v2 = (de & jnp.uint32(0xFFFF)) | (
            dev.astype(jnp.uint32) << (de >> jnp.uint32(16))
        )
        s5 = put(s4, v2, (de >> jnp.uint32(16)).astype(jnp.int32) + deb)
        return mp + ml, (s5[0], s5[1], s5[2], s5[3], sidx)

    st0 = (jnp.uint32(0), jnp.int32(0), jnp.int32(0), jnp.bool_(False),
           jnp.int32(0))
    pos, st = lax.fori_loop(0, nmatch, mstep, (start, st0))
    st = lits(st, pos, n_valid)
    acc, cnt, owi, b, sidx = st
    # EOB terminator
    e = lltab_ref[0, 0, 256]
    acc, cnt, owi, b = put((acc, cnt, owi, b),
                           e & jnp.uint32(0xFFFF),
                           (e >> jnp.uint32(16)).astype(jnp.int32))
    # flush the partial word, then ZERO the slack word after it: the host
    # splicer reads one byte past the valid end and the seam assembler
    # assumes zero padding bits — SMEM output buffers are NOT implicitly
    # zeroed (chip-debugged: garbage here corrupted the bits between a
    # chunk's EOB and its sync seam, failing whole-stream decode while
    # every chunk decoded clean in isolation)
    owords_ref[0, 0, jnp.minimum(owi, DEADW)] = acc
    owords_ref[0, 0, jnp.minimum(owi + 1, DEADW)] = jnp.uint32(0)
    total = owi * 32 + cnt  # total body bits incl. EOB
    # unreached seed targets point at end-of-body (empty walkers) — the
    # same convention as the XLA packer's seed fill
    out_len = n_valid - start

    def fill_cond(s):
        return s < n_seeds

    def fill_body(s):
        slot = jnp.minimum(s, sbit_ref.shape[2] - 1)
        sbit_ref[0, 0, slot] = total
        sout_ref[0, 0, slot] = out_len
        return s + 1

    lax.while_loop(fill_cond, fill_body, sidx)
    st_ref[0, 0, 0] = total
    st_ref[0, 0, 1] = b.astype(jnp.int32)
    st_ref[0, 0, 2] = 0
    st_ref[0, 0, 3] = 0


@functools.partial(jax.jit, static_argnames=("n_seeds", "interpret"))
def freq_pack_chunks_pallas(
    chunks_u8, n_valid, start, mpos, mld, nmatch, freq=None, *,
    n_seeds: int = 0, interpret: bool = False,
):
    """Freqs -> XLA Kraft trees -> packed body bits, all from the scan's
    compact match stream (no positional arrays).

    chunks_u8: uint8[B, L] padded chunk buffers (L % 4 == 0); the match
    stream comes from scan_chunks_pallas. Returns (words u32[B, OWW],
    total_bits i32[B], ll_lens i32[B, 286], d_lens i32[B, 30][, seeds_bit,
    seeds_out i32[B, n_seeds]], bad bool[B]).
    """
    from .. import dynhuff

    B, L = chunks_u8.shape
    if L % 4:
        raise ValueError("chunk buffer length must be a multiple of 4")
    bb = chunks_u8.reshape(B, L // 4, 4).astype(jnp.uint32)
    w4 = bb[:, :, 0] | (bb[:, :, 1] << 8) | (bb[:, :, 2] << 16) | (bb[:, :, 3] << 24)
    w4 = jnp.concatenate([w4, jnp.zeros((B, 2), jnp.uint32)], axis=1)
    W = w4.shape[1]
    C = mpos.shape[1]
    nv = n_valid.astype(jnp.int32)
    stt = start.astype(jnp.int32)
    meta_f = jnp.stack([nv, stt, nmatch.astype(jnp.int32)], axis=1)
    meta_f = jnp.pad(meta_f, ((0, 0), (0, 5))).reshape(B, 1, 8)
    w3 = w4.reshape(B, 1, W)
    mpos3 = mpos.reshape(B, 1, C)
    mld3 = mld.reshape(B, 1, C)

    if freq is None:
        freq = pl.pallas_call(
            _freq_kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 320), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1, 320), jnp.int32),
            interpret=interpret,
        )(meta_f, w3, mpos3, mld3)
        freq = freq[:, 0]
    ll_freq = freq[:, :286].at[:, 256].add(1)  # EOB
    d_freq = freq[:, 288:318]

    # tree build stays XLA: 286+30 symbols per chunk, trivial work.
    # The barrier is LOAD-BEARING: the Kraft heuristic's float tie-breaks
    # are fusion-context-dependent on TPU, and without it XLA materializes
    # TWO divergent recomputations — one feeding the pack kernel's code
    # tables, one returned for the host header — producing a header that
    # contradicts the body (chip-debugged in round 3).
    # build BOTH alphabets' trees in ONE vmap over a zero-padded stack:
    # each Kraft/canonical pass over tiny arrays is latency-bound device
    # work (~30us/pass), so halving the call count nearly halves the
    # measured tree stage (1.44 -> ~0.8 ms/batch). Zero-padded symbols
    # have zero frequency and get no codes, so per-tree results are
    # identical to separate calls (asserted by the pack-path tests).
    both_freq = jnp.concatenate(
        [ll_freq, jnp.pad(d_freq, ((0, 0), (0, 286 - 30)))], axis=0
    )
    both_lens = jax.vmap(dynhuff.code_lengths_kraft)(both_freq)
    both_lens = jax.lax.optimization_barrier(both_lens)
    both_codes = jax.vmap(dynhuff.canonical_codes_jax)(both_lens)
    both_codes = jax.lax.optimization_barrier(both_codes)
    ll_lens, d_lens = both_lens[:B], both_lens[B:, :30]
    ll_codes, d_codes = both_codes[:B], both_codes[B:, :30]
    lltab = (ll_codes.astype(jnp.uint32)
             | (ll_lens.astype(jnp.uint32) << 16)).reshape(B, 1, 286)
    lltab = jnp.pad(lltab, ((0, 0), (0, 0), (0, 2)))
    dtab = (d_codes.astype(jnp.uint32)
            | (d_lens.astype(jnp.uint32) << 16)).reshape(B, 1, 30)
    dtab = jnp.pad(dtab, ((0, 0), (0, 0), (0, 2)))

    oww = (16 * (L + 32) + 64) // 32 + 8  # same worst case as lz77.pack_bits
    NS = max(1, n_seeds)
    out_len = jnp.maximum(nv - stt, 0)
    stride = jnp.maximum(out_len // max(n_seeds, 1), 1)
    meta_p = jnp.stack(
        [nv, stt, nmatch.astype(jnp.int32),
         jnp.full((B,), n_seeds, jnp.int32), stride], axis=1,
    )
    meta_p = jnp.pad(meta_p, ((0, 0), (0, 3))).reshape(B, 1, 8)

    owords, stt_o, sbit, sout, tab_echo = pl.pallas_call(
        _make_pack_kernel(n_seeds > 0),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 288), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 32), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, oww), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, NS), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, NS), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 320), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, oww), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, NS), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, NS), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 320), jnp.uint32),
        ],
        interpret=interpret,
    )(meta_p, w3, mpos3, mld3, lltab, dtab)
    total = stt_o[:, 0, 0]
    bad = stt_o[:, 0, 1] > 0
    # header lengths come from the ECHOED tables — the ones the bitstream
    # was actually packed with
    ll_lens = (tab_echo[:, 0, :286] >> 16).astype(jnp.int32)
    d_lens = (tab_echo[:, 0, 288:318] >> 16).astype(jnp.int32)
    if n_seeds:
        return (owords[:, 0], total, ll_lens, d_lens,
                sbit[:, 0], sout[:, 0], bad)
    return owords[:, 0], total, ll_lens, d_lens, bad
