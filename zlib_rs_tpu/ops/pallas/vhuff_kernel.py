"""Lane-parallel vectorized Huffman token decoder (the "vector" engine).

Round-3 discovery (experiments/probe_vgather*.py, probe_fifo.py): Mosaic
DOES have a per-lane dynamic table lookup — `jnp.take_along_axis` on
(8, 128) blocks lowers to a lane gather issuing at a few ns per 1024-lane
lookup — and a (K, 8, 128) masked-reduce (word select from per-walker
input FIFOs) costs ~270ns per 1024 lanes nearly independent of K. That
overturns the round-3 ARCHITECTURE.md conclusion that canonical Huffman's
code->symbol permutation can't vectorize: it can, via the canonical
COMPARE CASCADE + a per-length packed (offset, base) lookup + a 3x128
work[] table gather.

Architecture (TPU realization of the reference's inflate_fast hot loop,
/root/reference/zlib-rs/src/inflate.rs:1885-2163, re-designed for the
VPU instead of translated):

  * 1024 walkers per grid step live in (8, 128) vector registers — one
    walker per lane. Walkers are the encoder-recorded swarm seeds
    (bit offset + output span), 128 per chunk, so each (8,128) ROW's
    walkers share one chunk's Huffman tables: `take_along_axis` row
    semantics give per-chunk tables for free.
  * Each step decodes EITHER up to three literals OR one full match
    (litlen + length extra + dist code + dist extra, <= 48 bits) per
    walker. TWO 32-bit FIFO refills per step keep bitcnt >= 65 before
    every decode, so no bit-starvation gate exists anywhere; consume()
    is a full 0..63-bit funnel shift.
  * The 96-bit LSB-first bit window is three u32 registers; the
    canonical MSB-first 15-bit peek is a 13-op butterfly bit-reversal.
  * code length = 1 + sum over l of (v15 >= LIM15[l]) — 15 static-column
    compares (LIM15[l] = (first_code[l]+count[l]) << (15-l) is monotone
    in l, so the sum IS the argmin).
  * symbol = work[OFF[len] + (v15 - BASE15[len]) >> (15-len)]: one
    (8,128) lane-gather for the packed OFF/BASE15, then a 384-entry
    work[] lookup as 3 lane-gathers + selects. Work entries pack
    (kind, extra_bits, payload) so length/dist bases need no second
    lookup.
  * tokens land in a (cap, 8, 128) tape, one uniform row store per step;
    LZ expansion happens OUTSIDE the kernel in the existing
    pointer-doubling resolver (parallel/device_inflate.resolve_tokens,
    measured 10.5 GB/s — experiments/bench_resolve.py).

Exactness is checked exactly like the swarm engine: every walker must
drain its span and land on the next seed's bit offset; any drift or
invalid code flags the lane and the caller falls back to an exact engine.

Round 5 added the TWO-PLANE variant (_make_kernel2/_make_expand_kernel2,
now the default — see vector_inflate._twoplane_default): each tape row
pairs <=3 literals with the FOLLOWING match (or 4 literals, or a lone
match) over a 128-bit bit window (>=93-bit refill invariant), chip-
measured ~1.7x fewer rows and 182 MB/s/chip vs 112 for this single-plane
form. The single-plane kernel below is kept as the ZRS_VECTOR_TWOPLANE=0
fallback and as the simpler reference for the shared machinery.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from ...parallel.device_inflate import (
    KIND_EOB,
    KIND_INVALID,
    KIND_LIT,
    KIND_MATCH,
    _DBASE,
    _DEXTRA,
    _LBASE,
    _LEXTRA,
)

# token kinds in the packed tape (2 bits)
# LIT: bits[25:24] = byte count - 1 (so 1..3), bits[23:0] = literal bytes
#      LSB-first
# MATCH: bits[24:16] = length - 3 (0..255), bits[15:0] = distance
VTOK_NULL = 0
VTOK_LIT = 1
VTOK_MATCH = 2

WALKERS_PER_STEP = 1024  # 8 sublanes x 128 lanes


# ---------------------------------------------------------------------------
# host-side table construction (numpy; O(320) per chunk)
# ---------------------------------------------------------------------------

def _work_entry(kind, extra, payload):
    return (int(kind) << 28) | (int(extra) << 20) | int(payload)


_INVALID_ENTRY = _work_entry(KIND_INVALID, 0, 0)


def _cascade_np(lens: np.ndarray, entries: np.ndarray, work_size: int):
    """Canonical cascade tables for one alphabet.

    lens: int[n] code lengths (0 = absent); entries: uint32[n] packed
    (kind, extra, payload) per symbol. Returns (lim15[16], pack[16],
    work[work_size]) as int64 numpy (values fit int32).
    """
    n = len(lens)
    counts = np.bincount(lens, minlength=16)[:16]
    counts[0] = 0
    first = np.zeros(16, np.int64)
    code = 0
    for l in range(2, 16):
        code = (code + counts[l - 1]) << 1
        first[l] = code
    lim15 = np.zeros(16, np.int64)
    base15 = np.zeros(16, np.int64)
    off = np.zeros(16, np.int64)
    acc = 0
    for l in range(1, 16):
        base15[l] = first[l] << (15 - l)
        lim15[l] = (first[l] + counts[l]) << (15 - l)
        off[l] = acc
        acc += counts[l]
    pack = (off << 16) | base15
    work = np.full(work_size, _INVALID_ENTRY, np.int64)
    nxt = off.copy()
    for sym in range(n):
        l = lens[sym]
        if l > 0:
            work[nxt[l]] = entries[sym]
            nxt[l] += 1
    return lim15, pack, work


_LL_ENTRIES = np.zeros(320, np.int64)
for _s in range(320):
    if _s < 256:
        _LL_ENTRIES[_s] = _work_entry(KIND_LIT, 0, _s)
    elif _s == 256:
        _LL_ENTRIES[_s] = _work_entry(KIND_EOB, 0, 0)
    elif _s < 286:
        _LL_ENTRIES[_s] = _work_entry(
            KIND_MATCH, _LEXTRA[_s - 257], _LBASE[_s - 257]
        )
    else:
        _LL_ENTRIES[_s] = _INVALID_ENTRY

_D_ENTRIES = np.zeros(320, np.int64)
for _s in range(320):
    if _s < 30:
        _D_ENTRIES[_s] = _work_entry(KIND_MATCH, _DEXTRA[_s], _DBASE[_s])
    else:
        _D_ENTRIES[_s] = _INVALID_ENTRY


def build_cascade_tables_np(ll_lens: np.ndarray, d_lens: np.ndarray):
    """Per-chunk decode tables for the vector kernel.

    Returns (ll_lim15[16], ll_pack[16], ll_work[384], d_lim15[16],
    d_pack[16], d_work[128]) int32 numpy arrays.
    """
    ll_lim, ll_pack, ll_work = _cascade_np(
        np.asarray(ll_lens[:288], np.int64), _LL_ENTRIES[:288], 384
    )
    d_lim, d_pack, d_work = _cascade_np(
        np.asarray(d_lens[:30], np.int64), _D_ENTRIES[:30], 128
    )
    return (
        ll_lim.astype(np.int32), ll_pack.astype(np.int32),
        ll_work.astype(np.int32), d_lim.astype(np.int32),
        d_pack.astype(np.int32), d_work.astype(np.int32),
    )


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _rev15(x):
    """MSB-first value of a 15-bit LSB-first peek (butterfly reversal)."""
    x = ((x >> 1) & jnp.uint32(0x5555)) | ((x & jnp.uint32(0x5555)) << 1)
    x = ((x >> 2) & jnp.uint32(0x3333)) | ((x & jnp.uint32(0x3333)) << 2)
    x = ((x >> 4) & jnp.uint32(0x0F0F)) | ((x & jnp.uint32(0x0F0F)) << 4)
    x = ((x >> 8) & jnp.uint32(0x00FF)) | ((x & jnp.uint32(0x00FF)) << 8)
    return x >> 1


def _lane_gather(table, idx):
    """out[i,j] = table[i, idx[i,j]] — the Mosaic per-lane dynamic gather."""
    return jnp.take_along_axis(table, idx, axis=1)


def _work_lookup(w0, w1, w2, idx):
    """384-entry per-row work[] lookup: 3 lane-gathers + selects."""
    i0 = jnp.clip(idx, 0, 127)
    i1 = jnp.clip(idx - 128, 0, 127)
    i2 = jnp.clip(idx - 256, 0, 127)
    g0 = _lane_gather(w0, i0)
    g1 = _lane_gather(w1, i1)
    g2 = _lane_gather(w2, i2)
    return jnp.where(idx < 128, g0, jnp.where(idx < 256, g1, g2))


def _broadcast_cols(lim15):
    """Hoist the loop-invariant LIM15 column broadcasts out of the decode
    loop (a lane-broadcast relayout per column per step is the single
    largest per-step cost otherwise)."""
    return [
        lax.broadcast_in_dim(lim15[:, l], (8, 128), (0,)) for l in range(1, 15)
    ]


def _cascade_len(lim_cols, v15i):
    """Code length = 1 + #(v15 >= LIM15[l]) over l=1..14 (static columns)."""
    ln = jnp.ones_like(v15i)
    for col in lim_cols:
        ln = ln + (v15i >= col).astype(jnp.int32)
    return ln


def _make_kernel(cap: int, K: int):
    u32 = jnp.uint32
    import os

    # timing-ablation hook (experiments/bench_vhuff_synth.py): comma-set of
    # {decode,refill,store,any} to neuter — results become garbage, the
    # per-step cost attribution is the point
    ablate = frozenset(
        x for x in os.environ.get("ZRS_VHUFF_ABLATE", "").split(",") if x
    )

    def kernel(
        fifo_ref, ll_lim_ref, ll_pack_ref, w0_ref, w1_ref, w2_ref,
        d_lim_ref, d_pack_ref, dw_ref, align_ref, span_ref,
        tape_ref, cons_ref, bad_ref, rem_ref,
    ):
        fifo = fifo_ref[:]          # (K, 8, 128) int32 (u32 bit patterns)
        ll_lim = ll_lim_ref[:]      # (8, 128); cols 1..15 used
        ll_pack = ll_pack_ref[:]
        w0 = w0_ref[:]
        w1 = w1_ref[:]
        w2 = w2_ref[:]
        d_lim = d_lim_ref[:]
        d_pack = d_pack_ref[:]
        dw = dw_ref[:]
        align = align_ref[:]        # (8, 128) int32: seed bit & 31
        span = span_ref[:]          # (8, 128) int32: output bytes to cover

        kio = lax.broadcasted_iota(jnp.int32, (K, 8, 128), 0)
        ll_cols = _broadcast_cols(ll_lim)
        d_cols = _broadcast_cols(d_lim)

        def fetch(widx):
            sel = jnp.where(kio == widx[None], fifo, 0)
            return jnp.sum(sel, axis=0).astype(u32)

        def refill(win, widx, active):
            """96-bit window (lo, mid, hi) + bitcnt: insert one 32-bit word
            for lanes with bitcnt <= 64; call twice to restore the >= 65
            invariant (every per-step peek then has enough bits, so no
            bit-starvation gates exist anywhere in the decode)."""
            lo, mid, hi, bitcnt = win
            need = active & (bitcnt <= 64)
            word = fetch(widx)

            def ins(reg, base):
                # place word at bit offset (bitcnt - base) within this reg
                off = bitcnt - base
                lo_sh = jnp.clip(off, 0, 31).astype(u32)
                contrib = jnp.where(
                    (off >= 0) & (off < 32), word << lo_sh, u32(0)
                )
                # straddle: word's bit (base - bitcnt) lands at reg bit 0,
                # i.e. contribution = word >> (base - bitcnt), base-bitcnt
                # in 1..31 (the (>>1)>>k split keeps every shift <= 31)
                hi_sh = jnp.clip(base - bitcnt, 1, 32)
                contrib = contrib | jnp.where(
                    (off < 0) & (off > -32),
                    (word >> 1) >> (hi_sh - 1).astype(u32),
                    u32(0),
                )
                return jnp.where(need, reg | contrib, reg)

            lo = ins(lo, 0)
            mid = ins(mid, 32)
            hi = ins(hi, 64)
            bitcnt = jnp.where(need, bitcnt + 32, bitcnt)
            widx = jnp.where(need, jnp.minimum(widx + 1, K - 1), widx)
            return (lo, mid, hi, bitcnt), widx

        def peek(win, s):
            """32-bit view of the window starting at bit s (s <= 63)."""
            lo, mid, hi, _ = win
            s1 = jnp.minimum(s, 31).astype(u32)
            a = (lo >> s1) | jnp.where(s > 0, (mid << 1) << (31 - s1), u32(0))
            s2 = jnp.clip(s - 32, 0, 31).astype(u32)
            b = (mid >> s2) | jnp.where(s > 32, (hi << 1) << (31 - s2), u32(0))
            b = jnp.where(s == 32, mid, b)
            return jnp.where(s < 32, a, b)

        def consume(win, n):
            """Drop n bits (0 <= n <= 63): register swap for the >= 32
            part, then a 0..31 funnel shift (the (<<1)<<inv split makes
            m == 0 contribute nothing without a 32-bit shift)."""
            lo, mid, hi, bitcnt = win
            big = n >= 32
            lo = jnp.where(big, mid, lo)
            mid = jnp.where(big, hi, mid)
            hi = jnp.where(big, u32(0), hi)
            m = jnp.where(big, n - 32, n).astype(u32)
            inv = u32(31) - m
            lo = (lo >> m) | ((mid << 1) << inv)
            mid = (mid >> m) | ((hi << 1) << inv)
            hi = hi >> m
            return (lo, mid, hi, bitcnt - n)

        def litlen_at(win, s):
            """Decode one litlen code at window offset s: returns
            (entry, codelen)."""
            v15i = _rev15(peek(win, s) & u32(0x7FFF)).astype(jnp.int32)
            ln = _cascade_len(ll_cols, v15i)
            pk = _lane_gather(ll_pack, ln)
            idx = (pk >> 16) + lax.shift_right_logical(
                v15i - (pk & 0xFFFF), 15 - ln
            )
            e = _work_lookup(w0, w1, w2, jnp.clip(idx, 0, 383))
            return e, ln

        def dist_at(win, s):
            v15i = _rev15(peek(win, s) & u32(0x7FFF)).astype(jnp.int32)
            ln = _cascade_len(d_cols, v15i)
            pk = _lane_gather(d_pack, ln)
            idx = (pk >> 16) + lax.shift_right_logical(
                v15i - (pk & 0xFFFF), 15 - ln
            )
            e = _lane_gather(dw, jnp.clip(idx, 0, 127))
            return e, ln

        zero = jnp.zeros((8, 128), jnp.int32)
        zu = jnp.zeros((8, 128), u32)
        live0 = span > 0
        win0 = (zu, zu, zu, zero)
        wi0 = zero
        # three initial refills, then drop the sub-word seed alignment
        win0, wi0 = refill(win0, wi0, live0)
        win0, wi0 = refill(win0, wi0, live0)
        win0, wi0 = refill(win0, wi0, live0)
        win0 = consume(win0, jnp.where(live0, align, 0))

        def body(carry):
            (it, _alive, lo, mid, hi, bitcnt, widx, remaining, cons, badi) = carry
            win = (lo, mid, hi, bitcnt)
            bad = badi != 0
            active = (remaining > 0) & ~bad
            if "refill" not in ablate:
                win, widx = refill(win, widx, active)
                win, widx = refill(win, widx, active)

            if "decode" in ablate:  # minimal body: loop machinery only
                lo, mid, hi, bitcnt = win
                return (it + 1, jnp.int32(1), lo, mid, hi, bitcnt, widx,
                        remaining - 1, cons, badi)

            # first symbol
            e1, l1 = litlen_at(win, zero)
            kind1 = e1 >> 28
            x1 = (e1 >> 20) & 0xF
            pay1 = e1 & 0xFFFFF
            is_lit1 = kind1 == KIND_LIT
            is_len1 = kind1 == KIND_MATCH

            # match path: length extra + dist code + dist extra, same step
            xv1 = (
                peek(win, l1) & ((u32(1) << x1.astype(u32)) - u32(1))
            ).astype(jnp.int32)
            length = pay1 + xv1
            s_d = l1 + x1
            ed, ld = dist_at(win, s_d)
            dkind = ed >> 28
            dx = (ed >> 20) & 0xF
            dpay = ed & 0xFFFFF
            dxv = (
                peek(win, s_d + ld) & ((u32(1) << dx.astype(u32)) - u32(1))
            ).astype(jnp.int32)
            dist = dpay + dxv
            adv_m = l1 + x1 + ld + dx

            # literal path: up to two more literals this step
            e2, l2 = litlen_at(win, l1)
            take2 = is_lit1 & ((e2 >> 28) == KIND_LIT) & (remaining >= 2)
            e3, l3 = litlen_at(win, l1 + l2)
            take3 = take2 & ((e3 >> 28) == KIND_LIT) & (remaining >= 3)
            cnt = jnp.where(is_lit1, 1 + take2 + take3, 0)
            litreg = (
                (pay1 & 0xFF)
                | jnp.where(take2, (e2 & 0xFF) << 8, 0)
                | jnp.where(take3, (e3 & 0xFF) << 16, 0)
            )
            adv_l = l1 + jnp.where(take2, l2, 0) + jnp.where(take3, l3, 0)

            is_match = is_len1 & (dkind == KIND_MATCH)
            bad_now = active & (
                (kind1 == KIND_INVALID)
                | (kind1 == KIND_EOB)
                | (is_len1 & (dkind != KIND_MATCH))
            )
            cover = jnp.where(is_lit1, cnt, jnp.where(is_match, length, 0))
            bad_now = bad_now | (active & (cover > remaining))

            step = active & ~bad_now
            emit_lit = step & is_lit1
            emit_match = step & is_match
            packed = jnp.where(
                emit_lit,
                (u32(VTOK_LIT) << 30)
                | ((cnt - 1).astype(u32) << 24)
                | litreg.astype(u32),
                jnp.where(
                    emit_match,
                    (u32(VTOK_MATCH) << 30)
                    | ((length - 3).astype(u32) << 16)
                    | dist.astype(u32),
                    u32(0),
                ),
            )
            if "store" not in ablate:
                tape_ref[pl.ds(it, 1)] = packed[None]

            n = jnp.where(
                step, jnp.where(is_lit1, adv_l, jnp.where(is_match, adv_m, 0)), 0
            )
            win = consume(win, n)
            cons = cons + n
            remaining = remaining - jnp.where(step, cover, 0)
            badi = badi | bad_now.astype(jnp.int32)
            if "any" in ablate:
                alive = jnp.int32(1)
            else:
                alive = jnp.any((remaining > 0) & (badi == 0)).astype(jnp.int32)
            lo, mid, hi, bitcnt = win
            return (it + 1, alive, lo, mid, hi, bitcnt, widx,
                    remaining, cons, badi)

        def cond(carry):
            it, alive = carry[0], carry[1]
            return (it < cap) & (alive != 0)

        lo0, mid0, hi0, bc0 = win0
        init = (
            jnp.int32(0), jnp.any(live0).astype(jnp.int32), lo0, mid0, hi0,
            bc0, wi0, jnp.where(live0, span, 0), zero,
            jnp.zeros((8, 128), jnp.int32),
        )
        (it, _alive, _lo, _mid, _hi, _bc, _wi, remaining, cons, badi) = (
            lax.while_loop(cond, body, init)
        )

        # zero the tape rows the loop never reached
        def clear(i, _):
            tape_ref[pl.ds(i, 1)] = jnp.zeros((1, 8, 128), u32)
            return 0

        lax.fori_loop(it, cap, clear, 0)

        cons_ref[:] = cons
        bad_ref[:] = badi
        rem_ref[:] = remaining

    return kernel


# ---------------------------------------------------------------------------
# token expansion: scalar in-SMEM LZ writer (replaces the XLA pointer-
# doubling resolver, whose full-space gathers measured ~6 MB/s at real
# shapes — the gather tax, not a constant-factor issue)
# ---------------------------------------------------------------------------

def _make_expand_kernel(S_BLK: int, capw: int, OW: int):
    """Expand packed token tapes into chunk bytes.

    Grid (B, S // S_BLK): each inner step walks S_BLK walkers' tapes and
    writes their output spans into the chunk's SMEM word buffer, which
    stays resident across inner steps (matches may reference any earlier
    byte of the same chunk — chunks are independent, so there is no
    cross-chunk window).

    Structure follows the chip-proven issue-bound cost model
    (STATUS.md): a walker's tokens are contiguous (NULLs only pad the
    tail), so literals run in a SPRINT loop that funnels 1..3 packed
    bytes per token through a word REGISTER (one SMEM store per output
    word, no per-byte RMW and no per-token lax.cond); the match path
    pays its cond once per match and reuses the word-copy scheme of
    ops/pallas/inflate_kernel.py's writer (the TPU re-design of the
    reference's Writer::copy_match, inflate/writer.rs:106+).
    """
    u32 = jnp.uint32
    import os

    # timing-ablation hook (experiments/chip_vector_probe.py): comma-set
    # of {match,litstore} to neuter — output becomes garbage; per-stage
    # cost attribution is the point
    ablate = frozenset(
        x for x in os.environ.get("ZRS_EXPAND_ABLATE", "").split(",") if x
    )

    def kernel(tape_ref, offs_ref, out_ref):
        w_blk = pl.program_id(1)

        def byte_read(p):
            wd = out_ref[0, 0, p >> 2]
            return (wd >> ((p & 3).astype(u32) * 8)) & u32(0xFF)

        def byte_write(p, b):
            wi = p >> 2
            sh = ((p & 3).astype(u32)) * 8
            wd = out_ref[0, 0, wi]
            out_ref[0, 0, wi] = (wd & ~(u32(0xFF) << sh)) | ((b & u32(0xFF)) << sh)

        def src4(p, dist):
            # 4 bytes at p-dist (dist >= 4 so no overlap with word at p)
            sp = p - dist
            swi = sp >> 2
            sh = ((sp & 3).astype(u32)) * 8
            w0 = out_ref[0, 0, swi]
            w1 = out_ref[0, 0, swi + 1]
            return jnp.where(sh > 0, (w0 >> sh) | (w1 << (u32(32) - sh)), w0)

        def copy_match(p, length, dist):
            """Cond-free word-granular match copy with DON'T-CARE tails.

            dist < 4 is promoted to an effective distance d4 in 4..6 by
            first materializing base = d4 - dist pattern bytes with an
            RMW byte loop (0 iterations for dist >= 4 — an empty fori is
            a few ns, vs the 10-15ns a lax.cond costs per match even
            never-taken). After that every store is a full word: bytes
            below the cursor in the first word are preserved by one
            merge; bytes past the match end are whatever the pattern
            continues into — harmless, because every later reader
            (sprint reg0, the next match's first-word merge, byte_read
            of committed bytes) only touches bytes < the cursor.

            With the branchless NULL-token call (length=0, dist=0) the
            base loop writes 4 garbage bytes at p and the first-word
            store one word above — all at or above the cursor p (== the
            walker's span end p1 for valid tapes), inside the +2-word
            output slack.
            """
            # d4: dist rounded into the word-copyable range (1,2,3 -> 4,4,6)
            d4 = jnp.where(dist >= 4, dist, jnp.where(dist == 3, 6, 4))
            base = jnp.where(dist >= 4, 0, d4 - dist)

            def hb(i, _):
                byte_write(p + i, byte_read(jnp.maximum(p + i - dist, 0)))
                return 0

            lax.fori_loop(0, base, hb, 0)

            pw = p + base
            wi = pw >> 2
            sh = ((pw & 3) << 3).astype(u32)
            keep = out_ref[0, 0, wi] & ((u32(1) << sh) - u32(1))
            out_ref[0, 0, wi] = keep | (src4(pw, d4) << sh)
            last = (p + length - 1) >> 2
            nw = last - wi  # negative for cover-0 NULL calls: loop skips

            def wf(k, _):
                q = (wi + 1 + k) << 2
                out_ref[0, 0, wi + 1 + k] = src4(q, d4)
                return 0

            lax.fori_loop(0, nw, wf, 0)

        def walker(k, _):
            s = w_blk * S_BLK + k
            p0 = offs_ref[0, 0, s]
            p1 = offs_ref[0, 0, s + 1]

            def outer_cond(st):
                t, p = st
                return (t < capw) & (p < p1)

            def outer(st):
                t, p = st

                # ---- literal sprint: word-register funnel ----------------
                # reg holds the partial output word at p (low (p&3)*8 bits
                # are committed bytes); each LIT token ORs 1..4 bytes in
                # and stores exactly when the word boundary is crossed.
                reg0 = out_ref[0, 0, p >> 2] & (
                    (u32(1) << ((p & 3) << 3).astype(u32)) - u32(1)
                )

                def s_cond(sst):
                    _t, _p, _reg, tok = sst
                    # kind-only: the decode kernel never emits covers past
                    # the span (cover > remaining flags bad BEFORE the
                    # store) and pads the tail with NULLs, so the token
                    # kind alone terminates the sprint; the t/p guards
                    # live in outer_cond and the clamped lookahead loads.
                    return (tok >> 30) == u32(VTOK_LIT)

                def apply_lit(p, reg, tok):
                    """Funnel 1..3 bytes of a LIT token into the register;
                    returns (p2, reg2, word_to_store, store_idx). Pure ALU
                    (no branches): the store is unconditional — bytes
                    above the cursor are don't-care (readers only touch
                    < cursor), which also dodges the predication tax. The
                    payload needs no count mask: the decode kernel zeroes
                    unused literal lanes when packing."""
                    cnt = (((tok >> 24) & u32(0x3)) + u32(1)).astype(jnp.int32)
                    w = tok & u32(0x00FFFFFF)
                    sh = ((p & 3) << 3).astype(u32)
                    full = reg | (w << sh)
                    spill = (w >> u32(1)) >> (u32(31) - sh)
                    p2 = p + cnt
                    reg2 = jnp.where((p2 >> 2) > (p >> 2), spill, full)
                    return p2, reg2, full, p >> 2

                def s_body(sst):
                    t, p, reg, tok = sst
                    # 2-token unroll: both lookahead loads issue together
                    # (independent SMEM loads overlap — probe_ilp). NOT
                    # deeper: the applies are a serial ALU chain paid
                    # every iteration whatever the run length, and the
                    # average literal run is ~1.5 tokens (chip-counted),
                    # so a 4-unroll LOSES — the ILK predication lesson.
                    tokB = jnp.where(
                        t + 1 < capw,
                        tape_ref[0, k, jnp.minimum(t + 1, capw - 1)], u32(0),
                    )
                    tokC = jnp.where(
                        t + 2 < capw,
                        tape_ref[0, k, jnp.minimum(t + 2, capw - 1)], u32(0),
                    )
                    pA, regA, wordA, idxA = apply_lit(p, reg, tok)
                    if "litstore" not in ablate:
                        out_ref[0, 0, idxA] = wordA
                    take_b = (tokB >> 30) == u32(VTOK_LIT)
                    pB, regB, wordB, idxB = apply_lit(pA, regA, tokB)
                    # second store only when token B applied (its word may
                    # equal A's — ordering keeps it correct either way)
                    if "litstore" not in ablate:
                        out_ref[0, 0, jnp.where(take_b, idxB, idxA)] = jnp.where(
                            take_b, wordB, wordA
                        )
                    p2 = jnp.where(take_b, pB, pA)
                    reg2 = jnp.where(take_b, regB, regA)
                    t2 = t + 1 + take_b.astype(jnp.int32)
                    ntok = jnp.where(take_b, tokC, tokB)
                    return (t2, p2, reg2, ntok)

                tok0 = tape_ref[0, k, t]
                t, p, reg, tok = lax.while_loop(
                    s_cond, s_body, (t, p, reg0, tok0)
                )
                # flush the partial word (bytes above p are don't-care:
                # every reader only touches bytes < the writer's cursor)
                out_ref[0, 0, p >> 2] = reg

                # ---- one match (or tail NULL) ----------------------------
                # BRANCHLESS: copy_match always runs; for a NULL token
                # (walker end / under-produced lane) cover is forced to 0,
                # so the loops run zero iterations and the only side
                # effect is one first-word store whose bytes >= p are
                # don't-care (a cond here costs 10-15ns per match even
                # never-taken — the single largest match-side tax).
                is_match = (tok >> 30) == u32(VTOK_MATCH)
                cover = jnp.where(
                    is_match, ((tok >> 16) & u32(0x3FFF)).astype(jnp.int32) + 3, 0
                )
                dist = (tok & u32(0xFFFF)).astype(jnp.int32)
                if "match" not in ablate:
                    copy_match(p, cover, dist)
                p = p + cover
                # a NULL mid-span means the walker under-produced (flagged
                # upstream by rem != 0); skip to the end to terminate
                t = jnp.where(is_match, t + 1, capw)
                return (t, p)

            lax.while_loop(outer_cond, outer, (jnp.int32(0), p0))
            return 0

        lax.fori_loop(0, S_BLK, walker, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("S", "cap", "out_words", "interpret"))
def expand_tokens_pallas(tape, offs, *, S: int, cap: int, out_words: int,
                         interpret: bool = False):
    """tape: uint32[B, S, cap] packed tokens in walker-major order;
    offs: int32[B, S+8] output byte offsets per walker (offs[S] = chunk
    output length). Returns uint32[B, out_words] LE32-packed chunk bytes.
    """
    from jax.experimental.pallas import tpu as pltpu

    B = tape.shape[0]
    S_BLK = 8
    grid = (B, S // S_BLK)
    offs3 = offs.reshape(B, 1, offs.shape[1])
    tape_spec = pl.BlockSpec(
        (1, S_BLK, cap), lambda c, w: (c, w, 0), memory_space=pltpu.SMEM
    )
    return pl.pallas_call(
        _make_expand_kernel(S_BLK, cap, out_words),
        grid=grid,
        in_specs=[
            tape_spec,
            pl.BlockSpec(
                (1, 1, offs.shape[1]), lambda c, w: (c, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, out_words), lambda c, w: (c, 0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, out_words), jnp.uint32),
        interpret=interpret,
    )(tape, offs3).reshape(B, out_words)


@functools.partial(jax.jit, static_argnames=("cap", "K", "interpret"))
def decode_tokens_vector(
    fifo, ll_lim, ll_pack, w0, w1, w2, d_lim, d_pack, dw, align, span,
    *, cap: int, K: int, interpret: bool = False,
):
    """Run the vector token decoder.

    fifo: int32[G, K, 8, 128] per-walker input words (little-endian u32 of
    the chunk body, starting at the seed's word). Tables: int32[G, 8, 128]
    per row (all walkers in a row share a chunk). align/span: int32[G,8,128].
    Returns (tape uint32[G, cap, 8, 128], cons int32[G,8,128],
    bad int32[G,8,128], rem int32[G,8,128]).
    """
    G = fifo.shape[0]
    grid = (G,)
    t_spec = pl.BlockSpec((None, 8, 128), lambda g: (g, 0, 0))
    out = pl.pallas_call(
        _make_kernel(cap, K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, K, 8, 128), lambda g: (g, 0, 0, 0)),
            t_spec, t_spec, t_spec, t_spec, t_spec,
            t_spec, t_spec, t_spec, t_spec, t_spec,
        ],
        out_specs=[
            pl.BlockSpec((None, cap, 8, 128), lambda g: (g, 0, 0, 0)),
            t_spec, t_spec, t_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, cap, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(fifo, ll_lim, ll_pack, w0, w1, w2, d_lim, d_pack, dw, align, span)
    return tuple(out)


# ---------------------------------------------------------------------------
# two-plane variant (r5): pair <=3 literals + the following match (or 4
# literals, or a lone match) into ONE tape row — chip-counted on the 8 MiB
# corpus this cuts rows 1.85M -> ~1.1M, and the expansion kernel loses its
# literal-sprint inner loop entirely (one flat body per row). Needs a
# 128-bit bit window: the worst row is 3x15 lit bits + a 48-bit match = 93
# bits, so refill keeps bitcnt >= 93 (4 u32 registers). Gated behind
# ZRS_VECTOR_TWOPLANE until chip-measured; byte-exactness is asserted by
# the same drain/seam/checksum contract either way.
# ---------------------------------------------------------------------------

# plane-B layout: [cnt:3][has_match:1][len-3:8][dist:16]; an all-zero row
# is the tape terminator (a real row always has cnt >= 1 or has_match)


def _make_kernel2(cap: int, K: int):
    u32 = jnp.uint32

    def kernel(
        fifo_ref, ll_lim_ref, ll_pack_ref, w0_ref, w1_ref, w2_ref,
        d_lim_ref, d_pack_ref, dw_ref, align_ref, span_ref,
        tapeA_ref, tapeB_ref, cons_ref, bad_ref, rem_ref,
    ):
        fifo = fifo_ref[:]
        ll_lim = ll_lim_ref[:]
        ll_pack = ll_pack_ref[:]
        w0 = w0_ref[:]
        w1 = w1_ref[:]
        w2 = w2_ref[:]
        d_lim = d_lim_ref[:]
        d_pack = d_pack_ref[:]
        dw = dw_ref[:]
        align = align_ref[:]
        span = span_ref[:]

        kio = lax.broadcasted_iota(jnp.int32, (K, 8, 128), 0)
        ll_cols = _broadcast_cols(ll_lim)
        d_cols = _broadcast_cols(d_lim)

        def fetch(widx):
            sel = jnp.where(kio == widx[None], fifo, 0)
            return jnp.sum(sel, axis=0).astype(u32)

        def refill(win, widx, active):
            """128-bit window (lo, mid, hi, h3) + bitcnt: insert one word
            for lanes with bitcnt <= 92; three calls restore the >= 93
            invariant (the worst row consumes 93 bits)."""
            lo, mid, hi, h3, bitcnt = win
            need = active & (bitcnt <= 92)
            word = fetch(widx)

            def ins(reg, base):
                off = bitcnt - base
                lo_sh = jnp.clip(off, 0, 31).astype(u32)
                contrib = jnp.where(
                    (off >= 0) & (off < 32), word << lo_sh, u32(0)
                )
                hi_sh = jnp.clip(base - bitcnt, 1, 32)
                contrib = contrib | jnp.where(
                    (off < 0) & (off > -32),
                    (word >> 1) >> (hi_sh - 1).astype(u32),
                    u32(0),
                )
                return jnp.where(need, reg | contrib, reg)

            lo = ins(lo, 0)
            mid = ins(mid, 32)
            hi = ins(hi, 64)
            h3 = ins(h3, 96)
            bitcnt = jnp.where(need, bitcnt + 32, bitcnt)
            widx = jnp.where(need, jnp.minimum(widx + 1, K - 1), widx)
            return (lo, mid, hi, h3, bitcnt), widx

        def peek(win, s):
            """32-bit view starting at bit s (s <= 95)."""
            lo, mid, hi, h3, _ = win

            def pair(a, b, sh):
                shc = jnp.clip(sh, 0, 31).astype(u32)
                return (a >> shc) | jnp.where(
                    sh > 0, (b << 1) << (31 - shc), u32(0)
                )

            v0 = pair(lo, mid, s)
            v1 = pair(mid, hi, s - 32)
            v1 = jnp.where(s == 32, mid, v1)
            v2 = pair(hi, h3, s - 64)
            v2 = jnp.where(s == 64, hi, v2)
            return jnp.where(s < 32, v0, jnp.where(s < 64, v1, v2))

        def consume(win, n):
            """Drop n bits (0 <= n <= 95)."""
            lo, mid, hi, h3, bitcnt = win
            big2 = n >= 64
            lo = jnp.where(big2, hi, lo)
            mid = jnp.where(big2, h3, mid)
            hi = jnp.where(big2, u32(0), hi)
            h3 = jnp.where(big2, u32(0), h3)
            n1 = jnp.where(big2, n - 64, n)
            big = n1 >= 32
            lo = jnp.where(big, mid, lo)
            mid = jnp.where(big, hi, mid)
            hi = jnp.where(big, h3, hi)
            h3 = jnp.where(big, u32(0), h3)
            m = jnp.where(big, n1 - 32, n1).astype(u32)
            inv = u32(31) - m
            lo = (lo >> m) | ((mid << 1) << inv)
            mid = (mid >> m) | ((hi << 1) << inv)
            hi = (hi >> m) | ((h3 << 1) << inv)
            h3 = h3 >> m
            return (lo, mid, hi, h3, bitcnt - n)

        def litlen_at(win, s):
            v15i = _rev15(peek(win, s) & u32(0x7FFF)).astype(jnp.int32)
            ln = _cascade_len(ll_cols, v15i)
            pk = _lane_gather(ll_pack, ln)
            idx = (pk >> 16) + lax.shift_right_logical(
                v15i - (pk & 0xFFFF), 15 - ln
            )
            e = _work_lookup(w0, w1, w2, jnp.clip(idx, 0, 383))
            return e, ln

        def dist_at(win, s):
            v15i = _rev15(peek(win, s) & u32(0x7FFF)).astype(jnp.int32)
            ln = _cascade_len(d_cols, v15i)
            pk = _lane_gather(d_pack, ln)
            idx = (pk >> 16) + lax.shift_right_logical(
                v15i - (pk & 0xFFFF), 15 - ln
            )
            e = _lane_gather(dw, jnp.clip(idx, 0, 127))
            return e, ln

        zero = jnp.zeros((8, 128), jnp.int32)
        zu = jnp.zeros((8, 128), u32)
        live0 = span > 0
        win0 = (zu, zu, zu, zu, zero)
        wi0 = zero
        for _ in range(4):
            win0, wi0 = refill(win0, wi0, live0)
        win0 = consume(win0, jnp.where(live0, align, 0))

        def sel4(c, a, b, cc, d):
            return jnp.where(
                c == 0, a, jnp.where(c == 1, b, jnp.where(c == 2, cc, d))
            )

        def body(carry):
            (it, _alive, lo, mid, hi, h3, bitcnt, widx, remaining, cons,
             badi) = carry
            win = (lo, mid, hi, h3, bitcnt)
            bad = badi != 0
            active = (remaining > 0) & ~bad
            win, widx = refill(win, widx, active)
            win, widx = refill(win, widx, active)
            win, widx = refill(win, widx, active)

            e1, l1 = litlen_at(win, zero)
            k1 = e1 >> 28
            lit1 = k1 == KIND_LIT
            e2, l2 = litlen_at(win, l1)
            lit2 = lit1 & ((e2 >> 28) == KIND_LIT) & (remaining >= 2)
            e3, l3 = litlen_at(win, l1 + l2)
            lit3 = lit2 & ((e3 >> 28) == KIND_LIT) & (remaining >= 3)
            e4, l4 = litlen_at(win, l1 + l2 + l3)
            lit4 = lit3 & ((e4 >> 28) == KIND_LIT) & (remaining >= 4)
            cnt = (
                lit1.astype(jnp.int32) + lit2.astype(jnp.int32)
                + lit3.astype(jnp.int32) + lit4.astype(jnp.int32)
            )
            litreg = (
                jnp.where(lit1, e1 & 0xFF, 0)
                | jnp.where(lit2, (e2 & 0xFF) << 8, 0)
                | jnp.where(lit3, (e3 & 0xFF) << 16, 0)
                | jnp.where(lit4, (e4 & 0xFF) << 24, 0)
            )
            lbits = (
                jnp.where(lit1, l1, 0) + jnp.where(lit2, l2, 0)
                + jnp.where(lit3, l3, 0) + jnp.where(lit4, l4, 0)
            )

            # match candidate: the first non-literal code (only when fewer
            # than 4 literals were taken; a 4-literal row carries no match)
            cand_e = sel4(cnt, e1, e2, e3, e4)
            cand_l = sel4(cnt, l1, l2, l3, l4)
            cand_off = sel4(
                cnt, zero, l1, l1 + l2, l1 + l2 + l3
            )
            ck = cand_e >> 28
            is_len = ck == KIND_MATCH
            want_m = is_len & (cnt < 4) & (remaining > cnt)
            x1 = (cand_e >> 20) & 0xF
            pay1 = cand_e & 0xFFFFF
            xv1 = (
                peek(win, cand_off + cand_l)
                & ((u32(1) << x1.astype(u32)) - u32(1))
            ).astype(jnp.int32)
            length = pay1 + xv1
            s_d = cand_off + cand_l + x1
            ed, ld = dist_at(win, s_d)
            dkind = ed >> 28
            dx = (ed >> 20) & 0xF
            dpay = ed & 0xFFFFF
            dxv = (
                peek(win, s_d + ld) & ((u32(1) << dx.astype(u32)) - u32(1))
            ).astype(jnp.int32)
            dist = dpay + dxv
            is_match = want_m & (dkind == KIND_MATCH)

            # bad: e1 invalid/EOB when no literal was taken; a wanted
            # match whose dist code is broken; cover overshooting the span
            bad_now = active & (
                ((cnt == 0) & ~is_len)
                | (want_m & (dkind != KIND_MATCH))
            )
            cover = cnt + jnp.where(is_match, length, 0)
            bad_now = bad_now | (active & (cover > remaining))

            step = active & ~bad_now
            emit = step & (cover > 0)
            tokB = jnp.where(
                emit,
                cnt.astype(u32)
                | jnp.where(
                    is_match,
                    u32(8)
                    | ((length - 3).astype(u32) << 4)
                    | (dist.astype(u32) << 12),
                    u32(0),
                ),
                u32(0),
            )
            tapeA_ref[pl.ds(it, 1)] = jnp.where(
                emit, litreg.astype(u32), u32(0)
            )[None]
            tapeB_ref[pl.ds(it, 1)] = tokB[None]

            n = jnp.where(
                step,
                lbits
                + jnp.where(is_match, cand_l + x1 + ld + dx, 0),
                0,
            )
            win = consume(win, n)
            cons = cons + n
            remaining = remaining - jnp.where(step, cover, 0)
            badi = badi | bad_now.astype(jnp.int32)
            alive = jnp.any((remaining > 0) & (badi == 0)).astype(jnp.int32)
            lo, mid, hi, h3, bitcnt = win
            return (it + 1, alive, lo, mid, hi, h3, bitcnt, widx,
                    remaining, cons, badi)

        def cond(carry):
            it, alive = carry[0], carry[1]
            return (it < cap) & (alive != 0)

        lo0, mid0, hi0, h30, bc0 = win0
        init = (
            jnp.int32(0), jnp.any(live0).astype(jnp.int32), lo0, mid0, hi0,
            h30, bc0, wi0, jnp.where(live0, span, 0), zero,
            jnp.zeros((8, 128), jnp.int32),
        )
        (it, _alive, _lo, _mid, _hi, _h3, _bc, _wi, remaining, cons,
         badi) = lax.while_loop(cond, body, init)

        def clear(i, _):
            tapeA_ref[pl.ds(i, 1)] = jnp.zeros((1, 8, 128), u32)
            tapeB_ref[pl.ds(i, 1)] = jnp.zeros((1, 8, 128), u32)
            return 0

        lax.fori_loop(it, cap, clear, 0)
        cons_ref[:] = cons
        bad_ref[:] = badi
        rem_ref[:] = remaining

    return kernel


def _make_expand_kernel2(S_BLK: int, capw: int, OW: int):
    """Two-plane expansion: ONE flat body per tape row (<=4-byte literal
    funnel store + branchless copy_match) — the single-plane kernel's
    literal-sprint inner loop is gone, and with it its per-literal-token
    iteration cost. Same window/output discipline as _make_expand_kernel.
    """
    u32 = jnp.uint32

    def kernel(tapeA_ref, tapeB_ref, offs_ref, out_ref):
        w_blk = pl.program_id(1)

        def byte_read(p):
            wd = out_ref[0, 0, p >> 2]
            return (wd >> ((p & 3).astype(u32) * 8)) & u32(0xFF)

        def byte_write(p, b):
            wi = p >> 2
            sh = ((p & 3).astype(u32)) * 8
            wd = out_ref[0, 0, wi]
            out_ref[0, 0, wi] = (wd & ~(u32(0xFF) << sh)) | (
                (b & u32(0xFF)) << sh
            )

        def src4(p, dist):
            sp = p - dist
            swi = sp >> 2
            sh = ((sp & 3).astype(u32)) * 8
            w0 = out_ref[0, 0, swi]
            w1 = out_ref[0, 0, swi + 1]
            return jnp.where(sh > 0, (w0 >> sh) | (w1 << (u32(32) - sh)), w0)

        def copy_match(p, length, dist):
            # identical scheme to _make_expand_kernel.copy_match
            d4 = jnp.where(dist >= 4, dist, jnp.where(dist == 3, 6, 4))
            base = jnp.where(dist >= 4, 0, d4 - dist)

            def hb(i, _):
                byte_write(p + i, byte_read(jnp.maximum(p + i - dist, 0)))
                return 0

            # 4-literal rows reach here with length==0 and a garbage dist
            # of 0 (tokB bits 12+ are clear), which maps to base==4: skip
            # the four wasted head-byte trips on the matchless path. The
            # word write below still lands at pw=p+4 (src reads stay >= 0)
            # and only deposits don't-care bytes past the row's end, which
            # later rows overwrite — same contract as the match path.
            lax.fori_loop(0, jnp.where(length == 0, 0, base), hb, 0)
            pw = p + base
            wi = pw >> 2
            sh = ((pw & 3) << 3).astype(u32)
            keep = out_ref[0, 0, wi] & ((u32(1) << sh) - u32(1))
            out_ref[0, 0, wi] = keep | (src4(pw, d4) << sh)
            last = (p + length - 1) >> 2
            nw = last - wi

            # word loop: the source advances by whole words, so the
            # sub-word shift is loop-INVARIANT — hoist it — and trip k's
            # low source word is trip k-1's high word, so carry it instead
            # of reloading. The only hazard is d4==4 (source word == the
            # word stored one trip earlier): there sh_s==0 and the copy
            # degenerates to "repeat the stored word", so the carry is the
            # stored value itself. Chip-NEUTRAL vs the reload form (171.9
            # vs 171.6 MB/s — matches average ~1 trip/row, so the per-trip
            # saving is ILP the scalar unit already hid); kept for the
            # fewer issued loads on long-match corpora.
            sp0 = ((wi + 1) << 2) - d4
            swi0 = sp0 >> 2
            sh_s = ((sp0 & 3) << 3).astype(u32)
            rep4 = swi0 == wi  # d4 == 4: aligned previous-word repeat

            def wf(k, w0):
                w1 = out_ref[0, 0, swi0 + k + 1]
                val = (w0 >> sh_s) | jnp.where(
                    sh_s > 0, (w1 << 1) << (u32(31) - sh_s), u32(0)
                )
                out_ref[0, 0, wi + 1 + k] = val
                return jnp.where(rep4, val, w1)

            lax.fori_loop(0, nw, wf, out_ref[0, 0, swi0])

        def walker(k, _):
            s = w_blk * S_BLK + k
            p0 = offs_ref[0, 0, s]
            p1 = offs_ref[0, 0, s + 1]

            def cond(st):
                t, p = st
                return (t < capw) & (p < p1)

            def body(st):
                t, p = st
                tokA = tapeA_ref[0, k, t]
                tokB = tapeB_ref[0, k, t]
                cnt = (tokB & u32(7)).astype(jnp.int32)
                # literal funnel: up to 4 bytes, at most one word boundary
                sh = ((p & 3) << 3).astype(u32)
                reg = out_ref[0, 0, p >> 2] & ((u32(1) << sh) - u32(1))
                full = reg | (tokA << sh)
                spill = (tokA >> u32(1)) >> (u32(31) - sh)
                p2 = p + cnt
                out_ref[0, 0, p >> 2] = full
                crossed = (p2 >> 2) > (p >> 2)
                out_ref[0, 0, jnp.where(crossed, p2 >> 2, p >> 2)] = (
                    jnp.where(crossed, spill, full)
                )
                has = (tokB & u32(8)) > 0
                length = jnp.where(
                    has, ((tokB >> 4) & u32(0xFF)).astype(jnp.int32) + 3, 0
                )
                dist = ((tokB >> 12) & u32(0xFFFF)).astype(jnp.int32)

                # scalar-unit sprint rule: pay the match machinery per
                # MATCH, not per row — matchless (4-literal) rows dominate
                # on literal-dense/binary data and were paying copy_match's
                # whole word-write tail for nothing
                @pl.when(has)
                def _():
                    copy_match(p2, length, dist)
                # all-zero row = tape terminator (under-produced walkers
                # are flagged upstream via rem != 0)
                t2 = jnp.where(tokB != 0, t + 1, capw)
                return (t2, p2 + length)

            lax.while_loop(cond, body, (jnp.int32(0), p0))
            return 0

        lax.fori_loop(0, S_BLK, walker, 0)

    return kernel


def expand_tokens_pallas2(tapeA, tapeB, offs, *, S: int, cap: int,
                          out_words: int, interpret: bool = False):
    """Two-plane variant of expand_tokens_pallas."""
    from jax.experimental.pallas import tpu as pltpu

    B = tapeA.shape[0]
    S_BLK = 8
    grid = (B, S // S_BLK)
    offs3 = offs.reshape(B, 1, offs.shape[1])
    tape_spec = pl.BlockSpec(
        (1, S_BLK, cap), lambda c, w: (c, w, 0), memory_space=pltpu.SMEM
    )
    return pl.pallas_call(
        _make_expand_kernel2(S_BLK, cap, out_words),
        grid=grid,
        in_specs=[
            tape_spec,
            tape_spec,
            pl.BlockSpec(
                (1, 1, offs.shape[1]), lambda c, w: (c, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, out_words), lambda c, w: (c, 0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, out_words), jnp.uint32),
        interpret=interpret,
    )(tapeA, tapeB, offs3).reshape(B, out_words)


@functools.partial(jax.jit, static_argnames=("cap", "K", "interpret"))
def decode_tokens_vector2(
    fifo, ll_lim, ll_pack, w0, w1, w2, d_lim, d_pack, dw, align, span,
    *, cap: int, K: int, interpret: bool = False,
):
    """Two-plane variant of decode_tokens_vector: returns
    (tapeA, tapeB, cons, bad, rem)."""
    G = fifo.shape[0]
    grid = (G,)
    t_spec = pl.BlockSpec((None, 8, 128), lambda g: (g, 0, 0))
    out = pl.pallas_call(
        _make_kernel2(cap, K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, K, 8, 128), lambda g: (g, 0, 0, 0)),
            t_spec, t_spec, t_spec, t_spec, t_spec,
            t_spec, t_spec, t_spec, t_spec, t_spec,
        ],
        out_specs=[
            pl.BlockSpec((None, cap, 8, 128), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((None, cap, 8, 128), lambda g: (g, 0, 0, 0)),
            t_spec, t_spec, t_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, cap, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((G, cap, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(fifo, ll_lim, ll_pack, w0, w1, w2, d_lim, d_pack, dw, align, span)
    return tuple(out)
