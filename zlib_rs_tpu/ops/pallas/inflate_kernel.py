"""Pallas TPU kernel: full sequential RFC 1951 inflate, one raw deflate
stream per grid step, every operand SMEM-resident.

Chip-measured primitives (experiments/probe_scalar.py on v5e):
  * serial dependent SMEM loads: ~8 ns/step; independent scalar ops are
    ~1 ns and hide under the ~8 ns loop overhead;
  * dynamic scalar loads from VMEM crash Mosaic, and scalar stores to
    VMEM are rejected ("Cannot store scalars to VMEM") — so EVERYTHING
    the decode loop touches randomly (compressed words, decode tables,
    the output window) must live in SMEM (~512 KiB usable);
  * blocked SMEM operands over a batch need the (B, 1, N) shape trick
    (block (1, 1, N)); 2D (1, N) blocks of a (B, N) array are rejected.

This is the reference's inflate hot path (zlib-rs/src/inflate.rs:1885-2163
`inflate_fast` + the Table/LenLens/CodeLens states of `dispatch`,
inflate.rs:1609-1700) re-homed onto the TensorCore scalar unit: the
bitstream stays serial per stream exactly as the format demands, streams
are the (sequential, DMA-overlapped) grid axis, and VMEM/HBM are only
touched by the automatic block pipeline at stream boundaries.

Unlike the round-2 flat-LUT kernel this one handles COMPLETE streams:
multi-block bodies, stored blocks, fixed blocks, dynamic header parsing
and two-level table construction (inflate/inftrees.rs:42-339 semantics)
all happen in-kernel, so any raw-deflate payload that fits the SMEM
budget decodes — our pipeline's chunk bodies AND foreign streams (zran
regions, whole small members). Callers must treat a truthy `bad` lane as
"fall back to an exact engine".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# table entry: kind(3b @28) | extra(6b @22) | nbits(6b @16) | val(16b @0)
KIND_LIT = 0
KIND_MATCH = 1
KIND_EOB = 2
KIND_SUB = 3
KIND_INVALID = 7

LL_ROOT = 9  # litlen root bits; ENOUGH(286, 9, 15) = 852
D_ROOT = 6  # dist root bits; ENOUGH(30, 6, 15) = 592
CL_ROOT = 7  # code-length codes are <= 7 bits: single-level
LL_CAP = 852
D_CAP = 592
CL_CAP = 128



def _entry(kind, extra, nbits, val):
    return (
        (kind.astype(jnp.uint32) << jnp.uint32(28))
        | (extra.astype(jnp.uint32) << jnp.uint32(22))
        | (nbits.astype(jnp.uint32) << jnp.uint32(16))
        | val.astype(jnp.uint32)
    )


def _e_kind(e):
    return (e >> jnp.uint32(28)).astype(jnp.int32)


def _e_extra(e):
    return ((e >> jnp.uint32(22)) & jnp.uint32(0x3F)).astype(jnp.int32)


def _e_nbits(e):
    return ((e >> jnp.uint32(16)) & jnp.uint32(0x3F)).astype(jnp.int32)


def _e_val(e):
    return (e & jnp.uint32(0xFFFF)).astype(jnp.int32)


def _len_entry_fields(sym):
    """(kind, extra, base) for a litlen symbol, fully arithmetic (the
    LENGTH_BASE/LENGTH_EXTRA tables derived, not transcribed)."""
    c = sym - 257
    e = jnp.maximum(0, (c - 4) >> 2)
    base = jnp.where(c < 4, c + 3, 3 + ((4 + (c & 3)) << e))
    base = jnp.where(c == 28, 258, base)
    extra = jnp.where(c == 28, 0, e)
    kind = jnp.where(
        sym < 256,
        KIND_LIT,
        jnp.where(sym == 256, KIND_EOB, jnp.where(c < 29, KIND_MATCH, KIND_INVALID)),
    )
    base = jnp.where(sym < 256, sym, jnp.where(sym == 256, 0, base))
    extra = jnp.where(sym <= 256, 0, extra)
    return kind, extra, base


def _dist_entry_fields(sym):
    e = jnp.maximum(0, (sym >> 1) - 1)
    base = jnp.where(sym < 2, sym + 1, 1 + ((2 + (sym & 1)) << e))
    kind = jnp.where(sym < 30, KIND_MATCH, KIND_INVALID)
    return kind, e, jnp.where(sym < 30, base, 0)


def _make_kernel(one_level: bool):
    """Kernel factory. one_level=True builds FLAT decode tables (root = max
    code length, <= 15): the hot loop does ONE table load per code instead
    of the root->sub dependent pair — the per-literal critical path is the
    chip-measured ~64ns -> ~40ns lever (experiments/bench_ilk.py) — at the
    price of up to 2^15-entry tables (adaptive: init/fill cost is
    2^maxlen, so typical level-6 trees pay 2^12..2^14). one_level=False is
    the classic two-level inftrees layout for large-max_out callers where
    SMEM can't hold 2x128 KiB tables."""

    def kernel(meta_ref, clord_ref, words_ref, win_ref, out_ref, st_ref,
               lltab, dtab, cltab, lens, work, cnt, offs):
        return _kernel_body(
            one_level, meta_ref, clord_ref, words_ref, win_ref, out_ref,
            st_ref, lltab, dtab, cltab, lens, work, cnt, offs,
        )

    return kernel


def _kernel_body(
    one_level,
    meta_ref,  # SMEM i32 (1,1,8): start_bit, comp_bits, out_len, max_out_b,
    #            win_words (output positions start at 4*win_words; the
    #            window is pre-copied there so back-references reach it)
    clord_ref,  # SMEM i32 (1,1,32): code-length code order (RFC 1951)
    words_ref,  # SMEM u32 (1,1,W): LE32-packed compressed bytes
    win_ref,  # SMEM u32 (1,1,WW): LE32-packed window bytes (zran priming)
    out_ref,  # SMEM u32 (1,1,OW): LE32-packed output bytes
    st_ref,  # SMEM i32 (1,1,8): produced, bad, end_bitpos
    lltab,  # SMEM u32 scratch (1, LL_CAP or 2^15)
    dtab,  # SMEM u32 scratch (1, D_CAP or 2^15)
    cltab,  # SMEM u32 scratch (1, CL_CAP)
    lens,  # SMEM i32 scratch (1, 320): ll lens | dist lens
    work,  # SMEM i32 scratch (1, 320): symbols sorted by (len, sym)
    cnt,  # SMEM i32 scratch (1, 16)
    offs,  # SMEM i32 scratch (1, 16)
):
    _U1 = jnp.uint32(1)
    _U0 = jnp.uint32(0)
    start_bit = meta_ref[0, 0, 0]
    comp_bits = meta_ref[0, 0, 1]
    out_len = meta_ref[0, 0, 2]  # expected output bytes; <0 = unknown
    max_out = meta_ref[0, 0, 3]

    def peek32(bitpos):
        wi = bitpos >> 5
        sh = (bitpos & 31).astype(jnp.uint32)
        w0 = words_ref[0, 0, wi]
        w1 = words_ref[0, 0, wi + 1]
        return jnp.where(sh > 0, (w0 >> sh) | (w1 << (jnp.uint32(32) - sh)), w0)

    def out_byte_read(pos):
        w = out_ref[0, 0, pos >> 2]
        sh = ((pos & 3) << 3).astype(jnp.uint32)
        return (w >> sh) & jnp.uint32(0xFF)

    def out_byte_write(pos, b):
        wi = pos >> 2
        sh = ((pos & 3) << 3).astype(jnp.uint32)
        w = out_ref[0, 0, wi]
        out_ref[0, 0, wi] = (w & ~(jnp.uint32(0xFF) << sh)) | (
            b.astype(jnp.uint32) << sh
        )

    _OW = out_ref.shape[2]
    _DEAD = _OW - 1

    # ---- deferred LZ copy execution -------------------------------------
    # UNIVERSAL copy — one code path for every distance (the round-2
    # three-way cond tree cost ~10ns per cond, probe_loopcost). A 4-byte
    # source window at p-dist is made periodic for dist < 4
    # (d[j] = d[j - dist] within the same word), so the word loop is valid
    # for all distances.
    def _src4(p, dist):
        # 4 source bytes for destination position p
        s0 = p - dist
        swi = jnp.clip(s0 >> 2, 0, _DEAD - 1)
        ssh = ((s0 & 3) << 3).astype(jnp.uint32)
        w0 = out_ref[0, 0, swi]
        w1 = out_ref[0, 0, swi + 1]
        v = jnp.where(ssh > 0, (w0 >> ssh) | (w1 << (jnp.uint32(32) - ssh)), w0)
        v = jnp.where(
            dist == 1,
            (v & jnp.uint32(0xFF)) * jnp.uint32(0x01010101),
            jnp.where(
                dist == 2,
                (v & jnp.uint32(0xFFFF)) * jnp.uint32(0x00010001),
                jnp.where(
                    dist == 3,
                    (v & jnp.uint32(0xFFFFFF))
                    | ((v & jnp.uint32(0xFF)) << jnp.uint32(24)),
                    v,
                ),
            ),
        )
        return v

    def _masked_store(p, nby, v):
        # store nby source bytes (0..4) at p, all in one word
        sh = ((p & 3) << 3).astype(jnp.uint32)
        m = jnp.where(
            nby == 0,
            _U0,
            jnp.uint32(0xFFFFFFFF) >> ((4 - nby) << 3).astype(jnp.uint32),
        ) << sh
        wi = jnp.where(nby > 0, jnp.minimum(p >> 2, _DEAD), _DEAD)
        old = out_ref[0, 0, wi]
        out_ref[0, 0, wi] = (old & ~m) | ((v << sh) & m)

    def _copy_match(p, length, dist):
        head = jnp.minimum((4 - (p & 3)) & 3, length)
        _masked_store(p, head, _src4(p, dist))
        nwords = (length - head) >> 2
        wbase = (p + head) >> 2

        def wf(k, _):
            out_ref[0, 0, wbase + k] = _src4((wbase + k) << 2, dist)
            return 0

        lax.fori_loop(0, nwords, wf, 0)
        tail0 = p + head + (nwords << 2)
        _masked_store(tail0, p + length - tail0, _src4(tail0, dist))


    # ---- two-level canonical table build (inftrees.rs:42-339 semantics) --
    def build_table(tab_ref, cap, nsyms, lens_base, root_in, kind_of):
        """Build a decode table from lens[lens_base : lens_base+nsyms].

        kind_of: 0=CODES (val=symbol), 1=LENS, 2=DISTS. Returns
        (root_bits, bad). Table entries cover every root index; codes
        longer than root live in subtables linked by KIND_SUB entries.
        """
        def zcnt(i, _):
            cnt[0, i] = 0
            return 0

        lax.fori_loop(0, 16, zcnt, 0)

        def count(i, _):
            l = lens[0, lens_base + i]

            @pl.when(l > 0)
            def _():
                cnt[0, l] = cnt[0, l] + 1

            return 0

        lax.fori_loop(0, nsyms, count, 0)

        def mx(i, m):
            return jnp.where(cnt[0, i] > 0, i, m)

        maxlen = lax.fori_loop(1, 16, mx, jnp.int32(0))

        def mn(i, m):
            j = 16 - i
            return jnp.where(cnt[0, j] > 0, j, m)

        minlen = lax.fori_loop(1, 16, mn, jnp.int32(15))

        root = jnp.clip(root_in, minlen, jnp.maximum(maxlen, 1))

        # Kraft: over-subscription is always bad; incomplete is bad except
        # a <=1-code DISTS table (inftrees.rs tolerance rules)
        def kraft(i, st):
            left, ncodes = st
            c = cnt[0, i]
            return (left * 2 - c, ncodes + c)

        left, ncodes = lax.fori_loop(1, 16, kraft, (jnp.int32(1), jnp.int32(0)))
        # left can overflow through intermediate doubling only if counts
        # are absurd; counts <= nsyms <= 320 keeps it in range (2^15 max)
        bad = (left < 0) | ((left > 0) & ~((kind_of == 2) & (ncodes <= 1)))
        bad = bad | (maxlen == 0)

        # counting sort: work[] = symbols ordered by (len, sym)
        offs[0, 1] = 0

        def prefix(i, _):
            offs[0, i] = offs[0, i - 1] + cnt[0, i - 1]
            return 0

        lax.fori_loop(2, 16, prefix, 0)

        def place(i, _):
            l = lens[0, lens_base + i]

            @pl.when(l > 0)
            def _():
                o = offs[0, l]
                work[0, o] = i
                offs[0, l] = o + 1

            return 0

        lax.fori_loop(0, nsyms, place, 0)

        # all-invalid init (covers unreferenced slots + incomplete codes).
        # One-level mode only ever indexes 1 << root slots (root == maxlen),
        # so init adapts to the actual tree instead of paying cap.
        inv = _entry(jnp.int32(KIND_INVALID), jnp.int32(0), root, jnp.int32(0))

        def zinit(i, _):
            tab_ref[0, i] = inv
            return 0

        lax.fori_loop(0, (jnp.int32(1) << root) if one_level else cap, zinit, 0)

        # ordered walk: huff = LSB-first code, incremented in reversed
        # space; subtables opened when a code exceeds root bits
        def code_step(k, st):
            huff, low, drop, curr, sub_off, used, b = st
            sym = work[0, k]
            l = lens[0, lens_base + sym]

            start_sub = (l > root) & ((huff & ((_U1 << root.astype(jnp.uint32)) - _U1)).astype(jnp.int32) != low)

            def open_sub(st2):
                huff, low, drop, curr, sub_off, used, b = st2
                drop = root
                # size the subtable: smallest c with room for the codes
                # that share this root prefix (Kraft over remaining counts)
                def size_step(st3):
                    c, left = st3
                    left = left - cnt[0, c + drop]
                    grow = (left > 0) & (c + drop < maxlen)
                    return jnp.where(grow, c + 1, c), jnp.where(
                        grow, left * 2, left
                    )

                def size_cond(st3):
                    c, left = st3
                    return (left > 0) & (c + drop < maxlen)

                c0 = l - drop
                c, _left = lax.while_loop(
                    size_cond, size_step, (c0, jnp.int32(1) << c0)
                )
                sub_off = used
                used = used + (jnp.int32(1) << c)
                low = (huff & ((_U1 << root.astype(jnp.uint32)) - _U1)).astype(jnp.int32)
                b = b | (used > cap)

                @pl.when(~b)
                def _():
                    tab_ref[0, low] = _entry(
                        jnp.int32(KIND_SUB), c, root, sub_off
                    )

                return huff, low, drop, c, sub_off, used, b

            huff, low, drop, curr, sub_off, used, b = lax.cond(
                start_sub,
                open_sub,
                lambda st2: st2,
                (huff, low, drop, curr, sub_off, used, b),
            )

            # entry for this symbol
            kind, extra, val = lax.switch(
                kind_of,
                [
                    lambda s: (jnp.int32(KIND_LIT), jnp.int32(0), s),
                    _len_entry_fields,
                    _dist_entry_fields,
                ],
                sym,
            )
            ent = _entry(kind, extra, l, val)

            # replicate into all slots of the region whose low (l-drop)
            # bits equal huff >> drop
            base = jnp.where(drop > 0, sub_off, 0)
            idx = (huff >> drop.astype(jnp.uint32)).astype(jnp.int32)
            step = jnp.int32(1) << (l - drop)
            region = jnp.int32(1) << jnp.where(drop > 0, curr, root)

            def fill(st3):
                f, bb = st3
                f = f - step
                slot = base + idx + f
                bb = bb | (slot >= cap) | (slot < 0)

                @pl.when(~bb)
                def _():
                    tab_ref[0, slot] = ent

                return f, bb

            def fill_cond(st3):
                f, _bb = st3
                return f > 0

            _f, b = lax.while_loop(fill_cond, fill, (region, b))

            # placed codes leave the counts so that later subtable sizing
            # sees only the REMAINING codes (inftrees decrements count[len]
            # per emitted code; without this, subtables under-size and
            # adjacent codes collide)
            cnt[0, l] = cnt[0, l] - 1

            # increment huff in reversed bit order
            incr0 = _U1 << (l - 1).astype(jnp.uint32)

            def down(st3):
                return st3 >> _U1

            def down_cond(st3):
                return (huff & st3) > 0

            incr = lax.while_loop(down_cond, down, incr0)
            huff = jnp.where(
                incr > 0, (huff & (incr - _U1)) + incr, _U0
            )
            return huff, low, drop, curr, sub_off, used, b

        init = (
            _U0,
            jnp.int32(-1),
            jnp.int32(0),
            root,
            jnp.int32(0),
            jnp.int32(1) << root,
            bad,
        )
        _h, _lo, _dr, _cu, _so, _us, bad = lax.fori_loop(
            0, ncodes, code_step, init
        )
        return root, bad

    # ---- block-type handlers ---------------------------------------------
    def stored_block(bitpos, outpos, bad):
        # align to byte, read LEN/NLEN, bulk byte copy
        bitpos = (bitpos + 7) & ~jnp.int32(7)
        w = peek32(bitpos)
        ln = (w & jnp.uint32(0xFFFF)).astype(jnp.int32)
        nln = (w >> jnp.uint32(16)).astype(jnp.int32)
        bitpos = bitpos + 32
        bad = bad | ((ln ^ 0xFFFF) != nln)
        bad = bad | (bitpos + ln * 8 > comp_bits + 32)
        bad = bad | (outpos + ln > max_out)

        def copy_byte(j, _):
            v = peek32(bitpos + (j << 3)) & jnp.uint32(0xFF)
            out_byte_write(outpos + j, v)
            return 0

        @pl.when(~bad)
        def _():
            # dst-aligned word copy (bitpos is byte-aligned here)
            head = jnp.minimum((4 - (outpos & 3)) & 3, ln)
            lax.fori_loop(0, head, copy_byte, 0)
            nwords = (ln - head) >> 2
            wbase = (outpos + head) >> 2
            s0 = (bitpos >> 3) + head
            swi = s0 >> 2
            ssh = ((s0 & 3) << 3).astype(jnp.uint32)

            def wf(k, _):
                w0 = words_ref[0, 0, swi + k]
                w1 = words_ref[0, 0, swi + k + 1]
                v = jnp.where(
                    ssh > 0, (w0 >> ssh) | (w1 << (jnp.uint32(32) - ssh)), w0
                )
                out_ref[0, 0, wbase + k] = v
                return 0

            lax.fori_loop(0, nwords, wf, 0)
            tail0 = head + (nwords << 2)

            def tb(j, _):
                return copy_byte(tail0 + j, _)

            lax.fori_loop(0, ln - tail0, tb, 0)

        return (
            jnp.where(bad, bitpos, bitpos + (ln << 3)),
            jnp.where(bad, outpos, outpos + ln),
            bad,
        )

    def fixed_lens():
        # litlen: 0-143 -> 8, 144-255 -> 9, 256-279 -> 7, 280-287 -> 8
        def fl(i, _):
            l = jnp.where(
                i < 144, 8, jnp.where(i < 256, 9, jnp.where(i < 280, 7, 8))
            )
            lens[0, i] = l
            return 0

        lax.fori_loop(0, 288, fl, 0)

        def fd(i, _):
            lens[0, 288 + i] = 5
            return 0

        lax.fori_loop(0, 32, fd, 0)

    def dynamic_header(bitpos, bad):
        """Parse HLIT/HDIST/HCLEN + the code-length stream into lens[]
        (ll at 0, dist at nlen). Returns (bitpos, nlen, ndist, bad)."""
        w = peek32(bitpos)
        nlen = (w & jnp.uint32(31)).astype(jnp.int32) + 257
        ndist = ((w >> jnp.uint32(5)) & jnp.uint32(31)).astype(jnp.int32) + 1
        hclen = ((w >> jnp.uint32(10)) & jnp.uint32(15)).astype(jnp.int32) + 4
        bitpos = bitpos + 14
        bad = bad | (nlen > 286) | (ndist > 30)

        def zcl(i, _):
            lens[0, i] = 0
            return 0

        lax.fori_loop(0, 19, zcl, 0)

        def rdcl(i, st):
            bp = st

            @pl.when(i < hclen)
            def _():
                lens[0, clord_ref[0, 0, i]] = (
                    peek32(bp) & jnp.uint32(7)
                ).astype(jnp.int32)

            return jnp.where(i < hclen, bp + 3, bp)

        bitpos = lax.fori_loop(0, 19, rdcl, bitpos)
        clroot, clbad = build_table(
            cltab, CL_CAP, jnp.int32(19), jnp.int32(0), jnp.int32(CL_ROOT), 0
        )
        bad = bad | clbad
        cl_mask = (jnp.uint32(1) << clroot.astype(jnp.uint32)) - jnp.uint32(1)

        # decode nlen+ndist code lengths with repeats
        total = nlen + ndist

        def rd_cond(st):
            i, bp, _prev, b = st
            return (i < total) & ~b

        def rd_body(st):
            i, bp, prev, b = st
            w = peek32(bp)
            e = cltab[0, (w & cl_mask).astype(jnp.int32)]
            nb = _e_nbits(e)
            sym = _e_val(e)
            b = b | (_e_kind(e) == KIND_INVALID)
            bp = bp + nb
            w2 = peek32(bp)

            def lit(args):
                i, bp, prev, b = args
                lens[0, i] = sym
                return i + 1, bp, sym, b

            def rep(args):
                i, bp, prev, b = args
                is16 = sym == 16
                is17 = sym == 17
                ebits = jnp.where(is16, 2, jnp.where(is17, 3, 7))
                rbase = jnp.where(is16, 3, jnp.where(is17, 3, 11))
                r = (
                    w2 & ((_U1 << ebits.astype(jnp.uint32)) - _U1)
                ).astype(jnp.int32) + rbase
                v = jnp.where(is16, prev, 0)
                b = b | (is16 & (i == 0)) | (i + r > total)

                def put(j, _):
                    @pl.when(i + j < total)
                    def _():
                        lens[0, i + j] = v

                    return 0

                @pl.when(~b)
                def _():
                    lax.fori_loop(0, r, put, 0)

                return i + r, bp + ebits, v, b

            return lax.cond(sym < 16, lit, rep, (i, bp, prev, b))

        i, bitpos, _prev, bad = lax.while_loop(
            rd_cond, rd_body, (jnp.int32(0), bitpos, jnp.int32(-1), bad)
        )
        bad = bad | (bitpos > comp_bits + 32)
        # dist lens move to lens[288:]; the source range [nlen, nlen+ndist)
        # can overlap the destination when nlen > 256, so copy from the
        # highest index down
        def mv(i, _):
            j = 31 - i

            @pl.when(j < ndist)
            def _():
                lens[0, 288 + j] = lens[0, nlen + j]

            return 0

        lax.fori_loop(0, 32, mv, 0)
        # end-of-block code must exist (RFC: code 256 gets a length)
        bad = bad | (lens[0, 256] == 0)
        return bitpos, nlen, ndist, bad

    def coded_block(bitpos, outpos, bad, nlen, ndist):
        """Decode symbols until EOB using lltab/dtab built from lens[]."""
        ll_root_in = 15 if one_level else LL_ROOT
        d_root_in = 15 if one_level else D_ROOT
        ll_cap = lltab.shape[1]
        d_cap = dtab.shape[1]
        ll_root, b1 = build_table(
            lltab, ll_cap, nlen, jnp.int32(0), jnp.int32(ll_root_in), 1
        )
        d_root, b2 = build_table(
            dtab, d_cap, ndist, jnp.int32(288), jnp.int32(d_root_in), 2
        )
        bad = bad | b1 | b2
        ll_mask = (_U1 << ll_root.astype(jnp.uint32)) - _U1
        d_mask = (_U1 << d_root.astype(jnp.uint32)) - _U1
        DEAD = _DEAD  # slack word for clamped literal stores

        # The decode loop is ALU-ISSUE-bound: the scalar unit issues ~1
        # op/ns and overlaps independent loads (experiments/probe_ilp.py),
        # so throughput == ops per symbol. Chip-ablated structure
        # (experiments/bench_ilk.py):
        #   * literals — the common symbol — run in a dedicated SPRINT
        #     loop whose condition is "the next code is a literal": the
        #     sprint body carries ZERO match machinery (a match lax.cond
        #     costs ~14ns per symbol even when never taken), and
        #     non-literal codes are handled once per occurrence outside;
        #   * literals accumulate in an output-word REGISTER (oword),
        #     flushed with a plain store — no per-literal RMW load chain;
        #   * matches copy word-at-a-time through ONE universal path (a
        #     periodic 4-byte source window handles dist < 4).

        def peek_sym(bp):
            w = peek32(bp)
            i0 = (w & ll_mask).astype(jnp.int32)
            if one_level:
                # flat table: ONE load resolves the code
                e = lltab[0, i0]
            else:
                # branchless two-level lookup: always two loads (the second
                # re-reads the root slot for short codes) — a taken
                # lax.cond costs far more than the extra SMEM load
                e0 = lltab[0, i0]
                is_sub = _e_kind(e0) == KIND_SUB
                sub_idx = _e_val(e0) + (
                    (w >> ll_root.astype(jnp.uint32))
                    & ((_U1 << _e_extra(e0).astype(jnp.uint32)) - _U1)
                ).astype(jnp.int32)
                e = lltab[0, jnp.where(is_sub, sub_idx, i0)]
            return w, e

        def sprint_cond(st):
            bp, op, oword, w, e = st
            return (_e_kind(e) == KIND_LIT) & (bp <= comp_bits)

        def sprint_body(st):
            # consumes ONE guaranteed literal, then opportunistically a
            # SECOND one (pairs amortize the fixed per-iteration costs:
            # ~55% of text literals are followed by another literal)
            bp, op, oword, w, e = st
            osh = ((op & 3) << 3).astype(jnp.uint32)
            ow2 = oword | ((e & jnp.uint32(0xFF)) << osh)
            out_ref[0, 0, jnp.minimum(op >> 2, DEAD)] = ow2
            oword = jnp.where((op & 3) == 3, _U0, ow2)
            bp = bp + _e_nbits(e)
            op = op + 1
            w, e = peek_sym(bp)
            lit2 = (_e_kind(e) == KIND_LIT) & (bp <= comp_bits)
            osh2 = ((op & 3) << 3).astype(jnp.uint32)
            ow3 = jnp.where(lit2, oword | ((e & jnp.uint32(0xFF)) << osh2), oword)
            out_ref[0, 0, jnp.where(lit2, jnp.minimum(op >> 2, DEAD), DEAD)] = ow3
            oword = jnp.where(lit2 & ((op & 3) == 3), _U0, ow3)
            bp = bp + jnp.where(lit2, _e_nbits(e), 0)
            op = op + lit2.astype(jnp.int32)
            # idempotent when the second literal didn't fire (same bp)
            w, e = peek_sym(bp)
            return bp, op, oword, w, e

        def s_cond(st):
            bp, op, oword, b, eob = st
            return ~(b | eob) & (bp <= comp_bits)

        def s_body(st):
            bp, op, oword, b, eob = st
            w, e = peek_sym(bp)
            bp, op, oword, w, e = lax.while_loop(
                sprint_cond, sprint_body, (bp, op, oword, w, e)
            )
            # sprint exits on a non-literal code or bit exhaustion; output
            # bounds are settled here, amortized over the whole run (the
            # sprint's stores clamp to the slack word, so an overrun is
            # safe and flagged once)
            b = b | (op > max_out)
            exhausted = bp > comp_bits
            kind = _e_kind(e)
            nb = _e_nbits(e)
            is_eob = (kind == KIND_EOB) & ~exhausted
            is_match = (kind == KIND_MATCH) & ~exhausted
            b = b | (~exhausted & ~(is_eob | is_match))
            bp = bp + jnp.where(is_eob, nb, 0)

            def do_match(args):
                bp, op, oword, b = args
                # length extra rides the same 32-bit window (code <= 15
                # bits + extra <= 5 bits)
                lext = _e_extra(e)
                length = _e_val(e) + (
                    (w >> nb.astype(jnp.uint32))
                    & ((_U1 << lext.astype(jnp.uint32)) - _U1)
                ).astype(jnp.int32)
                bp = bp + nb + lext
                # one fresh window for dist code + dist extra (<= 28 bits)
                w2 = peek32(bp)
                j0 = (w2 & d_mask).astype(jnp.int32)
                if one_level:
                    de = dtab[0, j0]
                else:
                    de0 = dtab[0, j0]
                    d_is_sub = _e_kind(de0) == KIND_SUB
                    d_sub_idx = _e_val(de0) + (
                        (w2 >> d_root.astype(jnp.uint32))
                        & ((_U1 << _e_extra(de0).astype(jnp.uint32)) - _U1)
                    ).astype(jnp.int32)
                    de = dtab[0, jnp.where(d_is_sub, d_sub_idx, j0)]
                b = b | (_e_kind(de) != KIND_MATCH)
                dnb = _e_nbits(de)
                dext = _e_extra(de)
                dist = _e_val(de) + (
                    (w2 >> dnb.astype(jnp.uint32))
                    & ((_U1 << dext.astype(jnp.uint32)) - _U1)
                ).astype(jnp.int32)
                bp = bp + dnb + dext
                b = b | (dist > op) | (op + length > max_out) | (dist < 1)

                @pl.when(~b)
                def _():
                    _copy_match(op, length, dist)

                op2 = jnp.where(b, op, op + length)
                # resync the literal register with what the copy produced
                oword = out_ref[0, 0, jnp.minimum(op2 >> 2, DEAD)] & (
                    (_U1 << ((op2 & 3) << 3).astype(jnp.uint32)) - _U1
                )
                return bp, op2, oword, b

            bp, op, oword, b = lax.cond(
                is_match, do_match, lambda a: a, (bp, op, oword, b)
            )
            return bp, op, oword, b, eob | is_eob

        oword0 = out_ref[0, 0, jnp.minimum(outpos >> 2, DEAD)] & (
            (_U1 << ((outpos & 3) << 3).astype(jnp.uint32)) - _U1
        )
        bitpos, outpos, _ow, bad, _eob = lax.while_loop(
            s_cond,
            s_body,
            (bitpos, outpos, oword0, bad, jnp.bool_(False)),
        )
        return bitpos, outpos, bad

    # ---- block loop --------------------------------------------------------
    def blk_cond(st):
        bp, op, b, done, _fin = st
        return ~(b | done)

    def blk_body(st):
        bp, op, b, done, fin_seen = st
        w = peek32(bp)
        final = (w & _U1).astype(jnp.int32)
        btype = ((w >> _U1) & jnp.uint32(3)).astype(jnp.int32)
        bp = bp + 3
        b = b | (btype == 3) | (bp > comp_bits)

        def do_stored(args):
            bp, op, b = args
            return stored_block(bp, op, b)

        def do_fixed(args):
            bp, op, b = args
            fixed_lens()
            return coded_block(bp, op, b, jnp.int32(288), jnp.int32(32))

        def do_dyn(args):
            bp, op, b = args
            bp, nlen, ndist, b = dynamic_header(bp, b)
            return lax.cond(
                b,
                lambda a: a,
                lambda a: coded_block(a[0], a[1], a[2], nlen, ndist),
                (bp, op, b),
            )

        bp, op, b = lax.switch(
            jnp.clip(btype, 0, 2), [do_stored, do_fixed, do_dyn], (bp, op, b)
        )
        done = (final > 0) | ((out_len >= 0) & (op >= out_len)) | (
            bp >= comp_bits
        )
        return bp, op, b, done, fin_seen | ((final > 0) & ~b)

    # zran-style window priming: pre-copy the window words into the output
    # head so back-references into history resolve naturally; the region's
    # own output starts at 4*win_words (out_len/max_out arrive pre-shifted)
    nwin = meta_ref[0, 0, 4]

    def wcp(i, _):
        out_ref[0, 0, i] = win_ref[0, 0, i]
        return 0

    lax.fori_loop(0, nwin, wcp, 0)

    bitpos, outpos, bad, _done, fin_seen = lax.while_loop(
        blk_cond, blk_body,
        (start_bit, nwin << 2, jnp.bool_(False), jnp.bool_(False),
         jnp.bool_(False)),
    )
    # meta[5] = stop mode: 0 -> out_len is an exact-length assertion;
    # 1 -> out_len is a checkpoint TARGET (stop at the first block boundary
    # at or after it; overshoot within max_out is fine) — the device-side
    # streaming snapshot contract (SURVEY §5 checkpoint row; the TPU
    # analogue of inflateCopy/inflatePrime, inflate.rs:2547/2165)
    at_target = meta_ref[0, 0, 5] != 0
    bad = bad | ((out_len >= 0) & (outpos != out_len) & ~at_target)
    st_ref[0, 0, 0] = outpos - (nwin << 2)
    st_ref[0, 0, 1] = bad.astype(jnp.int32)
    st_ref[0, 0, 2] = bitpos
    st_ref[0, 0, 3] = fin_seen.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("max_out", "interpret", "one_level", "stop_at_target")
)
def decode_streams_pallas(
    words, start_bits, comp_bits, out_lens, *,
    max_out: int, interpret: bool = False, one_level: bool | None = None,
    win=None, stop_at_target: bool = False,
):
    """Decode B raw-deflate streams, each fully in-SMEM on its grid step.

    words: uint32[B, W] LE32-packed compressed bytes (>= 2 words of zero
    tail padding); start_bits/comp_bits: first valid bit and total valid
    bits per stream; out_lens: expected output size (or -1 to decode to
    BFINAL). Returns (out u8[B, max_out], produced i32[B], bad bool[B],
    end_bit i32[B]).

    one_level selects flat (single-load) decode tables — faster, but their
    2x2^15-entry SMEM scratch only fits alongside buffers for max_out up to
    ~48 KiB; default picks automatically.

    win (uint8[B, WPAD], WPAD % 4 == 0) primes each stream's 32 KiB history
    window (zran access-point decode of foreign streams): the window bytes
    are RIGHT-aligned in the buffer (short windows lead with don't-care
    bytes a valid region never references) and get pre-copied into the
    output head; returned outputs/produced counts cover region bytes only.
    """
    B, W = words.shape
    wpad = 0 if win is None else win.shape[1]
    if wpad % 4:
        raise ValueError("win buffer length must be a multiple of 4")
    if one_level is None:
        one_level = max_out + wpad + (W * 4) <= 96 * 1024
    ll_cap = 1 << 15 if one_level else LL_CAP
    d_cap = 1 << 15 if one_level else D_CAP
    ow = (max_out + wpad + 3) // 4 + 1  # +1 slack word absorbing dead writes
    ww = max(1, wpad // 4)
    if win is None:
        win_w = jnp.zeros((B, 1, ww), jnp.uint32)
    else:
        wb = win.reshape(B, ww, 4).astype(jnp.uint32)
        win_w = (
            wb[:, :, 0] | (wb[:, :, 1] << 8) | (wb[:, :, 2] << 16)
            | (wb[:, :, 3] << 24)
        ).reshape(B, 1, ww)
    ol = out_lens.astype(jnp.int32)
    meta = jnp.stack(
        [
            start_bits.astype(jnp.int32),
            comp_bits.astype(jnp.int32),
            jnp.where(ol >= 0, ol + wpad, ol),
            jnp.full((B,), max_out + wpad, jnp.int32),
            jnp.full((B,), wpad // 4, jnp.int32),
            # stop mode: out_len as checkpoint target vs exact assertion
            jnp.full((B,), 1 if stop_at_target else 0, jnp.int32),
        ],
        axis=1,
    )
    meta = jnp.pad(meta, ((0, 0), (0, 2))).reshape(B, 1, 8)
    words3 = words.reshape(B, 1, W)
    clord = jnp.asarray(
        [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]
        + [0] * 13,
        jnp.int32,
    ).reshape(1, 1, 32)
    out_w, st = pl.pallas_call(
        _make_kernel(one_level),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 32), lambda b: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ww), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ow), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, ow), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1, ll_cap), jnp.uint32),
            pltpu.SMEM((1, d_cap), jnp.uint32),
            pltpu.SMEM((1, CL_CAP), jnp.uint32),
            pltpu.SMEM((1, 320), jnp.int32),
            pltpu.SMEM((1, 320), jnp.int32),
            pltpu.SMEM((1, 16), jnp.int32),
            pltpu.SMEM((1, 16), jnp.int32),
        ],
        interpret=interpret,
    )(meta, clord, words3, win_w)
    # LE32 words -> bytes; drop the window head
    out_b = jax.lax.shift_right_logical(
        out_w[:, 0, :, None],
        jnp.array([0, 8, 16, 24], jnp.uint32)[None, None, :],
    ).astype(jnp.uint8).reshape(B, ow * 4)[:, wpad : wpad + max_out]
    produced = st[:, 0, 0]
    bad = st[:, 0, 1] > 0
    end_bit = st[:, 0, 2]
    if stop_at_target:
        fin_seen = st[:, 0, 3] > 0
        return out_b, produced, bad, end_bit, fin_seen
    return out_b, produced, bad, end_bit


def pack_streams_words(payloads):
    """Host helper: pack byte strings into uint32[B, W] LE words with >= 2
    words of zero tail padding. Returns (words, comp_bits int32[B])."""
    import numpy as np

    B = len(payloads)
    maxlen = max((len(p) for p in payloads), default=0)
    W = (maxlen + 4) // 4 + 2
    arr = np.zeros((B, W * 4), np.uint8)
    bits = np.zeros((B,), np.int32)
    for i, p in enumerate(payloads):
        arr[i, : len(p)] = np.frombuffer(p, np.uint8)
        bits[i] = len(p) * 8
    words = arr.view("<u4")
    return words, bits
