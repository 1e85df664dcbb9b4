"""Pallas TPU kernel: K-way INTERLEAVED sequential inflate.

The single-stream kernel (inflate_kernel.py) is latency-bound: one stream's
decode is a serial chain of ~6.5-8 ns dependent SMEM loads (chip-measured,
experiments/probe_scalar.py). K streams' chains are mutually independent,
and the chip overlaps them: experiments/probe_ilp.py measures interleaved
SMEM pointer chases at 6.6 / 6.6 / 7.9 / 10.6 ns per iteration for
1 / 2 / 4 / 8 chains — i.e. 2-5x more chain-steps per second.

This kernel decodes K complete raw-deflate streams per grid step with ONE
fully-predicated loop body that advances every stream by one micro-step per
iteration (no lax.cond in the hot path — a taken cond serializes all K
streams). A micro-step is one of:

  * literal      — resolve a litlen code, write 1 output byte;
  * match-length — resolve a litlen length code (+extra bits);
  * match-dist   — resolve a dist code (+extra), arm the copier;
  * copy         — move up to 4 bytes of an armed match (1 masked RMW);
  * idle         — stream done/bad/awaiting a block transition.

Block transitions (header parse, stored-block bulk copy, canonical table
builds with inftrees.rs:42-339 subtable semantics — shared with the
single-stream kernel's design) are rare, so they run OUTSIDE the hot loop:
the inner loop exits whenever any stream hits an end-of-block, a
sequential per-stream lax.cond handles the transition, and the inner loop
re-enters. Everything every stream touches randomly stays SMEM-resident
(scalar VMEM access is unsupported); per-stream litlen+dist tables live in
one (K, 1444)-word scratch, header-build scratch is shared because
transitions never overlap.

Reference behavior mirrored: inflate_fast (zlib-rs/src/inflate.rs:1885-2163)
+ the Table/LenLens/CodeLens states of dispatch (inflate.rs:1609-1700).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zlib_rs_tpu.ops.pallas.inflate_kernel import (
    CL_CAP,
    CL_ROOT,
    D_CAP,
    D_ROOT,
    KIND_EOB,
    KIND_INVALID,
    KIND_LIT,
    KIND_MATCH,
    KIND_SUB,
    LL_CAP,
    LL_ROOT,
    _dist_entry_fields,
    _e_extra,
    _e_kind,
    _e_nbits,
    _e_val,
    _entry,
    _len_entry_fields,
)

TAB_CAP = LL_CAP + D_CAP  # per-stream unified table: litlen at 0, dist at LL_CAP


def _make_kernel(K: int, W: int, OW: int):
    """Build the kernel body for K interleaved streams of W input words and
    OW output words each."""

    def kernel(
        meta_ref,   # SMEM i32 (1, K, 8): start_bit, comp_bits, out_len, max_out
        clord_ref,  # SMEM i32 (1, 1, 32): code-length code order
        words_ref,  # SMEM u32 (1, K, W)
        out_ref,    # SMEM u32 (1, K, OW)
        st_ref,     # SMEM i32 (1, K, 8): produced, bad, end_bit
        tabs,       # SMEM u32 scratch (K, TAB_CAP)
        cltab,      # SMEM u32 scratch (1, CL_CAP)   [shared: transitions serial]
        lens,       # SMEM i32 scratch (1, 320)
        work,       # SMEM i32 scratch (1, 320)
        cnt,        # SMEM i32 scratch (1, 16)
        offs,       # SMEM i32 scratch (1, 16)
    ):
        _U0 = jnp.uint32(0)
        _U1 = jnp.uint32(1)
        _U32 = jnp.uint32(32)
        comp_bits = [meta_ref[0, s, 1] for s in range(K)]
        out_len = [meta_ref[0, s, 2] for s in range(K)]
        max_out = meta_ref[0, 0, 3]
        DEAD = OW - 1  # slack word absorbing predicated-off writes

        def peek32(s, bitpos):
            wi = jnp.clip(bitpos >> 5, 0, W - 2)
            sh = (bitpos & 31).astype(jnp.uint32)
            w0 = words_ref[0, s, wi]
            w1 = words_ref[0, s, wi + 1]
            return jnp.where(sh > 0, (w0 >> sh) | (w1 << (_U32 - sh)), w0)

        def out_byte_read(s, pos):
            w = out_ref[0, s, jnp.clip(pos >> 2, 0, DEAD)]
            sh = ((pos & 3) << 3).astype(jnp.uint32)
            return (w >> sh) & jnp.uint32(0xFF)

        def out_byte_write(s, pos, b):
            wi = jnp.clip(pos >> 2, 0, DEAD)
            sh = ((pos & 3) << 3).astype(jnp.uint32)
            w = out_ref[0, s, wi]
            out_ref[0, s, wi] = (w & ~(jnp.uint32(0xFF) << sh)) | (
                b.astype(jnp.uint32) << sh
            )

        # ---- canonical two-level table build (shared design with
        # inflate_kernel._kernel; row/base-parameterized) -------------------
        def build_table(tab, row, tab_base, cap, nsyms, lens_base, root_in, kind_of):
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

            def kraft(i, st):
                left, ncodes = st
                c = cnt[0, i]
                return (left * 2 - c, ncodes + c)

            left, ncodes = lax.fori_loop(1, 16, kraft, (jnp.int32(1), jnp.int32(0)))
            bad = (left < 0) | ((left > 0) & ~((kind_of == 2) & (ncodes <= 1)))
            bad = bad | (maxlen == 0)

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

            inv = _entry(jnp.int32(KIND_INVALID), jnp.int32(0), root, jnp.int32(0))

            def zinit(i, _):
                tab[row, tab_base + i] = inv
                return 0

            lax.fori_loop(0, cap, zinit, 0)

            def code_step(k, st):
                huff, low, drop, curr, sub_off, used, b = st
                sym = work[0, k]
                l = lens[0, lens_base + sym]

                start_sub = (l > root) & (
                    (huff & ((_U1 << root.astype(jnp.uint32)) - _U1)).astype(jnp.int32)
                    != low
                )

                def open_sub(st2):
                    huff, low, drop, curr, sub_off, used, b = st2
                    drop = root

                    def size_step(st3):
                        c, left = st3
                        left = left - cnt[0, c + drop]
                        grow = (left > 0) & (c + drop < maxlen)
                        return jnp.where(grow, c + 1, c), jnp.where(grow, left * 2, left)

                    def size_cond(st3):
                        c, left = st3
                        return (left > 0) & (c + drop < maxlen)

                    c0 = l - drop
                    c, _left = lax.while_loop(size_cond, size_step, (c0, jnp.int32(1) << c0))
                    sub_off = used
                    used = used + (jnp.int32(1) << c)
                    low = (huff & ((_U1 << root.astype(jnp.uint32)) - _U1)).astype(jnp.int32)
                    b = b | (used > cap)

                    @pl.when(~b)
                    def _():
                        tab[row, tab_base + low] = _entry(
                            jnp.int32(KIND_SUB), c, root, sub_off
                        )

                    return huff, low, drop, c, sub_off, used, b

                huff, low, drop, curr, sub_off, used, b = lax.cond(
                    start_sub, open_sub, lambda st2: st2,
                    (huff, low, drop, curr, sub_off, used, b),
                )

                kind, extra, val = lax.switch(
                    kind_of,
                    [
                        lambda s_: (jnp.int32(KIND_LIT), jnp.int32(0), s_),
                        _len_entry_fields,
                        _dist_entry_fields,
                    ],
                    sym,
                )
                ent = _entry(kind, extra, l, val)

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
                        tab[row, tab_base + slot] = ent

                    return f, bb

                def fill_cond(st3):
                    f, _bb = st3
                    return f > 0

                _f, b = lax.while_loop(fill_cond, fill, (region, b))
                cnt[0, l] = cnt[0, l] - 1

                incr0 = _U1 << (l - 1).astype(jnp.uint32)

                def down(st3):
                    return st3 >> _U1

                def down_cond(st3):
                    return (huff & st3) > 0

                incr = lax.while_loop(down_cond, down, incr0)
                huff = jnp.where(incr > 0, (huff & (incr - _U1)) + incr, _U0)
                return huff, low, drop, curr, sub_off, used, b

            init = (_U0, jnp.int32(-1), jnp.int32(0), root, jnp.int32(0),
                    jnp.int32(1) << root, bad)
            _h, _lo, _dr, _cu, _so, _us, bad = lax.fori_loop(0, ncodes, code_step, init)
            return root, bad

        # ---- block transition helpers (rare: outside the hot loop) --------
        def stored_block(s, bitpos, outpos, bad):
            bitpos = (bitpos + 7) & ~jnp.int32(7)
            w = peek32(s, bitpos)
            ln = (w & jnp.uint32(0xFFFF)).astype(jnp.int32)
            nln = (w >> jnp.uint32(16)).astype(jnp.int32)
            bitpos = bitpos + 32
            bad = bad | ((ln ^ 0xFFFF) != nln)
            bad = bad | (bitpos + ln * 8 > comp_bits[s] + 32)
            bad = bad | (outpos + ln > max_out)

            def copy_byte(j, _):
                v = peek32(s, bitpos + (j << 3)) & jnp.uint32(0xFF)
                out_byte_write(s, outpos + j, v)
                return 0

            @pl.when(~bad)
            def _():
                head = jnp.minimum((4 - (outpos & 3)) & 3, ln)
                lax.fori_loop(0, head, copy_byte, 0)
                nwords = (ln - head) >> 2
                wbase = (outpos + head) >> 2
                s0 = (bitpos >> 3) + head
                swi = s0 >> 2
                ssh = ((s0 & 3) << 3).astype(jnp.uint32)

                def wf(k, _):
                    w0 = words_ref[0, s, swi + k]
                    w1 = words_ref[0, s, swi + k + 1]
                    v = jnp.where(ssh > 0, (w0 >> ssh) | (w1 << (_U32 - ssh)), w0)
                    out_ref[0, s, wbase + k] = v
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
            def fl(i, _):
                l = jnp.where(i < 144, 8, jnp.where(i < 256, 9, jnp.where(i < 280, 7, 8)))
                lens[0, i] = l
                return 0

            lax.fori_loop(0, 288, fl, 0)

            def fd(i, _):
                lens[0, 288 + i] = 5
                return 0

            lax.fori_loop(0, 32, fd, 0)

        def dynamic_header(s, bitpos, bad):
            w = peek32(s, bitpos)
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
                        peek32(s, bp) & jnp.uint32(7)
                    ).astype(jnp.int32)

                return jnp.where(i < hclen, bp + 3, bp)

            bitpos = lax.fori_loop(0, 19, rdcl, bitpos)
            clroot, clbad = build_table(
                cltab, 0, 0, CL_CAP, jnp.int32(19), jnp.int32(0),
                jnp.int32(CL_ROOT), 0,
            )
            bad = bad | clbad
            cl_mask = (_U1 << clroot.astype(jnp.uint32)) - _U1
            total = nlen + ndist

            def rd_cond(st):
                i, bp, _prev, b = st
                return (i < total) & ~b

            def rd_body(st):
                i, bp, prev, b = st
                w = peek32(s, bp)
                e = cltab[0, (w & cl_mask).astype(jnp.int32)]
                nb = _e_nbits(e)
                sym = _e_val(e)
                b = b | (_e_kind(e) == KIND_INVALID)
                bp = bp + nb
                w2 = peek32(s, bp)

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
                    r = (w2 & ((_U1 << ebits.astype(jnp.uint32)) - _U1)).astype(
                        jnp.int32
                    ) + rbase
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
            bad = bad | (bitpos > comp_bits[s] + 32)

            def mv(i, _):
                j = 31 - i

                @pl.when(j < ndist)
                def _():
                    lens[0, 288 + j] = lens[0, nlen + j]

                return 0

            lax.fori_loop(0, 32, mv, 0)
            bad = bad | (lens[0, 256] == 0)
            return bitpos, nlen, ndist, bad

        def transition(s, st):
            """One block transition for stream s: (bp, op, bad, done, needblk,
            final, llr, dr) -> same. Runs only when needblk & ~done & ~bad."""
            bp, op, bad, done, needblk, final, llr, dr = st
            # a stream that already produced its expected output is done
            # (the out_len check the single-stream kernel applies per block)
            hit_len = (out_len[s] >= 0) & (op >= out_len[s])
            exhausted = bp >= comp_bits[s]

            def finish(st2):
                bp, op, bad, done, needblk, final, llr, dr = st2
                return bp, op, bad, jnp.bool_(True), jnp.bool_(False), final, llr, dr

            def parse(st2):
                bp, op, bad, done, needblk, final, llr, dr = st2
                w = peek32(s, bp)
                fin = (w & _U1).astype(jnp.int32) > 0
                btype = ((w >> _U1) & jnp.uint32(3)).astype(jnp.int32)
                bp = bp + 3
                bad = bad | (btype == 3) | (bp > comp_bits[s])

                def do_stored(args):
                    bp, op, b = args
                    bp, op, b = stored_block(s, bp, op, b)
                    # stored blocks complete here; next header next time
                    return bp, op, b, jnp.bool_(True), llr, dr

                def do_fixed(args):
                    bp, op, b = args
                    fixed_lens()
                    r1, b1 = build_table(
                        tabs, s, 0, LL_CAP, jnp.int32(288), jnp.int32(0),
                        jnp.int32(LL_ROOT), 1,
                    )
                    r2, b2 = build_table(
                        tabs, s, LL_CAP, D_CAP, jnp.int32(32), jnp.int32(288),
                        jnp.int32(D_ROOT), 2,
                    )
                    return bp, op, b | b1 | b2, jnp.bool_(False), r1, r2

                def do_dyn(args):
                    bp, op, b = args
                    bp, nlen, ndist, b = dynamic_header(s, bp, b)

                    def build(a):
                        bp, op, b = a
                        r1, b1 = build_table(
                            tabs, s, 0, LL_CAP, nlen, jnp.int32(0),
                            jnp.int32(LL_ROOT), 1,
                        )
                        r2, b2 = build_table(
                            tabs, s, LL_CAP, D_CAP, ndist, jnp.int32(288),
                            jnp.int32(D_ROOT), 2,
                        )
                        return bp, op, b | b1 | b2, jnp.bool_(False), r1, r2

                    return lax.cond(
                        b,
                        lambda a: (a[0], a[1], a[2], jnp.bool_(True),
                                   jnp.int32(LL_ROOT), jnp.int32(D_ROOT)),
                        build,
                        (bp, op, b),
                    )

                bp, op, bad, still_blk, llr, dr = lax.switch(
                    jnp.clip(btype, 0, 2), [do_stored, do_fixed, do_dyn], (bp, op, bad)
                )
                # after a completed stored block, done follows the same rule
                sdone = still_blk & (
                    fin
                    | ((out_len[s] >= 0) & (op >= out_len[s]))
                    | (bp >= comp_bits[s])
                )
                return (
                    bp, op, bad, sdone | bad, still_blk & ~sdone, fin, llr, dr
                )

            return lax.cond(hit_len | exhausted | bad, finish, parse, st)

        # ---- the hot loop: one predicated micro-step per stream per iter --
        def inner_body(state):
            out_state = []
            for s in range(K):
                (bp, op, rem, dist, lenv, expctd, needblk, final, done, bad,
                 llr, dr) = state[s]
                active = ~(done | bad | needblk)
                decoding = active & (rem == 0)
                copying = active & (rem > 0)

                w = peek32(s, bp)  # 2 loads
                tbase = jnp.where(expctd, LL_CAP, 0)
                troot = jnp.where(expctd, dr, llr).astype(jnp.uint32)
                tmask = (_U1 << troot) - _U1
                i0 = tbase + (w & tmask).astype(jnp.int32)
                e0 = tabs[s, i0]  # load
                is_sub = _e_kind(e0) == KIND_SUB
                i1 = tbase + _e_val(e0) + (
                    (w >> troot) & ((_U1 << _e_extra(e0).astype(jnp.uint32)) - _U1)
                ).astype(jnp.int32)
                e = tabs[s, jnp.where(is_sub, i1, i0)]  # load
                kind = _e_kind(e)
                nb = _e_nbits(e)
                eb = _e_extra(e).astype(jnp.uint32)
                v = _e_val(e) + (
                    (w >> nb.astype(jnp.uint32)) & ((_U1 << eb) - _U1)
                ).astype(jnp.int32)

                is_lit = decoding & ~expctd & (kind == KIND_LIT)
                is_len = decoding & ~expctd & (kind == KIND_MATCH)
                is_eob = decoding & ~expctd & (kind == KIND_EOB)
                got_dist = decoding & expctd
                bad = bad | (decoding & (kind == KIND_INVALID))
                bad = bad | (got_dist & (kind != KIND_MATCH))
                bad = bad | (decoding & (bp > comp_bits[s]))

                lenv = jnp.where(is_len, v, lenv)
                dist = jnp.where(got_dist, v, dist)
                arm = got_dist & ~bad
                bad = bad | (got_dist & ((v > op) | (v < 1) | (op + lenv > max_out)))
                arm = arm & ~bad
                rem = jnp.where(arm, lenv, rem)
                expctd = jnp.where(decoding, is_len, expctd)
                bp = bp + jnp.where(decoding, nb + eb.astype(jnp.int32), 0)

                # copy source window: 4 bytes at op-dist (2 loads)
                src = jnp.maximum(op - dist, 0)
                swi = jnp.clip(src >> 2, 0, DEAD - 1)
                ssh = ((src & 3) << 3).astype(jnp.uint32)
                sw0 = out_ref[0, s, swi]
                sw1 = out_ref[0, s, swi + 1]
                sval = jnp.where(ssh > 0, (sw0 >> ssh) | (sw1 << (_U32 - ssh)), sw0)
                sval = jnp.where(
                    dist == 1, (sval & jnp.uint32(0xFF)) * jnp.uint32(0x01010101), sval
                )
                maxb = jnp.where(dist == 1, 4, jnp.minimum(dist, 4))
                nb_copy = jnp.minimum(jnp.minimum(rem, maxb), 4 - (op & 3))

                wval = jnp.where(is_lit, (v & 0xFF).astype(jnp.uint32), sval)
                nbytes = jnp.where(copying, nb_copy, jnp.where(is_lit & ~bad, 1, 0))
                bad = bad | (is_lit & (op >= max_out))
                nbytes = jnp.where(bad | (op + nbytes > max_out), 0, nbytes)
                # masked RMW: nbytes in 0..4, all inside one word
                sh = ((op & 3) << 3).astype(jnp.uint32)
                mask_n = jnp.where(
                    nbytes == 0,
                    _U0,
                    jnp.uint32(0xFFFFFFFF) >> ((4 - nbytes) << 3).astype(jnp.uint32),
                )
                wi = jnp.where(nbytes > 0, op >> 2, DEAD)
                old = out_ref[0, s, wi]  # load
                out_ref[0, s, wi] = (old & ~(mask_n << sh)) | ((wval << sh) & (mask_n << sh))

                op = op + nbytes
                rem = rem - jnp.where(copying, nbytes, 0)
                needblk = needblk | is_eob
                done = done | (is_eob & final)
                out_state.append(
                    (bp, op, rem, dist, lenv, expctd, needblk, final, done, bad,
                     llr, dr)
                )
            return tuple(out_state)

        def inner_cond(state):
            any_active = jnp.bool_(False)
            any_pending = jnp.bool_(False)
            for s in range(K):
                (bp, op, rem, dist, lenv, expctd, needblk, final, done, bad,
                 llr, dr) = state[s]
                alive = ~(done | bad)
                any_active = any_active | alive
                any_pending = any_pending | (alive & needblk)
            return any_active & ~any_pending

        def outer_cond(state):
            any_alive = jnp.bool_(False)
            for s in range(K):
                done, bad = state[s][8], state[s][9]
                any_alive = any_alive | ~(done | bad)
            return any_alive

        def outer_body(state):
            new_state = []
            for s in range(K):
                (bp, op, rem, dist, lenv, expctd, needblk, final, done, bad,
                 llr, dr) = state[s]
                tst = (bp, op, bad, done, needblk, final, llr, dr)
                tst = lax.cond(
                    needblk & ~(done | bad),
                    lambda a, s=s: transition(s, a),
                    lambda a: a,
                    tst,
                )
                bp, op, bad, done, needblk, final, llr, dr = tst
                new_state.append(
                    (bp, op, rem, dist, lenv, expctd, needblk, final, done, bad,
                     llr, dr)
                )
            return lax.while_loop(inner_cond, inner_body, tuple(new_state))

        init = []
        for s in range(K):
            init.append(
                (
                    meta_ref[0, s, 0],          # bp
                    jnp.int32(0),               # op
                    jnp.int32(0),               # rem
                    jnp.int32(1),               # dist
                    jnp.int32(0),               # lenv
                    jnp.bool_(False),           # expctd
                    jnp.bool_(True),            # needblk
                    jnp.bool_(False),           # final
                    jnp.bool_(False),           # done
                    jnp.bool_(False),           # bad
                    jnp.int32(LL_ROOT),         # llr
                    jnp.int32(D_ROOT),          # dr
                )
            )
        final_state = lax.while_loop(outer_cond, outer_body, tuple(init))
        for s in range(K):
            (bp, op, rem, dist, lenv, expctd, needblk, final, done, bad,
             llr, dr) = final_state[s]
            bad = bad | ((out_len[s] >= 0) & (op != out_len[s]))
            st_ref[0, s, 0] = op
            st_ref[0, s, 1] = bad.astype(jnp.int32)
            st_ref[0, s, 2] = bp
            st_ref[0, s, 3] = 0

    return kernel


@functools.partial(
    jax.jit, static_argnames=("max_out", "k_streams", "interpret")
)
def decode_streams_ilk(
    words, start_bits, comp_bits, out_lens, *,
    max_out: int, k_streams: int = 4, interpret: bool = False,
):
    """Decode B raw-deflate streams, K per grid step, interleaved.

    Same contract as inflate_kernel.decode_streams_pallas: words is
    uint32[B, W] LE32-packed compressed bytes (>= 2 words zero tail pad);
    out_lens is the expected output size per stream (or -1 to decode to
    BFINAL). B must be a multiple of k_streams (pad with out_len=0 streams).
    Returns (out u8[B, max_out], produced i32[B], bad bool[B], end_bit).
    """
    B, W = words.shape
    K = k_streams
    if B % K:
        raise ValueError(f"B={B} must be a multiple of k_streams={K}")
    G = B // K
    ow = (max_out + 3) // 4 + 1
    meta = jnp.stack(
        [
            start_bits.astype(jnp.int32),
            comp_bits.astype(jnp.int32),
            out_lens.astype(jnp.int32),
            jnp.full((B,), max_out, jnp.int32),
        ],
        axis=1,
    )
    meta = jnp.pad(meta, ((0, 0), (0, 4))).reshape(G, K, 8)
    words3 = words.reshape(G, K, W)
    clord = jnp.asarray(
        [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]
        + [0] * 13,
        jnp.int32,
    ).reshape(1, 1, 32)
    out_w, st = pl.pallas_call(
        _make_kernel(K, W, ow),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, K, 8), lambda g: (g, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 32), lambda g: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, W), lambda g: (g, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, ow), lambda g: (g, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, 8), lambda g: (g, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, K, ow), jnp.uint32),
            jax.ShapeDtypeStruct((G, K, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((K, TAB_CAP), jnp.uint32),
            pltpu.SMEM((1, CL_CAP), jnp.uint32),
            pltpu.SMEM((1, 320), jnp.int32),
            pltpu.SMEM((1, 320), jnp.int32),
            pltpu.SMEM((1, 16), jnp.int32),
            pltpu.SMEM((1, 16), jnp.int32),
        ],
        interpret=interpret,
    )(meta, clord, words3)
    out_b = jax.lax.shift_right_logical(
        out_w.reshape(B, ow)[:, :, None],
        jnp.array([0, 8, 16, 24], jnp.uint32)[None, None, :],
    ).astype(jnp.uint8).reshape(B, ow * 4)[:, :max_out]
    stf = st.reshape(B, 8)
    return out_b, stf[:, 0], stf[:, 1] > 0, stf[:, 2]
