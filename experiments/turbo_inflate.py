"""Turbo device inflate: position-parallel Huffman decode on TPU.

The reference's inflate_fast (zlib-rs/src/inflate.rs:1885-2163) is a
byte-serial loop: each symbol's bit length is only known after decoding it,
so a CPU walks the bit stream one symbol at a time.  On a vector machine
that dependency chain is the enemy.  This module breaks it with the
classic parallel-Huffman construction, done entirely with large dense
gathers (the op class TPUs execute well — see ARCHITECTURE.md pathology
notes):

  1. For EVERY bit position p in the region, decode ONE symbol as if a
     symbol started at p: two flat-LUT gathers (lit/len + dist) and two
     word-peeks, all vectorized over p.  This yields a successor array
     next[p] = bit position after that symbol, an output-length array, and
     per-position token fields.  Work is O(bits), perfectly parallel.
  2. The true symbol chain is the orbit of the block's start bit under
     next[].  EOB and invalid positions self-loop (absorbing states), so
     f^k(start) converges to the block's EOB once k >= #symbols.
  3. Enumerate the orbit with binary jump composition: maintain
     jump = next (a 2^k-step map, squared each round: jump = jump[jump])
     and cur[j] (position of the j-th symbol, advanced where bit k of j is
     set).  ceil(log2(S)) rounds of dense gathers replace S serial steps.
  4. Gather token fields at cur[j] into an ordered token tape; positions
     at the absorbing EOB state emit nothing.  The tape feeds the same
     pointer-doubling LZ resolver as the lockstep engine
     (device_inflate.resolve_tokens).

Block headers, code-length decoding, and on-device table builds reuse the
lockstep state machine (device_inflate's phases) — headers are a few
hundred serial steps per block, negligible next to the symbol stream.  An
outer lax.while_loop alternates "advance all lanes through their next
header" with "turbo-decode every lane's current coded block".

A stream with more than max_blocks deflate blocks per region exceeds the
outer loop budget and is reported incomplete (bad), so callers fall back
to the exact lockstep/native engines; correctness never depends on the
fast path.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from zlib_rs_tpu.parallel.device_inflate import (
    CL_BITS,
    FLAT_BITS,
    KIND_EOB,
    KIND_INVALID,
    KIND_LIT,
    KIND_MATCH,
    PH_BAD,
    PH_BUILD,
    PH_CLEN,
    PH_CL_BUILD,
    PH_CL_LENS,
    PH_DONE,
    PH_HEADER,
    PH_STORED,
    PH_SYMS,
    PH_TABLE_META,
    TOK_LIT,
    TOK_MATCH,
    TOK_NULL,
    TOK_RAW,
    _CL_ORDER,
    _FIXED_D_LENS,
    _FIXED_LL_LENS,
    _REV7_NP,
    _REV15_NP,
    _build_flat_lut,
    _cl_symbol_fields,
    _d_symbol_fields,
    _ll_symbol_fields,
)


def _tape_write(tape, upd, offs):
    """Write upd[b, S] into tape[b] starting at column offs[b] (per-lane)."""
    return jax.vmap(lambda t, u, o: lax.dynamic_update_slice(t, u, (o,)))(
        tape, upd, offs
    )


@functools.partial(jax.jit, static_argnames=("max_blocks", "max_out"))
def decode_regions_turbo(comp, start_bits, end_bits, out_targets,
                         max_blocks: int, max_out: int):
    """Decode B byte-padded regions, one deflate BLOCK per outer step.

    comp: uint8[B, L], zero-padded by >= 8 bytes past each region's end.
    Returns (tok_kind, tok_a, tok_b, produced, bad) with tape arrays
    [B, S_total]; feed them to device_inflate.resolve_tokens.
    """
    B, L = comp.shape
    P = 8 * L  # bit-position universe per lane
    S_total = max_out + 2
    S_blk = max_out + 2  # one block can hold every symbol of the region
    S_tape = S_total + S_blk  # slack so per-lane writes never clamp

    b32 = comp.astype(jnp.uint32)
    w = b32
    w = w.at[:, : L - 1].add(b32[:, 1:] << 8)
    w = w.at[:, : L - 2].add(b32[:, 2:] << 16)
    w = w.at[:, : L - 3].add(b32[:, 3:] << 24)
    words = w
    lane = jnp.arange(B)

    rev15 = jnp.asarray(_REV15_NP)
    rev7 = jnp.asarray(_REV7_NP)
    ll_fields = _ll_symbol_fields(320)
    d_fields = _d_symbol_fields(320)
    cl_fields = _cl_symbol_fields()
    fixed_ll_lens = jnp.asarray(np.pad(_FIXED_LL_LENS, (0, 320 - 288)), jnp.int32)
    fixed_d_lens = jnp.asarray(np.pad(_FIXED_D_LENS, (0, 320 - 32)), jnp.int32)
    cl_order = jnp.asarray(_CL_ORDER)

    def peek(bitpos, n):
        byte = bitpos >> 3
        sh = (bitpos & 7).astype(jnp.uint32)
        wd = words[lane, jnp.minimum(byte, L - 1)]
        ext = comp[lane, jnp.minimum(byte + 4, L - 1)].astype(jnp.uint32)
        v = (wd >> sh) | jnp.where(sh > 0, ext << (jnp.uint32(32) - sh), 0)
        return v & ((jnp.uint32(1) << n) - 1)

    # ---- lockstep header machine (phases up to PH_BUILD; stops at SYMS) ----
    def header_step(state):
        (phase, bitpos, final_f, produced, ntok,
         hlit, hdist, hclen, cl_got, cl_lens,
         lens_arr, lens_have, prev_len,
         cl_lut, ll_lut, d_lut, tk, ta, tb) = state

        over_end = bitpos > end_bits
        running = (phase != PH_DONE) & (phase != PH_BAD) & (phase != PH_SYMS)
        phase = jnp.where(
            over_end & running,
            jnp.where(produced >= out_targets, PH_DONE, PH_BAD),
            phase,
        )

        # PH_HEADER
        in_hdr = phase == PH_HEADER
        hdr = peek(bitpos, jnp.uint32(3))
        h_final = (hdr & 1).astype(jnp.int32)
        h_btype = (hdr >> 1).astype(jnp.int32)
        hdr_next = jnp.where(
            h_btype == 0, PH_STORED,
            jnp.where(h_btype == 1, PH_BUILD,
                      jnp.where(h_btype == 2, PH_TABLE_META, PH_BAD)),
        )
        final_f = jnp.where(in_hdr, h_final, final_f)
        bitpos = jnp.where(in_hdr, bitpos + 3, bitpos)
        hclen = jnp.where(in_hdr & (h_btype == 1), -1, hclen)
        phase = jnp.where(in_hdr, hdr_next, phase)

        # PH_STORED: align, LEN/NLEN, one raw token appended at ntok
        in_st = phase == PH_STORED
        aligned = (bitpos + 7) & ~jnp.int32(7)
        st_len = peek(aligned, jnp.uint32(16)).astype(jnp.int32)
        st_nlen = peek(aligned + 16, jnp.uint32(16)).astype(jnp.int32)
        st_ok = st_len == (~st_nlen & 0xFFFF)
        st_emit = in_st & st_ok & (st_len > 0)
        st_byte = (aligned + 32) >> 3
        cur_k = jax.vmap(lambda t, o: t[o])(tk, ntok)
        cur_a = jax.vmap(lambda t, o: t[o])(ta, ntok)
        cur_b = jax.vmap(lambda t, o: t[o])(tb, ntok)
        one_k = jnp.where(st_emit, TOK_RAW, cur_k).astype(jnp.uint8)
        one_a = jnp.where(st_emit, st_len, cur_a)
        one_b = jnp.where(st_emit, st_byte, cur_b)
        tk = _tape_write(tk, one_k[:, None], ntok)
        ta = _tape_write(ta, one_a[:, None], ntok)
        tb = _tape_write(tb, one_b[:, None], ntok)
        ntok = jnp.where(st_emit, ntok + 1, ntok)
        produced = jnp.where(in_st & st_ok, produced + st_len, produced)
        bitpos = jnp.where(in_st & st_ok, aligned + 32 + 8 * st_len, bitpos)
        phase = jnp.where(
            in_st,
            jnp.where(
                ~st_ok, PH_BAD,
                jnp.where((final_f == 1) | (produced >= out_targets),
                          PH_DONE, PH_HEADER),
            ),
            phase,
        )

        # PH_TABLE_META
        in_tm = phase == PH_TABLE_META
        meta = peek(bitpos, jnp.uint32(14))
        hlit = jnp.where(in_tm, (meta & 31).astype(jnp.int32) + 257, hlit)
        hdist = jnp.where(in_tm, ((meta >> 5) & 31).astype(jnp.int32) + 1, hdist)
        hclen = jnp.where(in_tm, ((meta >> 10) & 15).astype(jnp.int32) + 4, hclen)
        cl_got = jnp.where(in_tm, 0, cl_got)
        cl_lens = jnp.where(in_tm[:, None], jnp.zeros_like(cl_lens), cl_lens)
        lens_arr = jnp.where(in_tm[:, None], jnp.zeros_like(lens_arr), lens_arr)
        lens_have = jnp.where(in_tm, 0, lens_have)
        bitpos = jnp.where(in_tm, bitpos + 14, bitpos)
        phase = jnp.where(in_tm, jnp.where(hlit > 286, PH_BAD, PH_CL_LENS), phase)

        # PH_CL_LENS
        in_cl = phase == PH_CL_LENS
        v3 = peek(bitpos, jnp.uint32(3)).astype(jnp.int32)
        slot = cl_order[jnp.clip(cl_got, 0, 18)]
        upd = jax.nn.one_hot(slot, 19, dtype=jnp.int32) * v3[:, None]
        cl_lens = jnp.where(in_cl[:, None], cl_lens + upd, cl_lens)
        bitpos = jnp.where(in_cl, bitpos + 3, bitpos)
        cl_got = jnp.where(in_cl, cl_got + 1, cl_got)
        phase = jnp.where(in_cl & (cl_got >= hclen), PH_CL_BUILD, phase)

        # PH_CL_BUILD (cond-gated)
        need_clb = phase == PH_CL_BUILD

        def do_cl_build(args):
            cl_lut_in, cl_lens_in = args
            built = jax.vmap(
                lambda ln: _build_flat_lut(ln, *cl_fields, rev7, CL_BITS)
            )(cl_lens_in)
            return jnp.where(need_clb[:, None], built, cl_lut_in)

        cl_lut = lax.cond(
            jnp.any(need_clb), do_cl_build, lambda a: a[0], (cl_lut, cl_lens)
        )
        phase = jnp.where(need_clb, PH_CLEN, phase)

        # PH_CLEN
        in_cle = phase == PH_CLEN
        ccode = peek(bitpos, jnp.uint32(CL_BITS))
        ce = cl_lut[lane, ccode.astype(jnp.int32)]
        ckind = (ce >> 28).astype(jnp.int32)
        cnb = ((ce >> 16) & 0x3F).astype(jnp.int32)
        csym = (ce & 0xFFFF).astype(jnp.int32)
        c_bad = in_cle & (ckind == KIND_INVALID)
        after = bitpos + cnb
        rep_bits = jnp.where(csym == 16, 2,
                             jnp.where(csym == 17, 3, jnp.where(csym == 18, 7, 0)))
        rep_extra = peek(after, jnp.uint32(7)).astype(jnp.int32) & ((1 << rep_bits) - 1)
        rep_n = jnp.where(
            csym == 16, 3 + rep_extra,
            jnp.where(csym == 17, 3 + rep_extra,
                      jnp.where(csym == 18, 11 + rep_extra, 1)),
        )
        rep_val = jnp.where(csym < 16, csym, jnp.where(csym == 16, prev_len, 0))
        c_bad = c_bad | (in_cle & (csym == 16) & (lens_have == 0))
        c_bad = c_bad | (in_cle & (lens_have + rep_n > hlit + hdist))
        idx320 = jnp.arange(320)[None, :]
        in_range = (idx320 >= lens_have[:, None]) & (idx320 < (lens_have + rep_n)[:, None])
        lens_arr = jnp.where(in_cle[:, None] & in_range, rep_val[:, None], lens_arr)
        lens_have = jnp.where(in_cle & ~c_bad, lens_have + rep_n, lens_have)
        prev_len = jnp.where(in_cle & ~c_bad, rep_val, prev_len)
        bitpos = jnp.where(in_cle & ~c_bad, after + rep_bits, bitpos)
        cl_done = in_cle & ~c_bad & (lens_have >= hlit + hdist)
        missing_eob = cl_done & (
            jnp.take_along_axis(lens_arr, jnp.full((B, 1), 256), 1)[:, 0] == 0
        )
        phase = jnp.where(c_bad | missing_eob, PH_BAD,
                          jnp.where(cl_done, PH_BUILD, phase))

        # PH_BUILD (cond-gated)
        need_b = phase == PH_BUILD
        use_fixed = need_b & (hclen == -1)

        def do_build(args):
            ll_in, d_in, lens_in, hlit_in = args
            idx = jnp.arange(320)[None, :]
            ll_lens = jnp.where(idx < hlit_in[:, None], lens_in, 0)
            gidx = jnp.clip(hlit_in[:, None] + idx, 0, 319)
            d_lens = jnp.take_along_axis(lens_in, gidx, axis=1)
            d_lens = jnp.where(idx < hdist[:, None], d_lens, 0)
            ll_lens = jnp.where(use_fixed[:, None], fixed_ll_lens[None, :], ll_lens)
            d_lens = jnp.where(use_fixed[:, None], fixed_d_lens[None, :], d_lens)
            ll_built = jax.vmap(
                lambda ln: _build_flat_lut(ln, *ll_fields, rev15, FLAT_BITS)
            )(ll_lens)
            d_built = jax.vmap(
                lambda ln: _build_flat_lut(ln, *d_fields, rev15, FLAT_BITS)
            )(d_lens)
            return (
                jnp.where(need_b[:, None], ll_built, ll_in),
                jnp.where(need_b[:, None], d_built, d_in),
            )

        ll_lut, d_lut = lax.cond(
            jnp.any(need_b), do_build, lambda a: (a[0], a[1]),
            (ll_lut, d_lut, lens_arr, hlit),
        )
        phase = jnp.where(need_b, PH_SYMS, phase)

        return (phase, bitpos, final_f, produced, ntok,
                hlit, hdist, hclen, cl_got, cl_lens,
                lens_arr, lens_have, prev_len,
                cl_lut, ll_lut, d_lut, tk, ta, tb)

    def header_cond(state):
        phase = state[0]
        # keep stepping while any lane is mid-header/table/stored
        busy = (phase != PH_DONE) & (phase != PH_BAD) & (phase != PH_SYMS)
        return jnp.any(busy)

    # ---- position-parallel block decode ------------------------------------
    def turbo_block(phase, bitpos, final_f, produced, ntok,
                    ll_lut, d_lut, tk, ta, tb):
        in_sy = phase == PH_SYMS

        def per_lane(words_l, comp_l, ll_l, d_l, start, endb):
            p = jnp.arange(P, dtype=jnp.int32)

            # full-position 15-bit peek table with ZERO random access:
            # the byte index p>>3 over p = arange is an 8x repeat, and the
            # bit shift p&7 is a tiled ramp — both plain data movement.
            # Dynamic-position peeks then cost ONE gather from peek15
            # instead of two from words/comp (halves the per-bit gather
            # count; gathers at ~10ns/index dominate this kernel).
            ext_b = jnp.concatenate(
                [comp_l[4:], jnp.zeros((4,), comp_l.dtype)]
            ).astype(jnp.uint32)
            sh_all = jnp.tile(jnp.arange(8, dtype=jnp.uint32), L)
            v_all = (jnp.repeat(words_l, 8) >> sh_all) | jnp.where(
                sh_all > 0, jnp.repeat(ext_b, 8) << (jnp.uint32(32) - sh_all), 0
            )
            peek15 = v_all & jnp.uint32((1 << FLAT_BITS) - 1)

            def peek_at(pos, n):
                return peek15[jnp.clip(pos, 0, P - 1)] & ((jnp.uint32(1) << n) - 1)

            code = peek15
            e = ll_l[code.astype(jnp.int32)]
            kind = (e >> 28).astype(jnp.int32)
            aux = ((e >> 22) & 0x3F).astype(jnp.int32)
            nb = ((e >> 16) & 0x3F).astype(jnp.int32)
            payload = (e & 0xFFFF).astype(jnp.int32)
            p1 = p + nb
            extra = peek_at(p1, jnp.uint32(13)).astype(jnp.int32) & ((1 << aux) - 1)
            length = payload + extra
            p2 = p1 + aux
            dcode = peek_at(p2, jnp.uint32(FLAT_BITS))
            de = d_l[dcode.astype(jnp.int32)]
            dkind = (de >> 28).astype(jnp.int32)
            daux = ((de >> 22) & 0x3F).astype(jnp.int32)
            dnb = ((de >> 16) & 0x3F).astype(jnp.int32)
            dpayload = (de & 0xFFFF).astype(jnp.int32)
            p3 = p2 + dnb
            dextra = peek_at(p3, jnp.uint32(13)).astype(jnp.int32) & ((1 << daux) - 1)
            dist = dpayload + dextra
            p4 = p3 + daux

            is_lit = kind == KIND_LIT
            is_eob = kind == KIND_EOB
            is_match = (kind == KIND_MATCH) & (dkind == KIND_MATCH)
            bad_p = (kind == KIND_INVALID) | (
                (kind == KIND_MATCH) & (dkind != KIND_MATCH)
            ) | (p >= endb)

            nxt = jnp.where(is_lit, p1, jnp.where(is_match, p4, p))
            nxt = jnp.where(is_eob | bad_p, p, nxt)  # absorbing states
            nxt = jnp.clip(nxt, 0, P - 1)
            tokk = jnp.where(is_lit, TOK_LIT,
                             jnp.where(is_match, TOK_MATCH, TOK_NULL)).astype(jnp.uint8)
            toka = jnp.where(is_lit, 1, jnp.where(is_match, length, 0))
            tokb = jnp.where(is_lit, payload, jnp.where(is_match, dist, 0))
            absorbing = is_eob | bad_p
            eob_exit = p1  # bit after the EOB code (valid at EOB positions)

            # orbit enumeration: cur[j] = position of the j-th symbol
            j = jnp.arange(S_blk, dtype=jnp.int32)
            cur = jnp.full((S_blk,), jnp.clip(start, 0, P - 1), jnp.int32)
            jump = nxt
            nbits_j = max(1, (S_blk - 1).bit_length())
            for k in range(nbits_j):
                take = ((j >> k) & 1) == 1
                cur = jnp.where(take, jump[cur], cur)
                if k + 1 < nbits_j:
                    jump = jump[jump]

            landed = cur[S_blk - 1]
            # chain must terminate at a clean EOB (not invalid/overrun)
            ok = is_eob[landed] & ~bad_p[landed]
            real = ~absorbing[cur]  # tokens strictly before the EOB
            out_k = jnp.where(real, tokk[cur], TOK_NULL).astype(jnp.uint8)
            out_a = jnp.where(real, toka[cur], 0)
            out_b = jnp.where(real, tokb[cur], 0)
            m = jnp.sum(real.astype(jnp.int32))
            add = jnp.sum(out_a)
            exit_bit = eob_exit[landed]
            return out_k, out_a, out_b, m, add, exit_bit, ok

        out_k, out_a, out_b, m, add, exit_bit, ok = jax.vmap(per_lane)(
            words, comp, ll_lut, d_lut, bitpos, end_bits
        )

        # mask lanes not in PH_SYMS: write NULLs over their NULL tail
        out_k = jnp.where(in_sy[:, None], out_k, TOK_NULL).astype(jnp.uint8)
        out_a = jnp.where(in_sy[:, None], out_a, 0)
        out_b = jnp.where(in_sy[:, None], out_b, 0)
        tk = _tape_write(tk, out_k, ntok)
        ta = _tape_write(ta, out_a, ntok)
        tb = _tape_write(tb, out_b, ntok)
        ntok = jnp.where(in_sy, ntok + m, ntok)
        produced = jnp.where(in_sy, produced + add, produced)
        bitpos = jnp.where(in_sy & ok, exit_bit, bitpos)
        phase = jnp.where(
            in_sy,
            jnp.where(
                ~ok, PH_BAD,
                jnp.where((final_f == 1) | (produced >= out_targets),
                          PH_DONE, PH_HEADER),
            ),
            phase,
        )
        # seam-format bodies: bits end exactly at a block boundary, no BFINAL
        at_end = (phase == PH_HEADER) & (bitpos + 3 > end_bits)
        phase = jnp.where(at_end & (produced >= out_targets), PH_DONE, phase)
        return phase, bitpos, produced, ntok, tk, ta, tb

    # ---- outer loop: header advance + one turbo block per iteration --------
    def outer_body(carry):
        blk, state = carry
        state = lax.while_loop(header_cond, header_step, state)
        (phase, bitpos, final_f, produced, ntok,
         hlit, hdist, hclen, cl_got, cl_lens,
         lens_arr, lens_have, prev_len,
         cl_lut, ll_lut, d_lut, tk, ta, tb) = state

        def do_turbo(args):
            return turbo_block(*args)

        def no_turbo(args):
            (phase, bitpos, _f, produced, ntok, _ll, _d, tk, ta, tb) = args
            return phase, bitpos, produced, ntok, tk, ta, tb

        phase, bitpos, produced, ntok, tk, ta, tb = lax.cond(
            jnp.any(phase == PH_SYMS), do_turbo, no_turbo,
            (phase, bitpos, final_f, produced, ntok, ll_lut, d_lut, tk, ta, tb),
        )
        state = (phase, bitpos, final_f, produced, ntok,
                 hlit, hdist, hclen, cl_got, cl_lens,
                 lens_arr, lens_have, prev_len,
                 cl_lut, ll_lut, d_lut, tk, ta, tb)
        return blk + 1, state

    def outer_cond(carry):
        blk, state = carry
        phase = state[0]
        return (blk < max_blocks) & ~jnp.all((phase == PH_DONE) | (phase == PH_BAD))

    init = (
        jnp.full((B,), PH_HEADER, jnp.int32),
        start_bits.astype(jnp.int32),
        jnp.zeros(B, jnp.int32),
        jnp.zeros(B, jnp.int32),
        jnp.zeros(B, jnp.int32),  # ntok
        jnp.zeros(B, jnp.int32),  # hlit
        jnp.zeros(B, jnp.int32),  # hdist
        jnp.zeros(B, jnp.int32),  # hclen
        jnp.zeros(B, jnp.int32),  # cl_got
        jnp.zeros((B, 19), jnp.int32),
        jnp.zeros((B, 320), jnp.int32),
        jnp.zeros(B, jnp.int32),  # lens_have
        jnp.zeros(B, jnp.int32),  # prev_len
        jnp.zeros((B, 1 << CL_BITS), jnp.uint32),
        jnp.zeros((B, 1 << FLAT_BITS), jnp.uint32),
        jnp.zeros((B, 1 << FLAT_BITS), jnp.uint32),
        jnp.zeros((B, S_tape), jnp.uint8),
        jnp.zeros((B, S_tape), jnp.int32),
        jnp.zeros((B, S_tape), jnp.int32),
    )
    blk, state = lax.while_loop(outer_cond, outer_body, (jnp.int32(0), init))
    phase, _bitpos, _f, produced = state[0], state[1], state[2], state[3]
    tk, ta, tb = state[-3], state[-2], state[-1]
    # a region still undecoded at the block budget is incomplete -> bad
    bad = (phase == PH_BAD) | ((phase != PH_DONE) & (blk >= max_blocks))
    return tk[:, :S_total], ta[:, :S_total], tb[:, :S_total], produced, bad, blk
