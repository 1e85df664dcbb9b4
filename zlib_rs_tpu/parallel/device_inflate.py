"""Full device inflate: batched multi-block DEFLATE decode on TPU.

The TPU answer to the reference's inflate_fast + state machine
(zlib-rs/src/inflate.rs:898-2163, inflate/inftrees.rs) for FOREIGN streams:
unlike parallel/inflate.py's seam-format fast path (one host-parsed coded
block per chunk), this engine runs the complete block-level state machine
on device, so a lane can decode any byte-aligned multi-block raw-deflate
region — compress_parallel chunk bodies, whole gzip members, or zran index
regions of monolithic foreign streams.

Design (TPU-first, no translation):
  * lanes = independent regions, advanced in lockstep by ONE lax.while_loop;
    each iteration every lane performs one small step of its own state
    machine: read a block header field, decode one code-length symbol,
    or decode one literal/length+distance pair;
  * per-lane flat 2^15-entry decode LUTs are built ON DEVICE from the code
    lengths (canonical code starts + dense compare against the bit-reversed
    key table — no small-table gathers; the symbol tables are padded to the
    LUT width per the TPU pathology notes) under a lax.cond that runs only
    on iterations where some lane crossed into a new block;
  * tokens append to a dense COLUMN tape (lax.dynamic_update_slice at the
    loop index) instead of per-lane scatters — inactive lanes write
    zero-length null tokens that the resolver skips for free;
  * stored blocks emit a single "raw run" token (length + input byte
    offset); the resolver gathers those bytes straight from the input;
  * LZ back-references resolve by pointer doubling over the concatenated
    (window ++ output) index space, so zran regions can reference their
    32 KiB preloaded window.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

FLAT_BITS = 15
CL_BITS = 7

# token kinds in the tape
TOK_NULL = 0  # inactive iteration; covers zero output bytes
TOK_LIT = 1
TOK_MATCH = 2
TOK_RAW = 3  # stored-block run: `dist` holds the input BYTE offset

# lane phases
PH_HEADER = 0  # read BFINAL/BTYPE
PH_STORED = 1  # read LEN/NLEN, emit raw-run token
PH_TABLE_META = 2  # read HLIT/HDIST/HCLEN
PH_CL_LENS = 3  # read one 3-bit code-length-code length per step
PH_CL_BUILD = 4  # build the code-length LUT (cond-gated)
PH_CLEN = 5  # decode one code-length symbol per step
PH_BUILD = 6  # build the lit/len + dist LUTs (cond-gated)
PH_SYMS = 7  # decode one literal or match per step
PH_DONE = 8
PH_BAD = 9

KIND_LIT = 0
KIND_MATCH = 1
KIND_EOB = 2
KIND_INVALID = 4

_CL_ORDER = np.array(
    [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15], np.int32
)

# RFC 1951 length/distance code tables (derived; see ops/huffman.py)
_LBASE = np.zeros(29, np.int32)
_LEXTRA = np.zeros(29, np.int32)
_l = 3
for _i in range(8):
    _LBASE[_i] = _l
    _l += 1
for _e in range(1, 6):
    for _k in range(4):
        _i += 1
        _LBASE[_i] = _l
        _LEXTRA[_i] = _e
        _l += 1 << _e
_LBASE[28] = 258
_LEXTRA[28] = 0
_DBASE = np.zeros(30, np.int32)
_DEXTRA = np.zeros(30, np.int32)
_DBASE[:4] = [1, 2, 3, 4]
_d = 5
_i = 3
for _e in range(1, 14):
    for _k in range(2):
        _i += 1
        _DBASE[_i] = _d
        _DEXTRA[_i] = _e
        _d += 1 << _e


def _rev_table(nbits: int) -> np.ndarray:
    idx = np.arange(1 << nbits, dtype=np.uint32)
    r = np.zeros_like(idx)
    v = idx.copy()
    for _ in range(nbits):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r


_REV15_NP = _rev_table(FLAT_BITS)
_REV7_NP = _rev_table(CL_BITS)

# fixed (static) trees
_FIXED_LL_LENS = np.array([8] * 144 + [9] * 112 + [7] * 24 + [8] * 8, np.int32)
_FIXED_D_LENS = np.array([5] * 32, np.int32)


def _lut_entry(kind, aux, nbits, payload):
    return (
        (kind.astype(jnp.uint32) << 28)
        | (aux.astype(jnp.uint32) << 22)
        | (nbits.astype(jnp.uint32) << 16)
        | payload.astype(jnp.uint32)
    )


def _build_flat_lut(lengths, sym_kind, sym_aux, sym_payload, rev, nbits_total):
    """Device: flat 2^nbits LUT from per-symbol code lengths.

    lengths:int32[n] (0 = absent); sym_* give each symbol's decode entry
    fields. Canonical-code construction is fully dense: one-hot histograms,
    a 15-step unrolled first-code recurrence, dense >= comparison against
    the reversed key table (no gathers from small operands).
    """
    n = lengths.shape[0]
    onehot = jax.nn.one_hot(lengths, 16, dtype=jnp.int32)
    counts = jnp.sum(onehot, axis=0)
    # canonical first code per length: next_code[l] = (next_code[l-1] +
    # counts[l-1]) << 1, next_code[1] = 0, counts[0] treated as 0
    first = [jnp.int32(0), jnp.int32(0)]  # lengths 0 and 1 both start at 0
    code = jnp.int32(0)
    for l in range(2, 16):
        code = (code + counts[l - 1]) << 1
        first.append(code)
    first_code = jnp.stack(first)  # [16], indexed by code length
    # rank of each symbol among same-length symbols with smaller index
    ranks_all = jnp.cumsum(onehot, axis=0) - onehot
    rank = jnp.take_along_axis(ranks_all, lengths[:, None], axis=1)[:, 0]
    code_msb = first_code[lengths] + rank
    valid = lengths > 0
    start = jnp.where(valid, code_msb << (nbits_total - lengths), 1 << nbits_total)
    span = jnp.where(valid, 1 << (nbits_total - lengths), 0)
    any_valid = jnp.any(valid)

    # sort symbols by interval start; pad to LUT width so downstream
    # gathers read from a large operand (TPU small-gather pathology)
    order = jnp.argsort(start)
    s_start = start[order]
    s_end = s_start + span[order]
    s_len = lengths[order]
    s_kind = sym_kind[order]
    s_aux = sym_aux[order]
    s_payload = sym_payload[order]

    keys = rev  # uint32[2^nbits]: LSB index -> MSB-first value
    # membership: idx of covering interval = (#starts <= key) - 1. The
    # dense [2^nbits, n] compare was ~90ms per table build on chip; count
    # via a two-level one-hot int8 matmul histogram of the n interval
    # starts + an inclusive prefix sum over the key space instead (~1ms).
    nbins = (1 << nbits_total) + 1  # starts can equal the sentinel 2^nbits
    hi_bins = -(-nbins // 128)
    sv = jnp.clip(s_start, 0, nbins - 1).astype(jnp.int32)
    hi_oh = (sv[:, None] >> 7 == jnp.arange(hi_bins, dtype=jnp.int32)[None, :]).astype(jnp.int8)
    lo_oh = ((sv[:, None] & 127) == jnp.arange(128, dtype=jnp.int32)[None, :]).astype(jnp.int8)
    hist = lax.dot_general(
        hi_oh, lo_oh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).reshape(-1)[:nbins]
    count_le = jnp.cumsum(hist)
    pos = count_le[keys.astype(jnp.int32)] - 1
    pos = jnp.clip(pos, 0, n - 1)
    pad = 1 << nbits_total

    def _padded(a):
        return jnp.concatenate([a, jnp.zeros(pad - n, a.dtype)])

    g_end = _padded(s_end.astype(jnp.uint32))[pos]
    g_len = _padded(s_len)[pos]
    g_kind = _padded(s_kind)[pos]
    g_aux = _padded(s_aux)[pos]
    g_payload = _padded(s_payload)[pos]
    inside = (keys < g_end) & any_valid
    kind = jnp.where(inside, g_kind, KIND_INVALID)
    return _lut_entry(
        kind.astype(jnp.uint32), g_aux, g_len.astype(jnp.uint32), g_payload
    )


def _ll_symbol_fields(nsyms: int):
    syms = np.arange(nsyms)
    kind = np.where(syms < 256, KIND_LIT, KIND_INVALID)
    kind = np.where(syms == 256, KIND_EOB, kind)
    lc = np.clip(syms - 257, 0, 28)
    is_len = (syms >= 257) & (syms < 286)
    kind = np.where(is_len, KIND_MATCH, kind)
    payload = np.where(syms < 256, syms, np.where(is_len, _LBASE[lc], 0))
    aux = np.where(is_len, _LEXTRA[lc], 0)
    return (
        jnp.asarray(kind, jnp.int32),
        jnp.asarray(aux, jnp.int32),
        jnp.asarray(payload, jnp.int32),
    )


def _d_symbol_fields(nsyms: int):
    syms = np.arange(nsyms)
    dc = np.clip(syms, 0, 29)
    kind = np.where(syms < 30, KIND_MATCH, KIND_INVALID)
    return (
        jnp.asarray(kind, jnp.int32),
        jnp.asarray(_DEXTRA[dc] * (syms < 30), jnp.int32),
        jnp.asarray(_DBASE[dc] * (syms < 30), jnp.int32),
    )


def _cl_symbol_fields():
    syms = np.arange(19)
    return (
        jnp.asarray(np.full(19, KIND_LIT), jnp.int32),
        jnp.asarray(np.zeros(19), jnp.int32),
        jnp.asarray(syms, jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("max_steps", "max_out"))
def decode_regions(comp, start_bits, end_bits, out_targets, max_steps: int, max_out: int):
    """Decode B byte-padded regions in lockstep.

    comp: uint8[B, L] region bytes (each lane's region starts at bit
    start_bits[b] and must not read past end_bits[b]); out_targets[b] is
    the expected output size (decoding stops once reached, ends of regions
    included). Returns (tok_kind, tok_a, tok_b, n_steps, produced, bad):
    tape arrays uint8/int32[B, max_steps] where a=length/value and
    b=dist/input-offset per kind.
    """
    B, L = comp.shape
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

    def body(state):
        (i, phase, bitpos, final_f, produced,
         hlit, hdist, hclen, cl_got, cl_lens,
         lens_arr, lens_have, prev_len,
         cl_lut, ll_lut, d_lut,
         tk, ta, tb) = state

        col_kind = jnp.zeros(B, jnp.uint8)
        col_a = jnp.zeros(B, jnp.int32)
        col_b = jnp.zeros(B, jnp.int32)

        # input exhausted: done if the lane already produced its target
        # (seam-format bodies end at a block boundary with no BFINAL),
        # otherwise the region is bad/truncated
        over_end = bitpos > end_bits
        running = (phase != PH_DONE) & (phase != PH_BAD)
        phase = jnp.where(
            over_end & running,
            jnp.where(produced >= out_targets, PH_DONE, PH_BAD),
            phase,
        )

        # ---- PH_HEADER: 3 bits ------------------------------------------
        in_hdr = phase == PH_HEADER
        hdr = peek(bitpos, jnp.uint32(3))
        h_final = (hdr & 1).astype(jnp.int32)
        h_btype = (hdr >> 1).astype(jnp.int32)
        hdr_next_phase = jnp.where(
            h_btype == 0,
            PH_STORED,
            jnp.where(h_btype == 1, PH_BUILD, jnp.where(h_btype == 2, PH_TABLE_META, PH_BAD)),
        )
        final_f = jnp.where(in_hdr, h_final, final_f)
        new_bitpos = jnp.where(in_hdr, bitpos + 3, bitpos)
        # mark fixed-table request: hclen == -1 signals "use fixed trees"
        hclen = jnp.where(in_hdr & (h_btype == 1), -1, hclen)
        phase = jnp.where(in_hdr, hdr_next_phase, phase)
        bitpos = new_bitpos

        # ---- PH_STORED: align + LEN/NLEN + raw token --------------------
        in_st = phase == PH_STORED
        aligned = (bitpos + 7) & ~jnp.int32(7)
        st_len = peek(aligned, jnp.uint32(16)).astype(jnp.int32)
        st_nlen = peek(aligned + 16, jnp.uint32(16)).astype(jnp.int32)
        st_ok = st_len == (~st_nlen & 0xFFFF)
        st_data_byte = (aligned + 32) >> 3
        col_kind = jnp.where(in_st & st_ok & (st_len > 0), TOK_RAW, col_kind).astype(jnp.uint8)
        col_a = jnp.where(in_st & st_ok, st_len, col_a)
        col_b = jnp.where(in_st & st_ok, st_data_byte, col_b)
        produced = jnp.where(in_st & st_ok, produced + st_len, produced)
        bitpos = jnp.where(in_st & st_ok, aligned + 32 + 8 * st_len, bitpos)
        phase = jnp.where(
            in_st,
            jnp.where(
                ~st_ok, PH_BAD,
                jnp.where((final_f == 1) | (produced >= out_targets), PH_DONE, PH_HEADER),
            ),
            phase,
        )

        # ---- PH_TABLE_META: 14 bits -------------------------------------
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

        # ---- PH_CL_LENS: one 3-bit length per step ----------------------
        in_cl = phase == PH_CL_LENS
        v3 = peek(bitpos, jnp.uint32(3)).astype(jnp.int32)
        slot = cl_order[jnp.clip(cl_got, 0, 18)]
        upd = jax.nn.one_hot(slot, 19, dtype=jnp.int32) * v3[:, None]
        cl_lens = jnp.where(in_cl[:, None], cl_lens + upd, cl_lens)
        bitpos = jnp.where(in_cl, bitpos + 3, bitpos)
        cl_got = jnp.where(in_cl, cl_got + 1, cl_got)
        phase = jnp.where(in_cl & (cl_got >= hclen), PH_CL_BUILD, phase)

        # ---- PH_CL_BUILD: build the 2^7 code-length LUT (cond) ----------
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

        # ---- PH_CLEN: one code-length symbol per step -------------------
        in_cle = phase == PH_CLEN
        ccode = peek(bitpos, jnp.uint32(CL_BITS))
        ce = cl_lut[lane, ccode.astype(jnp.int32)]
        ckind = (ce >> 28).astype(jnp.int32)
        cnb = ((ce >> 16) & 0x3F).astype(jnp.int32)
        csym = (ce & 0xFFFF).astype(jnp.int32)
        c_bad = in_cle & (ckind == KIND_INVALID)
        after = bitpos + cnb
        rep_bits = jnp.where(csym == 16, 2, jnp.where(csym == 17, 3, jnp.where(csym == 18, 7, 0)))
        rep_extra = peek(after, jnp.uint32(7)).astype(jnp.int32) & ((1 << rep_bits) - 1)
        rep_n = jnp.where(
            csym == 16, 3 + rep_extra,
            jnp.where(csym == 17, 3 + rep_extra, jnp.where(csym == 18, 11 + rep_extra, 1)),
        )
        rep_val = jnp.where(csym < 16, csym, jnp.where(csym == 16, prev_len, 0))
        c_bad = c_bad | (in_cle & (csym == 16) & (lens_have == 0))
        c_bad = c_bad | (in_cle & (lens_have + rep_n > hlit + hdist))
        # write rep_n copies of rep_val at lens_arr[have:have+rep_n]
        idx320 = jnp.arange(320)[None, :]
        in_range = (idx320 >= lens_have[:, None]) & (idx320 < (lens_have + rep_n)[:, None])
        lens_arr = jnp.where(in_cle[:, None] & in_range, rep_val[:, None], lens_arr)
        lens_have = jnp.where(in_cle & ~c_bad, lens_have + rep_n, lens_have)
        prev_len = jnp.where(in_cle & ~c_bad, rep_val, prev_len)
        bitpos = jnp.where(in_cle & ~c_bad, after + rep_bits, bitpos)
        cl_done = in_cle & ~c_bad & (lens_have >= hlit + hdist)
        missing_eob = cl_done & (jnp.take_along_axis(lens_arr, jnp.full((B, 1), 256), 1)[:, 0] == 0)
        phase = jnp.where(c_bad | missing_eob, PH_BAD, jnp.where(cl_done, PH_BUILD, phase))

        # ---- PH_BUILD: build main LUTs (cond); fixed trees select -------
        need_b = phase == PH_BUILD
        use_fixed = need_b & (hclen == -1)

        def do_build(args):
            ll_in, d_in, lens_in, hlit_in = args
            # lit/len lengths = lens[0:hlit]; dist lengths = lens[hlit:hlit+hdist]
            idx = jnp.arange(320)[None, :]
            ll_lens = jnp.where(idx < hlit_in[:, None], lens_in, 0)
            gather_idx = jnp.clip(hlit_in[:, None] + idx, 0, 319)
            d_lens = jnp.take_along_axis(lens_in, gather_idx, axis=1)
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
            jnp.any(need_b),
            do_build,
            lambda a: (a[0], a[1]),
            (ll_lut, d_lut, lens_arr, hlit),
        )
        phase = jnp.where(need_b, PH_SYMS, phase)

        # ---- PH_SYMS: one literal or length+distance pair per step ------
        in_sy = phase == PH_SYMS
        code = peek(bitpos, jnp.uint32(FLAT_BITS))
        e = ll_lut[lane, code.astype(jnp.int32)]
        kind = (e >> 28).astype(jnp.int32)
        aux = ((e >> 22) & 0x3F).astype(jnp.int32)
        nb = ((e >> 16) & 0x3F).astype(jnp.int32)
        payload = (e & 0xFFFF).astype(jnp.int32)
        is_lit = in_sy & (kind == KIND_LIT)
        is_eob = in_sy & (kind == KIND_EOB)
        is_match = in_sy & (kind == KIND_MATCH)
        s_bad = in_sy & (kind == KIND_INVALID)
        p1 = bitpos + nb
        extra = peek(p1, jnp.uint32(13)).astype(jnp.int32) & ((1 << aux) - 1)
        length = payload + extra
        p2 = p1 + aux
        dcode = peek(p2, jnp.uint32(FLAT_BITS))
        de = d_lut[lane, dcode.astype(jnp.int32)]
        dkind = (de >> 28).astype(jnp.int32)
        daux = ((de >> 22) & 0x3F).astype(jnp.int32)
        dnb = ((de >> 16) & 0x3F).astype(jnp.int32)
        dpayload = (de & 0xFFFF).astype(jnp.int32)
        p3 = p2 + dnb
        dextra = peek(p3, jnp.uint32(13)).astype(jnp.int32) & ((1 << daux) - 1)
        dist = dpayload + dextra
        p4 = p3 + daux
        s_bad = s_bad | (is_match & (dkind != KIND_MATCH))
        col_kind = jnp.where(is_lit, TOK_LIT, jnp.where(is_match & ~s_bad, TOK_MATCH, col_kind)).astype(jnp.uint8)
        col_a = jnp.where(is_lit, 1, jnp.where(is_match, length, col_a))
        col_b = jnp.where(is_lit, payload, jnp.where(is_match, dist, col_b))
        produced = jnp.where(is_lit, produced + 1, jnp.where(is_match & ~s_bad, produced + length, produced))
        bitpos = jnp.where(is_lit, p1, jnp.where(is_match & ~s_bad, p4, jnp.where(is_eob, p1, bitpos)))
        hit_target = produced >= out_targets
        phase = jnp.where(
            s_bad, PH_BAD,
            jnp.where(
                is_eob,
                jnp.where(final_f == 1, PH_DONE, PH_HEADER),
                jnp.where((is_lit | is_match) & hit_target, PH_DONE, phase),
            ),
        )
        # region end: non-final trailing bodies (seam format) finish when
        # the bits run out exactly at a block boundary
        at_hdr_end = (phase == PH_HEADER) & (bitpos + 3 > end_bits)
        phase = jnp.where(at_hdr_end & (produced >= out_targets), PH_DONE, phase)

        tk = lax.dynamic_update_slice(tk, col_kind[:, None], (0, i))
        ta = lax.dynamic_update_slice(ta, col_a[:, None], (0, i))
        tb = lax.dynamic_update_slice(tb, col_b[:, None], (0, i))
        return (i + 1, phase, bitpos, final_f, produced,
                hlit, hdist, hclen, cl_got, cl_lens,
                lens_arr, lens_have, prev_len,
                cl_lut, ll_lut, d_lut,
                tk, ta, tb)

    def cond(state):
        i, phase = state[0], state[1]
        return (i < max_steps) & ~jnp.all((phase == PH_DONE) | (phase == PH_BAD))

    state = (
        jnp.int32(0),
        jnp.full((B,), PH_HEADER, jnp.int32),
        start_bits.astype(jnp.int32),
        jnp.zeros(B, jnp.int32),
        jnp.zeros(B, jnp.int32),
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
        jnp.zeros((B, max_steps), jnp.uint8),
        jnp.zeros((B, max_steps), jnp.int32),
        jnp.zeros((B, max_steps), jnp.int32),
    )
    out = lax.while_loop(cond, body, state)
    (i, phase, bitpos, _f, produced, *_rest) = out
    tk, ta, tb = out[-3], out[-2], out[-1]
    bad = phase == PH_BAD
    return tk, ta, tb, i, produced, bad


@functools.partial(jax.jit, static_argnames=("out_size", "wlen"))
def resolve_tokens(comp, tok_kind, tok_a, tok_b, windows, out_size: int, wlen: int):
    """Device: expand token tapes into output bytes via pointer doubling.

    The index space is [0, wlen + out_size): the first wlen positions are
    the preloaded window (known literals); tokens cover positions from wlen
    on. TOK_RAW tokens gather straight from the lane's input bytes.
    """
    B, S = tok_a.shape
    L = comp.shape[1]
    covers = jnp.where(tok_kind == TOK_NULL, 0, tok_a)
    outpos = wlen + jnp.cumsum(covers, axis=1) - covers
    total = wlen + jnp.sum(covers, axis=1)
    N = wlen + out_size
    idx = jnp.arange(N, dtype=jnp.int32)

    def one(comp_l, kind, a, b, pos, tot, win):
        # covering token per output byte WITHOUT a log(S)-round binary
        # search: live tokens have unique, sorted start positions, so
        # scatter each slot index at its start byte (unique-index scatters
        # measured as cheap as gathers on chip) and forward-fill with a
        # running max — one scatter + one cummax instead of ~18 gather
        # rounds over the byte axis.
        live = kind != TOK_NULL
        tgt = jnp.where(live, pos, N)  # dead slots dropped
        slot = jnp.arange(S, dtype=jnp.int32)
        starts = (
            jnp.zeros((N,), jnp.int32)
            .at[tgt]
            .max(jnp.where(live, slot, 0), mode="drop", unique_indices=True)
        )
        t = lax.cummax(starts)
        t = jnp.clip(t, 0, S - 1)
        in_window = idx < wlen
        within = idx < tot
        k = kind[t]
        off = idx - pos[t]
        # literals and raw runs resolve immediately
        val = jnp.where(k == TOK_LIT, b[t], 0).astype(jnp.uint8)
        raw_idx = jnp.clip(b[t] + off, 0, L - 1)
        val = jnp.where(k == TOK_RAW, comp_l[raw_idx], val)
        if wlen:
            winpad = jnp.concatenate(
                [win, jnp.zeros(N - wlen, jnp.uint8)]
            )
            val = jnp.where(in_window, winpad[jnp.minimum(idx, wlen - 1)], val)
        # positions beyond the produced total are never read: treat as known
        # (self-pointing) so the fixpoint converges. "known" == src points
        # at itself; matches chase src = i - dist through the copy chain.
        known0 = in_window | (k == TOK_LIT) | (k == TOK_RAW) | ~within
        src = jnp.where(known0, idx, jnp.where(k == TOK_MATCH, idx - b[t], idx))

        rounds = max(1, (max(N, 2) - 1).bit_length() + 1)

        def round_cond(carry):
            r, src, moved = carry
            # src-ONLY pointer doubling: one gather per round (val/known
            # gathers hoisted out — a single val gather at the fixpoint
            # resolves every byte), early-exiting when a round moves
            # nothing. This third of the gather volume is the dominant
            # cost of device decode.
            return (r < rounds) & moved

        def round_fn(carry):
            r, src, _moved = carry
            nsrc = src[jnp.clip(src, 0, N - 1)]
            return r + 1, nsrc, jnp.any(nsrc != src)

        _r, src, _m = lax.while_loop(
            round_cond, round_fn, (jnp.int32(0), src, jnp.array(True))
        )
        val = val[jnp.clip(src, 0, N - 1)]
        return jnp.where(within, val, 0), tot

    vals, totals = jax.vmap(one)(comp, tok_kind, tok_a, tok_b, outpos, total, windows)
    return vals[:, wlen:], totals - wlen
