"""Device-side dynamic Huffman construction and chunk encoding.

Counterpart of the reference's per-block tree build + emit
(zlib-rs/src/deflate.rs:1926-2415) for the TPU chunk-parallel path — but
vectorized instead of heap-based:

  * code lengths: start at ceil(-log2 p) (clamped to [1,15]) and spend the
    Kraft budget with bulk density-greedy rounds (see code_lengths_kraft)
    until sum 2^-l == 1 EXACTLY — required because inflate rejects
    incomplete dynamic codes; measured within ~0.3% of optimal lengths.
  * canonical code assignment: one-hot histogram + exclusive prefix sums
    (gen_codes, deflate.rs:2090, as pure array ops), bit-reversed for the
    LSB-first bitstream.
  * the chunk body (symbols + EOB) is packed on device with the per-chunk
    tables; the tiny 5+5+4/HCLEN/RLE header is built on host from the
    returned length arrays and bit-spliced (parallel/pipeline.py) — the only
    host work is O(bytes of header) per chunk.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import huffman as H
from . import lz77

MAX_BITS = 15
_KRAFT_ONE = 1 << MAX_BITS

_LEN_CODE = jnp.asarray(H.LENGTH_CODE.astype(np.int32))
_LEN_BASE = jnp.asarray(H.LENGTH_BASE.astype(np.int32))
_LEN_EXTRA = jnp.asarray(H.LENGTH_EXTRA.astype(np.int32))
_DIST_CODE_LUT = jnp.asarray(H.DIST_CODE.astype(np.int32))
_DIST_BASE = jnp.asarray(H.DIST_BASE.astype(np.int32))
_DIST_EXTRA = jnp.asarray(H.DIST_EXTRA.astype(np.int32))


def code_lengths_kraft(freqs: jnp.ndarray, max_bits: int = MAX_BITS) -> jnp.ndarray:
    """Length-limited prefix-code lengths with an exactly-tight Kraft sum.

    freqs: int32[n]. Returns int32[n] lengths (0 for unused symbols). For a
    single used symbol returns length 1 (incomplete codes with one symbol
    are legal in DEFLATE dynamic blocks).

    Round 2 algorithm (within ~0.3% of optimal vs the old deepest-level
    repair's ~5%): start at ceil(-log2 p) (Kraft-feasible), then spend the
    Kraft budget by BULK DENSITY GREEDY — each round shortens the whole
    prefix of candidates ordered by saved-bits-per-Kraft-unit density
    (f * 2^len) whose cumulative cost fits the remaining budget. The
    prefix-cost ranking is a dense O(n^2) comparison matvec, so the loop
    has no small-operand gathers or scatters (TPU pathology notes).
    Restricting each round's prefix to candidates whose cost fits the
    remaining budget guarantees progress every round (the densest
    affordable symbol is always taken), so 64 rounds always reach an
    exactly-tight sum; a lengthen branch handles the (clamp-induced)
    over-subscribed start.
    """
    n = freqs.shape[0]
    used = freqs > 0
    m = jnp.sum(used.astype(jnp.int32))
    total = jnp.maximum(jnp.sum(freqs), 1)

    f = jnp.maximum(freqs, 1).astype(jnp.float32)
    ratio = total.astype(jnp.float32) / f
    l0 = jnp.ceil(jnp.log2(ratio) - 1e-6).astype(jnp.int32)
    lens = jnp.where(used, jnp.clip(l0, 1, max_bits), 0)

    iota = jnp.arange(n, dtype=jnp.int32)
    ff = freqs.astype(jnp.float32)

    def kraft_units(lens):
        return jnp.sum(jnp.where(used, 1 << (max_bits - lens), 0))

    def round_fn(_, lens):
        b = _KRAFT_ONE - kraft_units(lens)

        # -- shorten (b > 0): bulk density-greedy prefix over AFFORDABLE
        # candidates (cost <= remaining budget), so at least the densest
        # affordable symbol is taken every round and the loop cannot stall
        cand = used & (lens >= 2)
        cost = jnp.where(cand, 1 << (max_bits - lens), 0).astype(jnp.int32)
        aff = cand & (cost > 0) & (cost <= b)
        dens = jnp.where(aff, ff * jnp.exp2(lens.astype(jnp.float32)), -1.0)
        # cost of all strictly-denser affordable candidates (ties by index):
        denser = (dens[None, :] > dens[:, None]) | (
            (dens[None, :] == dens[:, None]) & (iota[None, :] < iota[:, None])
        )
        csum = jnp.sum(
            jnp.where(denser & aff[None, :], cost[None, :], 0), axis=1
        )
        take = aff & (csum + cost <= b)
        lens_short = jnp.where(take & (b > 0), lens - 1, lens)

        # -- lengthen (b < 0): the lowest-frequency growable symbol
        candl = used & (lens < max_bits)
        lowf = jnp.min(jnp.where(candl, freqs, jnp.int32(2**30)))
        at_low = candl & (freqs == lowf)
        first_low = at_low & (jnp.cumsum(at_low.astype(jnp.int32)) == 1)
        lens_long = jnp.where(first_low, lens + 1, lens)

        return jnp.where(b > 0, lens_short, jnp.where(b < 0, lens_long, lens))

    # early-exit while: the bulk density-greedy usually lands the exact
    # Kraft sum in well under 16 rounds; the fixed-64 fori spent ~20us of
    # device latency per round REGARDLESS (1.27 ms/batch in the r5 encode
    # trace). 64 remains the guaranteed-progress upper bound.
    def cond_fn(st):
        r, lens = st
        return (r < 64) & (m > 0) & (kraft_units(lens) != _KRAFT_ONE)

    def body_fn(st):
        r, lens = st
        return r + 1, round_fn(None, lens)

    _, lens = jax.lax.while_loop(cond_fn, body_fn, (jnp.int32(0), lens))
    # single-symbol code: length 1 regardless of the Kraft loop
    lens = jnp.where(m == 1, jnp.where(used, 1, 0), lens)
    return lens


def canonical_codes_jax(lengths: jnp.ndarray) -> jnp.ndarray:
    """LSB-first canonical codes from lengths (gen_codes, deflate.rs:2090)."""
    n = lengths.shape[0]
    onehot = (
        lengths[:, None] == jnp.arange(1, MAX_BITS + 1, dtype=jnp.int32)[None, :]
    ).astype(jnp.int32)
    bl_count = jnp.sum(onehot, axis=0)  # [15], codes per length 1..15
    next_code = jnp.zeros((MAX_BITS + 1,), jnp.int32)
    code = jnp.int32(0)
    codes_per_len = [jnp.int32(0)] + [bl_count[i] for i in range(MAX_BITS)]
    nc_list = []
    for l in range(1, MAX_BITS + 1):
        code = (code + codes_per_len[l - 1]) * 2 if l > 1 else jnp.int32(0)
        nc_list.append(code)
    nc = jnp.stack(nc_list)  # first canonical code of each length 1..15
    rank = jnp.cumsum(onehot, axis=0) - onehot  # exclusive, per length class
    li = jnp.clip(lengths - 1, 0, MAX_BITS - 1)
    msb = nc[li] + rank[jnp.arange(n), li]
    # bit-reverse the low `lengths` bits
    v = msb.astype(jnp.uint32)
    r = jnp.zeros_like(v)
    for _ in range(16):
        r = (r << jnp.uint32(1)) | (v & jnp.uint32(1))
        v = v >> jnp.uint32(1)
    shift = (16 - jnp.maximum(lengths, 1)).astype(jnp.uint32)
    lsb = jnp.where(lengths > 0, r >> shift, 0)
    return lsb.astype(jnp.uint32)


def token_symbols(padded_u8, length, dist, tokens):
    """Per-position (ll_sym, d_sym, len_extra_val/bits, dist_extra_val/bits).

    d_sym is -1 for literals. Shared by freq counting and packing. Fully
    arithmetic (see lz77.length_symbol_arith) — tiny-table gathers are
    pathologically slow on TPU.
    """
    n = length.shape[0]
    byte = padded_u8[:n].astype(jnp.int32)
    is_match = tokens & (length >= lz77.MIN_MATCH)
    safe_len = jnp.clip(length, lz77.MIN_MATCH, lz77.MAX_MATCH)
    lc, leb, lev = lz77.length_symbol_arith(safe_len)
    ll_sym = jnp.where(is_match, 257 + lc, byte)
    e1 = jnp.where(is_match, lev, 0)
    eb1 = jnp.where(is_match, leb, 0)
    safe_d = jnp.clip(dist, 1, lz77.MAX_DIST)
    dc, deb, dev = lz77.dist_symbol_arith(safe_d)
    d_sym = jnp.where(is_match, dc, -1)
    e2 = jnp.where(is_match, dev, 0)
    eb2 = jnp.where(is_match, deb, 0)
    return ll_sym, d_sym, e1, eb1, e2, eb2


def encode_chunk_dynamic(padded_u8, n_valid, *, chain_depth=4, max_words=16, lazy=False, start=0, valid_from=0, n_seeds=0, parse=None):
    """One chunk -> dynamic-Huffman block BODY (symbols + EOB, no header).

    Returns (words u32[W], body_bits i32, ll_lens i32[286], d_lens i32[30]).
    The host builds the 5+5+4/HCLEN/RLE header from the length arrays and
    splices it in front (the header is O(100) bits; the body is O(chunk)).

    With n_seeds > 0, also returns (seeds_bit i32[n_seeds],
    seeds_out i32[n_seeds]): for seed j, the BODY-relative bit offset and
    chunk-relative output offset of the first token at or after output
    offset j*(chunk/n_seeds). These are the decode restart points the
    swarm (walker) device decoder consumes — recorded for free at encode
    time, where every token's bit offset is already known (the capability
    rapidgzip must reconstruct by scanning; SURVEY.md §2e seam hooks).
    """
    n = padded_u8.shape[0] - lz77.PAD
    if parse is not None:
        # precomputed tokenization (e.g. the Pallas sequential scan,
        # ops/pallas/deflate_kernel.py): tokens/length/dist as-is
        tokens, length, dist = parse
        tokens = tokens.astype(bool)
    else:
        length, dist = lz77.find_matches(
            padded_u8, n_valid, chain_depth=chain_depth, max_words=max_words,
            lazy=lazy, valid_from=valid_from,
        )
        # stage barriers: stop XLA from fusing each producer into the next
        # stage's gathers (it would recompute the producer per access)
        length, dist = jax.lax.optimization_barrier((length, dist))
        tokens = lz77.greedy_parse(length, n_valid, start)
        tokens = jax.lax.optimization_barrier(tokens)
    ll_sym, d_sym, e1, eb1, e2, eb2 = token_symbols(padded_u8, length, dist, tokens)
    ll_sym, d_sym, e1, eb1, e2, eb2 = jax.lax.optimization_barrier(
        (ll_sym, d_sym, e1, eb1, e2, eb2)
    )

    live = tokens
    # bincount by direct compare-and-reduce: bins are tiny (286/30), so
    # hist[s] = sum(sym == s) is a fused VPU stream over the chunk — no
    # sorts, no scatters, no gathers (a 2M-element device sort measured
    # ~0.4s; this is ~1ms)
    ll_masked = jnp.where(live, ll_sym, -1)
    ll_freq = jnp.sum(
        (ll_masked[:, None] == jnp.arange(286, dtype=jnp.int32)[None, :]),
        axis=0, dtype=jnp.int32,
    )
    ll_freq = ll_freq.at[256].add(1)  # EOB
    d_live = live & (d_sym >= 0)
    d_masked = jnp.where(d_live, d_sym, -1)
    d_freq = jnp.sum(
        (d_masked[:, None] == jnp.arange(30, dtype=jnp.int32)[None, :]),
        axis=0, dtype=jnp.int32,
    )

    ll_lens = code_lengths_kraft(ll_freq)
    d_lens = code_lengths_kraft(d_freq)
    ll_codes = canonical_codes_jax(ll_lens)
    d_codes = canonical_codes_jax(d_lens)
    ll_lens, d_lens, ll_codes, d_codes = jax.lax.optimization_barrier(
        (ll_lens, d_lens, ll_codes, d_codes)
    )

    # fuse per-token bits: llcode+extra+dcode+extra, <= 15+5+15+13 = 48 bits.
    # That exceeds one u32, so pack as TWO fields per token: the length side
    # (<=20 bits) and the distance side (<=28 bits). The per-chunk code
    # tables are zero-padded to a large operand before gathering — gathers
    # from tiny arrays hit a catastrophically slow TPU lowering.
    PADN = 32768
    ll_codes_p = jnp.zeros((PADN,), jnp.uint32).at[:286].set(ll_codes)
    ll_lens_p = jnp.zeros((PADN,), jnp.int32).at[:286].set(ll_lens)
    d_codes_p = jnp.zeros((PADN,), jnp.uint32).at[:30].set(d_codes)
    d_lens_p = jnp.zeros((PADN,), jnp.int32).at[:30].set(d_lens)
    v1 = ll_codes_p[ll_sym] | (
        e1.astype(jnp.uint32) << ll_lens_p[ll_sym].astype(jnp.uint32)
    )
    n1 = jnp.where(live, ll_lens_p[ll_sym] + eb1, 0)
    safe_dsym = jnp.maximum(d_sym, 0)
    v2 = d_codes_p[safe_dsym] | (
        e2.astype(jnp.uint32) << d_lens_p[safe_dsym].astype(jnp.uint32)
    )
    v2 = jnp.where(d_live, v2, 0)
    n2 = jnp.where(d_live, d_lens_p[safe_dsym] + eb2, 0)

    # interleave: token i contributes (v1, n1) then (v2, n2)
    values = jnp.stack([v1, v2], axis=1).reshape(-1)
    nbits = jnp.stack([n1, n2], axis=1).reshape(-1).astype(jnp.int32)
    # EOB terminator
    values = jnp.concatenate([values, ll_codes[256][None]])
    nbits = jnp.concatenate([nbits, ll_lens[256][None]])
    values, nbits = jax.lax.optimization_barrier((values, nbits))

    out_words = (16 * n + 64) // 32 + 4  # worst case ~15.x bits/byte + EOB
    words, total = lz77.pack_bits(values, nbits, 0, out_words)
    if not n_seeds:
        return words, total, ll_lens, d_lens

    # decode seeds: body-relative bit offset of the first token at/after
    # each output stride. Token at position p covers output byte p-start,
    # and its body bit offset is the running sum of per-position bit costs.
    per_pos_bits = n1 + n2  # 0 at non-token positions
    bit_off = jnp.cumsum(per_pos_bits) - per_pos_bits
    idx = jnp.arange(n, dtype=jnp.int32)
    tok_pos = jnp.where(live, idx, n + 1)
    # next token position at or after every position (reverse cummin)
    next_tok = jax.lax.cummin(tok_pos[::-1])[::-1]
    out_len = jnp.maximum(n_valid - start, 0)
    stride = jnp.maximum(out_len // n_seeds, 1)
    targets = jnp.clip(start + jnp.arange(n_seeds, dtype=jnp.int32) * stride, 0, n - 1)
    seed_pos = next_tok[targets]
    valid = seed_pos <= n  # past-the-end seeds mark empty walkers
    safe = jnp.clip(seed_pos, 0, n - 1)
    seeds_bit = jnp.where(valid, bit_off[safe], total)
    seeds_out = jnp.where(valid, safe - start, out_len)
    return words, total, ll_lens, d_lens, seeds_bit, seeds_out
