"""TPU-native LZ77 match finding, greedy parsing, and bit packing.

This is the device-side counterpart of the reference's match-finder + block
emission hot loops (zlib-rs/src/deflate/longest_match.rs, compare256.rs,
deflate.rs:1148 compress_block_help) — re-architected for a vector machine
instead of translated:

  * hash chains  -> SORTED SPACE: a stable argsort by hash puts a position's
    whole chain at its k preceding sorted slots, and pre-gathering the probe
    words into sorted order turns every candidate comparison into a
    shifted-slice vector op (zero gathers per candidate). compare256's byte
    tail is captured at the compare loop's break step; only the winner gets
    an extension scan. Run matches (dist<=1) get exact lengths via a
    run-length scan so long runs still reach 258;
  * greedy parse -> pointer doubling: nxt[i] = i + step[i]; log2(N) rounds of
    scatter-max mark exactly the token positions the serial greedy scan
    would visit;
  * bit packing  -> compact live tokens, then per-word segmented ORs over
    runs of equal start-word via two log-depth associative scans; the
    tokens-per-word histogram is a two-level one-hot int8 matmul on the MXU.
    (Profiled cost model: gathers ~10ns per ELEMENT, wide gather slices
    lower to serial loops, unique-index scatters are cheap — see
    ARCHITECTURE.md.)

Everything is fixed-shape and jittable; chunks are the unit of data
parallelism (vmap over a batch, shard_map over a mesh — parallel/pipeline.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from . import huffman as H

MAX_MATCH = 258
MIN_MATCH = 3
MAX_DIST = 32768
HASH_MULT = np.uint32(2654435761)
HASH_BITS = 20
PAD = 272  # tail padding so word reads past n_valid stay in bounds

# -- static-tree encode tables as device constants ---------------------------

_LL_CODE = jnp.asarray(H.STATIC_LITLEN_CODES_LSB.astype(np.uint32))
_LL_BITS = jnp.asarray(H.FIXED_LITLEN_LENGTHS.astype(np.int32))
_D_CODE = jnp.asarray(H.STATIC_DIST_CODES_LSB.astype(np.uint32))
_LEN_CODE = jnp.asarray(H.LENGTH_CODE.astype(np.int32))  # len-3 -> 0..28
_LEN_BASE = jnp.asarray(H.LENGTH_BASE.astype(np.int32))
_LEN_EXTRA = jnp.asarray(H.LENGTH_EXTRA.astype(np.int32))
_DIST_CODE_LUT = jnp.asarray(H.DIST_CODE.astype(np.int32))  # 512-entry zlib LUT
_DIST_BASE = jnp.asarray(H.DIST_BASE.astype(np.int32))
_DIST_EXTRA = jnp.asarray(H.DIST_EXTRA.astype(np.int32))


def words_le32(padded_u8: jnp.ndarray) -> jnp.ndarray:
    """u32 little-endian word starting at every byte offset (length n-3)."""
    b = padded_u8.astype(jnp.uint32)
    return b[:-3] | (b[1:-2] << 8) | (b[2:-1] << 16) | (b[3:] << 24)


def hash4(words: jnp.ndarray) -> jnp.ndarray:
    """Knuth multiplicative 4-byte hash (reference: hash_calc.rs:30-33)."""
    return ((words * HASH_MULT) >> jnp.uint32(32 - HASH_BITS)).astype(jnp.int32)


def _run_match_lengths(padded_u8: jnp.ndarray, n: int, n_valid, valid_from=0) -> jnp.ndarray:
    """Exact dist-1 match length at every position: number of j >= i with
    data[j] == data[j-1], capped at MAX_MATCH. Handles long runs that the
    capped word scan would truncate."""
    idx = jnp.arange(n, dtype=jnp.int32)
    eq_prev = jnp.concatenate(
        [jnp.zeros((1,), bool), padded_u8[1:n] == padded_u8[: n - 1]]
    )
    eq_prev = eq_prev & (idx < n_valid) & (idx > valid_from)
    # next position where eq_prev is False, at or after i
    mism = jnp.where(eq_prev, n, idx)
    next_mism = lax.cummin(mism[::-1])[::-1]
    return jnp.minimum(next_mism - idx, MAX_MATCH).astype(jnp.int32)


def _candidate_match_len(
    words: jnp.ndarray,
    idx: jnp.ndarray,
    cand: jnp.ndarray,
    maxcap: jnp.ndarray,
    max_words: int,
    skip_words: int = 0,
) -> jnp.ndarray:
    """Match length between positions idx and cand (cand < idx), word scan of
    up to `max_words` u32 steps + XOR byte tail, capped by `maxcap`.

    The current side needs no gather at all — `words[idx + 4s]` with
    idx = arange is a shifted slice; only the candidate side gathers (one
    element per word step). `skip_words` words are assumed already equal
    (pre-checked by a cheap filter pass)."""
    n = idx.shape[0]
    safe_c = jnp.maximum(cand, 0)
    cum = jnp.ones((n,), bool)
    nwords = jnp.full((n,), skip_words, jnp.int32)
    for s in range(skip_words, max_words):
        a = lax.dynamic_slice_in_dim(words, 4 * s, n)
        b = words[safe_c + 4 * s]
        cum = cum & (a == b)
        nwords = nwords + cum.astype(jnp.int32)
    # byte tail from the first mismatching word
    off = 4 * nwords
    xa = words[idx + off]
    xb = words[safe_c + off]
    x = xa ^ xb
    lowbit = x & (-x).astype(jnp.uint32)
    tz = jnp.where(x == 0, 32, 31 - lax.clz(lowbit.astype(jnp.int32)))
    tail = jnp.minimum(tz >> 3, 3).astype(jnp.int32)
    raw = jnp.minimum(off + tail, 4 * max_words)
    return jnp.minimum(raw, maxcap)


def find_matches(
    padded_u8: jnp.ndarray,
    n_valid,
    *,
    chain_depth: int = 4,
    max_words: int = 16,
    lazy: bool = False,
    valid_from=0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Best (length, dist) match at every position of one chunk.

    padded_u8: uint8[N + PAD] (zero-padded); n_valid: true chunk length.
    Returns (length int32[N], dist int32[N]); length < MIN_MATCH => literal.
    Counterpart of longest_match (deflate/longest_match.rs:7-80) with chain
    budget `chain_depth` and word-scan cap `max_words` (run matches exact).
    `valid_from` marks the first real byte (dictionary-primed chunks may
    have an unused gap before a short dictionary).
    """
    n = padded_u8.shape[0] - PAD
    words = words_le32(padded_u8)
    h = hash4(words[:n])
    idx = jnp.arange(n, dtype=jnp.int32)
    # positions outside [valid_from, n_valid) get sentinel hashes so they
    # never pollute chains or become match candidates
    h = jnp.where((idx >= valid_from) & (idx < n_valid), h, (1 << HASH_BITS) + (idx & 0xFF))

    maxcap = jnp.clip(n_valid - idx, 0, MAX_MATCH).astype(jnp.int32)

    # SORTED-SPACE scan: in stable (hash, position) order the whole hash
    # chain of a position is its k = 1..chain_depth sorted predecessors
    # (longest_match.rs's walk, flattened). Pre-gathering the first
    # `stage_words`+1 candidate probe words INTO sorted order makes every
    # candidate comparison a shifted vector op — zero gathers per
    # candidate — so the gathered-element count per position drops from
    # O(chain_depth * words) to O(stage_words): ~11 for the probe columns,
    # 2 for the winner's byte tail, 3 to un-sort the result, plus the
    # winner-only extension scan. Candidates are ranked at word
    # granularity (ties -> most recent = smallest dist); the exact XOR
    # byte tail is added for the winner only.
    stage_words = min(10, max_words)
    order = jnp.argsort(h, stable=True).astype(jnp.int32)
    sh = h[order]
    po = order
    rank = (
        jnp.zeros((n,), jnp.int32)
        .at[order]
        .set(jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    )
    ws = jnp.stack(
        [words[po + 4 * s] for s in range(stage_words + 1)]
    )  # [stage_words+1, n] candidate probes in sorted order
    maxcap_s = maxcap[po]
    capw_s = jnp.minimum(maxcap_s, 4 * stage_words)

    def tail_len(x):
        lowbit = x & (-x).astype(jnp.uint32)
        tz = jnp.where(x == 0, 32, 31 - lax.clz(lowbit.astype(jnp.int32)))
        return jnp.minimum(tz >> 3, 3).astype(jnp.int32)

    len_s = jnp.zeros((n,), jnp.int32)  # best exact length per sorted slot
    bs_dist = jnp.zeros((n,), jnp.int32)
    for k in range(1, chain_depth + 1):
        sh_k = jnp.concatenate([jnp.full((k,), -1, jnp.int32), sh[:-k]])
        po_k = jnp.concatenate([jnp.full((k,), -1, jnp.int32), po[:-k]])
        dist = po - po_k
        ok = (sh_k == sh) & (po_k >= 0) & (dist >= 1) & (dist <= MAX_DIST)
        cum = ok
        nw = jnp.zeros((n,), jnp.int32)
        tail = jnp.zeros((n,), jnp.int32)
        for s in range(stage_words):
            ws_k = jnp.concatenate([jnp.zeros((k,), jnp.uint32), ws[s, :-k]])
            eq = ws_k == ws[s]
            # exact byte tail captured at the break step — no gathers
            brk = cum & ~eq
            tail = jnp.where(brk, tail_len(ws_k ^ ws[s]), tail)
            cum = cum & eq
            nw = nw + cum.astype(jnp.int32)
        ml = jnp.where(ok, jnp.minimum(4 * nw + tail, capw_s), 0)
        better = ml > len_s  # strict: earlier k (more recent) wins ties
        len_s = jnp.where(better, ml, len_s)
        bs_dist = jnp.where(better, dist, bs_dist)

    # un-sort to position order
    best_len = len_s[rank]
    best_dist = jnp.where(best_len > 0, bs_dist[rank], 0)
    win_cand = jnp.where(best_len > 0, idx - best_dist, -1)

    # extend only the winner past the staged window
    if max_words > stage_words:
        ext = _candidate_match_len(
            words, idx, jnp.maximum(win_cand, 0), maxcap, max_words,
            skip_words=stage_words,
        )
        hit_cap = (win_cand >= 0) & (best_len >= 4 * stage_words)
        best_len = jnp.where(hit_cap, ext, best_len)

    # exact run matches (dist 1) rescue long runs from the word cap
    run_len = _run_match_lengths(padded_u8, n, n_valid, valid_from)
    run_ok = (idx > valid_from) & (run_len >= best_len) & (run_len >= MIN_MATCH)
    best_dist = jnp.where(run_ok & (run_len > best_len), 1, best_dist)
    best_len = jnp.where(run_ok, jnp.maximum(run_len, best_len), best_len)

    # acceptance: MIN_MATCH, and zlib's TOO_FAR rule for length-3 matches
    accept = (best_len >= MIN_MATCH) & ~((best_len == MIN_MATCH) & (best_dist > 4096))
    best_len = jnp.where(accept, best_len, 0)
    best_dist = jnp.where(accept, best_dist, 0)

    if lazy:
        # one-step lazy deferral (vectorized deflate_slow approximation,
        # reference algorithm/slow.rs): when the NEXT position matches
        # strictly longer, this position becomes a literal, so the greedy
        # parse picks the longer match one byte later.
        nxt = jnp.concatenate([best_len[1:], jnp.zeros((1,), jnp.int32)])
        defer = (best_len >= MIN_MATCH) & (nxt > best_len)
        best_len = jnp.where(defer, 0, best_len)
        best_dist = jnp.where(defer, 0, best_dist)
    return best_len, best_dist


def greedy_parse(length: jnp.ndarray, n_valid, start: int = 0) -> jnp.ndarray:
    """Token-start mask via pointer doubling.

    nxt[i] = i + max(length[i], 1); after ceil(log2 N) rounds of
    (scatter-max visited into nxt, nxt = nxt[nxt]) the visited set equals the
    serial greedy tokenization's start positions. `start` is the first
    emittable position (bytes before it are dictionary context only).
    """
    n = length.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    step = jnp.maximum(length, 1)
    nxt = jnp.minimum(idx + step, n).astype(jnp.int32)
    visited = jnp.zeros((n + 1,), jnp.int32).at[start].set(1)
    rounds = int(np.ceil(np.log2(max(n, 2)))) + 1
    for _ in range(rounds):
        visited = visited.at[nxt].max(visited[:n])
        nxt = jnp.minimum(nxt[jnp.minimum(nxt, n - 1)], n)
        nxt = jnp.where(nxt <= idx, n, nxt)  # safety: strictly forward
    return (visited[:n] > 0) & (idx >= start) & (idx < n_valid)


def bit_reverse_jax(v: jnp.ndarray, nbits: jnp.ndarray) -> jnp.ndarray:
    """Reverse the low `nbits` bits of each uint32 (pure bit ops, no LUT)."""
    v = v.astype(jnp.uint32)
    r = jnp.zeros_like(v)
    for _ in range(16):
        r = (r << jnp.uint32(1)) | (v & jnp.uint32(1))
        v = v >> jnp.uint32(1)
    return r >> (jnp.uint32(16) - nbits.astype(jnp.uint32))


def _bitlen(v: jnp.ndarray) -> jnp.ndarray:
    """Number of significant bits of v (v >= 1)."""
    return 32 - lax.clz(v.astype(jnp.int32))


def length_symbol_arith(safe_len: jnp.ndarray):
    """(length code 0..28, extra_bits, extra_val) from match length — the RFC
    doubling construction computed arithmetically (no table gathers: TPU
    gathers from tiny operands lower to a pathologically slow path)."""
    v = safe_len - MIN_MATCH  # 0..255
    vs = jnp.maximum(v, 8)
    e = _bitlen(vs) - 3  # >= 1
    lc_big = 4 + 4 * e + ((vs >> e) & 3)
    lc = jnp.where(v < 8, v, lc_big)
    lc = jnp.where(v == 255, 28, lc)
    eb = jnp.where((v < 8) | (v == 255), 0, e)
    ev = jnp.where((v < 8) | (v == 255), 0, v & ((1 << jnp.maximum(e, 0)) - 1))
    return lc, eb, ev


def dist_symbol_arith(safe_d: jnp.ndarray):
    """(dist code 0..29, extra_bits, extra_val) from distance, arithmetic."""
    d = safe_d - 1  # 0..32767
    ds = jnp.maximum(d, 4)
    e = _bitlen(ds) - 2  # >= 1
    dc_big = 2 * (e + 1) + ((ds >> e) & 1)
    dc = jnp.where(d < 4, d, dc_big)
    eb = jnp.where(d < 4, 0, e)
    ev = jnp.where(d < 4, 0, d & ((1 << jnp.maximum(e, 0)) - 1))
    return dc, eb, ev


def static_litlen_code(sym: jnp.ndarray):
    """(code_lsb, nbits) of the RFC 1951 fixed literal/length tree, computed
    arithmetically (3.2.6's four ranges) and bit-reversed for LSB packing."""
    code_msb = jnp.where(
        sym < 144,
        0x30 + sym,
        jnp.where(
            sym < 256,
            0x190 + (sym - 144),
            jnp.where(sym < 280, sym - 256, 0xC0 + (sym - 280)),
        ),
    )
    nbits = jnp.where(
        sym < 144, 8, jnp.where(sym < 256, 9, jnp.where(sym < 280, 7, 8))
    )
    return bit_reverse_jax(code_msb, nbits), nbits


def token_codes_static(
    padded_u8: jnp.ndarray,
    length: jnp.ndarray,
    dist: jnp.ndarray,
    tokens: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused (value, nbits) per position under the RFC 1951 static trees.

    Literals are <= 9 bits; matches fuse lenCode+extra+distCode+extra into
    <= 31 bits (counterpart of the reference's encode_len/encode_dist fusion,
    deflate.rs:915-961). Entirely arithmetic — zero table gathers.
    """
    n = length.shape[0]
    byte = padded_u8[:n].astype(jnp.int32)
    is_match = tokens & (length >= MIN_MATCH)

    lit_v, lit_n = static_litlen_code(byte)

    safe_len = jnp.clip(length, MIN_MATCH, MAX_MATCH)
    lc, eb1, e1 = length_symbol_arith(safe_len)
    v1, n1 = static_litlen_code(257 + lc)

    safe_d = jnp.clip(dist, 1, MAX_DIST)
    dc, eb2, e2 = dist_symbol_arith(safe_d)
    v2 = bit_reverse_jax(dc, jnp.full_like(dc, 5))  # fixed dist codes: 5 bits

    sh1 = n1.astype(jnp.uint32)
    sh2 = sh1 + eb1.astype(jnp.uint32)
    sh3 = sh2 + 5
    match_v = (
        v1
        | (e1.astype(jnp.uint32) << sh1)
        | (v2 << sh2)
        | (e2.astype(jnp.uint32) << sh3)
    )
    match_n = sh3.astype(jnp.int32) + eb2

    value = jnp.where(is_match, match_v, lit_v)
    nbits = jnp.where(is_match, match_n, lit_n)
    nbits = jnp.where(tokens, nbits, 0)
    value = jnp.where(tokens, value, jnp.uint32(0))
    return value, nbits.astype(jnp.int32)


def pack_bits(
    value: jnp.ndarray,
    nbits: jnp.ndarray,
    header_bits: int,
    out_words: int,
    *,
    min_token_bits: int = 1,
):
    """Bit packing of (value, nbits) tokens into u32 words, scan-based.

    TPU scatters serialize on colliding indices and gathers cost ~10ns per
    ELEMENT (the per-bit binary-search packer measured 8.2s per 2MiB batch
    on chip), so this version does almost no random access at all:

      1. compact live tokens to the front (stable argsort of the dead
         flag) — compacted start offsets are then sorted and contiguous;
      2. each <=32-bit token touches exactly two words: `lo` bits into its
         start word sw, `hi` spill into sw+1. Per-word values are
         segmented ORs over runs of equal sw — two log-depth
         `associative_scan`s, zero gathers;
      3. the tokens-per-word histogram (for locating each word's segment
         end) is a two-level one-hot int8 matmul on the MXU;
      4. the only gathers left are two elements per OUTPUT word.

    `min_token_bits` is accepted for API compatibility (no longer needed).
    Returns (words u32[out_words], total_bits incl. header).
    """
    tcap = value.shape[0]
    live = nbits > 0
    total = header_bits + jnp.sum(nbits)
    order = jnp.argsort(jnp.where(live, 0, 1).astype(jnp.int8), stable=True)
    lv = live[order]
    cval = jnp.where(lv, value[order], 0).astype(jnp.uint32)
    cnb = jnp.where(lv, nbits[order], 0).astype(jnp.int32)
    off = header_bits + jnp.cumsum(cnb) - cnb
    # a <=32-bit token starting at `off` touches exactly words sw and sw+1:
    # lo = bits landing in sw, hi = spill into sw+1
    sw = jnp.where(cnb > 0, off >> 5, jnp.int32(1 << 25))  # dead -> own seg
    sh = (off & 31).astype(jnp.uint32)
    lo = cval << sh
    hi = jnp.where(sh > 0, cval >> (jnp.uint32(32) - sh), jnp.uint32(0))
    # per-word value = OR of its segment of lo (tokens starting in it) and
    # the previous word's segment of hi. Offsets are sorted, so these are
    # segmented ORs over runs of equal sw — one log-depth associative scan
    # each, NO gathers (the earlier per-word K-wide gather rows cost ~34
    # gathered elements per input byte; this is 2 per output word).
    seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), sw[1:] != sw[:-1]]
    )

    def comb(a, b):
        f1, v1 = a
        f2, v2 = b
        return f1 | f2, jnp.where(f2, v2, v1 | v2)

    _, lo_scan = lax.associative_scan(comb, (seg_start, lo))
    _, hi_scan = lax.associative_scan(comb, (seg_start, hi))
    # tokens-per-word histogram: two-level one-hot int8 matmul on the MXU
    # (a 19-round searchsorted over these shapes measured 0.39s/round on
    # chip; this is ~ms of matmul)
    hh = -(-out_words // 256) + 1  # +1 spill row for dead/off-the-end
    swc = jnp.clip(sw, 0, hh * 256 - 1)
    hi_oh = (swc[:, None] >> 8 == jnp.arange(hh, dtype=jnp.int32)[None, :]).astype(
        jnp.int8
    )
    lo_oh = ((swc[:, None] & 255) == jnp.arange(256, dtype=jnp.int32)[None, :]).astype(
        jnp.int8
    )
    hist2 = lax.dot_general(
        hi_oh, lo_oh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [hh, 256]
    counts = hist2.reshape(-1)[:out_words]
    f_excl = jnp.cumsum(counts) - counts  # count(sw < w)
    last = jnp.clip(f_excl + counts - 1, 0, tcap - 1)  # last token in word w
    wlo = jnp.where(counts > 0, lo_scan[last], jnp.uint32(0))
    counts_p = jnp.concatenate([jnp.zeros((1,), counts.dtype), counts[:-1]])
    last_p = jnp.concatenate([jnp.zeros((1,), last.dtype), last[:-1]])
    whi = jnp.where(counts_p > 0, hi_scan[last_p], jnp.uint32(0))
    return wlo | whi, total


def encode_chunk_static(padded_u8: jnp.ndarray, n_valid, final, *, chain_depth=4, max_words=16, lazy=False, start=0, valid_from=0):
    """One chunk -> one static-Huffman deflate block (jittable).

    Returns (words u32[W], total_bits i32): the block header (BFINAL=final,
    BTYPE=01), all token codes, and the implicit zero-code EOB. The caller
    byte-aligns and stitches chunks (parallel/pipeline.py).
    """
    n = padded_u8.shape[0] - PAD
    length, dist = find_matches(
        padded_u8, n_valid, chain_depth=chain_depth, max_words=max_words,
        lazy=lazy, valid_from=valid_from,
    )
    # materialize stage outputs: without barriers XLA fuses these producers
    # into the downstream gathers and recomputes them per access (1000x)
    length, dist = lax.optimization_barrier((length, dist))
    tokens = greedy_parse(length, n_valid, start)
    tokens = lax.optimization_barrier(tokens)
    value, nbits = token_codes_static(padded_u8, length, dist, tokens)
    value, nbits = lax.optimization_barrier((value, nbits))
    # worst case ~9.06 bits/byte with static trees + header + EOB
    out_words = (9 * n + 64) // 32 + 2
    final_u32 = jnp.asarray(final, jnp.uint32)
    header = final_u32 | jnp.uint32(2)  # BFINAL | (BTYPE=01)<<1, LSB-first
    # static-tree live tokens are >= 7 bits (literal codes 7-9, matches more)
    words, total = pack_bits(value, nbits, 3, out_words, min_token_bits=7)
    words = words.at[0].add(header)
    total = total + 7  # EOB: static code 256 is 7 zero bits
    return words, total
