"""Deflate: streaming DEFLATE/zlib/gzip compressor (host reference engine).

This is the framework's behavioral core for compression — the counterpart of
the reference's deflate driver + block algorithms + tree layer
(zlib-rs/src/deflate.rs:247-3354, deflate/algorithm/*.rs): all levels 0-9,
all strategies (Default/Filtered/HuffmanOnly/Rle/Fixed), zlib/gzip/raw
framing with full gzip header control, streaming flush semantics
(None/Partial/Sync/Full/Finish/Block), dictionary priming, mid-stream
parameter changes, bit-level priming, pending introspection, bound formulas,
and mid-stream copy.

Architecture notes (TPU-first design, not a translation):
  * Match finding uses the same *contract* as the reference (4-byte Knuth
    multiplicative hash, chained candidates, chain budget with good_length
    quartering, nice_length cutoff, lazy/greedy selection per level) but the
    code is organized around an append-only input buffer with absolute
    positions and vectorized hash precomputation — the same layout the
    chunk-parallel TPU matcher uses (ops/lz77.py), so the two paths share
    decision semantics.
  * Huffman code lengths come from package-merge (ops/huffman.py), which is
    optimal under the 15-bit limit, so dynamic blocks are never larger than
    the reference's for identical symbol statistics.
  * Block-type choice (stored/static/dynamic) follows the reference's cost
    rule (deflate.rs:2297-2415).

The engine produces output into an internal pending buffer; z_stream
avail_in/avail_out pumping lives in models/stream.py (mirroring the
reference's Pending layer, deflate/pending.rs).
"""

from __future__ import annotations

import copy as _copy

import numpy as np

from ..config import (
    CONFIGURATION_TABLE,
    DataType,
    DeflateConfig,
    DeflateFlush,
    GzHeader,
    MAX_MATCH,
    MIN_MATCH,
    ReturnCode,
    Strategy,
    Wrap,
    decode_window_bits_deflate,
)
from ..ops import checksum
from ..ops import huffman as H

HASH_BITS = 16
HASH_SIZE = 1 << HASH_BITS  # reference: deflate.rs:139
HASH_MULT = np.uint32(2654435761)  # Knuth multiplicative (hash_calc.rs:30-33)
MIN_LOOKAHEAD = MAX_MATCH + MIN_MATCH + 1  # 262, zlib's safety margin
MAX_STORED = 65535


def _hash_all(buf: np.ndarray) -> np.ndarray:
    """Vectorized 4-byte hash of every position (positions 0..n-4).

    Same function family as the reference's StandardHashCalc
    (deflate/hash_calc.rs:25-82): h = (le32(buf[i:i+4]) * K) >> 16, 16 bits.
    """
    n = buf.shape[0]
    if n < 4:
        return np.zeros(0, np.int64)
    w = (
        buf[: n - 3].astype(np.uint32)
        | (buf[1 : n - 2].astype(np.uint32) << 8)
        | (buf[2 : n - 1].astype(np.uint32) << 16)
        | (buf[3:n].astype(np.uint32) << 24)
    )
    return (((w * HASH_MULT) >> np.uint32(16)) & np.uint32(HASH_SIZE - 1)).astype(np.int64)


class BitWriter:
    """LSB-first bit packer into a byte FIFO (counterpart of deflate.rs:901+)."""

    def __init__(self, out: bytearray):
        self.out = out
        self.bitbuf = 0
        self.bitcnt = 0

    def send_bits(self, value: int, nbits: int) -> None:
        self.bitbuf |= (int(value) & ((1 << nbits) - 1)) << self.bitcnt
        self.bitcnt += nbits
        while self.bitcnt >= 8:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf >>= 8
            self.bitcnt -= 8

    def align(self) -> None:
        """Pad with zero bits to the next byte boundary (emit_align)."""
        if self.bitcnt:
            self.out.append(self.bitbuf & 0xFF)
        self.bitbuf = 0
        self.bitcnt = 0

    def flush_partial(self) -> None:
        """zlib bi_flush: push out whole bytes, keep the sub-byte tail."""
        while self.bitcnt >= 8:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf >>= 8
            self.bitcnt -= 8


def _scan_code_lengths(lengths: np.ndarray):
    """RLE a tree's code-length sequence into bl-alphabet symbols.

    Returns list of (symbol, extra_value, extra_bits). Semantics per RFC 1951
    3.2.7 / the reference's scan_tree (deflate.rs:2152): runs of the previous
    length use 16 (3-6 copies), runs of zero use 17 (3-10) / 18 (11-138).
    Runs do not cross tree boundaries (each tree scanned separately).
    """
    syms = []
    n = len(lengths)
    prevlen = -1
    i = 0
    while i < n:
        curlen = int(lengths[i])
        run = 1
        while i + run < n and int(lengths[i + run]) == curlen:
            run += 1
        count = run
        if curlen == 0:
            while count >= 11:
                take = min(count, 138)
                syms.append((18, take - 11, 7))
                count -= take
            if count >= 3:
                syms.append((17, count - 3, 3))
                count = 0
            for _ in range(count):
                syms.append((0, 0, 0))
        else:
            if prevlen != curlen:
                syms.append((curlen, 0, 0))
                count -= 1
            while count >= 3:
                take = min(count, 6)
                syms.append((16, take - 3, 2))
                count -= take
            for _ in range(count):
                syms.append((curlen, 0, 0))
        prevlen = curlen
        i += run
    return syms


def _detect_data_type(ll_freq: np.ndarray) -> DataType:
    """Binary/text sniff on literal frequencies (reference: deflate.rs:1505)."""
    # Black-listed control chars: 0..6, 14..25, 28..31 (zlib's block_mask).
    black = list(range(0, 7)) + list(range(14, 26)) + list(range(28, 32))
    if any(ll_freq[c] for c in black):
        return DataType.Binary
    if ll_freq[9] or ll_freq[10] or ll_freq[13] or np.any(ll_freq[32:256]):
        return DataType.Text
    return DataType.Binary


class Deflator:
    """Resumable deflate engine over explicit (input, flush) calls.

    Counterpart of the reference's DeflateStream + State (deflate.rs:37-136,
    1225-1358). Output accumulates in `self.pending`; callers drain it.
    """

    def __init__(self, config: DeflateConfig = DeflateConfig()):
        rc = config.validate()
        if rc != ReturnCode.Ok:
            raise ValueError(f"invalid deflate config: {config}")
        wrap, wbits = decode_window_bits_deflate(config.window_bits)
        if wbits == 8:
            wbits = 9  # zlib quirk: 8 is bumped to 9 (deflate.rs:294-300)
        self.config = config
        self.wrap = wrap
        self.wbits = wbits
        self.level = config.normalized_level()
        self.strategy = config.strategy
        self.mem_level = config.mem_level
        self.gzhead: GzHeader | None = None
        self._apply_level_params()
        self.reset()

    # -- lifecycle ---------------------------------------------------------

    def _apply_level_params(self) -> None:
        cfg = CONFIGURATION_TABLE[self.level]
        self.good_length = cfg.good_length
        self.max_lazy = cfg.max_lazy
        self.nice_length = cfg.nice_length
        self.max_chain = cfg.max_chain
        self.func = cfg.func
        # lit_bufsize symbols per block (reference: deflate.rs:316)
        self.lit_bufsize = 1 << (self.mem_level + 6)

    def reset(self) -> None:
        """deflateReset (reference: deflate.rs:739)."""
        self.wsize = 1 << self.wbits
        self.wmask = self.wsize - 1
        self.buf = bytearray()  # dictionary + all input seen
        self._hash_store = np.zeros(4096, np.int64)  # grows with input
        self.hashes = self._hash_store[:0]  # valid prefix view
        self.head = np.full(HASH_SIZE, -1, np.int64)
        self.prev = np.full(self.wsize, -1, np.int64)
        self.strstart = 0  # next position to process (absolute)
        self.inserted = 0  # positions hashed so far (absolute)
        self.block_start = 0  # first byte of the current block (absolute)
        self.base = 0  # output starts here (bytes before are dictionary)
        self.sym_dist: list[int] = []
        self.sym_lit: list[int] = []
        self.pending = bytearray()
        self.bw = BitWriter(self.pending)
        self.header_emitted = False
        self.finished = False
        self.adler = 1
        self.crc = 0
        self.total_in = 0
        self.total_out = 0
        self.data_type = DataType.Unknown
        self._match_available = False  # lazy matcher carry state
        self._prev_match = (0, 0)  # (length, dist) found at strstart-1
        self._block_types: list[str] = []  # introspection: emitted block kinds
        self._n_literals = 0  # observability counters (SURVEY.md section 5:
        self._n_matches = 0   # "counters as returned arrays — jit-friendly")
        self._match_bytes = 0

    def copy(self) -> "Deflator":
        """deflateCopy (reference: deflate.rs:602): deep mid-stream clone."""
        return _copy.deepcopy(self)

    # -- configuration surface ---------------------------------------------

    def set_header(self, head: GzHeader) -> ReturnCode:
        """deflateSetHeader (reference: deflate.rs:3126)."""
        if self.wrap != Wrap.Gzip or self.header_emitted:
            return ReturnCode.StreamError
        self.gzhead = head
        return ReturnCode.Ok

    def set_dictionary(self, dictionary: bytes) -> ReturnCode:
        """deflateSetDictionary (reference: deflate.rs:494-559).

        Only the last wsize bytes are retained. Must be called before any
        input is consumed (zlib additionally allows raw-mode mid-stream use).
        """
        if self.header_emitted and self.wrap != Wrap.Raw:
            return ReturnCode.StreamError
        if self.wrap == Wrap.Gzip:
            return ReturnCode.StreamError
        d = dictionary[-self.wsize :]
        if self.wrap == Wrap.Zlib:
            self.adler = checksum.adler32(dictionary, self.adler)
        self._append_input(d)
        self.strstart = len(self.buf)
        self.block_start = self.strstart
        self.base = self.strstart
        self._insert_hashes_upto(self.strstart)
        return ReturnCode.Ok

    def get_dictionary(self) -> bytes:
        """deflateGetDictionary (reference: deflate.rs:3273)."""
        lo = max(0, self.strstart - self.wsize)
        return bytes(self.buf[lo : self.strstart])

    def params(self, level: int, strategy: Strategy) -> ReturnCode:
        """deflateParams (reference: deflate.rs:436): mid-stream change.

        Flushes buffered symbols as a block under the old parameters first.
        """
        if level == -1:
            level = 6
        if not (0 <= level <= 9) or not (0 <= int(strategy) <= 4):
            return ReturnCode.StreamError
        if self.finished:
            return ReturnCode.StreamError
        if (level != self.level or strategy != self.strategy) and (
            self.sym_dist or self.strstart > self.block_start
        ):
            self._compress_pending_input(final=False)
            self._resolve_deferred()
            if self.sym_dist or self.strstart > self.block_start:
                self._flush_block(last=False)
        self.level = level
        self.strategy = strategy
        self._apply_level_params()
        return ReturnCode.Ok

    def tune(self, good_length: int, max_lazy: int, nice_length: int, max_chain: int) -> ReturnCode:
        """deflateTune (reference: deflate.rs:811-825).

        The reference truncates each knob to u16 and accepts any value; we
        additionally reject values a u16 cannot represent (negative or
        > 65535) with StreamError instead of silently wrapping, since a
        negative chain budget would corrupt the matcher's loop bounds.
        """
        for v in (good_length, max_lazy, nice_length, max_chain):
            if not isinstance(v, int) or not (0 <= v <= 0xFFFF):
                return ReturnCode.StreamError
        self.good_length = good_length
        self.max_lazy = max_lazy
        self.nice_length = nice_length
        self.max_chain = max_chain
        return ReturnCode.Ok

    def prime(self, bits: int, value: int) -> ReturnCode:
        """deflatePrime (reference: deflate.rs:561): inject bits into output."""
        if bits < 0 or bits > 16:
            return ReturnCode.StreamError
        if not self.header_emitted:
            self._emit_header()
        self.bw.send_bits(value, bits)
        return ReturnCode.Ok

    def pending_info(self) -> tuple[int, int]:
        """deflatePending (reference: lib.rs:1618): (bytes, bits) not yet out."""
        return len(self.pending), self.bw.bitcnt

    def stats(self) -> dict:
        """Observability counters (the TPU-era replacement for the
        reference's ZLIB_DEBUG trace/sent_bits counters, SURVEY.md section 5):
        blocks by type, symbol mix, match coverage."""
        from collections import Counter

        return {
            "blocks": dict(Counter(self._block_types)),
            "literals": self._n_literals,
            "matches": self._n_matches,
            "match_bytes": self._match_bytes,
            "total_in": self.total_in,
            "total_out": self.total_out,
            "data_type": self.data_type.name,
        }

    def bound(self, source_len: int) -> int:
        """deflateBound (reference: deflate.rs:3174-3268), wrap-aware.

        Our emitters guarantee: any block is at most stored-cost (the block
        chooser takes the min), stored blocks add 5 bytes per 65535, and
        flush seams add <= 11 bytes each; the zlib-ng style formula below
        covers this with margin.
        """
        complen = source_len + (source_len >> 12) + (source_len >> 14) + (source_len >> 25) + 13
        if self.wrap == Wrap.Raw:
            wraplen = 0
        elif self.wrap == Wrap.Zlib:
            wraplen = 6 + (4 if self.strstart > self.base or self.base > 0 else 0)
        else:  # gzip
            wraplen = 18
            if self.gzhead is not None:
                if self.gzhead.extra is not None:
                    wraplen += 2 + len(self.gzhead.extra)
                if self.gzhead.name is not None:
                    wraplen += len(self.gzhead.name) + 1
                if self.gzhead.comment is not None:
                    wraplen += len(self.gzhead.comment) + 1
                if self.gzhead.hcrc:
                    wraplen += 2
        return complen + wraplen

    # -- input management ---------------------------------------------------

    def _maybe_prune(self) -> None:
        """Bounded-memory sliding window (reference: fill_window's slide +
        slide_hash, deflate.rs:1757-1842, slide_hash.rs).

        Everything before min(block_start, strstart - wsize) can be
        discarded. The drop amount is a multiple of wsize so that
        `pos & wmask` indexing into `prev` stays consistent after rebasing
        absolute positions.
        """
        keep_from = min(self.block_start, max(0, self.strstart - self.wsize))
        drop = (keep_from // self.wsize) * self.wsize
        if drop < 8 * self.wsize:
            return
        del self.buf[:drop]
        nh = self.hashes.shape[0]
        remaining = max(0, nh - drop)
        if remaining:
            self._hash_store[:remaining] = self._hash_store[drop:nh]
        self.hashes = self._hash_store[:remaining]
        # slide_hash: rebase chain entries, invalidating anything dropped
        self.head = np.where(self.head >= drop, self.head - drop, -1)
        self.prev = np.where(self.prev >= drop, self.prev - drop, -1)
        self.strstart -= drop
        self.block_start -= drop
        self.inserted = max(0, self.inserted - drop)
        self.base = max(0, self.base - drop)

    def _append_input(self, data: bytes) -> None:
        if not data:
            return
        self._maybe_prune()
        n0 = len(self.buf)
        self.buf.extend(data)
        n1 = len(self.buf)
        nh = max(0, n1 - 3)  # number of hashable positions
        if self._hash_store.shape[0] < nh:
            grown = np.zeros(max(2 * self._hash_store.shape[0], nh), np.int64)
            grown[: self.hashes.shape[0]] = self.hashes
            self._hash_store = grown
        # recompute only the tail (positions n0-3 .. n1-4 gain a full window)
        start = max(0, n0 - 3)
        seg = np.frombuffer(bytes(self.buf[start:n1]), np.uint8)
        hs = _hash_all(seg)
        self._hash_store[start : start + hs.shape[0]] = hs
        self.hashes = self._hash_store[:nh]

    def _insert_hashes_upto(self, limit: int) -> None:
        """Insert hash-chain entries for positions [inserted, limit)."""
        limit = min(limit, self.hashes.shape[0])
        if limit <= self.inserted:
            return
        pos = np.arange(self.inserted, limit, dtype=np.int64)
        hs = self.hashes[self.inserted : limit]
        # Serial order matters only within identical hash values; np.ufunc.at
        # style scatter with last-writer-wins per hash gives head; prev links
        # need the previous occurrence, built with a grouped pass.
        if pos.shape[0] > 256:
            order = np.argsort(hs, kind="stable")
            sh, sp = hs[order], pos[order]
            same = np.zeros(sp.shape[0], bool)
            same[1:] = sh[1:] == sh[:-1]
            # within-batch predecessor
            prev_in_batch = np.where(same, np.concatenate([[0], sp[:-1]]), -1)
            # first occurrence of each hash in batch links to old head
            first_idx = ~same
            prev_val = np.where(first_idx, self.head[sh], prev_in_batch)
            self.prev[sp & self.wmask] = prev_val
            # head gets the last occurrence per hash
            last = np.zeros(sp.shape[0], bool)
            last[:-1] = sh[:-1] != sh[1:]
            last[-1] = True
            self.head[sh[last]] = sp[last]
        else:
            for p, h in zip(pos.tolist(), hs.tolist()):
                self.prev[p & self.wmask] = self.head[h]
                self.head[h] = p
        self.inserted = limit

    # -- match finding -------------------------------------------------------

    def _match_len(self, a: int, b: int, maxl: int) -> int:
        """Length of common prefix of buf[a:] and buf[b:], capped at maxl."""
        va = self.buf[a : a + maxl]
        vb = self.buf[b : b + maxl]
        if va == vb:
            return len(va)
        x = int.from_bytes(va, "little") ^ int.from_bytes(vb, "little")
        return ((x & -x).bit_length() - 1) >> 3

    def _longest_match(self, pos: int, prev_length: int) -> tuple[int, int]:
        """Chain walk (reference: deflate/longest_match.rs): returns
        (best_len, best_dist); best_len < MIN_MATCH means no match."""
        n = len(self.buf)
        maxl = min(MAX_MATCH, n - pos)
        if maxl < MIN_MATCH or prev_length >= maxl:
            return 0, 0
        limit = pos - (self.wsize - MIN_LOOKAHEAD)
        chain = max(1, self.max_chain)  # level 1 (quick): single head probe
        best_len = prev_length
        if self.good_length and best_len >= self.good_length:
            chain >>= 2
        nice = min(max(self.nice_length, MIN_MATCH), maxl)
        h = int(self.hashes[pos])
        cur = int(self.head[h])
        if cur == pos:  # pos itself was just inserted; start at its predecessor
            cur = int(self.prev[pos & self.wmask])
        best_dist = 0
        buf = self.buf
        while cur >= 0 and cur >= limit and chain > 0:
            chain -= 1
            # anchored rejection: check the byte that would extend best_len
            if best_len > 0 and buf[cur + best_len] != buf[pos + best_len]:
                cur = int(self.prev[cur & self.wmask])
                continue
            ml = self._match_len(pos, cur, maxl)
            if ml > best_len:
                best_len = ml
                best_dist = pos - cur
                if ml >= nice:
                    break
            cur = int(self.prev[cur & self.wmask])
        if best_dist == 0:
            return 0, 0
        return best_len, best_dist

    # -- symbol emission -----------------------------------------------------

    def _tally_lit(self, byte: int) -> None:
        self.sym_dist.append(0)
        self.sym_lit.append(byte)
        self._n_literals += 1

    def _tally_match(self, length: int, dist: int) -> None:
        self.sym_dist.append(dist)
        self.sym_lit.append(length)
        self._n_matches += 1
        self._match_bytes += length

    def _sym_full(self) -> bool:
        return len(self.sym_dist) >= self.lit_bufsize

    # -- block algorithms ----------------------------------------------------

    def _compress_pending_input(self, final: bool) -> None:
        """Run the level's matcher over unprocessed input.

        When not finalizing, keeps MIN_LOOKAHEAD bytes unprocessed so matches
        never straddle data we haven't seen the end of.
        """
        n = len(self.buf)
        limit = n if final else max(self.strstart, n - MIN_LOOKAHEAD)
        if self.level == 0 or self.func == "stored":
            self._deflate_stored(limit, final)
            return
        if self.strategy == Strategy.HuffmanOnly:
            self._deflate_huff(limit)
            return
        if self.strategy == Strategy.Rle:
            self._deflate_rle(limit)
            return
        if self.func in ("quick", "fast"):
            self._deflate_greedy(limit)
        else:  # medium, slow
            self._deflate_lazy(limit, final)

    def _deflate_stored(self, limit: int, final: bool) -> None:
        """Level 0: direct stored blocks (reference: algorithm/stored.rs)."""
        while self.strstart < limit:
            take = min(limit - self.strstart, MAX_STORED)
            # emit only full blocks unless flushing
            if take < MAX_STORED and not final:
                break
            self._emit_stored_block(
                self.buf[self.strstart : self.strstart + take],
                last=False,
            )
            self.strstart += take
            self.block_start = self.strstart
        self._insert_hashes_upto(self.strstart)

    def _deflate_huff(self, limit: int) -> None:
        """Strategy HuffmanOnly: literals only (reference: algorithm/huff.rs)."""
        while self.strstart < limit:
            self._tally_lit(self.buf[self.strstart])
            self.strstart += 1
            if self._sym_full():
                self._flush_block(last=False)
        self.inserted = max(self.inserted, min(self.strstart, self.hashes.shape[0]))

    def _deflate_rle(self, limit: int) -> None:
        """Strategy Rle: distance-1 runs only (reference: algorithm/rle.rs)."""
        while self.strstart < limit:
            pos = self.strstart
            run = 0
            if pos > self.base:
                prev_byte = self.buf[pos - 1]
                maxrun = min(MAX_MATCH, limit - pos)
                while run < maxrun and self.buf[pos + run] == prev_byte:
                    run += 1
            if run >= MIN_MATCH:
                self._tally_match(run, 1)
                self.strstart += run
            else:
                self._tally_lit(self.buf[pos])
                self.strstart += 1
            if self._sym_full():
                self._flush_block(last=False)
        self.inserted = max(self.inserted, min(self.strstart, self.hashes.shape[0]))

    def _accept_match(self, length: int, dist: int) -> bool:
        """zlib's too-far / filtered heuristics (deflate.rs TOO_FAR=4096)."""
        if length < MIN_MATCH:
            return False
        if length == MIN_MATCH and dist > 4096:
            return False
        if self.strategy == Strategy.Filtered and length <= 5:
            return False
        return True

    def _deflate_greedy(self, limit: int) -> None:
        """Levels 1-2: greedy matching (reference: quick.rs/fast.rs)."""
        nh = self.hashes.shape[0]
        while self.strstart < limit:
            pos = self.strstart
            length, dist = 0, 0
            if pos < nh:
                self._insert_hashes_upto(pos + 1)
                length, dist = self._longest_match(pos, 0)
            if self._accept_match(length, dist):
                self._tally_match(length, dist)
                self._insert_hashes_upto(min(pos + length, nh))
                self.strstart += length
            else:
                self._tally_lit(self.buf[pos])
                self.strstart += 1
            if self._sym_full():
                self._flush_block(last=False)

    def _deflate_lazy(self, limit: int, final: bool) -> None:
        """Levels 3-9: lazy matching — defer a match by one position if the
        next position matches longer (reference: algorithm/slow.rs, with
        medium's lookahead-trim semantics folded into the same loop)."""
        nh = self.hashes.shape[0]
        while self.strstart < limit:
            pos = self.strstart
            length, dist = 0, 0
            if pos < nh:
                self._insert_hashes_upto(pos + 1)
                prev_len = self._prev_match[0] if self._match_available else 0
                if prev_len < self.max_lazy:
                    length, dist = self._longest_match(pos, prev_len)
                if not self._accept_match(length, dist):
                    length, dist = 0, 0
            if self._match_available:
                plen, pdist = self._prev_match
                if length > plen:
                    # Previous position becomes a literal; keep searching.
                    # Flush (if due) BEFORE advancing past pos: the deferred
                    # match at pos belongs to the next block, and the block's
                    # byte coverage [block_start, strstart) must end at pos
                    # (zlib's deflate_slow flushes with strstart un-advanced).
                    self._tally_lit(self.buf[pos - 1])
                    self._prev_match = (length, dist)
                    if self._sym_full():
                        self._flush_block(last=False)
                    self.strstart += 1
                    continue
                else:
                    # emit the previous match, starting at pos-1
                    self._tally_match(plen, pdist)
                    self._insert_hashes_upto(min(pos - 1 + plen, nh))
                    self.strstart = pos - 1 + plen
                    self._match_available = False
                    if self._sym_full():
                        self._flush_block(last=False)
                    continue
            else:
                if length >= MIN_MATCH:
                    self._prev_match = (length, dist)
                    self._match_available = True
                else:
                    self._tally_lit(self.buf[pos])
            self.strstart += 1
            if not self._match_available and self._sym_full():
                self._flush_block(last=False)
        if final and self._match_available:
            self._resolve_deferred()

    def _resolve_deferred(self) -> None:
        """Resolve a pending lazy deferral (position strstart-1) to its match
        or a literal. Must run before any _flush_block while the lazy matcher
        has carry state, so block byte-coverage and symbols stay in step."""
        if not self._match_available:
            return
        plen, pdist = self._prev_match
        if plen >= MIN_MATCH and self.strstart - 1 + plen <= len(self.buf):
            self._tally_match(plen, pdist)
            self._insert_hashes_upto(min(self.strstart - 1 + plen, self.hashes.shape[0]))
            self.strstart = self.strstart - 1 + plen
        else:
            self._tally_lit(self.buf[self.strstart - 1])
        self._match_available = False

    # -- block emission ------------------------------------------------------

    def _emit_stored_block(self, data: bytes, last: bool) -> None:
        bw = self.bw
        i = 0
        if not data:
            bw.send_bits(1 if last else 0, 1)
            bw.send_bits(0, 2)
            bw.align()
            self.pending.extend(b"\x00\x00\xff\xff")
            self._block_types.append("stored")
            return
        while i < len(data):
            take = min(len(data) - i, MAX_STORED)
            is_last = last and (i + take == len(data))
            bw.send_bits(1 if is_last else 0, 1)
            bw.send_bits(0, 2)
            bw.align()
            ln = take
            self.pending.extend(bytes([ln & 0xFF, (ln >> 8) & 0xFF, ~ln & 0xFF, (~ln >> 8) & 0xFF]))
            self.pending.extend(data[i : i + take])
            i += take
            self._block_types.append("stored")

    def _emit_symbols(self, ll_codes, ll_lens, d_codes, d_lens) -> None:
        bw = self.bw
        L_BASE = H.LENGTH_BASE
        L_EXTRA = H.LENGTH_EXTRA
        D_BASE = H.DIST_BASE
        D_EXTRA = H.DIST_EXTRA
        LCODE = H.LENGTH_CODE
        DCODE = H.DIST_CODE
        for dist, lit in zip(self.sym_dist, self.sym_lit):
            if dist == 0:
                bw.send_bits(int(ll_codes[lit]), int(ll_lens[lit]))
            else:
                lc = int(LCODE[lit - 3])
                sym = 257 + lc
                bw.send_bits(int(ll_codes[sym]), int(ll_lens[sym]))
                eb = int(L_EXTRA[lc])
                if eb:
                    bw.send_bits(lit - int(L_BASE[lc]), eb)
                d = dist - 1
                dc = int(DCODE[d] if d < 256 else DCODE[256 + (d >> 7)])
                bw.send_bits(int(d_codes[dc]), int(d_lens[dc]))
                eb = int(D_EXTRA[dc])
                if eb:
                    bw.send_bits(dist - int(D_BASE[dc]), eb)
        bw.send_bits(int(ll_codes[256]), int(ll_lens[256]))  # end of block

    def _flush_block(self, last: bool) -> None:
        """Emit the buffered symbols as one block, choosing stored/static/
        dynamic by computed bit cost (reference: zng_tr_flush_block,
        deflate.rs:2297-2415)."""
        block_bytes = bytes(self.buf[self.block_start : self.strstart])
        nsyms = len(self.sym_dist)

        # frequencies
        dists = np.asarray(self.sym_dist, np.int64)
        lits = np.asarray(self.sym_lit, np.int64)
        ll_freq = np.zeros(286, np.int64)
        d_freq = np.zeros(30, np.int64)
        if nsyms:
            lit_mask = dists == 0
            if lit_mask.any():
                ll_freq[:256] = np.bincount(lits[lit_mask], minlength=256)[:256]
            mm = ~lit_mask
            if mm.any():
                lcodes = 257 + H.LENGTH_CODE[lits[mm] - 3]
                ll_freq += np.bincount(lcodes, minlength=286)[:286]
                dcodes = H.dist_to_code(dists[mm])
                d_freq += np.bincount(dcodes, minlength=30)[:30]
        ll_freq[256] += 1  # EOB

        if self.data_type == DataType.Unknown:
            self.data_type = _detect_data_type(ll_freq)

        # dynamic trees (package-merge; optimal under the 15-bit limit)
        ll_lens_dyn = H.huffman_code_lengths(ll_freq, 15)
        d_lens_dyn = H.huffman_code_lengths(d_freq, 15)
        nlen = max(257, int(np.max(np.nonzero(ll_lens_dyn)[0])) + 1)
        ndist = int(np.max(np.nonzero(d_lens_dyn)[0])) + 1 if np.any(d_lens_dyn) else 1

        # bl tree over the RLE'd code length sequences
        rle_ll = _scan_code_lengths(ll_lens_dyn[:nlen])
        rle_d = _scan_code_lengths(d_lens_dyn[:ndist])
        bl_freq = np.zeros(19, np.int64)
        extra_bl_bits = 0
        for sym, _v, eb in rle_ll + rle_d:
            bl_freq[sym] += 1
            extra_bl_bits += eb
        bl_lens = H.huffman_code_lengths(bl_freq, 7)
        order = H.CL_ORDER
        hclen = 19
        while hclen > 4 and bl_lens[order[hclen - 1]] == 0:
            hclen -= 1

        # costs in bits
        ll_extra = np.zeros(286, np.int64)
        ll_extra[257:286] = H.LENGTH_EXTRA
        d_extra = H.DIST_EXTRA.astype(np.int64)
        dyn_body = H.huffman_cost(ll_freq, ll_lens_dyn) + int(
            (ll_freq * ll_extra).sum() + (d_freq * (d_lens_dyn + d_extra)).sum()
        )
        dyn_hdr = 5 + 5 + 4 + 3 * hclen + H.huffman_cost(bl_freq, bl_lens) + extra_bl_bits
        opt_len = dyn_hdr + dyn_body

        static_ll = H.FIXED_LITLEN_LENGTHS.astype(np.int64)
        static_len = (
            int((ll_freq * (static_ll[:286] + ll_extra)).sum())
            + int((d_freq * (5 + d_extra)).sum())
        )
        if self.strategy == Strategy.Fixed:
            opt_len = static_len + (1 << 30)  # force static

        nbytes = len(block_bytes)
        nstored_blocks = max(1, -(-nbytes // MAX_STORED))
        stored_len = 8 * nbytes + 40 * nstored_blocks  # hdr ~5 bytes/65535

        if stored_len <= min(opt_len, static_len) + 3:
            self._emit_stored_block(block_bytes, last)
        elif static_len <= opt_len:
            bw = self.bw
            bw.send_bits(1 if last else 0, 1)
            bw.send_bits(1, 2)
            self._emit_symbols(
                H.STATIC_LITLEN_CODES_LSB,
                H.FIXED_LITLEN_LENGTHS,
                H.STATIC_DIST_CODES_LSB,
                H.FIXED_DIST_LENGTHS,
            )
            self._block_types.append("static")
        else:
            bw = self.bw
            bw.send_bits(1 if last else 0, 1)
            bw.send_bits(2, 2)
            bw.send_bits(nlen - 257, 5)
            bw.send_bits(ndist - 1, 5)
            bw.send_bits(hclen - 4, 4)
            _, bl_codes = H.canonical_codes(bl_lens)
            for i in range(hclen):
                bw.send_bits(int(bl_lens[order[i]]), 3)
            for sym, v, eb in rle_ll + rle_d:
                bw.send_bits(int(bl_codes[sym]), int(bl_lens[sym]))
                if eb:
                    bw.send_bits(v, eb)
            _, ll_codes = H.canonical_codes(ll_lens_dyn)
            _, d_codes = H.canonical_codes(d_lens_dyn)
            self._emit_symbols(ll_codes, ll_lens_dyn, d_codes, d_lens_dyn)
            self._block_types.append("dynamic")

        self.sym_dist.clear()
        self.sym_lit.clear()
        self.block_start = self.strstart

    # -- header / trailer ----------------------------------------------------

    def _emit_header(self) -> None:
        if self.wrap == Wrap.Zlib:
            cinfo = self.wbits - 8
            # compression-level hint bits (reference: deflate.rs header())
            if self.level < 2:
                flevel = 0
            elif self.level < 6:
                flevel = 1
            elif self.level == 6:
                flevel = 2
            else:
                flevel = 3
            has_dict = self.base > 0
            cmf = (cinfo << 4) | 8
            flg = (flevel << 6) | (0x20 if has_dict else 0)
            rem = (cmf * 256 + flg) % 31
            if rem:
                flg += 31 - rem
            self.pending.extend(bytes([cmf, flg]))
            if has_dict:
                self.pending.extend(self.adler.to_bytes(4, "big"))
                self.adler = 1  # restart for payload per zlib semantics
        elif self.wrap == Wrap.Gzip:
            h = self.gzhead
            flg = 0
            if h is not None:
                flg |= 0x01 if h.text else 0
                flg |= 0x02 if h.hcrc else 0
                flg |= 0x04 if h.extra is not None else 0
                flg |= 0x08 if h.name is not None else 0
                flg |= 0x10 if h.comment is not None else 0
            if self.level == 9:
                xfl = 2
            elif self.strategy >= Strategy.HuffmanOnly or self.level < 2:
                xfl = 4
            else:
                xfl = 0
            mtime = h.time if h is not None else 0
            osb = h.os if h is not None else 3
            hdr = bytearray([0x1F, 0x8B, 8, flg])
            hdr.extend((mtime & 0xFFFFFFFF).to_bytes(4, "little"))
            hdr.append(xfl)
            hdr.append(osb & 0xFF)
            if h is not None:
                if h.extra is not None:
                    hdr.extend(len(h.extra).to_bytes(2, "little"))
                    hdr.extend(h.extra)
                if h.name is not None:
                    hdr.extend(h.name)
                    hdr.append(0)
                if h.comment is not None:
                    hdr.extend(h.comment)
                    hdr.append(0)
                if h.hcrc:
                    hdr.extend((checksum.crc32(bytes(hdr)) & 0xFFFF).to_bytes(2, "little"))
            self.pending.extend(hdr)
        self.header_emitted = True

    def _emit_trailer(self) -> None:
        self.bw.align()
        if self.wrap == Wrap.Zlib:
            self.pending.extend(self.adler.to_bytes(4, "big"))
        elif self.wrap == Wrap.Gzip:
            self.pending.extend(self.crc.to_bytes(4, "little"))
            self.pending.extend((self.total_in & 0xFFFFFFFF).to_bytes(4, "little"))

    # -- main driver ---------------------------------------------------------

    def deflate(self, data: bytes, flush: DeflateFlush = DeflateFlush.NO_FLUSH) -> ReturnCode:
        """Consume `data`, produce output into `self.pending` per `flush`.

        Counterpart of the reference's deflate() driver (deflate.rs:2470).
        """
        if self.finished:
            if data:
                return ReturnCode.StreamError
            return ReturnCode.StreamEnd
        if not self.header_emitted:
            self._emit_header()
        data = bytes(data)
        if data:
            if self.wrap == Wrap.Zlib:
                self.adler = checksum.adler32(data, self.adler)
            elif self.wrap == Wrap.Gzip:
                self.crc = checksum.crc32(data, self.crc)
            self.total_in += len(data)
            self._append_input(data)

        final = flush == DeflateFlush.FINISH
        if final or flush != DeflateFlush.NO_FLUSH:
            self._compress_pending_input(final=True)
        else:
            self._compress_pending_input(final=False)

        if flush in (
            DeflateFlush.SYNC_FLUSH,
            DeflateFlush.FULL_FLUSH,
            DeflateFlush.PARTIAL_FLUSH,
            DeflateFlush.BLOCK,
        ):
            if self.sym_dist or self.strstart > self.block_start:
                self._flush_block(last=False)
            if flush == DeflateFlush.PARTIAL_FLUSH:
                # _tr_align: empty static block, 10 bits
                self.bw.send_bits(0, 1)
                self.bw.send_bits(1, 2)
                self.bw.send_bits(
                    int(H.STATIC_LITLEN_CODES_LSB[256]), int(H.FIXED_LITLEN_LENGTHS[256])
                )
                self.bw.flush_partial()
            elif flush in (DeflateFlush.SYNC_FLUSH, DeflateFlush.FULL_FLUSH):
                self._emit_stored_block(b"", last=False)  # 00 00 FF FF seam
                if flush == DeflateFlush.FULL_FLUSH:
                    # forget match history so decode can restart here
                    self.head.fill(-1)
                    self.prev.fill(-1)
        elif final:
            if self.sym_dist or self.strstart > self.block_start:
                self._flush_block(last=True)
            else:
                # no symbols at all: empty final static block
                self.bw.send_bits(1, 1)
                self.bw.send_bits(1, 2)
                self.bw.send_bits(
                    int(H.STATIC_LITLEN_CODES_LSB[256]), int(H.FIXED_LITLEN_LENGTHS[256])
                )
                self._block_types.append("static")
            self._emit_trailer()
            self.finished = True
            return ReturnCode.StreamEnd
        return ReturnCode.Ok

    def take_output(self, budget: int | None = None) -> bytes:
        """Drain up to `budget` bytes of pending output."""
        if budget is None or budget >= len(self.pending):
            out = bytes(self.pending)
            self.pending.clear()
        else:
            out = bytes(self.pending[:budget])
            del self.pending[:budget]
        self.total_out += len(out)
        return out


def compress_bound(source_len: int, config: DeflateConfig = DeflateConfig()) -> int:
    """compressBound (reference: deflate.rs:2956-2977)."""
    return Deflator(config).bound(source_len)


def compress(data: bytes, config: DeflateConfig = DeflateConfig()) -> bytes:
    """One-shot compress (reference: deflate.rs:2826 compress_slice)."""
    d = Deflator(config)
    rc = d.deflate(data, DeflateFlush.FINISH)
    assert rc == ReturnCode.StreamEnd, rc
    return d.take_output()
