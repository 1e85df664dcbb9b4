"""Raw DEFLATE stream introspection: parse blocks and LZ tokens.

A small, independent (pure-Python, table-free) decoder used by the
bit-exactness test harness to diff two deflate streams *structurally* —
block types/boundaries, tree shapes, and the literal/match token sequence —
so a byte mismatch against the zlib oracle can be localized to the first
diverging compressor decision rather than eyeballed in hex.

This is deliberately a second implementation, independent of
models/inflate.py, mirroring how the reference keeps differential decoders
around for verification (test-libz-rs-sys differential suite, SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class Block:
    kind: str  # "stored" | "static" | "dynamic"
    final: bool
    bit_start: int  # absolute bit offset of the 3-bit header
    tokens: list  # [("lit", byte) | ("match", length, dist)]
    stored_len: int = 0
    hlit: int = 0
    hdist: int = 0
    hclen: int = 0
    ll_lengths: tuple = ()
    d_lengths: tuple = ()


class _Bits:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def take(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _canon_decode_map(lengths) -> dict:
    """Map (code_len, code_value_msb) -> symbol for canonical Huffman codes."""
    table = {}
    code = 0
    for bits in range(1, 16):
        for sym, ln in enumerate(lengths):
            if ln == bits:
                table[(bits, code)] = sym
                code += 1
        code <<= 1
    return table


def _read_symbol(bits: _Bits, table: dict) -> int:
    code = 0
    for ln in range(1, 16):
        code = (code << 1) | bits.take(1)
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError(f"bad huffman code at bit {bits.pos}")


LENGTH_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
               35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258]
LENGTH_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
                3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0]
DIST_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
             257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
             8193, 12289, 16385, 24577]
DIST_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
              7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13]
CL_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]

_FIXED_LL = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
_FIXED_D = [5] * 30


def parse_deflate(raw: bytes, max_blocks: int | None = None) -> list[Block]:
    """Parse a raw deflate stream into structured blocks with token lists."""
    bits = _Bits(raw)
    blocks: list[Block] = []
    while True:
        start = bits.pos
        final = bits.take(1) == 1
        btype = bits.take(2)
        if btype == 0:
            bits.align()
            ln = bits.take(16)
            nln = bits.take(16)
            assert ln == (~nln & 0xFFFF), f"stored LEN/NLEN mismatch at bit {start}"
            byte0 = bits.pos >> 3
            toks = [("lit", b) for b in raw[byte0 : byte0 + ln]]
            bits.pos += 8 * ln
            blocks.append(Block("stored", final, start, toks, stored_len=ln))
        else:
            if btype == 1:
                blk = Block("static", final, start, [])
                ll_map = _canon_decode_map(_FIXED_LL)
                d_map = _canon_decode_map(_FIXED_D)
            elif btype == 2:
                hlit = bits.take(5) + 257
                hdist = bits.take(5) + 1
                hclen = bits.take(4) + 4
                cl_lens = [0] * 19
                for i in range(hclen):
                    cl_lens[CL_ORDER[i]] = bits.take(3)
                cl_map = _canon_decode_map(cl_lens)
                lens: list[int] = []
                while len(lens) < hlit + hdist:
                    sym = _read_symbol(bits, cl_map)
                    if sym < 16:
                        lens.append(sym)
                    elif sym == 16:
                        rep = 3 + bits.take(2)
                        lens.extend([lens[-1]] * rep)
                    elif sym == 17:
                        lens.extend([0] * (3 + bits.take(3)))
                    else:
                        lens.extend([0] * (11 + bits.take(7)))
                ll_lens, d_lens = lens[:hlit], lens[hlit : hlit + hdist]
                blk = Block(
                    "dynamic", final, start, [],
                    hlit=hlit, hdist=hdist, hclen=hclen,
                    ll_lengths=tuple(ll_lens), d_lengths=tuple(d_lens),
                )
                ll_map = _canon_decode_map(ll_lens)
                d_map = _canon_decode_map(d_lens)
            else:
                raise ValueError(f"invalid block type 3 at bit {start}")
            while True:
                sym = _read_symbol(bits, ll_map)
                if sym == 256:
                    break
                if sym < 256:
                    blk.tokens.append(("lit", sym))
                else:
                    li = sym - 257
                    length = LENGTH_BASE[li] + bits.take(LENGTH_EXTRA[li])
                    dsym = _read_symbol(bits, d_map)
                    dist = DIST_BASE[dsym] + bits.take(DIST_EXTRA[dsym])
                    blk.tokens.append(("match", length, dist))
            blocks.append(blk)
        if final or (max_blocks and len(blocks) >= max_blocks):
            return blocks


def first_divergence(a: bytes, b: bytes) -> str:
    """Human-readable first structural difference between two raw streams."""
    if a == b:
        return "identical"
    try:
        ba, bb = parse_deflate(a), parse_deflate(b)
    except Exception as e:  # malformed stream — report byte diff only
        i = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
        return f"byte diff at {i} (parse failed: {e})"
    for bi, (x, y) in enumerate(zip(ba, bb)):
        if (x.kind, x.final) != (y.kind, y.final):
            return f"block {bi}: kind/final {x.kind},{x.final} vs {y.kind},{y.final}"
        if x.kind == "dynamic" and (x.ll_lengths != y.ll_lengths or x.d_lengths != y.d_lengths):
            for s, (la, lb) in enumerate(zip(x.ll_lengths, y.ll_lengths)):
                if la != lb:
                    return f"block {bi}: ll code length of sym {s}: {la} vs {lb}"
            for s, (la, lb) in enumerate(zip(x.d_lengths, y.d_lengths)):
                if la != lb:
                    return f"block {bi}: dist code length of sym {s}: {la} vs {lb}"
            return f"block {bi}: tree geometry hlit/hdist/hclen {x.hlit},{x.hdist},{x.hclen} vs {y.hlit},{y.hdist},{y.hclen}"
        for ti, (ta, tb) in enumerate(zip(x.tokens, y.tokens)):
            if ta != tb:
                pos = sum(t[1] if t[0] == "match" else 1 for t in x.tokens[:ti])
                return f"block {bi} token {ti} (out pos ~{pos}): {ta} vs {tb}"
        if len(x.tokens) != len(y.tokens):
            return f"block {bi}: token count {len(x.tokens)} vs {len(y.tokens)}"
    if len(ba) != len(bb):
        return f"block count {len(ba)} vs {len(bb)}"
    return "same structure, different bit packing"
