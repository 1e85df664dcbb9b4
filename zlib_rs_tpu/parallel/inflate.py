"""Chunk-parallel inflate: batched device decode over independent regions.

The decode counterpart of parallel/pipeline.py and the TPU answer to the
reference's inflate_fast hot loop (zlib-rs/src/inflate.rs:1885-2163):

  * the host parses the cheap, tiny parts — stream framing and per-block
    Huffman headers (~100 bits each) — and builds per-chunk FLAT 15-bit
    decode LUTs (vectorized numpy: canonical code starts + binary search
    over bit-reversed indices; same math as inftrees.rs two-level tables but
    flattened because HBM is cheap and gathers are fast);
  * the device runs the symbol-serial part as ONE lax.while_loop vectorized
    across all chunks (lanes): per iteration each lane peeks 15 bits, gathers
    its LUT entry, consumes code+extra bits, and records a token;
  * LZ back-references are resolved with pointer doubling (log2(258) rounds
    of gather) instead of a serial copy loop — every output byte chases its
    source index until it lands on a literal;
  * checksums of the assembled output verify on device (ops/checksum.py).

Round 2: decode routes through parallel/device_inflate.py — the full
block-level state machine on device — so regions may hold any number of
stored/fixed/dynamic blocks. Works on compress_parallel streams via the
chunk index, on multi-member gzip archives (members split by fast native
skims), and on MONOLITHIC foreign zlib/raw streams via a native zran index
pass + window-primed parallel regions (`decompress_foreign`): the
rapidgzip recipe with an exact index instead of speculation (PAPERS.md).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import huffman as H

FLAT_BITS = 15
_REV15 = None


def _rev15_table() -> np.ndarray:
    global _REV15
    if _REV15 is None:
        idx = np.arange(1 << FLAT_BITS, dtype=np.uint32)
        r = np.zeros_like(idx)
        v = idx.copy()
        for _ in range(FLAT_BITS):
            r = (r << 1) | (v & 1)
            v >>= 1
        _REV15 = r
    return _REV15


# flat LUT entry: kind<<28 | extra_bits<<22 | code_bits<<16 | payload
KIND_LIT = 0
KIND_MATCH = 1
KIND_EOB = 2
KIND_INVALID = 4


def flat_table(kind: int, lengths: np.ndarray) -> np.ndarray:
    """Build a flat 2^15-entry LSB-first decode LUT from code lengths.

    Each entry resolves a full code in one lookup (no sub-tables): entry j
    decodes the codeword formed by the low bits of j.
    """
    lengths = np.asarray(lengths, np.int64)
    used = np.flatnonzero(lengths > 0)
    lut = np.full(1 << FLAT_BITS, (KIND_INVALID << 28), np.uint32)
    if used.size == 0:
        return lut
    codes_msb, _ = H.canonical_codes(lengths)
    # MSB-first interval of each symbol: [code << (15-l), (code+1) << (15-l))
    starts = (codes_msb[used] << (FLAT_BITS - lengths[used])).astype(np.uint32)
    order = np.argsort(starts)
    sused = used[order]
    sstarts = starts[order]
    key = _rev15_table()  # LSB index -> MSB-first 15-bit value
    pos = np.searchsorted(sstarts, key, side="right") - 1
    sym = sused[np.clip(pos, 0, sused.size - 1)]
    slen = lengths[sym]
    # validity: the key must fall inside the symbol's interval
    within = key < sstarts[np.clip(pos, 0, sused.size - 1)] + (
        1 << (FLAT_BITS - slen)
    ).astype(np.uint32)
    valid = (pos >= 0) & within

    if kind == 0:  # lit/len
        payload = np.where(sym < 256, sym, 0)
        k = np.where(sym < 256, KIND_LIT, KIND_INVALID)
        aux = np.zeros_like(sym)
        is_len = sym >= 257
        lc = np.clip(sym - 257, 0, 28)
        payload = np.where(is_len, H.LENGTH_BASE[lc], payload)
        aux = np.where(is_len, H.LENGTH_EXTRA[lc], aux)
        k = np.where(is_len & (sym < 286), KIND_MATCH, k)
        k = np.where(sym == 256, KIND_EOB, k)
    else:  # dist
        dc = np.clip(sym, 0, 29)
        payload = H.DIST_BASE[dc]
        aux = H.DIST_EXTRA[dc]
        k = np.where(sym < 30, KIND_MATCH, KIND_INVALID)
    entry = (
        (k.astype(np.uint32) << 28)
        | (aux.astype(np.uint32) << 22)
        | (slen.astype(np.uint32) << 16)
        | payload.astype(np.uint32)
    )
    lut[valid] = entry[valid]
    return lut


class _HostBits:
    """Minimal LSB-first host bit reader for header parsing."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.hold = 0
        self.bits = 0

    def take(self, n: int) -> int:
        while self.bits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated header")
            self.hold |= self.data[self.pos] << self.bits
            self.pos += 1
            self.bits += 8
        v = self.hold & ((1 << n) - 1)
        self.hold >>= n
        self.bits -= n
        return v

    def bit_offset(self) -> int:
        return self.pos * 8 - self.bits


def parse_block_header(data: bytes):
    """Parse one deflate block header from byte-aligned `data`.

    Returns one of:
      ("stored", final, payload_bytes, total_consumed_bytes)
      ("coded", final, ll_lengths, d_lengths, body_bit_offset)
    """
    br = _HostBits(data)
    final = br.take(1)
    btype = br.take(2)
    if btype == 0:
        # stored: align, LEN/NLEN, payload
        br.take(br.bits & 7)
        ln = br.take(16)
        nln = br.take(16)
        if ln != (~nln & 0xFFFF):
            raise ValueError("invalid stored block lengths")
        start = br.bit_offset() // 8
        return ("stored", final, data[start : start + ln], start + ln)
    if btype == 1:
        return ("coded", final, H.FIXED_LITLEN_LENGTHS, H.FIXED_DIST_LENGTHS, br.bit_offset())
    if btype != 2:
        raise ValueError("invalid block type")
    nlen = br.take(5) + 257
    ndist = br.take(5) + 1
    ncode = br.take(4) + 4
    if nlen > 286 or ndist > 30:
        raise ValueError("too many symbols")
    cl = np.zeros(19, np.int64)
    for i in range(ncode):
        cl[int(H.CL_ORDER[i])] = br.take(3)
    table, root, err = H.inflate_table(H.CODES, cl, 7)
    if err:
        raise ValueError(err)
    lens = np.zeros(nlen + ndist, np.int64)
    have = 0
    mask = (1 << root) - 1
    while have < nlen + ndist:
        while br.bits < 7 + 7:
            if br.pos >= len(br.data):
                break
            br.hold |= br.data[br.pos] << br.bits
            br.pos += 1
            br.bits += 8
        e = int(table[br.hold & mask])
        nb = (e >> 16) & 0x3F
        sym = e & 0xFFFF
        br.take(nb)
        if sym < 16:
            lens[have] = sym
            have += 1
        elif sym == 16:
            if have == 0:
                raise ValueError("invalid bit length repeat")
            rep = 3 + br.take(2)
            lens[have : have + rep] = lens[have - 1]
            have += rep
        elif sym == 17:
            have += 3 + br.take(3)
        else:
            have += 11 + br.take(7)
        if have > nlen + ndist:
            raise ValueError("invalid bit length repeat")
    if lens[256] == 0:
        raise ValueError("missing end-of-block")
    return ("coded", final, lens[:nlen], lens[nlen : nlen + ndist], br.bit_offset())


def _decode_tokens_batch(comp, ll_lut, d_lut, start_bits, max_syms: int):
    """Device: symbol-serial decode of B chunk bodies in lockstep lanes.

    comp: uint8[B, L]; returns per-lane token arrays (kind/payload arrays)
    and counts. Token encoding per slot: lit -> value 0..255 with len 0;
    match -> (length, dist); EOB terminates the lane.
    """
    B, L = comp.shape
    # per-byte u32 words for cheap 15+13-bit peeks
    b32 = comp.astype(jnp.uint32)
    words = jnp.zeros((B, L), jnp.uint32)
    w = b32
    w = w.at[:, : L - 1].add(b32[:, 1:] << 8)
    w = w.at[:, : L - 2].add(b32[:, 2:] << 16)
    w = w.at[:, : L - 3].add(b32[:, 3:] << 24)
    words = w

    lane = jnp.arange(B)

    def peek(bitpos, n):
        byte = bitpos >> 3
        sh = (bitpos & 7).astype(jnp.uint32)
        wd = words[lane, jnp.minimum(byte, L - 1)]
        ext = comp[lane, jnp.minimum(byte + 4, L - 1)].astype(jnp.uint32)
        v = (wd >> sh) | jnp.where(sh > 0, ext << (jnp.uint32(32) - sh), 0)
        return v & ((jnp.uint32(1) << n) - 1)

    def body(state):
        bitpos, nsym, done, lits, lens, dists = state
        code = peek(bitpos, jnp.uint32(FLAT_BITS))
        e = ll_lut[lane, code.astype(jnp.int32)]
        kind = e >> 28
        aux = (e >> 22) & 0x3F
        nb = (e >> 16) & 0x3F
        payload = e & 0xFFFF

        is_lit = kind == KIND_LIT
        is_eob = kind == KIND_EOB
        is_match = kind == KIND_MATCH
        bad = kind == KIND_INVALID

        pos_after_len = bitpos + nb.astype(jnp.int32)
        extra = peek(pos_after_len, jnp.uint32(13)) & ((jnp.uint32(1) << aux) - 1)
        length = payload + extra
        pos_after_extra = pos_after_len + aux.astype(jnp.int32)

        dcode = peek(pos_after_extra, jnp.uint32(FLAT_BITS))
        de = d_lut[lane, dcode.astype(jnp.int32)]
        dkind = de >> 28
        daux = (de >> 22) & 0x3F
        dnb = (de >> 16) & 0x3F
        dpayload = de & 0xFFFF
        pos_after_d = pos_after_extra + dnb.astype(jnp.int32)
        dextra = peek(pos_after_d, jnp.uint32(13)) & ((jnp.uint32(1) << daux) - 1)
        dist = dpayload + dextra
        pos_after_all = pos_after_d + daux.astype(jnp.int32)

        bad = bad | (is_match & (dkind != KIND_MATCH))
        new_bitpos = jnp.where(
            is_match, pos_after_all, jnp.where(is_lit | is_eob, pos_after_len, bitpos)
        )
        active = ~done & ~bad
        slot = jnp.minimum(nsym, max_syms - 1)
        lits = lits.at[lane, slot].set(
            jnp.where(active & is_lit, payload, lits[lane, slot]).astype(jnp.uint8)
        )
        lens = lens.at[lane, slot].set(
            jnp.where(active & is_match, length, jnp.where(active & is_lit, 0, lens[lane, slot])).astype(jnp.int32)
        )
        dists = dists.at[lane, slot].set(
            jnp.where(active & is_match, dist, jnp.where(active & is_lit, 0, dists[lane, slot])).astype(jnp.int32)
        )
        nsym = jnp.where(active & (is_lit | is_match), nsym + 1, nsym)
        done = done | is_eob | bad | (nsym >= max_syms)
        bitpos = jnp.where(active, new_bitpos, bitpos)
        return bitpos, nsym, done, lits, lens, dists

    def cond(state):
        return ~jnp.all(state[2])

    state = (
        start_bits.astype(jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), bool),
        jnp.zeros((B, max_syms), jnp.uint8),
        jnp.zeros((B, max_syms), jnp.int32),
        jnp.zeros((B, max_syms), jnp.int32),
    )
    bitpos, nsym, done, lits, lens, dists = lax.while_loop(cond, body, state)
    return nsym, lits, lens, dists


def _resolve_lz(lits, lens, dists, nsym, out_size: int):
    """Device: expand tokens into output bytes via pointer doubling.

    Token k covers output range [outpos_k, outpos_k + max(len_k,1)); every
    output byte computes its source index (itself for literals, i-dist for
    match bytes) and chases the chain until it reaches a literal.
    """
    B, S = lens.shape
    tok_out = jnp.maximum(lens, 1) * (jnp.arange(S)[None, :] < nsym[:, None])
    outpos = jnp.cumsum(tok_out, axis=1) - tok_out  # start of each token
    total = jnp.sum(tok_out, axis=1)

    idx = jnp.arange(out_size, dtype=jnp.int32)

    def one(lit, ln, ds, pos, tot):
        # map each output byte to its token via searchsorted over starts
        t = jnp.searchsorted(pos, idx, side="right", method="scan") - 1
        t = jnp.clip(t, 0, S - 1)
        within = idx < tot
        is_match = ln[t] > 0
        src = jnp.where(is_match, idx - ds[t], idx)
        lit_val = lit[t]
        # pointer doubling: chase src until it points at a literal byte
        val = jnp.where(is_match, 0, lit_val).astype(jnp.uint8)
        known = ~is_match

        def round_fn(_, carry):
            val, known, src = carry
            sidx = jnp.clip(src, 0, out_size - 1)
            val = jnp.where(known, val, val[sidx])
            nk = known | known[sidx]
            src = jnp.where(nk, src, src[sidx])
            return val, nk, src

        # max chain depth: a match byte's source may itself be a match byte;
        # doubling halves the chain every round, so ceil(log2(out_size))+1
        # rounds resolves any chain the chunk can express (a dist-1 run of
        # out_size bytes is out_size deep)
        rounds = max(1, (max(out_size, 2) - 1).bit_length() + 1)
        val, known, src = lax.fori_loop(0, rounds, round_fn, (val, known, src))
        return jnp.where(within, val, 0), tot

    return jax.vmap(one)(lits, lens, dists, outpos, total)


# raw deflate of b"" (final fixed block, EOB only) — used to pad lane counts
_EMPTY_REGION = b"\x03\x00"


def _pow2_at_least(n: int, floor: int) -> int:
    v = max(n, floor)
    return 1 << (v - 1).bit_length()


def decompress_chunks(
    bodies: list[bytes],
    out_sizes: list[int],
    windows: list[bytes] | None = None,
    start_bits: list[int] | None = None,
    engine: str = "auto",
) -> list[bytes]:
    """Decode B independent byte-aligned multi-block regions on device.

    Device engines —
      * "kernel" (ops/pallas/inflate_kernel.py): the production Pallas
        sequential decoder;
      * "lockstep" (parallel/device_inflate.py): per-symbol XLA state
        machine (the exact reference path and final fallback);
      * "turbo" (experiments/turbo_inflate.py): demoted position-parallel
        prototype, kept runnable for comparison only.
    engine="auto" tries kernel then falls back to lockstep on bad lanes.
    Bodies may be compress_parallel chunk bodies, whole gzip members, or
    zran regions of foreign streams. `windows` supplies optional 32 KiB
    history per region (zran priming); `start_bits` lets a region begin at
    a sub-byte bit offset within its first byte.

    Shapes are bucketed (lane count and row length padded to powers of
    two, dummy lanes hold an empty final block) so repeated calls share
    compiled executables.
    """
    from . import device_inflate as DI

    if not bodies:
        return []
    n_real = len(bodies)
    bodies = list(bodies)
    out_sizes = list(out_sizes)
    sb_list = list(start_bits) if start_bits else [0] * n_real
    win_list = list(windows) if windows is not None else None
    B = _pow2_at_least(n_real, 1)
    while len(bodies) < B:
        bodies.append(_EMPTY_REGION)
        out_sizes.append(0)
        sb_list.append(0)
        if win_list is not None:
            win_list.append(b"")
    L = _pow2_at_least(max(len(b) for b in bodies) + 8, 64)
    comp = np.zeros((B, L), np.uint8)
    for i, b in enumerate(bodies):
        comp[i, : len(b)] = np.frombuffer(b, np.uint8)
    sb = np.asarray(sb_list, np.int32)
    eb = np.array([len(b) * 8 for b in bodies], np.int32)
    targets = np.asarray(out_sizes, np.int32)
    max_out = _pow2_at_least(int(targets.max()), 1024) if int(targets.max()) else 1024
    wlen = 0
    wins = np.zeros((B, 0), np.uint8)
    if win_list is not None and any(win_list):
        wlen = 32768
        wins = np.zeros((B, wlen), np.uint8)
        for i, w in enumerate(win_list):
            if w:
                w = w[-wlen:]
                wins[i, wlen - len(w) :] = np.frombuffer(w, np.uint8)

    cj, sbj, ebj, tgj = (jnp.asarray(comp), jnp.asarray(sb),
                         jnp.asarray(eb), jnp.asarray(targets))

    # preferred engine: the Pallas sequential-inflate kernel — since round 3
    # it takes per-region 32 KiB window priming and sub-byte start bits, so
    # zran regions of FOREIGN streams decode on it directly. Gated on the
    # region fitting the kernel's SMEM budget (output + window + input +
    # tables); bad lanes fall through to the XLA engines below.
    kernel_auto = engine == "kernel" or (
        engine == "auto" and jax.devices()[0].platform == "tpu"
    )
    if kernel_auto and max_out + wlen + L <= 384 * 1024:
        from ..ops.pallas.inflate_kernel import decode_streams_pallas

        try:
            wpack = comp.reshape(B, L // 4, 4).astype(np.uint32)
            words = wpack[:, :, 0] | (wpack[:, :, 1] << 8) | (
                wpack[:, :, 2] << 16) | (wpack[:, :, 3] << 24)
            words = np.concatenate([words, np.zeros((B, 2), np.uint32)], axis=1)
            out_b, produced, kbad, _ebit = decode_streams_pallas(
                jnp.asarray(words), sbj, ebj, tgj,
                max_out=max_out,
                win=jnp.asarray(wins) if wlen else None,
                interpret=jax.devices()[0].platform != "tpu",
            )
            kbad_np = np.asarray(kbad)
            prod_np = np.asarray(produced)
            ok = ~kbad_np & (prod_np >= targets)
            if ok[:n_real].all():
                out_np = np.asarray(out_b)
                return [
                    out_np[i, : int(out_sizes[i])].tobytes()
                    for i in range(n_real)
                ]
            if engine == "kernel":
                which = int(np.flatnonzero(~ok[:n_real])[0])
                raise ValueError(f"region {which} failed to decode on device")
        except (ValueError, RuntimeError, OSError) as e:
            if engine == "kernel":
                raise
            from .pipeline import _note_fallback

            _note_fallback("region_kernel", e)

    tk = ta = tb = None
    if engine == "turbo":
        # demoted engine (experiments/turbo_inflate.py, ~0.07 MB/s/chip,
        # superseded by the Pallas kernel + vector engines): available
        # explicitly for comparison runs, no longer part of "auto"
        from experiments import turbo_inflate as TI

        max_blocks = max(8, max_out // 16384 + 8)
        tk, ta, tb, _produced, bad, _blk = TI.decode_regions_turbo(
            cj, sbj, ebj, tgj, max_blocks=max_blocks, max_out=max_out,
        )
        if bool(np.asarray(bad).any()):
            which = int(np.flatnonzero(np.asarray(bad))[0])
            raise ValueError(f"region {which} failed to decode on device")
    if tk is None:
        # step budget: one output byte per literal plus per-block header slack
        max_steps = max_out + 2 + 512 * max(1, max(len(b) for b in bodies) // 4096)
        tk, ta, tb, _nsteps, _produced, bad = DI.decode_regions(
            cj, sbj, ebj, tgj, max_steps=max_steps, max_out=max_out,
        )
        if bool(np.asarray(bad).any()):
            which = int(np.flatnonzero(np.asarray(bad))[0])
            raise ValueError(f"region {which} failed to decode on device")
    vals, totals = DI.resolve_tokens(
        cj, tk, ta, tb, jnp.asarray(wins),
        out_size=max_out, wlen=wlen,
    )
    vals_np = np.asarray(vals)
    return [vals_np[i, : int(out_sizes[i])].tobytes() for i in range(n_real)]


def decompress_foreign(data: bytes, span: int = 1 << 20, engine: str = "auto") -> bytes:
    """Device decode of a FOREIGN zlib/gzip/raw stream (not produced by this
    framework): multi-member gzip members split on host become independent
    device regions; monolithic streams are zran-indexed (one fast native
    skim) and their regions decode in parallel on device with 32 KiB window
    priming. The container checksum verifies at the end.

    This is the capability ladder the reference's seam primitives enable
    (inflate.rs:2465-2545 sync points, SURVEY.md §2e) — an index pass plus
    parallel region decode, the rapidgzip recipe without speculation.
    """
    from ..models import zran as Z
    from ..ops import checksum

    if data[:2] == b"\x1f\x8b":
        # split members with fast native skims, then decode all on device
        from .. import native

        members = []  # (raw_body, isize, crc)
        pos = 0
        while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
            hdr, _ = Z._wrapper_span(data[pos:])
            body = data[pos + hdr :]
            if native.available():
                full, _pts, used = native.zran_index(
                    body, 1 << 62, 4 * len(body) + (1 << 20)
                )
            else:
                import zlib as _z

                d = _z.decompressobj(-15)
                full = d.decompress(body)
                used = len(body) - len(d.unused_data)
            trailer = data[pos + hdr + used : pos + hdr + used + 8]
            members.append(
                (body[:used], len(full), int.from_bytes(trailer[:4], "little"))
            )
            pos = pos + hdr + used + 8
        parts = decompress_chunks(
            [m[0] for m in members], [m[1] for m in members], engine=engine
        )
        for part, (_b, _n, crc) in zip(parts, members):
            if checksum.crc32(part) != crc:
                raise ValueError("incorrect data check")
        return b"".join(parts)

    # monolithic zlib/raw stream: zran index -> parallel device regions
    index = Z.build_index(data, span=span)
    hdr, _kind = Z._wrapper_span(data)
    cuts = [(hdr * 8, 0, b"")] + [
        (
            (p.in_offset - 1) * 8 + (8 - p.bits) if p.bits else p.in_offset * 8,
            p.out_offset,
            p.window,
        )
        for p in index.points
    ]
    ends = [c[1] for c in cuts[1:]] + [index.total_out]
    end_bits = [c[0] for c in cuts[1:]] + [len(data) * 8]
    bodies, starts, targets, windows = [], [], [], []
    for (bitpos, out_off, window), eout, ebit in zip(cuts, ends, end_bits):
        # region k's bits end at cut k+1 (its last symbol finishes exactly
        # there), so truncate the body — keeps the device position universe
        # proportional to the span instead of the whole remaining stream
        bodies.append(data[bitpos >> 3 : ((ebit + 7) >> 3) + 8])
        starts.append(bitpos & 7)
        targets.append(eout - out_off)
        windows.append(window)
    parts = decompress_chunks(
        bodies, targets, windows=windows, start_bits=starts, engine=engine
    )
    out = b"".join(parts)
    if (
        len(data) >= 2 and (data[0] & 0x0F) == 8 and ((data[0] << 8) | data[1]) % 31 == 0
    ):
        if checksum.adler32(out) != int.from_bytes(data[-4:], "big"):
            raise ValueError("incorrect data check")
    return out
