"""Random access into zlib/gzip streams (zran-style index + extract).

The capability the reference exposes through its seam primitives —
inflatePrime (inflate.rs:2165), inflateSetDictionary (inflate.rs:2627),
Z_BLOCK stops and inflateMark (inflate.rs:2611) — assembled into the classic
zran recipe: one sequential indexing pass records (input bit position,
32 KiB window) checkpoints at block boundaries; extract() then seeks to the
nearest checkpoint, primes a raw inflater with the sub-byte bit state, loads
the window as a dictionary, and decodes only the span it needs.

This is also what makes chunk-parallel decode of FOREIGN streams possible:
an index built once turns any monolithic stream into independently
decodable regions (the rapidgzip idea without speculation).
"""

from __future__ import annotations

import dataclasses

from ..config import InflateConfig, InflateFlush, ReturnCode
from .inflate import Inflator


@dataclasses.dataclass
class AccessPoint:
    out_offset: int  # uncompressed position of this checkpoint
    in_offset: int  # compressed BYTE offset to resume reading from
    bits: int  # sub-byte bit count to prime
    hold: int  # the unconsumed bit value to prime
    window: bytes  # last 32 KiB of output before this point


@dataclasses.dataclass
class DeflateIndex:
    points: list[AccessPoint]
    total_out: int
    wrapper_offset: int  # bytes of zlib/gzip header before deflate data

    def closest(self, offset: int) -> AccessPoint:
        best = self.points[0]
        for p in self.points:
            if p.out_offset <= offset:
                best = p
            else:
                break
        return best


def _wrapper_span(data: bytes) -> tuple[int, str]:
    """Return (header_length, kind) for a zlib/gzip/raw stream."""
    if len(data) >= 2 and data[:2] == b"\x1f\x8b":
        flg = data[3]
        pos = 10
        if flg & 0x04:  # FEXTRA
            xlen = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2 + xlen
        if flg & 0x08:  # FNAME
            pos = data.index(0, pos) + 1
        if flg & 0x10:  # FCOMMENT
            pos = data.index(0, pos) + 1
        if flg & 0x02:  # FHCRC
            pos += 2
        return pos, "gzip"
    if (
        len(data) >= 2
        and (data[0] & 0x0F) == 8
        and ((data[0] << 8) | data[1]) % 31 == 0
    ):
        hdr = 2 + (4 if data[1] & 0x20 else 0)  # FDICT adds the dict id
        return hdr, "zlib"
    return 0, "raw"


def build_index(data: bytes, span: int = 1 << 20) -> DeflateIndex:
    """One sequential pass over a zlib/gzip/raw stream recording access
    points roughly every `span` uncompressed bytes (zran's build pass).

    Uses the native engine's fused index pass (zrs_zran_index — the Z_BLOCK
    stop points recorded inside the inflate hot loop) when available,
    falling back to the Python engine. The native path covers
    single-member streams; multi-member gzip falls back."""
    native_idx = _build_index_native(data, span)
    if native_idx is not None:
        return native_idx
    inf = Inflator(InflateConfig(window_bits=47))
    points: list[AccessPoint] = []
    out_total = 0
    window = bytearray()
    pos = 0
    last_point_out = None
    wrapper_offset = None
    while True:
        rc, used, out = inf.inflate(data[pos:], None, InflateFlush.BLOCK)
        pos += used
        if out:
            out_total += len(out)
            window.extend(out)
            if len(window) > 32768:
                del window[: len(window) - 32768]
        if wrapper_offset is None and inf.mode.name not in ("HEAD", "FLAGS"):
            # headers fully consumed once we reach block territory
            wrapper_offset = 0  # informational only
        if rc == ReturnCode.StreamEnd:
            break
        if rc not in (ReturnCode.Ok,):
            raise ValueError(inf.msg or f"index build failed: {rc}")
        # at a block boundary (mode TYPE) we can snapshot
        if inf.mode.name == "TYPE" and (
            last_point_out is None or out_total - last_point_out >= span
        ):
            points.append(
                AccessPoint(
                    out_offset=out_total,
                    in_offset=pos,
                    bits=inf.bits,
                    hold=inf.hold & ((1 << inf.bits) - 1),
                    window=bytes(window),
                )
            )
            last_point_out = out_total
        if used == 0 and not out:
            raise ValueError("no progress during index build")
    if not points:
        raise ValueError("stream too small to index (no block boundaries)")
    return DeflateIndex(points=points, total_out=out_total, wrapper_offset=0)


def _build_index_native(data: bytes, span: int) -> DeflateIndex | None:
    from .. import native

    if not native.available():
        return None
    hdr, kind = _wrapper_span(data)
    body = data[hdr:]
    max_out = max(4 * len(body), 1 << 20)
    for _ in range(4):
        try:
            full, raw_points, in_used = native.zran_index(body, span, max_out)
            break
        except BufferError:
            max_out *= 4
        except ValueError:
            return None
    else:
        return None
    # the native pass handles one member; a multi-member gzip has another
    # magic after this member's 8-byte trailer — fall back for those
    if kind == "gzip" and len(body) - in_used > 8:
        return None
    # verify the container checksum so a corrupt stream is not indexed
    if kind == "zlib":
        if native.adler32(full) != int.from_bytes(body[in_used : in_used + 4], "big"):
            return None
    elif kind == "gzip":
        if native.crc32(full) != int.from_bytes(body[in_used : in_used + 4], "little"):
            return None
    points = []
    for out_off, bitpos in raw_points:
        byte = bitpos >> 3
        sub = bitpos & 7
        if sub:
            points.append(
                AccessPoint(
                    out_offset=int(out_off),
                    in_offset=hdr + byte + 1,
                    bits=8 - sub,
                    hold=body[byte] >> sub,
                    window=full[max(0, out_off - 32768) : out_off],
                )
            )
        else:
            points.append(
                AccessPoint(
                    out_offset=int(out_off),
                    in_offset=hdr + byte,
                    bits=0,
                    hold=0,
                    window=full[max(0, out_off - 32768) : out_off],
                )
            )
    if not points:
        return None
    return DeflateIndex(points=points, total_out=len(full), wrapper_offset=hdr)


def _extract_native(
    data: bytes, index: DeflateIndex, offset: int, length: int
) -> bytes | None:
    from .. import native

    if not native.available():
        return None
    point = index.closest(offset)
    if point.out_offset > offset:
        hdr, _kind = _wrapper_span(data)
        start_in, skip_bits, window, produced = hdr, 0, b"", 0
    else:
        if point.bits:
            start_in = point.in_offset - 1
            skip_bits = 8 - point.bits
        else:
            start_in = point.in_offset
            skip_bits = 0
        window, produced = point.window, point.out_offset
    want = (offset - produced) + length
    try:
        out = native.inflate_region(data[start_in:], skip_bits, window, want)
    except ValueError:
        return None
    return out[offset - produced : offset - produced + length]


def extract(data: bytes, index: DeflateIndex, offset: int, length: int) -> bytes:
    """Read `length` uncompressed bytes starting at `offset` using the index
    (zran's extract pass: raw inflater + prime + dictionary + skip),
    through the native region decoder when available."""
    if offset >= index.total_out:
        return b""
    fast = _extract_native(data, index, offset, length)
    if fast is not None:
        return fast
    point = index.closest(offset)
    if point.out_offset > offset:
        # before the first checkpoint: decode from the beginning
        inf = Inflator(InflateConfig(window_bits=47))
        start_in = 0
        produced = 0
    else:
        inf = Inflator(InflateConfig(window_bits=-15))
        inf.prime(point.bits, point.hold)
        if point.window:
            inf.set_dictionary(point.window)
        start_in = point.in_offset
        produced = point.out_offset
    skip = offset - produced
    out = bytearray()
    pos = start_in
    while len(out) < length:
        want = skip + (length - len(out))
        rc, used, chunk = inf.inflate(data[pos:], want, InflateFlush.NO_FLUSH)
        pos += used
        if chunk:
            if skip:
                drop = min(skip, len(chunk))
                chunk = chunk[drop:]
                skip -= drop
            out.extend(chunk)
        if rc == ReturnCode.StreamEnd:
            break
        if rc not in (ReturnCode.Ok,):
            raise ValueError(inf.msg or f"extract failed: {rc}")
        if used == 0 and not chunk:
            break
    return bytes(out[:length])
