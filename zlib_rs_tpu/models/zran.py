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


def build_index(data: bytes, span: int = 1 << 20) -> DeflateIndex:
    """One sequential pass over a zlib/gzip/raw stream recording access
    points roughly every `span` uncompressed bytes (zran's build pass,
    driven by our engine's Z_BLOCK stop points)."""
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


def extract(data: bytes, index: DeflateIndex, offset: int, length: int) -> bytes:
    """Read `length` uncompressed bytes starting at `offset` using the index
    (zran's extract pass: raw inflater + prime + dictionary + skip)."""
    if offset >= index.total_out:
        return b""
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
