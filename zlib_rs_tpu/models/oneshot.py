"""One-shot convenience API (reference: compress/compress2/uncompress,
libz-rs-sys/src/lib.rs:1346-1422,480-521 → deflate.rs:2826, inflate.rs:186).

Accepts either a full DeflateConfig/InflateConfig or the common keyword
shortcuts (level, wbits/window_bits, strategy) zlib users expect.
"""

from __future__ import annotations

from ..config import (
    DeflateConfig,
    InflateConfig,
    ReturnCode,
    Strategy,
    Z_DEFAULT_COMPRESSION,
)
from . import deflate as _deflate
from . import inflate as _inflate


def _deflate_config(config, level, window_bits, strategy) -> DeflateConfig:
    if config is not None:
        return config
    return DeflateConfig(
        level=level if level is not None else Z_DEFAULT_COMPRESSION,
        window_bits=window_bits,
        strategy=strategy,
    )


def _try_native_compress(data: bytes, level: int, window_bits: int):
    """C++ fast path for the common one-shot shapes (zlib/gzip/raw at
    default strategy). Returns None when the host engine must handle it."""
    if window_bits not in (15, 31, -15):
        return None
    try:
        from .. import native

        if not native.available():
            return None
        raw = native.deflate_chunk(data, level=level, final=True)
    except (RuntimeError, OSError, ValueError):
        return None  # engine unavailable/rejected: host path handles it
    if window_bits == -15:
        return raw
    if window_bits == 15:
        flevel = 0 if level < 2 else 1 if level < 6 else 2 if level == 6 else 3
        cmf = 0x78
        flg = flevel << 6
        flg |= (31 - (cmf * 256 + flg) % 31) % 31
        return bytes([cmf, flg]) + raw + native.adler32(data).to_bytes(4, "big")
    # XFL rule must match the host engine's _emit_header (deflate.py):
    # 2 = max compression (level 9), 4 = fastest (level < 2)
    xfl = 2 if level == 9 else (4 if level < 2 else 0)
    hdr = bytes([0x1F, 0x8B, 8, 0, 0, 0, 0, 0, xfl, 3])
    tail = native.crc32(data).to_bytes(4, "little") + (
        len(data) & 0xFFFFFFFF
    ).to_bytes(4, "little")
    return hdr + raw + tail


def compress(
    data: bytes,
    level: int | None = None,
    *,
    window_bits: int = 15,
    strategy: Strategy = Strategy.Default,
    config: DeflateConfig | None = None,
) -> bytes:
    """One-shot compress. Default output is a zlib stream (window_bits=15);
    use window_bits=31 for gzip, negative for raw deflate.

    Common shapes route through the C++ native engine (the reference's
    native hot path); anything else uses the host reference engine.
    """
    if config is None and strategy == Strategy.Default:
        lvl = 6 if level is None or level == Z_DEFAULT_COMPRESSION else level
        if 0 <= lvl <= 9:
            fast = _try_native_compress(bytes(data), lvl, window_bits)
            if fast is not None:
                return fast
    return _deflate.compress(data, _deflate_config(config, level, window_bits, strategy))


def compress_bound(
    source_len: int,
    level: int | None = None,
    *,
    window_bits: int = 15,
    strategy: Strategy = Strategy.Default,
    config: DeflateConfig | None = None,
) -> int:
    """Worst-case compressed size (reference: deflateBound, deflate.rs:3174)."""
    return _deflate.compress_bound(
        source_len, _deflate_config(config, level, window_bits, strategy)
    )


def _try_native_decompress(data: bytes, window_bits: int):
    """C++ fast path for well-formed zlib/gzip/raw inputs; None on anything
    unusual (FDICT, truncation, errors) so the host engine supplies the
    exact error taxonomy."""
    try:
        from .. import native

        if not native.available():
            return None

        def grow(payload):
            cap = max(1 << 16, len(payload) * 4)
            # multi-MB payloads decode with the rapidgzip-style speculative
            # parallel engine (exact: any seam speculation misses re-decode
            # sequentially; the container checksum above remains the oracle);
            # small ones take the plain sequential hot loop
            decode = (
                native.inflate_speculative
                if len(payload) >= (2 << 20)
                else native.inflate_raw
            )
            while True:
                try:
                    return decode(payload, cap)
                except BufferError:
                    cap *= 4

        if window_bits == -15:
            out, _ = grow(data)
            return out
        if data[:2] == b"\x1f\x8b" and window_bits in (31, 47):
            flg = data[3]
            i = 10
            if flg & 0x04:
                i += 2 + int.from_bytes(data[i : i + 2], "little")
            if flg & 0x08:
                i = data.index(0, i) + 1
            if flg & 0x10:
                i = data.index(0, i) + 1
            if flg & 0x02:
                i += 2
            out, used = grow(data[i:])
            if len(data) < i + used + 8:  # truncated trailer
                return None
            if native.crc32(out) != int.from_bytes(data[i + used : i + used + 4], "little"):
                return None
            if int.from_bytes(data[i + used + 4 : i + used + 8], "little") != (
                len(out) & 0xFFFFFFFF
            ):
                return None
            return out
        if (
            window_bits in (15, 47)
            and len(data) >= 2
            and (data[0] & 0x0F) == 8
            and (data[0] >> 4) <= 7
            and ((data[0] << 8) | data[1]) % 31 == 0
            and not (data[1] & 0x20)  # FDICT needs the host NeedDict path
        ):
            out, used = grow(data[2:])
            if native.adler32(out) != int.from_bytes(data[2 + used : 6 + used], "big"):
                return None
            return out
        return None
    except (RuntimeError, OSError, ValueError, BufferError):
        return None  # native decode rejected the stream: host path decides


def decompress(
    data: bytes,
    *,
    window_bits: int = 47,  # auto-detect zlib/gzip by default
    config: InflateConfig | None = None,
) -> bytes:
    """One-shot decompress with zlib/gzip auto-detection by default.

    Well-formed common inputs route through the C++ native engine; anything
    unusual (dictionaries, damage, odd window sizes) falls back to the host
    reference engine, which owns the exact error behavior.
    """
    if config is None:
        fast = _try_native_decompress(bytes(data), window_bits)
        if fast is not None:
            return fast
    cfg = config if config is not None else InflateConfig(window_bits=window_bits)
    return _inflate.decompress(data, cfg)


def uncompress(data: bytes, *, window_bits: int = 15) -> tuple[ReturnCode, bytes]:
    """zlib-style uncompress: returns (ReturnCode, output) instead of raising
    (reference: lib.rs:480 uncompress)."""
    cfg = InflateConfig(window_bits=window_bits)
    inf = _inflate.Inflator(cfg)
    from ..config import InflateFlush

    ret, _consumed, out = inf.inflate(data, None, InflateFlush.FINISH)
    if ret == ReturnCode.StreamEnd:
        return ReturnCode.Ok, out
    if ret == ReturnCode.Ok:
        return ReturnCode.DataError, out  # truncated input
    return ret, out
