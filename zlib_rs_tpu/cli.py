"""pigz-style command line interface.

Counterpart of the reference's example binaries (zpipe.c, examples/compress.rs)
grown into a real tool: gzip-compatible compress/decompress with level,
format, and keep flags, stdin/stdout streaming, and a chunk-parallel TPU
engine for large inputs (--engine tpu), mirroring how pigz parallelizes over
the seam primitives the library exposes.

Usage:
  python -m zlib_rs_tpu.cli [-c] [-d] [-k] [-f] [-1..-9] [--format gzip|zlib|raw]
                            [--engine auto|host|tpu] [--chunk BYTES] [FILE ...]
"""

from __future__ import annotations

import argparse
import os
import sys

from .config import DeflateConfig, InflateConfig

TPU_THRESHOLD = 4 * 1024 * 1024  # auto engine: use device path above this


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="zlib_rs_tpu", description="TPU-native gzip/zlib (de)compressor"
    )
    p.add_argument("files", nargs="*", help="files to process ('-' or none = stdin)")
    p.add_argument("-c", "--stdout", action="store_true", help="write to stdout")
    p.add_argument("-d", "--decompress", action="store_true")
    p.add_argument("-k", "--keep", action="store_true", help="keep input files")
    p.add_argument("-f", "--force", action="store_true", help="overwrite outputs")
    for lvl in range(1, 10):
        p.add_argument(
            f"-{lvl}", dest="level", action="store_const", const=lvl,
            help=argparse.SUPPRESS,
        )
    p.add_argument("--level", type=int, default=None, help="compression level 0-9")
    p.add_argument(
        "--quick", action="store_true",
        help="native QUICK fast mode: static trees, single hash probe "
             "(~2x zlib -1 speed at a worse ratio; valid DEFLATE output)",
    )
    p.add_argument(
        "--medium", action="store_true",
        help="native MEDIUM mode (zlib-ng deflate_medium class): 2-3x the "
             "bit-exact scan speed at ~0-2%% ratio cost; honors --level 4-6",
    )
    p.add_argument(
        "--format", choices=("gzip", "zlib", "raw"), default="gzip",
        help="container format (default gzip)",
    )
    p.add_argument(
        "--engine", choices=("auto", "host", "native", "tpu"), default="auto",
        help="pure-Python host engine, C++ native engine, or TPU device engine",
    )
    p.add_argument(
        "-p", "--threads", type=int, default=0,
        help="native engine worker threads (0 = all cores)",
    )
    p.add_argument(
        "--chunk", type=int, default=None,
        help="chunk size (default: the active engine's own default — the "
             "TPU kernel engine runs 32 KiB + priming dict, others 128 KiB)",
    )
    p.add_argument("--suffix", default=".gz", help="output suffix (default .gz)")
    return p


def _wbits_for(fmt: str, decompress: bool) -> int:
    if fmt == "raw":
        return -15
    if fmt == "zlib":
        return 15
    return 47 if decompress else 31  # gzip; +32 auto-detect on decode


def _wrap_raw(raw: bytes, data: bytes, fmt: str, level: int) -> bytes:
    """Add the zlib/gzip container around a raw deflate payload."""
    from .ops import checksum

    if fmt == "raw":
        return raw
    if fmt == "zlib":
        flevel = 0 if level < 2 else 1 if level < 6 else 2 if level == 6 else 3
        cmf = 0x78
        flg = flevel << 6
        flg |= (31 - (cmf * 256 + flg) % 31) % 31
        return bytes([cmf, flg]) + raw + checksum.adler32(data).to_bytes(4, "big")
    # XFL rule matches models/deflate._emit_header: 2=max (9), 4=fast (<2)
    xfl = 2 if level == 9 else (4 if level < 2 else 0)
    hdr = bytes([0x1F, 0x8B, 8, 0, 0, 0, 0, 0, xfl, 3])
    tail = checksum.crc32(data).to_bytes(4, "little") + (
        len(data) & 0xFFFFFFFF
    ).to_bytes(4, "little")
    return hdr + raw + tail


def _compress(data: bytes, args) -> bytes:
    level = args.level if args.level is not None else 6
    if getattr(args, "quick", False):
        from . import native as _n

        if not _n.available():
            raise SystemExit("--quick needs the native engine")
        raw = _n.deflate_parallel(
            data, level=_n.QUICK, chunk_size=args.chunk or 128 * 1024,
            nthreads=args.threads,
        )
        return _wrap_raw(raw, data, args.format, 1)
    if getattr(args, "medium", False):
        from . import native as _n

        if not _n.available():
            raise SystemExit("--medium needs the native engine")
        mlvl = _n.MEDIUM_BASE + min(max(level, 4), 6) - 4
        raw = _n.deflate_parallel(
            data, level=mlvl, chunk_size=args.chunk or 128 * 1024,
            nthreads=args.threads,
        )
        return _wrap_raw(raw, data, args.format, level)
    wbits = _wbits_for(args.format, False)
    engine = args.engine
    if engine == "auto":
        from . import native

        if native.available():
            engine = "native"
        elif len(data) >= TPU_THRESHOLD:
            engine = "tpu"
        else:
            engine = "host"
    if engine == "tpu":
        from .parallel.pipeline import compress_parallel

        return compress_parallel(
            data, level=level, window_bits=wbits, chunk_size=args.chunk
        )
    if engine == "native":
        from . import native

        raw = native.deflate_parallel(
            data, level=level, chunk_size=args.chunk or 128 * 1024,
            nthreads=args.threads,
        )
        return _wrap_raw(raw, data, args.format, level)
    from .models import oneshot

    return oneshot.compress(data, level=level, window_bits=wbits)


def _decompress(data: bytes, args) -> bytes:
    if args.engine in ("auto", "native"):
        from . import native

        if native.available():
            try:
                return _native_decompress(data, args.format)
            except (ValueError, BufferError):
                if args.engine == "native":
                    raise
    from .models import oneshot

    return oneshot.decompress(data, window_bits=_wbits_for(args.format, True))


def _native_inflate_grow(payload: bytes) -> tuple[bytes, int]:
    """Raw inflate with growing output capacity; multi-MB payloads take the
    speculative parallel engine (exact — seam misses re-decode; pigz -d
    behavior but without needing seams)."""
    from . import native

    cap = max(1 << 16, len(payload) * 4)
    decode = (
        native.inflate_speculative if len(payload) >= (2 << 20) else native.inflate_raw
    )
    while True:
        try:
            return decode(payload, cap)
        except BufferError:
            cap *= 4


def _native_decompress(data: bytes, fmt: str) -> bytes:
    """Container parse on host, raw inflate in the native engine,
    multi-member aware."""
    from .ops import checksum

    if fmt == "raw":
        dec, _ = _native_inflate_grow(data)
        return dec
    out = bytearray()
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] == b"\x1f\x8b":
            hdr_end = _gzip_header_end(data, pos)
            dec, used = _native_inflate_grow(data[hdr_end:])
            if checksum.crc32(dec) != int.from_bytes(
                data[hdr_end + used : hdr_end + used + 4], "little"
            ):
                raise ValueError("incorrect data check")
            out.extend(dec)
            pos = hdr_end + used + 8
            if pos >= len(data) or data[pos : pos + 2] != b"\x1f\x8b":
                break  # trailing garbage is ignored, gzio-style
        elif (
            pos == 0
            and len(data) >= 2
            and (data[0] & 0x0F) == 8
            and (data[0] >> 4) <= 7
            and ((data[0] << 8) | data[1]) % 31 == 0
        ):
            if data[1] & 0x20:
                raise ValueError("need dictionary")  # host engine handles this
            dec, used = _native_inflate_grow(data[2:])
            if checksum.adler32(dec) != int.from_bytes(data[2 + used : 6 + used], "big"):
                raise ValueError("incorrect data check")
            return bytes(dec)
        else:
            raise ValueError("not a gzip/zlib stream")
    return bytes(out)


def _gzip_header_end(data: bytes, pos: int) -> int:
    flg = data[pos + 3]
    i = pos + 10
    if flg & 0x04:
        xlen = int.from_bytes(data[i : i + 2], "little")
        i += 2 + xlen
    if flg & 0x08:
        i = data.index(0, i) + 1
    if flg & 0x10:
        i = data.index(0, i) + 1
    if flg & 0x02:
        i += 2
    return i


def _out_name(path: str, args) -> str:
    if args.decompress:
        if path.endswith(args.suffix):
            return path[: -len(args.suffix)]
        return path + ".out"
    return path + args.suffix


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    files = args.files or ["-"]
    status = 0
    for path in files:
        try:
            if path == "-":
                data = sys.stdin.buffer.read()
            else:
                with open(path, "rb") as f:
                    data = f.read()
            out = _decompress(data, args) if args.decompress else _compress(data, args)
            if path == "-" or args.stdout:
                sys.stdout.buffer.write(out)
                sys.stdout.buffer.flush()
            else:
                dest = _out_name(path, args)
                if os.path.exists(dest) and not args.force:
                    print(f"{dest}: already exists (use -f)", file=sys.stderr)
                    status = 1
                    continue
                with open(dest, "wb") as f:
                    f.write(out)
                if not args.keep:
                    os.unlink(path)
        except Exception as e:  # deliberate CLI-boundary catch
            print(f"zlib_rs_tpu: {path}: {e}", file=sys.stderr)
            status = 1
    return status


if __name__ == "__main__":
    sys.exit(main())
