"""ctypes binding for the C++ native runtime (native/zrs_native.cpp).

Plays the role the reference's native Rust plays for its host hot loops:
hash-chain deflate, table-driven inflate, slice-by-8 checksums, and a
std::thread pigz-style parallel compressor. The library is compiled on
first use (g++ is part of the toolchain) and cached next to the source;
everything degrades gracefully to the pure-Python engines when unavailable
(the reference's runtime-dispatch idea, cpu_features.rs:30-61, applied at
the build boundary instead).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as _np


_bufpool: list = []  # recycled output arrays, largest-capacity first


def _outbuf(cap: int):
    """Output buffer + its ctypes pointer, recycled across calls.

    Two deliberate choices: numpy over create_string_buffer (which memsets
    the whole capacity and copies it back via .raw), and a recycle pool —
    this VM faults fresh anonymous pages at ~220us/page (~18 MB/s!), so a
    first-touch of a new multi-MB buffer costs more than the codec work
    itself. Warm reuse runs at memory bandwidth."""
    cap = max(cap, 1)
    with _lock:
        for i, arr in enumerate(_bufpool):
            if arr.size >= cap:
                del _bufpool[i]
                return arr, arr.ctypes.data_as(ctypes.c_void_p)
    arr = _np.empty(max(cap, 1 << 20), _np.uint8)
    return arr, arr.ctypes.data_as(ctypes.c_void_p)


def _outbuf_release(arr) -> None:
    if arr.size < (1 << 20):
        return
    with _lock:
        if len(_bufpool) < 8:
            _bufpool.append(arr)
            _bufpool.sort(key=lambda a: -a.size)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "zrs_native.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libzrs_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                "-o", _SO, _SRC,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.zrs_adler32.restype = ctypes.c_uint32
        lib.zrs_adler32.argtypes = [ctypes.c_uint32, ctypes.c_char_p, ctypes.c_size_t]
        lib.zrs_crc32.restype = ctypes.c_uint32
        lib.zrs_crc32.argtypes = [ctypes.c_uint32, ctypes.c_char_p, ctypes.c_size_t]
        lib.zrs_deflate_chunk.restype = ctypes.c_long
        lib.zrs_deflate_chunk.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_size_t,
        ]
        lib.zrs_inflate_raw.restype = ctypes.c_long
        lib.zrs_inflate_raw.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.zrs_deflate_parallel.restype = ctypes.c_long
        lib.zrs_deflate_parallel.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_size_t,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_size_t,
        ]
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.zrs_inflate_parallel.restype = ctypes.c_long
        lib.zrs_inflate_parallel.argtypes = [
            ctypes.c_char_p, u64p, u64p, u64p, u64p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.zrs_zran_index.restype = ctypes.c_long
        lib.zrs_zran_index.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_uint64, u64p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.zrs_inflate_region.restype = ctypes.c_long
        lib.zrs_inflate_region.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
        ]
        lib.zrs_inflate_speculative.restype = ctypes.c_long
        lib.zrs_inflate_speculative.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_int, ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.zrs_istream_new.restype = ctypes.c_void_p
        lib.zrs_istream_new.argtypes = []
        lib.zrs_istream_free.restype = None
        lib.zrs_istream_free.argtypes = [ctypes.c_void_p]
        lib.zrs_istream_copy.restype = ctypes.c_void_p
        lib.zrs_istream_copy.argtypes = [ctypes.c_void_p]
        lib.zrs_istream_set_dict.restype = None
        lib.zrs_istream_set_dict.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ]
        lib.zrs_istream_pump.restype = ctypes.c_long
        lib.zrs_istream_pump.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_int),
        ]
        lib.zrs_istream_take_tail.restype = ctypes.c_long
        lib.zrs_istream_take_tail.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
        ]
        lib.zrs_istream_total_out.restype = ctypes.c_uint64
        lib.zrs_istream_total_out.argtypes = [ctypes.c_void_p]
        lib.zrs_istream_mode.restype = ctypes.c_int
        lib.zrs_istream_mode.argtypes = [ctypes.c_void_p]
        lib.zrs_istream_at_boundary.restype = ctypes.c_int
        lib.zrs_istream_at_boundary.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# QUICK fast mode (pass as `level`): static trees only, a single hash probe
# per position, tokens emitted inside the scan loop — the zlib-ng
# deflate_quick architecture (reference behavior class: quick.rs:12-158).
# ~2x the speed of zlib level 1 at a worse ratio; output is valid DEFLATE
# but NOT byte-identical to zlib (levels 1-9 remain the bit-exact engine).
QUICK = 10

# MEDIUM mode (pass as `level`): zlib-ng's deflate_medium algorithm class
# (medium.rs:12-331 decisions) on a 4-byte-hash chain — 2-3x the bit-exact
# scan speed at ~0-2% ratio cost vs the same zlib level. MEDIUM_BASE + n
# maps to the medium variant of zlib level 4 + n (n in 0..2). Output is
# valid DEFLATE, byte-identical to the host mirror models/medium.py, and
# NOT byte-identical to zlib (levels 1-9 remain the bit-exact engine).
MEDIUM_BASE = 11
MEDIUM4, MEDIUM5, MEDIUM6 = 11, 12, 13


def adler32(data: bytes, start: int = 1) -> int:
    return _load().zrs_adler32(start & 0xFFFFFFFF, bytes(data), len(data))


def crc32(data: bytes, start: int = 0) -> int:
    return _load().zrs_crc32(start & 0xFFFFFFFF, bytes(data), len(data))


def deflate_chunk(
    data: bytes, level: int = 6, final: bool = True, dictionary: bytes | None = None
) -> bytes:
    """Raw-deflate one chunk: complete blocks, byte-aligned end (sync seam if
    not final), BFINAL set when final. level accepts 0-9 (bit-exact zlib
    semantics) or QUICK (the fast mode)."""
    lib = _load()
    # QUICK has no stored fallback: worst case is 9-bit static literals
    # (the reference's deflateBound quick overhead, deflate.rs:3149-3157)
    slack = len(data) // 8 if level == QUICK else len(data) // 250
    cap = len(data) + slack + 4096
    arr, out = _outbuf(cap)
    d = bytes(dictionary) if dictionary else None
    rc = lib.zrs_deflate_chunk(
        d, len(d) if d else 0, bytes(data), len(data), level, 1 if final else 0,
        out, cap,
    )
    if rc < 0:
        raise RuntimeError("native deflate buffer overflow")
    res = arr[:rc].tobytes()
    _outbuf_release(arr)
    return res


def inflate_raw(data: bytes, max_out: int) -> tuple[bytes, int]:
    """Decode one raw-deflate stream fully. Returns (output, input_consumed).

    Raises ValueError on corrupt data, BufferError if max_out is too small.
    """
    lib = _load()
    arr, out = _outbuf(max_out)
    used = ctypes.c_size_t(0)
    rc = lib.zrs_inflate_raw(bytes(data), len(data), out, max_out, ctypes.byref(used))
    if rc == -1:
        raise ValueError("invalid deflate data")
    if rc == -2:
        raise BufferError("output buffer too small")
    if rc == -3:
        raise ValueError("truncated deflate data")
    res = arr[:rc].tobytes()
    _outbuf_release(arr)
    return res, used.value


def inflate_speculative(data: bytes, max_out: int, nthreads: int = 0) -> tuple[bytes, int]:
    """Parallel decode of ONE raw deflate stream with NO index: rapidgzip-style
    speculation (scan each split for a validated block header, decode bytes
    with a sparse side-list of unknown-window references, stitch via parallel
    memcpy + mark fix-up; exact sequential re-decode covers any seam the
    speculation missed). Returns (output, input_bytes_consumed).

    Reference capability ladder: inflateSync/sync points (inflate.rs:2465)
    exposed the seams; this makes monolithic foreign streams parallel without
    them (SURVEY §7 step 7, PAPERS.md rapidgzip).
    """
    lib = _load()
    arr, out = _outbuf(max_out)
    used = ctypes.c_size_t(0)
    rc = lib.zrs_inflate_speculative(
        bytes(data), len(data), out, max_out, nthreads, ctypes.byref(used)
    )
    if rc == -1:
        raise ValueError("invalid deflate data")
    if rc == -2:
        raise BufferError("output buffer too small")
    if rc == -3:
        raise ValueError("truncated deflate data")
    res = arr[:rc].tobytes()
    _outbuf_release(arr)
    return res, used.value


def inflate_parallel(data: bytes, index, nthreads: int = 0) -> bytes:
    """Threaded decode of independently decodable indexed chunks
    ([(body_offset, body_len, out_len), ...] as produced by
    compress_parallel(..., return_index=True))."""
    lib = _load()
    n = len(index)
    offs = (ctypes.c_uint64 * n)(*[o for o, _, _ in index])
    lens = (ctypes.c_uint64 * n)(*[l for _, l, _ in index])
    sizes = [s for _, _, s in index]
    out_offs_list = [0] * n
    acc = 0
    for k in range(n):
        out_offs_list[k] = acc
        acc += sizes[k]
    out_offs = (ctypes.c_uint64 * n)(*out_offs_list)
    out_sizes = (ctypes.c_uint64 * n)(*sizes)
    arr, out = _outbuf(acc)
    rc = lib.zrs_inflate_parallel(
        bytes(data), offs, lens, out_offs, out_sizes, n, out, nthreads
    )
    if rc < 0:
        raise ValueError(f"chunk {-rc - 1} failed to decode")
    if rc != acc:
        raise ValueError(f"decoded {rc} bytes, expected {acc}")
    res = arr[:acc].tobytes()
    _outbuf_release(arr)
    return res


def zran_index(data: bytes, span: int, max_out: int) -> tuple[bytes, list]:
    """Single-pass decode of a raw deflate stream recording zran access
    points every ~`span` output bytes. Returns (full_output, points,
    input_bytes_consumed) with points = [(out_offset, bit_position), ...]."""
    lib = _load()
    arr, out = _outbuf(max_out)
    cap_pts = max(4, max_out // max(span, 1) + 4)
    pts = (ctypes.c_uint64 * (2 * cap_pts))()
    npts = ctypes.c_size_t(0)
    in_used = ctypes.c_size_t(0)
    rc = lib.zrs_zran_index(
        bytes(data), len(data), out, max_out, span, pts, cap_pts,
        ctypes.byref(npts), ctypes.byref(in_used),
    )
    if rc == -1:
        raise ValueError("invalid deflate data")
    if rc == -2:
        raise BufferError("output buffer too small")
    if rc == -3:
        raise ValueError("truncated deflate data")
    points = [(pts[2 * i], pts[2 * i + 1]) for i in range(npts.value)]
    res = arr[:rc].tobytes()
    _outbuf_release(arr)
    return res, points, in_used.value


def inflate_region(
    data: bytes, skip_bits: int, window: bytes, want: int
) -> bytes:
    """Resume a raw deflate stream at a zran access point and decode `want`
    bytes. `data` starts at the byte containing the block header."""
    lib = _load()
    arr, out = _outbuf(len(window) + max(want, 1))
    rc = lib.zrs_inflate_region(
        bytes(data), len(data), skip_bits, bytes(window), len(window), out, want
    )
    if rc < 0:
        raise ValueError(f"region decode failed ({rc})")
    res = arr[len(window) : len(window) + rc].tobytes()
    _outbuf_release(arr)
    return res


def deflate_parallel(
    data: bytes,
    level: int = 6,
    chunk_size: int = 128 * 1024,
    prime_dict: bool = True,
    nthreads: int = 0,
) -> bytes:
    """Multithreaded pigz-style chunked raw deflate (one valid stream)."""
    lib = _load()
    slack = len(data) // 8 if level == QUICK else len(data) // 250
    cap = len(data) + slack + 4096 + 16 * (len(data) // max(chunk_size, 1) + 2)
    arr, out = _outbuf(cap)
    rc = lib.zrs_deflate_parallel(
        bytes(data), len(data), level, chunk_size, 1 if prime_dict else 0,
        nthreads, out, cap,
    )
    if rc < 0:
        raise RuntimeError("native parallel deflate buffer overflow")
    res = arr[:rc].tobytes()
    _outbuf_release(arr)
    return res


class RawInflateStream:
    """Resumable native raw-deflate decoder handle (zrs_istream_*): input at
    any byte boundary, incremental output, deep-copyable mid-stream — the
    fast engine under the streaming APIs (reference contract: the z_stream
    pump, inflate.rs:2382; resumability model inflate/bitreader.rs
    update_slice). Container framing (zlib/gzip) lives in the Python layer.
    """

    __slots__ = ("_h", "_lib", "done", "error")

    def __init__(self, dictionary: bytes | None = None, _handle=None):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native engine unavailable")
        self._h = _handle if _handle is not None else self._lib.zrs_istream_new()
        self.done = False
        self.error = False
        if dictionary:
            self._lib.zrs_istream_set_dict(
                self._h, bytes(dictionary), len(dictionary)
            )

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.zrs_istream_free(h)
            self._h = None

    def copy(self) -> "RawInflateStream":
        clone = RawInflateStream(_handle=self._lib.zrs_istream_copy(self._h))
        clone.done = self.done
        clone.error = self.error
        return clone

    def pump(self, data: bytes, max_out: int | None) -> tuple[bytes, bool]:
        """Feed `data` (always fully absorbed) and return up to `max_out`
        output bytes; (output, more_pending). On corrupt deflate data the
        bytes decoded BEFORE the error are still returned and `self.error`
        is set — zlib serves the valid prefix alongside Z_DATA_ERROR, and
        raising here used to throw that prefix away (r4 advisor, low).
        After `done`, use take_tail() for trailer bytes."""
        cap = max_out if max_out is not None else max(len(data) * 4, 1 << 16)
        out_parts = []
        flags = ctypes.c_int(0)
        more = True
        budget = cap
        feed = bytes(data)
        while more and (budget > 0 or max_out is None):
            serve_cap = min(budget, 1 << 22) if max_out is not None else 1 << 22
            arr, outp = _outbuf(serve_cap)
            n = self._lib.zrs_istream_pump(
                self._h, feed, len(feed), outp, serve_cap, ctypes.byref(flags)
            )
            feed = b""
            if n:
                out_parts.append(arr[:n].tobytes())
            _outbuf_release(arr)
            if flags.value & 2:
                self.error = True
                break
            self.done = bool(flags.value & 1)
            more = bool(flags.value & 4)
            if max_out is not None:
                budget -= n
                break  # bounded call: one serve; pending stays in the handle
            if n == 0 and not more:
                break
        return b"".join(out_parts), bool(flags.value & 4)

    def take_tail(self, cap: int = 1 << 20) -> bytes:
        arr, outp = _outbuf(cap)
        n = self._lib.zrs_istream_take_tail(self._h, outp, cap)
        res = arr[:n].tobytes()
        _outbuf_release(arr)
        return res

    def take_tail_all(self) -> bytes:
        """Drain the entire post-stream input tail (take_tail is capped at
        1 MiB per call; a larger concatenated tail needs the loop —
        r4 advisor, high)."""
        parts = []
        while True:
            t = self.take_tail()
            if not t:
                break
            parts.append(t)
        return b"".join(parts)

    @property
    def total_out(self) -> int:
        return int(self._lib.zrs_istream_total_out(self._h))

    def at_boundary(self) -> bool:
        return bool(self._lib.zrs_istream_at_boundary(self._h))


def _bind_dstream(lib):
    if getattr(lib, "_dstream_bound", False):
        return
    lib.zrs_dstream_new.restype = ctypes.c_void_p
    lib.zrs_dstream_new.argtypes = [ctypes.c_int]
    lib.zrs_dstream_free.restype = None
    lib.zrs_dstream_free.argtypes = [ctypes.c_void_p]
    lib.zrs_dstream_copy.restype = ctypes.c_void_p
    lib.zrs_dstream_copy.argtypes = [ctypes.c_void_p]
    lib.zrs_dstream_pump.restype = ctypes.c_long
    lib.zrs_dstream_pump.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
    ]
    lib.zrs_dstream_read.restype = ctypes.c_long
    lib.zrs_dstream_read.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
    ]
    lib.zrs_dstream_window.restype = ctypes.c_long
    lib.zrs_dstream_window.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
    ]
    lib._dstream_bound = True


class RawDeflateStream:
    """Resumable native raw-deflate compressor handle (zrs_dstream_*):
    byte-identical to zlib for every pump/flush script at levels 1-9 (the
    ChunkDeflater scan loops are pause/resume-capable; zlib's need_more
    lookahead rule, fill_window retro-insertion, and FULL_FLUSH window
    restart are reproduced — reference: deflate.rs:2470 deflate(),
    :1811-1827 fill_window, slow.rs:149 insert)."""

    __slots__ = ("_h", "_lib", "finished")

    def __init__(self, level: int = 6, _handle=None):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native engine unavailable")
        _bind_dstream(self._lib)
        self._h = _handle if _handle is not None else self._lib.zrs_dstream_new(level)
        self.finished = False

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.zrs_dstream_free(h)
            self._h = None

    def copy(self) -> "RawDeflateStream":
        clone = RawDeflateStream(_handle=self._lib.zrs_dstream_copy(self._h))
        clone.finished = self.finished
        return clone

    def window(self) -> bytes:
        """Last <=32 KiB of input seen (the live match window); meaningful
        at a flush seam. Used to migrate onto the exact engine."""
        arr, outp = _outbuf(1 << 15)
        n = self._lib.zrs_dstream_window(self._h, outp, 1 << 15)
        res = arr[:n].tobytes()
        _outbuf_release(arr)
        return res

    def pump(self, data: bytes, flush: int) -> bytes:
        """Feed data under flush (0 none / 2 sync / 3 full / 4 finish);
        returns all output that became available."""
        avail = self._lib.zrs_dstream_pump(self._h, bytes(data), len(data), flush)
        if avail < 0:
            raise RuntimeError("native deflate stream misuse")
        if flush == 4:
            self.finished = True
        if not avail:
            return b""
        arr, outp = _outbuf(avail)
        n = self._lib.zrs_dstream_read(self._h, outp, avail)
        res = arr[:n].tobytes()
        _outbuf_release(arr)
        return res
