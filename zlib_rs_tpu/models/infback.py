"""inflateBack: callback-driven single-pass raw-deflate decoder.

Counterpart of the reference's inflate/infback.rs:27-969 (inflateBackInit /
inflateBack / inflateBackEnd): raw deflate only, input pulled through an
`in_func` callback, output pushed through an `out_func` callback in
window-sized (or smaller) chunks, single pass, no checksum.
"""

from __future__ import annotations

from typing import Callable

from ..config import InflateConfig, InflateFlush, ReturnCode
from .inflate import Inflator

InFunc = Callable[[], bytes]  # returns b"" when input is exhausted
OutFunc = Callable[[bytes], bool]  # returns False to abort


class InflateBack:
    """Reusable inflateBack state (reference: infback.rs:27 back_init)."""

    def __init__(self, window_bits: int = 15):
        if not (8 <= window_bits <= 15):
            raise ValueError("window_bits must be in 8..=15")
        self.window_bits = window_bits

    def run(self, in_func: InFunc, out_func: OutFunc) -> ReturnCode:
        """Decode one raw deflate stream (reference: infback.rs:95 back).

        Pulls input with `in_func` until the stream's final block completes;
        pushes decoded bytes with `out_func` in chunks of at most the window
        size. Returns StreamEnd on success, DataError/BufError like zlib.
        """
        inf = Inflator(InflateConfig(window_bits=-self.window_bits))
        wsize = 1 << self.window_bits
        leftover = b""
        while True:
            if not leftover:
                leftover = in_func() or b""
            rc, consumed, out = inf.inflate(leftover, wsize, InflateFlush.NO_FLUSH)
            leftover = leftover[consumed:]
            if out and not out_func(out):
                return ReturnCode.BufError
            if rc == ReturnCode.StreamEnd:
                return ReturnCode.StreamEnd
            if rc != ReturnCode.Ok:
                return rc
            if not consumed and not out:
                nxt = in_func() or b""
                if not nxt:
                    return ReturnCode.BufError  # input ran dry mid-stream
                leftover += nxt


def inflate_back(
    in_func: InFunc, out_func: OutFunc, window_bits: int = 15
) -> ReturnCode:
    """One-shot inflateBack."""
    return InflateBack(window_bits).run(in_func, out_func)
