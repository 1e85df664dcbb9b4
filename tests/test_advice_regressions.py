"""Regression tests for the round-1 advisor findings (ADVICE.md).

Each test pins the exact failure scenario the advisor reported so the bug
class stays fixed.
"""

import gzip
import os
import random
import zlib

import pytest

from zlib_rs_tpu.config import DeflateConfig, ReturnCode
from zlib_rs_tpu.models.deflate import Deflator, compress
from zlib_rs_tpu.models.gzfile import GzError, GzFile


class TestLazyDeferralFlush:
    """ADVICE high: _deflate_lazy flushed a block while a lazy deferral was
    pending, desynchronizing symbol coverage from [block_start, strstart)."""

    def test_mem_level_1_lazy_streams_decode(self):
        random.seed(1)
        for _ in range(10):
            data = bytes(random.choice(b"abcdef") for _ in range(5000)) * 3
            out = compress(data, DeflateConfig(level=6, mem_level=1))
            assert zlib.decompress(out) == data

    @pytest.mark.parametrize("mem_level", [1, 2, 8])
    @pytest.mark.parametrize("level", [4, 6, 9])
    def test_small_sym_buffers_all_levels(self, mem_level, level):
        random.seed(mem_level * 16 + level)
        data = (
            os.urandom(100)
            + b"hello world " * 500
            + bytes(random.choice(b"abcd") for _ in range(4000))
        )
        out = compress(data, DeflateConfig(level=level, mem_level=mem_level))
        assert zlib.decompress(out) == data

    def test_params_change_with_pending_deferral(self):
        d = Deflator(DeflateConfig(level=9, mem_level=1))
        random.seed(7)
        data = bytes(random.choice(b"ab") for _ in range(3000))
        d.deflate(data)
        from zlib_rs_tpu.config import Strategy

        assert d.params(1, Strategy.Default) == ReturnCode.Ok
        from zlib_rs_tpu.config import DeflateFlush

        d.deflate(data, DeflateFlush.FINISH)
        assert zlib.decompress(d.take_output()) == data + data


class TestDeepLZChains:
    """ADVICE medium: _resolve_lz's pointer-doubling round count was fixed at
    18, silently corrupting chunks with LZ chains deeper than 2^18."""

    def test_round_count_scales_with_out_size(self):
        import zlib_rs_tpu.parallel.inflate as pi
        import inspect

        src = inspect.getsource(pi._resolve_lz)
        assert "bit_length" in src  # rounds derived from out_size, not fixed


class TestGzTruncatedMember:
    """ADVICE low: truncated gzip member must error, not report clean EOF."""

    def test_truncated_member_errors(self, tmp_path):
        full = gzip.compress(b"hello world" * 100)
        p = tmp_path / "t.gz"
        p.write_bytes(full[: len(full) // 2])
        f = GzFile(str(p), "r")
        with pytest.raises(GzError):
            f.read()
        rc, msg = f.error()
        assert rc == ReturnCode.BufError
        assert "end of file" in msg

    def test_clean_eof_still_clean(self, tmp_path):
        p = tmp_path / "ok.gz"
        p.write_bytes(gzip.compress(b"payload"))
        f = GzFile(str(p), "r")
        assert f.read() == b"payload"
        assert f.error()[0] == ReturnCode.Ok
        assert f.eof()


class TestXflParity:
    """ADVICE low: all engines must agree on the gzip XFL byte."""

    @pytest.mark.parametrize("level", [0, 1, 2, 6, 9])
    def test_native_and_host_gzip_headers_match(self, level):
        from zlib_rs_tpu.models import oneshot

        data = b"abc" * 100
        out = oneshot.compress(data, level, window_bits=31)
        host = compress(data, DeflateConfig(level=level, window_bits=31))
        # byte 8 is XFL; mtime (4:8) is zero in both paths
        assert out[8] == host[8], (out[:10].hex(), host[:10].hex())


class TestDeflateTuneValidation:
    def test_rejects_out_of_range(self):
        d = Deflator(DeflateConfig(level=6))
        assert d.tune(-1, 16, 16, 16) == ReturnCode.StreamError
        assert d.tune(4, 16, 16, 1 << 20) == ReturnCode.StreamError
        assert d.tune(4, 16, 16, 1024) == ReturnCode.Ok
