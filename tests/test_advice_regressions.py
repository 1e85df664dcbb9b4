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


# ---------------------------------------------------------------------------
# Round-4 advisor findings
# ---------------------------------------------------------------------------


class TestNativePruneRebase:
    """ADVICE r4 high: DefStream::prune() rebased chain positions by an
    arbitrary offset, but prevd/prevd4 slots are keyed pos & (WSIZE-1) —
    streaming output diverged from zlib past ~1 MiB. The prune offset must
    stay a multiple of WSIZE."""

    @pytest.mark.parametrize("level", [1, 6, 9])
    def test_streaming_byte_identity_past_1mb(self, level):
        from zlib_rs_tpu import native

        if not native.available():
            pytest.skip("native engine not built")
        random.seed(level)
        data = bytes(random.choice(b"abcdefgh \n") for _ in range(200000)) * 8
        data = data[:1_500_000]
        s = native.RawDeflateStream(level)
        out = bytearray()
        pos = 0
        while pos < len(data):
            chunk = data[pos : pos + 65536]
            pos += len(chunk)
            out += s.pump(chunk, 0)
        out += s.pump(b"", 4)
        c = zlib.compressobj(level, zlib.DEFLATED, -15)
        assert bytes(out) == c.compress(data) + c.flush()


class TestFastInflateConsumed:
    """ADVICE r4 high: FastInflateEngine reported consumed == len(data),
    absorbing bytes past the end of the stream (broken avail_in semantics
    for concatenated-stream consumers)."""

    def _engine(self, wbits):
        from zlib_rs_tpu import native
        from zlib_rs_tpu.config import InflateConfig
        from zlib_rs_tpu.models.faststream import FastInflateEngine

        if not native.available():
            pytest.skip("native engine not built")
        return FastInflateEngine(InflateConfig(window_bits=wbits))

    def test_zlib_wrap_leaves_tail_unconsumed(self):
        from zlib_rs_tpu.config import InflateFlush, ReturnCode

        data = b"hello world " * 40
        comp = zlib.compress(data)
        eng = self._engine(15)
        rc, consumed, out = eng.inflate(
            comp + b"X" * 200, None, InflateFlush.NO_FLUSH
        )
        assert rc == ReturnCode.StreamEnd
        assert out == data
        assert consumed == len(comp)

    def test_raw_wrap_leaves_tail_unconsumed(self):
        from zlib_rs_tpu.config import InflateFlush, ReturnCode

        data = b"hello world " * 40
        comp = zlib.compress(data)[2:-4]
        eng = self._engine(-15)
        rc, consumed, out = eng.inflate(
            comp + b"Y" * 123, None, InflateFlush.NO_FLUSH
        )
        assert rc == ReturnCode.StreamEnd
        assert out == data
        assert consumed == len(comp)

    def test_concatenated_streams_decode_via_consumed(self):
        from zlib_rs_tpu.config import InflateFlush

        blob = zlib.compress(b"first") + zlib.compress(b"second")
        eng = self._engine(15)
        _, c1, o1 = eng.inflate(blob, None, InflateFlush.NO_FLUSH)
        eng2 = self._engine(15)
        _, c2, o2 = eng2.inflate(blob[c1:], None, InflateFlush.NO_FLUSH)
        assert (o1, o2) == (b"first", b"second")
        assert c1 + c2 == len(blob)

    def test_matches_exact_engine_consumed(self):
        from zlib_rs_tpu.config import InflateConfig, InflateFlush
        from zlib_rs_tpu.models.inflate import Inflator

        comp = zlib.compress(b"payload bytes here")
        blob = comp + b"tail-tail-tail"
        eng = self._engine(15)
        exact = Inflator(InflateConfig(window_bits=15))
        rc_f, c_f, o_f = eng.inflate(blob, None, InflateFlush.NO_FLUSH)
        rc_e, c_e, o_e = exact.inflate(blob, None, InflateFlush.NO_FLUSH)
        assert (rc_f, c_f, o_f) == (rc_e, c_e, o_e)


class TestFastGzipHeaderCrc:
    """ADVICE r4 medium: the fast gzip header parser skipped FHCRC without
    verifying it; corruption detection depended on which engine was built."""

    def _gz_with_fhcrc(self, corrupt: bool) -> tuple[bytes, bytes]:
        import io
        import struct

        data = b"fhcrc test payload " * 50
        buf = io.BytesIO()
        g = gzip.GzipFile(fileobj=buf, mode="wb", filename="n.txt")
        g.write(data)
        g.close()
        gz = bytearray(buf.getvalue())
        hdr = bytearray(gz[:10])
        hdr[3] |= 0x02  # set FHCRC
        i = 10
        while gz[i] != 0:
            i += 1
        name = bytes(gz[10 : i + 1])
        crc16 = zlib.crc32(bytes(hdr) + name) & 0xFFFF
        if corrupt:
            crc16 ^= 0x5A5A
        return (
            bytes(hdr) + name + struct.pack("<H", crc16) + bytes(gz[i + 1 :]),
            data,
        )

    @pytest.mark.parametrize("corrupt", [False, True])
    def test_fhcrc_verified(self, corrupt):
        from zlib_rs_tpu import native
        from zlib_rs_tpu.config import InflateConfig, InflateFlush, ReturnCode
        from zlib_rs_tpu.models.faststream import FastInflateEngine
        from zlib_rs_tpu.models.inflate import Inflator

        if not native.available():
            pytest.skip("native engine not built")
        stream, data = self._gz_with_fhcrc(corrupt)
        fast = FastInflateEngine(InflateConfig(window_bits=31))
        exact = Inflator(InflateConfig(window_bits=31))
        rc_f, _, o_f = fast.inflate(stream, None, InflateFlush.NO_FLUSH)
        rc_e, _, o_e = exact.inflate(stream, None, InflateFlush.NO_FLUSH)
        if corrupt:
            assert rc_f == ReturnCode.DataError
            assert rc_e == ReturnCode.DataError
            assert fast.msg == "header crc mismatch"
        else:
            assert rc_f == ReturnCode.StreamEnd and o_f == data
            assert rc_e == ReturnCode.StreamEnd and o_e == data


class TestPartialOutputOnDataError:
    """ADVICE r4 low: a data error used to discard output decoded in the
    same call; zlib serves the valid prefix alongside Z_DATA_ERROR."""

    def test_prefix_served_with_error(self):
        import struct

        from zlib_rs_tpu import native
        from zlib_rs_tpu.config import InflateConfig, InflateFlush, ReturnCode
        from zlib_rs_tpu.models.faststream import FastInflateEngine

        if not native.available():
            pytest.skip("native engine not built")
        payload = b"B" * 1000
        raw = (
            bytes([0x00])
            + struct.pack("<HH", 1000, 0xFFFF ^ 1000)
            + payload
            + bytes([0x07])  # BFINAL=1, BTYPE=11 (invalid)
        )
        eng = FastInflateEngine(InflateConfig(window_bits=-15))
        rc, _, out = eng.inflate(raw, None, InflateFlush.NO_FLUSH)
        assert rc == ReturnCode.DataError
        assert out == payload


class TestStreamFlushSemantics:
    """ADVICE r4 medium: params()/PARTIAL_FLUSH/BLOCK raised StreamError
    after fast engagement, and repeated empty SYNC_FLUSH stacked 5-byte
    seams where zlib emits nothing."""

    def test_repeated_empty_sync_flush_emits_nothing(self):
        from zlib_rs_tpu.config import DeflateConfig, DeflateFlush
        from zlib_rs_tpu.models.stream import Deflate, Status

        st = Deflate(DeflateConfig(level=6))
        st.compress(b"hello", DeflateFlush.SYNC_FLUSH)
        status, _, out = st.compress(b"", DeflateFlush.SYNC_FLUSH)
        assert out == b""
        assert status == Status.BufError

    def test_flush_script_byte_identity_with_repeats(self):
        from zlib_rs_tpu.config import DeflateConfig, DeflateFlush
        from zlib_rs_tpu.models.stream import Deflate

        d1 = b"the quick brown fox " * 500
        d2 = b"jumps over the lazy dog " * 500
        c = zlib.compressobj(6)
        ref = c.compress(d1) + c.flush(zlib.Z_SYNC_FLUSH)
        ref += c.flush(zlib.Z_SYNC_FLUSH)
        ref += c.compress(d2) + c.flush(zlib.Z_FULL_FLUSH)
        ref += c.flush(zlib.Z_FULL_FLUSH)
        ref += c.compress(b"tail") + c.flush()
        st = Deflate(DeflateConfig(level=6))
        out = st.compress(d1, DeflateFlush.SYNC_FLUSH)[2]
        out += st.compress(b"", DeflateFlush.SYNC_FLUSH)[2]
        out += st.compress(d2, DeflateFlush.FULL_FLUSH)[2]
        out += st.compress(b"", DeflateFlush.FULL_FLUSH)[2]
        out += st.compress(b"tail", DeflateFlush.FINISH)[2]
        assert out == ref

    def test_params_after_engagement_migrates(self):
        from zlib_rs_tpu.config import DeflateConfig, DeflateFlush
        from zlib_rs_tpu.models.stream import Deflate

        d1 = b"abcdefgh " * 4000
        d2 = b"ijklmnop " * 4000
        st = Deflate(DeflateConfig(level=6))
        _, _, o1 = st.compress(d1)
        st.params(9)  # must not raise
        _, _, o2 = st.compress(d2)
        o3 = st.finish()
        assert zlib.decompress(o1 + o2 + o3) == d1 + d2

    @pytest.mark.parametrize(
        "flush_name", ["PARTIAL_FLUSH", "BLOCK"]
    )
    def test_exotic_flush_after_engagement(self, flush_name):
        from zlib_rs_tpu.config import DeflateConfig, DeflateFlush
        from zlib_rs_tpu.models.stream import Deflate

        flush = getattr(DeflateFlush, flush_name)
        d1 = b"abcdefgh " * 4000
        st = Deflate(DeflateConfig(level=6))
        _, _, o1 = st.compress(d1)
        _, _, o2 = st.compress(b"", flush)  # must not raise
        _, _, o3 = st.compress(b"more data " * 100)
        o4 = st.finish()
        assert zlib.decompress(o1 + o2 + o3 + o4) == d1 + b"more data " * 100
