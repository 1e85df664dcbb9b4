"""Tests for the round-2 long-tail parity items: the real single-pass
inflateBack with caller-supplied window (infback.rs:95-969), the gz API
stragglers (gzoffset/gzdopen/gzclose_r/w, gz.rs:258,627,676,2024-2064),
and native-accelerated zran indexing/extraction."""

import gzip
import os
import random
import zlib

import pytest

from zlib_rs_tpu.config import ReturnCode
from zlib_rs_tpu.models.infback import InflateBack, inflate_back
from zlib_rs_tpu.models.gzfile import GzFile, gzclose_r, gzclose_w, gzdopen
from zlib_rs_tpu.models import zran

TESTDATA = "/root/reference/test-libz-rs-sys/src/test-data/"


def raw(data, level=6):
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


class TestInflateBack:
    @pytest.mark.parametrize("level", [0, 1, 6, 9])
    def test_round_trip_random_pieces(self, level):
        random.seed(3)
        cases = [
            b"",
            b"x",
            b"hello world" * 1000,
            open(TESTDATA + "lcet10.txt", "rb").read()[:150000],
            os.urandom(50000),
            b"a" * 100000,
        ]
        for data in cases:
            z = raw(data, level)
            pieces, p = [], 0
            while p < len(z):
                n = random.randrange(1, 5000)
                pieces.append(z[p : p + n])
                p += n
            it = iter(pieces)
            out = bytearray()
            rc = inflate_back(
                lambda: next(it, b""), lambda b: (out.extend(b), True)[1]
            )
            assert rc == ReturnCode.StreamEnd
            assert bytes(out) == data

    def test_caller_window_reused_across_streams(self):
        win = bytearray(32768)
        ib = InflateBack(15, win)
        for data in (b"abc" * 5000, b"xyz" * 20000, os.urandom(40000)):
            z = raw(data)
            it = iter([z])
            out = bytearray()
            rc = ib.run(lambda: next(it, b""), lambda b: (out.extend(b), True)[1])
            assert rc == ReturnCode.StreamEnd
            assert bytes(out) == data
        assert ib.window is win  # no reallocation

    def test_out_func_abort(self):
        z = raw(b"q" * 200000)
        it = iter([z])
        assert inflate_back(lambda: next(it, b""), lambda b: False) == ReturnCode.BufError

    def test_truncated_input(self):
        z = raw(b"hello" * 10000)
        it = iter([z[: len(z) // 2]])
        assert inflate_back(lambda: next(it, b""), lambda b: True) == ReturnCode.BufError

    def test_corrupt_input(self):
        bad = bytearray(raw(b"hello" * 1000))
        bad[10] ^= 0xFF
        it = iter([bytes(bad)])
        rc = inflate_back(lambda: next(it, b""), lambda b: True)
        assert rc in (ReturnCode.DataError, ReturnCode.BufError)

    def test_window_smaller_than_needed_rejected(self):
        with pytest.raises(ValueError):
            InflateBack(15, bytearray(1024))

    def test_output_chunk_sizes_bounded_by_window(self):
        data = os.urandom(200000)
        z = raw(data, 1)
        it = iter([z])
        sizes = []
        rc = inflate_back(lambda: next(it, b""), lambda b: (sizes.append(len(b)), True)[1])
        assert rc == ReturnCode.StreamEnd
        assert all(s <= 32768 for s in sizes)
        assert sum(sizes) == len(data)


class TestGzStragglers:
    def test_gzdopen_write_read(self, tmp_path):
        p = tmp_path / "t.gz"
        payload = b"hello gzdopen world " * 1000
        fd = os.open(p, os.O_WRONLY | os.O_CREAT, 0o600)
        f = gzdopen(fd, "wb")
        f.write(payload)
        assert gzclose_r(f) == ReturnCode.StreamError
        assert gzclose_w(f) == ReturnCode.Ok
        assert gzip.decompress(p.read_bytes()) == payload
        fd = os.open(p, os.O_RDONLY)
        f = gzdopen(fd, "rb")
        assert f.read() == payload
        assert gzclose_w(f) == ReturnCode.StreamError
        assert gzclose_r(f) == ReturnCode.Ok

    def test_gzoffset_tracks_compressed_position(self, tmp_path):
        p = tmp_path / "o.gz"
        payload = os.urandom(300000)  # incompressible: offset grows with reads
        p.write_bytes(gzip.compress(payload))
        f = GzFile(str(p), "r")
        assert f.offset() >= 0
        f.read(1000)
        mid = f.offset()
        assert 0 < mid <= os.path.getsize(p)
        f.read()
        end = f.offset()
        assert mid <= end <= os.path.getsize(p)
        f.close()

    def test_gzoffset_write_mode(self, tmp_path):
        p = tmp_path / "w.gz"
        f = GzFile(str(p), "w")
        f.write(b"data" * 1000)
        assert f.offset() >= 0
        f.close()


class TestZranNative:
    @pytest.fixture(autouse=True)
    def _need_native(self):
        from zlib_rs_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")

    @pytest.mark.parametrize("wrap", ["zlib", "gzip", "raw"])
    def test_index_and_extract(self, wrap):
        data = (
            open(TESTDATA + "lcet10.txt", "rb").read()
            + open("/bin/bash", "rb").read()[:300000]
        ) * 2
        if wrap == "zlib":
            z = zlib.compress(data, 6)
        elif wrap == "gzip":
            z = gzip.compress(data, 6)
        else:
            z = raw(data, 6)
        idx = zran.build_index(z, span=256 * 1024)
        assert idx.total_out == len(data)
        assert len(idx.points) >= 4
        random.seed(5)
        for _ in range(8):
            off = random.randrange(0, len(data) - 1000)
            ln = random.randrange(1, 5000)
            assert zran.extract(z, idx, off, ln) == data[off : off + ln]

    def test_native_region_decoder_used(self):
        # the native index pass must produce points the native region
        # decoder can resume from (bit-level prime + window)
        from zlib_rs_tpu import native

        data = open(TESTDATA + "lcet10.txt", "rb").read() * 2
        body = raw(data, 6)
        full, points, in_used = native.zran_index(body, 65536, 4 * len(data))
        assert full == data
        assert points
        for out_off, bitpos in points[:5]:
            byte, sub = bitpos >> 3, bitpos & 7
            window = data[max(0, out_off - 32768) : out_off]
            got = native.inflate_region(body[byte:], sub, window, 1000)
            assert got == data[out_off : out_off + 1000]

    def test_corrupt_stream_not_indexed_wrongly(self):
        data = b"abc" * 100000
        z = bytearray(zlib.compress(data, 6))
        z[-2] ^= 0xFF  # corrupt the adler trailer
        try:
            idx = zran.build_index(bytes(z), span=65536)
        except ValueError:
            return  # python fallback rejects too
        # if an index was built it must have gone through the fallback
        # engine's own checks — extraction must still match the real data
        assert zran.extract(bytes(z), idx, 0, 300) == data[:300]
