"""C++ native engine tests (native/zrs_native.cpp via ctypes).

Differential against both stdlib zlib and the Python host engines — the same
oracle strategy the reference applies between zlib-rs and zlib-ng.
"""

import random
import zlib

import pytest

from zlib_rs_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no native build")

random.seed(77)
DATA = open("/bin/sh", "rb").read()[:300000]
TEXT = b"the native engine compresses this text. " * 500
RAND = bytes(random.randrange(256) for _ in range(40000))


def test_checksums_match_zlib():
    for data in (b"", b"x", DATA, RAND):
        assert native.crc32(data) == zlib.crc32(data)
        assert native.adler32(data) == zlib.adler32(data)
    # streaming starts
    assert native.crc32(DATA[100:], native.crc32(DATA[:100])) == zlib.crc32(DATA)
    assert native.adler32(DATA[100:], native.adler32(DATA[:100])) == zlib.adler32(DATA)


@pytest.mark.parametrize("level", [0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
@pytest.mark.parametrize("payload", ["DATA", "TEXT", "RAND", "empty", "tiny"])
def test_deflate_oracle_decodes(level, payload):
    data = {"DATA": DATA, "TEXT": TEXT, "RAND": RAND, "empty": b"", "tiny": b"z"}[payload]
    raw = native.deflate_chunk(data, level=level, final=True)
    assert zlib.decompress(raw, -15) == data


def test_deflate_nonfinal_has_sync_seam():
    raw = native.deflate_chunk(TEXT, level=6, final=False)
    assert raw.endswith(b"\x00\x00\xff\xff")
    d = zlib.decompressobj(-15)
    assert d.decompress(raw) == TEXT


def test_deflate_dictionary():
    dict_ = DATA[:32768]
    raw = native.deflate_chunk(DATA[32768:65536], level=6, dictionary=dict_)
    d = zlib.decompressobj(-15, zdict=dict_)
    assert d.decompress(raw) == DATA[32768:65536]
    # dictionary should shrink output for self-similar data
    base = native.deflate_chunk(DATA[:20000], level=9)
    primed = native.deflate_chunk(DATA[:20000], level=9, dictionary=DATA[:20000])
    assert len(primed) < len(base)


def test_inflate_oracle_streams():
    for data in (DATA, TEXT, RAND, b"", b"q"):
        for level in (1, 6, 9):
            co = zlib.compressobj(level, zlib.DEFLATED, -15)
            comp = co.compress(data) + co.flush()
            out, used = native.inflate_raw(comp, len(data) + 1)
            assert out == data
            assert used == len(comp)


def test_inflate_own_streams():
    for level in (0, 1, 6, 9):
        raw = native.deflate_chunk(DATA, level=level)
        out, _ = native.inflate_raw(raw, len(DATA) + 1)
        assert out == DATA


def test_inflate_python_engine_streams():
    """Native inflate decodes the Python host engine's output and vice versa."""
    from zlib_rs_tpu.config import DeflateConfig, DeflateFlush
    from zlib_rs_tpu.models.deflate import Deflator
    from zlib_rs_tpu.models.inflate import Inflator
    from zlib_rs_tpu.config import InflateConfig, InflateFlush, ReturnCode

    d = Deflator(DeflateConfig(level=6, window_bits=-15))
    d.deflate(TEXT, DeflateFlush.FINISH)
    py_raw = d.take_output()
    out, _ = native.inflate_raw(py_raw, len(TEXT) + 1)
    assert out == TEXT

    nat_raw = native.deflate_chunk(TEXT, level=6)
    inf = Inflator(InflateConfig(window_bits=-15))
    rc, _, out = inf.inflate(nat_raw, None, InflateFlush.FINISH)
    assert rc == ReturnCode.StreamEnd and out == TEXT


def test_inflate_rejects_garbage():
    with pytest.raises(ValueError):
        native.inflate_raw(b"\xff\xff\xff\xff\xff\xff", 1000)
    with pytest.raises(ValueError):
        native.inflate_raw(b"", 1000)  # truncated


def test_inflate_output_cap():
    raw = native.deflate_chunk(TEXT, level=6)
    with pytest.raises(BufferError):
        native.inflate_raw(raw, 10)


def test_parallel_deflate_valid_and_primed():
    blob = (DATA + TEXT) * 4
    raw = native.deflate_parallel(blob, level=6, chunk_size=65536, nthreads=4)
    assert zlib.decompress(raw, -15) == blob
    unprimed = native.deflate_parallel(
        blob, level=6, chunk_size=65536, prime_dict=False, nthreads=4
    )
    assert zlib.decompress(unprimed, -15) == blob
    assert len(raw) <= len(unprimed)  # dictionary priming never hurts


def test_parallel_matches_ratio_of_serial():
    blob = DATA * 3
    par = native.deflate_parallel(blob, level=6, chunk_size=131072)
    ser = native.deflate_chunk(blob, level=6)
    assert len(par) <= len(ser) * 1.05


def test_cli_native_roundtrip(tmp_path):
    from zlib_rs_tpu.cli import main

    src = tmp_path / "payload.bin"
    src.write_bytes(DATA)
    assert main(["-k", "--engine", "native", str(src)]) == 0
    import gzip

    assert gzip.decompress((tmp_path / "payload.bin.gz").read_bytes()) == DATA
    assert main(["-d", "-f", "--engine", "native", str(tmp_path / "payload.bin.gz")]) == 0
    assert src.read_bytes() == DATA


class TestSpeculativeInflate:
    """rapidgzip-style speculative parallel inflate (SURVEY §7 step 7):
    exactness is guaranteed by construction (seam misses re-decode with the
    sequential engine), so these assert byte equality everywhere."""

    def _roundtrip(self, data, level=6, strategy=zlib.Z_DEFAULT_STRATEGY):
        comp = zlib.compressobj(level, zlib.DEFLATED, -15, 8, strategy)
        raw = comp.compress(data) + comp.flush()
        out, used = native.inflate_speculative(raw, len(data) + 64, 4)
        assert out == data
        assert used == len(raw)

    def test_multi_segment_text(self):
        self._roundtrip((TEXT + DATA) * 40, 6)

    def test_levels(self):
        blob = DATA * 30
        for level in (1, 6, 9):
            self._roundtrip(blob, level)

    def test_deep_dist1_chain_markers(self):
        # dist-1 runs make every post-seam segment start on window markers
        self._roundtrip(b"a" * 8_000_000)

    def test_stored_blocks(self):
        self._roundtrip(bytes(random.randrange(256) for _ in range(4_000_000)), 6)

    def test_strategies(self):
        blob = TEXT * 300
        self._roundtrip(blob, 6, zlib.Z_HUFFMAN_ONLY)
        self._roundtrip(blob, 6, zlib.Z_RLE)

    def test_small_input_sequential_path(self):
        self._roundtrip(b"hello speculative world")
        self._roundtrip(b"")

    def test_truncated_raises(self):
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        raw = comp.compress(DATA * 30) + comp.flush()
        with pytest.raises(ValueError):
            native.inflate_speculative(raw[: len(raw) // 2], len(DATA) * 30, 4)

    def test_oneshot_routes_large_through_speculative(self):
        import zlib_rs_tpu as z

        blob = (DATA + TEXT) * 24  # > 2 MiB compressed
        assert z.decompress(zlib.compress(blob, 6)) == blob


class TestQuickMode:
    """QUICK fast mode (native.QUICK): static-tree single-probe engine —
    valid DEFLATE that zlib round-trips, chainable with sync seams, and a
    real compressor (not stored passthrough). Reference behavior class:
    zlib-ng deflate_quick (quick.rs:12-158)."""

    def test_roundtrip(self):
        if not native.available():
            pytest.skip("native engine unavailable")
        data = (b"the quick brown fox jumps over the lazy dog %d " * 500) % tuple(
            range(500)
        )
        q = native.deflate_chunk(data, level=native.QUICK, final=True)
        assert zlib.decompress(q, -15) == data
        assert len(q) < len(data) // 2  # genuinely compresses repetitive text

    def test_seam_chaining(self):
        if not native.available():
            pytest.skip("native engine unavailable")
        data = bytes(range(256)) * 1000
        a, b = data[:100_000], data[100_000:]
        q1 = native.deflate_chunk(a, level=native.QUICK, final=False)
        q2 = native.deflate_chunk(b, level=native.QUICK, final=True, dictionary=a)
        assert zlib.decompress(q1 + q2, -15) == data

    def test_edge_sizes(self):
        if not native.available():
            pytest.skip("native engine unavailable")
        for payload in (b"", b"x", b"ab", b"abc", b"aaaa" * 3, bytes(300)):
            q = native.deflate_chunk(payload, level=native.QUICK, final=True)
            assert zlib.decompress(q, -15) == payload

    def test_incompressible(self):
        if not native.available():
            pytest.skip("native engine unavailable")
        import numpy as np

        rng = np.random.default_rng(11)
        data = rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
        q = native.deflate_chunk(data, level=native.QUICK, final=True)
        assert zlib.decompress(q, -15) == data
