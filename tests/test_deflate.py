"""Deflate engine tests: differential against the stdlib zlib oracle.

Mirrors the reference's test strategy (SURVEY.md section 4): round-trip and
differential decode of our streams by an independent implementation, plus
feature-surface tests (strategies, dictionary, flush modes, params, prime,
gzip header, bound).
"""

import gzip
import random
import zlib

import pytest

import zlib_rs_tpu as z
from zlib_rs_tpu.config import (
    DeflateConfig,
    DeflateFlush,
    GzHeader,
    InflateConfig,
    InflateFlush,
    ReturnCode,
    Strategy,
)
from zlib_rs_tpu.models.deflate import Deflator, compress_bound
from zlib_rs_tpu.models.inflate import Inflator

random.seed(1234)

CORPUS = {
    "empty": b"",
    "one": b"x",
    "tiny": b"hello hello hello world",
    "runs": b"a" * 4000 + b"b" * 2000 + b"ab" * 500,
    "text": b"the quick brown fox jumps over the lazy dog. " * 200,
    "binary": bytes(random.randrange(256) for _ in range(8192)),
    "binary_runs": (b"\x00" * 100 + bytes(random.randrange(256) for _ in range(100))) * 40,
    "lorem": (
        b"Lorem ipsum dolor sit amet, consectetur adipiscing elit, sed do "
        b"eiusmod tempor incididunt ut labore et dolore magna aliqua. "
    )
    * 100,
}


@pytest.mark.parametrize("level", [0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
@pytest.mark.parametrize("name", sorted(CORPUS))
def test_roundtrip_all_levels(level, name):
    data = CORPUS[name]
    comp = z.compress(data, level=level)
    assert zlib.decompress(comp) == data  # oracle decodes our stream
    assert z.decompress(comp) == data  # our decoder too
    assert len(comp) <= z.compress_bound(len(data), level=level)


@pytest.mark.parametrize("wbits", [9, 12, 15])
def test_window_bits_wrappers(wbits):
    data = CORPUS["text"]
    comp = z.compress(data, level=6, window_bits=wbits)
    assert zlib.decompress(comp, wbits) == data
    # header advertises the right window size
    assert (comp[0] >> 4) == wbits - 8


def test_gzip_and_raw_wrappers():
    data = CORPUS["lorem"]
    g = z.compress(data, level=6, window_bits=31)
    assert gzip.decompress(g) == data
    r = z.compress(data, level=6, window_bits=-15)
    assert zlib.decompress(r, -15) == data
    assert z.decompress(g) == data  # auto-detect
    assert z.decompress(r, window_bits=-15) == data


@pytest.mark.parametrize(
    "strategy", [Strategy.Filtered, Strategy.HuffmanOnly, Strategy.Rle, Strategy.Fixed]
)
def test_strategies_produce_valid_streams(strategy):
    data = CORPUS["binary_runs"]
    comp = z.compress(data, level=6, strategy=strategy)
    assert zlib.decompress(comp) == data


def test_rle_matches_only_distance_one():
    # Rle must not find the distance-20 repetition, only the runs
    data = (b"x" * 50 + b"abcdefghij") * 20
    comp_rle = z.compress(data, level=6, strategy=Strategy.Rle)
    comp_def = z.compress(data, level=6)
    assert zlib.decompress(comp_rle) == data
    assert len(comp_def) < len(comp_rle)


def test_huffman_only_no_matches():
    data = b"ab" * 4000  # highly compressible by LZ, not by Huffman alone
    c_huff = z.compress(data, level=6, strategy=Strategy.HuffmanOnly)
    c_def = z.compress(data, level=6)
    assert zlib.decompress(c_huff) == data
    assert len(c_def) < len(c_huff) // 4


def test_level_ordering_monotone_ish():
    # higher levels should never be drastically worse on compressible data
    data = CORPUS["lorem"] * 5
    sizes = {lvl: len(z.compress(data, level=lvl)) for lvl in (1, 6, 9)}
    assert sizes[6] <= sizes[1]
    assert sizes[9] <= sizes[6] * 1.01


def test_deflate_dictionary_oracle():
    data = b"dictionary words repeat: foo bar baz qux " * 50
    dict_ = b"foo bar baz qux "
    d = Deflator(DeflateConfig(level=6))
    assert d.set_dictionary(dict_) == ReturnCode.Ok
    d.deflate(data, DeflateFlush.FINISH)
    comp = d.take_output()
    do = zlib.decompressobj(zdict=dict_)
    assert do.decompress(comp) == data
    # FDICT flag set, dict id is adler32 of the dictionary
    assert comp[1] & 0x20
    assert int.from_bytes(comp[2:6], "big") == zlib.adler32(dict_)


def test_deflate_dictionary_improves_ratio():
    dict_ = bytes(random.randrange(256) for _ in range(2000))
    data = dict_[500:1500] + dict_[200:900]  # only compressible via dict
    base = len(z.compress(data, level=9))
    d = Deflator(DeflateConfig(level=9))
    d.set_dictionary(dict_)
    d.deflate(data, DeflateFlush.FINISH)
    primed = len(d.take_output())
    assert primed < base // 2


def test_get_dictionary():
    d = Deflator(DeflateConfig(level=6))
    d.set_dictionary(b"abcdef")
    assert d.get_dictionary() == b"abcdef"
    d.deflate(b"xyz" * 100, DeflateFlush.NO_FLUSH)


def test_streaming_chunked_feed_matches_oneshot_roundtrip():
    data = CORPUS["lorem"] * 3
    for chunk in (1, 7, 256, 4096):
        d = Deflator(DeflateConfig(level=6))
        for i in range(0, len(data), chunk):
            assert d.deflate(data[i : i + chunk], DeflateFlush.NO_FLUSH) == ReturnCode.Ok
        assert d.deflate(b"", DeflateFlush.FINISH) == ReturnCode.StreamEnd
        assert zlib.decompress(d.take_output()) == data


@pytest.mark.parametrize(
    "flush",
    [DeflateFlush.SYNC_FLUSH, DeflateFlush.FULL_FLUSH, DeflateFlush.PARTIAL_FLUSH],
)
def test_flush_modes_stream_stays_valid(flush):
    data = CORPUS["text"]
    d = Deflator(DeflateConfig(level=6))
    comp = bytearray()
    for i in range(0, len(data), 1000):
        d.deflate(data[i : i + 1000], flush)
        comp.extend(d.take_output())
    d.deflate(b"", DeflateFlush.FINISH)
    comp.extend(d.take_output())
    assert zlib.decompress(bytes(comp)) == data
    assert z.decompress(bytes(comp)) == data


def test_sync_flush_prefix_decodable():
    data = CORPUS["text"]
    d = Deflator(DeflateConfig(level=6))
    d.deflate(data[:1000], DeflateFlush.SYNC_FLUSH)
    prefix = d.take_output()
    # sync flush byte-aligns with the 00 00 FF FF empty stored block
    assert prefix.endswith(b"\x00\x00\xff\xff")
    do = zlib.decompressobj()
    assert do.decompress(prefix) == data[:1000]


def test_full_flush_vs_sync_flush_history():
    data = b"repeated segment " * 100
    d_full = Deflator(DeflateConfig(level=9))
    d_full.deflate(data, DeflateFlush.FULL_FLUSH)
    d_full.deflate(data, DeflateFlush.FINISH)
    full_stream = d_full.take_output()
    d_sync = Deflator(DeflateConfig(level=9))
    d_sync.deflate(data, DeflateFlush.SYNC_FLUSH)
    d_sync.deflate(data, DeflateFlush.FINISH)
    sync_stream = d_sync.take_output()
    # FULL_FLUSH forgets history, so the second copy can't back-reference the
    # first and the stream is strictly larger than with SYNC_FLUSH
    assert len(full_stream) > len(sync_stream)
    assert zlib.decompress(full_stream) == data + data
    assert zlib.decompress(sync_stream) == data + data


def test_full_flush_stream_decodes():
    data = b"repeated segment " * 100
    d = Deflator(DeflateConfig(level=9))
    d.deflate(data, DeflateFlush.FULL_FLUSH)
    d.deflate(data, DeflateFlush.FINISH)
    comp = d.take_output()
    assert zlib.decompress(comp) == data + data


def test_params_mid_stream():
    data = CORPUS["lorem"]
    d = Deflator(DeflateConfig(level=1))
    d.deflate(data[:2000], DeflateFlush.NO_FLUSH)
    assert d.params(9, Strategy.Default) == ReturnCode.Ok
    d.deflate(data[2000:], DeflateFlush.FINISH)
    assert zlib.decompress(d.take_output()) == data
    assert d.params(5, Strategy.Default) == ReturnCode.StreamError  # finished


def test_tune():
    d = Deflator(DeflateConfig(level=6))
    assert d.tune(4, 10, 100, 64) == ReturnCode.Ok
    d.deflate(CORPUS["text"], DeflateFlush.FINISH)
    assert zlib.decompress(d.take_output()) == CORPUS["text"]


def test_prime_injects_bits():
    data = b"prime me " * 30
    d = Deflator(DeflateConfig(level=6, window_bits=-15))
    assert d.prime(3, 0b101) == ReturnCode.Ok
    d.deflate(data, DeflateFlush.FINISH)
    out = d.take_output()
    assert out[0] & 0b111 == 0b101
    inf = Inflator(InflateConfig(window_bits=-15))
    inf.prime(5, out[0] >> 3)
    rc, _, dec = inf.inflate(out[1:], None, InflateFlush.FINISH)
    assert rc == ReturnCode.StreamEnd and dec == data


def test_pending_info():
    d = Deflator(DeflateConfig(level=6))
    d.deflate(b"abc" * 100, DeflateFlush.NO_FLUSH)
    nbytes, nbits = d.pending_info()
    assert nbytes >= 0 and 0 <= nbits < 8


def test_deflate_copy_mid_stream():
    data = CORPUS["text"]
    d = Deflator(DeflateConfig(level=6))
    d.deflate(data[:5000], DeflateFlush.NO_FLUSH)
    snap = d.copy()
    d.deflate(data[5000:], DeflateFlush.FINISH)
    out1 = d.take_output()
    snap.deflate(data[5000:], DeflateFlush.FINISH)
    out2 = snap.take_output()
    assert out1 == out2
    assert zlib.decompress(out1) == data


def test_gzip_header_fields_roundtrip():
    data = CORPUS["text"]
    head = GzHeader(
        time=1234567, name=b"file.txt", comment=b"a comment", extra=b"\x01\x02\x03", hcrc=True, os=3
    )
    d = Deflator(DeflateConfig(level=6, window_bits=31))
    assert d.set_header(head) == ReturnCode.Ok
    d.deflate(data, DeflateFlush.FINISH)
    gz = d.take_output()
    assert gzip.decompress(gz) == data
    inf = Inflator(InflateConfig(window_bits=31))
    inf.get_header()
    rc, _, dec = inf.inflate(gz, None, InflateFlush.FINISH)
    assert rc == ReturnCode.StreamEnd and dec == data
    h = inf.header_fields()
    assert h.name == b"file.txt"
    assert h.comment == b"a comment"
    assert h.extra == b"\x01\x02\x03"
    assert h.time == 1234567
    assert h.hcrc


def test_set_header_rejected_for_zlib_wrap():
    d = Deflator(DeflateConfig(level=6))
    assert d.set_header(GzHeader()) == ReturnCode.StreamError


def test_gzip_trailer_crc_and_length():
    data = CORPUS["binary"]
    g = z.compress(data, level=6, window_bits=31)
    assert int.from_bytes(g[-8:-4], "little") == zlib.crc32(data)
    assert int.from_bytes(g[-4:], "little") == len(data) & 0xFFFFFFFF


@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_bound_holds_for_incompressible(level):
    for n in (0, 1, 100, 70000):
        payload = bytes(random.randrange(256) for _ in range(n))
        assert len(z.compress(payload, level=level)) <= compress_bound(
            n, DeflateConfig(level=level)
        )


def test_stored_blocks_used_for_incompressible():
    payload = bytes(random.randrange(256) for _ in range(100000))
    d = Deflator(DeflateConfig(level=6))
    d.deflate(payload, DeflateFlush.FINISH)
    comp = d.take_output()
    assert "stored" in d._block_types
    assert len(comp) < len(payload) + len(payload) // 1000 + 64
    assert zlib.decompress(comp) == payload


def test_empty_finish_levels():
    for level in range(10):
        comp = z.compress(b"", level=level)
        assert zlib.decompress(comp) == b""


def test_deflate_after_finish_errors():
    d = Deflator(DeflateConfig(level=6))
    d.deflate(b"abc", DeflateFlush.FINISH)
    d.take_output()
    assert d.deflate(b"more", DeflateFlush.NO_FLUSH) == ReturnCode.StreamError
    assert d.deflate(b"", DeflateFlush.FINISH) == ReturnCode.StreamEnd


def test_reset_allows_reuse():
    d = Deflator(DeflateConfig(level=6))
    d.deflate(b"first stream", DeflateFlush.FINISH)
    first = d.take_output()
    d.reset()
    d.deflate(b"first stream", DeflateFlush.FINISH)
    second = d.take_output()
    assert first == second


def test_quickcheck_style_random_configs():
    for _ in range(25):
        n = random.randrange(0, 5000)
        data = bytes(
            random.choice(b"abcdefgh \n") if random.random() < 0.7 else random.randrange(256)
            for _ in range(n)
        )
        level = random.randrange(0, 10)
        wb = random.choice([-15, -9, 9, 12, 15, 25, 31])
        comp = z.compress(data, level=level, window_bits=wb)
        if wb < 0:
            assert zlib.decompress(comp, wb) == data
        elif wb > 15:
            assert gzip.decompress(comp) == data
        else:
            assert zlib.decompress(comp, wb) == data
        # our own decoder, exact wrapper
        assert z.decompress(comp, window_bits=(wb if wb != 25 else 31) if wb < 0 or wb > 15 else wb) == data


def test_stats_counters():
    d = Deflator(DeflateConfig(level=6))
    d.deflate(b"statistics " * 500, DeflateFlush.FINISH)
    s = d.stats()
    assert s["matches"] > 0 and s["literals"] > 0
    assert s["match_bytes"] + s["literals"] == s["total_in"]
    assert sum(s["blocks"].values()) >= 1
    assert s["data_type"] == "Text"
