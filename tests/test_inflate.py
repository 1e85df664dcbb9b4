"""Inflate engine tests vs the stdlib zlib oracle.

Mirrors the reference's differential strategy (SURVEY.md section 4): decode
oracle-produced streams at every level/strategy/wrapping, chunked-resumption
fuzzing (the inflate_chunked fuzz target's property), and malformed-input
behavior."""

import gzip as _gzip
import io
import zlib

import numpy as np
import pytest

from zlib_rs_tpu.config import GzHeader, InflateConfig, InflateFlush, ReturnCode
from zlib_rs_tpu.models import inflate as M


def mk_data(kind: str, n: int, seed=0) -> bytes:
    rng = np.random.default_rng(seed)
    if kind == "random":
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == "zeros":
        return bytes(n)
    if kind == "text":
        words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"lazy", b"dog", b"\n"]
        out = bytearray()
        while len(out) < n:
            out += words[int(rng.integers(len(words)))] + b" "
        return bytes(out[:n])
    if kind == "runs":
        out = bytearray()
        while len(out) < n:
            out += bytes([int(rng.integers(4))]) * int(rng.integers(1, 300))
        return bytes(out[:n])
    raise ValueError(kind)


CORPUS = [
    ("random", 1000),
    ("zeros", 5000),
    ("text", 20_000),
    ("runs", 50_000),
    ("text", 200_000),  # > 2 x 32KB window
]


@pytest.mark.parametrize("kind,n", CORPUS)
@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_decompress_zlib_streams(kind, n, level):
    data = mk_data(kind, n)
    comp = zlib.compress(data, level)
    assert M.decompress(comp) == data


@pytest.mark.parametrize("kind,n", CORPUS[:4])
def test_decompress_raw_streams(kind, n):
    data = mk_data(kind, n)
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(data) + co.flush()
    out = M.decompress(comp, InflateConfig(window_bits=-15))
    assert out == data


@pytest.mark.parametrize("kind,n", CORPUS[:4])
def test_decompress_gzip_streams(kind, n):
    data = mk_data(kind, n)
    comp = _gzip.compress(data, 6)
    out = M.decompress(comp, InflateConfig(window_bits=16 + 15))
    assert out == data


def test_auto_detect_both():
    data = mk_data("text", 5000)
    cfg = InflateConfig(window_bits=32 + 15)
    assert M.decompress(zlib.compress(data), cfg) == data
    assert M.decompress(_gzip.compress(data), cfg) == data


@pytest.mark.parametrize("chunk", [1, 2, 3, 7, 64, 1000])
def test_chunked_input_resumption(chunk):
    """Feed input in tiny pieces at every boundary (inflate_chunked fuzz
    target's property, reference fuzz/fuzz_targets/inflate_chunked.rs)."""
    data = mk_data("text", 30_000, seed=1)
    comp = zlib.compress(data, 9)
    inf = M.Inflator()
    out = bytearray()
    ret = ReturnCode.Ok
    pos = 0
    while pos < len(comp):
        piece = comp[pos : pos + chunk]
        ret, used, produced = inf.inflate(piece, None, InflateFlush.NO_FLUSH)
        assert used == len(piece), f"engine must consume all input, used={used}"
        out.extend(produced)
        pos += chunk
        if ret == ReturnCode.StreamEnd:
            break
        assert ret == ReturnCode.Ok
    assert ret == ReturnCode.StreamEnd
    assert bytes(out) == data


@pytest.mark.parametrize("budget", [1, 3, 100, 4096])
def test_chunked_output_budget(budget):
    data = mk_data("runs", 20_000, seed=2)
    comp = zlib.compress(data, 6)
    inf = M.Inflator()
    out = bytearray()
    pos = 0
    for _ in range(1000_000):
        ret, used, produced = inf.inflate(comp[pos:], budget, InflateFlush.NO_FLUSH)
        pos += used
        out.extend(produced)
        assert len(produced) <= budget
        if ret == ReturnCode.StreamEnd:
            break
        assert ret in (ReturnCode.Ok,)
    assert ret == ReturnCode.StreamEnd
    assert bytes(out) == data


def test_multistream_leftover_input():
    data1, data2 = b"first stream", b"second!"
    comp = zlib.compress(data1) + zlib.compress(data2)
    inf = M.Inflator()
    ret, used, out = inf.inflate(comp, None, InflateFlush.NO_FLUSH)
    assert ret == ReturnCode.StreamEnd
    assert out == data1
    inf.reset()
    ret, used2, out2 = inf.inflate(comp[used:], None, InflateFlush.NO_FLUSH)
    assert ret == ReturnCode.StreamEnd and out2 == data2


def test_corrupt_data_errors_not_crashes():
    rng = np.random.default_rng(3)
    data = mk_data("text", 5000)
    comp = bytearray(zlib.compress(data, 6))
    for _ in range(50):
        corrupted = bytearray(comp)
        i = int(rng.integers(2, len(comp)))
        corrupted[i] ^= 1 << int(rng.integers(8))
        inf = M.Inflator()
        ret, _, _ = inf.inflate(bytes(corrupted), None, InflateFlush.FINISH)
        assert ret in (ReturnCode.DataError, ReturnCode.Ok, ReturnCode.StreamEnd)
        # Ok means it paused waiting for more input (truncated-looking) -- fine


def test_garbage_input_errors():
    rng = np.random.default_rng(4)
    for _ in range(30):
        garbage = rng.integers(0, 256, 200, dtype=np.uint8).tobytes()
        inf = M.Inflator()
        ret, _, _ = inf.inflate(garbage, None, InflateFlush.FINISH)
        assert ret in (ReturnCode.DataError, ReturnCode.Ok)


def test_bad_checksum_detected():
    comp = bytearray(zlib.compress(b"hello world hello world"))
    comp[-1] ^= 0xFF  # adler32 trailer
    inf = M.Inflator()
    ret, _, _ = inf.inflate(bytes(comp), None, InflateFlush.FINISH)
    assert ret == ReturnCode.DataError
    assert "check" in inf.msg


def test_validate_false_skips_checksum():
    comp = bytearray(zlib.compress(b"hello world hello world"))
    comp[-1] ^= 0xFF
    inf = M.Inflator()
    inf.validate(False)
    ret, _, out = inf.inflate(bytes(comp), None, InflateFlush.FINISH)
    assert ret == ReturnCode.StreamEnd
    assert out == b"hello world hello world"


def test_gzip_header_fields():
    data = b"payload data for header test"
    buf = io.BytesIO()
    with _gzip.GzipFile(
        filename="myname.txt", mode="wb", fileobj=buf, mtime=1234567
    ) as f:
        f.write(data)
    comp = buf.getvalue()
    inf = M.Inflator(InflateConfig(window_bits=16 + 15))
    inf.get_header(GzHeader())
    ret, _, out = inf.inflate(comp, None, InflateFlush.FINISH)
    assert ret == ReturnCode.StreamEnd and out == data
    head = inf.header_fields()
    assert head is not None and head.done
    assert head.name == b"myname.txt"
    assert head.time == 1234567


def test_zlib_dictionary():
    dictionary = b"the quick brown fox jumps over the lazy dog"
    data = b"the quick brown fox and the lazy dog again and again"
    co = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_DEFAULT_STRATEGY, dictionary)
    comp = co.compress(data) + co.flush()
    inf = M.Inflator()
    ret, used, out = inf.inflate(comp, None, InflateFlush.NO_FLUSH)
    assert ret == ReturnCode.NeedDict
    assert inf.dict_id == zlib.adler32(dictionary)
    assert inf.set_dictionary(dictionary) == ReturnCode.Ok
    ret, _, out = inf.inflate(comp[used:], None, InflateFlush.FINISH)
    assert ret == ReturnCode.StreamEnd and out == data
    # wrong dictionary rejected
    inf2 = M.Inflator()
    r, u, _ = inf2.inflate(comp, None, InflateFlush.NO_FLUSH)
    assert r == ReturnCode.NeedDict
    assert inf2.set_dictionary(b"wrong dict") == ReturnCode.DataError


def test_copy_mid_stream():
    data = mk_data("text", 50_000, seed=5)
    comp = zlib.compress(data, 9)
    inf = M.Inflator()
    ret, used, out1 = inf.inflate(comp[:1000], None, InflateFlush.NO_FLUSH)
    clone = inf.copy()
    r1, _, rest1 = inf.inflate(comp[1000:], None, InflateFlush.FINISH)
    r2, _, rest2 = clone.inflate(comp[1000:], None, InflateFlush.FINISH)
    assert r1 == r2 == ReturnCode.StreamEnd
    assert rest1 == rest2
    assert out1 + rest1 == data


def test_sync_after_corruption():
    """inflateSync finds the next sync-flush point after corrupt data."""
    co = zlib.compressobj(6)
    part1 = co.compress(b"A" * 1000) + co.flush(zlib.Z_FULL_FLUSH)
    part2 = co.compress(b"B" * 1000) + co.flush(zlib.Z_SYNC_FLUSH)
    part3 = co.compress(b"C" * 1000) + co.flush(zlib.Z_FINISH)
    stream = part1 + part2 + part3
    # corrupt part1's payload
    broken = bytearray(stream)
    broken[10] ^= 0xFF
    inf = M.Inflator()
    ret, used, _ = inf.inflate(bytes(broken), None, InflateFlush.NO_FLUSH)
    assert ret == ReturnCode.DataError
    # the caller re-feeds its buffered data to sync(); the scan must land
    # just past the first 00 00 FF FF full-flush marker
    rc, skipped = inf.sync(bytes(broken))
    assert rc == ReturnCode.Ok
    assert skipped == stream.find(b"\x00\x00\xff\xff") + 4
    # after sync we're at a full-flush point; B and C decode cleanly (full
    # flush resets window refs); the final adler mismatches (missing A's)
    ret2, _, out2 = inf.inflate(bytes(broken[skipped:]), None, InflateFlush.FINISH)
    assert out2[:2000] == b"B" * 1000 + b"C" * 1000
    assert ret2 == ReturnCode.DataError  # checksum over A+B+C can't match


def test_prime_and_raw():
    data = b"prime test data"
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(data) + co.flush()
    inf = M.Inflator(InflateConfig(window_bits=-15))
    # feed first byte via prime
    assert inf.prime(8, comp[0]) == ReturnCode.Ok
    ret, _, out = inf.inflate(comp[1:], None, InflateFlush.FINISH)
    assert ret == ReturnCode.StreamEnd and out == data


def test_block_flush_stops_at_boundaries():
    data = mk_data("text", 10_000, seed=6)
    co = zlib.compressobj(6)
    comp = (
        co.compress(data[:5000])
        + co.flush(zlib.Z_FULL_FLUSH)
        + co.compress(data[5000:])
        + co.flush(zlib.Z_FINISH)
    )
    inf = M.Inflator()
    out = bytearray()
    pos = 0
    boundaries = 0
    for _ in range(10_000):
        ret, used, produced = inf.inflate(comp[pos:], None, InflateFlush.BLOCK)
        pos += used
        out.extend(produced)
        if inf.data_type & 64:
            boundaries += 1
        if ret == ReturnCode.StreamEnd:
            break
    assert ret == ReturnCode.StreamEnd
    assert bytes(out) == data
    assert boundaries >= 2


def test_codes_used_counts_dynamic_tables():
    data = mk_data("text", 100_000, seed=7)
    comp = zlib.compress(data, 9)
    inf = M.Inflator()
    ret, _, out = inf.inflate(comp, None, InflateFlush.FINISH)
    assert ret == ReturnCode.StreamEnd
    assert inf.codes_used() >= 1


def test_wbits_too_small_rejected():
    data = mk_data("text", 60_000, seed=8)
    comp = zlib.compress(data, 9)  # wbits 15 in header
    inf = M.Inflator(InflateConfig(window_bits=9))
    ret, _, _ = inf.inflate(comp, None, InflateFlush.FINISH)
    assert ret == ReturnCode.DataError
    assert "window" in inf.msg


def test_stored_blocks():
    data = mk_data("random", 200_000, seed=9)
    comp = zlib.compress(data, 0)  # stored blocks
    assert M.decompress(comp) == data
