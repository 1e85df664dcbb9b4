"""Streaming API (stable-layer) tests: z_stream pumping with tiny budgets,
mirroring the reference's stable.rs tests and the inflate_chunked fuzz target
(SURVEY.md section 4)."""

import random
import zlib

import pytest

from zlib_rs_tpu.config import (
    DeflateConfig,
    DeflateFlush,
    InflateConfig,
    InflateFlush,
    ReturnCode,
)
from zlib_rs_tpu.models.infback import inflate_back
from zlib_rs_tpu.models.stream import Deflate, Inflate, InflateError, Status

random.seed(99)
DATA = (b"stream pumping test data, " * 400) + bytes(random.randrange(256) for _ in range(3000))


def test_deflate_stream_tiny_input_chunks():
    d = Deflate(level=6)
    comp = bytearray()
    for i in range(0, len(DATA), 13):
        status, consumed, out = d.compress(DATA[i : i + 13])
        assert status in (Status.Ok, Status.BufError)
        comp.extend(out)
    comp.extend(d.finish())
    assert zlib.decompress(bytes(comp)) == DATA
    assert d.total_in == len(DATA)
    assert d.total_out == len(comp)


def test_deflate_stream_tiny_output_budget():
    d = Deflate(level=6)
    comp = bytearray()
    status, _, out = d.compress(DATA, DeflateFlush.FINISH, out_budget=7)
    comp.extend(out)
    while status != Status.StreamEnd:
        status, _, out = d.compress(b"", DeflateFlush.FINISH, out_budget=7)
        comp.extend(out)
        assert len(out) <= 7
    assert zlib.decompress(bytes(comp)) == DATA


def test_inflate_stream_tiny_both_ways():
    comp = zlib.compress(DATA, 6)
    for in_chunk, out_budget in ((1, None), (None, 1), (17, 29)):
        inf = Inflate()
        result = bytearray()
        pos = 0
        status = Status.Ok
        while status != Status.StreamEnd:
            feed = comp[pos : pos + in_chunk] if in_chunk else comp[pos:]
            status, consumed, out = inf.decompress(feed, out_budget)
            pos += consumed
            result.extend(out)
            if status == Status.BufError and pos >= len(comp):
                raise AssertionError("stuck")
        assert bytes(result) == DATA
        assert inf.total_out == len(DATA)


def test_inflate_random_chunk_boundaries():
    # counterpart of the reference's inflate_chunked fuzz target
    comp = zlib.compress(DATA, 9)
    for _ in range(5):
        cuts = sorted(random.sample(range(1, len(comp)), 20))
        pieces = [comp[a:b] for a, b in zip([0] + cuts, cuts + [len(comp)])]
        inf = Inflate()
        result = bytearray()
        for p in pieces:
            while p:
                status, consumed, out = inf.decompress(p, random.randrange(1, 5000))
                p = p[consumed:]
                result.extend(out)
                if status == Status.StreamEnd:
                    break
        assert bytes(result) == DATA


def test_inflate_error_surfaces_msg():
    inf = Inflate()
    with pytest.raises(InflateError) as ei:
        inf.decompress(b"\x78\x9c" + b"\xff" * 20)
    assert ei.value.return_code == ReturnCode.DataError


def test_deflate_copy_and_reset():
    d = Deflate(level=6)
    d.compress(DATA[:500])
    c = d.copy()
    _, _, out1 = d.compress(DATA[500:], DeflateFlush.FINISH)
    _, _, out2 = c.compress(DATA[500:], DeflateFlush.FINISH)
    assert out1 == out2
    d.reset()
    s, _, out = d.compress(DATA, DeflateFlush.FINISH)
    assert s == Status.StreamEnd
    assert zlib.decompress(out) == DATA


def test_inflate_copy_mid_stream():
    comp = zlib.compress(DATA)
    inf = Inflate()
    _, consumed, first = inf.decompress(comp[:100])
    snap = inf.copy()
    _, _, rest1 = inf.decompress(comp[consumed:])
    _, _, rest2 = snap.decompress(comp[consumed:])
    assert rest1 == rest2
    assert first + rest1 == DATA


def test_inflate_back_roundtrip():
    raw = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = raw.compress(DATA) + raw.flush()
    pieces = [comp[i : i + 97] for i in range(0, len(comp), 97)]
    it = iter(pieces)
    got = bytearray()

    rc = inflate_back(lambda: next(it, b""), lambda b: got.extend(b) or True)
    assert rc == ReturnCode.StreamEnd
    assert bytes(got) == DATA


def test_inflate_back_aborting_out_func():
    raw = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = raw.compress(DATA) + raw.flush()
    it = iter([comp])
    rc = inflate_back(lambda: next(it, b""), lambda b: False)
    assert rc == ReturnCode.BufError


def test_inflate_back_truncated_input():
    raw = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = (raw.compress(DATA) + raw.flush())[:50]
    it = iter([comp])
    got = bytearray()
    rc = inflate_back(lambda: next(it, b""), lambda b: got.extend(b) or True)
    assert rc == ReturnCode.BufError
