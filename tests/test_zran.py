"""Random-access (zran) tests: index + extract over foreign streams,
exercising inflatePrime/SetDictionary/Z_BLOCK checkpoints."""

import gzip
import random
import zlib

import pytest

from zlib_rs_tpu.models.zran import build_index, extract

random.seed(31)
DATA = (
    bytes(random.randrange(64) for _ in range(40000))
    + open("/bin/sh", "rb").read()[:100000]
    + b"repetitive tail " * 4000
)


@pytest.fixture(scope="module")
def zlib_stream():
    comp = zlib.compress(DATA, 6)
    return comp, build_index(comp, span=32768)


def test_index_covers_stream(zlib_stream):
    comp, idx = zlib_stream
    assert idx.total_out == len(DATA)
    assert len(idx.points) >= 2
    outs = [p.out_offset for p in idx.points]
    assert outs == sorted(outs)


@pytest.mark.parametrize("offset,length", [
    (0, 100), (1, 1), (39999, 2), (65537, 4096), (100000, 30000),
])
def test_extract_matches_source(zlib_stream, offset, length):
    comp, idx = zlib_stream
    assert extract(comp, idx, offset, length) == DATA[offset : offset + length]


def test_extract_past_end(zlib_stream):
    comp, idx = zlib_stream
    assert extract(comp, idx, len(DATA) - 10, 100) == DATA[-10:]
    assert extract(comp, idx, len(DATA) + 5, 10) == b""


def test_extract_at_checkpoints(zlib_stream):
    comp, idx = zlib_stream
    for p in idx.points:
        got = extract(comp, idx, p.out_offset, 64)
        assert got == DATA[p.out_offset : p.out_offset + 64]


def test_gzip_stream_random_access():
    g = gzip.compress(DATA, 9)
    idx = build_index(g, span=50000)
    for off in (0, 12345, 99999, 170000):
        assert extract(g, idx, off, 500) == DATA[off : off + 500]


def test_own_parallel_stream_random_access():
    """Streams from the TPU pipeline index like any other stream — the
    sync-flush seams give dense natural checkpoints."""
    from zlib_rs_tpu.parallel.pipeline import compress_parallel

    comp = compress_parallel(DATA[:100000], level=6, chunk_size=16384)
    idx = build_index(comp, span=16384)
    assert len(idx.points) >= 4  # seams every chunk
    for off in (5, 20000, 70001):
        assert extract(comp, idx, off, 300) == DATA[off : off + 300]
