"""Regression tests over the reference repo's vendored fixture corpus
(read at runtime from /root/reference, never copied): fuzz-crash artifacts,
CVE reproducers, and standard corpus samples. Mirrors the reference's own
regression strategy (SURVEY.md section 4: test-data/*.gz, *.zraw,
zlib-ng CVE fixtures)."""

import gzip
import zlib
from pathlib import Path

import pytest

import zlib_rs_tpu as z
from zlib_rs_tpu.config import InflateConfig, InflateFlush, ReturnCode
from zlib_rs_tpu.models.inflate import DataError, Inflator

TESTDATA = Path("/root/reference/test-libz-rs-sys/src/test-data")

pytestmark = [
    pytest.mark.skipif(
        not TESTDATA.exists(), reason="reference fixtures not mounted"
    ),
    pytest.mark.slow,  # fast tier: pytest -m 'not slow'
]


def _gz_files():
    return sorted(TESTDATA.glob("*.gz"))


@pytest.mark.parametrize("path", _gz_files(), ids=lambda p: p.name)
def test_fixture_gz_streams_match_oracle(path):
    """Every vendored .gz decodes identically to the oracle — or errors in
    both implementations (some fixtures are fuzz crash artifacts)."""
    blob = path.read_bytes()
    try:
        expect = gzip.decompress(blob)
        oracle_err = None
    except Exception as e:
        expect, oracle_err = None, e
    inf = Inflator(InflateConfig(window_bits=31))
    rc, _consumed, out = inf.inflate(blob, None, InflateFlush.FINISH)
    if oracle_err is None:
        assert rc == ReturnCode.StreamEnd
        assert out == expect
    else:
        assert rc != ReturnCode.StreamEnd or out != b""


def _zraw_files():
    return sorted(TESTDATA.glob("*.zraw"))


@pytest.mark.parametrize("path", _zraw_files(), ids=lambda p: p.name)
def test_fixture_zraw_streams_match_oracle(path):
    blob = path.read_bytes()
    try:
        expect = zlib.decompress(blob, -15)
        oracle_err = None
    except Exception as e:
        expect, oracle_err = None, e
    inf = Inflator(InflateConfig(window_bits=-15))
    rc, _consumed, out = inf.inflate(blob, None, InflateFlush.FINISH)
    if oracle_err is None:
        # raw streams may end exactly at the last block (StreamEnd) — ours
        # must produce the same bytes
        assert out == expect
    # on oracle error we only require no crash (fuzz artifacts)


@pytest.mark.parametrize(
    "name", ["lcet10.txt", "paper-100k.pdf", "fireworks.jpg", "issue-169.js"]
)
def test_fixture_corpus_roundtrip_all_engines(name):
    p = TESTDATA / name
    if not p.exists():
        pytest.skip(f"{name} missing")
    data = p.read_bytes()
    # host engine
    comp = z.compress(data, level=6)
    assert zlib.decompress(comp) == data
    # native engine
    from zlib_rs_tpu import native

    if native.available():
        raw = native.deflate_chunk(data, level=6)
        assert zlib.decompress(raw, -15) == data
    # TPU pipeline
    from zlib_rs_tpu.parallel.pipeline import compress_parallel

    pcomp = compress_parallel(data[:262144], level=6, chunk_size=65536)
    assert zlib.decompress(pcomp) == data[:262144]


def test_cve_2018_25032_style_inputs():
    """The CVE's trigger shape: highly-structured input under Z_FIXED-like
    conditions must compress and round-trip without buffer issues."""
    from zlib_rs_tpu.config import Strategy

    data = bytes(range(145)) * 400
    for strat in (Strategy.Default, Strategy.Fixed):
        comp = z.compress(data, level=7, strategy=strat)
        assert zlib.decompress(comp) == data


def test_zlib_ng_cve_fixture_dir():
    d = TESTDATA / "zlib-ng"
    if not d.exists():
        pytest.skip("no zlib-ng fixture dir")
    for p in sorted(d.rglob("*")):
        if not p.is_file():
            continue
        blob = p.read_bytes()
        # these are *inputs to deflate* in the reference's regression; we
        # compress them at several levels and round-trip
        for level in (1, 6, 9):
            comp = z.compress(blob, level=level)
            assert zlib.decompress(comp) == blob


def test_truncated_and_garbage_inputs_error_cleanly():
    good = gzip.compress(b"sane data " * 100)
    for cut in (1, 5, 10, len(good) // 2, len(good) - 1):
        with pytest.raises(DataError):
            z.decompress(good[:cut])
    with pytest.raises(DataError):
        z.decompress(b"\x00" * 64)
