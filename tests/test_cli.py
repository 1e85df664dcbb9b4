"""CLI surface tests: engines, formats, fast modes, stdin/file flows
(the pigz-style entry point mirroring the reference's zpipe/compress
example binaries, SURVEY.md §1-L4/LT)."""

import gzip
import io
import sys
import zlib

import numpy as np
import pytest

from zlib_rs_tpu.cli import main

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'


def _run(argv, data=None, capsys=None, monkeypatch=None):
    if data is not None:
        monkeypatch.setattr(
            sys, "stdin", type("S", (), {"buffer": io.BytesIO(data)})()
        )
    rc = main(argv)
    out = capsys.readouterr()
    return rc, out


DATA = (b"the cli surface mirrors zpipe " * 500) + bytes(
    np.random.default_rng(3).integers(0, 250, 4000, dtype=np.uint64).astype(np.uint8)
)


@pytest.mark.parametrize("engine", ["host", "native", "tpu"])
def test_cli_engines_roundtrip(engine, tmp_path):
    src = tmp_path / f"in_{engine}.bin"
    src.write_bytes(DATA)
    rc = main(["-k", "--engine", engine, "--level", "6", str(src)])
    assert rc == 0
    blob = (tmp_path / f"in_{engine}.bin.gz").read_bytes()
    assert gzip.decompress(blob) == DATA


@pytest.mark.parametrize("fmt,decode", [
    ("gzip", gzip.decompress),
    ("zlib", zlib.decompress),
    ("raw", lambda b: zlib.decompress(b, -15)),
])
def test_cli_formats(fmt, decode, tmp_path):
    src = tmp_path / "in.bin"
    src.write_bytes(DATA)
    suffix = {"gzip": ".gz", "zlib": ".zz", "raw": ".raw"}[fmt]
    rc = main(["-k", "-f", "--format", fmt, "--suffix", suffix, str(src)])
    assert rc == 0
    assert decode((tmp_path / ("in.bin" + suffix)).read_bytes()) == DATA


@pytest.mark.parametrize("flag", ["--quick", "--medium"])
def test_cli_fast_modes(flag, tmp_path):
    from zlib_rs_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")
    src = tmp_path / "in.bin"
    src.write_bytes(DATA)
    rc = main(["-k", "-f", flag, str(src)])
    assert rc == 0
    assert gzip.decompress((tmp_path / "in.bin.gz").read_bytes()) == DATA


def test_cli_decompress_multi_engine(tmp_path):
    src = tmp_path / "in.gz"
    src.write_bytes(gzip.compress(DATA, 6))
    rc = main(["-d", "-k", str(src)])
    assert rc == 0
    assert (tmp_path / "in").read_bytes() == DATA


def test_cli_threaded_parallel(tmp_path):
    from zlib_rs_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")
    big = DATA * 40
    src = tmp_path / "big.bin"
    src.write_bytes(big)
    rc = main(["-k", "-f", "--engine", "native", "-p", "4",
               "--chunk", "65536", str(src)])
    assert rc == 0
    assert gzip.decompress((tmp_path / "big.bin.gz").read_bytes()) == big
