"""gz file API tests — counterpart of the reference's gz.rs differential
suite (test-libz-rs-sys/src/gz.rs, 39 tests with tempfile)."""

import gzip
import io
import os
import zlib

import pytest

from zlib_rs_tpu.config import ReturnCode
from zlib_rs_tpu.models.gzfile import GzError, GzFile, gzopen

DATA = b"gz file layer test payload\n" * 500


def test_write_then_stdlib_reads(tmp_path):
    p = tmp_path / "x.gz"
    with gzopen(p, "wb6") as f:
        assert f.write(DATA) == len(DATA)
    assert gzip.decompress(p.read_bytes()) == DATA


def test_stdlib_writes_then_we_read(tmp_path):
    p = tmp_path / "x.gz"
    p.write_bytes(gzip.compress(DATA))
    with gzopen(p, "rb") as f:
        assert f.read() == DATA
        assert f.eof()
        assert not f.direct()


def test_roundtrip_chunked_read(tmp_path):
    p = tmp_path / "x.gz"
    with gzopen(p, "wb") as f:
        f.write(DATA)
    with gzopen(p, "rb") as f:
        out = bytearray()
        while True:
            chunk = f.read(97)
            if not chunk:
                break
            out.extend(chunk)
        assert bytes(out) == DATA


def test_multi_member(tmp_path):
    p = tmp_path / "multi.gz"
    p.write_bytes(gzip.compress(b"first ") + gzip.compress(b"second"))
    with gzopen(p, "rb") as f:
        assert f.read() == b"first second"


def test_append_mode_creates_second_member(tmp_path):
    p = tmp_path / "a.gz"
    with gzopen(p, "wb") as f:
        f.write(b"hello ")
    with gzopen(p, "ab") as f:
        f.write(b"world")
    with gzopen(p, "rb") as f:
        assert f.read() == b"hello world"


def test_transparent_read(tmp_path):
    p = tmp_path / "plain.txt"
    p.write_bytes(b"not gzip at all")
    with gzopen(p, "rb") as f:
        assert f.direct()
        assert f.read() == b"not gzip at all"


def test_transparent_write(tmp_path):
    p = tmp_path / "plain.out"
    with gzopen(p, "wbT") as f:
        f.write(b"raw bytes")
    assert p.read_bytes() == b"raw bytes"


def test_tell_seek_forward_backward(tmp_path):
    p = tmp_path / "x.gz"
    with gzopen(p, "wb") as f:
        f.write(DATA)
    with gzopen(p, "rb") as f:
        assert f.tell() == 0
        f.read(100)
        assert f.tell() == 100
        f.seek(5000)
        assert f.tell() == 5000
        assert f.read(10) == DATA[5000:5010]
        f.seek(50)  # backward: rewind + skip
        assert f.read(10) == DATA[50:60]
        f.seek(25, io.SEEK_CUR)
        assert f.read(5) == DATA[85:90]


def test_write_seek_pads_zeros(tmp_path):
    p = tmp_path / "x.gz"
    with gzopen(p, "wb") as f:
        f.write(b"abc")
        f.seek(10)
        f.write(b"xyz")
    assert gzip.decompress(p.read_bytes()) == b"abc" + b"\x00" * 7 + b"xyz"


def test_rewind(tmp_path):
    p = tmp_path / "x.gz"
    with gzopen(p, "wb") as f:
        f.write(DATA)
    with gzopen(p, "rb") as f:
        first = f.read(100)
        f.rewind()
        assert f.read(100) == first


def test_getc_ungetc_gets(tmp_path):
    p = tmp_path / "x.gz"
    with gzopen(p, "wb") as f:
        f.puts("line one\nline two\n")
    with gzopen(p, "rb") as f:
        c = f.getc()
        assert c == ord("l")
        assert f.ungetc(c) == c
        assert f.gets() == b"line one\n"
        assert f.gets() == b"line two\n"
        assert f.gets() == b""
        assert f.getc() == -1


def test_printf_putc(tmp_path):
    p = tmp_path / "x.gz"
    with gzopen(p, "wb") as f:
        f.printf("n=%d s=%s ", 42, "str")
        f.putc(ord("!"))
    with gzopen(p, "rb") as f:
        assert f.read() == b"n=42 s=str !"


def test_flush_sync_makes_prefix_decodable(tmp_path):
    p = tmp_path / "x.gz"
    f = gzopen(p, "wb")
    f.write(b"partial data")
    f.flush()
    # without closing, the file must already decode the written prefix
    d = zlib.decompressobj(wbits=31)
    assert d.decompress(p.read_bytes()) == b"partial data"
    f.close()


def test_error_surface(tmp_path):
    p = tmp_path / "bad.gz"
    p.write_bytes(b"\x1f\x8b\x08\x00" + b"\xff" * 40)
    with gzopen(p, "rb") as f:
        with pytest.raises(GzError) as ei:
            f.read()
        assert ei.value.return_code == ReturnCode.DataError
        assert f.error()[0] == ReturnCode.DataError
        f.clear_error()
        assert f.error() == (ReturnCode.Ok, "")


def test_mode_parsing_levels_and_strategies(tmp_path):
    for mode in ("wb1", "wb9", "wbf", "wbh", "wbR", "wbF"):
        p = tmp_path / f"m{mode}.gz"
        with gzopen(p, mode) as f:
            f.write(DATA[:1000])
        assert gzip.decompress(p.read_bytes()) == DATA[:1000]
    with pytest.raises(GzError):
        gzopen(tmp_path / "x", "rb+")


def test_fileobj_support():
    bio = io.BytesIO()
    f = GzFile(fileobj=bio, mode="wb")
    f.write(DATA)
    f.close()
    assert gzip.decompress(bio.getvalue()) == DATA
    bio.seek(0)
    f = GzFile(fileobj=bio, mode="rb")
    assert f.read() == DATA


def test_buffer_size_variants(tmp_path):
    p = tmp_path / "x.gz"
    with gzopen(p, "wb") as f:
        f.write(DATA)
    with gzopen(p, "rb", buffer_size=16) as f:
        assert f.read() == DATA


def test_set_params_mid_file(tmp_path):
    from zlib_rs_tpu.config import Strategy

    p = tmp_path / "x.gz"
    with gzopen(p, "wb1") as f:
        f.write(DATA[: len(DATA) // 2])
        f.set_params(9, Strategy.Default)
        f.write(DATA[len(DATA) // 2 :])
    assert gzip.decompress(p.read_bytes()) == DATA


def test_gzfread_gzfwrite_item_semantics(tmp_path):
    # reference: gz.rs:1029 gzfread / :1586 gzfwrite item-count semantics
    from zlib_rs_tpu.models.gzfile import GzFile

    p = tmp_path / "items.gz"
    payload = bytes(range(256)) * 10  # 2560 bytes = 256 items of 10
    g = GzFile(p, "wb6")
    # only whole items are written: 2560//7 = 365 items -> 2555 bytes
    assert g.fwrite(payload, 7, 1000) == 365
    # size*nitems larger than data: clamps to whole items from data
    assert g.fwrite(b"abcdefgh", 3, 5) == 2  # writes 6 of 8 bytes
    g.close()

    g = GzFile(p, "rb")
    first = g.fread(7, 365)
    assert first == payload[: 365 * 7]
    rest = g.fread(4, 100)  # only 6 bytes left -> 1 full item + partial
    assert rest == b"abcdef"
    assert len(rest) // 4 == 1
    assert g.fread(4, 4) == b""
    assert g.fread(0, 9) == b"" and g.fread(9, 0) == b""
    g.close()
