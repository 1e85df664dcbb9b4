"""Property/fuzz-style tests — the counterpart of the reference's 8
libFuzzer targets (SURVEY.md section 4.3), bounded for CI: randomized
round-trips across engines, random flush sequences, random chunk
boundaries, and garbage/truncation robustness."""

import random
import zlib

import pytest

import zlib_rs_tpu as z
from zlib_rs_tpu.config import (
    DeflateConfig,
    DeflateFlush,
    InflateConfig,
    InflateFlush,
    ReturnCode,
    Strategy,
)
from zlib_rs_tpu.models.deflate import Deflator
from zlib_rs_tpu.models.inflate import Inflator

random.seed(0xF00D)


def _random_payload(n: int) -> bytes:
    """Mixed-entropy payload: runs, text, random, back-references."""
    out = bytearray()
    while len(out) < n:
        r = random.random()
        if r < 0.3:
            out.extend(bytes([random.randrange(256)]) * random.randrange(1, 300))
        elif r < 0.6:
            out.extend(b"the quick brown fox %d " % random.randrange(100))
        elif r < 0.8 and out:
            start = random.randrange(len(out))
            out.extend(out[start : start + random.randrange(1, 200)])
        else:
            out.extend(random.randbytes(random.randrange(1, 100)))
    return bytes(out[:n])


def test_fuzz_compress_roundtrip():
    """fuzz/compress.rs analogue: random (data, config) -> round-trip."""
    for _ in range(30):
        n = random.randrange(0, 20000)
        data = _random_payload(n)
        level = random.randrange(0, 10)
        strategy = Strategy(random.randrange(0, 5))
        wb = random.choice([-15, -12, 9, 15, 26, 31])
        comp = z.compress(data, level=level, window_bits=wb, strategy=strategy)
        if wb < 0:
            assert zlib.decompress(comp, wb) == data
        elif wb > 15:
            import gzip

            assert gzip.decompress(comp) == data
        else:
            assert zlib.decompress(comp, wb) == data


def test_fuzz_uncompress_differential():
    """fuzz/uncompress.rs analogue: oracle-produced streams, our decoder."""
    for _ in range(30):
        data = _random_payload(random.randrange(0, 30000))
        level = random.randrange(0, 10)
        comp = zlib.compress(data, level)
        assert z.decompress(comp) == data


def test_fuzz_inflate_chunked():
    """fuzz/inflate_chunked.rs analogue: random resumption boundaries."""
    data = _random_payload(40000)
    comp = zlib.compress(data, 6)
    for _ in range(10):
        inf = Inflator(InflateConfig())
        out = bytearray()
        pos = 0
        while pos < len(comp):
            take = random.randrange(1, 700)
            budget = random.randrange(1, 5000)
            rc, used, o = inf.inflate(comp[pos : pos + take], budget)
            pos += used
            out.extend(o)
            if rc == ReturnCode.StreamEnd:
                break
            assert rc in (ReturnCode.Ok, ReturnCode.BufError, ReturnCode.DataError)
            assert rc != ReturnCode.DataError
            if used == 0 and not o and pos >= len(comp):
                break
        while True:  # drain any budget-limited leftovers
            rc, _, o = inf.inflate(b"", 5000)
            out.extend(o)
            if rc == ReturnCode.StreamEnd or not o:
                break
        assert bytes(out) == data


def test_fuzz_random_garbage_must_error_not_crash():
    """fuzz/uncompress_random_input.rs analogue."""
    from zlib_rs_tpu.models.inflate import DataError

    for _ in range(200):
        blob = random.randbytes(random.randrange(0, 300))
        try:
            z.decompress(blob)
        except DataError:
            pass  # expected for nearly all inputs


def test_fuzz_random_flush_sequences():
    """Random streaming schedules across flush modes stay valid."""
    flushes = [
        DeflateFlush.NO_FLUSH,
        DeflateFlush.SYNC_FLUSH,
        DeflateFlush.FULL_FLUSH,
        DeflateFlush.PARTIAL_FLUSH,
        DeflateFlush.BLOCK,
    ]
    for _ in range(10):
        data = _random_payload(random.randrange(1, 30000))
        d = Deflator(DeflateConfig(level=random.randrange(1, 10)))
        comp = bytearray()
        pos = 0
        while pos < len(data):
            take = random.randrange(1, 4000)
            d.deflate(data[pos : pos + take], random.choice(flushes))
            comp.extend(d.take_output())
            pos += take
        d.deflate(b"", DeflateFlush.FINISH)
        comp.extend(d.take_output())
        assert zlib.decompress(bytes(comp)) == data
        assert z.decompress(bytes(comp)) == data


def test_fuzz_checksum_laws():
    """fuzz/checksum.rs analogue: combine laws on random splits."""
    from zlib_rs_tpu.ops import checksum

    for _ in range(20):
        a = _random_payload(random.randrange(0, 5000))
        b = _random_payload(random.randrange(0, 5000))
        whole_a = checksum.adler32(a + b)
        comb_a = checksum.adler32_combine(checksum.adler32(a), checksum.adler32(b), len(b))
        assert whole_a == comb_a
        whole_c = checksum.crc32(a + b)
        comb_c = checksum.crc32_combine(checksum.crc32(a), checksum.crc32(b), len(b))
        assert whole_c == comb_c
        op = checksum.crc32_combine_gen(len(b))
        assert checksum.crc32_combine_op(checksum.crc32(a), checksum.crc32(b), op) == whole_c


@pytest.mark.skipif(not z.native.available(), reason="no native build")
def test_fuzz_cross_engine_differential():
    """Host and native engines round-trip each other's streams."""
    from zlib_rs_tpu import native

    for _ in range(15):
        data = _random_payload(random.randrange(0, 30000))
        level = random.randrange(0, 10)
        nat = native.deflate_chunk(data, level=level)
        # native stream -> host decoder
        inf = Inflator(InflateConfig(window_bits=-15))
        rc, _, out = inf.inflate(nat, None, InflateFlush.FINISH)
        assert out == data
        # host stream -> native decoder
        d = Deflator(DeflateConfig(level=level, window_bits=-15))
        d.deflate(data, DeflateFlush.FINISH)
        host_raw = d.take_output()
        out2, _ = native.inflate_raw(host_raw, len(data) + 1)
        assert out2 == data
