"""Chunk-parallel inflate tests: batched device decode of independent chunk
bodies + pointer-doubling LZ resolution (parallel/inflate.py)."""

import random
import zlib

import numpy as np
import pytest

from zlib_rs_tpu.parallel.inflate import (
    decompress_chunks,
    flat_table,
    parse_block_header,
)
from zlib_rs_tpu.parallel.pipeline import compress_parallel, decompress_parallel
from zlib_rs_tpu.ops import huffman as H

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'

random.seed(21)


def test_flat_table_fixed_tree_decodes_all_codes():
    lut = flat_table(0, H.FIXED_LITLEN_LENGTHS)
    codes_msb, codes_lsb = H.canonical_codes(H.FIXED_LITLEN_LENGTHS)
    for sym in (0, 100, 143, 144, 255, 256, 257, 284, 285):
        l = int(H.FIXED_LITLEN_LENGTHS[sym])
        idx = int(codes_lsb[sym])  # low bits = the code, rest arbitrary (0)
        e = int(lut[idx])
        kind, nb = e >> 28, (e >> 16) & 0x3F
        assert nb == l, sym
        if sym < 256:
            assert kind == 0 and (e & 0xFFFF) == sym
        elif sym == 256:
            assert kind == 2
        else:
            assert kind == 1
            assert (e & 0xFFFF) == int(H.LENGTH_BASE[sym - 257])


def test_parse_block_header_static_and_stored():
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = co.compress(b"abc") + co.flush()
    kind = parse_block_header(raw)
    assert kind[0] == "coded"
    stored = b"\x01\x03\x00\xfc\xff" + b"xyz"
    k = parse_block_header(stored)
    assert k[0] == "stored" and k[2] == b"xyz"


def test_parse_block_header_dynamic_matches_oracle():
    data = b"dynamic header parse test " * 200
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    raw = co.compress(data) + co.flush()
    kind = parse_block_header(raw)
    assert kind[0] == "coded"
    _, final, ll, dd, bit_off = kind
    assert ll[256] > 0  # EOB present
    assert bit_off > 17  # dynamic header is longer than 3+14 bits


@pytest.mark.parametrize("level", [1, 6])
def test_decompress_chunks_roundtrip(level):
    data = open("/bin/sh", "rb").read()[:40000]
    comp, idx = compress_parallel(data, level=level, chunk_size=8192, return_index=True)
    bodies = [comp[o : o + l] for o, l, _ in idx]
    outs = decompress_chunks(bodies, [ol for _, _, ol in idx])
    assert b"".join(outs) == data


def test_decompress_parallel_end_to_end():
    payloads = {
        "text": b"end to end parallel decode " * 500,
        "rand": bytes(random.randrange(256) for _ in range(30000)),
        "runs": b"\x00" * 8000 + b"ab" * 3000,
    }
    for name, data in payloads.items():
        comp, idx = compress_parallel(data, level=6, chunk_size=4096, return_index=True)
        assert decompress_parallel(comp, idx) == data, name


def test_decompress_parallel_detects_corruption():
    data = b"checksum guarded " * 1000
    comp, idx = compress_parallel(data, level=6, chunk_size=4096, return_index=True)
    bad = bytearray(comp)
    bad[-2] ^= 0xFF  # flip adler byte
    with pytest.raises(ValueError):
        decompress_parallel(bytes(bad), idx)


def test_decompress_parallel_gzip_wrapper():
    data = b"gzip wrapped parallel " * 400
    comp, idx = compress_parallel(
        data, level=6, window_bits=31, chunk_size=4096, return_index=True
    )
    assert decompress_parallel(comp, idx) == data


def test_stored_chunks_mixed_with_coded():
    rand = bytes(random.randrange(256) for _ in range(9000))  # stored
    text = b"compressible pattern " * 400  # coded
    data = rand + text
    comp, idx = compress_parallel(data, level=6, chunk_size=4096, return_index=True)
    assert decompress_parallel(comp, idx) == data


def test_native_threaded_parallel_inflate():
    from zlib_rs_tpu import native

    if not native.available():
        pytest.skip("no native build")
    data = open("/bin/sh", "rb").read()
    comp, idx = compress_parallel(data, level=6, chunk_size=32768, return_index=True)
    out = native.inflate_parallel(comp, idx, nthreads=4)
    assert out == data
    # via the public entry point, both engines agree
    assert decompress_parallel(comp, idx, engine="native") == data
    assert decompress_parallel(comp, idx, engine="tpu") == data
