"""Pallas sequential LZ scan kernel (ops/pallas/deflate_kernel.py),
interpret mode: the emitted parse must tile the chunk exactly, reference
only in-window history, and round-trip through the dynamic-Huffman
encoder against the zlib oracle."""

import zlib

import numpy as np
import jax.numpy as jnp
import pytest

from zlib_rs_tpu.ops import dynhuff, lz77
from zlib_rs_tpu.ops.pallas.deflate_kernel import lz_scan_pallas
from zlib_rs_tpu.parallel.pipeline import _dyn_header, _splice_bits

CHUNK = 8 * 1024  # interpret mode runs the scalar loop on CPU: keep small


def _scan(data: bytes):
    n = len(data)
    padded = np.zeros(n + lz77.PAD, np.uint8)
    padded[:n] = np.frombuffer(data, np.uint8)
    words = np.asarray(lz77.words_le32(jnp.asarray(padded)))
    tok, length, dist = lz_scan_pallas(
        jnp.asarray(words[None, :]),
        jnp.asarray([n], np.int32),
        jnp.asarray([0], np.int32),
        depth=8, nice=128, interpret=True,
    )
    return padded, np.asarray(tok[0]), np.asarray(length[0]), np.asarray(dist[0])


def _check_tiling(n, tok, length, dist):
    i = 0
    while i < n:
        assert tok[i] == 1, f"gap at {i}"
        step = max(int(length[i]), 1)
        if length[i]:
            assert length[i] >= 3 and 1 <= dist[i] <= i
        i += step
    assert i == n


@pytest.mark.parametrize(
    "data",
    [
        b"the quick brown fox jumps over the lazy dog. " * 150,
        b"a" * 5000 + b"abcd" * 800,
        bytes(np.random.default_rng(3).integers(0, 256, 6000, dtype=np.uint64).astype(np.uint8)),
    ],
)
def test_scan_tiles_and_roundtrips(data):
    data = data[:CHUNK]
    n = len(data)
    padded, tok, length, dist = _scan(data)
    _check_tiling(n, tok, length, dist)
    # verify the parse decodes byte-exactly through the dynamic encoder
    # (encoder position arrays are padded_len - PAD wide)
    npos = padded.shape[0] - lz77.PAD
    parse = (
        jnp.asarray(tok[:npos]),
        jnp.asarray(length[:npos]),
        jnp.asarray(dist[:npos]),
    )
    words, bits, ll, dl = dynhuff.encode_chunk_dynamic(
        jnp.asarray(padded), n, parse=parse
    )
    hdr, hb = _dyn_header(np.asarray(ll), np.asarray(dl), final=True)
    payload = _splice_bits(hdr, hb, np.asarray(words).view(np.uint8), int(bits))
    assert zlib.decompress(payload, -15) == data


def test_pipeline_kernel_scan_roundtrip(monkeypatch):
    """compress_parallel with ZRS_TPU_KERNEL=1 routes matching through the
    SMEM scan kernel (interpret mode off-TPU) and still produces a valid
    zlib stream with the index."""
    monkeypatch.setenv("ZRS_TPU_KERNEL", "1")
    from zlib_rs_tpu.parallel.pipeline import compress_parallel

    rng = np.random.default_rng(11)
    data = (
        b"kernel scan end to end " * 400
        + bytes(rng.integers(0, 200, 9000, dtype=np.uint64).astype(np.uint8))
    )
    out, idx = compress_parallel(data, level=6, chunk_size=16 * 1024, return_index=True)
    assert zlib.decompress(out) == data
    assert len(idx) == 2
