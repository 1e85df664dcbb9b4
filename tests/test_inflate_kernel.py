"""Pallas sequential-inflate kernel (ops/pallas/inflate_kernel.py) in
interpret mode: byte-exact decode of single-block chunk bodies, bad-lane
signalling for malformed input."""

import zlib

import numpy as np
import pytest

from zlib_rs_tpu.parallel.pipeline import compress_parallel
from zlib_rs_tpu.parallel import swarm_inflate as SW


def _bodies(data, chunk=64 * 1024, level=6):
    out, idx = compress_parallel(data, level=level, chunk_size=chunk, return_index=True)
    assert zlib.decompress(out) == data
    bodies = [out[o : o + l] for o, l, _ in idx]
    outs = [ol for _, _, ol in idx]
    return bodies, outs


def test_kernel_decode_text_and_binary():
    rng = np.random.default_rng(21)
    data = (
        open("/bin/bash", "rb").read()[:150_000]
        + b"the quick brown fox " * 2000
        + bytes(rng.integers(0, 64, 30_000, dtype=np.uint64).astype(np.uint8))
    )
    bodies, outs = _bodies(data)
    parts = SW.decode_chunks_kernel(bodies, outs, interpret=True)
    assert b"".join(parts) == data


def test_kernel_decode_runs():
    data = b"a" * 100_000 + b"xyxy" * 10_000
    bodies, outs = _bodies(data, chunk=128 * 1024)
    parts = SW.decode_chunks_kernel(bodies, outs, interpret=True)
    assert b"".join(parts) == data


def test_kernel_rejects_garbage():
    data = b"hello world " * 5000
    bodies, outs = _bodies(data, chunk=128 * 1024)
    corrupt = bytearray(bodies[0])
    corrupt[len(corrupt) // 2 :] = bytes(len(corrupt) - len(corrupt) // 2)
    with pytest.raises(ValueError):
        SW.decode_chunks_kernel([bytes(corrupt)], [outs[0]], interpret=True)
