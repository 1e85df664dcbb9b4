"""Pallas sequential-inflate kernel (ops/pallas/inflate_kernel.py) in
interpret mode: byte-exact decode of single-block chunk bodies, bad-lane
signalling for malformed input."""

import zlib

import numpy as np
import pytest

from zlib_rs_tpu.parallel.pipeline import compress_parallel
from zlib_rs_tpu.parallel import swarm_inflate as SW

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'


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

def _raw(data, level=6, strategy=zlib.Z_DEFAULT_STRATEGY):
    c = zlib.compressobj(level, zlib.DEFLATED, -15, 9, strategy)
    return c.compress(data) + c.flush()


def test_kernel_decodes_foreign_streams():
    """The kernel is a full RFC 1951 decoder: multi-block zlib-produced
    streams, stored blocks, fixed blocks — no index, no seeds."""
    rng = np.random.default_rng(7)
    datas = [
        open("/bin/bash", "rb").read()[:80_000],          # dynamic, multi-block
        bytes(rng.integers(0, 256, 40_000, dtype=np.uint64).astype(np.uint8)),  # stored
        b"fixed block content " * 50,                      # small
        b"",                                               # empty stream
    ]
    streams = [
        _raw(datas[0]),
        _raw(datas[1], level=0),
        _raw(datas[2], strategy=zlib.Z_FIXED),
        _raw(datas[3]),
    ]
    parts = SW.decode_chunks_kernel(streams, [len(d) for d in datas], interpret=True)
    assert parts == datas


def test_kernel_multiblock_sync_flush():
    """Z_FULL_FLUSH seams produce multiple blocks incl. empty stored ones."""
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    data1, data2 = b"first part " * 300, b"second part " * 300
    s = c.compress(data1) + c.flush(zlib.Z_FULL_FLUSH) + c.compress(data2) + c.flush()
    parts = SW.decode_chunks_kernel([s], [len(data1) + len(data2)], interpret=True)
    assert parts[0] == data1 + data2


def test_kernel_window_priming_regions():
    """zran-style region decode: streams starting mid-deflate with a 32 KiB
    window pre-loaded into the kernel's output head (the round-3 foreign-
    stream capability). Built directly: compress two chunks where the second
    is dictionary-primed, then decode the second standalone with the window."""
    import jax.numpy as jnp

    from zlib_rs_tpu import native
    from zlib_rs_tpu.ops.pallas.inflate_kernel import (
        decode_streams_pallas, pack_streams_words,
    )

    if not native.available():
        pytest.skip("native engine unavailable")
    text = (b"window priming exercises back-references across the seam " * 800)
    a, b = text[:32768], text[32768:65536]
    body_b = native.deflate_chunk(b, level=6, final=True, dictionary=a)
    # sanity: body_b alone is NOT independently decodable (references a)
    with pytest.raises(Exception):
        zlib.decompress(body_b, -15)
    words, bits = pack_streams_words([body_b])
    win = np.zeros((1, 32768), np.uint8)
    win[0] = np.frombuffer(a, np.uint8)
    out, produced, bad, _ = decode_streams_pallas(
        jnp.asarray(words), jnp.zeros((1,), np.int32), jnp.asarray(bits),
        jnp.asarray(np.array([len(b)], np.int32)),
        max_out=32768, win=jnp.asarray(win), interpret=True,
    )
    assert not np.asarray(bad)[0]
    assert int(np.asarray(produced)[0]) == len(b)
    assert np.asarray(out)[0, : len(b)].tobytes() == b


def test_foreign_stream_kernel_engine():
    """decompress_foreign(engine='kernel'): a monolithic stdlib-zlib stream
    is zran-indexed and its regions decode on the Pallas kernel with window
    priming and sub-byte start bits."""
    from zlib_rs_tpu.parallel.inflate import decompress_foreign

    text = open(
        "/root/reference/test-libz-rs-sys/src/test-data/lcet10.txt", "rb"
    ).read()[:120_000]
    z = zlib.compress(text, 6)
    out = decompress_foreign(z, span=24 * 1024, engine="kernel")
    assert out == text
