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

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'

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


def test_freq_pack_kernel_bit_identical_to_xla_path():
    """The full-kernel encode (freq kernel -> XLA Kraft trees -> pack
    kernel) must produce BIT-IDENTICAL bodies, tree-length arrays, and
    swarm seeds to the XLA positional path given the same scan parse —
    they implement the same freq/tree/packing definitions."""
    import jax
    import jax.numpy as jnp

    from zlib_rs_tpu.ops import dynhuff, lz77
    from zlib_rs_tpu.ops.pallas.deflate_kernel import (
        freq_pack_chunks_pallas, scan_chunks_pallas, scan_from_bytes,
    )

    text = open(
        "/root/reference/test-libz-rs-sys/src/test-data/lcet10.txt", "rb"
    ).read()
    rng = np.random.default_rng(3)
    blob = text[:40000] + rng.integers(0, 256, 8000, dtype=np.uint8).tobytes()
    CH, DICT, PAD = 16384, 4096, lz77.PAD
    B = 3
    L = DICT + CH + PAD
    arr = np.zeros((B, L), np.uint8)
    for k in range(B):
        seg = np.frombuffer(blob[k * CH : (k + 1) * CH], np.uint8)
        arr[k, DICT : DICT + len(seg)] = seg
        d = np.frombuffer(blob[max(0, k * CH - DICT) : k * CH], np.uint8)
        if len(d):
            arr[k, DICT - len(d) : DICT] = d
    ch = jnp.asarray(arr)
    nv = jnp.full((B,), DICT + CH, jnp.int32)
    st = jnp.full((B,), DICT, jnp.int32)
    vf = jnp.zeros((B,), jnp.int32)
    knobs = dict(depth=128, nice=128, good=8, max_lazy=16)

    parse = scan_from_bytes(ch, nv, st, vf, pad=PAD, interpret=True, **knobs)
    w_x, b_x, ll_x, d_x, sb_x, so_x = jax.vmap(
        lambda c, n, t, l, d: dynhuff.encode_chunk_dynamic(
            c, n, start=DICT, n_seeds=4, parse=(t, l, d)
        )
    )(ch, nv, *parse)

    bb = arr.reshape(B, L // 4, 4).astype(np.uint32)
    w4 = jnp.asarray(
        bb[:, :, 0] | (bb[:, :, 1] << 8) | (bb[:, :, 2] << 16) | (bb[:, :, 3] << 24)
    )
    w4 = jnp.concatenate([w4, jnp.zeros((B, 2), jnp.uint32)], axis=1)
    mpos, mld, nm, kbad = scan_chunks_pallas(w4, nv, st, vf, interpret=True, **knobs)
    w_k, b_k, ll_k, d_k, sb_k, so_k, pbad = freq_pack_chunks_pallas(
        ch, nv, st, mpos, mld, jnp.where(kbad, 0, nm), n_seeds=4, interpret=True
    )
    assert not np.asarray(pbad).any()
    assert (np.asarray(b_x) == np.asarray(b_k)).all()
    assert (np.asarray(ll_x) == np.asarray(ll_k)).all()
    assert (np.asarray(d_x) == np.asarray(d_k)).all()
    assert (np.asarray(sb_x) == np.asarray(sb_k)).all()
    assert (np.asarray(so_x) == np.asarray(so_k)).all()
    for k in range(B):
        nb = (int(np.asarray(b_x)[k]) + 7) // 8
        assert np.array_equal(
            np.asarray(w_x[k]).view(np.uint8)[:nb],
            np.asarray(w_k[k]).view(np.uint8)[:nb],
        ), f"lane {k} payload differs"
