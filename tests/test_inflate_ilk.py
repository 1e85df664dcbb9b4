"""Interleaved Pallas inflate kernel (ops/pallas/inflate_ilk.py): byte-exact
vs the stdlib zlib oracle in interpret mode, including multi-block streams,
stored blocks, corruption (must flag bad, not hang), and padding lanes.

Mirrors the reference's differential strategy (zlib-ng as oracle,
test-libz-rs-sys/src/end_to_end.rs) for the K-interleaved decode engine.
"""

import zlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from experiments.inflate_ilk import decode_streams_ilk  # noqa: E402
from zlib_rs_tpu.ops.pallas.inflate_kernel import pack_streams_words  # noqa: E402

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'

TEXT = (
    b"The interleaved kernel advances K independent bitstreams per loop "
    b"iteration so their dependent SMEM loads overlap. " * 200
)


def _deflate(data, level=6):
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    return co.compress(data) + co.flush()


def _run(bodies, out_lens, max_out, k=4):
    B = len(bodies)
    pad = (-B) % k
    bodies = bodies + [b""] * pad
    out_lens = list(out_lens) + [0] * pad
    words, bits = pack_streams_words(bodies)
    out, produced, bad, endbit = decode_streams_ilk(
        jnp.asarray(words),
        jnp.zeros((B + pad,), jnp.int32),
        jnp.asarray(bits),
        jnp.asarray(np.asarray(out_lens, np.int32)),
        max_out=max_out,
        k_streams=k,
        interpret=True,
    )
    return (
        np.asarray(out)[:B],
        np.asarray(produced)[:B],
        np.asarray(bad)[:B],
        np.asarray(endbit)[:B],
    )


def test_mixed_payloads_byte_exact():
    rng = np.random.default_rng(7)
    cases = [
        (TEXT[:8000], 6),
        (rng.integers(0, 256, 5000, dtype=np.uint8).tobytes(), 6),  # stored-ish
        (b"a" * 4000, 9),       # dist-1 runs
        (b"ab" * 2000, 1),      # dist-2
        (b"abcde" * 900, 6),    # dist-5 word copies
        (TEXT[:4096], 0),       # stored blocks
        (b"x", 6),              # tiny
        (rng.integers(0, 8, 6000, dtype=np.uint8).tobytes(), 9),
    ]
    bodies = [_deflate(d, lvl) for d, lvl in cases]
    out, produced, bad, _ = _run(bodies, [len(d) for d, _ in cases], 8192)
    for k, (d, _lvl) in enumerate(cases):
        assert not bad[k], f"lane {k} flagged bad"
        assert produced[k] == len(d)
        assert out[k, : len(d)].tobytes() == d


def test_multi_block_stream():
    # big enough that zlib emits several dynamic blocks in one stream
    rng = np.random.default_rng(3)
    pieces = [TEXT[:20000], rng.integers(0, 64, 20000, dtype=np.uint8).tobytes(),
              b"z" * 15000]
    data = b"".join(pieces)[:50000]
    body = _deflate(data, 6)
    out, produced, bad, _ = _run([body], [len(data)], 65536, k=4)
    assert not bad[0]
    assert out[0, : len(data)].tobytes() == data


def test_k_grouping_variants():
    # K=8 fails to COMPILE on chip (register pressure) and this kernel is a
    # preserved negative result — keep the interpret matrix lean
    datas = [TEXT[: 600 + 317 * i] for i in range(4)]
    bodies = [_deflate(d) for d in datas]
    for k in (2, 4):
        out, produced, bad, _ = _run(bodies, [len(d) for d in datas], 4096, k=k)
        for i, d in enumerate(datas):
            assert not bad[i]
            assert out[i, : len(d)].tobytes() == d


def test_corruption_flags_bad_without_hanging():
    good = _deflate(TEXT[:4000])
    variants = []
    b = bytearray(good)
    b[0] ^= 0x07  # mangle first block header
    variants.append(bytes(b))
    b = bytearray(good)
    b[len(b) // 2] ^= 0xFF  # mid-stream corruption
    variants.append(bytes(b))
    variants.append(good[: len(good) // 2])  # truncated
    variants.append(b"\xff" * 64)  # garbage
    out, produced, bad, _ = _run(variants, [4000] * 4, 8192)
    # every lane must terminate; wrong output length or bad flag must show
    for k in range(4):
        assert bad[k] or produced[k] != 4000 or out[k, :4000].tobytes() != TEXT[:4000]


def test_bad_lane_does_not_poison_neighbors():
    datas = [TEXT[:3000], TEXT[1000:6000], TEXT[2000:2500]]
    bodies = [_deflate(d) for d in datas]
    corrupt = bytearray(bodies[1])
    corrupt[10] ^= 0x55
    bodies_c = [bodies[0], bytes(corrupt), bodies[2], b""]
    out, produced, bad, _ = _run(
        bodies_c, [len(datas[0]), len(datas[1]), len(datas[2]), 0], 8192
    )
    assert not bad[0] and out[0, : len(datas[0])].tobytes() == datas[0]
    assert not bad[2] and out[2, : len(datas[2])].tobytes() == datas[2]
    assert bad[1] or out[1, : len(datas[1])].tobytes() != datas[1]


def test_agrees_with_single_stream_kernel():
    from zlib_rs_tpu.ops.pallas.inflate_kernel import decode_streams_pallas

    datas = [TEXT[:5000], b"q" * 2048, TEXT[3000:7096], TEXT[:1]]
    bodies = [_deflate(d) for d in datas]
    words, bits = pack_streams_words(bodies)
    B = len(bodies)
    lens = jnp.asarray(np.asarray([len(d) for d in datas], np.int32))
    o1, p1, b1, e1 = decode_streams_pallas(
        jnp.asarray(words), jnp.zeros((B,), jnp.int32), jnp.asarray(bits),
        lens, max_out=8192, interpret=True,
    )
    o2, p2, b2, e2 = _run(bodies, [len(d) for d in datas], 8192)
    assert not np.asarray(b1).any() and not b2.any()
    assert (np.asarray(p1) == p2).all()
    assert (np.asarray(e1) == e2).all()
    assert (np.asarray(o1) == o2).all()
