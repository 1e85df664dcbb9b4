"""Checksum known-answer + property tests vs the stdlib zlib oracle.

Mirrors the reference's test strategy for its checksum kernels
(zlib-rs/src/adler32.rs:108-149, crc32.rs:122-258): naive-vs-fast equality,
chunking/combine laws, adversarial lengths.
"""

import zlib

import numpy as np
import pytest

from zlib_rs_tpu.ops import checksum


def rnd(n, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=n, dtype=np.uint8).tobytes()


LENGTHS = [0, 1, 2, 3, 4, 5, 7, 8, 15, 63, 64, 255, 4063, 4064, 4065, 5552, 10_000, 131_072]


@pytest.mark.parametrize("n", LENGTHS)
def test_adler32_matches_zlib(n):
    data = rnd(n, seed=n)
    assert checksum.adler32(data) == zlib.adler32(data)


@pytest.mark.parametrize("n", [0, 1, 100, 5553])
def test_adler32_start_value(n):
    data = rnd(n, seed=n + 1)
    start = zlib.adler32(b"prefix bytes")
    assert checksum.adler32(data, start) == zlib.adler32(data, start)


@pytest.mark.parametrize("n", LENGTHS)
def test_crc32_matches_zlib(n):
    data = rnd(n, seed=n)
    assert checksum.crc32(data) == zlib.crc32(data)


@pytest.mark.parametrize("n", [0, 1, 100, 4097])
def test_crc32_start_value(n):
    data = rnd(n, seed=n + 2)
    start = zlib.crc32(b"prefix bytes")
    assert checksum.crc32(data, start) == zlib.crc32(data, start)


@pytest.mark.parametrize("split", [0, 1, 17, 1000, 4096])
def test_adler32_combine_law(split):
    data = rnd(5000, seed=3)
    a, b = data[:split], data[split:]
    combined = checksum.adler32_combine(zlib.adler32(a), zlib.adler32(b), len(b))
    assert combined == zlib.adler32(data)


@pytest.mark.parametrize("split", [0, 1, 17, 1000, 4096])
def test_crc32_combine_law(split):
    data = rnd(5000, seed=4)
    a, b = data[:split], data[split:]
    combined = checksum.crc32_combine(zlib.crc32(a), zlib.crc32(b), len(b))
    assert combined == zlib.crc32(data)


def test_crc32_combine_gen_op():
    data = rnd(8192, seed=5)
    a, b = data[:4096], data[4096:]
    op = checksum.crc32_combine_gen(4096)
    assert checksum.crc32_combine_op(zlib.crc32(a), zlib.crc32(b), op) == zlib.crc32(data)


def test_streaming_equivalence():
    # feeding in chunks == one shot, via running start values
    data = rnd(30_000, seed=6)
    a_run, c_run = 1, 0
    for ofs in range(0, len(data), 7001):
        chunk = data[ofs : ofs + 7001]
        a_run = checksum.adler32(chunk, a_run)
        c_run = checksum.crc32(chunk, c_run)
    assert a_run == zlib.adler32(data)
    assert c_run == zlib.crc32(data)


# --- device (jit) variants -------------------------------------------------


@pytest.mark.parametrize("n", [0, 1, 5, 64, 4096, 131_072])
def test_adler32_jax(n):
    import jax

    data = rnd(n, seed=n + 10)
    arr = np.frombuffer(data, dtype=np.uint8)
    got = jax.jit(checksum.adler32_jax)(arr)
    assert int(got) == zlib.adler32(data)


@pytest.mark.parametrize("n", [0, 1, 5, 64, 4096, 131_072])
def test_crc32_jax(n):
    import jax

    data = rnd(n, seed=n + 11)
    arr = np.frombuffer(data, dtype=np.uint8)
    got = jax.jit(checksum.crc32_jax)(arr)
    assert int(got) == zlib.crc32(data)


def test_batched_checksums():
    import jax.numpy as jnp

    rows = np.stack([np.frombuffer(rnd(1024, seed=s), np.uint8) for s in range(4)])
    crcs = checksum.crc32_batch_jax(jnp.asarray(rows))
    adlers = checksum.adler32_batch_jax(jnp.asarray(rows))
    for i in range(4):
        assert int(crcs[i]) == zlib.crc32(rows[i].tobytes())
        assert int(adlers[i]) == zlib.adler32(rows[i].tobytes())


def test_batched_adler_ragged():
    import jax.numpy as jnp

    rows = np.zeros((3, 512), np.uint8)
    lens = np.array([512, 100, 0], np.int32)
    for i, ln in enumerate(lens):
        rows[i, :ln] = np.frombuffer(rnd(int(ln), seed=20 + i), np.uint8)
    adlers = checksum.adler32_batch_jax(jnp.asarray(rows), jnp.asarray(lens))
    for i, ln in enumerate(lens):
        assert int(adlers[i]) == zlib.adler32(rows[i, :ln].tobytes())
