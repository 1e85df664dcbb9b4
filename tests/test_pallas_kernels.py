"""Pallas kernel tests (interpret mode on the CPU suite; the same kernel
compiles for TPU via adler32_batch_auto's backend dispatch)."""

import zlib

import numpy as np
import pytest
import jax.numpy as jnp

from zlib_rs_tpu.ops.pallas.checksum_kernels import adler32_batch_pallas

rng = np.random.default_rng(123)


@pytest.mark.parametrize("n", [4096, 16384, 131072])
def test_adler_kernel_matches_zlib(n):
    B = 8
    data = rng.integers(0, 256, (B, n), dtype=np.uint8)
    lens = np.array([n, n - 1, n // 2, 1, 0, n - 4095, 4096, n // 3], np.int32)
    for k in range(B):
        data[k, lens[k] :] = 0
    out = np.asarray(
        adler32_batch_pallas(jnp.asarray(data), jnp.asarray(lens), interpret=True)
    )
    for k in range(B):
        assert int(out[k]) == zlib.adler32(bytes(data[k, : lens[k]])), k


def test_adler_kernel_rejects_bad_shapes():
    with pytest.raises(ValueError):
        adler32_batch_pallas(
            jnp.zeros((8, 1000), jnp.uint8), jnp.zeros((8,), jnp.int32), interpret=True
        )
    with pytest.raises(ValueError):
        adler32_batch_pallas(
            jnp.zeros((3, 4096), jnp.uint8), jnp.zeros((3,), jnp.int32), interpret=True
        )


import numpy as np
import zlib as _zlib
import pytest as _pytest


@_pytest.mark.parametrize("tiles", [1, 2, 8])
def test_crc_kernel_matches_zlib(tiles):
    from zlib_rs_tpu.ops.pallas.crc_kernels import crc32_batch_auto, TILE_BYTES

    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, (8, tiles * TILE_BYTES), dtype=np.uint8)
    got = np.asarray(crc32_batch_auto(data))
    want = np.array([_zlib.crc32(r.tobytes()) for r in data], np.uint32)
    assert (got == want).all()


def test_crc_kernel_in_gzip_pipeline():
    import jax

    from zlib_rs_tpu.parallel.pipeline import _crc_batch_best

    rng = np.random.default_rng(8)
    full = rng.integers(0, 256, (3, 131072), dtype=np.uint8)  # pads to 8 rows
    got = np.asarray(_crc_batch_best(full))
    want = np.array([_zlib.crc32(r.tobytes()) for r in full], np.uint32)
    assert (got == want).all()
