"""Pallas TPU kernels for the checksum hot path.

The adler32 batch kernel keeps chunk rows VMEM-resident and computes both
modular sums in one pass (the fused read_buf_window+checksum idea from the
reference, deflate.rs:1668-1707, as an on-chip kernel): grid over the chunk
batch in groups of 8 rows (the TPU sublane tile), blocked uint32
accumulation with per-block mod reduction so nothing overflows.

Falls back to interpret mode off-TPU (the reference's scalar-fallback
dispatch pattern, cpu_features.rs:30-61, at the backend boundary).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ADLER_BASE = 65521
_BLK = 4096  # block reduction width (all intermediate sums fit uint32)
_ROWS = 8  # rows per grid program (sublane tile)


def _adler_rows(x, lens):
    """(a, b) adler parts of `r` zero-padded rows with true lengths.

    All math in int32 (Mosaic has no unsigned reductions); overflow-safe:
    per-element products (d*w < 2^24) reduce mod BASE before the 4096-wide
    block sum (< 2^28) and the cross-block sum (< 2^22)."""
    r, n = x.shape
    nb = n // _BLK
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (r, nb, _BLK), 1) * _BLK
        + jax.lax.broadcasted_iota(jnp.int32, (r, nb, _BLK), 2)
    )
    db = x.reshape(r, nb, _BLK).astype(jnp.int32)
    ln = lens.reshape(r, 1, 1)
    live = idx < ln
    db = jnp.where(live, db, 0)
    w = jnp.where(live, (ln - idx) % ADLER_BASE, 0)

    s_b = jnp.sum(db, axis=2, dtype=jnp.int32) % ADLER_BASE
    pw = (db * w) % ADLER_BASE
    w_b = jnp.sum(pw, axis=2, dtype=jnp.int32) % ADLER_BASE

    a = (1 + jnp.sum(s_b, axis=1, dtype=jnp.int32)) % ADLER_BASE
    b = (lens % ADLER_BASE + jnp.sum(w_b, axis=1, dtype=jnp.int32)) % ADLER_BASE
    return a, b


def _adler_kernel(x_ref, len_ref, out_ref):
    """One grid program per 8-row group, rows resident in VMEM. Lens and
    results travel as 128-lane VMEM tiles (SMEM refs only allow scalar
    loads on TPU)."""
    a, b = _adler_rows(x_ref[:, :], len_ref[:, 0])
    lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[:, :] = jnp.where(lane == 0, a[:, None], b[:, None])


@functools.partial(jax.jit, static_argnames=("interpret",))
def adler32_batch_pallas(data, lens, *, interpret: bool = False):
    """adler32 of each row of uint8[B, N] (N a multiple of 4096, B of 8)
    with true lengths `lens` (rows zero-padded past their length)."""
    B, N = data.shape
    if N % _BLK:
        raise ValueError(f"row length must be a multiple of {_BLK}")
    if B % _ROWS:
        raise ValueError(f"batch must be a multiple of {_ROWS}")
    lens_tile = jnp.broadcast_to(
        lens.astype(jnp.int32)[:, None], (B, 128)
    )
    out = pl.pallas_call(
        _adler_kernel,
        grid=(B // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        interpret=interpret,
    )(data, lens_tile)
    a = out[:, 0].astype(jnp.uint32)
    b = out[:, 1].astype(jnp.uint32)
    return (b << jnp.uint32(16)) | a


def adler32_batch_auto(data, lens):
    """Pallas on TPU, interpret-mode elsewhere (runtime dispatch in the
    spirit of the reference's CPU-feature probe)."""
    on_tpu = jax.devices()[0].platform == "tpu"
    return adler32_batch_pallas(data, lens, interpret=not on_tpu)
