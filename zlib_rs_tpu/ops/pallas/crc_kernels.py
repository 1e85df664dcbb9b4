"""Pallas TPU kernel for batched crc32: fused GF(2) bit-plane folding.

The XLA path (ops/checksum.crc32_jax) expands each 4-byte word into 32
int8 bit-planes in HBM (a 32x blowup) before the MXU matmul tree. This
kernel keeps the whole pipeline VMEM-resident per tile — byte->word->
bit-plane expansion, the 6-level fold-matrix chain (4096 words -> 1 crc
word contribution), and the per-tile distance-shift — so HBM traffic is
exactly the input bytes plus 32 ints per row.

Matrix chain and shift operators are the same derived GF(2) machinery as
ops/gf2.py (the reference's crc32_combine_gen/op idea, crc32/combine.rs,
applied as the reduction operator); the kernel is the fused engine the
reference gets from PCLMULQDQ folding (crc32/pclmulqdq.rs) — same role,
MXU systolic-array execution instead of carry-less multiply units.

The grid walks (row_group, tile); TPU grids execute sequentially, so the
output block accumulates tile contributions with read-modify-write.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import checksum as C
from .. import gf2

_ROWS = 8
TILE_WORDS = 4096  # words per tile -> 16 KiB of input bytes
TILE_BYTES = TILE_WORDS * 4
_LEVELS = 6  # 4^6 = 4096


@functools.lru_cache(maxsize=None)
def _fold_chain() -> np.ndarray:
    """The 6 fold matrices [6, 128, 32] taking 4096 raw words to one crc
    contribution word (level 0 maps raw words through the byte tables;
    later levels combine f=4 partial crc words with distance shifts)."""
    mats = []
    m = TILE_WORDS
    wpe = 1
    first = True
    while m > 1 or first:
        f = 4
        if first:
            mats.append(C._word_fold0_matrices(f))
            first = False
        else:
            mats.append(C._fold_matrices(f, wpe))
        wpe *= f
        m //= f
    assert len(mats) == _LEVELS, len(mats)
    return np.stack([m.astype(np.int8) for m in mats])


@functools.lru_cache(maxsize=None)
def _tile_shifts(n_tiles: int) -> np.ndarray:
    """[T, 32, 32] int8: shift operator moving tile t's contribution past
    the (n_tiles-1-t)*TILE_BYTES bytes that follow it."""
    out = np.zeros((n_tiles, 32, 32), np.int8)
    for t in range(n_tiles):
        dist = (n_tiles - 1 - t) * TILE_BYTES
        out[t] = gf2.packed_to_planes(gf2.shift_matrix_for_len(dist)).astype(np.int8)
    return out


def _crc_kernel(x_ref, mats_ref, shift_ref, out_ref):
    r = _ROWS
    x = x_ref[:, :].astype(jnp.int32)  # [r, TILE_BYTES]
    w = x.reshape(r, TILE_WORDS, 4)
    words = w[:, :, 0] + (w[:, :, 1] << 8) + (w[:, :, 2] << 16) + (w[:, :, 3] << 24)
    shifts = jax.lax.broadcasted_iota(jnp.int32, (r, TILE_WORDS, 32), 2)
    planes = ((words[:, :, None] >> shifts) & 1).astype(jnp.int8)  # [r, W, 32]

    m = TILE_WORDS
    for level in range(_LEVELS):
        mat = mats_ref[level]  # [128, 32]
        planes = jax.lax.dot_general(
            planes.reshape(r * (m // 4), 4 * 32),
            mat,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        planes = (planes & 1).astype(jnp.int8)
        m //= 4
        planes = planes.reshape(r, m, 32)

    contrib = planes.reshape(r, 32)  # this tile's R-contribution bits
    t = pl.program_id(1)
    shift = shift_ref[0]  # [32, 32] for this tile (blocked on t)
    moved = jax.lax.dot_general(
        contrib, shift, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(t == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    acc = out_ref[:, :]
    acc = acc.at[:, :32].add(moved)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def crc32_batch_pallas(data, *, interpret: bool = False):
    """crc32 of each full row of uint8[B, N]; N must be a multiple of
    TILE_BYTES and B of 8. Ragged tails combine on host via crc32_combine."""
    B, N = data.shape
    if N % TILE_BYTES:
        raise ValueError(f"row length must be a multiple of {TILE_BYTES}")
    if B % _ROWS:
        raise ValueError(f"batch must be a multiple of {_ROWS}")
    T = N // TILE_BYTES
    mats = jnp.asarray(_fold_chain())
    tshift = jnp.asarray(_tile_shifts(T))
    acc = pl.pallas_call(
        _crc_kernel,
        grid=(B // _ROWS, T),
        in_specs=[
            pl.BlockSpec((_ROWS, TILE_BYTES), lambda i, t: (i, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((_LEVELS, 128, 32), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32, 32), lambda i, t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, 128), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        interpret=interpret,
    )(data, mats, tshift)
    r_bits = (acc[:, :32] & 1).astype(jnp.uint32)  # XOR accumulation mod 2

    # finish on device with scalar math: crc = (c0 << 8n) ^ R ^ ~0, with
    # start = 0: c0 = 0xFFFFFFFF shifted past N bytes (a constant matrix)
    shift_n = jnp.asarray(
        gf2.packed_to_planes(gf2.shift_matrix_for_len(N)).astype(np.int8)
    )
    c0_bits = ((jnp.uint32(0xFFFFFFFF) >> jnp.arange(32, dtype=jnp.uint32)) & 1).astype(jnp.int8)
    moved = (
        jnp.matmul(c0_bits[None, :], shift_n, preferred_element_type=jnp.int32)[0] & 1
    ).astype(jnp.uint32)
    out_bits = r_bits ^ moved[None, :]
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
    return jnp.sum(out_bits * weights, axis=1, dtype=jnp.uint32) ^ jnp.uint32(0xFFFFFFFF)


def crc32_batch_auto(data):
    """Pallas on TPU, interpret-mode elsewhere."""
    on_tpu = jax.devices()[0].platform == "tpu"
    return crc32_batch_pallas(data, interpret=not on_tpu)
