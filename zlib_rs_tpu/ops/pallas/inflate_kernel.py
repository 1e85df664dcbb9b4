"""Pallas TPU kernel: sequential inflate of one coded block per grid step.

The XLA decode engines are bound by the measured ~10ns-per-element gather
tax (HBM random access): the swarm engine's floor is ~5 gathered elements
per symbol. This kernel moves the whole per-chunk decode loop INTO the
TensorCore with every operand VMEM-resident — compressed words, the flat
15-bit decode LUTs, the output window — so each symbol costs a handful of
VMEM scalar accesses (a few cycles each) instead of HBM gathers. It is
the reference's inflate_fast hot loop (zlib-rs/src/inflate.rs:1885-2163)
re-homed onto the TPU core with VMEM as the working set: chunks are the
parallel axis (grid), the bitstream stays serial per chunk exactly as the
format demands.

Scope: one fully-coded deflate block body per lane (our pipeline's chunk
format; also any zran region that starts at a block boundary). Tables are
built OUTSIDE the kernel (device_inflate._build_flat_lut); stored blocks
and multi-block bodies take the exact lockstep/swarm engines instead.

The kernel is correctness-tested in interpret mode on CPU (tests) and
compiled for TPU when available; callers must treat a truthy `bad` lane
as "fall back to an exact engine".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLAT_BITS = 15
KIND_LIT = 0
KIND_MATCH = 1
KIND_EOB = 2
MASK15 = (1 << FLAT_BITS) - 1


def _kernel(startbit_ref, outlen_ref, words_ref, ll_ref, d_ref, out_ref, st_ref):
    start = startbit_ref[0, 0]
    out_len = outlen_ref[0, 0]
    max_out = out_ref.shape[1]

    def peek64(bitpos):
        byte = bitpos >> 3
        sh = (bitpos & 7).astype(jnp.uint32)
        w0 = words_ref[0, byte]
        w1 = words_ref[0, byte + 4]
        w2 = words_ref[0, byte + 8]
        lo = jnp.where(sh > 0, (w0 >> sh) | (w1 << (jnp.uint32(32) - sh)), w0)
        hi = jnp.where(sh > 0, (w1 >> sh) | (w2 << (jnp.uint32(32) - sh)), w1)
        return lo, hi

    def cond(state):
        _bitpos, _outpos, bad, done = state
        return jnp.logical_not(done | bad)

    def body(state):
        bitpos, outpos, bad, done = state
        lo, hi = peek64(bitpos)
        e = ll_ref[0, (lo & MASK15).astype(jnp.int32)]
        kind = (e >> 28).astype(jnp.int32)
        aux = ((e >> 22) & 0x3F).astype(jnp.uint32)
        nb = ((e >> 16) & 0x3F).astype(jnp.uint32)
        payload = (e & 0xFFFF).astype(jnp.int32)

        is_lit = kind == KIND_LIT
        is_eob = kind == KIND_EOB
        is_match = kind == KIND_MATCH

        @pl.when(is_lit)
        def _():
            out_ref[0, outpos] = payload.astype(jnp.uint8)

        # match: length + distance from the same 56-bit window
        win1 = (lo >> nb) | jnp.where(nb > 0, hi << (jnp.uint32(32) - nb), 0)
        extra = (win1 & ((jnp.uint32(1) << aux) - 1)).astype(jnp.int32)
        length = payload + extra
        p2 = nb + aux
        win2 = (lo >> p2) | jnp.where(p2 > 0, hi << (jnp.uint32(32) - p2), 0)
        de = d_ref[0, (win2 & MASK15).astype(jnp.int32)]
        dkind = (de >> 28).astype(jnp.int32)
        daux = ((de >> 22) & 0x3F).astype(jnp.uint32)
        dnb = ((de >> 16) & 0x3F).astype(jnp.uint32)
        dpayload = (de & 0xFFFF).astype(jnp.int32)
        dextra = ((win2 >> dnb) & ((jnp.uint32(1) << daux) - 1)).astype(jnp.int32)
        dist = dpayload + dextra

        match_ok = (
            is_match
            & (dkind == KIND_MATCH)
            & (dist <= outpos)
            & (outpos + length <= max_out)
        )

        @pl.when(match_ok)
        def _():
            def copy(j, _):
                out_ref[0, outpos + j] = out_ref[0, outpos + j - dist]
                return 0

            lax.fori_loop(0, length, copy, 0, unroll=False)

        adv = jnp.where(
            is_lit, nb, jnp.where(is_match, nb + aux + dnb + daux, nb)
        ).astype(jnp.int32)
        produced = jnp.where(is_lit, 1, jnp.where(match_ok, length, 0))
        new_bad = (
            bad
            | (is_match & jnp.logical_not(match_ok))
            | (jnp.logical_not(is_lit | is_match | is_eob))
            | (is_eob & (outpos < out_len))
        )
        new_out = outpos + produced
        new_done = done | is_eob | (new_out >= out_len)
        return bitpos + adv, new_out, new_bad, new_done

    bitpos, outpos, bad, _done = lax.while_loop(
        cond, body, (start, jnp.int32(0), False, False)
    )
    st_ref[0, 0] = outpos
    st_ref[0, 1] = bad.astype(jnp.int32)
    st_ref[0, 2] = bitpos
    st_ref[0, 3] = 0


@functools.partial(jax.jit, static_argnames=("max_out", "interpret"))
def decode_blocks_pallas(
    words, ll_lut, d_lut, start_bits, out_lens, *, max_out: int, interpret: bool = False
):
    """Decode B single-block bodies sequentially-in-VMEM, chunk-parallel
    over the grid.

    words: uint32[B, L] little-endian 32-bit load at every byte offset
    (zero-padded >= 12 past each body); ll_lut/d_lut: uint32[B, 2^15] flat
    decode LUTs; start_bits: first symbol bit; out_lens: exact output
    sizes. Returns (out uint8[B, max_out], produced int32[B], bad bool[B]).
    """
    B, L = words.shape
    out, st = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L), lambda b: (b, 0)),
            pl.BlockSpec((1, 1 << FLAT_BITS), lambda b: (b, 0)),
            pl.BlockSpec((1, 1 << FLAT_BITS), lambda b: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, max_out), lambda b: (b, 0)),
            pl.BlockSpec((1, 4), lambda b: (b, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, max_out), jnp.uint8),
            jax.ShapeDtypeStruct((B, 4), jnp.int32),
        ],
        interpret=interpret,
    )(
        start_bits.astype(jnp.int32).reshape(B, 1),
        out_lens.astype(jnp.int32).reshape(B, 1),
        words,
        ll_lut,
        d_lut,
    )
    produced = st[:, 0]
    bad = st[:, 1] > 0
    return out, produced, bad
