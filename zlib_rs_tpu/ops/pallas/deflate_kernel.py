"""Pallas TPU kernel: sequential LZ77 scan (match+parse) of one chunk per
grid step.

The XLA matcher pays ~40 gathered HBM elements per input byte (the
measured ~10ns/element gather tax bounds it at ~1 MB/s/chip). This kernel
runs the classic hash-chain scan — the reference's deflate_fast/slow loop
(zlib-rs/src/deflate/algorithm/fast.rs, slow.rs; longest_match.rs) — as a
scalar loop on the TensorCore with the whole working set VMEM-resident:
the chunk words, a 2^15-entry hash head table, and the prev-chain array.
Unlike the lockstep XLA matcher it EARLY-EXITS chain walks and skips
match interiors exactly like the CPU algorithm, so the work per byte is
the CPU algorithm's, not the vectorized upper bound.

Emits the PARSE directly: tokens[i] = 1 at token starts, with length[i]
(0 for literals) and dist[i]; downstream tree build + packing stay on the
XLA path. Interpret-mode tested on CPU; chip compilation is gated on
tunnel access (callers fall back to the XLA matcher).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HASH_BITS_K = 15
HASH_MULT = 2654435761
MIN_MATCH = 3
MAX_MATCH = 258
MAX_DIST = 32768


def _kernel(
    nvalid_ref, start_ref, depth_ref, nice_ref, words_ref,
    tok_ref, len_ref, dist_ref,
    head_ref, prev_ref,
):
    n_valid = nvalid_ref[0, 0]
    start = start_ref[0, 0]
    depth = depth_ref[0, 0]
    nice = nice_ref[0, 0]

    tok_ref[0, :] = jnp.zeros_like(tok_ref[0, :])
    len_ref[0, :] = jnp.zeros_like(len_ref[0, :])
    dist_ref[0, :] = jnp.zeros_like(dist_ref[0, :])
    head_ref[0, :] = jnp.full_like(head_ref[0, :], -1)

    def hash_at(i):
        w = words_ref[0, i]
        return ((w * jnp.uint32(HASH_MULT)) >> jnp.uint32(32 - HASH_BITS_K)).astype(
            jnp.int32
        )

    def match_len(i, cand, cap):
        def mcond(st):
            k, go = st
            return go & (k < cap)

        def mbody(st):
            k, _go = st
            eq = words_ref[0, i + k] == words_ref[0, cand + k]
            return jnp.where(eq, k + 4, k), eq

        k, _ = lax.while_loop(mcond, mbody, (jnp.int32(0), True))
        k = jnp.minimum(k, cap)
        x = words_ref[0, i + k] ^ words_ref[0, cand + k]
        t0 = (x & 0xFF) == 0
        t1 = t0 & ((x & 0xFFFF) == 0)
        t2 = t1 & ((x & 0xFFFFFF) == 0)
        tail = t0.astype(jnp.int32) + t1.astype(jnp.int32) + t2.astype(jnp.int32)
        return jnp.minimum(k + jnp.where(x == 0, 0, tail), cap)

    def insert(i):
        h = hash_at(i)
        prev_ref[0, i] = head_ref[0, h]
        head_ref[0, h] = i

    def best_match(i, cand0):
        # cand0 is the chain head BEFORE i was inserted (else i matches
        # itself at dist 0 — longest_match.rs looks up before insert too)
        cap = jnp.minimum(n_valid - i, MAX_MATCH)

        def wcond(st):
            cand, d, bl, _bd = st
            return (cand >= 0) & (i - cand <= MAX_DIST) & (d < depth) & (bl < nice)

        def wbody(st):
            cand, d, bl, bd = st
            ml = match_len(i, cand, cap)
            better = ml > bl
            nbl = jnp.where(better, ml, bl)
            nbd = jnp.where(better, i - cand, bd)
            return prev_ref[0, cand], d + 1, nbl, nbd

        _c, _d, bl, bd = lax.while_loop(
            wcond, wbody, (cand0, jnp.int32(0), jnp.int32(0), jnp.int32(0))
        )
        reject = (bl < MIN_MATCH) | ((bl == MIN_MATCH) & (bd > 4096))
        return jnp.where(reject, 0, bl), jnp.where(reject, 0, bd)

    def cond(st):
        i, _pl_, _pd, _avail = st
        return i[0] < n_valid

    def body(st):
        iw, plen, pdist, avail = st
        i = iw[0]
        h = hash_at(i)
        cand0 = head_ref[0, h]
        prev_ref[0, i] = cand0
        head_ref[0, h] = i
        blen, bdist = best_match(i, cand0)

        # one-step lazy (deflate_slow's deferral): a pending match at i-1
        # is emitted unless this position matches strictly longer
        emit_prev = avail & (plen >= blen) & (plen >= MIN_MATCH)

        @pl.when(emit_prev)
        def _():
            tok_ref[0, i - 1] = 1
            len_ref[0, i - 1] = plen
            dist_ref[0, i - 1] = pdist

            def ins(j, _c):
                @pl.when(i + j < n_valid)
                def _():
                    insert(i + j)

                return 0

            # zlib inserts every interior position of an emitted match;
            # i (= match start + 1) was inserted at the top of this step
            lax.fori_loop(1, plen - 1, ins, 0)

        # pending match beaten by a longer one here: i-1 demotes to literal
        @pl.when(jnp.logical_not(emit_prev) & avail)
        def _():
            tok_ref[0, i - 1] = 1

        new_avail = jnp.where(emit_prev, False, blen >= MIN_MATCH)

        # nothing pending and nothing found: literal at i
        @pl.when(jnp.logical_not(emit_prev) & jnp.logical_not(new_avail)
                 & jnp.logical_not(avail))
        def _():
            tok_ref[0, i] = 1

        nxt = jnp.where(emit_prev, i - 1 + plen, i + 1)
        new_plen = jnp.where(new_avail, blen, 0)
        new_pdist = jnp.where(new_avail, bdist, 0)
        return nxt[None], new_plen, new_pdist, new_avail

    iw, plen, pdist, avail = lax.while_loop(
        cond, body, (start[None], jnp.int32(0), jnp.int32(0), False)
    )
    i = iw[0]

    # flush a pending token at i-1
    fits = avail & (plen >= MIN_MATCH) & (i - 1 + plen <= n_valid)

    @pl.when(fits)
    def _():
        tok_ref[0, i - 1] = 1
        len_ref[0, i - 1] = plen
        dist_ref[0, i - 1] = pdist

    @pl.when(avail & jnp.logical_not(fits))
    def _():
        tok_ref[0, i - 1] = 1


@functools.partial(jax.jit, static_argnames=("depth", "nice", "interpret"))
def lz_scan_pallas(words, n_valid, start, *, depth: int, nice: int, interpret: bool = False):
    """Sequential match+parse of B chunks (grid-parallel).

    words: uint32[B, L] LE32 at every byte offset (padded >= MAX_MATCH+8
    past n_valid). Returns (tokens u8[B, L], length i32[B, L],
    dist i32[B, L]) — a greedy/one-step-lazy tokenization whose spans
    tile [start, n_valid) exactly.
    """
    B, L = words.shape
    nv = n_valid.astype(jnp.int32).reshape(B, 1)
    st = start.astype(jnp.int32).reshape(B, 1)
    dp = jnp.full((B, 1), depth, jnp.int32)
    nc = jnp.full((B, 1), nice, jnp.int32)

    tok, length, dist = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L), lambda b: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, L), lambda b: (b, 0)),
            pl.BlockSpec((1, L), lambda b: (b, 0)),
            pl.BlockSpec((1, L), lambda b: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L), jnp.uint8),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, 1 << HASH_BITS_K), jnp.int32),
            pltpu.VMEM((1, L), jnp.int32),
        ],
        interpret=interpret,
    )(nv, st, dp, nc, words)
    return tok, length, dist
