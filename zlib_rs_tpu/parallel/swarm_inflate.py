"""Swarm device inflate: seed-parallel exact Huffman decode on TPU.

The turbo prototype (experiments/turbo_inflate.py, demoted r4) breaks DEFLATE's serial bit dependency
by decoding at EVERY bit position and composing a jump table — ~22 random
accesses per compressed BIT, which the measured ~10ns/element TPU gather
cost turns into ~0.07 MB/s/chip. This engine removes the speculation
entirely for streams our own pipeline produced: the ENCODER already knows
every token's bit offset, so compress_parallel records (bit, out) decode
seeds every ~few-KiB of output in the chunk index
(ops/dynhuff.encode_chunk_dynamic n_seeds). Decode then runs one exact
walker per seed:

  * the block header is parsed on HOST (a few hundred bits per 128 KiB
    chunk) and the per-chunk code-length arrays are uploaded; the flat
    15-bit LUTs are built on device (device_inflate._build_flat_lut);
  * B x S walkers run in lockstep, each decoding one symbol per loop
    iteration from its own bit cursor: 3 word gathers assemble a 56-bit
    window, 2 LUT gathers decode litlen+dist — 5 random elements per
    SYMBOL (vs per bit), the measured TPU decode floor;
  * walker tokens land in a dense [walkers, iter] tape via column
    dynamic_update_slice (no scatters); each walker stops when it has
    covered exactly its seed span, and must land exactly on the next seed
    (checked — any drift flags the lane bad and the caller falls back to
    an exact engine);
  * the token tape feeds the same pointer-doubling LZ resolver as the
    other device engines (device_inflate.resolve_tokens).

This is the TPU realization of the reference's random-access seam hooks
(inflateSync/inflateMark, SURVEY.md §2e) taken to their limit: seams every
few KiB, recorded for free at encode time.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .device_inflate import (
    FLAT_BITS,
    KIND_EOB,
    KIND_INVALID,
    KIND_LIT,
    KIND_MATCH,
    TOK_LIT,
    TOK_MATCH,
    TOK_NULL,
    _REV15_NP,
    _build_flat_lut,
    _d_symbol_fields,
    _ll_symbol_fields,
    resolve_tokens,
)
from ..ops import huffman as H

SEEDS_PER_CHUNK = 128  # ~1 KiB pieces at 128 KiB chunks: more walkers per
# lockstep op (amortizes the ~0.2-1ms per-op dispatch overhead) and a
# shorter loop bound; the seeds live in the index, not the stream, so the
# compression ratio is unaffected (~1 KiB of index metadata per chunk)

_CL_ORDER_NP = np.array(
    [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15], np.int64
)
_FIXED_LL = np.concatenate(
    [np.full(144, 8), np.full(112, 9), np.full(24, 7), np.full(8, 8)]
).astype(np.int32)
_FIXED_D = np.full(30, 5, np.int32)


class _HostBits:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[(self.pos + i) >> 3] if (self.pos + i) >> 3 < len(self.data) else 0
            v |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos += n
        return v


def parse_block_header(body: bytes):
    """Host parse of one deflate block header.

    Returns (btype, ll_lens int32[320], d_lens int32[320], header_bits) or
    None for stored blocks / malformed headers. A few hundred bits of
    host work per chunk; the symbol stream stays on device.
    """
    br = _HostBits(body)
    _bfinal = br.take(1)
    btype = br.take(2)
    if btype == 1:
        ll = np.zeros(320, np.int32)
        ll[:288] = _FIXED_LL
        d = np.zeros(320, np.int32)
        d[:30] = _FIXED_D
        return btype, ll, d, br.pos
    if btype != 2:
        return None
    hlit = br.take(5) + 257
    hdist = br.take(5) + 1
    hclen = br.take(4) + 4
    if hlit > 286:
        return None
    cl_lens = np.zeros(19, np.int64)
    for i in range(hclen):
        cl_lens[_CL_ORDER_NP[i]] = br.take(3)
    try:
        _, cl_codes = H.canonical_codes(cl_lens)
    except ValueError:  # over/under-subscribed code-length tree
        return None
    # decode table for the 7-bit code-length alphabet, host-side
    lut = {}
    for sym in range(19):
        ln = int(cl_lens[sym])
        if ln:
            lut[(int(cl_codes[sym]), ln)] = sym
    lens = np.zeros(320, np.int32)
    have = 0
    prev = 0
    while have < hlit + hdist:
        code = 0
        ln = 0
        while ln < 15:
            code |= br.take(1) << ln
            ln += 1
            if (code, ln) in lut:
                break
        else:
            return None
        sym = lut[(code, ln)]
        if sym < 16:
            lens[have] = sym
            prev = sym
            have += 1
        elif sym == 16:
            rep = 3 + br.take(2)
            lens[have : have + rep] = prev
            have += rep
        elif sym == 17:
            rep = 3 + br.take(3)
            have += rep
        else:
            rep = 11 + br.take(7)
            have += rep
        if have > hlit + hdist:
            return None
    ll = np.zeros(320, np.int32)
    ll[:hlit] = lens[:hlit]
    d = np.zeros(320, np.int32)
    d[: hdist] = lens[hlit : hlit + hdist]
    if ll[256] == 0:
        return None
    return btype, ll, d, br.pos


@functools.partial(jax.jit, static_argnames=("cap", "max_out"))
def decode_seeded(comp, ll_lens, d_lens, seeds_bit, seeds_span, cap: int, max_out: int):
    """Decode B chunks with S exact walkers each.

    comp: uint8[B, L] chunk bodies zero-padded >= 12 bytes past the data.
    ll_lens/d_lens: int32[B, 320] code lengths from the host header parse.
    seeds_bit: int32[B, S] body-relative bit cursor of each walker's first
    symbol; seeds_span: int32[B, S] output bytes each walker must produce.
    cap: max loop iterations (>= max walker span in bytes).
    Returns (out uint8[B, max_out], produced int32[B], bad bool[B]).
    """
    B, L = comp.shape
    S = seeds_bit.shape[1]
    W = B * S

    b32 = comp.astype(jnp.uint32)
    w = b32
    w = w.at[:, : L - 1].add(b32[:, 1:] << 8)
    w = w.at[:, : L - 2].add(b32[:, 2:] << 16)
    w = w.at[:, : L - 3].add(b32[:, 3:] << 24)
    words = w.reshape(B * L)  # flat: walker gathers index lane*L + byte

    rev15 = jnp.asarray(_REV15_NP)
    ll_fields = _ll_symbol_fields(320)
    d_fields = _d_symbol_fields(320)
    ll_lut = jax.vmap(lambda ln: _build_flat_lut(ln, *ll_fields, rev15, FLAT_BITS))(
        ll_lens
    ).reshape(B << FLAT_BITS)
    d_lut = jax.vmap(lambda ln: _build_flat_lut(ln, *d_fields, rev15, FLAT_BITS))(
        d_lens
    ).reshape(B << FLAT_BITS)

    lane = jnp.repeat(jnp.arange(B, dtype=jnp.int32), S)  # [W]
    base_byte = lane * L
    base_lut = lane << FLAT_BITS
    mask15 = jnp.uint32((1 << FLAT_BITS) - 1)

    def body(carry):
        it, bitpos, remaining, bad, tk, ta, tb = carry
        active = remaining > 0
        byte = jnp.clip(bitpos >> 3, 0, L - 9)
        sh = (bitpos & 7).astype(jnp.uint32)
        w0 = words[base_byte + byte]
        w1 = words[base_byte + byte + 4]
        w2 = words[base_byte + byte + 8]
        lo = jnp.where(sh > 0, (w0 >> sh) | (w1 << (jnp.uint32(32) - sh)), w0)
        hi = jnp.where(sh > 0, (w1 >> sh) | (w2 << (jnp.uint32(32) - sh)), w1)

        e = ll_lut[base_lut + (lo & mask15).astype(jnp.int32)]
        kind = (e >> 28).astype(jnp.int32)
        aux = ((e >> 22) & 0x3F).astype(jnp.uint32)
        nb = ((e >> 16) & 0x3F).astype(jnp.uint32)
        payload = (e & 0xFFFF).astype(jnp.int32)
        # bits [nb, nb+aux): length extra (nb <= 15, aux <= 5)
        win1 = (lo >> nb) | jnp.where(nb > 0, hi << (jnp.uint32(32) - nb), 0)
        extra = (win1 & ((jnp.uint32(1) << aux) - 1)).astype(jnp.int32)
        length = payload + extra
        p2 = nb + aux  # <= 20
        win2 = (lo >> p2) | jnp.where(p2 > 0, hi << (jnp.uint32(32) - p2), 0)
        de = d_lut[base_lut + (win2 & mask15).astype(jnp.int32)]
        dkind = (de >> 28).astype(jnp.int32)
        daux = ((de >> 22) & 0x3F).astype(jnp.uint32)
        dnb = ((de >> 16) & 0x3F).astype(jnp.uint32)
        dpayload = (de & 0xFFFF).astype(jnp.int32)
        dextra = ((win2 >> dnb) & ((jnp.uint32(1) << daux) - 1)).astype(jnp.int32)
        dist = dpayload + dextra

        is_lit = kind == KIND_LIT
        is_match = (kind == KIND_MATCH) & (dkind == KIND_MATCH)
        is_bad = active & (
            (kind == KIND_INVALID)
            | (kind == KIND_EOB)  # span must end BEFORE the EOB
            | ((kind == KIND_MATCH) & (dkind != KIND_MATCH))
        )
        cover = jnp.where(is_lit, 1, jnp.where(is_match, length, 0))
        is_bad = is_bad | (active & (cover > remaining))
        adv = jnp.where(
            is_lit, nb, jnp.where(is_match, nb + aux + dnb + daux, 0)
        ).astype(jnp.int32)

        emit = active & ~is_bad
        col_k = jnp.where(
            emit & is_lit, TOK_LIT, jnp.where(emit & is_match, TOK_MATCH, TOK_NULL)
        ).astype(jnp.uint8)
        col_a = jnp.where(emit, cover, 0)
        col_b = jnp.where(is_lit, payload, dist)
        col_b = jnp.where(emit, col_b, 0)
        # tapes are time-major [cap, W]: each iteration writes ONE contiguous
        # row (a strided per-walker column write measured ~3x slower)
        tk = lax.dynamic_update_slice(tk, col_k[None, :], (it, 0))
        ta = lax.dynamic_update_slice(ta, col_a[None, :], (it, 0))
        tb = lax.dynamic_update_slice(tb, col_b[None, :], (it, 0))
        bitpos = jnp.where(emit, bitpos + adv, bitpos)
        remaining = jnp.where(emit, remaining - cover, remaining)
        bad = bad | is_bad
        return it + 1, bitpos, remaining, bad, tk, ta, tb

    def cond(carry):
        it, _bp, remaining, bad, *_ = carry
        return (it < cap) & jnp.any((remaining > 0) & ~bad)

    init = (
        jnp.int32(0),
        seeds_bit.reshape(W),
        seeds_span.reshape(W),
        jnp.zeros((W,), bool),
        jnp.zeros((cap, W), jnp.uint8),
        jnp.zeros((cap, W), jnp.int32),
        jnp.zeros((cap, W), jnp.int32),
    )
    _it, bitpos, remaining, badw, tk, ta, tb = lax.while_loop(cond, body, init)
    # back to walker-major for the tape consumers
    tk = tk.T
    ta = ta.T
    tb = tb.T

    # exactness: every walker drained its span, and walker j landed exactly
    # on seed j+1's bit cursor (no drift across seams)
    badw = badw | (remaining > 0)
    end_bits = bitpos.reshape(B, S)
    drift = end_bits[:, :-1] != seeds_bit[:, 1:]
    # walkers with zero span never move; ignore their landing position
    had_span = seeds_span[:, :-1] > 0
    bad = jnp.any(badw.reshape(B, S), axis=1) | jnp.any(drift & had_span, axis=1)

    tkc = tk.reshape(B, S * cap)
    tac = ta.reshape(B, S * cap)
    tbc = tb.reshape(B, S * cap)
    win = jnp.zeros((B, 0), jnp.uint8)
    out, produced = resolve_tokens(comp, tkc, tac, tbc, win, max_out, 0)
    return out, produced, bad


def decode_chunks_kernel(bodies, out_sizes, *, max_out=None, interpret=None):
    """Decode chunk bodies (or any raw-deflate streams) with the Pallas
    SMEM-resident sequential-inflate kernel (ops/pallas/inflate_kernel.py)
    — one TensorCore-resident full inflate per stream, streams as the grid
    axis. Needs no seeds and no host header parse: stored/fixed/dynamic
    blocks, multi-block bodies, and table builds all happen in-kernel.
    Raises ValueError on any bad lane (caller falls back to an exact
    engine)."""
    from ..ops.pallas.inflate_kernel import decode_streams_pallas, pack_streams_words

    B = len(bodies)
    if B == 0:
        return []
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    max_out = max_out or max(out_sizes)
    words, comp_bits = pack_streams_words(bodies)
    out, produced, bad, _endbit = decode_streams_pallas(
        jnp.asarray(words),
        jnp.zeros((B,), jnp.int32),
        jnp.asarray(comp_bits),
        jnp.asarray(np.asarray(out_sizes, np.int32)),
        max_out=max_out,
        interpret=interpret,
    )
    bad_np = np.asarray(bad)
    if bad_np.any():
        raise ValueError(f"kernel decode failed on lanes {np.nonzero(bad_np)[0][:4]}")
    out_np = np.asarray(out)
    produced_np = np.asarray(produced)
    parts = []
    for k in range(B):
        if produced_np[k] < out_sizes[k]:
            raise ValueError(f"chunk {k}: short output {produced_np[k]}")
        parts.append(out_np[k, : out_sizes[k]].tobytes())
    return parts


def make_kernel_dispatch(bodies, out_sizes, *, max_out=None):
    """Build a zero-arg dispatch closure over device-resident inputs for the
    Pallas inflate kernel — the shape bench.py traces (device arrays staged
    once; each call re-runs only the kernel program)."""
    from ..ops.pallas.inflate_kernel import decode_streams_pallas, pack_streams_words

    B = len(bodies)
    max_out = max_out or max(out_sizes)
    words, comp_bits = pack_streams_words(bodies)
    args = (
        jnp.asarray(words),
        jnp.zeros((B,), jnp.int32),
        jnp.asarray(comp_bits),
        jnp.asarray(np.asarray(out_sizes, np.int32)),
    )

    def dispatch():
        return decode_streams_pallas(*args, max_out=max_out, interpret=False)

    return dispatch


def make_sharded_decode_step(mesh, *, cap: int, max_out: int):
    """The multi-chip decode step as an explicit shard_map program: each
    device decodes its shard of the chunk batch with the seed-parallel
    walkers, then an `all_gather` over ICI materializes the ordered output
    on every device (one host fetch from one device, mirroring
    make_sharded_encode_step). The chunk batch must divide by the mesh
    size."""
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    def local(comp, ll_lens, d_lens, seeds_bit, seeds_span):
        out, produced, bad = decode_seeded(
            comp, ll_lens, d_lens, seeds_bit, seeds_span, cap=cap, max_out=max_out
        )
        out_all = jax.lax.all_gather(out, "chunks", tiled=True)
        produced_all = jax.lax.all_gather(produced, "chunks", tiled=True)
        bad_all = jax.lax.all_gather(bad, "chunks", tiled=True)
        return out_all, produced_all, bad_all

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("chunks", None), P("chunks", None), P("chunks", None),
            P("chunks", None), P("chunks", None),
        ),
        out_specs=(P(None, None), P(None), P(None)),
        check_vma=False,
    )
    return jax.jit(mapped)


def decode_chunks_seeded(bodies, out_sizes, seeds, *, max_out=None):
    """Decode chunk bodies (list of bytes) with per-chunk (bits, outs)
    seeds recorded by compress_parallel. Returns list of bytes, or raises
    ValueError if any lane fails exactness (caller falls back)."""
    B = len(bodies)
    if B == 0:
        return []
    S = SEEDS_PER_CHUNK
    max_out = max_out or max(out_sizes)
    L = max(len(b) for b in bodies) + 12
    comp = np.zeros((B, L), np.uint8)
    ll = np.zeros((B, 320), np.int32)
    dd = np.zeros((B, 320), np.int32)
    sbit = np.zeros((B, S), np.int32)
    sspan = np.zeros((B, S), np.int32)
    for k, body in enumerate(bodies):
        comp[k, : len(body)] = np.frombuffer(body, np.uint8)
        parsed = parse_block_header(body)
        if parsed is None:
            raise ValueError(f"chunk {k}: not a seedable coded block")
        _bt, ll_k, d_k, hdr_bits = parsed
        ll[k] = ll_k
        dd[k] = d_k
        bits, outs = seeds[k]
        if len(bits) != S:
            raise ValueError(f"chunk {k}: expected {S} seeds, got {len(bits)}")
        sbit[k] = np.asarray(bits, np.int64) + hdr_bits
        outs_arr = np.asarray(outs, np.int64)
        spans = np.diff(np.concatenate([outs_arr, [out_sizes[k]]]))
        sspan[k] = spans
    # bucket the loop bound so recompiles don't scale with corpus shape
    cap = int(sspan.max()) + 1
    cap = -(-cap // 512) * 512
    out, produced, bad = decode_seeded(
        jnp.asarray(comp), jnp.asarray(ll), jnp.asarray(dd),
        jnp.asarray(sbit), jnp.asarray(sspan), cap=cap, max_out=max_out,
    )
    bad_np = np.asarray(bad)
    if bad_np.any():
        raise ValueError(f"swarm decode drift on lanes {np.nonzero(bad_np)[0][:4]}")
    out_np = np.asarray(out)
    produced_np = np.asarray(produced)
    parts = []
    for k in range(B):
        if produced_np[k] < out_sizes[k]:
            raise ValueError(f"chunk {k}: short output {produced_np[k]}")
        parts.append(out_np[k, : out_sizes[k]].tobytes())
    return parts
