"""Vector device inflate: lane-parallel Huffman decode of seeded chunks.

The fourth device decode engine, and the first whose per-symbol work runs
on the VPU instead of a scalar unit (see ops/pallas/vhuff_kernel.py for
the kernel design and the measured primitives that enable it). It decodes
the same inputs as the swarm engine — chunk bodies + encoder-recorded
(bit, out) seeds + a host block-header parse — but instead of one XLA
while-loop symbol step per walker (dispatch-bound, ~3 MB/s) it packs 1024
walkers into (8, 128) vector registers and decodes one code per walker
per step. Token tapes then expand through the shared pointer-doubling LZ
resolver (device_inflate.resolve_tokens, ~10 GB/s).

Exactness contract (same as swarm): every walker must drain its span
exactly and land on the next seed's bit offset; any invalid code, early
EOB, short span, or seam drift raises ValueError so the caller falls back
to an exact engine. The container checksum remains the final oracle.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.pallas.vhuff_kernel import (
    WALKERS_PER_STEP,
    build_cascade_tables_np,
    decode_tokens_vector,
    decode_tokens_vector2,
    expand_tokens_pallas,
    expand_tokens_pallas2,
)
from .swarm_inflate import parse_block_header


def _bucket(n: int, q: int) -> int:
    return -(-n // q) * q


@functools.partial(jax.jit, static_argnames=("K", "G"))
def _stage_fifo(words_flat, start_word, chunk_of_walker, Lw, *, K: int, G: int):
    """fifo[g, k, r, j] = words of walker (g*1024 + r*128 + j) from its
    start word. One structured gather; XLA vectorizes the contiguous-K
    pattern (experiments/probe_fifo.py: ~0.03 ns/element)."""
    base = chunk_of_walker * Lw + start_word  # [W]
    idx = base[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    idx = jnp.clip(idx, 0, words_flat.shape[0] - 1)
    vals = words_flat[idx]  # [W, K]
    return vals.reshape(G, 8, 128, K).transpose(0, 3, 1, 2)


@functools.partial(jax.jit, static_argnames=("B", "S", "cap", "out_words", "interpret"))
def _unpack_and_expand(tape, offs, *, B: int, S: int, cap: int,
                       out_words: int, interpret: bool):
    """tape uint32[G, cap, 8, 128] -> LE32-packed chunk bytes via the
    in-SMEM sprint expansion kernel (the XLA pointer-doubling resolver
    measured ~6 MB/s device-trace at real shapes: full-space gathers per
    doubling round are the gather tax incarnate — re-confirmed by
    experiments/probe_encode_gather.py: 0.14 G gathered elems/s)."""
    G = tape.shape[0]

    def to_walker_major(x):
        x = x.transpose(0, 2, 3, 1).reshape(G * WALKERS_PER_STEP, cap)
        return x[: B * S].reshape(B, S, cap)

    return expand_tokens_pallas(
        to_walker_major(tape), offs,
        S=S, cap=cap, out_words=out_words, interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("B", "S", "cap", "out_words", "interpret"))
def _unpack_and_expand2(tapeA, tapeB, offs, *, B: int, S: int, cap: int,
                        out_words: int, interpret: bool):
    """Two-plane variant (r5 engine)."""
    G = tapeA.shape[0]

    def to_walker_major(x):
        x = x.transpose(0, 2, 3, 1).reshape(G * WALKERS_PER_STEP, cap)
        return x[: B * S].reshape(B, S, cap)

    return expand_tokens_pallas2(
        to_walker_major(tapeA), to_walker_major(tapeB), offs,
        S=S, cap=cap, out_words=out_words, interpret=interpret,
    )


def _pack_words(comp: np.ndarray) -> np.ndarray:
    """uint8[B, L] -> little-endian int32[B, ceil(L/4)] word view."""
    B, L = comp.shape
    Lp = _bucket(L, 4)
    padded = np.zeros((B, Lp), np.uint8)
    padded[:, :L] = comp
    return padded.view("<u4").astype(np.int64).astype(np.int32)


def prepare_vector_inputs(bodies, out_sizes, seeds):
    """Host-side staging shared by decode and bench dispatch.

    Returns a dict of device arrays + static shapes, or raises ValueError
    when any chunk is not seedable (stored block, malformed header, seed
    count not a multiple of 128).
    """
    B = len(bodies)
    S = len(seeds[0][0])
    if S == 0 or S % 128 != 0:
        raise ValueError(f"vector engine needs seeds %% 128 == 0 (> 0), got {S}")
    L = max(len(b) for b in bodies) + 16
    comp = np.zeros((B, L), np.uint8)
    sbit = np.zeros((B, S), np.int64)
    sspan = np.zeros((B, S), np.int32)
    tabs = [np.zeros((B, n), np.int32) for n in (16, 16, 384, 16, 16, 128)]
    for k, body in enumerate(bodies):
        comp[k, : len(body)] = np.frombuffer(body, np.uint8)
        parsed = parse_block_header(body)
        if parsed is None:
            raise ValueError(f"chunk {k}: not a seedable coded block")
        _bt, ll_k, d_k, hdr_bits = parsed
        for t, built in zip(tabs, build_cascade_tables_np(ll_k, d_k)):
            t[k] = built
        bits, outs = seeds[k]
        if len(bits) != S:
            raise ValueError(f"chunk {k}: expected {S} seeds, got {len(bits)}")
        sbit[k] = np.asarray(bits, np.int64) + hdr_bits
        outs_arr = np.asarray(outs, np.int64)
        sspan[k] = np.diff(np.concatenate([outs_arr, [out_sizes[k]]]))

    # walker input span in words: seed-to-seed bit distance (last walker
    # runs to the body end), +3 words of refill slack
    end_bits = np.concatenate(
        [sbit[:, 1:], np.array([len(b) * 8 for b in bodies])[:, None]], axis=1
    )
    span_words = (end_bits - (sbit & ~31)) // 32 + 1
    K = int(_bucket(int(span_words.max()) + 3, 8))
    cap = int(_bucket(int(sspan.max()) + 2, 256))

    W = B * S
    G = -(-W // WALKERS_PER_STEP)
    Wp = G * WALKERS_PER_STEP

    def pad_w(a, fill=0):
        out = np.full((Wp,) + a.shape[2:], fill, a.dtype)
        out[:W] = a.reshape(W, *a.shape[2:])
        return out

    # per-walker output offsets for the expansion kernel
    offs = np.zeros((B, S + 8), np.int32)
    for k in range(B):
        outs_arr = np.asarray(seeds[k][1], np.int64)
        offs[k, :S] = outs_arr
        offs[k, S:] = out_sizes[k]

    words = _pack_words(comp)
    Lw = words.shape[1]
    start_word = pad_w((sbit >> 5).astype(np.int32))
    chunk_of_walker = pad_w(
        np.broadcast_to(np.arange(B, dtype=np.int32)[:, None], (B, S)).copy()
    )
    align = pad_w((sbit & 31).astype(np.int32)).reshape(G, 8, 128)
    span = pad_w(sspan).reshape(G, 8, 128)

    # per-row tables: row r of group g = walkers [g*1024+r*128, +128) —
    # all in chunk (g*8 + r) * 128 // S since S % 128 == 0
    rows = np.arange(G * 8, dtype=np.int64)
    rc = np.clip(rows * 128 // S, 0, B - 1).astype(np.int32)

    def table_rows(t):
        padded = np.zeros((B, 128), np.int32)
        padded[:, : t.shape[1]] = t
        return padded[rc].reshape(G, 8, 128)

    ll_lim, ll_pack, ll_work, d_lim, d_pack, d_work = tabs
    pieces = (
        ll_lim, ll_pack,
        ll_work[:, 0:128], ll_work[:, 128:256], ll_work[:, 256:384],
        d_lim, d_pack, d_work,
    )
    dev = {
        "fifo": _stage_fifo(
            jnp.asarray(words.reshape(-1)),
            jnp.asarray(start_word),
            jnp.asarray(chunk_of_walker),
            Lw, K=K, G=G,
        ),
        "tables": tuple(jnp.asarray(table_rows(t)) for t in pieces),
        "align": jnp.asarray(align),
        "span": jnp.asarray(span),
        "offs": jnp.asarray(offs),
    }
    meta = {
        "B": B, "S": S, "K": K, "cap": cap, "G": G,
        "sbit": sbit, "sspan": sspan,
    }
    return dev, meta


def _twoplane_default() -> bool:
    """The r5 paired-row engine: <=3 literals + the following match (or 4
    literals) per tape row over a 128-bit bit window — chip-measured
    byte-exact at 182.1 MB/s on the 8 MiB level-6 probe corpus (vs 112
    single-plane; decode kernel 1.5 ms, expansion 29.5 ms per dispatch)
    and 0.11975 GB/s on the literal-denser silesia-proxy bench corpus
    (vs 0.11186 single-plane), so it is the default.
    ZRS_VECTOR_TWOPLANE=0 reverts to the single-plane engine."""
    import os

    v = os.environ.get("ZRS_VECTOR_TWOPLANE")
    return v != "0"


def _twoplane_cap(meta) -> int:
    """Row capacity for the paired-row tape: every mid-stream row covers
    >= 3 output bytes (a lone match is >= 3; literals pair with the next
    match or pack 4-wide), so span/3 rows + a small tail allowance (short
    literal rows only appear as the span drains) suffices. Too-small cap
    fails SAFE: the decode loop exits at it==cap with remaining > 0 and
    rem != 0 trips the caller's fallback chain. Keeping cap tight is also
    what fits the two double-buffered (cap, 8, 128) tape planes in scoped
    VMEM — cap 1280 OOMed the chip at 22.35M vs the 16M limit."""
    return min(
        meta["cap"], int(_bucket(int(meta["sspan"].max()) // 3 + 40, 128))
    )


def _run(dev, meta, *, max_out: int, interpret: bool, twoplane=None):
    if twoplane is None:
        twoplane = _twoplane_default()
    out_words = -(-max_out // 4) + 2
    if twoplane:
        cap2 = _twoplane_cap(meta)
        tapeA, tapeB, cons, bad, rem = decode_tokens_vector2(
            dev["fifo"], *dev["tables"], dev["align"], dev["span"],
            cap=cap2, K=meta["K"], interpret=interpret,
        )
        outw = _unpack_and_expand2(
            tapeA, tapeB, dev["offs"],
            B=meta["B"], S=meta["S"], cap=cap2, out_words=out_words,
            interpret=interpret,
        )
        return outw, cons, bad, rem
    tape, cons, bad, rem = decode_tokens_vector(
        dev["fifo"], *dev["tables"], dev["align"], dev["span"],
        cap=meta["cap"], K=meta["K"], interpret=interpret,
    )
    outw = _unpack_and_expand(
        tape, dev["offs"],
        B=meta["B"], S=meta["S"], cap=meta["cap"], out_words=out_words,
        interpret=interpret,
    )
    return outw, cons, bad, rem


def decode_chunks_vector(bodies, out_sizes, seeds, *, max_out=None,
                         interpret=None):
    """Decode chunk bodies with the lane-parallel vector engine.

    Same contract as swarm_inflate.decode_chunks_seeded: returns a list of
    bytes or raises ValueError for the caller's fallback chain.
    """
    B = len(bodies)
    if B == 0:
        return []
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    max_out = max_out or max(out_sizes)
    dev, meta = prepare_vector_inputs(bodies, out_sizes, seeds)
    outw, cons, bad, rem = _run(
        dev, meta, max_out=max_out, interpret=interpret
    )
    S = meta["S"]
    W = B * S
    bad_np = np.asarray(bad).reshape(-1)[:W].reshape(B, S)
    rem_np = np.asarray(rem).reshape(-1)[:W].reshape(B, S)
    cons_np = np.asarray(cons).reshape(-1)[:W].reshape(B, S).astype(np.int64)
    # every walker must be clean AND have drained its span exactly (rem==0
    # guarantees full span coverage: the expansion kernel writes exactly
    # [offs[s], offs[s+1]) driven by the tokens, and cover sums to span)
    bad_np = (bad_np != 0) | (rem_np != 0)
    if bad_np.any():
        raise ValueError(
            f"vector decode bad/short walkers {np.argwhere(bad_np)[:4]}"
        )
    # seam check CHAINED THROUGH zero-span walkers: each positive-span
    # walker must land exactly on the bit offset of the NEXT positive-span
    # walker (padded duplicate seeds are inert and must not mask drift)
    end_bits = meta["sbit"] + cons_np
    for k in range(B):
        live = np.nonzero(meta["sspan"][k] > 0)[0]
        if live.size > 1:
            if (end_bits[k, live[:-1]] != meta["sbit"][k, live[1:]]).any():
                raise ValueError(f"vector decode drift in chunk {k}")
    # spans must tile [0, out_size) exactly: offsets non-decreasing and
    # total span == out_size (zero-span walkers contribute nothing)
    for k in range(B):
        if int(meta["sspan"][k].sum()) != int(out_sizes[k]):
            raise ValueError(f"vector span coverage gap in chunk {k}")
    out_np = np.ascontiguousarray(np.asarray(outw)).view("<u4").view(np.uint8)
    parts = []
    for k in range(B):
        parts.append(out_np[k, : out_sizes[k]].tobytes())
    return parts


def make_vector_dispatch(bodies, out_sizes, seeds, *, max_out=None,
                         twoplane=None):
    """Zero-arg dispatch closure over device-resident inputs (the shape
    bench.py traces: staging done once, each call re-runs the kernel +
    resolver program)."""
    max_out = max_out or max(out_sizes)
    dev, meta = prepare_vector_inputs(bodies, out_sizes, seeds)
    if twoplane is None:
        twoplane = _twoplane_default()

    def dispatch():
        return _run(
            dev, meta, max_out=max_out, interpret=False, twoplane=twoplane
        )

    return dispatch
