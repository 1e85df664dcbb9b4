"""adler32 / crc32 checksums, TPU-native.

Capability parity with the reference checksum layer (zlib-rs/src/adler32.rs,
zlib-rs/src/crc32.rs and their SIMD kernel families, SURVEY.md section 2a
rows 23-24) — but architected for TPU rather than translated:

  * adler32 is a pair of (weighted) byte sums mod 65521. We compute it as
    blocked vector reductions (VPU-friendly, no serial dependence), with the
    cross-block fold using the same algebra as `adler32_combine`.
  * crc32 is GF(2)-linear. We compute per-4-byte-word contributions and fold
    them with a tree reduction whose combine step is a GF(2) matrix
    application expressed as an int8 *matmul on bit-planes* — i.e. the CRC
    runs on the TPU MXU. The same operators give `crc32_combine` (reference:
    zlib-rs/src/crc32/combine.rs) for stitching shard checksums.

Every function has a host (numpy) and a device (jax.numpy, jittable) variant
sharing one implementation parameterized over the array namespace.
"""

from __future__ import annotations

import numpy as np

from . import gf2

ADLER_BASE = 65521
# Block size for the blocked adler reduction. The weighted per-block sum is
# bounded by 255 * BLK*(BLK+1)/2, which must fit in uint32: BLK=4064 gives
# 255 * 4064*4065/2 = 2.106e9 < 2^32.
_ADLER_BLK = 4064


def _as_u8_np(data) -> np.ndarray:
    if isinstance(data, (bytes, bytearray, memoryview)):
        return np.frombuffer(bytes(data), dtype=np.uint8)
    arr = np.asarray(data)
    if arr.dtype != np.uint8:
        raise TypeError(f"expected uint8 data, got {arr.dtype}")
    return arr


# ---------------------------------------------------------------------------
# adler32
# ---------------------------------------------------------------------------


def _adler32_impl(xp, data, start):
    """Shared blocked-reduction adler32. `data` is a uint8 array, `start` the
    running adler value (a | b<<16). Returns uint32 scalar (xp-native)."""
    n = data.shape[-1]
    start = xp.asarray(start, xp.uint32)
    a0 = start & xp.uint32(0xFFFF)
    b0 = (start >> xp.uint32(16)) & xp.uint32(0xFFFF)
    if n == 0:
        return (b0 << xp.uint32(16)) | a0

    blk = _ADLER_BLK
    nblocks = -(-n // blk)
    pad = nblocks * blk - n
    d = xp.concatenate([data.astype(xp.uint32), xp.zeros((pad,), xp.uint32)])
    d = d.reshape(nblocks, blk)

    # Per block k of true length L_k (only the last may be short):
    #   S_k = sum(bytes), W_k = sum((L_k - i) * byte_i)
    # End-padding with zeros lets us use full-width weights (blk - i) and
    # subtract the overshoot pad * S_k from the last block.
    weights = np.arange(blk, 0, -1, dtype=np.uint32)  # blk - i
    s = xp.sum(d, axis=1) % ADLER_BASE
    w = xp.sum(d * weights[None, :], axis=1) % ADLER_BASE
    if pad:
        last_fix = (xp.uint32(pad % ADLER_BASE) * s[-1]) % ADLER_BASE
        w_last = (w[-1] + ADLER_BASE - last_fix) % ADLER_BASE
        w = xp.concatenate([w[:-1], w_last[None]])

    # Fold blocks left-to-right:
    #   a = a0 + sum_k S_k
    #   b = b0 + n*a0 + sum_k (W_k + R_k * S_k),  R_k = bytes after block k
    lens_np = np.full((nblocks,), blk, dtype=np.uint32)
    lens_np[-1] = blk - pad
    rest = np.cumsum(lens_np[::-1])[::-1] - lens_np  # R_k (host constant)
    terms = (w + (rest % ADLER_BASE) * s) % ADLER_BASE  # < BASE^2, uint32-safe

    a = (a0 + _mod_sum(xp, s)) % ADLER_BASE
    b = (b0 + (xp.uint32(n % ADLER_BASE) * (a0 % ADLER_BASE)) % ADLER_BASE + _mod_sum(xp, terms)) % ADLER_BASE
    return (b.astype(xp.uint32) << xp.uint32(16)) | a.astype(xp.uint32)


def _mod_sum(xp, terms):
    """Sum of values each < ADLER_BASE without uint32 overflow, mod BASE."""
    n = terms.shape[0]
    if n <= 4096:
        return xp.sum(terms) % ADLER_BASE
    groups = -(-n // 4096)
    padded = xp.concatenate([terms, xp.zeros((groups * 4096 - n,), terms.dtype)])
    partial = xp.sum(padded.reshape(groups, 4096), axis=1) % ADLER_BASE
    return _mod_sum(xp, partial)


def adler32(data, start: int = 1) -> int:
    """Host adler32 (reference behavior: zlib-rs/src/adler32.rs:19)."""
    return int(_adler32_impl(np, _as_u8_np(data), int(start)))


def adler32_combine(adler1: int, adler2: int, len2: int) -> int:
    """Combine adlers of concatenated sequences (reference: adler32.rs:58-87)."""
    rem = len2 % ADLER_BASE
    a1 = adler1 & 0xFFFF
    b1 = (adler1 >> 16) & 0xFFFF
    a2 = adler2 & 0xFFFF
    b2 = (adler2 >> 16) & 0xFFFF
    a = (a1 + a2 + ADLER_BASE - 1) % ADLER_BASE
    # rem*a1 adds len2 copies of a1 into the b-sum; "- rem" removes the len2
    # copies of adler2's implicit leading 1 that would be double-counted.
    b = (b1 + b2 + (rem * a1) % ADLER_BASE + ADLER_BASE - rem) % ADLER_BASE
    return ((b << 16) | a) & 0xFFFFFFFF


def adler32_jax(data, start=1):
    """Jittable adler32 over a uint8 array. `start` may be traced or static."""
    import jax.numpy as jnp

    return _adler32_impl(jnp, data, start)


# ---------------------------------------------------------------------------
# crc32 (GF(2) matmul tree reduction)
# ---------------------------------------------------------------------------


def _planes_mul_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) @ b.astype(np.int32) % 2).astype(np.int8)


def _fold_matrices(f: int, words_per_elem: int) -> np.ndarray:
    """[f*32, 32] bit-plane matrix folding f adjacent crc contributions
    (earliest first) into one, each element spanning words_per_elem words."""
    mats = []
    for j in range(f):
        shift_words = (f - 1 - j) * words_per_elem
        mats.append(gf2.packed_to_planes(gf2.shift_matrix_for_len(4 * shift_words)))
    return np.concatenate(mats, axis=0).astype(np.int8)


def _word_fold0_matrices(f: int) -> np.ndarray:
    """[f*32, 32] matrix mapping f adjacent raw little-endian u32 words
    (bit-planes) directly to their combined crc contribution."""
    mats = []
    for j in range(f):
        shift = gf2.packed_to_planes(gf2.shift_matrix_for_len(4 * (f - 1 - j)))
        mats.append(_planes_mul_np(gf2.WORD_TO_CRC_PLANES, shift))
    return np.concatenate(mats, axis=0).astype(np.int8)


def _crc32_impl(xp, matmul2, data, start, length: int):
    """Shared crc32 implementation. data: uint8[n] (n static under jit),
    start: running crc (int or traced uint32). Returns uint32 scalar."""
    n = length
    start = xp.asarray(start, xp.uint32)
    if n == 0:
        return start

    # Front-pad to a multiple of 4 bytes, then to a power-of-two word count.
    # Leading zero bytes contribute nothing to the positional sum R (their
    # per-byte contribution is CRC_TABLE[0] == 0), and real bytes keep their
    # distance-from-end, so R(padded) == R(data).
    nwords = -(-n // 4)
    pow2 = 1 << max(0, (nwords - 1).bit_length())
    total_bytes = pow2 * 4
    pad = total_bytes - n
    d = xp.concatenate([xp.zeros((pad,), xp.uint8), data])
    words = (
        d.reshape(pow2, 4).astype(xp.uint32)
        * np.array([1, 1 << 8, 1 << 16, 1 << 24], dtype=np.uint32)[None, :]
    ).sum(axis=1, dtype=xp.uint32)

    # Bit-planes of the words: int8[pow2, 32]
    shifts = np.arange(32, dtype=np.uint32)
    planes = ((words[:, None] >> shifts[None, :]) & xp.uint32(1)).astype(xp.int8)

    # Fold level 0: raw words -> crc contributions, F-way.
    m = pow2
    wpe = 1  # words per element
    first = True
    while m > 1 or first:
        f = 4 if (m % 4 == 0 and m >= 4) else (2 if m >= 2 else 1)
        if first:
            mats = _word_fold0_matrices(f)
            first = False
        else:
            mats = _fold_matrices(f, wpe)
        planes = matmul2(planes.reshape(m // f, f * 32), mats)
        wpe *= f
        m //= f

    r_bits = planes[0]  # int8[32]

    # Full crc: register c0 = start ^ 0xFFFFFFFF advanced past n bytes, xor R,
    # then final complement.
    shift_n = gf2.packed_to_planes(gf2.shift_matrix_for_len(n))  # static n
    c0 = start ^ xp.uint32(0xFFFFFFFF)
    c0_bits = ((c0 >> shifts.astype(xp.uint32)) & xp.uint32(1)).astype(xp.int8)
    shifted = matmul2(c0_bits[None, :], shift_n.astype(np.int8))[0]
    out_bits = (shifted ^ r_bits).astype(xp.uint32)
    weights = (np.uint32(1) << shifts).astype(np.uint32)
    value = xp.sum(out_bits * weights, dtype=xp.uint32)
    return value ^ xp.uint32(0xFFFFFFFF)


def _matmul2_np(a, b):
    return ((a.astype(np.int32) @ b.astype(np.int32)) & 1).astype(np.int8)


def crc32(data, start: int = 0) -> int:
    """Host crc32 (reference behavior: zlib-rs/src/crc32.rs:19)."""
    arr = _as_u8_np(data)
    return int(_crc32_impl(np, _matmul2_np, arr, int(start) & 0xFFFFFFFF, arr.shape[0]))


def crc32_jax(data, start=0):
    """Jittable crc32 over a uint8 array (static length). The fold is a chain
    of int8 matmuls (MXU) over GF(2) bit-planes."""
    import jax.numpy as jnp

    def matmul2(a, b):
        out = jnp.matmul(a, jnp.asarray(b, dtype=jnp.int8), preferred_element_type=jnp.int32)
        return (out & 1).astype(jnp.int8)

    return _crc32_impl(jnp, matmul2, data, start, data.shape[0])


crc32_combine = gf2.crc32_combine
crc32_combine_gen = gf2.crc32_combine_gen
crc32_combine_op = gf2.crc32_combine_op


def crc32_batch_jax(data):
    """crc32 of each row of uint8[B, N] (full rows). Use crc32_combine on the
    host to fix up a ragged final chunk."""
    import jax

    return jax.vmap(lambda row: crc32_jax(row, 0))(data)


def adler32_batch_jax(data, lens=None):
    """adler32 of each row of uint8[B, N]; rows may be end-padded with zeros
    beyond their true length.

    Zero padding at the end does not change adler's byte sums... but it DOES
    change the weighted sum's length terms, so we compute with true lengths.
    """
    import jax
    import jax.numpy as jnp

    if lens is None:
        return jax.vmap(lambda row: _adler32_impl(jnp, row, 1))(data)

    def one(row, ln):
        # Zero out padding defensively, then compute closed form with true
        # length: a = 1 + S ; b = ln + sum((ln - i) * b_i)   (mod BASE)
        n = row.shape[0]
        idx = jnp.arange(n, dtype=jnp.uint32)
        mask = idx < ln
        r = jnp.where(mask, row.astype(jnp.uint32), 0)
        s = _mod_sum(jnp, r)  # bytes < 256 < BASE, safe for _mod_sum
        # weighted: (ln - i) mod BASE per element, masked
        w_elem = (jnp.where(mask, (ln - idx) % ADLER_BASE, 0) * r) % ADLER_BASE
        w = _mod_sum(jnp, w_elem)
        a = (1 + s) % ADLER_BASE
        b = (ln % ADLER_BASE + w) % ADLER_BASE
        return (b.astype(jnp.uint32) << jnp.uint32(16)) | a.astype(jnp.uint32)

    return jax.vmap(one)(data, lens.astype(jnp.uint32))
