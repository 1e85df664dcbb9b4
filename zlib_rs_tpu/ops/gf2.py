"""GF(2) linear-algebra machinery for CRC-32.

CRC-32 is an affine map over GF(2): appending a zero byte to the message is a
fixed 32x32 GF(2) matrix `S8` applied to the CRC register, and each message
byte contributes linearly. This module builds those operators once (numpy, at
import time) so that:

  * `crc32` over a buffer becomes a *tree reduction* whose combine step is a
    GF(2) matrix application — which we express as an int8 matmul (mod 2) on
    bit-planes, i.e. it runs on the TPU MXU (see ops/checksum.py);
  * `crc32_combine(crc1, crc2, len2)` (the parallel-merge primitive, reference
    zlib-rs/src/crc32/combine.rs:1-115) is a matrix-power application.

Matrices are represented two ways:
  * packed: np.uint32[32], column i is the image of basis vector e_i
    (the representation classically used by zlib's crc32_combine);
  * planes: np.int8[32, 32], planes[i, j] = bit j of column i, suitable for
    `bits @ planes % 2` matmuls.

Nothing here is copied from the reference; the operators are derived from the
CRC-32 polynomial (IEEE 802.3, reflected form 0xEDB88320) from first
principles.
"""

from __future__ import annotations

import numpy as np

CRC32_POLY = np.uint32(0xEDB88320)


def _make_crc_table() -> np.ndarray:
    """The classic 256-entry CRC-32 table: table[b] = CRC register after
    feeding byte b into a zero register (no pre/post conditioning)."""
    table = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        c = np.uint32(b)
        for _ in range(8):
            c = (c >> np.uint32(1)) ^ (CRC32_POLY if (c & np.uint32(1)) else np.uint32(0))
        table[b] = c
    return table


CRC_TABLE = _make_crc_table()


def matrix_times_vec(mat: np.ndarray, vec: int) -> int:
    """Apply packed GF(2) matrix (uint32[32]) to a 32-bit vector."""
    vec = int(vec)
    out = 0
    i = 0
    while vec:
        if vec & 1:
            out ^= int(mat[i])
        vec >>= 1
        i += 1
    return out


def matrix_times_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Compose packed GF(2) matrices: result = a . b (apply b, then a)."""
    return np.array([matrix_times_vec(a, int(col)) for col in b], dtype=np.uint32)


def _shift_one_bit_matrix() -> np.ndarray:
    """Operator for one zero *bit* entering the (reflected) CRC register."""
    mat = np.zeros(32, dtype=np.uint32)
    mat[0] = CRC32_POLY  # e_0 -> poly (the bit shifted out feeds back)
    row = np.uint32(1)
    for i in range(1, 32):
        mat[i] = row  # e_i -> e_{i-1}
        row <<= np.uint32(1)
    return mat


def _build_shift_matrices() -> tuple[np.ndarray, list[np.ndarray]]:
    """Return (S8, [S8^(2^k) for k in 0..31]) as packed matrices.

    S8 is the "advance past one zero byte" operator; S8^(2^k) advances past
    2^k zero bytes. These power-of-two shift operators drive both the tree
    reduction in the vectorized crc32 and crc32_combine.
    """
    m = _shift_one_bit_matrix()
    # one byte = 8 bits
    s8 = m
    for _ in range(2):
        s8 = matrix_times_matrix(s8, s8)  # m^2, m^4
    s8 = matrix_times_matrix(s8, s8)  # m^8
    powers = [s8]
    cur = s8
    for _ in range(1, 32):
        cur = matrix_times_matrix(cur, cur)
        powers.append(cur)
    return s8, powers


SHIFT_BYTE, SHIFT_BYTE_POW2 = _build_shift_matrices()


def packed_to_planes(mat: np.ndarray) -> np.ndarray:
    """uint32[32] packed columns -> int8[32, 32] bit-plane matrix.

    planes[i, j] = bit j of mat[i], so that for a bit-row vector
    v (shape [32], v[i] = bit i of the input), (v @ planes) % 2 gives the bit
    rows of the output.
    """
    cols = mat.astype(np.uint32)
    j = np.arange(32, dtype=np.uint32)
    return ((cols[:, None] >> j[None, :]) & np.uint32(1)).astype(np.int8)


def shift_matrix_for_len(len2: int) -> np.ndarray:
    """Packed GF(2) matrix advancing a CRC past len2 zero bytes."""
    out = None
    k = 0
    len2 = int(len2)
    while len2:
        if len2 & 1:
            p = SHIFT_BYTE_POW2[k]
            out = p if out is None else matrix_times_matrix(p, out)
        len2 >>= 1
        k += 1
    if out is None:  # len2 == 0 -> identity
        return (np.uint32(1) << np.arange(32, dtype=np.uint32)).astype(np.uint32)
    return out


def crc32_combine(crc1: int, crc2: int, len2: int) -> int:
    """Combine CRCs of two concatenated byte sequences.

    Equivalent in behavior to zlib's crc32_combine (reference:
    zlib-rs/src/crc32/combine.rs:1-115): given crc1 = CRC(seq1) and
    crc2 = CRC(seq2), returns CRC(seq1 + seq2) where len2 = len(seq2).
    """
    if len2 == 0:
        return int(crc1) & 0xFFFFFFFF
    mat = shift_matrix_for_len(len2)
    return (matrix_times_vec(mat, int(crc1)) ^ int(crc2)) & 0xFFFFFFFF


def crc32_combine_gen(len2: int) -> np.ndarray:
    """Precompute the length-shift operator for crc32_combine_op.

    Mirrors zlib's crc32_combine_gen/crc32_combine_op pair (reference:
    zlib-rs/src/crc32/combine.rs), which make combining O(1) per shard once
    the operator for a fixed shard length is built.
    """
    return shift_matrix_for_len(len2)


def crc32_combine_op(crc1: int, crc2: int, op: np.ndarray) -> int:
    return (matrix_times_vec(op, int(crc1)) ^ int(crc2)) & 0xFFFFFFFF


# 8->32 GF(2) map: byte bits -> CRC register contribution of that byte
# (i.e. the linearization of CRC_TABLE; CRC_TABLE[x ^ y] == CRC_TABLE[x] ^ CRC_TABLE[y]).
def _byte_to_crc_planes() -> np.ndarray:
    basis = CRC_TABLE[1 << np.arange(8)]  # contributions of each input bit
    j = np.arange(32, dtype=np.uint32)
    return ((basis[:, None].astype(np.uint32) >> j[None, :]) & np.uint32(1)).astype(np.int8)


BYTE_TO_CRC_PLANES = _byte_to_crc_planes()  # int8[8, 32]

# Contribution of a whole aligned little-endian u32 word (4 message bytes
# b0,b1,b2,b3): crc register after feeding 4 bytes into a zero register is
# S8^3(T[b0]) ^ S8^2(T[b1]) ^ S8(T[b2]) ^ T[b3]. As a GF(2) map from the 32
# word bits to the 32 register bits:
def _word_to_crc_planes() -> np.ndarray:
    planes = np.zeros((32, 32), dtype=np.int8)
    for byte_idx in range(4):  # byte 0 is fed first
        shift = shift_matrix_for_len(3 - byte_idx)
        for bit in range(8):
            contrib = matrix_times_vec(shift, int(CRC_TABLE[1 << bit]))
            word_bit = byte_idx * 8 + bit  # little-endian u32 packing
            planes[word_bit] ^= packed_to_planes(np.array([contrib], dtype=np.uint32))[0]
    return planes % 2


WORD_TO_CRC_PLANES = _word_to_crc_planes()  # int8[32, 32]

# Power-of-two *word* (4-byte) shift operators as bit-plane matrices, used by
# the vectorized tree reduction: PLANES_WORD_POW2[k] advances past 2^k words.
PLANES_WORD_POW2 = [
    packed_to_planes(shift_matrix_for_len(4 * (1 << k))) for k in range(28)
]
