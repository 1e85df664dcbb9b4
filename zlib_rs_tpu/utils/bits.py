"""Bit-twiddling helpers shared by the Huffman and bitstream layers."""

from __future__ import annotations

import numpy as np


def bit_reverse(values, nbits):
    """Reverse the low `nbits` bits of each value (vectorized, any xp).

    DEFLATE transmits Huffman codes most-significant-bit first while the
    byte stream is filled LSB-first, so canonical code values must be
    bit-reversed before packing (RFC 1951 section 3.1.1).
    """
    v = values
    xp = np
    try:  # work for jax arrays too without importing jax here
        import jax.numpy as jnp

        if not isinstance(v, np.ndarray) and not np.isscalar(v):
            xp = jnp
    except ImportError:  # pragma: no cover
        pass
    v = xp.asarray(v, dtype=xp.uint32)
    r = xp.zeros_like(v)
    for _ in range(16):  # max code length is 15
        r = (r << xp.uint32(1)) | (v & xp.uint32(1))
        v = v >> xp.uint32(1)
    # r now holds the 16-bit reversal; shift down to nbits
    shift = (xp.uint32(16) - xp.asarray(nbits, xp.uint32)).astype(xp.uint32)
    return r >> shift
