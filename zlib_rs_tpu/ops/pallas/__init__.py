"""Pallas TPU kernels (hardware-resident hot ops with interpret fallbacks)."""

from .checksum_kernels import (  # noqa: F401
    adler32_batch_auto,
    adler32_batch_pallas,
)
