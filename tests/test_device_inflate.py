"""Tests for the full device inflate engine (parallel/device_inflate.py):
multi-block regions, on-device table builds, stored blocks, window-primed
zran regions, and the foreign-stream entry point (decompress_foreign)."""

import gzip
import os
import zlib

import numpy as np
import pytest

import jax.numpy as jnp

from zlib_rs_tpu.parallel.device_inflate import decode_regions, resolve_tokens
from zlib_rs_tpu.parallel.inflate import decompress_chunks, decompress_foreign

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'

TESTDATA = "/root/reference/test-libz-rs-sys/src/test-data/"


def zraw(data, level=6):
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


class TestDecodeRegions:
    def _run(self, cases, bodies, start_bits=None, windows=None):
        B = len(bodies)
        L = max(len(b) for b in bodies) + 8
        comp = np.zeros((B, L), np.uint8)
        for i, b in enumerate(bodies):
            comp[i, : len(b)] = np.frombuffer(b, np.uint8)
        targets = [len(c) for c in cases]
        got = decompress_chunks(
            bodies, targets, windows=windows, start_bits=start_bits
        )
        for i, want in enumerate(cases):
            assert got[i] == want, f"region {i}"

    def test_mixed_block_types(self):
        cases = [
            b"hello world hello world hello hello",
            b"a" * 5000,
            bytes(range(256)) * 8,
            b"The quick brown fox jumps over the lazy dog. " * 100,
            os.urandom(3000),  # stored-leaning
        ]
        self._run(cases, [zraw(c, 6) for c in cases])

    def test_multi_block_bodies(self):
        # sync-flush seams create multiple blocks per body
        parts = [b"part one " * 300, b"part two " * 300, b"part three " * 300]
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        body = b"".join(c.compress(p) + c.flush(zlib.Z_SYNC_FLUSH) for p in parts[:-1])
        body += c.compress(parts[-1]) + c.flush()
        self._run([b"".join(parts)], [body])

    def test_level0_stored_bodies(self):
        data = os.urandom(150000)  # > 2 stored blocks
        self._run([data], [zraw(data, 0)])

    def test_large_sym_buffer_block_boundaries(self):
        # >16383 symbols forces multiple dynamic blocks from zlib
        data = open(TESTDATA + "lcet10.txt", "rb").read()[:120000]
        self._run([data], [zraw(data, 6)])

    def test_corrupt_region_flagged(self):
        body = bytearray(zraw(b"payload " * 1000, 6))
        body[12] ^= 0xFF
        with pytest.raises(ValueError):
            decompress_chunks([bytes(body)], [8000])


class TestForeignStreams:
    def test_monolithic_zlib(self):
        data = open(TESTDATA + "lcet10.txt", "rb").read()[:200000]
        assert decompress_foreign(zlib.compress(data, 6), span=65536) == data

    def test_monolithic_zlib_level9(self):
        data = open("/bin/bash", "rb").read()[:150000]
        assert decompress_foreign(zlib.compress(data, 9), span=32768) == data

    def test_multi_member_gzip(self):
        data = open(TESTDATA + "lcet10.txt", "rb").read()[:120000]
        mm = (
            gzip.compress(data[:50000])
            + gzip.compress(data[50000:90000])
            + gzip.compress(data[90000:])
        )
        assert decompress_foreign(mm) == data

    def test_single_member_gzip(self):
        data = os.urandom(60000)
        assert decompress_foreign(gzip.compress(data, 1)) == data

    def test_checksum_verified(self):
        data = b"x" * 50000
        z = bytearray(zlib.compress(data, 6))
        z[-1] ^= 0xFF
        with pytest.raises(ValueError):
            decompress_foreign(bytes(z), span=8192)


class TestWindowPrimedRegions:
    def test_zran_regions_with_windows(self):
        from zlib_rs_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        data = open(TESTDATA + "lcet10.txt", "rb").read()[:300000]
        body = zraw(data, 6)
        _full, points, _used = native.zran_index(body, 65536, 4 * len(data))
        assert points
        cuts = [(0, 0, b"")] + [
            (int(b), int(o), data[max(0, o - 32768) : o]) for (o, b) in points
        ]
        ends = [c[1] for c in cuts[1:]] + [len(data)]
        bodies, starts, targets, windows = [], [], [], []
        for (bitpos, out_off, win), eout in zip(cuts, ends):
            bodies.append(body[bitpos >> 3 :])
            starts.append(bitpos & 7)
            targets.append(eout - out_off)
            windows.append(win)
        parts = decompress_chunks(
            bodies, targets, windows=windows, start_bits=starts
        )
        assert b"".join(parts) == data
