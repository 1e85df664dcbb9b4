"""Tests for the position-parallel turbo inflate engine
(parallel/turbo_inflate.py): correctness vs the stdlib-zlib oracle across
block types, multi-block regions, sub-byte starts with primed windows,
block-budget fallback, and corrupt-region detection."""

import os
import zlib

import numpy as np
import pytest

import jax.numpy as jnp

from zlib_rs_tpu.parallel.device_inflate import resolve_tokens
from zlib_rs_tpu.parallel.inflate import decompress_chunks
from experiments.turbo_inflate import decode_regions_turbo

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'

TESTDATA = "/root/reference/test-libz-rs-sys/src/test-data/"


def zraw(data, level=6):
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


def run_turbo(cases, bodies, start_bits=None, windows=None):
    got = decompress_chunks(
        bodies, [len(c) for c in cases],
        windows=windows, start_bits=start_bits, engine="turbo",
    )
    for i, want in enumerate(cases):
        assert got[i] == want, f"region {i}"


class TestTurboEngine:
    def test_mixed_block_types(self):
        cases = [
            b"hello world hello world hello hello",
            b"a" * 5000,
            bytes(range(256)) * 8,
            os.urandom(3000),  # stored-leaning
        ]
        run_turbo(cases, [zraw(c, 6) for c in cases])

    def test_multi_block_region(self):
        # >16383 symbols forces several dynamic blocks from zlib; the
        # turbo engine must chain block passes (one outer pass per block)
        data = open(TESTDATA + "lcet10.txt", "rb").read()[:120000]
        run_turbo([data], [zraw(data, 6)])

    def test_sync_flush_seams(self):
        parts = [b"part one " * 200, b"part two " * 200]
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        body = c.compress(parts[0]) + c.flush(zlib.Z_SYNC_FLUSH)
        body += c.compress(parts[1]) + c.flush()
        run_turbo([b"".join(parts)], [body])

    def test_stored_blocks(self):
        data = os.urandom(100000)
        run_turbo([data], [zraw(data, 0)])

    def test_fixed_blocks_level1(self):
        data = b"abcd" * 600
        run_turbo([data], [zraw(data, 1)])

    def test_subbyte_start_with_window(self):
        # region 2 of a stream, starting mid-byte with a 32 KiB window —
        # the zran shape (native indexer drives the real path; here we
        # build the cut with the host engine for determinism)
        from zlib_rs_tpu.models import zran as Z

        data = open(TESTDATA + "lcet10.txt", "rb").read()[:150000]
        stream = zlib.compress(data, 6)
        index = Z.build_index(stream, span=49152)
        assert index.points, "expected at least one access point"
        p = index.points[0]
        bitpos = (p.in_offset - 1) * 8 + (8 - p.bits) if p.bits else p.in_offset * 8
        body = stream[bitpos >> 3 :]
        run_turbo(
            [data[p.out_offset :]],
            [body],
            start_bits=[bitpos & 7],
            windows=[p.window],
        )

    def test_block_budget_fallback(self):
        # dozens of tiny coded blocks (full-flush seams) exceed turbo's
        # block budget; engine="auto" must fall back to lockstep and
        # still decode exactly
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        parts = [f"piece {i:04d} ".encode() * 8 for i in range(40)]
        body = b"".join(
            c.compress(p) + c.flush(zlib.Z_FULL_FLUSH) for p in parts[:-1]
        )
        body += c.compress(parts[-1]) + c.flush()
        want = b"".join(parts)
        got = decompress_chunks([body], [len(want)])  # auto
        assert got[0] == want

    def test_corrupt_region_flagged(self):
        body = bytearray(zraw(b"payload " * 1000, 6))
        body[12] ^= 0xFF
        with pytest.raises(ValueError):
            decompress_chunks([bytes(body)], [8000], engine="turbo")

    def test_raw_api_block_count(self):
        # the raw entry point reports how many block passes ran
        data = b"z" * 4000
        body = zraw(data, 6)
        comp = np.zeros((1, 1 << (len(body) + 8 - 1).bit_length()), np.uint8)
        comp[0, : len(body)] = np.frombuffer(body, np.uint8)
        tk, ta, tb, produced, bad, blk = decode_regions_turbo(
            jnp.asarray(comp),
            jnp.zeros(1, jnp.int32),
            jnp.asarray(np.array([len(body) * 8], np.int32)),
            jnp.asarray(np.array([len(data)], np.int32)),
            max_blocks=8,
            max_out=4096,
        )
        assert not bool(np.asarray(bad)[0])
        assert int(np.asarray(produced)[0]) == len(data)
        assert int(np.asarray(blk)) >= 1
        vals, totals = resolve_tokens(
            jnp.asarray(comp), tk, ta, tb, jnp.zeros((1, 0), jnp.uint8),
            out_size=4096, wlen=0,
        )
        assert np.asarray(vals)[0, : len(data)].tobytes() == data
