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
    assert {f"2^{n}" for n in range(4, 25)} <= set(out)
    assert "pure_engine_2^14" in out
    assert all(v > 0 for v in out.values())


def test_bench_corpus_deterministic():
    a = bench.load_corpus()
    b = bench.load_corpus()
    assert a == b
    assert len(a) == bench.TARGET_SIZE


def test_bench_compact_final_line():
    # VERDICT r4 weak #1: the driver's tail window truncated the head of
    # the ~4KB full-result line in every round so far (parsed=null).  The
    # LAST stdout line must now be a compact JSON under 500 bytes that
    # still carries the headline keys, even with every field populated.
    import json

    result = {
        "metric": "parallel_deflate_level6_device_gbps",
        "value": 0.12345,
        "unit": "GB/s",
        "vs_baseline": 12.3456,
        "ratio_vs_zlib": 0.9961,
        "elapsed_s": 1234.5,
        "native": {
            "inflate_gbps": 0.1054,
            "parallel_inflate_gbps": 0.3806,
        },
    }
    device = {
        "vector_decode_trace_gbps": 0.21186,
        "kernel_e2e_wall_gbps": 0.01534,
    }
    compact = bench._compact_result(result, device)
    line = json.dumps(compact)
    assert len(line) < 500, f"compact line {len(line)} bytes"
    reparsed = json.loads(line[-min(len(line), 2000):])  # tail-window sim
    assert reparsed["metric"] == result["metric"]
    assert reparsed["value"] == 0.12345
    assert reparsed["unit"] == "GB/s"
    assert reparsed["vs_baseline"] == 12.3456
    assert reparsed["kernel_ratio"] == 0.9961
    assert reparsed["vector_decode_gbps"] == 0.21186


def test_bench_emits_json_before_kill():
    # VERDICT r3 item 2: the driver may kill bench.py at any point (wedged
    # tunnel). A parseable result JSON line must already be on stdout
    # before the device phases even start — SIGKILL mid-run and parse.
    import json
    import os
    import signal
    import subprocess
    import time

    env = dict(os.environ)
    env["ZRS_BENCH_TARGET_MB"] = "1"
    env["ZRS_BENCH_BUDGET_S"] = "600"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, str(Path(bench.__file__))],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=env,
    )
    parsed = None
    deadline = time.monotonic() + 240
    try:
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            if line.startswith("{"):
                parsed = json.loads(line)
                break
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)  # exact PID, never a pattern
        proc.wait(timeout=30)
    assert parsed is not None, "no JSON line emitted before kill"
    assert parsed["metric"].startswith("parallel_deflate")
    assert "unit" in parsed and "value" in parsed
