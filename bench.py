"""Benchmark driver: chunk-parallel deflate throughput on the attached TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = single-thread CPU zlib.compress at the same level (the stand-in
for zlib-rs, whose output sizes it matches byte-for-byte in compat mode).

Corpus: a Silesia-style mix assembled from the reference repo's vendored
test-data samples (text + pdf + jpeg + binary), replicated to ~16 MiB.
"""

import json
import sys
import time
import zlib
from pathlib import Path

import numpy as np

TESTDATA = Path("/root/reference/test-libz-rs-sys/src/test-data")
TARGET_SIZE = 16 * 1024 * 1024
CHUNK = 128 * 1024
LEVEL = 6


def load_corpus() -> bytes:
    parts = []
    for name in ("lcet10.txt", "paper-100k.pdf", "fireworks.jpg", "issue-169.js"):
        p = TESTDATA / name
        if p.exists():
            parts.append(p.read_bytes())
    for extra in ("/bin/bash", "/usr/bin/python3.12"):
        try:
            parts.append(Path(extra).read_bytes())
        except OSError:
            pass
    if not parts:
        rng = np.random.default_rng(0)
        parts = [rng.integers(0, 64, 1 << 20, dtype=np.uint8).tobytes()]
    blob = b"".join(parts)
    reps = max(1, -(-TARGET_SIZE // len(blob)))
    return (blob * reps)[:TARGET_SIZE]


def main():
    data = load_corpus()
    n = len(data)

    # baseline: single-thread CPU zlib at the same level
    t0 = time.perf_counter()
    zref = zlib.compress(data, LEVEL)
    t1 = time.perf_counter()
    base_gbps = n / (t1 - t0) / 1e9

    from zlib_rs_tpu.parallel.pipeline import compress_parallel

    # warmup/compile
    comp = compress_parallel(data, level=LEVEL, chunk_size=CHUNK)
    assert zlib.decompress(comp) == data, "round-trip failed"

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        comp = compress_parallel(data, level=LEVEL, chunk_size=CHUNK)
        times.append(time.perf_counter() - t0)
    best = min(times)
    gbps = n / best / 1e9

    result = {
        "metric": f"parallel_deflate_level{LEVEL}_gbps",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / base_gbps, 3),
        "ratio_vs_zlib": round(len(comp) / len(zref), 4),
        "corpus_bytes": n,
        "baseline_cpu_zlib_gbps": round(base_gbps, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
