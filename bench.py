"""Benchmark driver: the framework's Silesia-style matrix + device headline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Corpus: a deterministic "silesia-proxy" tar (~8 MiB) mixing text
(lcet10.txt), PDF, JPEG (incompressible), executables, and JS source from
the reference's vendored test-data plus system binaries — the real
silesia-small.tar is not vendored in the reference checkout and this image
has no network egress, so the matrix mirrors the reference's benchmark
STRUCTURE (per-level compress + chunked-decode sweep,
zlib_benchmarks.json / bench.yml:33-64) on an honest stand-in corpus.

Sections reported:
  cpu_zlib      — stdlib zlib compress (levels 1/6/9) + decompress, the
                  stand-in for zlib-rs (byte-identical output at every
                  level: tests/test_bitexact.py).
  native        — C++ engine one-shot (byte-identical to zlib => ratio is
                  exactly 1.0) and threaded chunk-parallel, plus one-shot
                  and threaded parallel inflate.
  device        — TPU chunk-parallel encode at level 6, measured two ways
                  that must agree: (A) block_until_ready dispatch loop and
                  (B) a serialized chain of K batches where each batch's
                  input data-depends on the previous batch's output
                  (defeats enqueue pipelining) drained by one 4-byte fetch.
                  Per-stage device timings (match/encode/adler) alongside.
                  The chip sits behind a network tunnel: any device->host
                  fetch can wedge or degrade the session, so (B), the e2e
                  run, and the ratio run in a time-boxed subprocess after
                  (A).
  decode_sweep  — chunked-input streaming decode (input fed in 2^N-byte
                  pieces), mirroring blogpost-uncompress.rs.

Headline metric: device sustained encode GB/s at level 6 = method (B) when
available (it is the conservative, pipelining-immune number), else (A).
vs_baseline compares against single-thread CPU zlib at level 6.
"""

import io
import json
import os
import subprocess
import sys
import tarfile
import time
import zlib
from pathlib import Path

import numpy as np

TESTDATA = Path("/root/reference/test-libz-rs-sys/src/test-data")
TARGET_SIZE = 8 * 1024 * 1024
CHUNK = 128 * 1024
BATCH = 16
LEVEL = 6
LEVELS_MATRIX = (1, 6, 9)


def load_corpus() -> bytes:
    """Deterministic silesia-proxy tar: mixed-type members, fixed metadata."""
    members = []
    for name in ("lcet10.txt", "paper-100k.pdf", "fireworks.jpg", "issue-169.js"):
        p = TESTDATA / name
        if p.exists():
            members.append((name, p.read_bytes()))
    for extra in ("/bin/bash", "/usr/bin/python3.12", "/bin/ls"):
        try:
            members.append((Path(extra).name, Path(extra).read_bytes()))
        except OSError:
            pass
    if not members:
        rng = np.random.default_rng(0)
        members = [("rand", rng.integers(0, 64, 1 << 20, dtype=np.uint8).tobytes())]
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        rep = 0
        while buf.tell() < TARGET_SIZE:
            for name, blob in members:
                ti = tarfile.TarInfo(f"{rep}/{name}")
                ti.size = len(blob)
                ti.mtime = 0
                tf.addfile(ti, io.BytesIO(blob))
            rep += 1
    return buf.getvalue()[:TARGET_SIZE]


def _log(msg):
    print(f"# bench: {msg}", file=sys.stderr, flush=True)


def _time_best(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_cpu(data: bytes) -> dict:
    n = len(data)
    out = {"compress": {}, }
    zstreams = {}
    for lvl in LEVELS_MATRIX:
        t = _time_best(lambda l=lvl: zlib.compress(data, l), reps=2)
        zstreams[lvl] = zlib.compress(data, lvl)
        out["compress"][str(lvl)] = {
            "gbps": round(n / t / 1e9, 4),
            "bytes": len(zstreams[lvl]),
        }
    z6 = zstreams[LEVEL]
    t = _time_best(lambda: zlib.decompress(z6))
    out["inflate_gbps"] = round(n / t / 1e9, 4)
    return out, zstreams


def bench_native(data: bytes, zstreams: dict) -> dict:
    from zlib_rs_tpu import native

    if not native.available():
        return {"available": False}
    n = len(data)
    out = {"available": True, "compress": {}, "parallel_compress": {}}
    for lvl in LEVELS_MATRIX:
        raw = native.deflate_chunk(data, level=lvl, final=True)
        t = _time_best(lambda l=lvl: native.deflate_chunk(data, level=l, final=True), reps=2)
        zref = zstreams[lvl]
        # zlib stream = 2-byte hdr + raw + 4-byte adler; compare raw-to-raw
        out["compress"][str(lvl)] = {
            "gbps": round(n / t / 1e9, 4),
            "ratio_vs_zlib": round(len(raw) / (len(zref) - 6), 4),
            "bit_exact": raw == zref[2:-4],
        }
        tp = _time_best(
            lambda l=lvl: native.deflate_parallel(data, level=l, chunk_size=CHUNK, prime_dict=True),
            reps=2,
        )
        pout = native.deflate_parallel(data, level=lvl, chunk_size=CHUNK, prime_dict=True)
        assert zlib.decompress(pout, -15) == data
        out["parallel_compress"][str(lvl)] = {
            "gbps": round(n / tp / 1e9, 4),
            "ratio_vs_zlib": round(len(pout) / (len(zref) - 6), 4),
        }
    raw6 = native.deflate_chunk(data, level=LEVEL, final=True)
    t = _time_best(lambda: native.inflate_raw(raw6, n))
    out["inflate_gbps"] = round(n / t / 1e9, 4)
    # threaded parallel inflate over an indexed stream: compress each chunk
    # independently (the indexed random-access format) and record offsets
    body = bytearray()
    index = []
    n_chunks = -(-n // CHUNK)
    for k in range(n_chunks):
        seg = data[k * CHUNK : (k + 1) * CHUNK]
        part = native.deflate_chunk(seg, level=LEVEL, final=(k == n_chunks - 1))
        index.append((len(body), len(part), len(seg)))
        body.extend(part)
    body = bytes(body)
    assert native.inflate_parallel(body, index) == data
    t = _time_best(lambda: native.inflate_parallel(body, index))
    out["parallel_inflate_gbps"] = round(n / t / 1e9, 4)
    # speculative parallel inflate of the MONOLITHIC stream — no index, no
    # seams: rapidgzip-style scan + marker decode + stitch (exactness is
    # checked here and guaranteed by the sequential-fallback construction)
    assert native.inflate_speculative(raw6, n)[0] == data
    t = _time_best(lambda: native.inflate_speculative(raw6, n))
    out["speculative_inflate_gbps"] = round(n / t / 1e9, 4)
    return out


def bench_decode_sweep(data: bytes) -> dict:
    """Streaming decode with input fed in 2^N-byte pieces (the reference's
    blogpost-uncompress chunked sweep) through the host Inflator on a 512 KiB
    slice (the host engine is the semantics-reference path, not the fast
    path; the native numbers above are the throughput story)."""
    from zlib_rs_tpu.models.inflate import Inflator
    from zlib_rs_tpu.config import InflateConfig, InflateFlush

    slice_ = data[: 512 * 1024]
    z = zlib.compress(slice_, LEVEL)
    out = {}
    for nbits in (14, 17, 20):
        step = 1 << nbits
        t0 = time.perf_counter()
        inf = Inflator(InflateConfig(window_bits=15))
        produced = 0
        for i in range(0, len(z), step):
            _rc, _consumed, chunk = inf.inflate(z[i : i + step], None, InflateFlush.NO_FLUSH)
            produced += len(chunk)
        dt = time.perf_counter() - t0
        out[f"2^{nbits}"] = round(len(slice_) / dt / 1e6, 2)  # MB/s
    return out


RATIO_CHILD = r"""
import sys, json, zlib
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
from bench import load_corpus, CHUNK, LEVEL
from zlib_rs_tpu.parallel.pipeline import compress_parallel
data = load_corpus()
comp = compress_parallel(data, level=LEVEL, chunk_size=CHUNK)
assert zlib.decompress(comp) == data
zref = len(zlib.compress(data, LEVEL))
print('RATIO ' + json.dumps({'ratio': len(comp)/zref}), flush=True)
"""

DEVICE_CHILD = r"""
import sys, time, json, zlib
sys.path.insert(0, {REPO!r})
import numpy as np, jax, jax.numpy as jnp
from bench import load_corpus, CHUNK, BATCH, LEVEL
from zlib_rs_tpu.parallel import pipeline as P
from zlib_rs_tpu.ops import lz77
data = load_corpus()
flat = np.frombuffer(data, np.uint8)
arr = np.zeros((BATCH, CHUNK + lz77.PAD), np.uint8)
for k in range(BATCH):
    seg = flat[k*CHUNK:(k+1)*CHUNK]
    arr[k, :seg.shape[0]] = seg
dc = jnp.asarray(arr)
nv = jnp.full((BATCH,), CHUNK, jnp.int32)
fins = jnp.zeros((BATCH,), jnp.int32)
knobs = P._level_knobs(LEVEL)

# serialized chain: batch k+1's input data-depends on batch k's output, so
# the device cannot overlap or drop work; one 4-byte drain fetch at the end
from zlib_rs_tpu.parallel.pipeline import compress_parallel
t0 = time.perf_counter()
comp = compress_parallel(data, level=LEVEL, chunk_size=CHUNK)
e2e_cold = time.perf_counter() - t0
assert zlib.decompress(comp) == data
zref = len(zlib.compress(data, LEVEL))
print('RESULT ' + json.dumps({'e2e_cold': e2e_cold, 'ratio': len(comp)/zref}), flush=True)
"""


class _watchdog:
    """SIGALRM-based phase timeout: the tunnel-attached chip can wedge any
    device sync/fetch indefinitely; every device phase runs under one of
    these so the bench always terminates and prints its JSON line."""

    def __init__(self, seconds, label):
        self.seconds = seconds
        self.label = label

    def __enter__(self):
        import signal

        def _fire(_sig, _frm):
            raise TimeoutError(f"{self.label} exceeded {self.seconds}s")

        self._old = signal.signal(signal.SIGALRM, _fire)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        import signal

        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)
        return False


def bench_device(data: bytes) -> dict:
    import jax
    import jax.numpy as jnp

    from zlib_rs_tpu.ops import lz77
    from zlib_rs_tpu.parallel import pipeline as P

    n = len(data)
    dev = {}
    _log("device measurement first (no prior fetch)")
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

    def run_once_with(d):
        return P._encode_batch(d, nv, fins, chunk_size=CHUNK, dynamic=True, **knobs)

    def measure(fn, label):
        jax.block_until_ready(fn())
        _log(f"{label} compiled")
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            times.append(time.perf_counter() - t0)
        return times

    try:
        with _watchdog(600, "encode compile+measure"):
            times = measure(run_once, "encode")
            if min(times) > 1.0:
                _log("pathological timing; purging caches and retrying once")
                jax.clear_caches()
                times = measure(run_once, "encode")
    except TimeoutError as e:
        _log(f"device encode phase wedged ({e}); device section omitted")
        return dev
    best = min(times)
    dev["dispatch_loop_gbps"] = round(BATCH * CHUNK / best / 1e9, 4)
    _log(f"dispatch loop {dev['dispatch_loop_gbps']} GB/s (times {['%.4f' % t for t in times]})")

    # per-stage: match finding alone, then the full encode (the difference is
    # parse+huffman+pack), plus the checksum batch
    match_fn = jax.jit(
        jax.vmap(
            lambda c, v: lz77.find_matches(
                c, v, chain_depth=knobs["chain_depth"],
                max_words=knobs["max_words"], lazy=knobs["lazy"],
            )
        )
    )

    def match_only():
        return match_fn(dc, nv)

    try:
        with _watchdog(300, "match stage"):
            tm = min(measure(match_only, "match stage"))
        dev["stage_ms"] = {
            "match": round(tm * 1e3, 2),
            "encode_total": round(best * 1e3, 2),
        }
    except Exception as e:  # stage timing is best-effort
        _log(f"stage timing skipped: {e}")

    def adler_only():
        return P._adler_batch(dc[:, :CHUNK], nv)

    try:
        with _watchdog(300, "adler stage"):
            ta = min(measure(adler_only, "adler stage"))
        dev.setdefault("stage_ms", {})["adler"] = round(ta * 1e3, 2)
    except Exception as e:
        _log(f"adler timing skipped: {e}")

    # chain-scaling slope (fetch-free): time block_until_ready over a
    # data-dependent chain of K batches for growing K. If the reported
    # times are honest they grow linearly in K and the slope is the true
    # per-batch device time, immune to constant enqueue/sync optimism;
    # non-linear growth exposes a lying sync and the method reports that.
    try:
      with _watchdog(600, "chain-scaling"):
        ks = [4, 16, 64]
        ts = []
        for K in ks:
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                d = dc
                out = None
                for _ in range(K):
                    words, bits, _ll, _dl = run_once_with(d)
                    d = dc + (words[0, 0] * 0).astype(jnp.uint8)
                    out = words
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        karr = np.array(ks, float)
        tarr = np.array(ts, float)
        slope, icpt = np.polyfit(karr, tarr, 1)
        pred = slope * karr + icpt
        ss_res = float(((tarr - pred) ** 2).sum())
        ss_tot = float(((tarr - tarr.mean()) ** 2).sum())
        r2 = 1.0 - ss_res / ss_tot if ss_tot else 0.0
        if slope > 0:
            dev["chain_slope_gbps"] = round(BATCH * CHUNK / slope / 1e9, 4)
            dev["chain_slope_r2"] = round(r2, 4)
            dev["chain_times_s"] = [round(t, 5) for t in ts]
            _log(
                f"chain-scaling slope {dev['chain_slope_gbps']} GB/s "
                f"(r2={r2:.4f}, times {['%.4f' % t for t in ts]})"
            )
        else:
            _log(f"chain-scaling slope non-positive ({slope:.2e}); sync untrustworthy")
    except Exception as e:
        _log(f"chain-scaling failed: {e}")

    # anchored serialized chain IN-PROCESS (program already compiled):
    # each batch's input data-depends on the previous batch's output, so
    # the device must execute them back-to-back; one 4-byte drain fetch at
    # the end, watchdogged because the tunnel's fetch path can wedge.
    import signal

    def _alarm(_sig, _frm):
        raise TimeoutError("drain fetch wedged")

    try:
        K = 12
        t0 = time.perf_counter()
        d = dc
        last = None
        for _ in range(K):
            words, bits, _ll, _dl = run_once_with(d)
            d = dc + (words[0, 0] * 0).astype(jnp.uint8)
            last = bits
        old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(180)
        try:
            _ = int(np.asarray(last[0]))
            dt = time.perf_counter() - t0
            dev["anchored_gbps"] = round(K * BATCH * CHUNK / dt / 1e9, 4)
            _log(f"anchored chain {dev['anchored_gbps']} GB/s over {K} batches")
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
    except TimeoutError:
        _log("anchored drain fetch wedged; anchored_gbps omitted")
    except Exception as e:
        _log(f"anchored chain failed: {e}")

    # device DECODE: regions (native-compressed chunk bodies) decoded by the
    # full on-device block state machine; timed by the same chain-scaling
    # slope (no fetches)
    try:
      with _watchdog(600, "device decode"):
        from zlib_rs_tpu import native as NV
        from zlib_rs_tpu.parallel import device_inflate as DI

        n_chunks_d = BATCH
        bodies = []
        for k in range(n_chunks_d):
            seg = data[k * CHUNK : (k + 1) * CHUNK]
            bodies.append(NV.deflate_chunk(seg, level=LEVEL, final=(k == n_chunks_d - 1)))
        Ld = max(len(b) for b in bodies) + 8
        compd = np.zeros((n_chunks_d, Ld), np.uint8)
        for k, b in enumerate(bodies):
            compd[k, : len(b)] = np.frombuffer(b, np.uint8)
        cj = jnp.asarray(compd)
        sbd = jnp.zeros(n_chunks_d, jnp.int32)
        ebd = jnp.asarray(np.array([len(b) * 8 for b in bodies], np.int32))
        tgt = jnp.asarray(np.full(n_chunks_d, CHUNK, np.int32))
        max_steps = CHUNK + 2 + 512 * max(1, Ld // 4096)

        def dec_once(c):
            return DI.decode_regions(c, sbd, ebd, tgt, max_steps=max_steps, max_out=CHUNK)

        jax.block_until_ready(dec_once(cj))
        _log("device decode compiled")
        ksd = [1, 4, 8]
        tsd = []
        for K in ksd:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                c = cj
                out = None
                for _ in range(K):
                    tk, ta, tb, _i, _p, _bad = dec_once(c)
                    c = cj + (tk[0, 0] * 0).astype(jnp.uint8)
                    out = tk
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            tsd.append(best)
        kda = np.array(ksd, float)
        tda = np.array(tsd, float)
        dslope, _ = np.polyfit(kda, tda, 1)
        if dslope > 0:
            dev["decode_chain_slope_gbps"] = round(
                n_chunks_d * CHUNK / dslope / 1e9, 4
            )
            _log(
                f"device decode chain slope {dev['decode_chain_slope_gbps']} GB/s "
                f"(times {['%.4f' % t for t in tsd]})"
            )
    except Exception as e:
        _log(f"device decode bench skipped: {e}")

    # the pipeline's output bytes are backend-independent: measure the
    # level-6 ratio in a CPU-pinned subprocess (immune to tunnel wedges)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", RATIO_CHILD.replace(
                "{REPO!r}", repr(os.path.dirname(os.path.abspath(__file__)))
            )],
            capture_output=True, text=True, timeout=1200,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("RATIO "):
                dev["ratio_vs_zlib"] = round(json.loads(line[6:])["ratio"], 4)
                _log(f"device-pipeline ratio (cpu-verified) {dev['ratio_vs_zlib']}")
        if "ratio_vs_zlib" not in dev:
            _log(f"ratio subprocess gave no result: {proc.stderr[-300:]}")
    except Exception as e:
        _log(f"ratio subprocess failed: {e}")

    # e2e wall-clock through the tunnel, best-effort (fetch-unsafe)
    child = DEVICE_CHILD.replace(
        "{REPO!r}", repr(os.path.dirname(os.path.abspath(__file__)))
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", child], capture_output=True, text=True, timeout=900
        )
        for line in proc.stdout.splitlines():
            if line.startswith("ANCHORED "):
                dev.update({k: round(v, 4) for k, v in json.loads(line[9:]).items()})
            elif line.startswith("RESULT "):
                vals = json.loads(line[7:])
                dev["e2e_cold_s"] = round(vals["e2e_cold"], 2)
                dev["e2e_tunnel_gbps"] = round(n / vals["e2e_cold"] / 1e9, 4)
                dev["ratio_vs_zlib"] = round(vals["ratio"], 4)
        if "anchored_gbps" not in dev:
            _log(f"anchored subprocess gave no result: {proc.stderr[-400:]}")
    except subprocess.TimeoutExpired:
        _log("device fetch-phase timed out (tunnel wedge); fields omitted")
    except Exception as e:
        _log(f"device fetch-phase failed: {e}")
    return dev


def main():
    data = load_corpus()
    n = len(data)
    _log(f"corpus silesia-proxy tar, {n} bytes")

    cpu, zstreams = bench_cpu(data)
    _log(f"cpu zlib: {cpu}")

    native = bench_native(data, zstreams)
    _log(f"native: {native}")

    sweep = bench_decode_sweep(data)
    _log(f"host streaming decode sweep (MB/s): {sweep}")

    device = {}
    try:
        device = bench_device(data)
    except Exception as e:
        _log(f"device bench unavailable: {e}")

    base6 = cpu["compress"][str(LEVEL)]["gbps"]
    slope_ok = device.get("chain_slope_r2", 0) >= 0.95
    headline = (
        device.get("anchored_gbps")
        or (device.get("chain_slope_gbps") if slope_ok else None)
        or device.get("dispatch_loop_gbps")
        or 0.0
    )
    agreement = None
    if device.get("dispatch_loop_gbps") and headline:
        agreement = round(device["dispatch_loop_gbps"] / headline, 2)

    result = {
        "metric": f"parallel_deflate_level{LEVEL}_device_gbps",
        "value": round(headline, 4),
        "unit": "GB/s",
        "vs_baseline": round(headline / base6, 2) if base6 else None,
        "ratio_vs_zlib": device.get("ratio_vs_zlib"),
        "method_agreement_dispatch_over_anchored": agreement,
        "measurement_note": (
            "headline preference: (1) anchored serialized chain drained by a "
            "4-byte fetch, (2) chain-scaling slope (time vs K chained "
            "batches; linear fit, r2 reported — immune to constant sync "
            "optimism, needs no fetch), (3) raw block_until_ready loop. All "
            "measured methods are reported for cross-checking."
        ),
        "device": device,
        "native": native,
        "cpu_zlib": cpu,
        "host_stream_decode_mbps_by_input_chunk": sweep,
        "corpus": "silesia-proxy tar (reference test-data + system binaries)",
        "corpus_bytes": n,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
