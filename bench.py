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
  device        — TPU chunk-parallel encode at level 6 and turbo decode,
                  timed from a jax.profiler DEVICE TRACE (the per-op
                  device timeline). On this tunnel-attached chip,
                  block_until_ready does NOT reliably sync — wall-clock
                  dispatch loops and even data-chained variants measured
                  up to ~40x optimistic vs the device trace, so the trace
                  span is the only number treated as real. The raw
                  dispatch-loop figure is still recorded as enqueue_gbps
                  for comparison, clearly labeled.
  decode_sweep  — chunked-input streaming decode (input fed in 2^N-byte
                  pieces), mirroring blogpost-uncompress.rs.

Headline metric: device sustained encode GB/s at level 6 from the device
trace. vs_baseline compares against single-thread CPU zlib at level 6.
"""

import glob
import gzip
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

SEEDED_CHILD = r"""
import sys, pickle
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
from bench import load_corpus, CHUNK, LEVEL, BATCH
from zlib_rs_tpu.parallel.pipeline import compress_parallel
data = load_corpus()[: BATCH * CHUNK]
comp, idx = compress_parallel(data, level=LEVEL, chunk_size=CHUNK, return_index=True)
with open({OUT!r}, "wb") as f:
    pickle.dump({"comp": comp, "index": list(idx), "seeds": idx.seeds}, f)
print("SEEDED ok", flush=True)
"""

DEVICE_CHILD = r"""
import sys, time, json, zlib
sys.path.insert(0, {REPO!r})
import numpy as np, jax, jax.numpy as jnp
from bench import load_corpus, CHUNK, LEVEL
from zlib_rs_tpu.parallel.pipeline import compress_parallel
data = load_corpus()
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


def _device_trace_seconds(dispatch, reps: int, tag: str, timeout_s: int):
    """Ground-truth device seconds per dispatch via a jax.profiler trace.

    On this tunnel-attached chip block_until_ready (and every wall-clock
    scheme built on it, including data-dependent dispatch chains) measured
    up to ~40x optimistic vs the device timeline, so the TPU-lane span of
    the profiler trace is the ONLY timing treated as real. Returns
    (seconds_per_dispatch, per_program_seconds dict) or (None, {}).
    """
    import jax

    trace_dir = f"/tmp/zrs_bench_trace_{tag}_{os.getpid()}"
    with _watchdog(timeout_s, f"device trace {tag}"):
        with jax.profiler.trace(trace_dir):
            out = None
            for _ in range(reps):
                out = dispatch()
            jax.block_until_ready(out)
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        return None, {}
    with gzip.open(files[-1]) as f:
        trace = json.load(f)
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    per_prog = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "TPU" not in pid_names.get(e.get("pid"), ""):
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            per_prog[name] = per_prog.get(name, 0.0) + e.get("dur", 0) / 1e6
    total = sum(per_prog.values())
    if total <= 0:
        return None, per_prog
    return total / reps, {k: round(v, 4) for k, v in per_prog.items()}


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

    # -- encode: compile, enqueue-loop diagnostic, then the device trace ----
    try:
        with _watchdog(900, "encode compile"):
            jax.block_until_ready(run_once())
            _log("encode compiled")
    except TimeoutError as e:
        _log(f"device encode compile wedged ({e}); device section omitted")
        return dev
    try:
        with _watchdog(300, "encode enqueue loop"):
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run_once())
                times.append(time.perf_counter() - t0)
        dev["encode_enqueue_gbps"] = round(BATCH * CHUNK / min(times) / 1e9, 4)
        _log(
            f"enqueue loop {dev['encode_enqueue_gbps']} GB/s — NOT trusted "
            "(block_until_ready does not sync on this tunnel)"
        )
    except Exception as e:
        _log(f"enqueue loop skipped: {e}")
    try:
        sec, progs = _device_trace_seconds(run_once, 2, "encode", 1200)
        if sec:
            dev["encode_trace_s_per_batch"] = round(sec, 3)
            dev["encode_trace_gbps"] = round(BATCH * CHUNK / sec / 1e9, 5)
            dev["encode_trace_programs"] = progs
            _log(f"encode device-trace {dev['encode_trace_gbps']} GB/s ({sec:.2f}s/batch)")
    except Exception as e:
        _log(f"encode device trace failed: {e}")

    # -- kernel-scan encode: the SMEM hash-chain matcher
    # (ops/pallas/deflate_kernel.py) running zlib's exact level-6 search
    # rules, feeding the same XLA tree/pack stages. 32 KiB chunks with a
    # ~31 KiB priming dict — the configuration whose exact-engine ratio
    # measures 0.996x zlib-6 — fit the kernel's packed-u16 position space;
    # the trace normalizes per byte so the numbers stay comparable.
    try:
      with _watchdog(1200, "kernel-scan encode"):
        KCH = 32 * 1024
        KB = 32
        KDICT = 31976
        karr = np.zeros((KB, KDICT + KCH + lz77.PAD), np.uint8)
        kvf = np.zeros((KB,), np.int32)
        for k in range(KB):
            seg = flat[k * KCH : (k + 1) * KCH]
            karr[k, KDICT : KDICT + seg.shape[0]] = seg
            dlen = min(KDICT, k * KCH)
            if dlen:
                karr[k, KDICT - dlen : KDICT] = flat[k * KCH - dlen : k * KCH]
            kvf[k] = KDICT - dlen
        kdc = jnp.asarray(karr)
        knv = jnp.full((KB,), KDICT + KCH, jnp.int32)
        kfins = jnp.zeros((KB,), jnp.int32)
        kvfj = jnp.asarray(kvf)

        def kernel_once():
            return P._encode_batch(
                kdc, knv, kfins, kvfj, chunk_size=KCH, dynamic=True,
                dict_size=KDICT, kernel_scan=True, **knobs
            )

        jax.block_until_ready(kernel_once())
        _log("kernel-scan encode compiled")
        sec, progs = _device_trace_seconds(kernel_once, 2, "kencode", 1200)
        if sec:
            dev["kernel_encode_trace_s_per_batch"] = round(sec, 3)
            dev["kernel_encode_trace_gbps"] = round(KB * KCH / sec / 1e9, 5)
            dev["kernel_encode_trace_programs"] = progs
            _log(
                f"kernel-scan encode device-trace "
                f"{dev['kernel_encode_trace_gbps']} GB/s ({sec:.2f}s/batch)"
            )
    except Exception as e:
        _log(f"kernel-scan encode skipped: {e}")

    # -- kernel-path ratio: the full corpus through compress_parallel with
    # the scan kernel on the real chip (fetches ~half the corpus size of
    # compressed bytes; watchdogged against tunnel wedges)
    try:
      with _watchdog(1500, "kernel ratio"):
        import zlib as _z

        os.environ["ZRS_TPU_KERNEL"] = "1"
        try:
            from zlib_rs_tpu.parallel.pipeline import compress_parallel as _cp

            comp = _cp(bytes(data), level=LEVEL, chunk_size=32 * 1024)
        finally:
            os.environ.pop("ZRS_TPU_KERNEL", None)
        assert _z.decompress(comp) == data
        zref = len(_z.compress(bytes(data), LEVEL))
        dev["kernel_ratio_vs_zlib"] = round(len(comp) / zref, 4)
        _log(f"kernel-path ratio (chip round-trip verified) {dev['kernel_ratio_vs_zlib']}")
    except Exception as e:
        _log(f"kernel ratio skipped: {e}")

    # -- swarm decode: seed-parallel exact decode of our own indexed
    # stream (parallel/swarm_inflate). The seeded stream is built by a
    # CPU-backend subprocess (bytes are backend-independent and it avoids
    # a device fetch in this process); the decode itself is profiled here.
    try:
      with _watchdog(1500, "swarm decode"):
        import pickle

        seed_pkl = f"/tmp/zrs_bench_seeded_{os.getpid()}.pkl"
        proc = subprocess.run(
            [sys.executable, "-c", SEEDED_CHILD.replace(
                "{REPO!r}", repr(os.path.dirname(os.path.abspath(__file__)))
            ).replace("{OUT!r}", repr(seed_pkl))],
            capture_output=True, text=True, timeout=1400,
        )
        blob = pickle.load(open(seed_pkl, "rb"))
        from zlib_rs_tpu.parallel import swarm_inflate as SW

        seeded = [k for k, s in enumerate(blob["seeds"]) if s is not None]
        bodies = [
            blob["comp"][blob["index"][k][0] : blob["index"][k][0] + blob["index"][k][1]]
            for k in seeded
        ]
        out_sizes = [blob["index"][k][2] for k in seeded]
        seeds = [blob["seeds"][k] for k in seeded]
        tile = 4  # 64 lanes: enough walkers to amortize per-op overhead
        Bsw = len(bodies) * tile
        S = SW.SEEDS_PER_CHUNK
        Ld = max(len(b) for b in bodies) + 12
        compd = np.zeros((Bsw, Ld), np.uint8)
        ll = np.zeros((Bsw, 320), np.int32)
        dd = np.zeros((Bsw, 320), np.int32)
        sbit = np.zeros((Bsw, S), np.int32)
        sspan = np.zeros((Bsw, S), np.int32)
        for k in range(Bsw):
            j = k % len(bodies)
            body = bodies[j]
            compd[k, : len(body)] = np.frombuffer(body, np.uint8)
            _bt, llk, dk, hb = SW.parse_block_header(body)
            ll[k] = llk
            dd[k] = dk
            bits, outs = seeds[j]
            sbit[k] = np.asarray(bits, np.int64) + hb
            oa = np.asarray(outs, np.int64)
            sspan[k] = np.diff(np.concatenate([oa, [out_sizes[j]]]))
        cap = -(-(int(sspan.max()) + 1) // 512) * 512
        cj = jnp.asarray(compd)
        llj = jnp.asarray(ll)
        ddj = jnp.asarray(dd)
        sbj = jnp.asarray(sbit)
        ssj = jnp.asarray(sspan)

        def swarm_once():
            return SW.decode_seeded(
                cj, llj, ddj, sbj, ssj, cap=cap, max_out=CHUNK
            )

        jax.block_until_ready(swarm_once())
        _log("swarm decode compiled")
        sec, progs = _device_trace_seconds(swarm_once, 1, "swarm", 1200)
        if sec:
            out_bytes = sum(out_sizes) * tile
            dev["swarm_decode_trace_s"] = round(sec, 3)
            dev["swarm_decode_trace_gbps"] = round(out_bytes / sec / 1e9, 5)
            dev["swarm_decode_lanes"] = Bsw
            _log(f"swarm decode device-trace {dev['swarm_decode_trace_gbps']} GB/s")
    except Exception as e:
        _log(f"swarm decode bench skipped: {e}")

    # -- Pallas sequential-inflate kernel on the same seeded bodies:
    # first Mosaic compile is the validation gate (interpret mode is
    # byte-exact); any failure is logged and skipped.
    try:
      with _watchdog(1200, "pallas kernel decode"):
        from zlib_rs_tpu.parallel import swarm_inflate as SW2

        parts = SW2.decode_chunks_kernel(bodies, out_sizes, interpret=False)
        joined = b"".join(parts)
        _log("pallas inflate kernel: chip compile + decode OK")

        from zlib_rs_tpu.ops.pallas.inflate_kernel import (
            decode_streams_pallas, pack_streams_words,
        )

        kwords, kbits = pack_streams_words(bodies)
        Bk = len(bodies)
        argsk = (
            jnp.asarray(kwords), jnp.zeros((Bk,), jnp.int32),
            jnp.asarray(kbits), jnp.asarray(np.asarray(out_sizes, np.int32)),
        )
        jax.block_until_ready(
            decode_streams_pallas(*argsk, max_out=CHUNK, interpret=False)
        )

        def kernel_once():
            return decode_streams_pallas(*argsk, max_out=CHUNK, interpret=False)

        sec, _progs = _device_trace_seconds(kernel_once, 1, "pallas_kernel", 1200)
        if sec:
            dev["pallas_inflate_kernel_trace_s"] = round(sec, 3)
            dev["pallas_inflate_kernel_gbps"] = round(
                sum(out_sizes) / sec / 1e9, 5
            )
            _log(
                f"pallas inflate kernel device-trace "
                f"{dev['pallas_inflate_kernel_gbps']} GB/s"
            )
    except Exception as e:
        _log(f"pallas kernel decode skipped: {e}")

    # -- turbo decode (positional, indexless foreign streams): kept as a
    # completeness measurement on a SMALL region batch — the construction
    # is O(bits x log S) gathers and is not a throughput path.
    try:
      with _watchdog(900, "turbo decode"):
        from zlib_rs_tpu import native as NV
        from zlib_rs_tpu.parallel import turbo_inflate as TB

        n_chunks_d = 4
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

        def turbo_once():
            return TB.decode_regions_turbo(
                cj, sbd, ebd, tgt, max_blocks=16, max_out=CHUNK
            )

        jax.block_until_ready(turbo_once())
        _log("turbo decode compiled")
        sec, progs = _device_trace_seconds(turbo_once, 1, "turbo", 900)
        if sec:
            dev["turbo_decode_trace_s"] = round(sec, 3)
            dev["turbo_decode_trace_gbps"] = round(n_chunks_d * CHUNK / sec / 1e9, 5)
            _log(f"turbo decode device-trace {dev['turbo_decode_trace_gbps']} GB/s")
    except Exception as e:
        _log(f"turbo decode bench skipped: {e}")

    # the pipeline's output bytes are backend-independent: measure the
    # level-6 ratio in a CPU-pinned subprocess (immune to tunnel wedges)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", RATIO_CHILD.replace(
                "{REPO!r}", repr(os.path.dirname(os.path.abspath(__file__)))
            )],
            capture_output=True, text=True, timeout=1800,
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
            if line.startswith("RESULT "):
                vals = json.loads(line[7:])
                dev["e2e_cold_s"] = round(vals["e2e_cold"], 2)
                dev["e2e_tunnel_gbps"] = round(n / vals["e2e_cold"] / 1e9, 4)
                dev.setdefault("ratio_vs_zlib", round(vals["ratio"], 4))
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
    # the tunnel to the chip wedges transiently (minutes); retry once
    for attempt in range(2):
        try:
            with _watchdog(2700, "device bench attempt"):
                device = bench_device(data)
        except Exception as e:
            _log(f"device bench attempt {attempt} unavailable: {e}")
        if device:
            break
        if attempt == 0:
            _log("device section empty; retrying in 120s")
            time.sleep(120)

    base6 = cpu["compress"][str(LEVEL)]["gbps"]
    # headline: the best trace-measured device encode engine (the SMEM
    # scan kernel when it compiled, else the XLA matcher path)
    headline = max(
        device.get("encode_trace_gbps") or 0.0,
        device.get("kernel_encode_trace_gbps") or 0.0,
    )
    if not device:
        _log(
            "DEVICE UNREACHABLE for this entire run (tunnel outage): the "
            "value field is 0.0, NOT a measurement. Last trace-measured "
            "numbers and methodology are recorded in STATUS.md."
        )
    result = {
        "metric": f"parallel_deflate_level{LEVEL}_device_gbps",
        "value": round(headline, 5),
        "unit": "GB/s",
        "vs_baseline": round(headline / base6, 4) if base6 else None,
        "ratio_vs_zlib": (
            device.get("kernel_ratio_vs_zlib")
            if device.get("kernel_ratio_vs_zlib") is not None
            and (device.get("kernel_encode_trace_gbps") or 0.0)
            >= (device.get("encode_trace_gbps") or 0.0)
            else device.get("ratio_vs_zlib")
        ),
        "measurement_note": (
            "value = level-6 chunk-parallel encode GB/s/chip from the "
            "jax.profiler DEVICE trace (TPU-lane jit span / dispatches). "
            "Wall-clock methods (block_until_ready loops, data-chained "
            "dispatch chains) measured up to ~40x optimistic on this "
            "tunnel-attached chip and are reported only as "
            "encode_enqueue_gbps, explicitly untrusted. The native C++ "
            "engine numbers (native.*) are the CPU production path; "
            "native one-shot output is byte-identical to zlib."
        ),
        "device": device,
        "device_unreachable": not device,
        "native": native,
        "cpu_zlib": cpu,
        "host_stream_decode_mbps_by_input_chunk": sweep,
        "corpus": "silesia-proxy tar (reference test-data + system binaries)",
        "corpus_bytes": n,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
