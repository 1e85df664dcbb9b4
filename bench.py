"""Benchmark driver: the framework's Silesia-style matrix + device headline.

Prints a result JSON line {"metric", "value", "unit", "vs_baseline", ...}
INCREMENTALLY — once after every completed phase, last line wins — so a
kill at ANY point after the first phase still leaves a parseable result
on stdout (VERDICT r3 item 2: rounds 1-3 all lost their device numbers to
late kills). The global wall-clock budget is ZRS_BENCH_BUDGET_S (default
1200s) and every device phase runs in a KILLABLE SUBPROCESS: a wedged
tunnel call can outlive SIGALRM (the handler can't preempt a blocked C
call), but it can't outlive SIGKILL from the parent.

Corpus: a deterministic "silesia-proxy" tar (~8 MiB) mixing text
(lcet10.txt), PDF, JPEG (incompressible), executables, and JS source from
the reference's vendored test-data plus system binaries — the real
silesia-small.tar is not vendored in the reference checkout and this image
has no network egress, so the matrix mirrors the reference's benchmark
STRUCTURE (per-level compress sweep 0-9 + chunked-decode sweep 2^4..2^24,
zlib_benchmarks.json / bench.yml:33-64) on an honest stand-in corpus.

Sections reported:
  cpu_zlib      — stdlib zlib compress (levels 0-9) + decompress, the
                  stand-in for zlib-rs (byte-identical output at every
                  level: tests/test_bitexact.py).
  native        — C++ engine one-shot (byte-identical to zlib => ratio is
                  exactly 1.0) and threaded chunk-parallel, plus one-shot,
                  threaded-parallel and speculative inflate.
  device        — TPU phases: TRACED phases first (vectorized-matcher
                  kernel encode, vector decode, Pallas inflate, foreign
                  kernel, swarm), then the chip-verified kernel-path
                  ratio in a FRESH subprocess (the tunnel client dies once
                  too many large programs accumulate — chip-bisected).
                  All throughputs are from jax.profiler DEVICE traces; a
                  wall-clock number is banked before each trace attempt
                  (block_until_ready measured up to ~40x optimistic on
                  this tunnel, so wall numbers are labeled as such).
  decode_sweep  — chunked-input streaming decode (input fed in 2^N-byte
                  pieces, N=4..24), mirroring blogpost-uncompress.rs.

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
KCHUNK = 32 * 1024  # the kernel-engine chunk size (SMEM position space)
BATCH = 16
LEVEL = 6
LEVELS_MATRIX = (1, 6, 9)
LEVELS_SWEEP = tuple(range(10))

T0 = time.monotonic()
BUDGET = float(os.environ.get("ZRS_BENCH_BUDGET_S", "1200"))
PHASE_SECONDS = {}
if os.environ.get("ZRS_BENCH_TARGET_MB"):
    TARGET_SIZE = int(float(os.environ["ZRS_BENCH_TARGET_MB"]) * 1024 * 1024)


def remaining() -> float:
    return BUDGET - (time.monotonic() - T0)


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


def _phase(name):
    """Record phase wall time; usage: with _phase('x'): ..."""

    class _P:
        def __enter__(self):
            self.t = time.monotonic()

        def __exit__(self, *exc):
            PHASE_SECONDS[name] = round(
                PHASE_SECONDS.get(name, 0.0) + time.monotonic() - self.t, 1
            )
            return False

    return _P()


def _time_best(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _time_median(fn, reps=5):
    """Median-of-reps wall time (r4 verdict: single-rep host numbers on
    this shared box swing 2x and produced a non-monotonic level curve
    contradicting STATUS; the r4 2^19/2^21 decode-sweep dips were the
    same artifact — medians-of-5 reproduce smooth 160-190 MB/s)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def bench_cpu(data: bytes) -> dict:
    n = len(data)
    out = {"compress": {}}
    zstreams = {}
    for lvl in LEVELS_SWEEP:
        reps = 5 if lvl in LEVELS_MATRIX else 3
        t = _time_median(lambda l=lvl: zlib.compress(data, l), reps=reps)
        zstreams[lvl] = zlib.compress(data, lvl)
        out["compress"][str(lvl)] = {
            "gbps": round(n / t / 1e9, 4),
            "bytes": len(zstreams[lvl]),
        }
    z6 = zstreams[LEVEL]
    t = _time_median(lambda: zlib.decompress(z6), reps=5)
    out["inflate_gbps"] = round(n / t / 1e9, 4)
    return out, zstreams


def bench_native(data: bytes, zstreams: dict) -> dict:
    from zlib_rs_tpu import native

    if not native.available():
        return {"available": False}
    n = len(data)
    out = {"available": True, "compress": {}, "parallel_compress": {}}
    for lvl in LEVELS_SWEEP:
        reps = 5 if lvl in LEVELS_MATRIX else 2
        raw = native.deflate_chunk(data, level=lvl, final=True)
        t = _time_median(
            lambda l=lvl: native.deflate_chunk(data, level=l, final=True), reps=reps
        )
        zref = zstreams[lvl]
        # zlib stream = 2-byte hdr + raw + 4-byte adler; compare raw-to-raw
        out["compress"][str(lvl)] = {
            "gbps": round(n / t / 1e9, 4),
            "ratio_vs_zlib": round(len(raw) / (len(zref) - 6), 4),
            "bit_exact": raw == zref[2:-4],
        }
    for lvl in LEVELS_MATRIX:
        zref = zstreams[lvl]
        tp = _time_median(
            lambda l=lvl: native.deflate_parallel(
                data, level=l, chunk_size=CHUNK, prime_dict=True
            ),
            reps=3,
        )
        pout = native.deflate_parallel(data, level=lvl, chunk_size=CHUNK, prime_dict=True)
        assert zlib.decompress(pout, -15) == data
        out["parallel_compress"][str(lvl)] = {
            "gbps": round(n / tp / 1e9, 4),
            "ratio_vs_zlib": round(len(pout) / (len(zref) - 6), 4),
        }
    # QUICK fast mode (static trees, single probe, emit-in-scan): the speed
    # story at the level-1 end; ratio reported against zlib level 1
    q = native.deflate_chunk(data, level=native.QUICK, final=True)
    assert zlib.decompress(q, -15) == data
    tq = _time_best(
        lambda: native.deflate_chunk(data, level=native.QUICK, final=True), reps=2
    )
    out["quick"] = {
        "gbps": round(n / tq / 1e9, 4),
        "ratio_vs_zlib1": round(len(q) / (len(zstreams[1]) - 6), 4),
    }
    # MEDIUM mode (zlib-ng's deflate_medium class, medium.rs:12-331):
    # ratio measured against the SAME-NUMBER zlib level
    out["medium"] = {}
    for mlvl, zl in ((native.MEDIUM4, 4), (native.MEDIUM5, 5), (native.MEDIUM6, 6)):
        m = native.deflate_chunk(data, level=mlvl, final=True)
        assert zlib.decompress(m, -15) == data
        tm = _time_best(
            lambda lv=mlvl: native.deflate_chunk(data, level=lv, final=True), reps=2
        )
        out["medium"][str(zl)] = {
            "gbps": round(n / tm / 1e9, 4),
            "ratio_vs_zlib": round(len(m) / (len(zstreams[zl]) - 6), 4),
        }

    raw6 = native.deflate_chunk(data, level=LEVEL, final=True)
    t = _time_median(lambda: native.inflate_raw(raw6, n), reps=5)
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
    """Streaming decode with input fed in 2^N-byte pieces for N=4..24 (the
    reference's blogpost-uncompress chunked sweep, bench.yml:55-64) through
    the PRODUCTION streaming path — models/stream.py Inflate, which routes
    to the resumable native engine (zrs_istream_*) when built. The pure
    Python Inflator (the semantics-reference engine) is reported once at
    2^14 for scale."""
    from zlib_rs_tpu.models.stream import Inflate
    from zlib_rs_tpu.models.inflate import Inflator
    from zlib_rs_tpu.config import InflateConfig, InflateFlush

    slice_ = data[: 4 * 1024 * 1024]
    z = zlib.compress(slice_, LEVEL)
    out = {}
    for nbits in range(4, 25):
        step = 1 << nbits
        # small feeds dominate in Python-call overhead; shrink the corpus
        # below 2^10 so the sweep stays fast but still measures the path
        sl = slice_[: 256 * 1024] if nbits < 10 else slice_
        zz = zlib.compress(sl, LEVEL) if nbits < 10 else z
        times = []
        for _rep in range(3):
            t0 = time.perf_counter()
            inf = Inflate()
            produced = 0
            for i in range(0, len(zz), step):
                _st, _consumed, chunk = inf.decompress(zz[i : i + step], None)
                produced += len(chunk)
            times.append(time.perf_counter() - t0)
            assert produced == len(sl)
        times.sort()
        out[f"2^{nbits}"] = round(len(sl) / times[1] / 1e6, 2)  # median MB/s
    # reference-engine row (the exact Python semantics engine)
    sl = slice_[: 256 * 1024]
    zz = zlib.compress(sl, LEVEL)
    t0 = time.perf_counter()
    inf = Inflator(InflateConfig(window_bits=15))
    produced = 0
    for i in range(0, len(zz), 1 << 14):
        _rc, _c, chunk = inf.inflate(zz[i : i + (1 << 14)], None, InflateFlush.NO_FLUSH)
        produced += len(chunk)
    assert produced == len(sl)
    out["pure_engine_2^14"] = round(len(sl) / (time.perf_counter() - t0) / 1e6, 2)
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


class _watchdog:
    """SIGALRM-based phase timeout: the tunnel-attached chip can wedge any
    device sync/fetch indefinitely; every device phase runs under one of
    these so the bench always terminates and prints its JSON line."""

    def __init__(self, seconds, label):
        self.seconds = max(1, int(seconds))
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


def _stop_leaked_trace():
    """Close a profiler session a previous (watchdog-interrupted) phase may
    have leaked; harmless when none is active."""
    try:
        import jax

        jax.profiler.stop_trace()
        _log("closed a leaked profiler session")
    except Exception:
        pass


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

    def attempt():
        with jax.profiler.trace(trace_dir):
            out = None
            for _ in range(reps):
                out = dispatch()
            jax.block_until_ready(out)

    try:
        with _watchdog(timeout_s, f"device trace {tag}"):
            # wall-clock FIRST: starting the tunnel profiler with enough
            # compiled programs resident KILLS THE WHOLE CLIENT (chip-
            # bisected: any trace start after the big encode-batch program
            # family is loaded fails INVALID_ARGUMENT and every later
            # dispatch dies) — so bank a wall number before risking it
            t0 = time.monotonic()
            out = None
            for _ in range(reps):
                out = dispatch()
            jax.block_until_ready(out)
            wall = (time.monotonic() - t0) / reps
            try:
                attempt()
            except TimeoutError:
                raise
            except Exception as e:
                _log(
                    f"trace {tag} failed ({type(e).__name__}): keeping the "
                    "pre-banked wall-clock number"
                )
                return wall, {"__wall_clock__": True}
    except BaseException:
        # a wedged tunnel call can blow the watchdog INSIDE the trace
        # context; make sure the profiler session is closed or every
        # later phase fails with "Profile has already been started"
        _stop_leaked_trace()
        raise
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


def _phase_kernel_encode(data, flat, dev):
    """Kernel-engine encode at its native configuration (32 KiB chunks +
    ~31 KiB priming dict). The r5 matcher: uint32-keyed sorted-space
    tables (one packed compare carry, 4x-unrolled fori, word-granular
    lengths past 8 bytes), hop tables with literal-run deltas, a
    delta-jump chase with 4-bank word-wise literal histogram, VPU
    len/dist symbol counts, and the chip-swept level-6 knobs
    (chain 64, 24-byte scan: ratio 1.0003x zlib-6). r5 chip trace:
    29.1 MB/s/chip (r4: 21.2). ZRS_TPU_TABSCAN=0 selects the round-3
    SMEM chain-walk kernel. The trace normalizes per input byte."""
    import jax
    import jax.numpy as jnp

    from zlib_rs_tpu.ops import lz77
    from zlib_rs_tpu.parallel import pipeline as P

    knobs = P._level_knobs(LEVEL)
    KB = 8  # small batch: the trace only needs a steady-state rate
    KDICT = 31976
    karr = np.zeros((KB, KDICT + KCHUNK + lz77.PAD), np.uint8)
    kvf = np.zeros((KB,), np.int32)
    for k in range(KB):
        seg = flat[k * KCHUNK : (k + 1) * KCHUNK]
        karr[k, KDICT : KDICT + seg.shape[0]] = seg
        dlen = min(KDICT, k * KCHUNK)
        if dlen:
            karr[k, KDICT - dlen : KDICT] = flat[k * KCHUNK - dlen : k * KCHUNK]
        kvf[k] = KDICT - dlen
    kdc = jnp.asarray(karr)
    knv = jnp.full((KB,), KDICT + KCHUNK, jnp.int32)
    kfins = jnp.zeros((KB,), jnp.int32)
    kvfj = jnp.asarray(kvf)

    def kernel_once():
        return P._encode_batch(
            kdc, knv, kfins, kvfj, chunk_size=KCHUNK, dynamic=True,
            dict_size=KDICT, kernel_scan=True, **knobs
        )

    with _watchdog(min(480, remaining() - 30), "kernel-scan encode compile"):
        jax.block_until_ready(kernel_once())
    _log("kernel-scan encode compiled")
    sec, progs = _device_trace_seconds(
        kernel_once, 1, "kencode", min(420, remaining() - 30)
    )
    if sec and progs.get("__wall_clock__"):
        dev["kernel_encode_wallclock_gbps"] = round(KB * KCHUNK / sec / 1e9, 5)
        _log(
            f"kernel-scan encode WALL-CLOCK (profiler down) "
            f"{dev['kernel_encode_wallclock_gbps']} GB/s ({sec:.2f}s/batch)"
        )
    elif sec:
        dev["kernel_encode_trace_s_per_batch"] = round(sec, 3)
        dev["kernel_encode_trace_gbps"] = round(KB * KCHUNK / sec / 1e9, 5)
        dev["kernel_encode_trace_programs"] = progs
        _log(
            f"kernel-scan encode device-trace "
            f"{dev['kernel_encode_trace_gbps']} GB/s ({sec:.2f}s/batch)"
        )


def _phase_pallas_inflate(data, dev):
    """Pallas sequential-inflate kernel over independently-coded 32 KiB
    chunk bodies (the kernel engine's decode configuration). Bodies come
    from the native engine (bit-exact, instant) — the kernel decodes any
    raw-deflate stream, so the producer doesn't matter."""
    import jax
    import jax.numpy as jnp

    from zlib_rs_tpu import native as NV
    from zlib_rs_tpu.parallel import swarm_inflate as SW

    if not NV.available():
        raise RuntimeError("native engine unavailable for body generation")
    NB = 16
    bodies = [
        NV.deflate_chunk(data[k * KCHUNK : (k + 1) * KCHUNK], level=LEVEL, final=True)
        for k in range(NB)
    ]
    out_sizes = [KCHUNK] * NB
    with _watchdog(min(420, remaining() - 30), "pallas inflate compile+verify"):
        parts = SW.decode_chunks_kernel(bodies, out_sizes, interpret=False)
        exp = data[: NB * KCHUNK]
        assert b"".join(parts) == exp, "pallas inflate kernel output mismatch"
    _log("pallas inflate kernel: chip compile + decode verified")

    dispatch = SW.make_kernel_dispatch(bodies, out_sizes)
    sec, progs = _device_trace_seconds(
        dispatch, 1, "pallas_kernel", min(360, remaining() - 30)
    )
    if sec and progs.get("__wall_clock__"):
        dev["pallas_inflate_wallclock_gbps"] = round(sum(out_sizes) / sec / 1e9, 5)
    elif sec:
        dev["pallas_inflate_kernel_trace_s"] = round(sec, 3)
        dev["pallas_inflate_kernel_gbps"] = round(sum(out_sizes) / sec / 1e9, 5)
        _log(
            f"pallas inflate kernel device-trace "
            f"{dev['pallas_inflate_kernel_gbps']} GB/s"
        )


def _phase_foreign_kernel(data, dev):
    """FOREIGN monolithic stream (stdlib zlib) -> native zran index (host
    skim) -> region decode on the Pallas kernel with 32 KiB window priming
    and sub-byte start bits (round-3 capability; VERDICT r2 item 7). The
    trace captures device seconds only; the host index pass is reported
    separately as wall time."""
    import zlib as _z

    slice_ = bytes(data[: 4 * 1024 * 1024])
    z = _z.compress(slice_, LEVEL)
    from zlib_rs_tpu.parallel.inflate import decompress_foreign

    t0 = time.monotonic()
    with _watchdog(min(480, remaining() - 60), "foreign kernel decode"):
        with _phase("device:foreign_trace"):
            import jax

            trace_dir = f"/tmp/zrs_foreign_{os.getpid()}"
            with jax.profiler.trace(trace_dir):
                out = decompress_foreign(z, span=KCHUNK, engine="kernel")
    assert out == slice_
    wall = time.monotonic() - t0
    # pull the device span out of the trace
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    sec = None
    if files:
        with gzip.open(files[-1]) as f:
            tr = json.load(f)
        pid_names = {
            e["pid"]: e["args"].get("name", "")
            for e in tr.get("traceEvents", [])
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        tot = sum(
            e.get("dur", 0) / 1e6
            for e in tr.get("traceEvents", [])
            if e.get("ph") == "X"
            and "TPU" in pid_names.get(e.get("pid"), "")
            and e.get("name", "").startswith("jit_")
        )
        sec = tot or None
    if sec:
        dev["foreign_kernel_decode_trace_s"] = round(sec, 3)
        dev["foreign_kernel_decode_gbps"] = round(len(slice_) / sec / 1e9, 5)
    dev["foreign_kernel_decode_wall_s"] = round(wall, 1)
    dev["foreign_kernel_decode_bytes"] = len(slice_)
    _log(
        f"foreign kernel decode (zran seeds + window priming): device "
        f"{dev.get('foreign_kernel_decode_gbps')} GB/s, wall {wall:.0f}s incl "
        f"index + compile"
    )


def _phase_kernel_ratio(data, dev):
    """Chip-verified kernel-path ratio at the kernel engine configuration.
    The measured kernel encode rate sizes the prefix so this phase fits its
    time box; ratio_bytes records what was actually compressed."""
    import zlib as _z

    rate = (dev.get("kernel_encode_trace_gbps") or 0.004) * 1e9  # bytes/s
    box = min(600.0, remaining() - 120)
    if box < 120:
        raise TimeoutError("no time box left for kernel ratio")
    nbytes = int(min(len(data), max(1 << 20, rate * box * 0.6)))
    nbytes = (nbytes // KCHUNK) * KCHUNK
    prefix = bytes(data[:nbytes])
    os.environ["ZRS_TPU_KERNEL"] = "1"
    try:
        from zlib_rs_tpu.parallel.pipeline import compress_parallel as _cp

        with _watchdog(box, "kernel ratio"):
            t0 = time.monotonic()
            comp = _cp(prefix, level=LEVEL, chunk_size=KCHUNK)
            wall = time.monotonic() - t0
    finally:
        os.environ.pop("ZRS_TPU_KERNEL", None)
    assert _z.decompress(comp) == prefix
    zref = len(_z.compress(prefix, LEVEL))
    dev["kernel_ratio_vs_zlib"] = round(len(comp) / zref, 4)
    dev["kernel_ratio_bytes"] = nbytes
    # steady-state e2e: the first call above paid every compile; a second
    # call measures the wall rate a long-running user actually sees
    if remaining() > 60:
        os.environ["ZRS_TPU_KERNEL"] = "1"
        try:
            with _watchdog(min(60, remaining() - 20), "kernel ratio steady"):
                t0 = time.monotonic()
                _cp(prefix, level=LEVEL, chunk_size=KCHUNK)
                dev["kernel_e2e_steady_gbps"] = round(
                    nbytes / (time.monotonic() - t0) / 1e9, 5
                )
        except Exception:
            pass
        finally:
            os.environ.pop("ZRS_TPU_KERNEL", None)
    # wall-clock e2e (host batching + device + assembly): compress_parallel
    # materializes every batch on host, so unlike pure dispatch loops this
    # wall time is real work — an honest end-to-end LOWER bound
    dev["kernel_e2e_wall_gbps"] = round(nbytes / wall / 1e9, 5)
    _log(
        f"kernel-path ratio (chip round-trip verified) "
        f"{dev['kernel_ratio_vs_zlib']} over {nbytes} bytes; "
        f"e2e wall {dev['kernel_e2e_wall_gbps']} GB/s"
    )


def _phase_vector(seed_pkl, dev):
    """Lane-parallel vector decode (parallel/vector_inflate + the vhuff
    Pallas kernels): the headline device decode engine — VPU Huffman at
    ~3 GB/s feeding the in-SMEM two-plane expansion (builder-measured
    182 MB/s/chip on the seedable probe corpus, ~120 MB/s on this
    literal-denser silesia-proxy corpus). Exactness is verified against
    the raw-deflate oracle BEFORE any timing lands in the JSON."""
    import pickle
    import zlib as _z

    import jax

    from zlib_rs_tpu.parallel import vector_inflate as VI

    blob = pickle.load(open(seed_pkl, "rb"))
    seeded = [k for k, s in enumerate(blob["seeds"]) if s is not None]
    bodies = [
        blob["comp"][blob["index"][k][0] : blob["index"][k][0] + blob["index"][k][1]]
        for k in seeded
    ]
    out_sizes = [blob["index"][k][2] for k in seeded]
    seeds = [blob["seeds"][k] for k in seeded]
    if not bodies:
        _log("vector decode skipped: no seeded chunks")
        return
    # tile the batch to a meaningful measurement size (~8 MiB output)
    tile = max(1, (8 << 20) // max(1, sum(out_sizes)))
    bodies, out_sizes, seeds = bodies * tile, out_sizes * tile, seeds * tile
    # cold kernel compile alone measured ~190s on the tunnel chip — the
    # exactness box must cover compile + decode, not just decode
    with _watchdog(min(360, remaining() - 30), "vector exactness"):
        parts = VI.decode_chunks_vector(bodies, out_sizes, seeds, interpret=False)
    for part, body, osz in zip(parts, bodies, out_sizes):
        ref = _z.decompressobj(-15).decompress(body)[:osz]
        if part != ref:
            raise ValueError("vector decode mismatch vs raw-deflate oracle")
    _log("vector decode byte-exact vs oracle")
    dispatch = VI.make_vector_dispatch(bodies, out_sizes, seeds)
    with _watchdog(min(120, remaining() - 30), "vector compile"):
        jax.block_until_ready(dispatch())
    sec, progs = _device_trace_seconds(
        dispatch, 5, "vector", min(240, remaining() - 30)
    )
    if sec and progs.get("__wall_clock__"):
        dev["vector_decode_wallclock_gbps"] = round(sum(out_sizes) / sec / 1e9, 5)
        _log(f"vector decode WALL-CLOCK (profiler down) {dev['vector_decode_wallclock_gbps']} GB/s")
        return
    if sec:
        out_bytes = sum(out_sizes)
        dev["vector_decode_trace_s"] = round(sec, 4)
        dev["vector_decode_trace_gbps"] = round(out_bytes / sec / 1e9, 5)
        dev["vector_decode_chunks"] = len(bodies)
        for pname, psec in progs.items():
            if "decode_tokens_vector" in pname:
                dev["vector_huffman_trace_s"] = round(psec / 5, 4)
            elif "expand" in pname:
                dev["vector_expand_trace_s"] = round(psec / 5, 4)
        _log(f"vector decode device-trace {dev['vector_decode_trace_gbps']} GB/s")


def _phase_swarm(seed_pkl, dev):
    """Seed-parallel exact decode of our own indexed stream
    (parallel/swarm_inflate); seeds come from the CPU-pinned child."""
    import pickle

    import jax
    import jax.numpy as jnp

    from zlib_rs_tpu.parallel import swarm_inflate as SW

    blob = pickle.load(open(seed_pkl, "rb"))
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
        return SW.decode_seeded(cj, llj, ddj, sbj, ssj, cap=cap, max_out=CHUNK)

    with _watchdog(min(300, remaining() - 30), "swarm compile"):
        jax.block_until_ready(swarm_once())
    _log("swarm decode compiled")
    sec, progs = _device_trace_seconds(
        swarm_once, 1, "swarm", min(300, remaining() - 30)
    )
    if sec and progs.get("__wall_clock__"):
        dev["swarm_decode_wallclock_gbps"] = round(
            sum(out_sizes) * tile / sec / 1e9, 5
        )
    elif sec:
        out_bytes = sum(out_sizes) * tile
        dev["swarm_decode_trace_s"] = round(sec, 3)
        dev["swarm_decode_trace_gbps"] = round(out_bytes / sec / 1e9, 5)
        dev["swarm_decode_lanes"] = Bsw
        _log(f"swarm decode device-trace {dev['swarm_decode_trace_gbps']} GB/s")


def _phase_xla_encode(data, flat, dev):
    """Legacy XLA-matcher encode at the 128 KiB default configuration —
    wedge-prone compile (the round-2 killer), so it runs LAST with a short
    leash and only when ample time remains."""
    import jax
    import jax.numpy as jnp

    from zlib_rs_tpu.ops import lz77
    from zlib_rs_tpu.parallel import pipeline as P

    knobs = P._level_knobs(LEVEL)
    arr = np.zeros((BATCH, CHUNK + lz77.PAD), np.uint8)
    for k in range(BATCH):
        seg = flat[k * CHUNK : (k + 1) * CHUNK]
        arr[k, : seg.shape[0]] = seg
    dc = jnp.asarray(arr)
    nv = jnp.full((BATCH,), CHUNK, jnp.int32)
    fins = jnp.zeros((BATCH,), jnp.int32)

    def run_once():
        return P._encode_batch(dc, nv, fins, chunk_size=CHUNK, dynamic=True, **knobs)

    with _watchdog(min(300, remaining() - 120), "xla encode compile"):
        jax.block_until_ready(run_once())
    _log("xla encode compiled")
    sec, progs = _device_trace_seconds(
        run_once, 1, "encode", min(300, remaining() - 60)
    )
    if sec and progs.get("__wall_clock__"):
        dev["encode_wallclock_gbps"] = round(BATCH * CHUNK / sec / 1e9, 5)
    elif sec:
        dev["encode_trace_s_per_batch"] = round(sec, 3)
        dev["encode_trace_gbps"] = round(BATCH * CHUNK / sec / 1e9, 5)
        dev["encode_trace_programs"] = progs
        _log(f"xla encode device-trace {dev['encode_trace_gbps']} GB/s ({sec:.2f}s/batch)")


def bench_device(data: bytes, seed_pkl: str | None, emit=None, only=None) -> dict:
    """Device phases, most-valuable-first, each gated on remaining() so the
    bench always finishes inside the global budget (VERDICT r2 item 1).
    `emit(dev)` is called after every phase so partial results survive a
    parent-side kill (VERDICT r3 item 2)."""
    flat = np.frombuffer(data, np.uint8)
    dev = {}
    _log("device measurement first (no prior fetch)")
    phases = [
        # ratio first: it is cheap since the full-kernel encode (round-3
        # run: 11s wall for 8 MiB), it chip-verifies a full round trip,
        # and it records an e2e wall lower bound even if later traces
        # wedge on the tunnel
        # TRACED phases first: the tunnel profiler dies (taking the whole
        # client with it) once too many large programs are resident —
        # chip-bisected to the compress_parallel/_encode_batch@B16 family
        # that kernel_ratio compiles, so that phase now runs AFTER every
        # trace
        ("kernel_encode", 180, lambda: _phase_kernel_encode(data, flat, dev)),
        ("vector_decode", 260, lambda: _phase_vector(seed_pkl, dev)),
        ("pallas_inflate", 150, lambda: _phase_pallas_inflate(data, dev)),
        ("foreign_kernel", 240, lambda: _phase_foreign_kernel(data, dev)),
        ("swarm", 150, lambda: _phase_swarm(seed_pkl, dev)),
        ("kernel_ratio", 180, lambda: _phase_kernel_ratio(data, dev)),
        # a blocked tunnel call can outlive SIGALRM watchdogs (round-3
        # observation: this phase ran 1118s past a 300s alarm), so it only
        # runs with a large reserve — or as the encode fallback when the
        # kernel phase produced nothing
        ("xla_encode", 1200, lambda: _phase_xla_encode(data, flat, dev)),
    ]
    for name, need, fn in phases:
        if only is not None and name not in only:
            continue
        if name in ("swarm", "vector_decode") and seed_pkl is None:
            _log(f"{name} skipped: no seed pickle")
            continue
        if name == "xla_encode" and dev.get("kernel_encode_trace_gbps") is None:
            need = 500  # fallback encode number is worth a tighter squeeze
        if remaining() < need:
            _log(f"{name} skipped: {remaining():.0f}s left < {need}s needed")
            continue
        _stop_leaked_trace()
        try:
            with _phase(f"device:{name}"):
                fn()
        except Exception as e:
            _log(f"{name} phase failed: {type(e).__name__}: {str(e)[:300]}")
        if emit is not None:
            emit(dev)
    return dev


def _device_child_main(seed_pkl: str | None, only=None) -> None:
    """Entry point for the killable device subprocess: run the device
    phases, print 'DEVPART <json>' after EVERY phase (the parent merges
    the last one received), exit 0. The parent enforces the hard deadline
    with SIGKILL — watchdogs here are best-effort only."""
    data = load_corpus()

    def emit(dev):
        print(
            "DEVPART " + json.dumps({"dev": dev, "phase_seconds": PHASE_SECONDS}),
            flush=True,
        )

    dev = bench_device(data, seed_pkl, emit=emit, only=only)
    emit(dev)


def _compose_result(result, device, cpu, native, sweep):
    """Recompute the derived headline fields into `result` (called before
    every incremental snapshot — last printed line wins)."""
    base6 = None
    if cpu:
        base6 = cpu["compress"][str(LEVEL)]["gbps"]
    # headline: the best trace-measured device encode engine (the SMEM
    # scan kernel when it compiled, else the XLA matcher path); when
    # every trace wedged on the tunnel, fall back to the kernel-ratio
    # phase's e2e wall rate — real work (per-batch host materialization
    # + verified round trip), just host-inclusive
    headline = max(
        device.get("encode_trace_gbps") or 0.0,
        device.get("kernel_encode_trace_gbps") or 0.0,
    )
    headline_src = "device trace"
    if not headline and device.get("kernel_encode_wallclock_gbps"):
        # the profiler-down fallback: a block_until_ready dispatch loop
        # (can read optimistic on this tunnel — labeled accordingly)
        headline = device["kernel_encode_wallclock_gbps"]
        headline_src = "wall-clock dispatch loop (profiler unavailable)"
    if not headline and device.get("kernel_e2e_wall_gbps"):
        headline = device["kernel_e2e_wall_gbps"]
        headline_src = "e2e wall incl host (no device trace landed yet)"
    result.update(
        {
            "value": round(headline, 5),
            "value_source": headline_src,
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
                "tunnel-attached chip; only trace spans are reported. The "
                "native C++ engine numbers (native.*) are the CPU "
                "production path; native one-shot output is byte-identical "
                "to zlib. Absolute host GB/s on this shared box swing ~2x "
                "run-to-run; trust the ratios vs same-run zlib."
            ),
            "device": device,
            "device_unreachable": not device,
            "native": native,
            "cpu_zlib": cpu,
            "host_stream_decode_mbps_by_input_chunk": sweep,
            "phase_seconds": PHASE_SECONDS,
            "budget_s": BUDGET,
            "elapsed_s": round(time.monotonic() - T0, 1),
        }
    )
    return result


def _compact_result(result, device):
    """The driver-facing headline: a single JSON line guaranteed <500
    bytes (tested in tests/test_bench_phases.py) so the driver's stdout
    tail window can never truncate its head. The full result dict is
    printed on the line above it at every snapshot."""
    native = result.get("native") or {}
    src_tag = result.get("value_source", "")
    if result.get("device_unreachable"):
        src_tag = "DEVICE UNREACHABLE (tunnel outage): value is not a measurement"
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "value_source": src_tag[:80],
        "vs_baseline": result.get("vs_baseline"),
        "kernel_ratio": result.get("ratio_vs_zlib"),
        "vector_decode_gbps": device.get("vector_decode_trace_gbps"),
        # steady-state (warm) e2e when measured; the first-call wall pays
        # every compile and reads ~100x pessimistic
        "e2e_wall_gbps": (
            device.get("kernel_e2e_steady_gbps")
            or device.get("kernel_e2e_wall_gbps")
        ),
        "native_inflate_gbps": native.get("inflate_gbps"),
        "parallel_inflate_gbps": native.get("parallel_inflate_gbps"),
        "elapsed_s": result.get("elapsed_s"),
    }
    line = json.dumps(compact)
    if len(line) >= 500:  # belt-and-braces: drop optional keys in order
        for k in ("elapsed_s", "parallel_inflate_gbps",
                  "native_inflate_gbps", "e2e_wall_gbps"):
            compact.pop(k, None)
            if len(json.dumps(compact)) < 500:
                break
    return compact


def _run_device_subprocess(seed_pkl, device, snapshot, phases=None,
                           reserve=60):
    """Run device phases in a KILLABLE child: a wedged tunnel call can
    outlive SIGALRM (the handler cannot preempt a blocked C call — round 3
    saw a phase run 1118s past a 300s alarm) but not SIGKILL. The child
    prints 'DEVPART <json>' after every phase; each is merged + snapshotted
    immediately, so the final kill loses nothing already measured.

    `phases` restricts the child to named phases — used to give
    kernel_ratio a FRESH process: the tunnel backend dies (compiles AND
    profiler) once too many large programs accumulate in one client, and
    ratio's compress_parallel program family is the largest."""
    import threading

    deadline = remaining() - reserve
    if deadline < 60:
        _log("device subprocess skipped: no budget left")
        return
    env = dict(os.environ)
    env["ZRS_BENCH_BUDGET_S"] = str(max(60, int(deadline - 10)))
    args = [sys.executable, os.path.abspath(__file__), "--device-child"]
    if phases:
        args.append("--phases=" + ",".join(phases))
    if seed_pkl:
        args.append(seed_pkl)
    proc = subprocess.Popen(
        args, stdout=subprocess.PIPE, stderr=sys.stderr, text=True, env=env,
    )

    def reader():
        for line in proc.stdout:
            if line.startswith("DEVPART "):
                try:
                    part = json.loads(line[8:])
                except json.JSONDecodeError:
                    continue
                device.update(part.get("dev", {}))
                for k, v in part.get("phase_seconds", {}).items():
                    PHASE_SECONDS[k] = v
                snapshot()

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        proc.wait(timeout=max(1, deadline))
        _log("device subprocess finished")
    except subprocess.TimeoutExpired:
        _log("device subprocess hit the hard deadline: SIGKILL")
        proc.kill()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            pass
    t.join(timeout=10)


def main():
    result = {
        "metric": f"parallel_deflate_level{LEVEL}_device_gbps",
        "value": 0.0,
        "unit": "GB/s",
        "vs_baseline": None,
    }
    device = {}
    state = {"cpu": None, "native": None, "sweep": None}
    ratio_proc = seed_proc = None
    seed_pkl = f"/tmp/zrs_bench_seeded_{os.getpid()}.pkl"

    def snapshot():
        _compose_result(
            result, device, state["cpu"], state["native"], state["sweep"]
        )
        # Two lines per snapshot, FULL then COMPACT, so the LAST stdout
        # line is always a <500-byte JSON the driver's tail window can
        # parse whole (r01-r04 all lost the head of the ~4KB full dict
        # to tail truncation -> parsed=null despite rc=0).
        print(json.dumps(result), flush=True)
        print(json.dumps(_compact_result(result, device)), flush=True)

    try:
        data = load_corpus()
        n = len(data)
        result["corpus"] = "silesia-proxy tar (reference test-data + system binaries)"
        result["corpus_bytes"] = n
        _log(f"corpus silesia-proxy tar, {n} bytes; budget {BUDGET:.0f}s")
        snapshot()  # first parseable line lands before any slow work

        # CPU-pinned children run CONCURRENTLY with everything below:
        # the 128 KiB-pipeline ratio check and the swarm seed stream.
        repo = repr(os.path.dirname(os.path.abspath(__file__)))
        ratio_proc = subprocess.Popen(
            [sys.executable, "-c", RATIO_CHILD.replace("{REPO!r}", repo)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        seed_proc = subprocess.Popen(
            [sys.executable, "-c", SEEDED_CHILD.replace("{REPO!r}", repo).replace(
                "{OUT!r}", repr(seed_pkl))],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )

        with _phase("cpu"):
            state["cpu"], zstreams = bench_cpu(data)
        _log(f"cpu zlib: {state['cpu']}")
        snapshot()
        with _phase("native"):
            state["native"] = bench_native(data, zstreams)
        _log(f"native: {state['native']}")
        snapshot()

        # wait (briefly) for the seed child so the device phases have input
        if seed_proc is not None:
            try:
                seed_proc.wait(timeout=max(1, min(120, remaining() - 600)))
            except subprocess.TimeoutExpired:
                pass
        have_seeds = os.path.exists(seed_pkl)

        with _phase("device_total"):
            _run_device_subprocess(
                seed_pkl if have_seeds else None, device, snapshot,
                phases=("kernel_encode", "vector_decode", "pallas_inflate",
                        "foreign_kernel", "swarm", "xla_encode"),
                reserve=360,  # keep room for the ratio child + assembly
            )
        snapshot()
        with _phase("device_ratio"):
            _run_device_subprocess(
                None, device, snapshot, phases=("kernel_ratio",), reserve=60
            )
        snapshot()

        # collect the concurrent CPU ratio child BEFORE the sweep so its
        # CPU-pinned work cannot contend with the sweep timings
        if ratio_proc is not None:
            try:
                out_txt, _ = ratio_proc.communicate(timeout=max(1, min(300, remaining())))
                for line in out_txt.splitlines():
                    if line.startswith("RATIO "):
                        device["ratio_vs_zlib"] = round(json.loads(line[6:])["ratio"], 4)
                        _log(f"device-pipeline ratio (cpu-verified) {device['ratio_vs_zlib']}")
            except subprocess.TimeoutExpired:
                ratio_proc.kill()
                _log("cpu ratio child timed out")
            ratio_proc = None

        # decode sweep LAST: the concurrent ratio/seed children are
        # CPU-pinned and depressed the 2^19/2^21 sweep rows 4x in r4/r5
        # runs (the "reproducible dips" were self-contention, not a
        # buffer pathology — the same sweep in an idle process is
        # monotone 160-190 MB/s)
        with _phase("decode_sweep"):
            state["sweep"] = bench_decode_sweep(data)
        _log(f"host streaming decode sweep (MB/s): {state['sweep']}")
        snapshot()
    except Exception as e:
        _log(f"bench main failed: {type(e).__name__}: {e}")
    finally:
        for p in (ratio_proc, seed_proc):
            if p is not None and p.poll() is None:
                p.kill()
        if not device:
            _log(
                "DEVICE UNREACHABLE for this entire run (tunnel outage): the "
                "value field is 0.0, NOT a measurement. Last trace-measured "
                "numbers and methodology are recorded in STATUS.md."
            )
        snapshot()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--device-child":
        rest = sys.argv[2:]
        only = None
        if rest and rest[0].startswith("--phases="):
            only = tuple(rest[0][len("--phases="):].split(","))
            rest = rest[1:]
        _device_child_main(rest[0] if rest else None, only=only)
    else:
        main()
