"""Chip ablation: K-interleaved inflate kernel vs the single-stream kernel.

Measures device-trace GB/s for K in {2, 4, 8} on 32 KiB chunk bodies of the
bench corpus (text-heavy head and binary-heavy tail), against the round-2
single-stream kernel as baseline. Run on the real chip.
"""
import os, sys, glob, gzip as gz, json, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def trace_seconds(fn, reps, tag):
    trace_dir = f"/tmp/ilk_{tag}_{os.getpid()}"
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        return None
    with gz.open(files[-1]) as f:
        trace = json.load(f)
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    total = 0.0
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "TPU" not in pid_names.get(e.get("pid"), ""):
            continue
        if e.get("name", "").startswith("jit_"):
            total += e.get("dur", 0) / 1e6
    return total / reps if total > 0 else None


def main():
    from bench import load_corpus, KCHUNK, LEVEL
    from zlib_rs_tpu import native as NV
    from zlib_rs_tpu.ops.pallas.inflate_kernel import (
        decode_streams_pallas, pack_streams_words,
    )
    from experiments.inflate_ilk import decode_streams_ilk

    data = load_corpus()
    NB = 16
    mk = lambda off: [
        NV.deflate_chunk(data[off + k * KCHUNK : off + (k + 1) * KCHUNK],
                         level=LEVEL, final=True)
        for k in range(NB)
    ]
    sets = {"text": mk(0), "binary": mk(4 * 1024 * 1024)}
    for name, bodies in sets.items():
        out_sizes = [KCHUNK] * NB
        words, bits = pack_streams_words(bodies)
        wa = jnp.asarray(words)
        sb = jnp.zeros((NB,), jnp.int32)
        cb = jnp.asarray(bits)
        ol = jnp.asarray(np.asarray(out_sizes, np.int32))
        exp = data[:NB * KCHUNK] if name == "text" else data[4*1024*1024:4*1024*1024+NB*KCHUNK]

        # single-stream baseline
        t0 = time.time()
        o, p, b, e = decode_streams_pallas(wa, sb, cb, ol, max_out=KCHUNK)
        o.block_until_ready()
        ok = (not np.asarray(b).any()) and np.asarray(o).reshape(-1)[:0].size == 0
        outb = np.asarray(o)
        good = b"".join(outb[k, :KCHUNK].tobytes() for k in range(NB)) == exp
        sec = trace_seconds(
            lambda: decode_streams_pallas(wa, sb, cb, ol, max_out=KCHUNK), 1, f"base_{name}"
        )
        print(f"{name} K=1(base): {NB*KCHUNK/sec/1e6:.1f} MB/s "
              f"(compile {time.time()-t0:.0f}s, correct={good})", flush=True)

        for K in (2, 4, 8):
            t0 = time.time()
            try:
                o, p, b, e = decode_streams_ilk(
                    wa, sb, cb, ol, max_out=KCHUNK, k_streams=K)
                o.block_until_ready()
            except Exception as ex:
                print(f"{name} K={K}: FAILED {type(ex).__name__}: {str(ex)[:200]}",
                      flush=True)
                continue
            outb = np.asarray(o)
            good = (not np.asarray(b).any()) and b"".join(
                outb[k, :KCHUNK].tobytes() for k in range(NB)) == exp
            sec = trace_seconds(
                lambda K=K: decode_streams_ilk(wa, sb, cb, ol, max_out=KCHUNK,
                                               k_streams=K), 1, f"k{K}_{name}")
            print(f"{name} K={K}: {NB*KCHUNK/sec/1e6:.1f} MB/s "
                  f"(compile {time.time()-t0:.0f}s, correct={good})", flush=True)


if __name__ == "__main__":
    main()
