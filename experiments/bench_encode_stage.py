"""Whole-encode-batch device trace: kernel scan vs XLA matcher, with
per-program breakdown."""
import glob, gzip as gzmod, json, os, sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from zlib_rs_tpu.ops import lz77
from zlib_rs_tpu.parallel import pipeline as P


def trace(fn, args, tag, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    td = f"/tmp/es_{tag}_{os.getpid()}"
    with jax.profiler.trace(td):
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
    files = sorted(glob.glob(f"{td}/plugins/profile/*/*.trace.json.gz"))
    tr = json.load(gzmod.open(files[-1]))
    pn = {e["pid"]: e["args"].get("name", "") for e in tr.get("traceEvents", [])
          if e.get("ph") == "M" and e.get("name") == "process_name"}
    per = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and "TPU" in pn.get(e.get("pid"), ""):
            per[e.get("name", "")] = per.get(e.get("name", ""), 0.0) + e.get("dur", 0) / 1e6
    tot = sum(v for k, v in per.items() if k.startswith("jit_"))
    return tot / reps, {k: round(v / reps, 4) for k, v in sorted(per.items(), key=lambda kv: -kv[1])[:8]}


def main():
    CH = 48 * 1024
    B = 16
    blob = open("/bin/bash", "rb").read()
    knobs = P._level_knobs(6)
    arr = np.zeros((B, CH + lz77.PAD), np.uint8)
    for k in range(B):
        seg = blob[k * CH:(k + 1) * CH]
        arr[k, :len(seg)] = np.frombuffer(seg, np.uint8)
    dc = jnp.asarray(arr)
    nv = jnp.full((B,), CH, jnp.int32)
    fins = jnp.zeros((B,), jnp.int32)

    for tag, ks in (("xla", False), ("kernel", True)):
        fn = lambda c, n, f: P._encode_batch(
            c, n, f, chunk_size=CH, dynamic=True, kernel_scan=ks, **knobs
        )
        sec, per = trace(fn, (dc, nv, fins), tag)
        mb = B * CH / 1e6
        print(f"{tag}: {sec*1e3:.0f} ms/batch ({mb/1e3/sec:.4f} GB/s, {sec*1e9/(B*CH):.0f} ns/byte)")
        print("  ", per, flush=True)


if __name__ == "__main__":
    main()
