"""Chip throughput of the deflate scan kernel at level-6-ish knobs."""
import glob, gzip as gzmod, json, os, sys, time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from zlib_rs_tpu.ops.pallas.deflate_kernel import scan_chunks_pallas, CAP_M


def trace_run(fn, args, tag, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    td = f"/tmp/st_{tag}_{os.getpid()}"
    with jax.profiler.trace(td):
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
    files = sorted(glob.glob(f"{td}/plugins/profile/*/*.trace.json.gz"))
    tr = json.load(gzmod.open(files[-1]))
    pn = {e["pid"]: e["args"].get("name", "") for e in tr.get("traceEvents", [])
          if e.get("ph") == "M" and e.get("name") == "process_name"}
    tot = sum(e.get("dur", 0) / 1e6 for e in tr.get("traceEvents", [])
              if e.get("ph") == "X" and "TPU" in pn.get(e.get("pid"), "")
              and e.get("name", "").startswith("jit_"))
    return tot / reps, out


def pack(segs):
    B = len(segs)
    maxn = max(len(s) for s in segs)
    W = (maxn + 8) // 4 + 2
    arr = np.zeros((B, W * 4), np.uint8)
    for i, s in enumerate(segs):
        arr[i, :len(s)] = np.frombuffer(s, np.uint8)
    return jnp.asarray(arr.view("<u4")), jnp.asarray([len(s) for s in segs], jnp.int32)


def main():
    CH = 63 * 1024
    bash = open("/bin/bash", "rb").read()
    lce = open("/root/reference/test-libz-rs-sys/src/test-data/lcet10.txt", "rb").read()
    for tag, blob in (("bash", bash), ("lcet10", lce)):
        segs = [blob[k * CH:(k + 1) * CH] for k in range(16) if len(blob[k * CH:(k + 1) * CH]) == CH]
        words, nv = pack(segs)
        B = len(segs)
        z = jnp.zeros((B,), jnp.int32)
        for depth, nice in ((8, 64), (16, 130), (32, 258)):
            t0 = time.time()
            fn = lambda w, n, s, f: scan_chunks_pallas(w, n, s, f, depth=depth, nice=nice)
            sec, (mpos, mld, nm, bad) = trace_run(fn, (words, nv, z, z), f"{tag}_{depth}")
            tot = int(np.asarray(nv).sum())
            print(f"{tag} depth={depth} nice={nice}: {sec*1e9/tot:.1f} ns/byte "
                  f"({tot/1e6/sec:.1f} MB/s/chip) matches/chunk={int(np.asarray(nm).mean())} "
                  f"bad={np.asarray(bad).any()} (first-run incl compile {time.time()-t0:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
