"""Chip throughput of the sequential inflate kernel across corpus types."""
import glob, gzip as gzmod, json, os, sys

import numpy as np
import jax
import jax.numpy as jnp
import zlib

sys.path.insert(0, "/root/repo")
from zlib_rs_tpu.ops.pallas.inflate_kernel import decode_streams_pallas, pack_streams_words


def trace(streams, datas, tag, reps=3):
    outs = [len(d) for d in datas]
    CH = max(outs)
    words, bits = pack_streams_words(streams)
    B = len(streams)
    args = (jnp.asarray(words), jnp.zeros((B,), jnp.int32), jnp.asarray(bits),
            jnp.asarray(np.array(outs, np.int32)))
    o, p, bad, _ = decode_streams_pallas(*args, max_out=CH)
    jax.block_until_ready(o)
    assert not np.asarray(bad).any(), tag
    ok = all(np.asarray(o)[k, :outs[k]].tobytes() == datas[k] for k in range(B))
    td = f"/tmp/kt_{tag}_{os.getpid()}"
    with jax.profiler.trace(td):
        for _ in range(reps):
            r = decode_streams_pallas(*args, max_out=CH)
        jax.block_until_ready(r)
    files = sorted(glob.glob(f"{td}/plugins/profile/*/*.trace.json.gz"))
    tr = json.load(gzmod.open(files[-1]))
    pn = {e["pid"]: e["args"].get("name", "") for e in tr.get("traceEvents", [])
          if e.get("ph") == "M" and e.get("name") == "process_name"}
    tot = sum(e.get("dur", 0) / 1e6 for e in tr.get("traceEvents", [])
              if e.get("ph") == "X" and "TPU" in pn.get(e.get("pid"), "")
              and e.get("name", "").startswith("jit_"))
    sec = tot / reps
    print(f"{tag}: ok={ok} ns/byte={sec*1e9/sum(outs):.1f} ({sum(outs)/1e6/sec:.0f} MB/s/chip)")
    return sec


def raw(d, level=6, strat=zlib.Z_DEFAULT_STRATEGY):
    c = zlib.compressobj(level, zlib.DEFLATED, -15, 9, strat)
    return c.compress(d) + c.flush()


def main():
    CH = 128 * 1024
    bash = open("/bin/bash", "rb").read()
    seg = bash[256 * 1024:256 * 1024 + CH]
    B = 8
    trace([raw(seg)] * B, [seg] * B, "bash_dyn")
    trace([raw(seg, strat=zlib.Z_HUFFMAN_ONLY)] * B, [seg] * B, "bash_huffonly")
    txt = (b"the quick brown fox jumps over the lazy dog. " * 3000)[:CH]
    trace([raw(txt)] * B, [txt] * B, "text")
    lce = open("/root/reference/test-libz-rs-sys/src/test-data/lcet10.txt", "rb").read()[:CH]
    trace([raw(lce)] * B, [lce] * B, "lcet10")


if __name__ == "__main__":
    main()
