"""Chip A/B: table-driven (lzvec) encode vs the chain-walk scan kernel.

Replicates bench._phase_kernel_encode's configuration (8 x 32 KiB chunks,
~31 KiB priming dict, zlib level-6 knobs), then checks the ratio on a
round-tripped prefix via the full kernel pipeline.
"""

import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _device_trace_seconds, load_corpus, KCHUNK, LEVEL


def main():
    from zlib_rs_tpu.ops import lz77
    from zlib_rs_tpu.parallel import pipeline as P

    data = load_corpus()
    flat = np.frombuffer(data, np.uint8)
    knobs = P._level_knobs(LEVEL)
    KB = 8
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

    which = os.environ.get("ZRS_TPU_TABSCAN", "1")
    t0 = time.monotonic()
    jax.block_until_ready(kernel_once())
    print(f"tabscan={which} compile+first {time.monotonic()-t0:.1f}s", flush=True)
    sec, progs = _device_trace_seconds(kernel_once, 3, "kenc", 420)
    if sec:
        rate = KB * KCHUNK / sec
        print(f"tabscan={which}: {sec*1e3:.1f} ms/batch -> {rate/1e6:.2f} MB/s", flush=True)
        for n, s in sorted(progs.items(), key=lambda kv: -kv[1]):
            print(f"  {n}: {s/3*1e3:.1f} ms", flush=True)

    if os.environ.get("ZRS_PROBE_RATIO"):
        nb = int(os.environ.get("ZRS_PROBE_RATIO_MB", "2")) << 20
        prefix = bytes(data[:nb])
        os.environ["ZRS_TPU_KERNEL"] = "1"
        t0 = time.monotonic()
        comp = P.compress_parallel(prefix, level=LEVEL, chunk_size=KCHUNK)
        wall = time.monotonic() - t0
        assert zlib.decompress(comp) == prefix
        zref = len(zlib.compress(prefix, LEVEL))
        print(f"kernel-path ratio vs zlib-{LEVEL}: {len(comp)/zref:.4f} "
              f"over {nb} bytes; e2e wall {nb/wall/1e6:.2f} MB/s", flush=True)


if __name__ == "__main__":
    main()
