"""Stage seeded chunks on the CPU backend into a pickle for chip probes.

Usage: JAX_PLATFORMS=cpu python experiments/mk_seeds.py [n_bytes] [out.pkl]
"""
import pickle
import sys
import zlib

import jax

jax.config.update("jax_platforms", "cpu")  # the axon sitecustomize pins the
# TPU tunnel; env vars alone don't override it (see tests/conftest.py)

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
from zlib_rs_tpu.parallel.pipeline import compress_parallel  # noqa: E402


def mixed_corpus(n):
    rng = np.random.default_rng(42)
    base = [
        open("/bin/bash", "rb").read(),
        b"the quick brown fox jumps over the lazy dog. " * (n // 90 + 1),
        bytes(rng.integers(0, 256, n // 3 + 1, dtype=np.uint64).astype(np.uint8)),
    ]
    parts = []
    have = 0
    i = 0
    while have < n:
        p = base[i % 3][: n // 3 + 1]
        parts.append(p)
        have += len(p)
        i += 1
    return b"".join(parts)[:n]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/seeds.pkl"
    data = mixed_corpus(n)
    out, idx = compress_parallel(
        data, level=6, chunk_size=128 * 1024, return_index=True
    )
    assert zlib.decompress(out) == data
    seeded = [k for k, s in enumerate(idx.seeds) if s is not None]
    bodies = [out[idx[k][0] : idx[k][0] + idx[k][1]] for k in seeded]
    out_sizes = [idx[k][2] for k in seeded]
    seeds = [idx.seeds[k] for k in seeded]
    chunk = 128 * 1024
    refs = [data[k * chunk : k * chunk + idx[k][2]] for k in seeded]
    with open(dst, "wb") as f:
        pickle.dump(
            {"bodies": bodies, "out_sizes": out_sizes, "seeds": seeds,
             "refs": refs},
            f,
        )
    print(f"staged {len(bodies)} seeded chunks ({sum(out_sizes)} out bytes) -> {dst}")


if __name__ == "__main__":
    main()
