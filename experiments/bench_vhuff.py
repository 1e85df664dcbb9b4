"""Chip throughput + exactness of the lane-parallel vector inflate engine.

Stage seeded chunks first (CPU backend), then run here on the chip:

  JAX_PLATFORMS=cpu python experiments/mk_seeds.py 8388608 /tmp/seeds.pkl
  python experiments/bench_vhuff.py /tmp/seeds.pkl
"""
import pickle
import sys
import time

import jax

sys.path.insert(0, "/root/repo")
from zlib_rs_tpu.parallel.vector_inflate import (  # noqa: E402
    decode_chunks_vector,
    make_vector_dispatch,
)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/seeds.pkl"
    with open(src, "rb") as f:
        d = pickle.load(f)
    bodies, out_sizes, seeds, refs = (
        d["bodies"], d["out_sizes"], d["seeds"], d["refs"]
    )
    total = sum(out_sizes)
    print(f"{len(bodies)} chunks, {total} output bytes, device "
          f"{jax.devices()[0].platform}")

    t0 = time.perf_counter()
    parts = decode_chunks_vector(bodies, out_sizes, seeds, interpret=False)
    t1 = time.perf_counter()
    ok = all(p == r for p, r in zip(parts, refs))
    print(f"exactness: {'ok' if ok else 'MISMATCH'}  "
          f"(first call incl. compile: {t1-t0:.2f}s)")
    if not ok:
        for i, (p, r) in enumerate(zip(parts, refs)):
            if p != r:
                bad = next(j for j in range(min(len(p), len(r))) if p[j] != r[j])
                print(f"  chunk {i}: first diff at byte {bad}")
                break
        return

    dispatch = make_vector_dispatch(bodies, out_sizes, seeds)
    jax.block_until_ready(dispatch())
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = dispatch()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"vector decode: {dt*1e3:.2f} ms/call -> {total/dt/1e6:.1f} MB/s")


if __name__ == "__main__":
    main()
