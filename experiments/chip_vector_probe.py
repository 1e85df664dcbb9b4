"""Builder-side chip measurement of the vector decode engine.

Mirrors bench.py's _phase_vector on the real tunnel-attached chip:
exactness vs the raw-deflate oracle first, then jax.profiler trace
timing of the dispatch closure. Run with plain `python` (axon platform)
under `timeout`.
"""

import os
import pickle
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench import _device_trace_seconds  # noqa: E402
from zlib_rs_tpu.parallel import vector_inflate as VI  # noqa: E402


def main(seed_pkl: str, tile_mb: int = 8):
    print("platform:", jax.devices()[0].platform, flush=True)
    blob = pickle.load(open(seed_pkl, "rb"))
    bodies = blob["bodies"]
    out_sizes = blob["out_sizes"]
    seeds = blob["seeds"]
    assert bodies, "no seeded chunks"
    tile = max(1, (tile_mb << 20) // max(1, sum(out_sizes)))
    bodies, out_sizes, seeds = bodies * tile, out_sizes * tile, seeds * tile
    print(f"chunks={len(bodies)} out_bytes={sum(out_sizes)}", flush=True)

    if os.environ.get("ZRS_PROBE_SKIP_EXACT"):
        print("exactness SKIPPED (ablation run)", flush=True)
    else:
        t0 = time.monotonic()
        parts = VI.decode_chunks_vector(bodies, out_sizes, seeds, interpret=False)
        print(f"decode wall (incl compile) {time.monotonic()-t0:.1f}s", flush=True)
        for part, body, osz in zip(parts, bodies, out_sizes):
            ref = zlib.decompressobj(-15).decompress(body)[:osz]
            if part != ref:
                raise SystemExit("MISMATCH vs oracle")
        print("byte-exact vs oracle", flush=True)

    dispatch = VI.make_vector_dispatch(bodies, out_sizes, seeds)
    jax.block_until_ready(dispatch())
    reps = 5
    sec, progs = _device_trace_seconds(dispatch, reps, "vecprobe", 240)
    out_bytes = sum(out_sizes)
    if sec:
        print(f"device trace: {sec:.4f}s/dispatch -> "
              f"{out_bytes / sec / 1e6:.1f} MB/s", flush=True)
        for n, s in sorted(progs.items()):
            print(f"  {n}: {s/reps:.4f}s/rep", flush=True)
    else:
        print("no trace captured", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/seeds_r4.pkl",
         int(sys.argv[2]) if len(sys.argv) > 2 else 8)
