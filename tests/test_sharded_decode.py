"""Mesh-sharded swarm decode: the decode counterpart of the sharded encode
step, run on the 8-device CPU mesh (conftest) with ICI all_gather of the
ordered outputs."""

import zlib

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zlib_rs_tpu.parallel.pipeline import compress_parallel
from zlib_rs_tpu.parallel import swarm_inflate as SW
import pytest

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'


def test_sharded_swarm_decode_8dev():
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("chunks",))
    chunk = 32 * 1024
    data = (b"sharded decode across the mesh " * 4000 + open("/bin/bash", "rb").read())[
        : 8 * chunk
    ]
    out, idx = compress_parallel(data, level=6, chunk_size=chunk, return_index=True)
    assert zlib.decompress(out) == data
    assert idx.seeds and all(s is not None for s in idx.seeds)

    B = len(idx)
    S = SW.SEEDS_PER_CHUNK
    bodies = [out[o : o + l] for o, l, _ in idx]
    out_sizes = [ol for _, _, ol in idx]
    L = max(len(b) for b in bodies) + 12
    comp = np.zeros((B, L), np.uint8)
    ll = np.zeros((B, 320), np.int32)
    dd = np.zeros((B, 320), np.int32)
    sbit = np.zeros((B, S), np.int32)
    sspan = np.zeros((B, S), np.int32)
    for k, body in enumerate(bodies):
        comp[k, : len(body)] = np.frombuffer(body, np.uint8)
        _bt, ll_k, d_k, hb = SW.parse_block_header(body)
        ll[k] = ll_k
        dd[k] = d_k
        bits, outs = idx.seeds[k]
        sbit[k] = np.asarray(bits, np.int64) + hb
        sspan[k] = np.diff(np.concatenate([np.asarray(outs, np.int64), [out_sizes[k]]]))
    cap = -(-(int(sspan.max()) + 1) // 512) * 512

    step = SW.make_sharded_decode_step(mesh, cap=cap, max_out=chunk)
    sh2 = NamedSharding(mesh, P("chunks", None))
    args = [
        jax.device_put(a, sh2)
        for a in (comp, ll, dd, sbit, sspan)
    ]
    outb, produced, bad = step(*args)
    assert not np.asarray(bad).any()
    got = b"".join(
        np.asarray(outb)[k, : out_sizes[k]].tobytes() for k in range(B)
    )
    assert got == data
