"""Cross-engine differential: every device decode engine must produce the
same bytes for the same chunk bodies (the reference's differential-oracle
strategy, SURVEY.md §4, applied across our own engines)."""

import zlib

import numpy as np
import pytest

from zlib_rs_tpu.parallel.pipeline import compress_parallel
from zlib_rs_tpu.parallel import inflate as pinf
from zlib_rs_tpu.parallel import swarm_inflate as SW

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'


@pytest.mark.parametrize("chunk_kib", [64, 128])
def test_three_engines_agree(chunk_kib):
    rng = np.random.default_rng(chunk_kib)
    data = (
        open("/bin/bash", "rb").read()[:180_000]
        + b"abcabcabc" * 4000
        + bytes(rng.integers(0, 200, 20_000, dtype=np.uint64).astype(np.uint8))
    )
    out, idx = compress_parallel(
        data, level=6, chunk_size=chunk_kib * 1024, return_index=True
    )
    assert zlib.decompress(out) == data
    bodies = [out[o : o + l] for o, l, _ in idx]
    outs = [ol for _, _, ol in idx]

    lockstep = b"".join(pinf.decompress_chunks(bodies, outs))
    assert lockstep == data

    kernel = b"".join(SW.decode_chunks_kernel(bodies, outs, interpret=True))
    assert kernel == lockstep

    if idx.seeds and all(s is not None for s in idx.seeds):
        swarm = b"".join(SW.decode_chunks_seeded(bodies, outs, idx.seeds))
        assert swarm == lockstep
