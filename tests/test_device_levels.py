"""Device pipeline level semantics: the CONFIGURATION_TABLE analogue
(_level_knobs) must produce genuinely different effort/ratio by level, and
every level's stream must stay oracle-decodable."""

import zlib

import numpy as np

from zlib_rs_tpu.parallel.pipeline import _level_knobs, compress_parallel
import pytest

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'


def _corpus(n):
    rng = np.random.default_rng(9)
    text = b"it was the best of times, it was the worst of times. " * (n // 100)
    noise = bytes(rng.integers(0, 256, n // 4, dtype=np.uint64).astype(np.uint8))
    return (text + noise)[:n]


def test_knobs_monotone():
    depths = [_level_knobs(l)["chain_depth"] for l in (1, 3, 6, 8, 9)]
    assert depths == sorted(depths) and depths[0] < depths[-1]
    assert not _level_knobs(1)["lazy"] and _level_knobs(6)["lazy"]


def test_level_ratio_ordering():
    data = _corpus(200_000)
    sizes = {}
    for lvl in (1, 6):
        out = compress_parallel(data, level=lvl, chunk_size=64 * 1024)
        assert zlib.decompress(out) == data
        sizes[lvl] = len(out)
    # deeper chains + lazy at level 6 must compress strictly better than
    # the level-1 single-probe greedy on this compressible corpus
    assert sizes[6] < sizes[1]
