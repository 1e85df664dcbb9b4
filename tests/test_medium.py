"""MEDIUM deflate mode: the zlib-ng deflate_medium algorithm class
(medium.rs:12-331 decisions) implemented twice — host mirror
(models/medium.py) and native engine (zrs_native.cpp run_medium) — and
tested differentially byte-for-byte, the framework's version of the
reference's cross-implementation equality (end_to_end.rs:42)."""

import random
import zlib

import numpy as np
import pytest

from zlib_rs_tpu import native
from zlib_rs_tpu.models.medium import compress_medium

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine not built"
)

random.seed(77)
rng = np.random.default_rng(77)

CASES = {
    "text": (b"the quick brown fox jumps over the lazy dog. " * 2000)[:80_000],
    "binary": open("/bin/bash", "rb").read()[:120_000],
    "runs": b"a" * 40_000 + b"xyz" * 9000 + b"\x00" * 15_000,
    "rand": rng.integers(0, 256, 50_000, dtype=np.uint64).astype(np.uint8).tobytes(),
    "tiny": b"abcabcabc",
    "empty": b"",
}


@pytest.mark.parametrize("level", [4, 5, 6])
@pytest.mark.parametrize("name", sorted(CASES))
def test_host_native_medium_identical(name, level):
    data = CASES[name]
    a = compress_medium(data, level)
    b = native.deflate_chunk(data, level=native.MEDIUM_BASE + level - 4, final=True)
    assert zlib.decompress(b, -15) == data
    assert a == b


def test_medium_ratio_between_quick_and_exact():
    data = open("/bin/bash", "rb").read()[:400_000]
    quick = native.deflate_chunk(data, level=native.QUICK, final=True)
    med = native.deflate_chunk(data, level=native.MEDIUM6, final=True)
    exact = native.deflate_chunk(data, level=6, final=True)
    assert len(exact) <= len(med) <= len(quick)
    # medium stays within a few % of the bit-exact level
    assert len(med) <= len(exact) * 1.06


def test_medium_streaming_roundtrip():
    # the streaming handle accepts medium levels; output is valid DEFLATE
    # at every pump boundary (medium streaming is NOT pump-invariant like
    # levels 1-9 — the insert caps read total lookahead — only validity
    # and roundtrip are contractual)
    data = CASES["binary"] + CASES["text"]
    s = native.RawDeflateStream(native.MEDIUM6)
    out = bytearray()
    for i in range(0, len(data), 37_777):
        out.extend(s.pump(data[i : i + 37_777], 0))
    out.extend(s.pump(b"", 4))
    assert zlib.decompress(bytes(out), -15) == data


def test_medium_dictionary_priming():
    dict_ = CASES["binary"][:32768]
    data = CASES["binary"][32768:65536]
    comp = native.deflate_chunk(
        data, level=native.MEDIUM6, final=True, dictionary=dict_
    )
    d = zlib.decompressobj(-15, zdict=dict_)
    assert d.decompress(comp) == data
    # priming must help on self-similar data
    cold = native.deflate_chunk(data, level=native.MEDIUM6, final=True)
    assert len(comp) <= len(cold)


def test_medium_parallel_chunks():
    data = (CASES["binary"] + CASES["text"]) * 2
    out = native.deflate_parallel(data, level=native.MEDIUM6, chunk_size=64 * 1024)
    assert zlib.decompress(out, -15) == data


# ---------------------------------------------------------------------------
# host QUICK mirror (reference deflate_quick class, quick.rs:12-158)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", sorted(CASES))
def test_host_native_quick_identical(name):
    from zlib_rs_tpu.models.medium import compress_quick

    data = CASES[name]
    a = compress_quick(data, final=True)
    b = native.deflate_chunk(data, level=native.QUICK, final=True)
    assert zlib.decompress(b, -15) == data
    assert a == b


def test_host_quick_nonfinal_seam():
    from zlib_rs_tpu.models.medium import compress_quick

    data = CASES["text"]
    a = compress_quick(data, final=False)
    b = native.deflate_chunk(data, level=native.QUICK, final=False)
    assert a == b
    # decodes as a valid region ending on the sync seam
    d = zlib.decompressobj(-15)
    assert d.decompress(a) == data
