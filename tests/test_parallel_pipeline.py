"""Chunk-parallel deflate pipeline tests (runs on the 8-device CPU mesh from
conftest). Every produced stream must decode with stdlib zlib — the seam
protocol (sync-flush boundaries + checksum combine) is what the reference
exposes for external parallel deflate (SURVEY.md section 2e)."""

import gzip
import random
import zlib

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import zlib_rs_tpu as z
from zlib_rs_tpu.parallel.pipeline import compress_parallel

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'

random.seed(42)

CASES = {
    "text": b"the quick brown fox jumps over the lazy dog. " * 400,
    "runs": b"\x00" * 9000 + b"abc" * 2000 + b"\xff" * 5000,
    "rand": bytes(random.randrange(256) for _ in range(30000)),
    "binary": open("/bin/sh", "rb").read()[:120000],
    "tiny": b"hi",
    "empty": b"",
    "exact_chunk": bytes(random.randrange(256) for _ in range(8192)),
}


@pytest.mark.parametrize("level", [1, 6, 9])
@pytest.mark.parametrize("name", sorted(CASES))
def test_parallel_roundtrip(name, level):
    data = CASES[name]
    comp = compress_parallel(data, level=level, chunk_size=8192)
    assert zlib.decompress(comp) == data
    assert z.decompress(comp) == data  # our own engine decodes the seams too


@pytest.mark.parametrize("chunk_size", [2048, 8192, 65536])
def test_chunk_size_sweep(chunk_size):
    data = CASES["binary"]
    comp = compress_parallel(data, level=6, chunk_size=chunk_size)
    assert zlib.decompress(comp) == data


def test_gzip_and_raw_framing():
    data = CASES["text"]
    g = compress_parallel(data, level=6, window_bits=31, chunk_size=4096)
    assert gzip.decompress(g) == data
    assert int.from_bytes(g[-8:-4], "little") == zlib.crc32(data)
    r = compress_parallel(data, level=6, window_bits=-15, chunk_size=4096)
    assert zlib.decompress(r, -15) == data


def test_adler_combine_matches_oracle():
    data = CASES["binary"]
    comp = compress_parallel(data, level=4, chunk_size=4096)
    assert int.from_bytes(comp[-4:], "big") == zlib.adler32(data)


def test_incompressible_falls_back_to_stored():
    data = bytes(random.randrange(256) for _ in range(50000))
    comp = compress_parallel(data, level=6, chunk_size=8192)
    assert len(comp) <= len(data) + 5 * (len(data) // 8192 + 2) + 16
    assert zlib.decompress(comp) == data


def test_on_explicit_mesh():
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("chunks",))
    data = CASES["binary"]
    comp = compress_parallel(data, level=6, chunk_size=8192, mesh=mesh)
    assert zlib.decompress(comp) == data
    # identical output regardless of device layout
    comp_single = compress_parallel(data, level=6, chunk_size=8192)
    assert comp == comp_single


def test_seams_are_sync_points():
    """Each chunk boundary is a decoder restart point: decoding the stream
    prefix up to a seam yields exactly the chunk prefix of the input."""
    data = CASES["text"]
    comp = compress_parallel(data, level=6, chunk_size=4096)
    # find the first 00 00 FF FF seam after the 2-byte zlib header
    seam = comp.find(b"\x00\x00\xff\xff")
    assert seam > 0
    do = zlib.decompressobj()
    out = do.decompress(comp[: seam + 4])
    assert out == data[: len(out)]
    assert len(out) >= 4096


def test_ratio_sanity_at_scale():
    data = open("/bin/sh", "rb").read()[:262144]
    ours = len(compress_parallel(data, level=6, chunk_size=131072))
    ref = len(zlib.compress(data, 6))
    assert ours <= ref * 1.25  # vectorized matcher within 25% of zlib lazy


def test_dictionary_priming_gains_and_correctness():
    data = open("/bin/sh", "rb").read()[:80000]
    primed = compress_parallel(data, level=6, chunk_size=16384, prime_dict=True)
    unprimed = compress_parallel(data, level=6, chunk_size=16384, prime_dict=False)
    assert zlib.decompress(primed) == data
    assert zlib.decompress(unprimed) == data
    assert len(primed) <= len(unprimed)  # priming never hurts


def test_priming_off_for_single_chunk():
    data = b"single chunk " * 100
    a = compress_parallel(data, level=6, chunk_size=65536, prime_dict=True)
    b = compress_parallel(data, level=6, chunk_size=65536, prime_dict=False)
    assert a == b  # no previous chunk to prime from


def test_sharded_encode_step_collectives():
    """The shard_map encode step's ICI collectives: replicated payloads,
    size all_gather, exclusive prefix-sum offsets (round 2, SURVEY §2e)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from zlib_rs_tpu.ops import lz77
    from zlib_rs_tpu.parallel.pipeline import make_sharded_encode_step

    nd = min(8, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:nd]), ("chunks",))
    chunk = 2048
    rng = np.random.default_rng(1)
    raw = np.zeros((nd, chunk + lz77.PAD), np.uint8)
    raw[:, :chunk] = rng.integers(0, 64, (nd, chunk), dtype=np.uint8)
    step = make_sharded_encode_step(
        mesh, chunk_size=chunk, dynamic=True, chain_depth=2, max_words=8
    )
    sh = NamedSharding(mesh, P("chunks"))
    out = step(
        jax.device_put(raw, NamedSharding(mesh, P("chunks", None))),
        jax.device_put(np.full(nd, chunk, np.int32), sh),
        jax.device_put(np.zeros(nd, np.int32), sh),
        jax.device_put(np.zeros(nd, np.int32), sh),
    )
    words, bits, offsets = np.asarray(out[0]), np.asarray(out[1]), np.asarray(out[2])
    assert words.shape[0] == nd and bits.shape == (nd,)
    nbytes = (bits + 7) // 8
    assert (offsets == np.cumsum(nbytes) - nbytes).all()
    assert (bits > 0).all()


def test_corrupt_device_result_falls_back(monkeypatch):
    # VERDICT r3 item 1: a device engine that returns WRONG BYTES without
    # raising must not surface them — the container checksum discards the
    # device result, the exact chain re-runs, and the fallback is counted.
    from zlib_rs_tpu.parallel import pipeline, vector_inflate, swarm_inflate

    data = b"abc" * 5000 + bytes(range(256)) * 40
    out, idx = compress_parallel(data, level=6, return_index=True)

    def corrupt_vector(bodies, out_sizes, seeds, **kw):
        return [b"\x00" * n for n in out_sizes]  # silently wrong

    def corrupt_kernel(bodies, out_sizes, **kw):
        return [b"\x00" * n for n in out_sizes]

    monkeypatch.setattr(vector_inflate, "decode_chunks_vector", corrupt_vector)
    monkeypatch.setattr(swarm_inflate, "decode_chunks_kernel", corrupt_kernel)
    monkeypatch.setattr(swarm_inflate, "decode_chunks_seeded", corrupt_kernel)
    before = pipeline.fallback_stats().get("device_checksum:ValueError", 0)
    got = pipeline.decompress_parallel(out, idx, engine="tpu")
    assert got == data
    after = pipeline.fallback_stats().get("device_checksum:ValueError", 0)
    assert after == before + 1


def test_strategy_routes_to_host():
    """Device-path limitation (documented in compress_parallel): the niche
    strategies run the bit-exact HOST engine, not the device pipeline —
    asserting the routing so the asymmetry can never go silent."""
    import zlib

    from zlib_rs_tpu.config import DeflateConfig, Strategy
    from zlib_rs_tpu.models.deflate import compress as host_compress
    from zlib_rs_tpu.parallel.pipeline import compress_parallel

    data = b"abcabcabc" * 2000 + bytes(range(256)) * 20
    for strat in (Strategy.HuffmanOnly, Strategy.Rle, Strategy.Filtered):
        out = compress_parallel(data, level=6, strategy=strat)
        ref = host_compress(data, DeflateConfig(level=6, strategy=strat))
        assert out == ref, strat
        assert zlib.decompress(out) == data
    with pytest.raises(ValueError):
        compress_parallel(
            data, level=6, strategy=Strategy.Rle, return_index=True
        )
