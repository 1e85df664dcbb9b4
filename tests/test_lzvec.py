"""Vectorized match-table construction (ops/lzvec) vs a brute-force
model of the scan kernel's longest_match walk (deflate_kernel._kernel
best_match semantics: budget in chain steps, inclusive nice stop, chain
truncation at the window edge, first-achiever-of-max tie rule)."""

import numpy as np
import pytest

from zlib_rs_tpu.ops import lzvec

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'


def _brute_tables(data: bytes, n_valid, ins_from, *, depth, nice, w_g,
                  precise=False):
    P = len(data)
    cap_g = 4 * w_g
    b = np.frombuffer(data, np.uint8).astype(np.int64)
    bp = np.concatenate([b, np.zeros(300, np.int64)])
    h = np.zeros(P, np.int64)
    for p in range(P):
        h[p] = ((bp[p] << 10) ^ (bp[p + 1] << 5) ^ bp[p + 2]) & (lzvec.HSIZE - 1)

    chains = {}
    order = {}
    for p in range(ins_from, n_valid):
        order.setdefault(int(h[p]), []).append(p)

    def mlen_precise(i, q, cap):
        L = 0
        while L < cap_g and bp[i + L] == bp[q + L]:
            L += 1
        return min(L, cap)

    def mlen_granular(i, q, cap):
        # lzvec default: byte-precise up to _PRECISE_WORDS * 4 bytes,
        # then +4 per fully-equal word (partial later words contribute
        # nothing; the parse kernel recovers the exact tail at emit time)
        pw = 4 * lzvec._PRECISE_WORDS
        L = 0
        while L < pw and bp[i + L] == bp[q + L]:
            L += 1
        if L == pw:
            w = lzvec._PRECISE_WORDS
            while w < w_g and all(
                bp[i + 4 * w + t] == bp[q + 4 * w + t] for t in range(4)
            ):
                L += 4
                w += 1
        return min(L, cap)

    mlen = mlen_precise if precise else mlen_granular

    full = np.zeros(P, np.int64)
    quart = np.zeros(P, np.int64)
    for p in range(ins_from, n_valid):
        group = order[int(h[p])]
        at = group.index(p)
        cands = group[:at][::-1]
        cap = min(n_valid - p, lzvec.MAX_MATCH)
        nice_eff = min(nice, cap)
        for budget, out in ((depth, full), (depth >> 2, quart)):
            M = D = 0
            for j, q in enumerate(cands):
                if j >= budget or p - q > lzvec.MAX_DIST:
                    break
                L = mlen(p, q, cap)
                if L > M:
                    M, D = L, p - q
                if L >= nice_eff:
                    break
            if M >= lzvec.MIN_MATCH:
                out[p] = (M << 16) | D
    return full, quart


@pytest.mark.parametrize(
    "seed,depth,nice,precise",
    [(0, 16, 32, False), (1, 8, 16, False), (2, 128, 128, False),
     (0, 16, 32, True), (2, 128, 128, True)],
)
def test_tables_match_bruteforce(seed, depth, nice, precise):
    rng = np.random.default_rng(seed)
    # compressible-ish data: small alphabet + repeated slices
    n = 2048
    base = rng.integers(0, 8, n).astype(np.uint8)
    data = bytearray(base.tobytes())
    for _ in range(20):
        s = int(rng.integers(0, n - 200))
        d = int(rng.integers(0, n - 200))
        ln = int(rng.integers(4, 80))
        data[d : d + ln] = data[s : s + ln]
    data = bytes(data)

    W = (len(data) + 3) // 4 + 2
    buf = np.zeros(W * 4, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    words4 = buf.view("<u4").astype(np.int64).astype(np.uint32)[None]

    import jax.numpy as jnp

    n_valid = jnp.asarray([len(data)], jnp.int32)
    ins_from = jnp.asarray([0], jnp.int32)
    tf, tq = lzvec.build_match_tables(
        jnp.asarray(words4), n_valid, ins_from, depth=depth, nice=nice,
        w_g=16, precise=precise,
    )
    tf = np.asarray(tf)[0]
    tq = np.asarray(tq)[0]
    bf, bq = _brute_tables(
        bytes(buf.tobytes()), len(data), 0, depth=depth, nice=nice, w_g=16,
        precise=precise,
    )
    P = len(data)
    assert (tf[:P] == bf[:P]).all(), np.nonzero(tf[:P] != bf[:P])[0][:10]
    assert (tq[:P] == bq[:P]).all(), np.nonzero(tq[:P] != bq[:P])[0][:10]


def test_tables_dict_and_insfrom():
    rng = np.random.default_rng(7)
    data = (b"the quick brown fox " * 40)[:600] + rng.integers(0, 256, 200).astype(np.uint8).tobytes()
    W = (len(data) + 3) // 4 + 2
    buf = np.zeros(W * 4, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    words4 = buf.view("<u4").astype(np.int64).astype(np.uint32)[None]

    import jax.numpy as jnp

    for ins_from in (0, 64):
        tf, tq = lzvec.build_match_tables(
            jnp.asarray(words4),
            jnp.asarray([len(data)], jnp.int32),
            jnp.asarray([ins_from], jnp.int32),
            depth=32, nice=32, w_g=8,
        )
        bf, bq = _brute_tables(
            bytes(buf.tobytes()), len(data), ins_from, depth=32, nice=32, w_g=8
        )
        P = len(data)
        assert (np.asarray(tf)[0][:P] == bf[:P]).all()
        assert (np.asarray(tq)[0][:P] == bq[:P]).all()


# ---------------------------------------------------------------------------
# table-walk parse kernel vs the chain-walk scan kernel
# ---------------------------------------------------------------------------

def _mk_words(data: bytes):
    import jax.numpy as jnp

    W = (len(data) + 3) // 4 + 2
    buf = np.zeros(W * 4, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    return jnp.asarray(buf.view("<u4").astype(np.int64).astype(np.uint32)[None])


def _gen(seed, n=4096, maxcopy=56):
    rng = np.random.default_rng(seed)
    data = bytearray(rng.integers(0, 12, n).astype(np.uint8).tobytes())
    for _ in range(40):
        s = int(rng.integers(0, n - maxcopy - 1))
        d = int(rng.integers(0, n - maxcopy - 1))
        ln = int(rng.integers(4, maxcopy))
        data[d : d + ln] = data[s : s + ln]
    return bytes(data)


@pytest.mark.parametrize("seed", [0, 3])
def test_tab_scan_identical_to_chain_scan(seed):
    """With every true match below the table cap, the table-driven parse
    reproduces the chain-walk kernel's stream exactly."""
    import jax.numpy as jnp

    from zlib_rs_tpu.ops.pallas.deflate_kernel import (
        scan_chunks_pallas, scan_chunks_tab_pallas,
    )

    data = _gen(seed)
    w4 = _mk_words(data)
    nv = jnp.asarray([len(data)], jnp.int32)
    z = jnp.asarray([0], jnp.int32)
    knobs = dict(depth=128, nice=128, good=8, max_lazy=16, interpret=True)
    mp0, ml0, nm0, bad0 = scan_chunks_pallas(w4, nv, z, z, **knobs)
    # precise tables: chain-walk equivalence only holds with byte-exact
    # candidate lengths (the granular default trades exactness for speed
    # and is covered by the hop<->tab and ratio tests)
    mp1, ml1, nm1, bad1 = scan_chunks_tab_pallas(
        w4, nv, z, start=0, w_g=16, precise=True, **knobs)
    assert not bool(bad0[0]) and not bool(bad1[0])
    n0, n1 = int(nm0[0]), int(nm1[0])
    assert n0 == n1
    assert (np.asarray(mp0)[0][:n0] == np.asarray(mp1)[0][:n1]).all()
    assert (np.asarray(ml0)[0][:n0] == np.asarray(ml1)[0][:n1]).all()


def test_tab_scan_long_matches_valid():
    """Long runs exceed the table cap: the parse may differ from the
    chain walk but every emitted match must be byte-valid and extended
    past the cap."""
    import jax.numpy as jnp

    from zlib_rs_tpu.ops.pallas.deflate_kernel import scan_chunks_tab_pallas

    data = (b"abcdefgh" * 64) + _gen(9, n=1024) + (b"\x00" * 300) + b"tail"
    w4 = _mk_words(data)
    nv = jnp.asarray([len(data)], jnp.int32)
    z = jnp.asarray([0], jnp.int32)
    mp, ml, nm, bad = scan_chunks_tab_pallas(
        w4, nv, z, start=0, depth=128, nice=128, good=8, max_lazy=16,
        w_g=16, interpret=True,
    )
    assert not bool(bad[0])
    n = int(nm[0])
    assert n > 0
    mp, ml = np.asarray(mp)[0][:n], np.asarray(ml)[0][:n]
    lens = (ml >> 15).astype(np.int64) + 3
    dists = (ml & 0x7FFF).astype(np.int64) + 1
    assert lens.max() > 64, "extension never exceeded the table cap"
    end = 0
    for p, ln, d in zip(mp, lens, dists):
        assert p >= end, "overlapping matches"
        assert d <= p
        assert data[p : p + ln] == data[p - d : p - d + ln], (p, ln, d)
        end = p + ln


@pytest.mark.parametrize("seed,maxcopy", [(0, 56), (5, 200)])
def test_hop_scan_identical_to_tab_scan(seed, maxcopy):
    """The hop-table pointer chase must reproduce the table-walk kernel's
    stream EXACTLY — the lazy chain is the same automaton, precomputed."""
    import jax.numpy as jnp

    from zlib_rs_tpu.ops.pallas.deflate_kernel import (
        scan_chunks_hop_pallas, scan_chunks_tab_pallas,
    )

    data = _gen(seed, n=6144, maxcopy=maxcopy) + b"\x07" * 400 + b"end"
    w4 = _mk_words(data)
    nv = jnp.asarray([len(data)], jnp.int32)
    z = jnp.asarray([0], jnp.int32)
    knobs = dict(
        start=0, depth=128, nice=128, good=8, max_lazy=16, w_g=8,
        interpret=True,
    )
    mp0, ml0, nm0, bad0 = scan_chunks_tab_pallas(w4, nv, z, **knobs)
    mp1, ml1, nm1, bad1, _f = scan_chunks_hop_pallas(w4, nv, z, **knobs)
    assert bool(bad0[0]) == bool(bad1[0])
    n0, n1 = int(nm0[0]), int(nm1[0])
    assert n0 == n1
    assert (np.asarray(mp0)[0][:n0] == np.asarray(mp1)[0][:n0]).all()
    assert (np.asarray(ml0)[0][:n0] == np.asarray(ml1)[0][:n0]).all()


def test_hop_scan_dict_primed():
    import jax.numpy as jnp

    from zlib_rs_tpu.ops.pallas.deflate_kernel import (
        scan_chunks_hop_pallas, scan_chunks_tab_pallas,
    )

    dict_part = _gen(11, n=1024)
    data = dict_part + _gen(12, n=2048, maxcopy=30)
    w4 = _mk_words(data)
    nv = jnp.asarray([len(data)], jnp.int32)
    z = jnp.asarray([0], jnp.int32)
    knobs = dict(
        start=1024, depth=64, nice=32, good=8, max_lazy=16, w_g=8,
        interpret=True,
    )
    mp0, ml0, nm0, _b0 = scan_chunks_tab_pallas(w4, nv, z, **knobs)
    mp1, ml1, nm1, _b1, _f = scan_chunks_hop_pallas(w4, nv, z, **knobs)
    n0, n1 = int(nm0[0]), int(nm1[0])
    assert n0 == n1 and n0 > 0
    assert (np.asarray(mp0)[0][:n0] == np.asarray(mp1)[0][:n0]).all()
    assert (np.asarray(ml0)[0][:n0] == np.asarray(ml1)[0][:n0]).all()


def test_hop_fold_freq_byte_identical_pipeline(monkeypatch):
    """The hop kernel's word-wise literal histogram must reproduce the
    freq kernel's counts exactly — checked end-to-end: the hop and tab
    paths share the parse, so any histogram drift would change the
    Huffman trees and the compressed bytes. (An approximate VPU
    all-bytes histogram was tried in r5 and rejected: 1.056x zlib-6.)"""
    import os
    import zlib as _z

    monkeypatch.setenv("ZRS_TPU_KERNEL", "1")
    from zlib_rs_tpu.parallel import pipeline as P

    data = (_gen(21, n=40000, maxcopy=120)
            + b"\x00" * 5000 + (b"repeat!" * 3000) + _gen(22, n=20000))
    monkeypatch.setenv("ZRS_TPU_HOPSCAN", "1")
    a = P.compress_parallel(data, level=6, chunk_size=32 * 1024)
    monkeypatch.setenv("ZRS_TPU_HOPSCAN", "0")
    b = P.compress_parallel(data, level=6, chunk_size=32 * 1024)
    assert _z.decompress(a) == data
    assert a == b, "hop fold diverged from the freq kernel"


@pytest.mark.parametrize("level", [7, 9])
def test_kernel_engine_deep_levels_roundtrip(level, monkeypatch):
    """Levels with deep chains must stay functional through the kernel
    engine: 7 rides the vectorized matcher, 9 falls back to the chain-walk
    kernel (the table stage scales linearly in max_chain)."""
    import zlib as _z

    monkeypatch.setenv("ZRS_TPU_KERNEL", "1")
    from zlib_rs_tpu.parallel import pipeline as P

    data = _gen(31, n=20000, maxcopy=100) + b"x" * 2000
    out = P.compress_parallel(data, level=level, chunk_size=16 * 1024)
    assert _z.decompress(out) == data


@pytest.mark.parametrize("seed", range(6))
def test_hop_tab_fuzz_equivalence(seed):
    """Randomized structures (runs, random tails, periodic data, sparse
    matches) — hop chase and table walk must emit identical streams."""
    import jax.numpy as jnp

    from zlib_rs_tpu.ops.pallas.deflate_kernel import (
        scan_chunks_hop_pallas, scan_chunks_tab_pallas,
    )

    rng = np.random.default_rng(100 + seed)
    parts = []
    for _ in range(6):
        kind = rng.integers(0, 4)
        n = int(rng.integers(64, 2000))
        if kind == 0:
            parts.append(bytes([int(rng.integers(0, 256))]) * n)
        elif kind == 1:
            parts.append(rng.integers(0, 256, n).astype(np.uint8).tobytes())
        elif kind == 2:
            pat = rng.integers(0, 256, int(rng.integers(1, 9))).astype(np.uint8).tobytes()
            parts.append((pat * (n // len(pat) + 1))[:n])
        else:
            parts.append((b"lorem ipsum dolor sit amet %d " % seed) * (n // 28 + 1))
    data = b"".join(parts)[:8192]
    w4 = _mk_words(data)
    nv = jnp.asarray([len(data)], jnp.int32)
    z = jnp.asarray([0], jnp.int32)
    knobs = dict(start=0, depth=64, nice=64, good=8, max_lazy=16, w_g=8,
                 interpret=True)
    mp0, ml0, nm0, b0 = scan_chunks_tab_pallas(w4, nv, z, **knobs)
    mp1, ml1, nm1, b1, _f = scan_chunks_hop_pallas(w4, nv, z, **knobs)
    assert bool(b0[0]) == bool(b1[0])
    n0 = int(nm0[0])
    assert n0 == int(nm1[0])
    assert (np.asarray(mp0)[0][:n0] == np.asarray(mp1)[0][:n0]).all()
    assert (np.asarray(ml0)[0][:n0] == np.asarray(ml1)[0][:n0]).all()


def test_hop_interleaved_matches_single_lane():
    """The 4-way cross-chunk interleaved chase must emit exactly the same
    match streams and histograms as four single-lane chases."""
    import jax.numpy as jnp

    from zlib_rs_tpu.ops.pallas.deflate_kernel import scan_chunks_hop_pallas

    datas = [
        _gen(40, n=4096, maxcopy=60),
        _gen(41, n=3000, maxcopy=200) + b"\x00" * 1000,
        (b"ab" * 900) + _gen(42, n=2200),
        _gen(43, n=4000, maxcopy=30),
    ]
    L = max(len(d) for d in datas)
    W = (L + 3) // 4 + 2
    buf = np.zeros((4, W * 4), np.uint8)
    for k, d in enumerate(datas):
        buf[k, : len(d)] = np.frombuffer(d, np.uint8)
    w4 = jnp.asarray(
        buf.reshape(4, W, 4).astype(np.uint32) @ np.array(
            [1, 1 << 8, 1 << 16, 1 << 24], np.uint32
        )
    )
    nv = jnp.asarray([len(d) for d in datas], jnp.int32)
    z4 = jnp.zeros(4, jnp.int32)
    knobs = dict(start=0, depth=64, nice=64, good=8, max_lazy=16, w_g=8,
                 interpret=True)
    # batch of 4 -> interleaved kernel
    mp4, ml4, nm4, b4, fq4 = scan_chunks_hop_pallas(w4, nv, z4, **knobs)
    for k in range(4):
        mp1, ml1, nm1, b1, fq1 = scan_chunks_hop_pallas(
            w4[k : k + 1], nv[k : k + 1], z4[k : k + 1], **knobs
        )
        assert int(nm4[k]) == int(nm1[0]), k
        n = int(nm1[0])
        assert (np.asarray(mp4)[k][:n] == np.asarray(mp1)[0][:n]).all(), k
        assert (np.asarray(ml4)[k][:n] == np.asarray(ml1)[0][:n]).all(), k
        assert bool(b4[k]) == bool(b1[0])
        # compare the slots downstream reads (286-287/318-319 are dead
        # sinks whose counts differ by predicated-lane bookkeeping)
        f4, f1 = np.asarray(fq4)[k], np.asarray(fq1)[0]
        assert (f4[:286] == f1[:286]).all(), k
        assert (f4[288:318] == f1[288:318]).all(), k
