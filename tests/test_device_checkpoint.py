"""Device-side streaming checkpoint/resume (parallel/checkpoint.py): the
TPU analogue of inflateCopy/inflatePrime (SURVEY §5 checkpoint row) —
decode a stream across MULTIPLE independent jit sessions with a plain-
host snapshot between, bytes identical to the oracle."""

import pickle
import zlib

import numpy as np
import pytest

from zlib_rs_tpu.parallel.checkpoint import (
    DeviceInflateState,
    decode_step,
    decode_streaming,
)

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'

rng = np.random.default_rng(21)
DATA = (
    open("/bin/bash", "rb").read()[:120_000]
    + b"checkpointable stream content " * 2000
    + bytes(rng.integers(0, 256, 40_000, dtype=np.uint64).astype(np.uint8))
)


def _raw(data, level=6):
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    return co.compress(data) + co.flush()


def test_two_session_decode_bytes_identical():
    body = _raw(DATA)
    # session 1: decode to (at least) half
    out1, snap = decode_step(
        body, DeviceInflateState(), target=len(DATA) // 2, interpret=True
    )
    assert len(out1) >= len(DATA) // 2
    assert not snap.finished
    # snapshot crosses a host boundary (pickle round-trip = the contract)
    snap = pickle.loads(pickle.dumps(snap))
    # session 2: fresh jit session resumes from the snapshot
    out2, end = decode_step(body, snap, target=len(DATA), interpret=True)
    assert out1 + out2 == DATA
    assert end.finished
    assert end.produced == len(DATA)
    assert end.adler == zlib.adler32(DATA)


def test_streaming_generator_many_steps():
    data = DATA[:150_000]
    body = _raw(data, level=9)
    got = bytearray()
    states = []
    for out, st in decode_streaming(body, step_bytes=30_000, interpret=True):
        got.extend(out)
        states.append(st)
    assert bytes(got) == data
    assert states[-1].finished
    # every intermediate state checkpoint is on a block boundary: resuming
    # from ANY of them reproduces the tail exactly
    st = states[len(states) // 2]
    tail = bytearray()
    while not st.finished:
        out, st = decode_step(body, st, target=40_000, interpret=True)
        tail.extend(out)
    assert bytes(got[: len(got) - len(tail)] + tail) == data


def test_checkpoint_bad_data_flags_or_diverges():
    # a mid-stream bit flip either breaks the bitstream (ValueError) or
    # decodes as a legal-but-different stream — the container checksum is
    # the outer oracle for the latter (the adler in the state serves it)
    data = DATA[:60_000]
    body = bytearray(_raw(data))
    body[len(body) // 2] ^= 0xFF
    state = DeviceInflateState()
    got = bytearray()
    try:
        for _ in range(64):
            o, state = decode_step(body, state, target=20_000, interpret=True)
            got.extend(o)
            if state.finished or not o:
                break
    except ValueError:
        return  # flagged: good
    assert state.adler != zlib.adler32(data) or bytes(got) != data


def test_finished_state_is_terminal():
    body = _raw(DATA[:30_000])
    out, st = decode_step(
        body, DeviceInflateState(), target=1 << 20, interpret=True
    )
    assert st.finished and out == DATA[:30_000]
    again, st2 = decode_step(body, st, target=1 << 20, interpret=True)
    assert again == b"" and st2.finished
