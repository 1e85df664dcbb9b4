"""Device-side streaming checkpoint/resume for the Pallas decode kernel.

SURVEY §5 checkpoint row: the reference's streaming state IS a resumable
checkpoint (deflateCopy/inflateCopy deep-clone mid-stream state,
inflate.rs:2547; inflatePrime injects sub-byte bit state, :2165). The TPU
analogue is explicit `(bit_offset, window, checksum)` ARRAYS a caller can
snapshot between jit steps: each `decode_step` runs ONE jit session that
decodes whole deflate blocks from `state.bit` until the first block
boundary at or after `target` output bytes, then returns the bytes plus a
new plain-numpy state (pickle/save/restore at will — nothing device-
resident survives between steps, which is exactly the point).

Tables are NOT part of the snapshot: checkpoints land on block
boundaries, where the next session re-derives tables from the block
header it parses in-kernel (the same property zran access points rely
on, models/zran.py)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..ops import checksum
from ..ops.pallas.inflate_kernel import decode_streams_pallas, pack_streams_words

WSIZE = 32768


@dataclass
class DeviceInflateState:
    """Snapshotable decode state (plain host arrays / scalars)."""

    bit: int = 0                  # absolute bit offset into the stream body
    window: bytes = b""           # last <= 32 KiB of produced output
    produced: int = 0             # total output bytes so far
    adler: int = 1                # running adler32 of the output
    finished: bool = False        # BFINAL block fully decoded


def decode_step(
    body: bytes,
    state: DeviceInflateState,
    *,
    target: int,
    max_out: int | None = None,
    interpret: bool = False,
) -> tuple[bytes, DeviceInflateState]:
    """One jit session: decode whole blocks from `state.bit` until the
    first block boundary at or after `target` new output bytes (or BFINAL).

    `max_out` bounds the overshoot past `target` (one deflate block can
    overshoot; zlib-family encoders emit blocks well under 256 KiB of
    output — raise it for exotic encoders). Raises ValueError on corrupt
    data or budget overflow so callers can fall back to an exact engine.
    """
    if state.finished:
        return b"", state
    if max_out is None:
        max_out = target + 256 * 1024
    import jax.numpy as jnp

    words, comp_bits = pack_streams_words([body])
    win = None
    wlen = min(len(state.window), WSIZE)
    if wlen:
        wpad = -(-wlen // 4) * 4
        wbuf = np.zeros((1, wpad), np.uint8)
        wbuf[0, wpad - wlen:] = np.frombuffer(state.window[-wlen:], np.uint8)
        win = jnp.asarray(wbuf)
    out_b, produced, bad, end_bit, fin_seen = decode_streams_pallas(
        jnp.asarray(words),
        jnp.asarray([state.bit], np.int32),
        jnp.asarray(comp_bits),
        jnp.asarray([target], np.int32),
        max_out=int(max_out),
        interpret=interpret,
        win=win,
        stop_at_target=True,
    )
    if bool(np.asarray(bad)[0]):
        raise ValueError("device checkpoint decode failed (bad block/budget)")
    n = int(np.asarray(produced)[0])
    out = np.asarray(out_b)[0, :n].tobytes()
    hist = (state.window + out)[-WSIZE:]
    new_state = DeviceInflateState(
        bit=int(np.asarray(end_bit)[0]),
        window=hist,
        produced=state.produced + n,
        adler=checksum.adler32(out, state.adler),
        finished=bool(np.asarray(fin_seen)[0]),
    )
    return out, new_state


def decode_streaming(
    body: bytes,
    *,
    step_bytes: int,
    max_out: int | None = None,
    interpret: bool = False,
):
    """Generator over checkpointed decode sessions: yields (bytes, state)
    until the stream's final block. Each iteration is an independent jit
    step; the state between iterations is host-snapshotable."""
    state = DeviceInflateState()
    while not state.finished:
        out, state = decode_step(
            body, state, target=step_bytes, max_out=max_out,
            interpret=interpret,
        )
        yield out, state
        if not out and not state.finished:
            raise ValueError("no progress in device checkpoint decode")
