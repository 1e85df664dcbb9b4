"""Timing law of the vector inflate kernel on synthetic fixed-Huffman data.

A fixed-Huffman block of literals < 144 has every symbol exactly 8 bits,
so seed bit offsets are computable on host and span/K/cap are free
parameters. Sweeps span size to show whether the per-step cost is
dominated by the K-row masked-reduce (cost ~ span^2) or fixed per-step
overhead (cost ~ span).

Run on chip:  python experiments/bench_vhuff_synth.py [spans...]
"""
import sys
import time
import zlib

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
from zlib_rs_tpu.parallel.vector_inflate import (  # noqa: E402
    prepare_vector_inputs,
    _run,
)
from zlib_rs_tpu.ops.pallas.vhuff_kernel import decode_tokens_vector  # noqa: E402


def fixed_block_stream(n):
    """Hand-built raw-deflate fixed-Huffman stream of n literals < 144
    (every code exactly 8 bits, so seed offsets are 8*k + 3)."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 144, n, dtype=np.uint64).astype(np.uint8)
    # fixed litlen code for sym < 144: 8-bit code value 0x30 + sym,
    # emitted MSB-first (RFC 1951 3.1.1: Huffman codes are packed
    # starting with the most significant bit of the code)
    codes = (0x30 + data.astype(np.uint32))
    rev = np.zeros(n, np.uint32)  # bit-reverse each 8-bit code
    v = codes.copy()
    for _ in range(8):
        rev = (rev << 1) | (v & 1)
        v >>= 1
    bits = np.zeros(3 + 8 * n + 7, np.uint8)
    bits[0] = 1          # BFINAL
    bits[1] = 1          # BTYPE=01 (fixed), LSB first
    bits[2] = 0
    pos = 3 + 8 * np.arange(n)[:, None] + np.arange(8)[None, :]
    vals = (rev[:, None] >> np.arange(8)[None, :]) & 1
    bits[pos.reshape(-1)] = vals.reshape(-1).astype(np.uint8)
    # EOB (sym 256) = 7 bits of 0: already zeros
    nbytes = -(-len(bits) // 8)
    packed = np.zeros(nbytes * 8, np.uint8)
    packed[: len(bits)] = bits
    body = np.packbits(packed.reshape(-1, 8), axis=1, bitorder="little")
    return data.tobytes(), body.tobytes()


def main():
    spans = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512, 1024]
    S = 128
    for span in spans:
        n = S * span  # one chunk, S seeds, `span` bytes each
        data, body = fixed_block_stream(n)
        # every literal is 8 bits; the stream is literal-only, so symbol k
        # starts at bit 8*k after the 3 header bits (handled by hdr_bits
        # in prepare_vector_inputs via parse_block_header)
        bits = [8 * span * s for s in range(S)]
        outs = [span * s for s in range(S)]
        seeds = [(bits, outs)]
        t0 = time.perf_counter()
        dev, meta = prepare_vector_inputs([body], [n], seeds)
        out, produced, cons, bad, rem = _run(
            dev, meta, max_out=n, interpret=False
        )
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        ok = (
            not np.asarray(bad).reshape(-1)[: S].any()
            and bytes(np.asarray(out)[0][:n]) == data
        )
        kern = lambda: decode_tokens_vector(  # noqa: E731
            dev["fifo"], *dev["tables"], dev["align"], dev["span"],
            cap=meta["cap"], K=meta["K"], interpret=False,
        )
        iters = 10
        # kernel-only, per-call blocking (async dispatch lies otherwise)
        tk = 0.0
        for _ in range(iters):
            t0 = time.perf_counter()
            o = kern()
            jax.block_until_ready(o)
            tk += time.perf_counter() - t0
        tk /= iters
        t0 = time.perf_counter()
        for _ in range(iters):
            r = _run(dev, meta, max_out=n, interpret=False)
        jax.block_until_ready(r[0])
        dt = (time.perf_counter() - t0) / iters
        print(
            f"span={span:5d} K={meta['K']:4d} cap={meta['cap']:5d} "
            f"{'ok ' if ok else 'BAD'} kernel {tk*1e3:8.2f} ms "
            f"({tk/meta['cap']*1e6:7.2f} us/step, {n/tk/1e6:7.1f} MB/s) | "
            f"e2e {dt*1e3:8.2f} ms ({n/dt/1e6:7.1f} MB/s)"
        )


if __name__ == "__main__":
    main()
