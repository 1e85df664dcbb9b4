"""Probe: can the TensorCore scalar unit overlap INDEPENDENT dependent-load
chains? (the round-3 design question for the codec kernels)

One stream's decode is a serial chain of ~8ns SMEM loads (probe_scalar.py).
K streams' chains are mutually independent: if the scalar unit can keep K
loads in flight, a loop that advances K chains per iteration should cost
~max(8ns, K * issue_cost) per iteration, i.e. approach K-fold throughput.

Measures ns/iteration for K = 1, 2, 4, 8 interleaved permutation chases,
each in its own SMEM table (so chains never alias), plus a variant with
2 ALU ops per chain per step (closer to the real decode loop body).
"""
import sys, time, json, os, glob, gzip as gz

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_STEPS = 100_000  # loop iterations
N = 8192           # per-chain table size


def trace_seconds(fn, reps, tag):
    trace_dir = f"/tmp/probe_ilp_{tag}_{os.getpid()}"
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        return None
    with gz.open(files[-1]) as f:
        trace = json.load(f)
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    total = 0.0
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "TPU" not in pid_names.get(e.get("pid"), ""):
            continue
        if e.get("name", "").startswith("jit_"):
            total += e.get("dur", 0) / 1e6
    return total / reps if total > 0 else None


def make_chase(nchains, alu_ops):
    def kernel(tab_ref, out_ref, smem):
        def init(i, _):
            smem[0, i] = tab_ref[0, i]
            return 0
        lax.fori_loop(0, N, init, 0)

        def body(_i, xs):
            ys = []
            for c in range(nchains):
                v = smem[0, xs[c] + c * 0]  # same table; offsets differ by start
                for _ in range(alu_ops):
                    v = (v * 5) & (N - 1)
                ys.append(v)
            return tuple(ys)

        # distinct starts so the K chains walk different positions
        xs0 = tuple(jnp.int32(7 * c + 1) for c in range(nchains))
        xs = lax.fori_loop(0, K_STEPS, body, xs0)
        acc = xs[0]
        for c in range(1, nchains):
            acc = acc + xs[c]
        out_ref[0, 0] = acc

    def run(tab):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((1, N), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[pltpu.SMEM((1, N), jnp.int32)],
        )(tab)

    return run


def main():
    rng = np.random.default_rng(0)
    perm = rng.permutation(N).astype(np.int32)
    tab = jnp.asarray(perm[None, :])

    for alu in (0, 2):
        for k in (1, 2, 4, 8):
            tag = f"k{k}a{alu}"
            try:
                fn = jax.jit(make_chase(k, alu))
                jax.block_until_ready(fn(tab))
                sec = trace_seconds(lambda: fn(tab), 5, tag)
                if sec is None:
                    print(f"{tag}: no trace", flush=True)
                else:
                    per_iter = sec * 1e9 / K_STEPS
                    print(
                        f"chains={k} alu={alu}: {per_iter:.2f} ns/iter "
                        f"({per_iter / k:.2f} ns/chain-step, {sec*1e3:.2f} ms/call)",
                        flush=True,
                    )
            except Exception as e:
                print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
