"""Probe Mosaic scalar-access primitives on the real chip.

Measures, via jax.profiler device traces, the per-step cost of:
  A. serial pointer-chase through an SMEM-resident int32 array
  B. serial pointer-chase through a VMEM-resident int32 array (scalar load)
  C. dynamic scalar store to VMEM
These set the speed-of-light for the sequential codec kernels
(ops/pallas/inflate_kernel.py, deflate_kernel.py).
"""
import sys, time, json, os, glob, gzip as gz

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 100_000  # chase steps
N = 32768    # table size


def trace_seconds(fn, reps, tag):
    trace_dir = f"/tmp/probe_{tag}_{os.getpid()}"
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


# ---- A: SMEM pointer chase -------------------------------------------------
def smem_chase_kernel(tab_ref, out_ref, smem):
    # copy table into SMEM scratch via scalar loop (cost excluded by steady-state timing)
    def init(i, _):
        smem[0, i] = tab_ref[0, i]
        return 0
    lax.fori_loop(0, N, init, 0)

    def body(_i, x):
        return smem[0, x]
    x = lax.fori_loop(0, K, body, jnp.int32(0))
    out_ref[0, 0] = x


def run_smem_chase(tab):
    return pl.pallas_call(
        smem_chase_kernel,
        in_specs=[pl.BlockSpec((1, N), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, N), jnp.int32)],
    )(tab)


# ---- B: VMEM pointer chase -------------------------------------------------
def vmem_chase_kernel(tab_ref, out_ref):
    def body(_i, x):
        return tab_ref[0, x]
    x = lax.fori_loop(0, K, body, jnp.int32(0))
    out_ref[0, 0] = x


def run_vmem_chase(tab):
    return pl.pallas_call(
        vmem_chase_kernel,
        in_specs=[pl.BlockSpec((1, N), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )(tab)


# ---- C: dynamic scalar store to VMEM ---------------------------------------
def vmem_store_kernel(tab_ref, out_ref):
    def body(i, x):
        out_ref[0, x & (N - 1)] = i
        return tab_ref[0, x]
    x = lax.fori_loop(0, K, body, jnp.int32(0))
    out_ref[0, 0] = x


def run_vmem_store(tab):
    return pl.pallas_call(
        vmem_store_kernel,
        in_specs=[pl.BlockSpec((1, N), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
    )(tab)


def main():
    rng = np.random.default_rng(0)
    perm = rng.permutation(N).astype(np.int32)
    tab = jnp.asarray(perm[None, :])

    for tag, fn in [("smem", run_smem_chase), ("vmem", run_vmem_chase), ("vstore", run_vmem_store)]:
        try:
            t0 = time.time()
            out = jax.jit(fn)(tab)
            jax.block_until_ready(out)
            print(f"{tag}: compiled+ran in {time.time()-t0:.1f}s result={np.asarray(out)[0,0]}", flush=True)
            sec = trace_seconds(lambda: jax.jit(fn)(tab), 5, tag)
            if sec is None:
                print(f"{tag}: no trace", flush=True)
            else:
                steps = K + (N if tag == "smem" else 0)
                print(f"{tag}: {sec*1e9/K:.2f} ns/step ({sec*1e3:.2f} ms/call, K={K})", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:500]}", flush=True)


if __name__ == "__main__":
    main()
