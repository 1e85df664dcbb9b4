"""Ablate the hop chase kernel stages on chip (round 5).

Measured 2026-08-21 (v5e, 8x32KiB level-6 batch, per-batch device trace):
    jumponly       2.519 ms   (delta-jump + emit: the loop floor)
    noext_hist     3.088 ms   (+ word-wise 4-bank literal histogram: +0.57)
    nofreq         3.381 ms   (jump + emit + byte-exact extension: +0.86)
    full           4.247 ms   (+ len/dist syms in-kernel: +0.30 -> since
                               moved to a VPU pass over the match stream)

Attribution: ~73 ns per emitted match at ~60 body ops => ISSUE-bound, so
K-way cross-chunk interleaving is neutral (chip-confirmed; the kernel
variant is kept behind ZRS_TPU_HOP_IL=2). The wins that worked are op
cuts and iteration cuts, not latency overlap. Results are garbage
output; the per-stage cost attribution is the point."""
import sys, glob, gzip as gzmod, json, os
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import bench
from zlib_rs_tpu.ops import lz77, lzvec
from zlib_rs_tpu.ops.pallas import deflate_kernel as DK

KCHUNK = 32768; KDICT = 31976; KB = 8
flat = np.frombuffer(bench.load_corpus(), np.uint8)
karr = np.zeros((KB, KDICT + KCHUNK + lz77.PAD), np.uint8)
kvf = np.zeros((KB,), np.int32)
for k in range(KB):
    seg = flat[k*KCHUNK:(k+1)*KCHUNK]
    karr[k, KDICT:KDICT+len(seg)] = seg
    dlen = min(KDICT, k*KCHUNK)
    if dlen: karr[k, KDICT-dlen:KDICT] = flat[k*KCHUNK-dlen:k*KCHUNK]
    kvf[k] = KDICT - dlen
bb = karr.reshape(KB, -1, 4).astype(np.uint32)
w4 = (bb[:,:,0] | (bb[:,:,1]<<8) | (bb[:,:,2]<<16) | (bb[:,:,3]<<24))
w4 = np.concatenate([w4, np.zeros((KB,2), np.uint32)], axis=1)
w4j = jnp.asarray(w4)
nv = jnp.full((KB,), KDICT+KCHUNK, jnp.int32)
vf = jnp.asarray(kvf)

# precompute htab once (we only time the Pallas chase)
htab = lzvec.build_hop_tables(w4j, nv, vf, depth=128, nice=128, good=8,
                              max_lazy=16, w_g=8)
htab = jax.block_until_ready(htab)
B, W = w4.shape
start = KDICT
tabn = 4*W - start
htab_s = jnp.asarray(np.asarray(htab)[:, start:start+tabn]).reshape(B,1,tabn)
meta = np.zeros((B,1,8), np.int32); meta[:,0,0] = KDICT+KCHUNK; meta[:,0,1] = start
meta = jnp.asarray(meta)
words3 = w4j.reshape(B,1,W)
CAP_M = DK.CAP_M
MIN_MATCH = 3

def mk(variant):
    cap_g = 32
    def kernel(meta_ref, words_ref, htab_ref, mpos_ref, mld_ref, st_ref, freq_ref):
        n_valid = meta_ref[0,0,0]; start = meta_ref[0,0,1]
        def zf(i,_):
            freq_ref[0,0,i] = 0; return 0
        lax.fori_loop(0, 1280, zf, 0)
        def get32(p):
            wi = p >> 2; sh = ((p & 3) << 3).astype(jnp.uint32)
            w0 = words_ref[0,0,wi]; w1 = words_ref[0,0,wi+1]
            return jnp.where(sh > 0, (w0 >> sh) | (w1 << (jnp.uint32(32)-sh)), w0)
        def extend(i, blen, dist, cap):
            def mcond(st): k, go = st; return go & (k < cap)
            def mbody(st):
                k,_ = st; eq = get32(i+k) == get32(i-dist+k)
                return jnp.where(eq, k+4, k), eq
            k,_ = lax.while_loop(mcond, mbody, (blen, True))
            k = jnp.minimum(k, cap)
            x = get32(i+k) ^ get32(i-dist+k)
            t0 = (x & jnp.uint32(0xFF)) == 0
            t1 = t0 & ((x & jnp.uint32(0xFFFF)) == 0)
            t2 = t1 & ((x & jnp.uint32(0xFFFFFF)) == 0)
            tail = t0.astype(jnp.int32)+t1.astype(jnp.int32)+t2.astype(jnp.int32)
            return jnp.minimum(k + jnp.where(x == 0, 0, tail), cap)
        def count_span(frm, to):
            def wcond(p): return p < to
            def wbody(p):
                w = get32(p); rem = to - p
                s0 = (w & jnp.uint32(0xFF)).astype(jnp.int32)
                s1 = jnp.where(rem>=2, ((w>>jnp.uint32(8))&jnp.uint32(0xFF)).astype(jnp.int32), 319)+320
                s2 = jnp.where(rem>=3, ((w>>jnp.uint32(16))&jnp.uint32(0xFF)).astype(jnp.int32), 319)+640
                s3 = jnp.where(rem>=4, (w>>jnp.uint32(24)).astype(jnp.int32), 319)+960
                freq_ref[0,0,s0] = freq_ref[0,0,s0]+1
                freq_ref[0,0,s1] = freq_ref[0,0,s1]+1
                freq_ref[0,0,s2] = freq_ref[0,0,s2]+1
                freq_ref[0,0,s3] = freq_ref[0,0,s3]+1
                return p+4
            lax.while_loop(wcond, wbody, frm)
        def emit(mc, pos, mlen, mdist, do_it, b):
            slot = jnp.where(do_it & (mc < CAP_M), mc, CAP_M)
            mpos_ref[0,0,slot] = pos
            mld_ref[0,0,slot] = ((mlen-MIN_MATCH).astype(jnp.uint32) << jnp.uint32(15)) | (mdist-1).astype(jnp.uint32)
            b = b | (do_it & (mc >= CAP_M))
            return mc + do_it.astype(jnp.int32), b
        def cond(st):
            iw,_mc,b = st; return (iw[0] < n_valid) & ~b
        def body(st):
            iw, mc, b = st
            i0 = iw[0]
            ht = htab_ref[0,0,i0-start]
            is_m = (ht >> 30) > 0
            i = jnp.where(is_m, i0, jnp.minimum(i0+ht, n_valid))
            ht = jnp.where(is_m, ht, htab_ref[0,0,jnp.minimum(i, n_valid-1)-start])
            do = i < n_valid
            h = (ht>>23)&0x7F; mlen = (ht>>16)&0x7F; dist = ht&0xFFFF
            ip = i + h
            if variant in ("full","nofreq"):
                pass
            if variant == "full":
                count_span(i0, jnp.where(do, ip, n_valid))
            if variant in ("full","nofreq","noext_hist"):
                if variant == "noext_hist":
                    count_span(i0, jnp.where(do, ip, n_valid))
                else:
                    mlen = lax.cond(do & (mlen == cap_g),
                        lambda a: extend(a[0],a[1],a[2], jnp.minimum(n_valid-a[0], MAX_MATCH := 258)),
                        lambda a: a[1], (ip, mlen, dist))
                    xt = get32(ip+mlen) ^ get32(jnp.maximum(ip-dist+mlen,0))
                    t0 = (xt & jnp.uint32(0xFF)) == 0
                    t1 = t0 & ((xt & jnp.uint32(0xFFFF)) == 0)
                    t2 = t1 & ((xt & jnp.uint32(0xFFFFFF)) == 0)
                    tail = t0.astype(jnp.int32)+t1.astype(jnp.int32)+t2.astype(jnp.int32)
                    mlen = jnp.minimum(mlen+tail, jnp.minimum(n_valid-ip, 258))
            mc, b = emit(mc, ip, jnp.maximum(mlen,3), jnp.maximum(dist,1), do, b)
            if variant == "full":
                lc,_,_ = DK._len_sym(mlen); dc,_,_ = DK._dist_sym(dist)
                ls = jnp.where(do, 257+lc, 286)
                freq_ref[0,0,ls] = freq_ref[0,0,ls]+1
                ds = jnp.where(do, 288+dc, 318)
                freq_ref[0,0,ds] = freq_ref[0,0,ds]+1
            nxt = jnp.where(do, ip + jnp.maximum(mlen,3), n_valid)
            return nxt[None], mc, b
        iw, mc, b = lax.while_loop(cond, body, (start[None]*1, jnp.int32(0), jnp.bool_(False)))
        st_ref[0,0,0] = mc; st_ref[0,0,1] = b.astype(jnp.int32)
        st_ref[0,0,2] = 0; st_ref[0,0,3] = 0
    return kernel

def run(variant):
    f = pl.pallas_call(
        mk(variant), grid=(B,),
        in_specs=[pl.BlockSpec((1,1,8), lambda b:(b,0,0), memory_space=pltpu.SMEM),
                  pl.BlockSpec((1,1,W), lambda b:(b,0,0), memory_space=pltpu.SMEM),
                  pl.BlockSpec((1,1,tabn), lambda b:(b,0,0), memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((1,1,CAP_M+8), lambda b:(b,0,0), memory_space=pltpu.SMEM),
                   pl.BlockSpec((1,1,CAP_M+8), lambda b:(b,0,0), memory_space=pltpu.SMEM),
                   pl.BlockSpec((1,1,8), lambda b:(b,0,0), memory_space=pltpu.SMEM),
                   pl.BlockSpec((1,1,1280), lambda b:(b,0,0), memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((B,1,CAP_M+8), jnp.int32),
                   jax.ShapeDtypeStruct((B,1,CAP_M+8), jnp.uint32),
                   jax.ShapeDtypeStruct((B,1,8), jnp.int32),
                   jax.ShapeDtypeStruct((B,1,1280), jnp.int32)],
    )
    jitted = jax.jit(lambda m,w,h: f(m,w,h))
    out = jitted(meta, words3, htab_s); jax.block_until_ready(out)
    nm = np.asarray(out[2])[:,0,0]
    td = f"/tmp/abl_{variant}"
    with jax.profiler.trace(td):
        for _ in range(4):
            r = jitted(meta, words3, htab_s)
        jax.block_until_ready(r)
    files = sorted(glob.glob(f"{td}/plugins/profile/*/*.trace.json.gz"))
    tr = json.load(gzmod.open(files[-1]))
    pn = {e["pid"]: e["args"].get("name","") for e in tr.get("traceEvents",[]) if e.get("ph")=="M" and e.get("name")=="process_name"}
    tot = sum(e.get("dur",0)/1e6 for e in tr.get("traceEvents",[])
              if e.get("ph")=="X" and "TPU" in pn.get(e.get("pid"),"") and e.get("name","").startswith("jit_"))
    print(f"{variant:12s} {tot/4*1e3:7.3f} ms/batch  nmatch={nm.tolist()}")

for v in ("jumponly", "noext_hist", "nofreq", "full"):
    run(v)
