import zlib
import numpy as np
import jax.numpy as jnp
from zlib_rs_tpu.ops.pallas.inflate_kernel import decode_streams_pallas, pack_streams_words


def raw(data, level=6, fixed=False):
    c = zlib.compressobj(level, zlib.DEFLATED, -15, 9, zlib.Z_FIXED if fixed else zlib.Z_DEFAULT_STRATEGY)
    return c.compress(data) + c.flush()


def run(payloads, datas):
    words, bits = pack_streams_words(payloads)
    B = len(payloads)
    out, produced, bad, endbit = decode_streams_pallas(
        jnp.asarray(words), jnp.zeros((B,), jnp.int32), jnp.asarray(bits),
        jnp.asarray(np.array([len(d) for d in datas], np.int32)),
        max_out=max(len(d) for d in datas), interpret=True)
    out = np.asarray(out); produced = np.asarray(produced); bad = np.asarray(bad)
    for k, d in enumerate(datas):
        got = out[k, :len(d)].tobytes()
        print(f"lane{k}: bad={bad[k]} produced={produced[k]}/{len(d)} match={got==d} endbit={np.asarray(endbit)[k]}/{bits[k]}")
        if got != d and not bad[k]:
            for i in range(len(d)):
                if got[i] != d[i]:
                    print("  first diff at", i, got[max(0,i-3):i+5], d[max(0,i-3):i+5])
                    break


print("--- stored block ---")
d0 = b"hello stored block" * 3
run([raw(d0, level=0)], [d0])

print("--- fixed block ---")
d1 = b"abcabcabcabc fixed " * 4
run([raw(d1, fixed=True)], [d1])

print("--- dynamic block ---")
d2 = (b"the quick brown fox jumps over the lazy dog. " * 20)
run([raw(d2)], [d2])
