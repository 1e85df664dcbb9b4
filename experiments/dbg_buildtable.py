"""Numpy mirror of the kernel's build_table; diff against known-good
ops.huffman.inflate_table decode semantics on real chunk header lens."""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")

KIND_LIT, KIND_MATCH, KIND_EOB, KIND_SUB, KIND_INVALID = 0, 1, 2, 3, 7


def entry(kind, extra, nbits, val):
    return (kind << 28) | (extra << 22) | (nbits << 16) | (val & 0xFFFF)


def len_fields(sym):
    c = sym - 257
    e = max(0, (c - 4) >> 2)
    base = c + 3 if c < 4 else 3 + ((4 + (c & 3)) << e)
    if c == 28:
        base, e = 258, 0
    if sym < 256:
        return KIND_LIT, 0, sym
    if sym == 256:
        return KIND_EOB, 0, 0
    if c >= 29:
        return KIND_INVALID, 0, 0
    return KIND_MATCH, e, base


def dist_fields(sym):
    e = max(0, (sym >> 1) - 1)
    base = sym + 1 if sym < 2 else 1 + ((2 + (sym & 1)) << e)
    if sym >= 30:
        return KIND_INVALID, 0, 0
    return KIND_MATCH, e, base


def build_table(lens, root_in, kind_of, cap):
    n = len(lens)
    cnt = np.zeros(16, np.int64)
    for l in lens:
        if l > 0:
            cnt[l] += 1
    maxlen = max((i for i in range(1, 16) if cnt[i]), default=0)
    minlen = min((i for i in range(1, 16) if cnt[i]), default=15)
    root = min(max(root_in, minlen), max(maxlen, 1))
    left, ncodes = 1, 0
    for i in range(1, 16):
        left = left * 2 - cnt[i]
        ncodes += cnt[i]
        if left < 0:
            return None, root, "over"
    bad = left > 0 and not (kind_of == 2 and ncodes <= 1)
    if maxlen == 0:
        bad = True
    if bad:
        return None, root, "bad-pre"

    offs = np.zeros(16, np.int64)
    for i in range(2, 16):
        offs[i] = offs[i - 1] + cnt[i - 1]
    work = np.zeros(n, np.int64)
    for s in range(n):
        l = lens[s]
        if l > 0:
            work[offs[l]] = s
            offs[l] += 1

    tab = np.full(cap, entry(KIND_INVALID, 0, root, 0), np.uint32)
    huff, low, drop, curr, sub_off, used = 0, -1, 0, root, 0, 1 << root
    err = None
    for k in range(ncodes):
        sym = work[k]
        l = lens[sym]
        if l > root and (huff & ((1 << root) - 1)) != low:
            drop = root
            c = l - drop
            lft = 1 << c
            while c + drop < maxlen:
                lft -= cnt[c + drop]
                if lft <= 0:
                    break
                c += 1
                lft <<= 1
            sub_off = used
            used += 1 << c
            low = huff & ((1 << root) - 1)
            if used > cap:
                err = "cap"
                break
            tab[low] = entry(KIND_SUB, c, root, sub_off)
            curr = c
        if kind_of == 0:
            kind, extra, val = KIND_LIT, 0, sym
        elif kind_of == 1:
            kind, extra, val = len_fields(sym)
        else:
            kind, extra, val = dist_fields(sym)
        ent = entry(kind, extra, l, val)
        base = sub_off if drop > 0 else 0
        idx = huff >> drop
        step = 1 << (l - drop)
        region = 1 << (curr if drop > 0 else root)
        f = region
        while f > 0:
            f -= step
            slot = base + idx + f
            if slot >= cap or slot < 0:
                err = "slot"
                break
            tab[slot] = ent
        if err:
            break
        cnt[l] -= 1  # sizing of later subtables sees only remaining codes
        incr = 1 << (l - 1)
        while huff & incr:
            incr >>= 1
        huff = (huff & (incr - 1)) + incr if incr else 0
    return tab, root, err


def decode_sym(tab, root, window):
    e = int(tab[window & ((1 << root) - 1)])
    if (e >> 28) == KIND_SUB:
        sb = (e >> 22) & 0x3F
        off = e & 0xFFFF
        e = int(tab[off + ((window >> root) & ((1 << sb) - 1))])
    return e


def main():
    import pickle
    from zlib_rs_tpu.parallel.swarm_inflate import parse_block_header
    from zlib_rs_tpu.ops import huffman as H

    data, bodies, outs = pickle.load(open("/tmp/dbg_bodies.pkl", "rb"))

    for k, body in enumerate(bodies):
        parsed = parse_block_header(body)
        if parsed is None:
            print(f"lane{k}: stored/multi?")
            continue
        _bt, ll, d, hdr_bits = parsed
        for name, lens, root_in, kind_of, cap, nsym in (
            ("ll", ll[:286], 9, 1, 852, 286),
            ("d", d[:30], 6, 2, 592, 30),
        ):
            lens = np.asarray(lens[:nsym], np.int64)
            tab, root, err = build_table(lens, root_in, kind_of, cap)
            ref_tab, ref_root, ref_err = H.inflate_table(
                H.LENS if kind_of == 1 else H.DISTS, lens, 9 if kind_of == 1 else 6
            )
            print(f"lane{k} {name}: maxlen={lens.max()} err={err} ref_err={ref_err} root={root} ref_root={ref_root}")
            if err or ref_err:
                continue
            # compare decode over all windows up to maxlen bits
            _, lsb = H.canonical_codes(lens)
            badc = 0
            for s in np.flatnonzero(lens > 0):
                l = int(lens[s])
                code = int(lsb[s])
                # windows with low l bits == code
                for pad in (0, 1, (1 << (15 - l)) - 1):
                    win = code | (pad << l)
                    e = decode_sym(tab, root, win)
                    nb = (e >> 16) & 0x3F
                    kind = e >> 28
                    val = e & 0xFFFF
                    if kind_of == 1:
                        ek, ee, ev = len_fields(int(s))
                    else:
                        ek, ee, ev = dist_fields(int(s))
                    if nb != l or kind != ek or val != (ev & 0xFFFF):
                        if badc < 3:
                            print(f"  sym {s} len {l} -> kind={kind} nb={nb} val={val} want kind={ek} nb={l} val={ev}")
                        badc += 1
            print(f"  mismatches: {badc}")


if __name__ == "__main__":
    main()
