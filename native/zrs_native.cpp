// zrs_native: native runtime for the zlib_rs_tpu framework.
//
// Plays the role native Rust plays in the reference (zlib-rs is native
// end-to-end): the host-side hot loops — LZ77 hash-chain matching, lazy
// parsing, canonical Huffman construction, bitstream packing, table-driven
// inflate, and slice-by-8 checksums — implemented from scratch in C++ with a
// C ABI consumed via ctypes (zlib_rs_tpu/native.py). A std::thread pool
// provides pigz-style chunk-parallel compression on host CPUs, mirroring the
// shard_map pipeline's seam protocol (sync-flush chunk boundaries).
//
// Nothing here is translated from the reference; the algorithms are the
// classic published ones (RFC 1951, hash-chain matching, canonical codes)
// in an independent implementation that matches zlib_rs_tpu's Python host
// engine decision-for-decision where it matters for tests.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <thread>
#include <algorithm>

namespace {

// ---------------------------------------------------------------------------
// checksums
// ---------------------------------------------------------------------------

constexpr uint32_t ADLER_BASE = 65521;

uint32_t adler32_impl(uint32_t start, const uint8_t* p, size_t n) {
  uint32_t a = start & 0xffff, b = (start >> 16) & 0xffff;
  while (n > 0) {
    size_t blk = n < 5552 ? n : 5552;  // NMAX block before mod reduction
    n -= blk;
    while (blk >= 8) {
      a += p[0]; b += a; a += p[1]; b += a; a += p[2]; b += a; a += p[3]; b += a;
      a += p[4]; b += a; a += p[5]; b += a; a += p[6]; b += a; a += p[7]; b += a;
      p += 8; blk -= 8;
    }
    while (blk--) { a += *p++; b += a; }
    a %= ADLER_BASE; b %= ADLER_BASE;
  }
  return (b << 16) | a;
}

struct Crc8Tables {
  uint32_t t[8][256];
  Crc8Tables() {
    for (uint32_t i = 0; i < 256; i++) {
      uint32_t c = i;
      for (int k = 0; k < 8; k++) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      t[0][i] = c;
    }
    for (uint32_t i = 0; i < 256; i++)
      for (int j = 1; j < 8; j++)
        t[j][i] = t[0][t[j - 1][i] & 0xff] ^ (t[j - 1][i] >> 8);
  }
};
const Crc8Tables CRC8;

uint32_t crc32_impl(uint32_t start, const uint8_t* p, size_t n) {
  uint32_t c = ~start;
  while (n >= 8) {  // slice-by-8
    uint32_t lo;
    std::memcpy(&lo, p, 4);
    lo ^= c;
    uint32_t hi;
    std::memcpy(&hi, p + 4, 4);
    c = CRC8.t[7][lo & 0xff] ^ CRC8.t[6][(lo >> 8) & 0xff] ^
        CRC8.t[5][(lo >> 16) & 0xff] ^ CRC8.t[4][lo >> 24] ^
        CRC8.t[3][hi & 0xff] ^ CRC8.t[2][(hi >> 8) & 0xff] ^
        CRC8.t[1][(hi >> 16) & 0xff] ^ CRC8.t[0][hi >> 24];
    p += 8; n -= 8;
  }
  while (n--) c = CRC8.t[0][(c ^ *p++) & 0xff] ^ (c >> 8);
  return ~c;
}

// ---------------------------------------------------------------------------
// shared RFC 1951 tables (derived at startup)
// ---------------------------------------------------------------------------

struct Rfc1951 {
  int len_base[29], len_extra[29];      // codes 257..285
  int dist_base[30], dist_extra[30];
  uint8_t len_code[256];                // (len-3) -> 0..28
  uint8_t dist_code[512];               // zlib-style 2-part LUT
  Rfc1951() {
    int l = 3, i = 0;
    for (; i < 8; i++) { len_base[i] = l; len_extra[i] = 0; l += 1; }
    for (int e = 1; e <= 5; e++)
      for (int k = 0; k < 4; k++) { len_base[i] = l; len_extra[i] = e; l += 1 << e; i++; }
    len_base[28] = 258; len_extra[28] = 0;
    for (int c = 0; c < 28; c++)
      for (int v = len_base[c] - 3; v < len_base[c + 1] - 3; v++) len_code[v] = c;
    len_code[255] = 28;
    int d = 1;
    dist_base[0] = 1; dist_base[1] = 2; dist_base[2] = 3; dist_base[3] = 4;
    dist_extra[0] = dist_extra[1] = dist_extra[2] = dist_extra[3] = 0;
    d = 5; i = 4;
    for (int e = 1; e <= 13; e++)
      for (int k = 0; k < 2; k++) { dist_base[i] = d; dist_extra[i] = e; d += 1 << e; i++; }
    std::memset(dist_code, 0, sizeof dist_code);
    for (int c = 0; c < 30; c++) {
      int lo = dist_base[c];
      int hi = c < 29 ? dist_base[c + 1] : 32769;
      for (int v = lo; v < hi && v <= 256; v++) dist_code[v - 1] = c;
      for (int v = std::max(lo, 257); v < hi; v++) dist_code[256 + ((v - 1) >> 7)] = c;
    }
  }
};
const Rfc1951 RFC;

inline int dist_to_code(int dist) {
  int d = dist - 1;
  return d < 256 ? RFC.dist_code[d] : RFC.dist_code[256 + (d >> 7)];
}

uint32_t bit_reverse(uint32_t v, int n) {
  uint32_t r = 0;
  for (int i = 0; i < n; i++) { r = (r << 1) | (v & 1); v >>= 1; }
  return r;
}

// ---------------------------------------------------------------------------
// canonical Huffman code lengths (two-queue tree + 15-bit overflow repair)
// ---------------------------------------------------------------------------

void huffman_lengths(const uint32_t* freq, int n, int max_bits, uint8_t* lens) {
  std::vector<int> syms;
  for (int i = 0; i < n; i++) if (freq[i]) syms.push_back(i);
  std::memset(lens, 0, n);
  if (syms.empty()) return;
  if (syms.size() == 1) { lens[syms[0]] = 1; return; }

  // sort used symbols by frequency (stable on symbol id for determinism)
  std::stable_sort(syms.begin(), syms.end(),
                   [&](int a, int b) { return freq[a] < freq[b]; });
  size_t m = syms.size();
  // two-queue Huffman: leaves queue + internal-nodes queue
  std::vector<uint64_t> leafw(m), nodew;
  std::vector<int> parent(2 * m, -1);
  for (size_t i = 0; i < m; i++) leafw[i] = freq[syms[i]];
  nodew.reserve(m);
  size_t li = 0, ni = 0;
  auto take = [&]() -> int {
    // returns node id: leaves are 0..m-1, internals m..2m-2
    bool leaf = li < m && (ni >= nodew.size() || leafw[li] <= nodew[ni]);
    return leaf ? (int)li++ : (int)(m + ni++);
  };
  for (size_t k = 0; k + 1 < m; k++) {
    int a = take(), b = take();
    uint64_t w = (a < (int)m ? leafw[a] : nodew[a - m]) +
                 (b < (int)m ? leafw[b] : nodew[b - m]);
    nodew.push_back(w);
    parent[a] = parent[b] = (int)(m + nodew.size() - 1);
  }
  // depths with CLAMPED propagation (zlib gen_bitlen semantics: a child's
  // depth derives from the parent's already-clamped depth, so every node
  // overshoots by at most one level and the -2 repair accounting is exact)
  std::vector<int> depth(2 * m, 0);
  int overflow = 0;
  for (int k = (int)(m + nodew.size()) - 2; k >= 0; k--) {
    if (parent[k] < 0) continue;
    int d = depth[parent[k]] + 1;
    if (d > max_bits) { d = max_bits; overflow++; }
    depth[k] = d;
  }
  std::vector<int> cnt(max_bits + 1, 0);
  for (size_t i = 0; i < m; i++) cnt[depth[i]]++;
  while (overflow > 0) {
    int bits = max_bits - 1;
    while (bits > 0 && cnt[bits] == 0) bits--;
    if (bits == 0) break;  // cannot happen for a valid tree; safety only
    cnt[bits]--;
    cnt[bits + 1] += 2;
    cnt[max_bits]--;
    overflow -= 2;
  }
  // assign lengths: rarest symbols get the deepest codes
  size_t idx = 0;
  for (int l = max_bits; l >= 1; l--)
    for (int k = 0; k < cnt[l]; k++) lens[syms[idx++]] = (uint8_t)l;
}

void canonical_codes(const uint8_t* lens, int n, uint16_t* codes_lsb) {
  int cnt[16] = {0};
  for (int i = 0; i < n; i++) cnt[lens[i]]++;
  cnt[0] = 0;
  uint32_t next[16] = {0};
  uint32_t code = 0;
  for (int l = 1; l <= 15; l++) { code = (code + cnt[l - 1]) << 1; next[l] = code; }
  for (int i = 0; i < n; i++) {
    if (!lens[i]) { codes_lsb[i] = 0; continue; }
    codes_lsb[i] = (uint16_t)bit_reverse(next[lens[i]]++, lens[i]);
  }
}

// static (fixed) trees, built once at load
struct StaticTrees {
  uint16_t llc[288];
  uint8_t lll[288];
  uint16_t dc[30];
  uint8_t dl[30];
  StaticTrees() {
    for (int i = 0; i < 288; i++) lll[i] = i < 144 ? 8 : i < 256 ? 9 : i < 280 ? 7 : 8;
    canonical_codes(lll, 288, llc);
    for (int i = 0; i < 30; i++) dl[i] = 5;
    canonical_codes(dl, 30, dc);
  }
};
const StaticTrees STATIC_TREES;

// ---------------------------------------------------------------------------
// bit writer
// ---------------------------------------------------------------------------

struct BitWriter {
  std::vector<uint8_t>& out;
  uint64_t buf = 0;
  int cnt = 0;
  explicit BitWriter(std::vector<uint8_t>& o) : out(o) {}
  inline void put(uint32_t v, int nbits) {
    buf |= (uint64_t)(v & ((1u << nbits) - 1)) << cnt;
    cnt += nbits;
    while (cnt >= 8) { out.push_back((uint8_t)buf); buf >>= 8; cnt -= 8; }
  }
  void align() { if (cnt) out.push_back((uint8_t)buf); buf = 0; cnt = 0; }
};

// ---------------------------------------------------------------------------
// deflate (chunk compressor): hash chains + greedy/lazy + dynamic trees
// ---------------------------------------------------------------------------

constexpr int MIN_MATCH = 3, MAX_MATCH = 258, WSIZE = 32768;
constexpr int HASH_BITS_N = 16, HASH_SIZE_N = 1 << HASH_BITS_N;

struct LevelCfg { int good, lazy, nice, chain; };
// mirrors CONFIGURATION_TABLE semantics (config.py / algorithm/mod.rs:69-82)
const LevelCfg LEVELS[10] = {
    {0, 0, 0, 0},      {0, 0, 8, 1},       {4, 4, 8, 4},      {4, 6, 16, 6},
    {4, 12, 32, 24},   {8, 16, 32, 32},    {8, 16, 128, 128}, {8, 32, 128, 256},
    {32, 128, 258, 1024}, {32, 258, 258, 4096}};

inline uint32_t hash4(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return (v * 2654435761u) >> (32 - HASH_BITS_N);
}

inline int match_len(const uint8_t* a, const uint8_t* b, int maxl) {
  int l = 0;
  while (l + 8 <= maxl) {
    uint64_t x, y;
    std::memcpy(&x, a + l, 8);
    std::memcpy(&y, b + l, 8);
    uint64_t d = x ^ y;
    if (d) return l + (__builtin_ctzll(d) >> 3);
    l += 8;
  }
  while (l < maxl && a[l] == b[l]) l++;
  return l;
}

struct Sym { uint16_t dist; uint16_t lenlit; };  // dist==0 -> literal

struct ChunkDeflater {
  const uint8_t* base;   // dict start
  size_t dict_len, n;    // input is base[dict_len .. dict_len+n)
  int level;
  std::vector<int32_t> head, prev;
  std::vector<Sym> syms;
  std::vector<uint8_t>& out;
  BitWriter bw;
  size_t block_start;    // absolute offset of current block start

  ChunkDeflater(const uint8_t* dict, size_t dlen, const uint8_t* in, size_t len,
                int lvl, std::vector<uint8_t>& o)
      : base(nullptr), dict_len(dlen), n(len), level(lvl),
        head(HASH_SIZE_N, -1), prev(WSIZE, -1), out(o), bw(o) {
    // contiguity: caller guarantees dict immediately precedes in when both set
    base = in - dlen;
    (void)dict;
    block_start = dict_len;
  }

  inline void insert(size_t pos, size_t total) {
    if (pos + 4 > total) return;
    uint32_t h = hash4(base + pos);
    prev[pos & (WSIZE - 1)] = head[h];
    head[h] = (int32_t)pos;
  }

  void longest(size_t pos, size_t total, int prev_len, int& best_len, int& best_dist) {
    best_len = 0; best_dist = 0;
    int maxl = (int)std::min<size_t>(MAX_MATCH, total - pos);
    if (maxl < MIN_MATCH || pos + 4 > total) return;
    const LevelCfg& cfg = LEVELS[level];
    int chain = cfg.chain > 0 ? cfg.chain : 1;
    if (cfg.good && prev_len >= cfg.good) chain >>= 2;
    int nice = std::min(std::max(cfg.nice, MIN_MATCH), maxl);
    int cur = head[hash4(base + pos)];
    if (cur == (int)pos) cur = prev[pos & (WSIZE - 1)];
    int bl = prev_len;
    const uint8_t* here = base + pos;
    while (cur >= 0 && chain-- > 0) {
      int dist = (int)pos - cur;
      if (dist > WSIZE - 262) break;
      const uint8_t* cand = base + cur;
      if (bl > 0 && (bl >= maxl || cand[bl] != here[bl])) { cur = prev[cur & (WSIZE - 1)]; continue; }
      int ml = match_len(here, cand, maxl);
      if (ml > bl) {
        bl = ml; best_len = ml; best_dist = dist;
        if (ml >= nice) break;
      }
      int nxt = prev[cur & (WSIZE - 1)];
      if (nxt >= cur) break;
      cur = nxt;
    }
    if (best_len == MIN_MATCH && best_dist > 4096) { best_len = 0; best_dist = 0; }
  }

  // ---- block emission -----------------------------------------------------

  void emit_stored(const uint8_t* p, size_t len, bool last) {
    size_t i = 0;
    do {
      size_t take = std::min<size_t>(len - i, 65535);
      bool fin = last && i + take == len;
      bw.put(fin ? 1 : 0, 1);
      bw.put(0, 2);
      bw.align();
      out.push_back(take & 0xff); out.push_back((take >> 8) & 0xff);
      out.push_back(~take & 0xff); out.push_back((~take >> 8) & 0xff);
      out.insert(out.end(), p + i, p + i + take);
      i += take;
    } while (i < len);
  }

  void emit_symbols(const uint16_t* llc, const uint8_t* lll,
                    const uint16_t* dc, const uint8_t* dl) {
    for (const Sym& s : syms) {
      if (s.dist == 0) {
        bw.put(llc[s.lenlit], lll[s.lenlit]);
      } else {
        int lc = RFC.len_code[s.lenlit - 3];
        bw.put(llc[257 + lc], lll[257 + lc]);
        if (RFC.len_extra[lc]) bw.put(s.lenlit - RFC.len_base[lc], RFC.len_extra[lc]);
        int c = dist_to_code(s.dist);
        bw.put(dc[c], dl[c]);
        if (RFC.dist_extra[c]) bw.put(s.dist - RFC.dist_base[c], RFC.dist_extra[c]);
      }
    }
    bw.put(llc[256], lll[256]);  // EOB
  }

  // RLE-encode a code length sequence with the 19-symbol alphabet
  struct RleSym { uint8_t sym; uint8_t val; uint8_t bits; };
  static void rle_lens(const uint8_t* lens, int n, std::vector<RleSym>& outv) {
    int i = 0, prev = -1;
    while (i < n) {
      int cur = lens[i], run = 1;
      while (i + run < n && lens[i + run] == cur) run++;
      int count = run;
      if (cur == 0) {
        while (count >= 11) { int t = std::min(count, 138); outv.push_back({18, (uint8_t)(t - 11), 7}); count -= t; }
        if (count >= 3) { outv.push_back({17, (uint8_t)(count - 3), 3}); count = 0; }
        while (count--) outv.push_back({0, 0, 0});
      } else {
        if (prev != cur) { outv.push_back({(uint8_t)cur, 0, 0}); count--; }
        while (count >= 3) { int t = std::min(count, 6); outv.push_back({16, (uint8_t)(t - 3), 2}); count -= t; }
        while (count-- > 0) outv.push_back({(uint8_t)cur, 0, 0});
      }
      prev = cur;
      i += run;
    }
  }

  void flush_block(bool last, size_t block_end) {
    // frequencies
    uint32_t llf[286] = {0}, df[30] = {0};
    for (const Sym& s : syms) {
      if (s.dist == 0) llf[s.lenlit]++;
      else { llf[257 + RFC.len_code[s.lenlit - 3]]++; df[dist_to_code(s.dist)]++; }
    }
    llf[256]++;
    uint8_t lll[286], dl[30];
    huffman_lengths(llf, 286, 15, lll);
    huffman_lengths(df, 30, 15, dl);
    int nlen = 257, ndist = 1;
    for (int i = 0; i < 286; i++) if (lll[i]) nlen = std::max(nlen, i + 1);
    for (int i = 0; i < 30; i++) if (dl[i]) ndist = std::max(ndist, i + 1);

    std::vector<RleSym> rle;
    rle_lens(lll, nlen, rle);
    size_t split = rle.size();
    rle_lens(dl, ndist, rle);
    uint32_t blf[19] = {0};
    uint64_t extra_bl = 0;
    for (auto& r : rle) { blf[r.sym]++; extra_bl += r.bits; }
    uint8_t bll[19];
    huffman_lengths(blf, 19, 7, bll);
    static const int ORDER[19] = {16,17,18,0,8,7,9,6,10,5,11,4,12,3,13,2,14,1,15};
    int hclen = 19;
    while (hclen > 4 && bll[ORDER[hclen - 1]] == 0) hclen--;

    // costs
    uint64_t opt = 5 + 5 + 4 + 3ull * hclen + extra_bl;
    for (int i = 0; i < 19; i++) opt += (uint64_t)blf[i] * bll[i];
    uint64_t dynbody = 0, statbody = 0;
    for (int i = 0; i < 286; i++) {
      int extra = i >= 257 && i < 286 ? RFC.len_extra[std::min(i - 257, 28)] : 0;
      dynbody += (uint64_t)llf[i] * (lll[i] + extra);
      int sl = i < 144 ? 8 : i < 256 ? 9 : i < 280 ? 7 : 8;
      statbody += (uint64_t)llf[i] * (sl + extra);
    }
    for (int i = 0; i < 30; i++) {
      dynbody += (uint64_t)df[i] * (dl[i] + RFC.dist_extra[i]);
      statbody += (uint64_t)df[i] * (5 + RFC.dist_extra[i]);
    }
    opt += dynbody;
    size_t nbytes = block_end - block_start;
    uint64_t stored_bits = 8ull * nbytes + 40ull * std::max<uint64_t>(1, (nbytes + 65534) / 65535);

    if (stored_bits <= std::min(opt, statbody) + 3 && nbytes > 0) {
      emit_stored(base + block_start, nbytes, last);
    } else if (statbody <= opt) {
      bw.put(last ? 1 : 0, 1);
      bw.put(1, 2);
      emit_symbols(STATIC_TREES.llc, STATIC_TREES.lll, STATIC_TREES.dc,
                   STATIC_TREES.dl);
    } else {
      uint16_t llc[286], dc[30], blc[19];
      canonical_codes(lll, 286, llc);
      canonical_codes(dl, 30, dc);
      canonical_codes(bll, 19, blc);
      bw.put(last ? 1 : 0, 1);
      bw.put(2, 2);
      bw.put(nlen - 257, 5);
      bw.put(ndist - 1, 5);
      bw.put(hclen - 4, 4);
      for (int i = 0; i < hclen; i++) bw.put(bll[ORDER[i]], 3);
      for (auto& r : rle) {
        bw.put(blc[r.sym], bll[r.sym]);
        if (r.bits) bw.put(r.val, r.bits);
      }
      emit_symbols(llc, lll, dc, dl);
    }
    (void)split;
    syms.clear();
    block_start = block_end;
  }

  void run(bool final_flag) {
    size_t total = dict_len + n;
    // pre-insert dictionary positions
    for (size_t i = dict_len > WSIZE ? dict_len - WSIZE : 0; i + 4 <= dict_len; i++)
      insert(i, total);
    size_t pos = dict_len;
    const LevelCfg& cfg = LEVELS[level];
    bool lazy_mode = level >= 4;
    int prev_len = 0, prev_dist = 0;
    bool match_avail = false;
    const size_t SYM_LIMIT = 1 << 14;

    if (level == 0) {
      emit_stored(base + dict_len, n, final_flag);
      if (!final_flag) { bw.align(); }
      return;
    }

    while (pos < total) {
      insert(pos, total);
      int len = 0, dist = 0;
      if (!match_avail || prev_len < cfg.lazy)
        longest(pos, total, match_avail ? prev_len : 0, len, dist);
      if (lazy_mode) {
        if (match_avail) {
          if (len > prev_len) {
            syms.push_back({0, base[pos - 1]});
            prev_len = len; prev_dist = dist;
          } else {
            syms.push_back({(uint16_t)prev_dist, (uint16_t)prev_len});
            size_t end = pos - 1 + prev_len;
            while (++pos < end) insert(pos, total);
            match_avail = false;
            if (syms.size() >= SYM_LIMIT) flush_block(false, pos);
            continue;
          }
        } else if (len >= MIN_MATCH) {
          prev_len = len; prev_dist = dist; match_avail = true;
        } else {
          syms.push_back({0, base[pos]});
        }
        pos++;
      } else {
        if (len >= MIN_MATCH) {
          syms.push_back({(uint16_t)dist, (uint16_t)len});
          size_t end = pos + len;
          while (++pos < end) insert(pos, total);
        } else {
          syms.push_back({0, base[pos]});
          pos++;
        }
      }
      if (syms.size() >= SYM_LIMIT) {
        if (lazy_mode && match_avail) continue;  // finish pending first
        flush_block(false, pos);
      }
    }
    if (match_avail) {
      if (prev_len >= MIN_MATCH && pos - 1 + prev_len <= total)
        syms.push_back({(uint16_t)prev_dist, (uint16_t)prev_len});
      else
        syms.push_back({0, base[pos - 1]});
    }
    if (!syms.empty() || block_start < total || final_flag) flush_block(final_flag, total);
    if (!final_flag) {
      // sync seam: byte-align with an empty stored block
      bw.put(0, 1); bw.put(0, 2); bw.align();
      out.push_back(0x00); out.push_back(0x00); out.push_back(0xff); out.push_back(0xff);
    } else {
      bw.align();
    }
  }
};

// ---------------------------------------------------------------------------
// inflate (raw): two-level tables + 64-bit bit reader
// ---------------------------------------------------------------------------

struct InfTable {
  // entry: bits 0..15 payload, 16..21 nbits, 22..27 aux, 28..31 kind
  // kind: 0 literal, 1 match-base, 2 EOB, 3 subtable, 4 invalid
  std::vector<uint32_t> t;
  int root = 0;
};

inline uint32_t mk_entry(int kind, int aux, int nbits, int payload) {
  return ((uint32_t)kind << 28) | ((uint32_t)aux << 22) | ((uint32_t)nbits << 16) |
         (uint32_t)payload;
}

static int maxlen_for_prefix(const uint8_t* lens, const uint16_t* codes, int n,
                             int low, int root) {
  int mx = 0;
  for (int s = 0; s < n; s++)
    if (lens[s] > root && (int)(codes[s] & ((1 << root) - 1)) == low)
      mx = std::max(mx, lens[s] - root);
  return mx;
}

// kind: 0 = lit/len alphabet, 1 = dist alphabet, 2 = code-length alphabet
int build_table(int alphabet, const uint8_t* lens, int n, int root, InfTable& tbl) {
  int cnt[16] = {0};
  int maxlen = 0, minlen = 16, ncodes = 0;
  for (int i = 0; i < n; i++) {
    if (!lens[i]) continue;
    cnt[lens[i]]++;
    ncodes++;
    maxlen = std::max(maxlen, (int)lens[i]);
    minlen = std::min(minlen, (int)lens[i]);
  }
  if (maxlen == 0) {
    if (alphabet != 1) return -1;
    tbl.root = 1;
    tbl.t.assign(2, mk_entry(4, 0, 1, 0));
    return 0;
  }
  int left = 1;
  for (int l = 1; l <= 15; l++) { left = (left << 1) - cnt[l]; if (left < 0) return -1; }
  if (left > 0 && (alphabet == 2 || ncodes != 1)) return -1;
  root = std::min(std::max(root, minlen), maxlen);
  tbl.root = root;

  uint16_t codes[320];
  canonical_codes(lens, n, codes);

  auto sym_entry = [&](int s, int nbits) -> uint32_t {
    if (alphabet == 0) {
      if (s < 256) return mk_entry(0, 0, nbits, s);
      if (s == 256) return mk_entry(2, 0, nbits, 0);
      int c = s - 257;
      if (c >= 29) return mk_entry(4, 0, nbits, 0);
      return mk_entry(1, RFC.len_extra[c], nbits, RFC.len_base[c]);
    }
    if (alphabet == 1) {
      if (s >= 30) return mk_entry(4, 0, nbits, 0);
      return mk_entry(1, RFC.dist_extra[s], nbits, RFC.dist_base[s]);
    }
    return mk_entry(0, 0, nbits, s);
  };

  tbl.t.assign(1u << root, mk_entry(4, 0, root, 0));
  // sub-table allocation for codes longer than root
  int sub_off[1 << 10];  // low-root-bits -> offset (root <= 10)
  int sub_bits_arr[1 << 10];
  std::fill(sub_off, sub_off + (1 << root), -1);
  for (int s = 0; s < n; s++) {
    if (lens[s] > root) {
      int low = codes[s] & ((1 << root) - 1);
      if (sub_off[low] < 0) {
        int sb = maxlen_for_prefix(lens, codes, n, low, root);
        sub_off[low] = (int)tbl.t.size();
        sub_bits_arr[low] = sb;
        tbl.t.resize(tbl.t.size() + (1u << sb), mk_entry(4, 0, sb, 0));
        tbl.t[low] = mk_entry(3, sb, root, sub_off[low]);
      }
    }
  }
  for (int s = 0; s < n; s++) {
    int l = lens[s];
    if (!l) continue;
    uint32_t code = codes[s];
    if (l <= root) {
      uint32_t e = sym_entry(s, l);
      for (uint32_t idx = code; idx < (1u << root); idx += 1u << l) tbl.t[idx] = e;
    } else {
      int low = code & ((1 << root) - 1);
      int off = sub_off[low], sb = sub_bits_arr[low];
      uint32_t hi = code >> root;
      uint32_t e = sym_entry(s, l - root);
      for (uint32_t idx = hi; idx < (1u << sb); idx += 1u << (l - root))
        tbl.t[off + idx] = e;
    }
  }
  return 0;
}

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t buf = 0;
  int cnt = 0;
  BitReader(const uint8_t* b, size_t n) : p(b), end(b + n) {}
  inline void refill() {
    // Invariant: bits [cnt, 64) of buf either are zero or duplicate the
    // bytes at p (the fast path deposits 64 bits but only counts a multiple
    // of 8), so OR-ing the next load over them is idempotent. Any code that
    // JUMPS p (stored-block memcpy) must call clear_stale() first.
    if (p + 8 <= end) {
      uint64_t w;
      std::memcpy(&w, p, 8);
      buf |= w << cnt;
      int added = (63 - cnt) & ~7;
      p += added >> 3;
      cnt += added;
      return;
    }
    buf &= cnt ? (~0ull >> (64 - cnt)) : 0;  // tail path: drop duplicates
    while (cnt <= 56 && p < end) { buf |= (uint64_t)(*p++) << cnt; cnt += 8; }
  }
  inline void clear_stale() { buf &= cnt ? (~0ull >> (64 - cnt)) : 0; }
  inline uint32_t peek(int n) { return (uint32_t)(buf & ((1ull << n) - 1)); }
  inline void drop(int n) { buf >>= n; cnt -= n; }
  inline bool need(int n) { if (cnt < n) refill(); return cnt >= n; }
  size_t consumed(const uint8_t* start) const { return (p - start) - cnt / 8; }
};

// returns out length, or -1 on data error, -2 on output overflow, -3 truncated.
// With allow_region_end, input ending cleanly at a block boundary is success
// (chunk bodies from the parallel seam format have no BFINAL).
long inflate_raw_impl(const uint8_t* in, size_t nin, uint8_t* out, size_t cap,
                      size_t* in_used, bool allow_region_end = false) {
  BitReader br(in, nin);
  size_t op = 0;
  static const int ORDER[19] = {16,17,18,0,8,7,9,6,10,5,11,4,12,3,13,2,14,1,15};
  for (;;) {
    if (!br.need(3)) {
      if (allow_region_end && br.cnt < 3) { if (in_used) *in_used = nin; return (long)op; }
      return -3;
    }
    int final_f = br.peek(1); br.drop(1);
    int type = br.peek(2); br.drop(2);
    if (type == 0) {
      br.drop(br.cnt & 7);
      if (!br.need(32)) return -3;
      unsigned len = br.peek(16); br.drop(16);
      unsigned nlen = br.peek(16); br.drop(16);
      if ((len ^ nlen) != 0xffff) return -1;
      if (op + len > cap) return -2;
      // bytes still in the bit buffer come first
      while (len && br.cnt >= 8) { out[op++] = (uint8_t)br.peek(8); br.drop(8); len--; }
      if (len) {
        if ((size_t)(br.end - br.p) < len) return -3;
        std::memcpy(out + op, br.p, len);
        br.p += len; op += len;
        br.clear_stale();  // p jumped: bits above cnt no longer match *p
      }
    } else if (type == 3) {
      return -1;
    } else {
      InfTable lt_dyn, dt_dyn;
      const InfTable *plt, *pdt;
      if (type == 1) {
        // C++11 magic statics: thread-safe one-time build of fixed tables.
        // The fixed dist tree is built over all 32 symbols (30/31 decode to
        // invalid) because the RFC's fixed code is deliberately complete
        // only at 32 — with 30 lengths it would be rejected as incomplete.
        static const std::pair<InfTable, InfTable> fixed = [] {
          std::pair<InfTable, InfTable> f;
          uint8_t l[288];
          for (int i = 0; i < 288; i++) l[i] = i < 144 ? 8 : i < 256 ? 9 : i < 280 ? 7 : 8;
          build_table(0, l, 288, 9, f.first);
          uint8_t d[32];
          for (int i = 0; i < 32; i++) d[i] = 5;
          build_table(1, d, 32, 5, f.second);
          return f;
        }();
        plt = &fixed.first;
        pdt = &fixed.second;
      } else {
        if (!br.need(14)) return -3;
        int nlen = (int)br.peek(5) + 257; br.drop(5);
        int ndist = (int)br.peek(5) + 1; br.drop(5);
        int ncode = (int)br.peek(4) + 4; br.drop(4);
        if (nlen > 286 || ndist > 30) return -1;
        uint8_t cl[19] = {0};
        for (int i = 0; i < ncode; i++) {
          if (!br.need(3)) return -3;
          cl[ORDER[i]] = (uint8_t)br.peek(3); br.drop(3);
        }
        InfTable ct;
        if (build_table(2, cl, 19, 7, ct)) return -1;
        uint8_t lens[320] = {0};
        int have = 0;
        while (have < nlen + ndist) {
          if (!br.need(7 + 7)) { if (!br.need(7)) return -3; }
          uint32_t e = ct.t[br.peek(ct.root)];
          int nb = (e >> 16) & 0x3f;
          int sym = e & 0xffff;
          if (br.cnt < nb) return -3;
          if (sym < 16) { br.drop(nb); lens[have++] = (uint8_t)sym; continue; }
          int extra = sym == 16 ? 2 : sym == 17 ? 3 : 7;
          if (!br.need(nb + extra)) return -3;
          br.drop(nb);
          int rep, fill = 0;
          if (sym == 16) {
            if (have == 0) return -1;
            rep = 3 + (int)br.peek(2); br.drop(2);
            fill = lens[have - 1];
          } else if (sym == 17) { rep = 3 + (int)br.peek(3); br.drop(3); }
          else { rep = 11 + (int)br.peek(7); br.drop(7); }
          if (have + rep > nlen + ndist) return -1;
          while (rep--) lens[have++] = (uint8_t)fill;
        }
        if (lens[256] == 0) return -1;
        if (build_table(0, lens, nlen, 10, lt_dyn)) return -1;
        if (build_table(1, lens + nlen, ndist, 9, dt_dyn)) return -1;
        plt = &lt_dyn;
        pdt = &dt_dyn;
      }
      const InfTable& lt = *plt;
      const InfTable& dt = *pdt;
      // decode loop
      for (;;) {
        if (!br.need(15)) { if (br.cnt == 0 && br.p >= br.end) return -3; }
        uint32_t e = lt.t[br.peek(lt.root)];
        int kind = e >> 28, nb = (e >> 16) & 0x3f;
        if (kind == 3) {
          int off = e & 0xffff, sb = (e >> 22) & 0x3f;
          e = lt.t[off + ((br.peek(nb + sb)) >> nb)];
          kind = e >> 28;
          nb += (e >> 16) & 0x3f;
        }
        if (br.cnt < nb) { if (!br.need(nb)) return -3; continue; }
        if (kind == 0) {
          if (op >= cap) return -2;
          br.drop(nb);
          out[op++] = (uint8_t)(e & 0xff);
          continue;
        }
        if (kind == 2) { br.drop(nb); break; }
        if (kind == 4) return -1;
        int aux = (e >> 22) & 0x3f;
        if (!br.need(nb + aux)) return -3;
        br.drop(nb);
        int length = (int)(e & 0xffff) + (aux ? (int)br.peek(aux) : 0);
        if (aux) br.drop(aux);
        if (!br.need(15)) { }
        uint32_t de = dt.t[br.peek(dt.root)];
        int dkind = de >> 28, dnb = (de >> 16) & 0x3f;
        if (dkind == 3) {
          int off = de & 0xffff, sb = (de >> 22) & 0x3f;
          de = dt.t[off + ((br.peek(dnb + sb)) >> dnb)];
          dkind = de >> 28;
          dnb += (de >> 16) & 0x3f;
        }
        if (dkind == 4) return -1;
        int daux = (de >> 22) & 0x3f;
        if (!br.need(dnb + daux)) return -3;
        br.drop(dnb);
        int dist = (int)(de & 0xffff) + (daux ? (int)br.peek(daux) : 0);
        if (daux) br.drop(daux);
        if ((size_t)dist > op) return -1;
        if (op + length > cap) return -2;
        // overlap-safe back copy
        const uint8_t* src = out + op - dist;
        if (dist >= 8 && length <= dist) {
          std::memcpy(out + op, src, length);
          op += length;
        } else {
          for (int i = 0; i < length; i++) out[op + i] = src[i];
          op += length;
        }
      }
    }
    if (final_f) break;
  }
  if (in_used) *in_used = br.consumed(in);
  return (long)op;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

uint32_t zrs_adler32(uint32_t start, const uint8_t* p, size_t n) {
  return adler32_impl(start, p, n);
}

uint32_t zrs_crc32(uint32_t start, const uint8_t* p, size_t n) {
  return crc32_impl(start, p, n);
}

// Compress one chunk to raw deflate. dict may be NULL; if set it MUST be the
// bytes immediately preceding `in` in memory OR a separate buffer (copied).
// Returns bytes written, or -1 if out_cap is too small.
long zrs_deflate_chunk(const uint8_t* dict, size_t dict_len, const uint8_t* in,
                       size_t n, int level, int final_flag, uint8_t* out_buf,
                       size_t out_cap) {
  if (level < 0) level = 6;
  if (level > 9) level = 9;
  std::vector<uint8_t> out;
  out.reserve(n / 2 + 1024);
  std::vector<uint8_t> merged;
  const uint8_t* input = in;
  size_t dlen = 0;
  if (dict && dict_len) {
    dlen = std::min<size_t>(dict_len, WSIZE);
    merged.reserve(dlen + n);
    merged.insert(merged.end(), dict + dict_len - dlen, dict + dict_len);
    merged.insert(merged.end(), in, in + n);
    input = merged.data() + dlen;
  }
  ChunkDeflater d(nullptr, dlen, input, n, level, out);
  d.run(final_flag != 0);
  if (out.size() > out_cap) return -1;
  std::memcpy(out_buf, out.data(), out.size());
  return (long)out.size();
}

long zrs_inflate_raw(const uint8_t* in, size_t n, uint8_t* out, size_t cap,
                     size_t* in_used) {
  return inflate_raw_impl(in, n, out, cap, in_used);
}

// pigz-style multithreaded chunked deflate: one raw stream, sync seams
// between chunks, optional 32KB dictionary priming from the previous chunk.
long zrs_deflate_parallel(const uint8_t* in, size_t n, int level, size_t chunk,
                          int prime_dict, int nthreads, uint8_t* out_buf,
                          size_t out_cap) {
  if (chunk == 0) chunk = 128 * 1024;
  size_t nchunks = n ? (n + chunk - 1) / chunk : 1;
  std::vector<std::vector<uint8_t>> parts(nchunks);
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  nthreads = std::max(1, std::min<int>(nthreads, (int)nchunks));

  std::vector<std::thread> pool;
  std::atomic_size_t next{0};
  auto worker = [&]() {
    for (;;) {
      size_t k = next.fetch_add(1);
      if (k >= nchunks) return;
      size_t lo = k * chunk, hi = std::min(n, lo + chunk);
      const uint8_t* dict = nullptr;
      size_t dlen = 0;
      if (prime_dict && k > 0) {
        dlen = std::min<size_t>(WSIZE, lo);
        dict = in + lo - dlen;
      }
      std::vector<uint8_t>& out = parts[k];
      out.reserve((hi - lo) / 2 + 1024);
      std::vector<uint8_t> merged;
      const uint8_t* input = in + lo;
      if (dict && dlen) {
        merged.reserve(dlen + (hi - lo));
        merged.insert(merged.end(), dict, dict + dlen);
        merged.insert(merged.end(), in + lo, in + hi);
        input = merged.data() + dlen;
      }
      ChunkDeflater d(nullptr, dict ? dlen : 0, input, hi - lo,
                      level < 0 ? 6 : level, out);
      d.run(k == nchunks - 1);
    }
  };
  for (int t = 0; t < nthreads; t++) pool.emplace_back(worker);
  for (auto& t : pool) t.join();

  size_t total = 0;
  for (auto& p : parts) total += p.size();
  if (total > out_cap) return -1;
  size_t off = 0;
  for (auto& p : parts) { std::memcpy(out_buf + off, p.data(), p.size()); off += p.size(); }
  return (long)total;
}

// Parallel inflate of independent raw-deflate regions (indexed chunks from
// the pigz-style stream format): each region decodes on its own thread into
// its slot of the output buffer. Returns total output bytes, or -(k+1) when
// region k failed.
long zrs_inflate_parallel(const uint8_t* in, const uint64_t* offs,
                          const uint64_t* lens, const uint64_t* out_offs,
                          const uint64_t* out_sizes, size_t nchunks,
                          uint8_t* out_buf, int nthreads) {
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  nthreads = std::max(1, std::min<int>(nthreads, (int)nchunks));
  std::vector<long> results(nchunks, 0);
  std::atomic_size_t next{0};
  auto worker = [&]() {
    for (;;) {
      size_t k = next.fetch_add(1);
      if (k >= nchunks) return;
      size_t used = 0;
      results[k] = inflate_raw_impl(in + offs[k], lens[k], out_buf + out_offs[k],
                                    out_sizes[k], &used, /*allow_region_end=*/true);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < nthreads; t++) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  long total = 0;
  for (size_t k = 0; k < nchunks; k++) {
    if (results[k] < 0) return -(long)(k + 1);
    total += results[k];
  }
  return total;
}

}  // extern "C"
