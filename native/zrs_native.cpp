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
#include <cstdio>
#include <chrono>
#include <mutex>

#if defined(__AVX2__)
#include <immintrin.h>
#endif

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
// canonical codes (shared by static trees and the exact tree builder)
// ---------------------------------------------------------------------------

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

// 64-bit bit accumulator over a resize-ahead byte sink: a put never touches
// vector bookkeeping on the hot path (one capacity check + an 8-byte memcpy
// when the accumulator fills). Callers must call finish() to trim the vector
// to the committed length.
struct BitWriter {
  std::vector<uint8_t>& out;
  uint64_t buf = 0;
  int cnt = 0;      // bits held in buf; invariant cnt < 64
  size_t wpos = 0;  // bytes committed to out
  explicit BitWriter(std::vector<uint8_t>& o) : out(o) {}
  inline void grow(size_t need) {
    if (wpos + need > out.size())
      out.resize(std::max(out.size() * 2, wpos + need + 4096));
  }
  // v must already be masked to n bits; n <= 56
  inline void put64(uint64_t v, int n) {
    if (cnt + n < 64) {
      buf |= v << cnt;
      cnt += n;
    } else {  // cnt >= 64-n >= 8, so the shift below is defined
      buf |= v << cnt;
      grow(8);
      std::memcpy(out.data() + wpos, &buf, 8);
      wpos += 8;
      buf = v >> (64 - cnt);
      cnt = cnt + n - 64;
    }
  }
  inline void put(uint32_t v, int nbits) {
    put64(v & ((1u << nbits) - 1), nbits);
  }
  void align() {
    grow(8);
    while (cnt > 0) { out[wpos++] = (uint8_t)buf; buf >>= 8; cnt -= 8; }
    buf = 0;
    cnt = 0;
  }
  // byte-level appends; only valid while bit-aligned
  inline void byte(uint8_t b) { grow(1); out[wpos++] = b; }
  inline void bytes(const uint8_t* p, size_t n) {
    grow(n);
    std::memcpy(out.data() + wpos, p, n);
    wpos += n;
  }
  void finish() { out.resize(wpos); }
};

// ---------------------------------------------------------------------------
// deflate: zlib-exact engine. Mirrors models/deflate.py + models/trees.py
// decision-for-decision so native output is byte-identical to the zlib
// oracle at levels 1-9 (reference parity model: end_to_end.rs:42).
// ---------------------------------------------------------------------------

constexpr int MIN_MATCH = 3, MAX_MATCH = 258, WSIZE = 32768;
constexpr int MIN_LOOKAHEAD = MAX_MATCH + MIN_MATCH + 1;  // 262
constexpr int MAX_DIST_N = WSIZE - MIN_LOOKAHEAD;
constexpr int HASH_BITS_N = 15, HASH_SIZE_N = 1 << HASH_BITS_N;  // memLevel 8
constexpr int HASH_SHIFT_N = (HASH_BITS_N + MIN_MATCH - 1) / MIN_MATCH;  // 5
constexpr int TOO_FAR_N = 4096;
constexpr int L_CODES_N = 286, D_CODES_N = 30, BL_CODES_N = 19;
constexpr int HEAP_SIZE_N = 2 * L_CODES_N + 1;
constexpr size_t LIT_BUFSIZE_N = 1 << 14;      // memLevel 8
constexpr size_t SYM_END_N = LIT_BUFSIZE_N - 1;  // flush threshold

struct LevelCfg { int good, lazy, nice, chain; bool slow; };
// classic zlib configuration_table: levels 1-3 greedy, 4-9 lazy
const LevelCfg LEVELS[10] = {
    {0, 0, 0, 0, false},
    {4, 4, 8, 4, false},      {4, 5, 16, 8, false},    {4, 6, 32, 32, false},
    {4, 4, 16, 16, true},     {8, 16, 32, 32, true},   {8, 16, 128, 128, true},
    {8, 32, 128, 256, true},  {32, 128, 258, 1024, true},
    {32, 258, 258, 4096, true}};

// zlib's 3-byte rolling hash expanded per position
inline uint32_t hash3(const uint8_t* p) {
  return (((uint32_t)p[0] << (2 * HASH_SHIFT_N)) ^ ((uint32_t)p[1] << HASH_SHIFT_N) ^
          (uint32_t)p[2]) & (uint32_t)(HASH_SIZE_N - 1);
}

inline uint16_t load16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

inline int match_len_fast(const uint8_t* a, const uint8_t* b, int maxl) {
  int l = 0;
#if defined(__AVX2__)
  // 32-byte compare256 lanes (the reference's SIMD compare256 role,
  // compare256.rs:113+) — first-mismatch via inverted movemask
  while (l + 32 <= maxl) {
    __m256i x = _mm256_loadu_si256((const __m256i*)(a + l));
    __m256i y = _mm256_loadu_si256((const __m256i*)(b + l));
    uint32_t m = ~(uint32_t)_mm256_movemask_epi8(_mm256_cmpeq_epi8(x, y));
    if (m) return l + (int)__builtin_ctz(m);
    l += 32;
  }
#endif
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

// zlib-exact per-block tree construction: frequency heap with (freq, depth)
// tie-breaking, 15-bit overflow redistribution, shared opt/static bit
// accumulators across the three trees (reference: deflate.rs:1926-2143).
struct TreeBuild {
  uint64_t opt_len = 0, static_len = 0;

  int build(const uint32_t* freq_in, int elems, const uint8_t* stree_len,
            const int* extra, int extra_base, int max_length,
            uint8_t* lens, uint16_t* codes) {
    const int nnodes = 2 * elems + 1;  // <= 573
    uint64_t f[2 * L_CODES_N + 1];
    int length[2 * L_CODES_N + 1], dad[2 * L_CODES_N + 1], depth[2 * L_CODES_N + 1];
    std::memset(f, 0, nnodes * sizeof(uint64_t));
    std::memset(length, 0, nnodes * sizeof(int));
    std::memset(dad, 0, nnodes * sizeof(int));
    std::memset(depth, 0, nnodes * sizeof(int));
    for (int i = 0; i < elems; i++) f[i] = freq_in[i];

    int heap[HEAP_SIZE_N + 1] = {0};
    int heap_len = 0, heap_max = HEAP_SIZE_N;
    int max_code = -1;
    for (int i = 0; i < elems; i++) {
      if (f[i]) { heap[++heap_len] = i; max_code = i; depth[i] = 0; }
      else lens[i] = 0;
    }
    while (heap_len < 2) {
      int node = max_code < 2 ? ++max_code : 0;
      heap[++heap_len] = node;
      f[node] = 1;
      depth[node] = 0;
      opt_len--;
      if (stree_len) static_len -= stree_len[node];
    }

    auto smaller = [&](int a, int b) {
      return f[a] < f[b] || (f[a] == f[b] && depth[a] <= depth[b]);
    };
    auto downheap = [&](int k) {
      int v = heap[k];
      int j = k << 1;
      while (j <= heap_len) {
        if (j < heap_len && smaller(heap[j + 1], heap[j])) j++;
        if (smaller(v, heap[j])) break;
        heap[k] = heap[j];
        k = j;
        j <<= 1;
      }
      heap[k] = v;
    };
    for (int k = heap_len / 2; k >= 1; k--) downheap(k);

    int node = elems;
    do {
      int nmin = heap[1];
      heap[1] = heap[heap_len--];
      downheap(1);
      int m = heap[1];
      heap[--heap_max] = nmin;
      heap[--heap_max] = m;
      f[node] = f[nmin] + f[m];
      depth[node] = std::max(depth[nmin], depth[m]) + 1;
      dad[nmin] = dad[m] = node;
      heap[1] = node++;
      downheap(1);
    } while (heap_len >= 2);
    heap[--heap_max] = heap[1];

    // gen_bitlen
    int bl_count[16] = {0};
    length[heap[heap_max]] = 0;
    int overflow = 0;
    for (int h = heap_max + 1; h < HEAP_SIZE_N; h++) {
      int nn = heap[h];
      int bits = length[dad[nn]] + 1;
      if (bits > max_length) { bits = max_length; overflow++; }
      length[nn] = bits;
      if (nn > max_code) continue;
      bl_count[bits]++;
      int xbits = nn >= extra_base ? extra[nn - extra_base] : 0;
      uint64_t fr = f[nn];
      opt_len += fr * (uint64_t)(bits + xbits);
      if (stree_len) static_len += fr * (uint64_t)(stree_len[nn] + xbits);
    }
    if (overflow > 0) {
      do {
        int bits = max_length - 1;
        while (bl_count[bits] == 0) bits--;
        bl_count[bits]--;
        bl_count[bits + 1] += 2;
        bl_count[max_length]--;
        overflow -= 2;
      } while (overflow > 0);
      int h = HEAP_SIZE_N;
      for (int bits = max_length; bits != 0; bits--) {
        int nn = bl_count[bits];
        while (nn != 0) {
          int m = heap[--h];
          if (m > max_code) continue;
          if (length[m] != bits) {
            opt_len += (uint64_t)(bits - length[m]) * f[m];
            length[m] = bits;
          }
          nn--;
        }
      }
    }
    // gen_codes
    uint32_t next_code[16] = {0};
    uint32_t code = 0;
    for (int bits = 1; bits <= max_length; bits++) {
      code = (code + bl_count[bits - 1]) << 1;
      next_code[bits] = code;
    }
    for (int nn = 0; nn <= max_code; nn++) {
      int ln = length[nn];
      lens[nn] = (uint8_t)ln;
      codes[nn] = ln ? (uint16_t)bit_reverse(next_code[ln]++, ln) : 0;
    }
    for (int nn = max_code + 1; nn < elems; nn++) { lens[nn] = 0; codes[nn] = 0; }
    return max_code;
  }
};

const int EXTRA_BL_N[19] = {0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,2,3,7};
const int BL_ORDER_N[19] = {16,17,18,0,8,7,9,6,10,5,11,4,12,3,13,2,14,1,15};
constexpr int REP_3_6_N = 16, REPZ_3_10_N = 17, REPZ_11_138_N = 18;

// scan_tree / send_tree: zlib's exact run-coalescing state machine
void scan_tree_n(const uint8_t* lens, int max_code, uint32_t* bl_freq) {
  int prevlen = -1;
  int nextlen = lens[0];
  int count = 0;
  int max_count = nextlen == 0 ? 138 : 7;
  int min_count = nextlen == 0 ? 3 : 4;
  for (int n = 0; n <= max_code; n++) {
    int curlen = nextlen;
    nextlen = n + 1 <= max_code ? lens[n + 1] : 0xffff;
    if (++count < max_count && curlen == nextlen) continue;
    else if (count < min_count) bl_freq[curlen] += count;
    else if (curlen != 0) {
      if (curlen != prevlen) bl_freq[curlen]++;
      bl_freq[REP_3_6_N]++;
    } else if (count <= 10) bl_freq[REPZ_3_10_N]++;
    else bl_freq[REPZ_11_138_N]++;
    count = 0;
    prevlen = curlen;
    if (nextlen == 0) { max_count = 138; min_count = 3; }
    else if (curlen == nextlen) { max_count = 6; min_count = 3; }
    else { max_count = 7; min_count = 4; }
  }
}

void send_tree_n(BitWriter& bw, const uint8_t* lens, int max_code,
                 const uint8_t* bl_len, const uint16_t* bl_code) {
  int prevlen = -1;
  int nextlen = lens[0];
  int count = 0;
  int max_count = nextlen == 0 ? 138 : 7;
  int min_count = nextlen == 0 ? 3 : 4;
  for (int n = 0; n <= max_code; n++) {
    int curlen = nextlen;
    nextlen = n + 1 <= max_code ? lens[n + 1] : 0xffff;
    if (++count < max_count && curlen == nextlen) continue;
    else if (count < min_count) {
      do { bw.put(bl_code[curlen], bl_len[curlen]); } while (--count != 0);
    } else if (curlen != 0) {
      if (curlen != prevlen) { bw.put(bl_code[curlen], bl_len[curlen]); count--; }
      bw.put(bl_code[REP_3_6_N], bl_len[REP_3_6_N]);
      bw.put(count - 3, 2);
    } else if (count <= 10) {
      bw.put(bl_code[REPZ_3_10_N], bl_len[REPZ_3_10_N]);
      bw.put(count - 3, 3);
    } else {
      bw.put(bl_code[REPZ_11_138_N], bl_len[REPZ_11_138_N]);
      bw.put(count - 11, 7);
    }
    count = 0;
    prevlen = curlen;
    if (nextlen == 0) { max_count = 138; min_count = 3; }
    else if (curlen == nextlen) { max_count = 6; min_count = 3; }
    else { max_count = 7; min_count = 4; }
  }
}

struct Sym { uint16_t dist; uint16_t lenlit; };  // dist==0 -> literal

// Fused static-tree length emission table for the QUICK path: one put64
// per length value (code + extra bits pre-combined). Computed once.
struct QuickTab {
  uint32_t ltab[256];
  uint8_t ltn[256];
  QuickTab() {
    for (int v = 0; v < 256; v++) {
      int lc = RFC.len_code[v];
      int sym = 257 + lc;
      ltab[v] = (uint32_t)STATIC_TREES.llc[sym] |
                ((uint32_t)(v + 3 - RFC.len_base[lc]) << STATIC_TREES.lll[sym]);
      ltn[v] = (uint8_t)(STATIC_TREES.lll[sym] + RFC.len_extra[lc]);
    }
  }
};
const QuickTab QUICK_TAB;

// level 10 selects the QUICK fast mode (not a zlib level); 11-13 select the
// MEDIUM mode (zlib-ng's deflate_medium algorithm class, medium.rs:12-331)
// with the knob rows of zlib levels 4/5/6
constexpr int QUICK_LEVEL = 10;
constexpr int MEDIUM_BASE = 11;  // 11 -> level-4 knobs, 12 -> 5, 13 -> 6

struct ChunkDeflater {
  const uint8_t* base;   // window position 0 (dict start when priming)
  size_t dict_len, n;    // input is base[dict_len .. dict_len+n)
  int level;
  std::vector<int32_t> head;
  // Chain table stores 16-bit DELTAS to the previous occurrence (zlib keeps
  // 16-bit absolute positions + window sliding; deltas avoid the slide while
  // halving the hot array to 64 KiB). delta==0 means empty. Any step of
  // >= 32768 positions necessarily lands at or below the longest_match
  // limit (pos - MAX_DIST_N), so capping at 0xffff cannot create or drop a
  // reachable candidate — the walk is decision-identical to absolute links.
  std::vector<uint16_t> prevd;
  std::vector<Sym> syms;  // preallocated LIT_BUFSIZE_N slots, ns in use
  size_t ns = 0;
  std::vector<uint8_t>& out;
  BitWriter bw;
  size_t block_start;    // absolute offset of current block start

  // lazy matcher carry state (zlib State fields)
  int match_length = MIN_MATCH - 1;
  size_t match_start = 0;
  int prev_length = MIN_MATCH - 1;
  size_t prev_start = 0;
  bool match_available = false;

  // resumable scan cursor (streaming pumps pause/resume here; the one-shot
  // path runs the same loops to completion, so the bit-exact oracle tests
  // cover both)
  size_t spos = 0;
  uint32_t sh = 0;
  bool shv = false;
  bool started = false;

  // MEDIUM mode carry state: the pre-found next match (medium.rs Match)
  size_t med_next_start = 0, med_next_strstart = 0, med_next_orgstart = 0;
  int med_next_len = 0;
  int klevel;  // knob row in LEVELS (== level for 0-9)
  // MEDIUM's own 4-byte-hash chain tables (the reference's StandardHashCalc
  // role, hash_calc.rs:25-82): with WANT_MIN == 4 a 3-byte hash drowns the
  // walk in length-3 collisions — measured 6.5 -> ~20+ MB/s from this alone
  std::vector<int32_t> head4;
  std::vector<uint16_t> prevd4;

  ChunkDeflater(const uint8_t* dict, size_t dlen, const uint8_t* in, size_t len,
                int lvl, std::vector<uint8_t>& o)
      : base(nullptr), dict_len(dlen), n(len), level(lvl),
        head(HASH_SIZE_N, 0), prevd(WSIZE, 0), syms(LIT_BUFSIZE_N), out(o),
        bw(o) {
    // contiguity: caller guarantees dict immediately precedes in when both set
    base = in - dlen;
    (void)dict;
    block_start = dict_len;
    // knob row: MEDIUM levels 11-13 use the level-5/6/7 search rows — one
    // deeper than their zlib-level counterpart; measured Pareto point
    // (medium-4 at row 5: 1.002x zlib-4 size at ~2.8x exact-L6 speed)
    klevel = lvl >= MEDIUM_BASE && lvl <= MEDIUM_BASE + 2 ? lvl - MEDIUM_BASE + 5
             : lvl >= 0 && lvl <= 9                       ? lvl
                                                          : 6;
  }

  // NIL == position 0: base[0] plays zlib's window offset 0 and is never a
  // match candidate (head value 0 / delta to 0 means "empty chain")
  inline void insert_h(size_t pos, uint32_t h) {
    long d = (long)pos - head[h];  // head[h]==0 -> delta==pos -> walks to NIL
    prevd[pos & (WSIZE - 1)] = (uint16_t)std::min<long>(d, 0xffff);
    head[h] = (int32_t)pos;
  }

  inline void insert(size_t pos) { insert_h(pos, hash3(base + pos)); }

  // zlib's UPDATE_HASH: with HASH_SHIFT*MIN_MATCH == HASH_BITS the rolled
  // value equals hash3(base+pos) exactly (the old top byte shifts out of
  // the mask), so sequential scans pay one byte load instead of three
  inline uint32_t roll_h(uint32_t h, size_t pos) const {
    return ((h << HASH_SHIFT_N) ^ (uint32_t)base[pos + 2]) &
           (uint32_t)(HASH_SIZE_N - 1);
  }

  // rolling-hash dictionary pre-insertion shared by every mode
  inline void insert_dict() {
    if (dict_len < MIN_MATCH) return;
    uint32_t h = hash3(base);
    size_t last = dict_len - MIN_MATCH;  // inclusive
    for (size_t i = 0;; i++) {
      insert_h(i, h);
      if (i == last) break;
      h = roll_h(h, i + 1);
    }
  }

  // absolute previous-occurrence position for `pos` (0 when none/too far)
  inline long chain_prev(size_t pos) const {
    long d = prevd[pos & (WSIZE - 1)];
    return d ? (long)pos - d : 0;
  }

  // common-prefix length vs the zero-extended buffer (zlib's high_water
  // padding makes reads past the data end behave as zeros)
  inline int match_len_z(size_t pos, size_t cur, size_t total) const {
    if (pos + MAX_MATCH <= total)
      return match_len_fast(base + pos, base + cur, MAX_MATCH);
    uint8_t pa[MAX_MATCH], pb[MAX_MATCH];
    size_t na = std::min<size_t>(MAX_MATCH, total - cur);
    size_t nb = total - pos;
    std::memset(pa, 0, sizeof pa);
    std::memset(pb, 0, sizeof pb);
    std::memcpy(pa, base + cur, na);
    std::memcpy(pb, base + pos, nb);
    return match_len_fast(pb, pa, MAX_MATCH);
  }

  // zlib's longest_match, decision-for-decision (walk order, budget,
  // quartering, nice/lookahead clamps, strict limit). The hot path uses
  // zlib's anchored 4-byte pre-reject (tail pair + head pair), which can
  // only skip candidates that cannot beat best_len — outcome-neutral.
  int longest(size_t pos, size_t total, int cur, int prev_len, int& best_dist) {
    const LevelCfg& cfg = LEVELS[klevel];
    int lookahead = (int)(total - pos);
    int chain = cfg.chain;
    int best_len = prev_len;
    if (prev_len >= cfg.good) chain >>= 2;
    int nice = cfg.nice;
    if (nice > lookahead) nice = lookahead;
    long limit = (long)pos - MAX_DIST_N;
    if (limit < 0) limit = 0;
    best_dist = 0;
    if (pos + MAX_MATCH <= total) {
      const uint8_t* here = base + pos;
      uint16_t scan_end = load16(here + best_len - 1);
      uint16_t scan_start = load16(here);
      // Prefetching the next chain slot hides the serial L2-latency walk at
      // short/medium budgets; at level 9's 4096-deep walks the chain slots
      // are mostly cache-resident already and the extra uop traffic loses
      // (measured), so gate on the budget.
      if (cfg.chain <= 1024) {
        for (;;) {
          const uint8_t* cand = base + cur;
          long next_cur = (long)cur - prevd[cur & (WSIZE - 1)];
          __builtin_prefetch(&prevd[next_cur & (WSIZE - 1)]);
          if (load16(cand + best_len - 1) == scan_end &&
              load16(cand) == scan_start) {
            int ml = match_len_fast(here, cand, MAX_MATCH);
            if (ml > best_len) {
              best_len = ml;
              best_dist = (int)((long)pos - cur);
              if (ml >= nice) break;
              scan_end = load16(here + best_len - 1);
            }
          }
          if (next_cur >= cur) break;  // empty link (delta 0)
          cur = next_cur;
          if (cur <= limit) break;
          if (--chain == 0) break;
        }
      } else {
        for (;;) {
          const uint8_t* cand = base + cur;
          long next_cur = (long)cur - prevd[cur & (WSIZE - 1)];
          if (load16(cand + best_len - 1) == scan_end &&
              load16(cand) == scan_start) {
            int ml = match_len_fast(here, cand, MAX_MATCH);
            if (ml > best_len) {
              best_len = ml;
              best_dist = (int)((long)pos - cur);
              if (ml >= nice) break;
              scan_end = load16(here + best_len - 1);
            }
          }
          if (next_cur >= cur) break;  // empty link (delta 0)
          cur = next_cur;
          if (cur <= limit) break;
          if (--chain == 0) break;
        }
      }
    } else {
      for (;;) {
        int ml = match_len_z(pos, (size_t)cur, total);
        if (ml > best_len) {
          best_len = ml;
          best_dist = (int)((long)pos - cur);
          if (ml >= nice) break;
        }
        long next_cur = chain_prev((size_t)cur);
        if (next_cur <= limit || next_cur >= cur) break;
        cur = (int)next_cur;
        if (--chain == 0) break;
      }
    }
    return best_len <= lookahead ? best_len : lookahead;
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
      bw.byte(take & 0xff); bw.byte((take >> 8) & 0xff);
      bw.byte(~take & 0xff); bw.byte((~take >> 8) & 0xff);
      bw.bytes(p + i, take);
      i += take;
    } while (i < len);
  }

  void emit_symbols(const uint16_t* llc, const uint8_t* lll,
                    const uint16_t* dc, const uint8_t* dl) {
    // per-block fused length table: code + extra bits in one value so each
    // match costs exactly one put64 (the reference's encode_len/encode_dist
    // fusion idea, deflate.rs:915-938)
    uint32_t ltab[256];
    uint8_t ltn[256];
    for (int v = 0; v < 256; v++) {
      int lc = RFC.len_code[v];
      int sym = 257 + lc;
      ltab[v] = (uint32_t)llc[sym] |
                ((uint32_t)(v + 3 - RFC.len_base[lc]) << lll[sym]);
      ltn[v] = (uint8_t)(lll[sym] + RFC.len_extra[lc]);
    }
    const Sym* s = syms.data();
    const Sym* e = s + ns;
    for (; s != e; ++s) {
      if (s->dist == 0) {
        bw.put64(llc[s->lenlit], lll[s->lenlit]);
      } else {
        int v = s->lenlit - 3;
        int c = dist_to_code(s->dist);
        uint64_t dfused = (uint64_t)dc[c] |
                          ((uint64_t)(s->dist - RFC.dist_base[c]) << dl[c]);
        int dn = dl[c] + RFC.dist_extra[c];
        bw.put64((uint64_t)ltab[v] | (dfused << ltn[v]), ltn[v] + dn);
      }
    }
    bw.put64(llc[256], lll[256]);  // EOB
  }

  // zlib's _tr_flush_block: exact trees, whole-byte cost rule
  void flush_block(bool last, size_t block_end) {
    size_t stored_len = block_end - block_start;
    uint64_t opt_lenb, static_lenb;
    uint8_t lll[L_CODES_N], dl[D_CODES_N], bll[BL_CODES_N];
    uint16_t llc[L_CODES_N], dc[D_CODES_N], blc[BL_CODES_N];
    int l_max = 0, d_max = 0, max_blindex = 0;

    if (level > 0) {
      uint32_t llf[L_CODES_N] = {0}, df[D_CODES_N] = {0};
      llf[256] = 1;
      for (size_t i = 0; i < ns; i++) {
        const Sym& s = syms[i];
        if (s.dist == 0) llf[s.lenlit]++;
        else { llf[257 + RFC.len_code[s.lenlit - 3]]++; df[dist_to_code(s.dist)]++; }
      }
      static const int* lextra = RFC.len_extra;
      TreeBuild tb;
      l_max = tb.build(llf, L_CODES_N, STATIC_TREES.lll, lextra, 257, 15, lll, llc);
      d_max = tb.build(df, D_CODES_N, STATIC_TREES.dl, RFC.dist_extra, 0, 15, dl, dc);
      uint32_t blf[BL_CODES_N] = {0};
      scan_tree_n(lll, l_max, blf);
      scan_tree_n(dl, d_max, blf);
      tb.build(blf, BL_CODES_N, nullptr, EXTRA_BL_N, 0, 7, bll, blc);
      max_blindex = BL_CODES_N - 1;
      while (max_blindex >= 3 && bll[BL_ORDER_N[max_blindex]] == 0) max_blindex--;
      tb.opt_len += 3ull * (max_blindex + 1) + 5 + 5 + 4;
      opt_lenb = (tb.opt_len + 3 + 7) >> 3;
      static_lenb = (tb.static_len + 3 + 7) >> 3;
      if (static_lenb <= opt_lenb) opt_lenb = static_lenb;
    } else {
      opt_lenb = static_lenb = stored_len + 5;
    }

    if (stored_len + 4 <= opt_lenb) {
      emit_stored(base + block_start, stored_len, last);
    } else if (static_lenb == opt_lenb) {
      bw.put((1 << 1) + (last ? 1 : 0), 3);
      emit_symbols(STATIC_TREES.llc, STATIC_TREES.lll, STATIC_TREES.dc,
                   STATIC_TREES.dl);
    } else {
      bw.put((2 << 1) + (last ? 1 : 0), 3);
      bw.put(l_max + 1 - 257, 5);
      bw.put(d_max + 1 - 1, 5);
      bw.put(max_blindex + 1 - 4, 4);
      for (int i = 0; i <= max_blindex; i++) bw.put(bll[BL_ORDER_N[i]], 3);
      send_tree_n(bw, lll, l_max, bll, blc);
      send_tree_n(bw, dl, d_max, bll, blc);
      emit_symbols(llc, lll, dc, dl);
    }
    ns = 0;
    block_start = block_end;
  }

  void start_scan() {
    if (started) return;
    started = true;
    spos = dict_len;
    // dictionary pre-insertion (positions 0..dict_len-3; position 0 stays
    // NIL-invisible because head/prev value 0 reads as empty)
    insert_dict();
  }

  // greedy loop, levels 1-3 (zlib deflate_fast). Processes positions
  // < `limit` with clamps against `total` (streaming NO_FLUSH passes
  // limit = total - MIN_LOOKAHEAD + 1 so decisions never depend on how
  // much input has arrived; flush passes limit = total).
  void run_fast(size_t limit, size_t total) {
    const LevelCfg& cfg = LEVELS[klevel];
    start_scan();
    while (spos < limit) {
      int hash_head = 0;
      if (spos + MIN_MATCH <= total) {
        if (!shv) { sh = hash3(base + spos); shv = true; }
        insert_h(spos, sh);
        hash_head = (int)chain_prev(spos);
      }
      int ml = 0, mdist = 0;
      if (hash_head > 0 && (long)spos - hash_head <= MAX_DIST_N)
        ml = longest(spos, total, hash_head, MIN_MATCH - 1, mdist);
      if (ml >= MIN_MATCH && mdist > 0) {
        syms[ns++] = {(uint16_t)mdist, (uint16_t)ml};
        size_t end = spos + (size_t)ml;
        if ((size_t)ml <= (size_t)cfg.lazy && total - end >= MIN_MATCH) {
          uint32_t h2 = sh;  // hash at spos; interiors roll from it
          for (size_t p2 = spos + 1; p2 < end; p2++) {
            h2 = roll_h(h2, p2);
            insert_h(p2, h2);
          }
        }
        // a match longer than max_insert_length skips insertion entirely
        spos = end;
        shv = false;
      } else {
        syms[ns++] = {0, base[spos]};
        spos++;
        if (shv) {
          if (spos + MIN_MATCH <= total) sh = roll_h(sh, spos);
          else shv = false;
        }
      }
      if (ns >= SYM_END_N) flush_block(false, spos);
    }
  }

  // lazy loop, levels 4-9 (zlib deflate_slow); same limit/total contract
  void run_slow(size_t limit, size_t total) {
    const LevelCfg& cfg = LEVELS[klevel];
    start_scan();
    while (spos < limit) {
      int hash_head = 0;
      if (spos + MIN_MATCH <= total) {
        if (!shv) { sh = hash3(base + spos); shv = true; }
        insert_h(spos, sh);
        hash_head = (int)chain_prev(spos);
      }
      prev_length = match_length;
      prev_start = match_start;
      match_length = MIN_MATCH - 1;
      if (hash_head > 0 && prev_length < cfg.lazy &&
          (long)spos - hash_head <= MAX_DIST_N) {
        int mdist = 0;
        int ml = longest(spos, total, hash_head, prev_length, mdist);
        match_length = ml;
        if (mdist > 0) match_start = spos - mdist;
        if (match_length <= 5 &&
            (match_length == MIN_MATCH && spos - match_start > TOO_FAR_N))
          match_length = MIN_MATCH - 1;
      }
      if (prev_length >= MIN_MATCH && match_length <= prev_length) {
        // deferred match at spos-1 wins; insert covered positions
        // spos+1 .. spos+prev_length-2 (the next current position is
        // inserted at its own scan step)
        syms[ns++] = {(uint16_t)(spos - 1 - prev_start), (uint16_t)prev_length};
        size_t end_ins = spos + (size_t)prev_length - 1;  // exclusive
        uint32_t h2 = sh;  // hash at spos (shv is true: a match implies one)
        for (size_t p2 = spos + 1; p2 < end_ins; p2++) {
          if (p2 + MIN_MATCH > total) break;
          h2 = roll_h(h2, p2);
          insert_h(p2, h2);
        }
        spos = spos + prev_length - 1;
        shv = false;
        match_available = false;
        match_length = MIN_MATCH - 1;
        if (ns >= SYM_END_N) flush_block(false, spos);
      } else if (match_available) {
        syms[ns++] = {0, base[spos - 1]};
        if (ns >= SYM_END_N) flush_block(false, spos);
        spos++;
        if (shv) {
          if (spos + MIN_MATCH <= total) sh = roll_h(sh, spos);
          else shv = false;
        }
      } else {
        match_available = true;
        spos++;
        if (shv) {
          if (spos + MIN_MATCH <= total) sh = roll_h(sh, spos);
          else shv = false;
        }
      }
    }
  }

  // zlib's deflate_slow end-of-stream step: the deferred literal at the
  // last position is emitted only when a flush/finish drains the scan
  void emit_trailing_literal(size_t total) {
    if (match_available) {
      syms[ns++] = {0, base[total - 1]};
      match_available = false;
    }
  }

  // -- MEDIUM mode (levels 11-13): zlib-ng's deflate_medium algorithm
  // class, re-implemented on this engine's hash/match machinery —
  // current + one-lookahead match with insert caps and overlap trimming
  // (reference decisions: medium.rs:12-331; Match :182, insert_match
  // :211, fizzle_matches :264). WANT_MIN(4) replaces MIN_MATCH(3) as the
  // emit threshold. NOT byte-parity with zlib or zlib-ng (different hash
  // family); the bit-exact levels 1-9 remain the oracle anchor.
  static constexpr int WANT_MIN = 4;

  struct MedMatch {
    size_t start;     // match source position
    size_t strstart;  // match destination position
    size_t orgstart;  // original destination (insert bookkeeping)
    int length;
  };

  inline uint32_t hash4(const uint8_t* p) const {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return (v * 2654435761u) >> 16;  // Knuth multiplicative, 16-bit index
  }

  inline void insert4(size_t pos) {
    uint32_t h = hash4(base + pos);
    long dlt = (long)pos - head4[h];
    prevd4[pos & (WSIZE - 1)] = (uint16_t)std::min<long>(dlt, 0xffff);
    head4[h] = (int32_t)pos;
  }

  inline long chain_prev4(size_t pos) const {
    long dlt = prevd4[pos & (WSIZE - 1)];
    return dlt ? (long)pos - dlt : 0;
  }

  inline void insert_range(size_t p, size_t count, size_t total) {
    for (size_t i = 0; i < count && p + i + 4 <= total; i++)
      insert4(p + i);
  }

  // medium's chain walk over the 4-byte-hash tables; returns the best
  // length >= WANT_MIN (0 when none), best_dist set accordingly. Same
  // budget/nice/anchored-reject decisions as longest() (the reference
  // shares longest_match between slow and medium; longest_match.rs:38-80).
  int longest4(size_t pos, size_t total, int cur, int& best_dist) {
    const LevelCfg& cfg = LEVELS[klevel];
    int lookahead = (int)(total - pos);
    int chain = cfg.chain;
    int best_len = WANT_MIN - 1;
    int nice = cfg.nice;
    if (nice > lookahead) nice = lookahead;
    long limit = (long)pos - MAX_DIST_N;
    if (limit < 0) limit = 0;
    best_dist = 0;
    if (pos + MAX_MATCH <= total) {
      const uint8_t* here = base + pos;
      uint16_t scan_end = load16(here + best_len - 1);
      uint16_t scan_start = load16(here);
      for (;;) {
        const uint8_t* cand = base + cur;
        long next_cur = (long)cur - prevd4[cur & (WSIZE - 1)];
        __builtin_prefetch(&prevd4[next_cur & (WSIZE - 1)]);
        if (load16(cand + best_len - 1) == scan_end &&
            load16(cand) == scan_start) {
          int ml = match_len_fast(here, cand, MAX_MATCH);
          if (ml > best_len) {
            best_len = ml;
            best_dist = (int)((long)pos - cur);
            if (ml >= nice) break;
            scan_end = load16(here + best_len - 1);
          }
        }
        if (next_cur >= cur) break;
        cur = (int)next_cur;
        if (cur <= limit) break;
        if (--chain == 0) break;
      }
    } else {
      for (;;) {
        int ml = match_len_z(pos, (size_t)cur, total);
        if (ml > best_len) {
          best_len = ml;
          best_dist = (int)((long)pos - cur);
          if (ml >= nice) break;
        }
        long next_cur = chain_prev4((size_t)cur);
        if (next_cur <= limit || next_cur >= cur) break;
        cur = (int)next_cur;
        if (--chain == 0) break;
      }
    }
    if (!best_dist) return 0;
    return best_len <= lookahead ? best_len : lookahead;
  }

  void med_insert_match(MedMatch m, size_t total) {
    const LevelCfg& cfg = LEVELS[klevel];
    if (total - m.strstart <= (size_t)m.length + (size_t)WANT_MIN) return;
    if (m.length < WANT_MIN) {  // literal run: hash the covered tail
      m.strstart += 1;
      m.length -= 1;
      if (m.length > 0 && m.strstart >= m.orgstart) {
        size_t cnt = m.strstart + (size_t)m.length > m.orgstart
                         ? (size_t)m.length
                         : m.orgstart - m.strstart + 1;
        insert_range(m.strstart, cnt, total);
      }
      return;
    }
    // insert interiors only when the match is not huge (medium.rs:224)
    if ((size_t)m.length <= 16u * (size_t)cfg.lazy &&
        total - m.strstart >= (size_t)WANT_MIN) {
      m.length -= 1;  // string at strstart already in table
      m.strstart += 1;
      if (m.strstart >= m.orgstart) {
        size_t cnt = m.strstart + (size_t)m.length > m.orgstart
                         ? (size_t)m.length
                         : m.orgstart - m.strstart + 1;
        insert_range(m.strstart, cnt, total);
      } else if (m.orgstart < m.strstart + (size_t)m.length) {
        insert_range(m.orgstart, m.strstart + (size_t)m.length - m.orgstart,
                     total);
      }
    } else {  // jump: only hash the position just before the landing spot
      m.strstart += (size_t)m.length;
      m.length = 0;
      if (m.strstart >= 1 && m.strstart - 1 + 4 <= total)
        insert4(m.strstart - 1);
    }
  }

  void med_fizzle(MedMatch& cur, MedMatch& nm) {
    // try to extend the next match backwards, shrinking the current one
    if (cur.length <= 1) return;
    if ((size_t)cur.length > 1 + nm.start) return;
    if ((size_t)cur.length > 1 + nm.strstart) return;
    if (base[nm.start - cur.length + 1] != base[nm.strstart - cur.length + 1])
      return;
    size_t limit = nm.strstart > (size_t)MAX_DIST_N
                       ? nm.strstart - (size_t)MAX_DIST_N : 0;
    MedMatch c = cur, n = nm;
    size_t mi = n.start, oi = n.strstart;
    int changed = 0;
    while (mi >= 1 && oi >= 1 && base[mi - 1] == base[oi - 1]) {
      if (c.length < 1) break;
      if (n.strstart <= limit) break;
      if (n.length >= 256) break;
      if (n.start <= 1) break;
      n.strstart--;
      n.start--;
      n.length++;
      c.length--;
      mi--;
      oi--;
      changed++;
    }
    if (!changed) return;
    if (c.length <= 1 && n.length != 2) {
      n.orgstart += 1;
      cur = c;
      nm = n;
    }
  }

  void run_medium(size_t limit, size_t total) {
    const bool early_exit = klevel < 5;
    if (head4.empty()) {
      head4.assign(1 << 16, 0);
      prevd4.assign(WSIZE, 0);
    }
    if (!started) {
      started = true;
      spos = dict_len;
      if (dict_len >= 4)  // medium's dictionary priming uses its own hash
        for (size_t i = 0; i + 4 <= dict_len; i++) insert4(i);
    }
    while (spos < limit) {
      MedMatch cur;
      if (!early_exit && med_next_len > 0) {
        cur = {med_next_start, med_next_strstart, med_next_orgstart,
               med_next_len};
        med_next_len = 0;
      } else {
        long hash_head = 0;
        if (spos + 4 <= total) {
          insert4(spos);
          hash_head = chain_prev4(spos);
        }
        cur = {0, spos, spos, 1};
        if (hash_head > 0 && (long)spos - hash_head <= MAX_DIST_N) {
          int mdist = 0;
          int ml = longest4(spos, total, (int)hash_head, mdist);
          if (mdist > 0 && ml >= WANT_MIN) {
            cur.start = spos - (size_t)mdist;
            cur.length = ml;
          }
          if (cur.start >= cur.strstart) cur.length = 1;
        }
      }
      med_insert_match(cur, total);

      // look one match ahead (medium.rs:115) and trim overlap
      if (!early_exit && total - cur.strstart > (size_t)MIN_LOOKAHEAD) {
        size_t nxt = cur.strstart + (size_t)cur.length;
        long hh = 0;
        if (nxt + 4 <= total) {
          insert4(nxt);
          hh = chain_prev4(nxt);
        }
        MedMatch nm{0, nxt, nxt, 1};
        if (hh > 0 && (long)nxt - hh <= MAX_DIST_N) {
          int mdist = 0;
          int ml = longest4(nxt, total, (int)hh, mdist);
          if (mdist > 0 && ml >= WANT_MIN) {
            nm.start = nxt - (size_t)mdist;
            nm.length = ml;
          }
          if (nm.start >= nm.strstart) nm.length = 1;
          if (nm.length >= WANT_MIN) med_fizzle(cur, nm);
        }
        med_next_start = nm.start;
        med_next_strstart = nm.strstart;
        med_next_orgstart = nm.orgstart;
        med_next_len = nm.length;
      } else {
        med_next_len = 0;
      }

      // emit the current match (medium.rs emit_match)
      if (cur.length < WANT_MIN) {
        for (int i = 0; i < cur.length; i++)
          syms[ns++] = {0, base[cur.strstart + (size_t)i]};
      } else {
        syms[ns++] = {(uint16_t)(cur.strstart - cur.start),
                      (uint16_t)cur.length};
      }
      spos = cur.strstart + (size_t)cur.length;
      if (ns >= SYM_END_N - 4) flush_block(false, spos);
    }
  }

  // QUICK fast mode (the zlib-ng deflate_quick architecture,
  // quick.rs:12-158 behavior class, implemented our way): one STATIC
  // block, a single hash probe per position, no lazy deferral, no symbol
  // buffer — every token is emitted inside the scan loop through fused
  // static-tree tables, and match interiors are never inserted. Trades a
  // little ratio for ~2x+ speed over the bit-exact level-1 engine; NOT
  // oracle-identical output (opt-in via level == QUICK_LEVEL).
  // dynamic block header from given freqs (trees built zlib-style);
  // fills the caller's code tables
  void quick_dyn_header(const uint32_t* llf, const uint32_t* df,
                        uint8_t* lll, uint16_t* llc, uint8_t* dl,
                        uint16_t* dc, bool bfinal) {
    uint8_t bll[BL_CODES_N];
    uint16_t blc[BL_CODES_N];
    TreeBuild tb;
    int l_max = tb.build(llf, L_CODES_N, STATIC_TREES.lll, RFC.len_extra,
                         257, 15, lll, llc);
    int d_max = tb.build(df, D_CODES_N, STATIC_TREES.dl, RFC.dist_extra, 0,
                         15, dl, dc);
    uint32_t blf[BL_CODES_N] = {0};
    scan_tree_n(lll, l_max, blf);
    scan_tree_n(dl, d_max, blf);
    tb.build(blf, BL_CODES_N, nullptr, EXTRA_BL_N, 0, 7, bll, blc);
    int max_blindex = BL_CODES_N - 1;
    while (max_blindex >= 3 && bll[BL_ORDER_N[max_blindex]] == 0)
      max_blindex--;
    bw.put((2u << 1) + (bfinal ? 1 : 0), 3);
    bw.put(l_max + 1 - 257, 5);
    bw.put(d_max + 1 - 1, 5);
    bw.put(max_blindex + 1 - 4, 4);
    for (int i = 0; i <= max_blindex; i++) bw.put(bll[BL_ORDER_N[i]], 3);
    send_tree_n(bw, lll, l_max, bll, blc);
    send_tree_n(bw, dl, d_max, bll, blc);
  }

  void run_quick(size_t total, bool last) {
    // QUICK (r5, ADAPTIVE): single 4-byte-hash probe per position, no
    // lazy deferral, emission fused into the scan — but each 32 KiB
    // segment is its own block whose Huffman trees come from the
    // PREVIOUS segment's symbol histogram (+1 smoothing on every symbol
    // so anything stays codable): near-dynamic entropy coding at
    // one-pass speed. Segment 0 uses the static tables (nothing to adapt
    // from), and any segment whose emission EXPANDED past its stored
    // cost is rewound and re-emitted stored (zlib's whole-byte escape).
    // r4's single static block measured 1.183x zlib-1 on the bench
    // corpus, 13.8 points of which were pure static-tree entropy loss
    // (measured: zlib-1's own parse under forced static trees is
    // 1.138x); the reference quick class (quick.rs:12-158) accepts that
    // loss — this trades ~6% scan speed to recover it.
    if (head4.empty()) {
      head4.assign(1 << 16, 0);
      prevd4.assign(WSIZE, 0);
    }
    if (dict_len >= 4)
      for (size_t i = 0; i + 4 <= dict_len; i++) insert4(i);
    constexpr size_t QSEG = 49152;
    size_t pos = dict_len;
    if (pos >= total) {  // empty input: one empty static block
      bw.put((1u << 1) + (last ? 1 : 0), 3);
      bw.put64(STATIC_TREES.llc[256], STATIC_TREES.lll[256]);
      return;
    }
    uint32_t llf_prev[L_CODES_N], df_prev[D_CODES_N];
    bool have_prev = false;
    bool final_emitted = false;
    while (pos < total) {
      size_t seg_start = pos;
      size_t seg_end = std::min(pos + QSEG, total);
      bool seg_last_possible = last && seg_end == total;
      uint64_t sb = bw.buf;
      int sc = bw.cnt;
      size_t sw = bw.wpos;
      uint8_t lll_a[L_CODES_N], dl_a[D_CODES_N];
      uint16_t llc_a[L_CODES_N], dc_a[D_CODES_N];
      const uint16_t *llc_c, *dc_c;
      const uint8_t *lll_c, *dl_c;
      if (have_prev) {
        uint32_t llf_s[L_CODES_N], df_s[D_CODES_N];
        for (int i = 0; i < L_CODES_N; i++) llf_s[i] = llf_prev[i] + 1;
        for (int i = 0; i < D_CODES_N; i++) df_s[i] = df_prev[i] + 1;
        quick_dyn_header(llf_s, df_s, lll_a, llc_a, dl_a, dc_a,
                         seg_last_possible);
        llc_c = llc_a; lll_c = lll_a; dc_c = dc_a; dl_c = dl_a;
      } else {
        bw.put((1u << 1) + (seg_last_possible ? 1 : 0), 3);
        llc_c = STATIC_TREES.llc; lll_c = STATIC_TREES.lll;
        dc_c = STATIC_TREES.dc; dl_c = STATIC_TREES.dl;
      }
      // per-segment fused length table (emit_symbols' fusion idea)
      uint32_t ltab[256];
      uint8_t ltn[256];
      for (int v = 0; v < 256; v++) {
        int lc2 = RFC.len_code[v];
        int sym = 257 + lc2;
        ltab[v] = (uint32_t)llc_c[sym] |
                  ((uint32_t)(v + 3 - RFC.len_base[lc2]) << lll_c[sym]);
        ltn[v] = (uint8_t)(lll_c[sym] + RFC.len_extra[lc2]);
      }
      uint32_t llf_cur[L_CODES_N] = {0};
      uint32_t df_cur[D_CODES_N] = {0};
      while (pos < seg_end) {
        if (pos + 4 <= total) {
          insert4(pos);
          long cand = chain_prev4(pos);
          if (cand > 0 && (long)pos - cand <= MAX_DIST_N) {
            int ml = (pos + MAX_MATCH <= total)
                         ? match_len_fast(base + pos, base + cand, MAX_MATCH)
                         : match_len_z((size_t)cand, pos, total);
            if (ml > (int)(total - pos)) ml = (int)(total - pos);
            if (ml >= 4) {  // static-tree cost rule (reference quick WANT_MIN)
              int dist = (int)((long)pos - cand);
              int dcode = dist_to_code(dist);
              uint64_t dfused =
                  (uint64_t)dc_c[dcode] |
                  ((uint64_t)(dist - RFC.dist_base[dcode]) << dl_c[dcode]);
              int dn = dl_c[dcode] + RFC.dist_extra[dcode];
              int v = ml - 3;
              bw.put64((uint64_t)ltab[v] | (dfused << ltn[v]), ltn[v] + dn);
              llf_cur[257 + RFC.len_code[v]]++;
              df_cur[dcode]++;
              pos += (size_t)ml;
              continue;
            }
          }
        }
        uint8_t c = base[pos];
        bw.put64(llc_c[c], lll_c[c]);
        llf_cur[c]++;
        pos++;
      }
      bw.put64(llc_c[256], lll_c[256]);  // EOB
      llf_cur[256]++;
      // whole-byte cost rule: rewind to stored when the block expanded
      size_t seg_bytes = pos - seg_start;  // a match may overshoot seg_end
      size_t bits_used =
          (bw.wpos * 8 + (size_t)bw.cnt) - (sw * 8 + (size_t)sc);
      size_t nstored = (seg_bytes + 65534) / 65535;
      size_t stored_bits = 7 + nstored * 40 + seg_bytes * 8;
      bool is_seg_last = last && pos >= total;
      if (bits_used <= stored_bits) {
        final_emitted |= seg_last_possible;
      } else {
        bw.buf = sb;
        bw.cnt = sc;
        bw.wpos = sw;
        size_t p = seg_start;
        while (p < pos) {
          size_t take = std::min(pos - p, (size_t)65535);
          bool lb = is_seg_last && p + take == pos;
          bw.put(lb ? 1u : 0u, 3);  // BFINAL, BTYPE=00
          bw.align();
          bw.byte((uint8_t)(take & 0xFF));
          bw.byte((uint8_t)(take >> 8));
          bw.byte((uint8_t)(~take & 0xFF));
          bw.byte((uint8_t)((~take >> 8) & 0xFF));
          bw.bytes(base + p, take);
          p += take;
          final_emitted |= lb;
        }
      }
      std::memcpy(llf_prev, llf_cur, sizeof(llf_prev));
      std::memcpy(df_prev, df_cur, sizeof(df_prev));
      have_prev = true;
    }
    if (last && !final_emitted) {
      // a match overshot its segment end to the end of input after the
      // block header had already committed BFINAL=0: close the stream
      // with an empty final static block
      bw.put((1u << 1) + 1u, 3);
      bw.put64(STATIC_TREES.llc[256], STATIC_TREES.lll[256]);
    }
  }
  void run(bool final_flag) {
    size_t total = dict_len + n;

    if (level == QUICK_LEVEL) {
      run_quick(total, final_flag);
      if (!final_flag) {
        // sync seam: byte-align with an empty stored block
        bw.put(0, 1); bw.put(0, 2); bw.align();
        bw.byte(0x00); bw.byte(0x00); bw.byte(0xff); bw.byte(0xff);
      } else {
        bw.align();
      }
      bw.finish();
      return;
    }

    if (level == 0) {
      // ample-output stored schedule: 64K-1 blocks, last flag on remainder
      if (final_flag) {
        size_t pos = dict_len;
        for (;;) {
          size_t take = std::min<size_t>(total - pos, 65535);
          bool lastb = take == total - pos;
          emit_stored(base + pos, take, lastb);
          pos += take;
          if (lastb) break;
        }
      } else {
        emit_stored(base + dict_len, n, false);
        bw.align();
      }
      block_start = total;
      if (!final_flag) {
        bw.put(0, 1); bw.put(0, 2); bw.align();
        bw.byte(0x00); bw.byte(0x00); bw.byte(0xff); bw.byte(0xff);
      }
      bw.finish();
      return;
    }

    if (level >= MEDIUM_BASE && level <= MEDIUM_BASE + 2) run_medium(total, total);
    else if (LEVELS[level].slow) { run_slow(total, total); emit_trailing_literal(total); }
    else run_fast(total, total);

    if (final_flag) {
      flush_block(true, total);
      bw.align();
    } else {
      if (ns != 0 || block_start < total) flush_block(false, total);
      // sync seam: byte-align with an empty stored block
      bw.put(0, 1); bw.put(0, 2); bw.align();
      bw.byte(0x00); bw.byte(0x00); bw.byte(0xff); bw.byte(0xff);
    }
    bw.finish();
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

// C++11 magic statics: thread-safe one-time build of fixed tables.
// The fixed dist tree is built over all 32 symbols (30/31 decode to
// invalid) because the RFC's fixed code is deliberately complete
// only at 32 — with 30 lengths it would be rejected as incomplete.
const std::pair<InfTable, InfTable>& fixed_tables() {
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
  return fixed;
}

// Parse a dynamic block's HLIT/HDIST/HCLEN header + code-length RLE and
// build both decode tables. Returns 0 on success, -1 on data error, -3 on
// truncation. Shared by the raw decoder, the speculative decoder, and the
// split-point header validator.
int parse_dynamic_tables(BitReader& br, InfTable& lt, InfTable& dt) {
  static const int ORDER[19] = {16,17,18,0,8,7,9,6,10,5,11,4,12,3,13,2,14,1,15};
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
  if (build_table(0, lens, nlen, 10, lt)) return -1;
  if (build_table(1, lens + nlen, ndist, 9, dt)) return -1;
  return 0;
}

// Optional extensions to the raw-inflate loop: start mid-stream (skip_bits
// of the first byte already consumed, `hist` bytes of window history
// pre-filled in out[0..hist)), stop once `cap` output bytes exist
// (random-access extract), and/or record zran access points (absolute bit
// position + output offset) at block boundaries every `span` output bytes.
// This is the native engine's analogue of the seam primitives the reference
// exposes for random access (inflatePrime inflate.rs:2165, Z_BLOCK stops,
// inflateMark inflate.rs:2611) fused into the hot loop.
struct RegionOpts {
  size_t hist = 0;
  int skip_bits = 0;
  bool stop_at_cap = false;
  uint64_t span = 0;
  uint64_t* pts = nullptr;   // pairs: (out_offset, bit_position)
  size_t cap_pts = 0;
  size_t* npts = nullptr;
  // speculative-stitch support: stop before starting a block at/after this
  // bit position (0 = none); report where decoding stopped and whether the
  // BFINAL block completed
  uint64_t stop_bit = 0;
  uint64_t end_bit = 0;
  bool final_seen = false;
};

// returns out length, or -1 on data error, -2 on output overflow, -3 truncated.
// With allow_region_end, input ending cleanly at a block boundary is success
// (chunk bodies from the parallel seam format have no BFINAL).
long inflate_raw_impl(const uint8_t* in, size_t nin, uint8_t* out, size_t cap,
                      size_t* in_used, bool allow_region_end = false,
                      RegionOpts* ro = nullptr) {
  BitReader br(in, nin);
  size_t op = ro ? ro->hist : 0;
  const bool stop_cap = ro && ro->stop_at_cap;
  uint64_t last_pt = op;
  if (ro && ro->npts) *ro->npts = 0;
  if (ro && ro->skip_bits) {
    if (!br.need(8)) return -3;
    br.drop(ro->skip_bits);
  }
  static const int ORDER[19] = {16,17,18,0,8,7,9,6,10,5,11,4,12,3,13,2,14,1,15};
  bool first_block = true;
  for (;;) {
    if (ro && (ro->pts || ro->stop_bit)) {
      uint64_t bitpos = (uint64_t)(br.p - in) * 8 - br.cnt;
      if (ro->stop_bit && !first_block && bitpos >= ro->stop_bit) {
        ro->end_bit = bitpos;
        if (in_used) *in_used = br.consumed(in);
        return (long)op;
      }
      if (ro->pts && op > ro->hist && op - last_pt >= ro->span &&
          *ro->npts < ro->cap_pts) {
        ro->pts[2 * *ro->npts] = op;
        ro->pts[2 * *ro->npts + 1] = bitpos;
        (*ro->npts)++;
        last_pt = op;
      }
    }
    first_block = false;
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
      if (op + len > cap) {
        if (!stop_cap) return -2;
        len = (unsigned)(cap - op);
      }
      // bytes still in the bit buffer come first
      while (len && br.cnt >= 8) { out[op++] = (uint8_t)br.peek(8); br.drop(8); len--; }
      if (len) {
        if ((size_t)(br.end - br.p) < len) return -3;
        std::memcpy(out + op, br.p, len);
        br.p += len; op += len;
        br.clear_stale();  // p jumped: bits above cnt no longer match *p
      }
      if (stop_cap && op >= cap) { if (in_used) *in_used = br.consumed(in); return (long)op; }
    } else if (type == 3) {
      return -1;
    } else {
      InfTable lt_dyn, dt_dyn;
      const InfTable *plt, *pdt;
      if (type == 1) {
        const auto& fixed = fixed_tables();
        plt = &fixed.first;
        pdt = &fixed.second;
      } else {
        int perr = parse_dynamic_tables(br, lt_dyn, dt_dyn);
        if (perr) return perr;
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
          if (op >= cap) { if (stop_cap) { if (in_used) *in_used = br.consumed(in); return (long)op; } return -2; }
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
        if (op + length > cap) {
          if (!stop_cap) return -2;
          length = (int)(cap - op);
          if (length <= 0) { if (in_used) *in_used = br.consumed(in); return (long)op; }
        }
        // overlap-safe back copy
        const uint8_t* src = out + op - dist;
        if (dist >= 8 && length <= dist) {
          std::memcpy(out + op, src, length);
          op += length;
        } else {
          for (int i = 0; i < length; i++) out[op + i] = src[i];
          op += length;
        }
        if (stop_cap && op >= cap) { if (in_used) *in_used = br.consumed(in); return (long)op; }
      }
    }
    if (final_f) break;
  }
  if (ro) {
    ro->final_seen = true;
    ro->end_bit = (uint64_t)(br.p - in) * 8 - br.cnt;
  }
  if (in_used) *in_used = br.consumed(in);
  return (long)op;
}

// ---------------------------------------------------------------------------
// speculative parallel inflate (rapidgzip-style two-pass; SURVEY §7 step 7,
// PAPERS.md "rapidgzip"). Phase 1 scans each input split for a plausible
// deflate block header and decodes speculatively into 16-bit cells, where a
// cell >= 256 is a reference into the then-unknown 32 KiB window. Phase 2
// stitches sequentially: markers resolve against the real window once the
// previous segment's bytes exist, and any join mismatch re-decodes that span
// with the exact byte decoder — speculation is opportunistic, never
// load-bearing for correctness (the container checksum remains the final
// oracle above this layer).
// ---------------------------------------------------------------------------

// Recycle segment byte buffers across calls: this VM (and axon guests in
// general) faults fresh anonymous pages at ~220us/page, so re-touching a
// recycled buffer is ~300x cheaper than first-touching a new one. The pool
// holds at most a few buffers (one per hardware thread in steady state).
std::mutex g_spec_pool_mu;
std::vector<std::vector<uint8_t>> g_spec_pool;

std::vector<uint8_t> spec_buf_acquire() {
  std::lock_guard<std::mutex> g(g_spec_pool_mu);
  if (g_spec_pool.empty()) return {};
  std::vector<uint8_t> b = std::move(g_spec_pool.back());
  g_spec_pool.pop_back();
  return b;
}

void spec_buf_release(std::vector<uint8_t>&& b) {
  if (b.capacity() < (1u << 20)) return;  // not worth keeping
  std::lock_guard<std::mutex> g(g_spec_pool_mu);
  if (g_spec_pool.size() < 64) g_spec_pool.emplace_back(std::move(b));
}

struct SpecSeg {
  // Decoded bytes, with window references into the (unknown) 32 KiB before
  // the segment recorded SPARSELY in `marks` as (index, back) — back = how
  // many bytes before the segment start the reference points. The byte at a
  // marked index is a placeholder. Sparse marks keep the hot decode loop on
  // plain memcpy and make the stitch a parallel memcpy + tiny fix-up pass
  // (the u16 cell-per-byte design spent over half its wall time narrowing
  // cells back to bytes).
  std::vector<uint8_t> bytes;
  std::vector<std::pair<uint32_t, uint16_t>> marks;  // sorted by index
  size_t n = 0;
  uint64_t start_bit = 0, end_bit = 0;
  bool final_seen = false;
  bool ok = false;

  // amortized growth with an explicit length so the hot loops work on raw
  // pointers (vector push_back per byte measured ~8x slower than the byte
  // decoder's memcpy paths)
  inline bool ensure(size_t extra, size_t cap) {
    if (n + extra > bytes.size()) {
      if (n + extra > cap) return false;
      bytes.resize(std::min(cap, std::max(bytes.size() * 2 + 65536, n + extra)));
    }
    return true;
  }
};

// Decode speculatively from start_bit, stopping at the first block boundary
// at/after stop_bit (or after the BFINAL block). Returns false on any decode
// inconsistency; *why = -2 when the cell cap was hit (not worth rescanning).
bool spec_decode(const uint8_t* in, size_t nin, uint64_t start_bit,
                 uint64_t stop_bit, size_t cap_cells, SpecSeg& seg, int* why) {
  *why = -1;
  seg.n = 0;
  seg.marks.clear();
  seg.start_bit = start_bit;
  seg.final_seen = false;
  const uint8_t* seg_base = in + start_bit / 8;
  uint64_t base_bits = (start_bit / 8) * 8;
  BitReader br(seg_base, nin - start_bit / 8);
  if (start_bit % 8) {
    if (!br.need(8)) return false;
    br.drop((int)(start_bit % 8));
  }
  bool first = true;
  for (;;) {
    uint64_t bitpos = base_bits + (uint64_t)(br.p - seg_base) * 8 - br.cnt;
    if (!first && bitpos >= stop_bit) { seg.end_bit = bitpos; return true; }
    first = false;
    if (!br.need(3)) return false;
    int final_f = br.peek(1); br.drop(1);
    int type = br.peek(2); br.drop(2);
    if (type == 3) return false;
    if (type == 0) {
      br.drop(br.cnt & 7);
      if (!br.need(32)) return false;
      unsigned len = br.peek(16); br.drop(16);
      unsigned nlen = br.peek(16); br.drop(16);
      if ((len ^ nlen) != 0xffff) return false;
      if (!seg.ensure(len, cap_cells)) { *why = -2; return false; }
      uint8_t* dst = seg.bytes.data() + seg.n;
      while (len && br.cnt >= 8) {
        *dst++ = (uint8_t)br.peek(8); br.drop(8); len--; seg.n++;
      }
      if (len) {
        if ((size_t)(br.end - br.p) < len) return false;
        std::memcpy(dst, br.p, len);
        seg.n += len;
        br.p += len;
        br.clear_stale();
      }
    } else {
      InfTable lt_dyn, dt_dyn;
      const InfTable *plt, *pdt;
      if (type == 1) {
        const auto& fixed = fixed_tables();
        plt = &fixed.first;
        pdt = &fixed.second;
      } else {
        if (parse_dynamic_tables(br, lt_dyn, dt_dyn)) return false;
        plt = &lt_dyn;
        pdt = &dt_dyn;
      }
      const InfTable& lt = *plt;
      const InfTable& dt = *pdt;
      for (;;) {
        if (!br.need(15)) { if (br.cnt == 0 && br.p >= br.end) return false; }
        uint32_t e = lt.t[br.peek(lt.root)];
        int kind = e >> 28, nb = (e >> 16) & 0x3f;
        if (kind == 3) {
          int off = e & 0xffff, sb = (e >> 22) & 0x3f;
          e = lt.t[off + ((br.peek(nb + sb)) >> nb)];
          kind = e >> 28;
          nb += (e >> 16) & 0x3f;
        }
        if (br.cnt < nb) { if (!br.need(nb)) return false; continue; }
        if (kind == 0) {
          if (!seg.ensure(1, cap_cells)) { *why = -2; return false; }
          br.drop(nb);
          seg.bytes[seg.n++] = (uint8_t)(e & 0xff);
          continue;
        }
        if (kind == 2) { br.drop(nb); break; }
        if (kind == 4) return false;
        int aux = (e >> 22) & 0x3f;
        if (!br.need(nb + aux)) return false;
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
        if (dkind == 4) return false;
        int daux = (de >> 22) & 0x3f;
        if (!br.need(dnb + daux)) return false;
        br.drop(dnb);
        size_t dist = (size_t)(de & 0xffff) + (daux ? br.peek(daux) : 0);
        if (daux) br.drop(daux);
        if (dist > seg.n + WSIZE) return false;
        if (!seg.ensure((size_t)length, cap_cells)) { *why = -2; return false; }
        size_t rem = (size_t)length;
        if (dist > seg.n) {
          // leading run referencing the unknown pre-segment window: emit
          // placeholders + sparse marks (back = dist - pos shrinks per byte)
          size_t nm = std::min(rem, dist - seg.n);
          for (size_t i = 0; i < nm; i++) {
            seg.bytes[seg.n] = 0;
            seg.marks.emplace_back((uint32_t)seg.n, (uint16_t)(dist - seg.n));
            seg.n++;
          }
          rem -= nm;
        }
        if (rem) {  // dist <= seg.n here
          uint8_t* dst = seg.bytes.data() + seg.n;
          const uint8_t* src = dst - dist;
          if (dist >= rem) std::memcpy(dst, src, rem);
          else
            for (size_t i = 0; i < rem; i++) dst[i] = src[i];
          // a copy whose source overlaps marked positions propagates those
          // marks (index shifts by +dist, back unchanged); scanning by index
          // also catches self-overlap (freshly appended marks re-propagate)
          size_t src0 = seg.n - dist;
          if (!seg.marks.empty() && seg.marks.back().first >= src0) {
            size_t lo = std::lower_bound(
                            seg.marks.begin(), seg.marks.end(), (uint32_t)src0,
                            [](const std::pair<uint32_t, uint16_t>& m,
                               uint32_t v) { return m.first < v; }) -
                        seg.marks.begin();
            for (size_t mi = lo;
                 mi < seg.marks.size() && seg.marks[mi].first < src0 + rem; mi++)
              seg.marks.emplace_back((uint32_t)(seg.marks[mi].first + dist),
                                     seg.marks[mi].second);
          }
          seg.n += rem;
        }
      }
    }
    if (final_f) {
      seg.final_seen = true;
      seg.end_bit = base_bits + (uint64_t)(br.p - seg_base) * 8 - br.cnt;
      return true;
    }
  }
}

// Structural plausibility of a block-header CHAIN at bit offset b. Dynamic
// headers validate fully (HCLEN/lens RLE/table build: ~2^-35 false rate);
// stored links chain-validate through their LEN/~NLEN; static blocks get a
// bounded fixed-table sanity decode. False positives are caught later by the
// decode + stitch join (and ultimately the container checksum).
bool validate_header_at(const uint8_t* in, size_t nin, uint64_t b, int depth) {
  if (b / 8 >= nin) return false;
  const uint8_t* base = in + b / 8;
  BitReader br(base, nin - b / 8);
  if (b % 8) {
    if (!br.need(8)) return false;
    br.drop((int)(b % 8));
  }
  int stored_links = 0;
  for (int d = 0; d < depth; d++) {
    if (!br.need(3)) return false;
    br.drop(1);  // BFINAL can be either
    int type = br.peek(2); br.drop(2);
    if (type == 3) return false;
    // A static block cannot ANCHOR a candidate: its 3-bit header plus a
    // fixed-table sanity decode still passes ~46% of random offsets, which
    // floods the scan with false anchors (measured). Statics validate only
    // as chained followers of a stored/dynamic anchor.
    if (type == 1 && d == 0) return false;
    if (type == 0) {
      br.drop(br.cnt & 7);
      if (!br.need(32)) return false;
      unsigned len = br.peek(16); br.drop(16);
      unsigned nlen = br.peek(16); br.drop(16);
      if ((len ^ nlen) != 0xffff || len == 0) return false;
      while (len && br.cnt >= 8) { br.drop(8); len--; }
      if (len) {
        if ((size_t)(br.end - br.p) < len) return false;
        br.p += len;
        br.clear_stale();
      }
      stored_links++;
      continue;  // validate the next link in the chain
    }
    if (type == 2) {
      InfTable lt, dt;
      return parse_dynamic_tables(br, lt, dt) == 0;
    }
    // static: sanity-decode up to 192 symbols with the fixed tables
    const auto& fixed = fixed_tables();
    const InfTable& lt = fixed.first;
    const InfTable& dt = fixed.second;
    int syms = 0;
    bool eob = false;
    while (syms < 192) {
      if (!br.need(15) && br.cnt == 0) return false;
      uint32_t e = lt.t[br.peek(lt.root)];
      int kind = e >> 28, nb = (e >> 16) & 0x3f;
      if (br.cnt < nb) { if (!br.need(nb)) return false; continue; }
      if (kind == 4) return false;
      if (kind == 2) { br.drop(nb); eob = true; break; }
      if (kind == 0) { br.drop(nb); syms++; continue; }
      int aux = (e >> 22) & 0x3f;
      if (!br.need(nb + aux)) return false;
      br.drop(nb + aux);
      if (!br.need(15)) { }
      uint32_t de = dt.t[br.peek(dt.root)];
      int dkind = de >> 28, dnb = (de >> 16) & 0x3f;
      if (dkind == 4) return false;
      int daux = (de >> 22) & 0x3f;
      if (!br.need(dnb + daux)) return false;
      br.drop(dnb + daux);
      syms++;
    }
    if (!eob) return syms >= 192;  // ran the full sample cleanly: plausible
    // EOB hit: chain to the next block header
  }
  return stored_links >= 2;  // long stored chain: ~2^-32 combined false rate
}

long find_candidate(const uint8_t* in, size_t nin, uint64_t from_bit,
                    uint64_t to_bit) {
  for (uint64_t b = from_bit; b < to_bit; b++)
    if (validate_header_at(in, nin, b, 6)) return (long)b;
  return -1;
}

// ---------------------------------------------------------------------------
// Resumable streaming inflate (VERDICT r4 item 5): a persistent state handle
// that accepts input at ARBITRARY byte boundaries and emits output
// incrementally at full native speed — the engine under the stream/gz hot
// loops (reference contract: the z_stream pump inflate.rs:2382; chunked
// matrix blogpost-uncompress.rs:6-57). Decodes the RAW deflate body; the
// Python layer owns container framing (zlib/gzip headers + trailers) and
// checksum verification, mirroring how the reference splits dispatch()
// header states from the inflate_fast hot loop.
//
// Resumability scheme: unconsumed input is stashed in `inbuf` (so the
// caller's buffer is always fully consumed); the decode loop SAVES the
// BitReader before every symbol and rolls back on bit starvation, pausing
// at the last complete symbol. No mid-symbol state ever persists — the
// persistent state is just (mode, tables, stored_left, last, bit_off).
// ---------------------------------------------------------------------------

// Resumable streaming deflate: wraps the bit-exact ChunkDeflater scan loops
// (which are themselves pause/resume-capable via the spos/sh/shv cursor)
// with a growing input buffer, window pruning with position rebase, and
// zlib's pump/flush contract (reference: deflate.rs:2470 deflate();
// NO_FLUSH processes only positions with >= MIN_LOOKAHEAD of lookahead —
// zlib's need_more rule — so output is byte-identical regardless of feed
// boundaries; SYNC/FULL/FINISH drain with tail clamping).
struct DefStream {
  std::vector<uint8_t> data;  // scan buffer (pruned prefix removed)
  std::vector<uint8_t> out;   // compressed output accumulator
  ChunkDeflater d;
  int level;
  bool finished = false;
  size_t served = 0;  // bytes of `out` handed to the caller
  // zlib's `insert` field: tail positions (<= 2) of a flush drain that
  // could not be hashed (lookahead < MIN_MATCH) and enter the hash chain
  // retroactively once more input arrives (fill_window, deflate.rs:1811-1827)
  size_t insert_pending = 0;

  explicit DefStream(int lvl)
      : d(nullptr, 0, nullptr, 0, lvl, out), level(lvl) {}

  void retro_insert() {
    size_t total = data.size();
    size_t lookahead = total - d.spos;
    if (insert_pending == 0 || lookahead + insert_pending < (size_t)MIN_MATCH)
      return;
    size_t str = d.spos - insert_pending;
    while (insert_pending) {
      d.insert(str);
      str++;
      insert_pending--;
      if (lookahead + insert_pending < (size_t)MIN_MATCH) break;
    }
  }

  void prune() {
    if (!d.started) return;
    // keep the match window (limit = spos - MAX_DIST_N > spos - WSIZE) and
    // the unflushed block bytes (stored emission reads base + block_start)
    size_t keep = d.spos > (size_t)WSIZE ? d.spos - WSIZE : 0;
    keep = std::min(keep, d.block_start);
    // prevd/prevd4 chain slots are keyed by pos & (WSIZE-1): the stored
    // DELTAS are rebase-free, but the slot a delta lives in is only
    // preserved when the rebase offset is a multiple of WSIZE (zlib's
    // slide is always exactly w_size for the same reason). An arbitrary
    // offset silently degrades match selection (r4 advisor: streaming
    // output diverged from zlib past ~1 MiB).
    keep &= ~((size_t)WSIZE - 1);
    if (keep < (1u << 20)) return;  // amortize the memmove
    data.erase(data.begin(), data.begin() + (long)keep);
    d.spos -= keep;
    d.block_start -= keep;
    d.match_start = d.match_start > keep ? d.match_start - keep : 0;
    d.prev_start = d.prev_start > keep ? d.prev_start - keep : 0;
    for (auto& hv : d.head)
      hv = hv > (int32_t)keep ? hv - (int32_t)keep : 0;  // slide_hash role
    for (auto& hv : d.head4)
      hv = hv > (int32_t)keep ? hv - (int32_t)keep : 0;
    d.med_next_start = d.med_next_start > keep ? d.med_next_start - keep : 0;
    d.med_next_strstart =
        d.med_next_strstart > keep ? d.med_next_strstart - keep : 0;
    d.med_next_orgstart =
        d.med_next_orgstart > keep ? d.med_next_orgstart - keep : 0;
    // prevd/prevd4 store deltas: rebase-free by construction
  }

  // flush: 0 none, 2 sync, 3 full, 4 finish (config.DeflateFlush values).
  // Returns committed output bytes available, or -2 on misuse.
  long pump(const uint8_t* in, size_t nin, int flush) {
    bool medium = level >= MEDIUM_BASE && level <= MEDIUM_BASE + 2;
    if (finished || (!medium && (level < 1 || level > 9))) return -2;
    if (nin) data.insert(data.end(), in, in + nin);
    d.base = data.data();
    d.start_scan();
    retro_insert();
    size_t total = data.size();
    bool flushing = flush != 0;
    size_t limit =
        flushing ? total
                 : (total >= (size_t)MIN_LOOKAHEAD
                        ? total - (size_t)(MIN_LOOKAHEAD - 1) : 0);
    if (medium) d.run_medium(limit, total);
    else if (LEVELS[level].slow) d.run_slow(limit, total);
    else d.run_fast(limit, total);
    if (flushing) {
      if (!medium && LEVELS[level].slow) d.emit_trailing_literal(total);
      // zlib records the <= 2 unhashed tail positions at every flush
      // drain (slow.rs:149 / fast.rs:98)
      insert_pending = std::min<size_t>(d.spos, MIN_MATCH - 1);
      if (flush == 4) {  // FINISH
        d.flush_block(true, total);
        d.bw.align();
        finished = true;
      } else {
        if (d.ns != 0 || d.block_start < total) d.flush_block(false, total);
        // sync seam: byte-align with an empty stored block
        d.bw.put(0, 1); d.bw.put(0, 2); d.bw.align();
        d.bw.byte(0x00); d.bw.byte(0x00); d.bw.byte(0xff); d.bw.byte(0xff);
        if (flush == 3) {
          // FULL_FLUSH: CLEAR_HASH + (lookahead == 0 at a drain) window
          // restart — matches stop at the seam (deflate.rs:513-520)
          std::fill(d.head.begin(), d.head.end(), 0);
          data.clear();
          d.spos = 0;
          d.block_start = 0;
          d.shv = false;
          insert_pending = 0;
        }
      }
    }
    prune();
    return (long)(d.bw.wpos - served);
  }

  long read(uint8_t* buf, size_t cap) {
    size_t take = std::min(d.bw.wpos - served, cap);
    if (take) std::memcpy(buf, out.data() + served, take);
    served += take;
    if (served > (1u << 20)) {
      out.erase(out.begin(), out.begin() + (long)served);
      d.bw.wpos -= served;
      served = 0;
    }
    return (long)take;
  }

  DefStream* clone() const {
    DefStream* c = new DefStream(level);
    c->data = data;
    c->out = out;
    c->served = served;
    c->finished = finished;
    c->insert_pending = insert_pending;
    ChunkDeflater& a = c->d;
    const ChunkDeflater& b = d;
    a.dict_len = b.dict_len;
    a.n = b.n;
    a.head = b.head;
    a.prevd = b.prevd;
    a.syms = b.syms;
    a.ns = b.ns;
    a.block_start = b.block_start;
    a.match_length = b.match_length;
    a.match_start = b.match_start;
    a.prev_length = b.prev_length;
    a.prev_start = b.prev_start;
    a.match_available = b.match_available;
    a.spos = b.spos;
    a.sh = b.sh;
    a.shv = b.shv;
    a.started = b.started;
    a.med_next_start = b.med_next_start;
    a.med_next_strstart = b.med_next_strstart;
    a.med_next_orgstart = b.med_next_orgstart;
    a.med_next_len = b.med_next_len;
    a.head4 = b.head4;
    a.prevd4 = b.prevd4;
    a.bw.buf = b.bw.buf;
    a.bw.cnt = b.bw.cnt;
    a.bw.wpos = b.bw.wpos;
    a.base = c->data.data();
    return c;
  }
};

struct InfStream {
  std::vector<uint8_t> inbuf;   // unconsumed input bytes
  int bit_off = 0;              // consumed bits of inbuf[0]
  std::vector<uint8_t> outbuf;  // decoded bytes; outbuf[0] == absolute `base`
  size_t base = 0;
  size_t olen = 0;              // valid bytes in outbuf
  size_t op = 0;                // absolute output cursor (dict included)
  size_t served = 0;            // absolute bytes handed to caller
  size_t dict_len = 0;
  uint64_t in_bits = 0;         // consumed input bits (excl. stashed tail)
  int mode = 0;                 // 0 header, 1 stored, 2 coded, 3 done, -1 err
  unsigned stored_left = 0;
  bool last = false;
  InfTable lt, dt;

  void set_dict(const uint8_t* d, size_t n) {
    size_t take = std::min<size_t>(n, WSIZE);
    outbuf.assign(d + (n - take), d + n);
    olen = take;
    op = served = dict_len = take;
    base = 0;
  }

  void ensure_out(size_t extra) {
    if (olen + extra > outbuf.size())
      outbuf.resize(std::max(outbuf.size() * 2 + 65536, olen + extra));
  }

  void compact() {
    // keep the 32 KiB window behind op and everything unserved
    size_t keep_from = std::min(served, op >= (size_t)WSIZE ? op - WSIZE : 0);
    if (keep_from > base + (1u << 20)) {  // amortize the memmove
      size_t drop = keep_from - base;
      std::memmove(outbuf.data(), outbuf.data() + drop, olen - drop);
      olen -= drop;
      base = keep_from;
    }
  }

  // decode as far as the stashed input allows; false on data error
  bool advance() {
    if (mode == 3) return true;
    if (mode == -1) return false;
    BitReader br(inbuf.data(), inbuf.size());
    const uint8_t* in0 = inbuf.data();
    if (bit_off) {
      if (!br.need(8)) return true;  // no byte to resume into
      br.drop(bit_off);
    }
    struct Sv { const uint8_t* p; uint64_t buf; int cnt; };
    auto save = [&br]() { return Sv{br.p, br.buf, br.cnt}; };
    auto restore = [&br](const Sv& s) { br.p = s.p; br.buf = s.buf; br.cnt = s.cnt; };

    for (;;) {
      if (mode == 0) {  // block header
        Sv sv = save();
        if (!br.need(3)) { restore(sv); break; }
        int fin = br.peek(1); br.drop(1);
        int type = br.peek(2); br.drop(2);
        if (type == 3) { mode = -1; break; }
        if (type == 0) {
          br.drop(br.cnt & 7);
          if (!br.need(32)) { restore(sv); break; }
          unsigned len = br.peek(16); br.drop(16);
          unsigned nlen = br.peek(16); br.drop(16);
          if ((len ^ nlen) != 0xffff) { mode = -1; break; }
          last = fin != 0;
          stored_left = len;
          mode = 1;
        } else if (type == 1) {
          const auto& f = fixed_tables();
          lt = f.first;
          dt = f.second;
          last = fin != 0;
          mode = 2;
        } else {
          InfTable l2, d2;
          int perr = parse_dynamic_tables(br, l2, d2);
          if (perr == -3) { restore(sv); break; }  // header incomplete: wait
          if (perr) { mode = -1; break; }
          lt = std::move(l2);
          dt = std::move(d2);
          last = fin != 0;
          mode = 2;
        }
      } else if (mode == 1) {  // stored
        while (stored_left && br.cnt >= 8) {
          ensure_out(1);
          outbuf[olen++] = (uint8_t)br.peek(8);
          br.drop(8);
          op++;
          stored_left--;
        }
        if (stored_left) {
          size_t take = std::min<size_t>((size_t)(br.end - br.p), stored_left);
          if (take) {
            ensure_out(take);
            std::memcpy(outbuf.data() + olen, br.p, take);
            olen += take;
            op += take;
            br.p += take;
            stored_left -= (unsigned)take;
            br.clear_stale();
          }
        }
        if (stored_left) break;  // need more input
        mode = last ? 3 : 0;
        if (mode == 3) break;
      } else {  // coded block body
        bool pause = false;
        for (;;) {
          Sv sv = save();
          if (!br.need(15)) { /* tail: decode with what's left */ }
          uint32_t e = lt.t[br.peek(lt.root)];
          int kind = e >> 28, nb = (e >> 16) & 0x3f;
          if (kind == 3) {
            int off = e & 0xffff, sb = (e >> 22) & 0x3f;
            if (br.cnt < nb + sb && !br.need(nb + sb)) { restore(sv); pause = true; break; }
            e = lt.t[off + (br.peek(nb + sb) >> nb)];
            kind = e >> 28;
            nb += (e >> 16) & 0x3f;
          }
          if (br.cnt < nb) { restore(sv); pause = true; break; }
          if (kind == 0) {
            br.drop(nb);
            ensure_out(1);
            outbuf[olen++] = (uint8_t)(e & 0xff);
            op++;
            continue;
          }
          if (kind == 2) { br.drop(nb); mode = last ? 3 : 0; break; }
          if (kind == 4) { mode = -1; break; }
          int aux = (e >> 22) & 0x3f;
          if (!br.need(nb + aux)) { restore(sv); pause = true; break; }
          br.drop(nb);
          int length = (int)(e & 0xffff) + (aux ? (int)br.peek(aux) : 0);
          if (aux) br.drop(aux);
          if (!br.need(15)) { }
          uint32_t de = dt.t[br.peek(dt.root)];
          int dkind = de >> 28, dnb = (de >> 16) & 0x3f;
          if (dkind == 3) {
            int off = de & 0xffff, sb = (de >> 22) & 0x3f;
            if (br.cnt < dnb + sb && !br.need(dnb + sb)) { restore(sv); pause = true; break; }
            de = dt.t[off + (br.peek(dnb + sb) >> dnb)];
            dkind = de >> 28;
            dnb += (de >> 16) & 0x3f;
          }
          if (dkind == 4) { mode = -1; break; }
          int daux = (de >> 22) & 0x3f;
          if (!br.need(dnb + daux)) { restore(sv); pause = true; break; }
          br.drop(dnb);
          int dist = (int)(de & 0xffff) + (daux ? (int)br.peek(daux) : 0);
          if (daux) br.drop(daux);
          if ((size_t)dist > op) { mode = -1; break; }
          ensure_out((size_t)length);
          uint8_t* dst = outbuf.data() + olen;
          const uint8_t* src = outbuf.data() + (op - (size_t)dist - base);
          if (dist >= 8 && (size_t)length <= (size_t)dist) {
            std::memcpy(dst, src, (size_t)length);
          } else {
            for (int i = 0; i < length; i++) dst[i] = src[i];
          }
          olen += (size_t)length;
          op += (size_t)length;
        }
        if (pause || mode == 3 || mode == -1) break;
      }
      if (mode == -1) break;
    }
    // commit consumed input: whole bytes leave inbuf, the sub-byte stays
    uint64_t used_bits = (uint64_t)(br.p - in0) * 8 - (uint64_t)br.cnt;
    in_bits += used_bits - (uint64_t)bit_off;
    size_t drop_bytes = (size_t)(used_bits >> 3);
    bit_off = (int)(used_bits & 7);
    if (drop_bytes)
      inbuf.erase(inbuf.begin(), inbuf.begin() + (long)drop_bytes);
    compact();
    return mode != -1;
  }

  long serve(uint8_t* out, size_t cap) {
    size_t take = std::min(op - served, cap);
    if (take) std::memcpy(out, outbuf.data() + (served - base), take);
    served += take;
    compact();
    return (long)take;
  }
};

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
  if (level > 9 && level != QUICK_LEVEL &&
      !(level >= MEDIUM_BASE && level <= MEDIUM_BASE + 2))
    level = 9;
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

// -- resumable streaming inflate handles ------------------------------------
// Contract: pump() takes input at any boundary (it is always fully absorbed
// into the handle) and writes up to `cap` output bytes. Flag bits:
//   1 = stream done (final block decoded AND all output served)
//   2 = data error
//   4 = more output pending beyond cap (call again with empty input)

void* zrs_istream_new(void) { return new InfStream(); }

void zrs_istream_free(void* s) { delete (InfStream*)s; }

void* zrs_istream_copy(void* s) { return new InfStream(*(InfStream*)s); }

void zrs_istream_set_dict(void* s, const uint8_t* d, size_t n) {
  ((InfStream*)s)->set_dict(d, n);
}

long zrs_istream_pump(void* sv, const uint8_t* in, size_t nin, uint8_t* out,
                      size_t cap, int* flags) {
  InfStream* s = (InfStream*)sv;
  if (nin) s->inbuf.insert(s->inbuf.end(), in, in + nin);
  bool ok = s->advance();
  long w = s->serve(out, cap);
  int f = 0;
  if (s->mode == 3 && s->served == s->op) f |= 1;
  if (!ok) f |= 2;
  if (s->op > s->served) f |= 4;
  if (flags) *flags = f;
  return w;
}

// after the final block: bytes of stashed input that belong to whatever
// follows the deflate body (trailer / next member). A partially-consumed
// byte counts as consumed (zlib rounds the final block up to a byte).
long zrs_istream_take_tail(void* sv, uint8_t* out, size_t cap) {
  InfStream* s = (InfStream*)sv;
  size_t skip = s->bit_off ? 1 : 0;
  if (s->inbuf.size() < skip) return 0;
  size_t n = std::min(s->inbuf.size() - skip, cap);
  if (n) std::memcpy(out, s->inbuf.data() + skip, n);
  s->inbuf.erase(s->inbuf.begin(), s->inbuf.begin() + (long)(skip + n));
  s->bit_off = 0;
  return (long)n;
}

unsigned long long zrs_istream_total_out(void* s) {
  return ((InfStream*)s)->op - ((InfStream*)s)->dict_len;
}

int zrs_istream_mode(void* s) { return ((InfStream*)s)->mode; }

// sync-point probe for the stream layer: at a block boundary on a byte edge
int zrs_istream_at_boundary(void* sv) {
  InfStream* s = (InfStream*)sv;
  return s->mode == 0 && s->bit_off == 0 && s->inbuf.empty();
}

// -- resumable streaming deflate handles ------------------------------------

void* zrs_dstream_new(int level) { return new DefStream(level); }

void zrs_dstream_free(void* s) { delete (DefStream*)s; }

void* zrs_dstream_copy(void* s) { return ((DefStream*)s)->clone(); }

// feed input under a flush mode (0 none / 2 sync / 3 full / 4 finish);
// returns committed output bytes now available via zrs_dstream_read
long zrs_dstream_pump(void* s, const uint8_t* in, size_t nin, int flush) {
  return ((DefStream*)s)->pump(in, nin, flush);
}

long zrs_dstream_read(void* s, uint8_t* out, size_t cap) {
  return ((DefStream*)s)->read(out, cap);
}

// last <=32 KiB of input seen by the stream (the live match window).
// Called at a flush seam (spos == data.size()); lets the Python layer
// migrate a fast-path stream onto the exact engine with its window intact.
long zrs_dstream_window(void* sv, uint8_t* out, size_t cap) {
  DefStream* s = (DefStream*)sv;
  size_t n = std::min<size_t>(std::min<size_t>(s->data.size(), WSIZE), cap);
  if (n) std::memcpy(out, s->data.data() + (s->data.size() - n), n);
  return (long)n;
}

// zran index build: decode the whole raw stream once, recording access
// points (out_offset, absolute bit position) at block boundaries every
// `span` output bytes. Returns total output length; *n_points holds the
// number of recorded (pair) entries.
long zrs_zran_index(const uint8_t* in, size_t n, uint8_t* out, size_t cap,
                    uint64_t span, uint64_t* pts, size_t cap_pts,
                    size_t* n_points, size_t* in_used) {
  RegionOpts ro;
  ro.span = span;
  ro.pts = pts;
  ro.cap_pts = cap_pts;
  ro.npts = n_points;
  return inflate_raw_impl(in, n, out, cap, in_used, false, &ro);
}

// Random-access region decode: resume a raw stream at a zran access point.
// `in` points at the byte containing the block header, `skip_bits` of its
// low bits are already consumed; `window` (wlen <= 32768 bytes) is the
// uncompressed history. Decodes until `want` bytes are produced (or the
// stream/input ends). Returns the number of bytes written to `out`.
long zrs_inflate_region(const uint8_t* in, size_t n, int skip_bits,
                        const uint8_t* window, size_t wlen, uint8_t* out_full,
                        size_t want) {
  if (wlen) std::memcpy(out_full, window, wlen);
  RegionOpts ro;
  ro.hist = wlen;
  ro.skip_bits = skip_bits;
  ro.stop_at_cap = true;
  long r = inflate_raw_impl(in, n, out_full, wlen + want, nullptr, true, &ro);
  if (r < 0) return r;
  return r - (long)wlen;
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

// Speculative parallel inflate of ONE raw deflate stream with no index
// (rapidgzip-style two-pass; see the anonymous-namespace block above).
// Returns output length; -1 data error, -2 output overflow, -3 truncated.
// *in_used gets the compressed bytes consumed (trailer bytes excluded).
long zrs_inflate_speculative(const uint8_t* in, size_t n, uint8_t* out,
                             size_t cap, int nthreads, size_t* in_used) {
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  if (nthreads < 1) nthreads = 1;
  constexpr size_t MIN_SEG = 1 << 20;
  size_t T = std::min<size_t>((size_t)nthreads, std::max<size_t>(1, n / MIN_SEG));
  if (T <= 1) {
    RegionOpts ro;
    long r = inflate_raw_impl(in, n, out, cap, in_used, false, &ro);
    return r;
  }
  std::vector<SpecSeg> segs(T);
  for (auto& s : segs) s.bytes = spec_buf_acquire();
  struct PoolReturn {
    std::vector<SpecSeg>& segs;
    ~PoolReturn() {
      for (auto& s : segs) spec_buf_release(std::move(s.bytes));
    }
  } pool_return{segs};
  const size_t seg_bytes = n / T;
  const size_t cap_cells = cap / T * 4 + (1 << 20);
  const bool dbg = std::getenv("ZRS_SPEC_DEBUG") != nullptr;
  std::vector<double> scan_ms(T, 0), dec_ms(T, 0);
  {
    std::vector<std::thread> pool;
    std::atomic_size_t next{0};
    auto worker = [&]() {
      for (;;) {
        size_t k = next.fetch_add(1);
        if (k >= T) return;
        uint64_t hi = (k + 1 == T) ? (uint64_t)n * 8
                                   : (uint64_t)(k + 1) * seg_bytes * 8;
        int why = 0;
        if (k == 0) {
          auto t0 = std::chrono::steady_clock::now();
          segs[0].ok = spec_decode(in, n, 0, hi, cap_cells, segs[0], &why);
          dec_ms[0] = std::chrono::duration<double, std::milli>(
                          std::chrono::steady_clock::now() - t0).count();
          continue;
        }
        uint64_t b = (uint64_t)k * seg_bytes * 8;
        for (int attempts = 0; b < hi && attempts < 24; attempts++) {
          auto t0 = std::chrono::steady_clock::now();
          long c = find_candidate(in, n, b, hi);
          auto t1 = std::chrono::steady_clock::now();
          scan_ms[k] += std::chrono::duration<double, std::milli>(t1 - t0).count();
          if (c < 0) break;
          bool ok = spec_decode(in, n, (uint64_t)c, hi, cap_cells, segs[k], &why);
          dec_ms[k] += std::chrono::duration<double, std::milli>(
                           std::chrono::steady_clock::now() - t1).count();
          if (ok) {
            segs[k].ok = true;
            break;
          }
          if (why == -2) break;  // cell cap: the exact fallback handles it
          b = (uint64_t)c + 1;
        }
      }
    };
    for (int t = 0; t < nthreads; t++) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  if (dbg) {
    for (size_t k = 0; k < T; k++)
      std::fprintf(stderr,
                   "seg %zu ok=%d start=%llu end=%llu n=%zu marks=%zu scan=%.1fms dec=%.1fms\n",
                   k, (int)segs[k].ok, (unsigned long long)segs[k].start_bit,
                   (unsigned long long)segs[k].end_bit, segs[k].n,
                   segs[k].marks.size(), scan_ms[k], dec_ms[k]);
  }
  // sequential stitch: resolve markers against the now-known window, or
  // re-decode exactly where speculation missed the real block chain
  auto stitch_t0 = std::chrono::steady_clock::now();
  size_t op = 0;
  uint64_t cur_bit = 0;
  bool done = false;
  // Fast path: every segment speculated correctly and the block-boundary
  // chain is seamless. The bulk of each segment (cells beyond marker_end)
  // is plain bytes — narrow u16→u8 in parallel at precomputed offsets; the
  // marker prefixes resolve sequentially afterwards (segment order makes
  // every referenced earlier byte already-written).
  bool all_chain = segs[0].ok && segs[0].start_bit == 0;
  for (size_t k = 1; all_chain && k < T; k++)
    all_chain = segs[k].ok && !segs[k - 1].final_seen &&
                segs[k].start_bit == segs[k - 1].end_bit;
  if (all_chain && segs[T - 1].final_seen) {
    std::vector<size_t> ofs(T + 1, 0);
    for (size_t k = 0; k < T; k++) ofs[k + 1] = ofs[k] + segs[k].n;
    if (ofs[T] > cap) return -2;
    {
      std::vector<std::thread> pool;
      std::atomic_size_t next{0};
      auto worker = [&]() {
        for (;;) {
          size_t k = next.fetch_add(1);
          if (k >= T) return;
          std::memcpy(out + ofs[k], segs[k].bytes.data(), segs[k].n);
        }
      };
      for (int t = 0; t < nthreads; t++) pool.emplace_back(worker);
      for (auto& t : pool) t.join();
    }
    // resolve marks in segment order: every referenced byte is either
    // unmarked (already memcpy'd) or an earlier segment's mark (resolved)
    for (size_t k = 0; k < T; k++) {
      const size_t base = ofs[k];
      for (const auto& m : segs[k].marks) {
        size_t back = m.second;          // bytes before the segment start
        if (back > base) return -1;      // reference before stream start
        out[base + m.first] = out[base - back];
      }
    }
    op = ofs[T];
    cur_bit = segs[T - 1].end_bit;
    done = true;
  }
  for (size_t k = 0; k < T && !done; k++) {
    uint64_t seg_stop = (k + 1 == T) ? (uint64_t)n * 8
                                     : (uint64_t)(k + 1) * seg_bytes * 8;
    if (k > 0 && cur_bit >= seg_stop) continue;  // already decoded past it
    auto seg_t0 = std::chrono::steady_clock::now();
    bool took_cells = segs[k].ok && segs[k].start_bit == cur_bit;
    if (took_cells) {
      const size_t nc = segs[k].n;
      if (op + nc > cap) return -2;
      std::memcpy(out + op, segs[k].bytes.data(), nc);
      for (const auto& m : segs[k].marks) {
        size_t back = m.second;          // bytes before the segment start
        if (back > op) return -1;        // reference before stream start
        out[op + m.first] = out[op - back];
      }
      op += nc;
      cur_bit = segs[k].end_bit;
      done = segs[k].final_seen;
    } else {
      RegionOpts ro;
      ro.hist = op;
      ro.skip_bits = (int)(cur_bit % 8);
      ro.stop_bit = seg_stop - (cur_bit / 8) * 8;
      long r = inflate_raw_impl(in + cur_bit / 8, n - cur_bit / 8, out, cap,
                                nullptr, false, &ro);
      if (r < 0) return r;
      op = (size_t)r;
      cur_bit = (cur_bit / 8) * 8 + ro.end_bit;
      done = ro.final_seen;
    }
    if (dbg)
      std::fprintf(stderr, "stitch seg %zu cells=%d %.1fms\n", k, (int)took_cells,
                   std::chrono::duration<double, std::milli>(
                       std::chrono::steady_clock::now() - seg_t0).count());
  }
  if (dbg)
    std::fprintf(stderr, "stitch=%.1fms\n",
                 std::chrono::duration<double, std::milli>(
                     std::chrono::steady_clock::now() - stitch_t0).count());
  if (!done) return -3;
  if (in_used) *in_used = (size_t)((cur_bit + 7) / 8);
  return (long)op;
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
