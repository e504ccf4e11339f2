// zpack-tpu native zstd encoder (RFC 8878), self-contained.
//
// Role parity: ZSTD_compressCCtx as used by the reference
// (lib/zpack_write.c:179).  Independent implementation; the Python encoder
// in zpack_tpu/codecs/zstd/encode.py is the architectural blueprint and
// differential oracle.  Pipeline per 128 KiB block: greedy hash-chain
// matcher with explicit repeat-offset probes → literals (raw / RLE /
// Huffman 4-stream, package-merge length-limited codes, direct weights) →
// sequences (predefined vs RLE vs freshly-normalized FSE tables) →
// raw-block fallback.

#include <cstdint>
#include <cstring>
#include <cstddef>
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <functional>
#include <algorithm>
#include <memory>
#include <climits>
#include <chrono>

#include "zn_threads.h"

// ZN_DEBUG-only per-block strategy timing; zn_debug() gates every zn_now()
// call so the steady_clock reads stay out of the hot path in normal runs.
static inline bool zn_debug() {
    static const bool on = getenv("ZN_DEBUG") != nullptr;
    return on;
}
static inline double zn_now() {
    if (!zn_debug()) return 0.0;
    return std::chrono::duration<double>(
        std::chrono::steady_clock::now().time_since_epoch()).count();
}

namespace zenc {

static inline uint32_t rd32e(const uint8_t* p) { uint32_t v; memcpy(&v, p, 4); return v; }
static inline uint64_t rd64e(const uint8_t* p) { uint64_t v; memcpy(&v, p, 8); return v; }
static inline int highbit32(uint32_t v) { return 31 - __builtin_clz(v); }

// ---------------------------------------------------------------------------
// backward bit writer
// ---------------------------------------------------------------------------

struct BitW {
    // 64-bit container with batched 8-byte spills (the per-byte push_back
    // writer measured 66 cycles/seq in the sequence encoder — ~22% of L3
    // encode).  `out` holds `opos` valid bytes plus scratch slack until
    // finish() trims it; consumers read `out` only after finish().
    uint64_t acc = 0;
    int nbits = 0;
    size_t opos = 0;
    std::vector<uint8_t> out;

    inline void spill_() {
        if (out.size() < opos + 16) out.resize(out.size() + opos + 64);
        memcpy(out.data() + opos, &acc, 8);
        opos += (size_t)((unsigned)nbits >> 3);
        acc >>= nbits & ~7;
        nbits &= 7;
    }
    inline void add(uint32_t value, int bits) {
        if (nbits > 32) spill_();  // keeps headroom for bits <= 31
        acc |= (uint64_t)(value & (((uint64_t)1 << bits) - 1)) << nbits;
        nbits += bits;
    }
    void finish() {
        if (nbits > 32) spill_();
        acc |= 1ull << nbits;
        nbits += 1;
        spill_();
        if (nbits) { out.resize(opos + 1 > out.size() ? opos + 1 : out.size());
                     out[opos++] = (uint8_t)acc; acc = 0; nbits = 0; }
        out.resize(opos);
    }
};

// ---------------------------------------------------------------------------
// FSE encode tables
// ---------------------------------------------------------------------------

static bool spread_symbols(const std::vector<int>& counts, int al, std::vector<uint16_t>& symbols) {
    int size = 1 << al;
    symbols.assign(size, 0);
    int high = size - 1;
    for (size_t s = 0; s < counts.size(); s++)
        if (counts[s] == -1) symbols[high--] = (uint16_t)s;
    int step = (size >> 1) + (size >> 3) + 3;
    int mask = size - 1;
    int pos = 0;
    for (size_t s = 0; s < counts.size(); s++)
        for (int c = 0; c < counts[s]; c++) {
            symbols[pos] = (uint16_t)s;
            pos = (pos + step) & mask;
            while (pos > high) pos = (pos + step) & mask;
        }
    return pos == 0;
}

struct FseEnc {
    int al = 0;
    std::vector<uint16_t> state_table;
    std::vector<int64_t> delta_nb;
    std::vector<int64_t> delta_fs;

    bool init(const std::vector<int>& counts, int al_) {
        al = al_;
        int size = 1 << al;
        std::vector<uint16_t> symbols;
        if (!spread_symbols(counts, al, symbols)) return false;
        std::vector<int> cumul(counts.size() + 1, 0);
        int total = 0;
        for (size_t s = 0; s < counts.size(); s++) {
            cumul[s] = total;
            total += counts[s] == -1 ? 1 : (counts[s] > 0 ? counts[s] : 0);
        }
        state_table.assign(size, 0);
        std::vector<int> fill(cumul.begin(), cumul.end());
        for (int u = 0; u < size; u++)
            state_table[fill[symbols[u]]++] = (uint16_t)(size + u);
        delta_nb.assign(counts.size(), 0);
        delta_fs.assign(counts.size(), 0);
        total = 0;
        for (size_t s = 0; s < counts.size(); s++) {
            int c = counts[s];
            if (c == 0) {
                delta_nb[s] = ((int64_t)(al + 1) << 16) - (1 << al);
            } else if (c == -1 || c == 1) {
                delta_nb[s] = ((int64_t)al << 16) - (1 << al);
                delta_fs[s] = total - 1;
                total += 1;
            } else {
                int max_bits = al - highbit32(c - 1);
                delta_nb[s] = ((int64_t)max_bits << 16) - ((int64_t)c << max_bits);
                delta_fs[s] = total - c;
                total += c;
            }
        }
        return true;
    }
    int init_state(int sym) const {
        int nb = (int)((delta_nb[sym] + (1 << 15)) >> 16);
        int64_t val = ((int64_t)nb << 16) - delta_nb[sym];
        return state_table[(val >> nb) + delta_fs[sym]];
    }
    int encode(BitW& w, int state, int sym) const {
        int nb = (int)((state + delta_nb[sym]) >> 16);
        w.add((uint32_t)state, nb);
        return state_table[(state >> nb) + delta_fs[sym]];
    }
    void flush(BitW& w, int state) const { w.add((uint32_t)state, al); }
};

// RLE (0-bit) table
struct RleEnc {
    int al = 0;
    int init_state(int) const { return 0; }
    int encode(BitW&, int, int) const { return 0; }
    void flush(BitW&, int) const {}
};

static bool normalize_counts(const uint32_t* hist, int nsym, int al, uint32_t total,
                             std::vector<int>& norm) {
    int size = 1 << al;
    norm.assign(nsym, 0);
    int64_t distributed = 0;
    int largest = -1;
    uint32_t largest_count = 0;
    for (int s = 0; s < nsym; s++) {
        uint32_t c = hist[s];
        if (!c) continue;
        if (c == total) return false;  // RLE case
        int64_t scaled = (int64_t)c * size / total;
        if (scaled == 0) { norm[s] = -1; distributed += 1; }
        else { norm[s] = (int)scaled; distributed += scaled; }
        if (c > largest_count) { largest_count = c; largest = s; }
    }
    int64_t rest = size - distributed;
    if (largest < 0) return false;
    norm[largest] += (int)rest;
    return norm[largest] >= 1;
}

static int optimal_al(uint32_t total, int max_symbol, int cap) {
    if (total <= 1) return 5;
    int al = highbit32(total - 1) - 2;
    int minimum = max_symbol ? highbit32((uint32_t)max_symbol) + 2 : 5;
    if (al < minimum) al = minimum;
    if (al < 5) al = 5;
    if (al > cap) al = cap;
    return al;
}

// forward LSB bit writer for NCount
struct FwdW {
    uint64_t acc = 0;
    int nbits = 0;
    std::vector<uint8_t> out;
    void add(uint32_t v, int bits) {
        acc |= (uint64_t)(v & ((1u << bits) - 1)) << nbits;
        nbits += bits;
        while (nbits >= 8) { out.push_back((uint8_t)acc); acc >>= 8; nbits -= 8; }
    }
    void done() { if (nbits) out.push_back((uint8_t)acc); }
};

static bool write_ncount(const std::vector<int>& counts, int al, std::vector<uint8_t>& out) {
    FwdW w;
    w.add(al - 5, 4);
    int table_size = 1 << al;
    int remaining = table_size + 1;
    int threshold = table_size;
    int nbits = al + 1;
    size_t i = 0;
    bool previous0 = false;
    while (remaining > 1) {
        if (i >= counts.size()) return false;
        if (previous0) {
            size_t start = i;
            while (i < counts.size() && counts[i] == 0) i++;
            size_t run = i - start;
            while (run >= 3) { w.add(3, 2); run -= 3; }
            w.add((uint32_t)run, 2);
            if (i >= counts.size()) return false;
        }
        int c = counts[i++];
        int maxv = (2 * threshold - 1) - remaining;
        remaining -= c < 0 ? -c : c;
        int val = c + 1;
        if (val >= threshold) val += maxv;
        if (val < maxv) w.add((uint32_t)val, nbits - 1);
        else w.add((uint32_t)val, nbits);
        previous0 = c == 0;
        while (remaining < threshold && remaining > 1) { nbits--; threshold >>= 1; }
    }
    w.done();
    out = std::move(w.out);
    return true;
}

// ---------------------------------------------------------------------------
// LL / ML code tables
// ---------------------------------------------------------------------------

static const uint32_t LL_BASE[36] = {
    0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,18,20,22,24,28,32,40,
    48,64,128,256,512,1024,2048,4096,8192,16384,32768,65536};
static const uint8_t LL_EXTRA[36] = {
    0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,1,1,1,1,2,2,3,3,4,6,7,8,9,10,11,12,13,14,15,16};
static const uint32_t ML_BASE[53] = {
    3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21,22,23,24,25,26,27,28,
    29,30,31,32,33,34,35,37,39,41,43,47,51,59,67,83,99,131,259,515,1027,2051,
    4099,8195,16387,32771,65539};
static const uint8_t ML_EXTRA[53] = {
    0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,
    1,1,1,1,2,2,3,3,4,4,5,7,8,9,10,11,12,13,14,15,16};
static const int LL_DEF[36] = {4,3,2,2,2,2,2,2,2,2,2,2,2,1,1,1,2,2,2,2,2,2,2,2,2,3,2,1,1,1,1,1,-1,-1,-1,-1};
static const int ML_DEF[53] = {1,4,3,2,2,2,2,2,2,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,-1,-1,-1,-1,-1,-1,-1};
static const int OF_DEF[29] = {1,1,1,1,1,1,2,2,2,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,-1,-1,-1,-1,-1};

static uint8_t g_ll_small[64], g_ml_small[128];
static FseEnc g_ll_pre, g_of_pre, g_ml_pre;

// Thread-safe lazy init via a C++11 magic static: zn_zstd_compress runs
// blocks on a worker pool, so the first compression can hit this from
// several threads at once (TSAN round-5 finding — the plain-bool guard
// raced, and a second initializer could reallocate the FseEnc vectors
// while another thread was already encoding from them).
static void enc_init_body() {
    for (int c = 0; c < 36; c++)
        for (uint32_t v = LL_BASE[c]; v < LL_BASE[c] + (1u << LL_EXTRA[c]) && v < 64; v++)
            g_ll_small[v] = (uint8_t)c;
    for (int c = 0; c < 53; c++)
        for (uint32_t v = ML_BASE[c] - 3; v < ML_BASE[c] - 3 + (1u << ML_EXTRA[c]) && v < 128; v++)
            g_ml_small[v] = (uint8_t)c;
    g_ll_pre.init(std::vector<int>(LL_DEF, LL_DEF + 36), 6);
    g_of_pre.init(std::vector<int>(OF_DEF, OF_DEF + 29), 5);
    g_ml_pre.init(std::vector<int>(ML_DEF, ML_DEF + 53), 6);
}

static void enc_init() {
    static const bool done = [] { enc_init_body(); return true; }();
    (void)done;
}

static inline int ll_code(uint32_t v) {
    if (v < 64) return g_ll_small[v];
    return 19 + highbit32(v);
}
static inline int ml_code(uint32_t mlen) {
    uint32_t m = mlen - 3;
    if (m < 128) return g_ml_small[m];
    return 36 + highbit32(m);
}

// ---------------------------------------------------------------------------
// Huffman encode (literals)
// ---------------------------------------------------------------------------

struct HufEnc {
    uint16_t codes[256];
    uint8_t lengths[256];
    int max_bits = 0;
    int max_symbol = -1;  // highest present symbol
    std::vector<int> weights;  // excludes implied last
};

// two-queue Huffman + Kraft rebalancing to the 11-bit limit (fast,
// allocation-light; the limit rebalance costs a sliver of ratio vs
// package-merge — zstd's own HUF_setMaxHeight makes the same trade)
static bool huf_build(const uint32_t* hist, HufEnc& t) {
    std::vector<int> present;
    for (int s = 0; s < 256; s++) if (hist[s]) present.push_back(s);
    if (present.size() < 2) return false;
    const int LIMIT = 11;
    size_t n = present.size();
    // leaves sorted ascending by freq
    std::vector<std::pair<uint64_t, int>> leaves;
    leaves.reserve(n);
    for (int s : present) leaves.push_back({hist[s], s});
    std::sort(leaves.begin(), leaves.end());
    // two-queue merge; parents tracked for depth computation
    struct TNode { uint64_t freq; int l, r; };  // l/r: <0 → leaf ~idx
    std::vector<TNode> nodes;
    nodes.reserve(2 * n);
    std::vector<int> q2;  // internal node queue (indices into nodes)
    size_t i1 = 0, i2 = 0;
    auto take_min = [&]() -> int {
        bool leaf = i2 >= q2.size() ||
                    (i1 < n && leaves[i1].first <= nodes[q2[i2]].freq);
        if (leaf) { int id = (int)nodes.size(); nodes.push_back({leaves[i1].first, ~(int)i1, ~(int)i1}); i1++; return id; }
        return q2[i2++];
    };
    // build: leaves become singleton nodes lazily via take_min
    int root = -1;
    size_t remaining = n;
    while (remaining > 1) {
        int a = take_min();
        int b = take_min();
        int id = (int)nodes.size();
        nodes.push_back({nodes[a].freq + nodes[b].freq, a, b});
        q2.push_back(id);
        root = id;
        remaining--;
    }
    // depth per leaf via iterative DFS
    int lengths[256] = {0};
    {
        std::vector<std::pair<int, int>> stack;  // (node, depth)
        stack.push_back({root, 0});
        while (!stack.empty()) {
            auto [id, d] = stack.back();
            stack.pop_back();
            const TNode& nd = nodes[id];
            if (nd.l == nd.r && nd.l < 0) {  // leaf
                lengths[leaves[~nd.l].second] = d > 0 ? d : 1;
            } else {
                stack.push_back({nd.l, d + 1});
                stack.push_back({nd.r, d + 1});
            }
        }
    }
    // Kraft rebalance to the limit: cap, then pay the debt by deepening
    // the cheapest (lowest-freq) shallow symbols
    int64_t kraft = 0;
    for (int s : present) {
        if (lengths[s] > LIMIT) lengths[s] = LIMIT;
        kraft += 1ll << (LIMIT - lengths[s]);
    }
    const int64_t target = 1ll << LIMIT;
    // over-subscribed: deepen symbols, cheapest first (leaves is sorted asc)
    while (kraft > target) {
        bool moved = false;
        for (auto& [f, s] : leaves) {
            if (lengths[s] < LIMIT) {
                kraft -= 1ll << (LIMIT - lengths[s] - 1);
                lengths[s]++;
                moved = true;
                if (kraft <= target) break;
            }
        }
        if (!moved) return false;
    }
    // under-subscribed: shorten the most frequent symbols where it fits
    for (size_t k = leaves.size(); k-- > 0 && kraft < target;) {
        int s = leaves[k].second;
        while (lengths[s] > 1) {
            int64_t gain = 1ll << (LIMIT - lengths[s]);
            if (kraft + gain > target) break;
            kraft += gain;
            lengths[s]--;
        }
    }
    if (kraft != target) return false;
    int max_len = 0;
    for (int s : present) max_len = std::max(max_len, lengths[s]);
    // weights + canonical codes (zstd order: by increasing weight, natural
    // symbol order within a weight; code = range_start >> (weight-1))
    t.max_bits = max_len;
    t.max_symbol = present.back();
    memset(t.lengths, 0, sizeof(t.lengths));
    memset(t.codes, 0, sizeof(t.codes));
    int pos = 0;
    for (int w = 1; w <= max_len; w++) {
        for (int s = 0; s < 256; s++) {
            if (hist[s] && max_len + 1 - lengths[s] == w) {
                t.lengths[s] = (uint8_t)lengths[s];
                t.codes[s] = (uint16_t)(pos >> (w - 1));
                pos += 1 << (w - 1);
            }
        }
    }
    if (pos != (1 << max_len)) return false;
    t.weights.clear();
    for (int s = 0; s < t.max_symbol; s++)
        t.weights.push_back(hist[s] ? max_len + 1 - lengths[s] : 0);
    return true;
}

// FSE-compress huffman weights (header byte < 128): two interleaved states
// over the weight array, dual of read_huf_weights in zstd_decode.cpp.
// Enables tables whose symbol range exceeds the 128-entry direct-weights
// cap and shrinks tree descriptions on skewed weight distributions.
static bool fse_weights(const std::vector<int>& W, std::vector<uint8_t>& out) {
    size_t n = W.size();
    if (n < 2) return false;
    uint32_t hist[16] = {0};
    int maxw = 0;
    for (int v : W) {
        if (v < 0 || v > 12) return false;
        hist[v]++;
        if (v > maxw) maxw = v;
    }
    uint32_t total = (uint32_t)n;
    int al = optimal_al(total, maxw, 6);
    std::vector<int> norm;
    if (!normalize_counts(hist, maxw + 1, al, total, norm)) return false;
    std::vector<uint8_t> desc;
    if (!write_ncount(norm, al, desc)) return false;
    FseEnc enc;
    if (!enc.init(norm, al)) return false;
    BitW w;
    // even state decodes w0,w2,…; odd decodes w1,w3,… — encode backward
    int st[2] = {-1, -1};
    for (size_t k = n; k-- > 0;) {
        int parity = (int)(k & 1);
        if (st[parity] < 0) st[parity] = enc.init_state(W[k]);
        else st[parity] = enc.encode(w, st[parity], W[k]);
    }
    if (st[1] < 0) return false;
    enc.flush(w, st[1]);  // odd flushed first → read second
    enc.flush(w, st[0]);  // even read first by the decoder
    w.finish();
    size_t csize = desc.size() + w.out.size();
    if (csize >= 128) return false;
    // Self-verify by simulating the spec decoder (stream exhaustion — not a
    // count — terminates it; 0-bit states could otherwise over-run):
    {
        std::vector<uint16_t> symbols;
        if (!spread_symbols(norm, al, symbols)) return false;
        int size = 1 << al;
        std::vector<int> next(norm.size());
        for (size_t s = 0; s < norm.size(); s++) next[s] = norm[s] == -1 ? 1 : norm[s];
        std::vector<uint8_t> nb(size);
        std::vector<uint16_t> ns(size);
        for (int u = 0; u < size; u++) {
            int s = symbols[u];
            int x = next[s]++;
            int hb = 31 - __builtin_clz((uint32_t)x);
            nb[u] = (uint8_t)(al - hb);
            ns[u] = (uint16_t)((x << (al - hb)) - size);
        }
        const uint8_t* bs = w.out.data();
        size_t bn = w.out.size();
        if (!bn || bs[bn - 1] == 0) return false;
        long long bits_left = (long long)(bn - 1) * 8 + (31 - __builtin_clz((uint32_t)bs[bn - 1]));
        auto rd = [&](int nbits) -> uint32_t {
            if (!nbits) return 0;
            bits_left -= nbits;
            long long pos = bits_left;
            uint64_t word = 0;
            if (pos >= 0) {
                size_t byte = (size_t)(pos >> 3);
                for (size_t i = 0; i < 8 && byte + i < bn; i++)
                    word |= (uint64_t)bs[byte + i] << (8 * i);
                return (uint32_t)((word >> (pos & 7)) & ((1ull << nbits) - 1));
            }
            return 0;
        };
        uint32_t even = rd(al), odd = rd(al);
        std::vector<int> got;
        while (got.size() <= 255) {
            got.push_back(symbols[even]);
            int bits = nb[even];
            if (bits_left < bits) { got.push_back(symbols[odd]); break; }
            even = ns[even] + rd(bits);
            got.push_back(symbols[odd]);
            bits = nb[odd];
            if (bits_left < bits) { got.push_back(symbols[even]); break; }
            odd = ns[odd] + rd(bits);
        }
        if (got.size() != n) return false;
        for (size_t k = 0; k < n; k++) if (got[k] != W[k]) return false;
    }
    out.clear();
    out.push_back((uint8_t)csize);
    out.insert(out.end(), desc.begin(), desc.end());
    out.insert(out.end(), w.out.begin(), w.out.end());
    return true;
}

// Pack (code | len<<12) per symbol: one table load instead of two.
static void huf_pack_table(const HufEnc& t, uint16_t packed[256]) {
    int top = t.max_symbol < 0 ? -1 : t.max_symbol;
    for (int s = 0; s <= top; s++)
        packed[s] = (uint16_t)(t.codes[s] | ((uint16_t)t.lengths[s] << 12));
}

// Encode TWO backward huffman streams in one loop: the accumulator chain
// (or+shift serialized through nbits) limits a single stream to ~2 cyc/sym;
// two independent chains overlap almost fully.  Both streams must have the
// same symbol count (the 4-stream split gives three equal-size streams).
static void huf_encode_stream2(const uint8_t* d0, const uint8_t* d1, size_t n,
                               const uint16_t* packed,
                               uint8_t* op0, size_t& pos0,
                               uint8_t* op1, size_t& pos1) {
    uint64_t acc0 = 0, acc1 = 0;
    int nb0 = 0, nb1 = 0;
    size_t p0 = 0, p1 = 0;
    size_t i = n;
    while (i >= 2) {
        uint32_t e0 = packed[d0[i - 1]];
        acc0 |= (uint64_t)(e0 & 0x7FF) << nb0;
        nb0 += e0 >> 12;
        uint32_t f0 = packed[d1[i - 1]];
        acc1 |= (uint64_t)(f0 & 0x7FF) << nb1;
        nb1 += f0 >> 12;
        uint32_t e1 = packed[d0[i - 2]];
        acc0 |= (uint64_t)(e1 & 0x7FF) << nb0;
        nb0 += e1 >> 12;
        uint32_t f1 = packed[d1[i - 2]];
        acc1 |= (uint64_t)(f1 & 0x7FF) << nb1;
        nb1 += f1 >> 12;
        i -= 2;
        if (nb0 >= 32) { memcpy(op0 + p0, &acc0, 4); p0 += 4; acc0 >>= 32; nb0 -= 32; }
        if (nb1 >= 32) { memcpy(op1 + p1, &acc1, 4); p1 += 4; acc1 >>= 32; nb1 -= 32; }
    }
    if (i) {
        uint32_t e0 = packed[d0[0]];
        acc0 |= (uint64_t)(e0 & 0x7FF) << nb0;
        nb0 += e0 >> 12;
        uint32_t f0 = packed[d1[0]];
        acc1 |= (uint64_t)(f0 & 0x7FF) << nb1;
        nb1 += f0 >> 12;
    }
    acc0 |= 1ull << nb0; nb0 += 1;
    while (nb0 > 0) { op0[p0++] = (uint8_t)acc0; acc0 >>= 8; nb0 -= 8; }
    acc1 |= 1ull << nb1; nb1 += 1;
    while (nb1 > 0) { op1[p1++] = (uint8_t)acc1; acc1 >>= 8; nb1 -= 8; }
    pos0 = p0;
    pos1 = p1;
}

// Encode one backward huffman stream into `out` (grow-only scratch, never
// shrunk — a clear+resize writer re-zeroed ~1.4x the input every call).
// Packed (code | len<<12) entries mean one table load per symbol; two
// symbols join the accumulator between 32-bit spills (codes are <= 11 bit,
// so a pair adds <= 22 bits against the >= 32 bits of headroom).
static size_t huf_encode_stream(const uint8_t* d, size_t n, const HufEnc& t,
                                std::vector<uint8_t>& out) {
    size_t need = n * 11 / 8 + 16;
    if (out.size() < need) out.resize(need);
    uint16_t packed[256];
    int top = t.max_symbol < 0 ? -1 : t.max_symbol;
    for (int s = 0; s <= top; s++)
        packed[s] = (uint16_t)(t.codes[s] | ((uint16_t)t.lengths[s] << 12));
    uint8_t* op = out.data();
    size_t pos = 0;
    uint64_t acc = 0;
    int nbits = 0;
    size_t i = n;
    while (i >= 2) {
        uint32_t e0 = packed[d[i - 1]];
        acc |= (uint64_t)(e0 & 0x7FF) << nbits;
        nbits += e0 >> 12;
        uint32_t e1 = packed[d[i - 2]];
        acc |= (uint64_t)(e1 & 0x7FF) << nbits;
        nbits += e1 >> 12;
        i -= 2;
        if (nbits >= 32) {
            memcpy(op + pos, &acc, 4);
            pos += 4;
            acc >>= 32;
            nbits -= 32;
        }
    }
    if (i) {
        uint32_t e0 = packed[d[0]];
        acc |= (uint64_t)(e0 & 0x7FF) << nbits;
        nbits += e0 >> 12;
    }
    acc |= 1ull << nbits;  // sentinel
    nbits += 1;
    while (nbits > 0) { op[pos++] = (uint8_t)acc; acc >>= 8; nbits -= 8; }
    return pos;
}

// ---------------------------------------------------------------------------
// block encoding
// ---------------------------------------------------------------------------

struct Seq { uint32_t ll, ml, ov; };

// Previous sequence-table state for FSE Repeat_Mode (RFC 8878
// §3.1.1.3.2.1.1): wire mode 3 reuses the previous sequence-bearing
// block's table with ZERO description bytes.  kind mirrors what the
// decoder's "previous table" is after each mode: 0 none (frame start),
// 1 predefined, 2 RLE, 3 custom.
struct SeqPrev {
    int kind = 0;
    int rle_sym = -1;
    FseEnc enc;             // valid when kind == 3
    std::vector<int> norm;  // its normalized counts (repeat pricing)
    int al = 0;
};

// Per-frame entropy-table state threaded through the block loop (and
// backed up / restored by the L19 strategy tournament + splitter): a
// block may reuse the previous Huffman table ("treeless", literals
// type 3, RFC 8878 §3.1.1.3.1.4) and/or the previous FSE sequence
// tables (Repeat_Mode) when re-describing fresh tables wouldn't pay.
struct EntState {
    HufEnc prev;
    bool valid = false;
    SeqPrev ll, of, ml;
};

static void encode_literals(const uint8_t* lits, size_t rs, std::vector<uint8_t>& out,
                            EntState& ls) {
    out.clear();
    if (rs == 0) { out.push_back(0); return; }
    // RLE literals
    bool all_same = true;
    for (size_t i = 1; i < rs && all_same; i++) all_same = lits[i] == lits[0];
    auto raw_rle_header = [&](int ltype, size_t n) {
        if (n < 32) out.push_back((uint8_t)(ltype | (n << 3)));
        else if (n < 4096) {
            out.push_back((uint8_t)(ltype | (1 << 2) | ((n & 0xF) << 4)));
            out.push_back((uint8_t)(n >> 4));
        } else {
            out.push_back((uint8_t)(ltype | (3 << 2) | ((n & 0xF) << 4)));
            out.push_back((uint8_t)((n >> 4) & 0xFF));
            out.push_back((uint8_t)(n >> 12));
        }
    };
    if (all_same && rs > 1) {
        raw_rle_header(1, rs);
        out.push_back(lits[0]);
        return;
    }
    if (rs >= 64) {
        uint32_t hist[256] = {0};
        for (size_t i = 0; i < rs; i++) hist[lits[i]]++;
        // cheap entropy estimate: skip the huffman machinery when literals
        // are near-incompressible (log2 via bit positions)
        double est_bits = 0;
        for (int sym = 0; sym < 256; sym++) {
            uint32_t c = hist[sym];
            if (!c) continue;
            double p = (double)c / rs;
            // -log2(p) approximated by highbit of 1/p (coarse but monotone)
            uint32_t inv = (uint32_t)(1.0 / p);
            int lb = inv > 1 ? highbit32(inv) : 0;
            est_bits += (double)c * lb;
        }
        HufEnc t;
        bool own_ok = est_bits / 8 + 64 < rs && huf_build(hist, t);
        // tree description: direct weights vs FSE-compressed weights
        std::vector<uint8_t> tree;
        if (own_ok) {
            if (t.weights.size() <= 128) {
                tree.push_back((uint8_t)(127 + t.weights.size()));
                for (size_t i = 0; i < t.weights.size(); i += 2) {
                    int hi = t.weights[i] << 4;
                    int lo = i + 1 < t.weights.size() ? t.weights[i + 1] : 0;
                    tree.push_back((uint8_t)(hi | lo));
                }
            }
            std::vector<uint8_t> fsed;
            if (fse_weights(t.weights, fsed) && (tree.empty() || fsed.size() < tree.size()))
                tree.swap(fsed);
            if (tree.empty()) own_ok = false;  // >128 weights and FSE failed
        }
        // treeless candidate: previous table covers this block's symbols and
        // its (tree-free) streams estimate no bigger than fresh table+tree
        const HufEnc* table = own_ok ? &t : nullptr;
        int ltype = 2;
        if (ls.valid) {
            bool covers = true;
            long long bits_prev = 0;
            for (int sym = 0; sym < 256 && covers; sym++) {
                if (!hist[sym]) continue;
                if (!ls.prev.lengths[sym]) covers = false;
                else bits_prev += (long long)hist[sym] * ls.prev.lengths[sym];
            }
            if (covers) {
                long long bits_own = LLONG_MAX;
                if (own_ok) {
                    bits_own = (long long)tree.size() * 8;
                    for (int sym = 0; sym < 256; sym++)
                        if (hist[sym]) bits_own += (long long)hist[sym] * t.lengths[sym];
                }
                if (bits_prev <= bits_own) {
                    table = &ls.prev;
                    ltype = 3;
                    tree.clear();
                }
            }
        }
        if (table) {
            size_t per = (rs + 3) / 4;
            static thread_local std::vector<uint8_t> s[4];
            size_t sn[4] = {0, 0, 0, 0};
            bool four = rs >= 256 && rs - 3 * per > 0;
            size_t cs;
            if (four) {
                size_t need = per * 11 / 8 + 16;
                for (int k = 0; k < 3; k++)
                    if (s[k].size() < need) s[k].resize(need);
                uint16_t packed[256];
                huf_pack_table(*table, packed);
                // streams 0+1 share one interleaved loop (equal lengths);
                // stream 2 pairs with 3's equal-length prefix via the
                // single-stream path (3 is shorter: rs - 3*per <= per)
                huf_encode_stream2(lits, lits + per, per, packed,
                                   s[0].data(), sn[0], s[1].data(), sn[1]);
                sn[2] = huf_encode_stream(lits + 2 * per, per, *table, s[2]);
                sn[3] = huf_encode_stream(lits + 3 * per, rs - 3 * per, *table, s[3]);
                cs = tree.size() + 6 + sn[0] + sn[1] + sn[2] + sn[3];
            } else {
                sn[0] = huf_encode_stream(lits, rs, *table, s[0]);
                cs = tree.size() + sn[0];
            }
            bool fits = four ? (sn[0] <= 0xFFFF && sn[1] <= 0xFFFF && sn[2] <= 0xFFFF)
                             : (rs <= 1023 && cs <= 1023);
            if (fits && cs + 5 < rs) {
                // compressed literals header
                if (!four) {
                    out.push_back((uint8_t)(ltype | (0 << 2) | ((rs & 0xF) << 4)));
                    out.push_back((uint8_t)((rs >> 4) | ((cs & 3) << 6)));
                    out.push_back((uint8_t)(cs >> 2));
                } else if (rs <= 1023 && cs <= 1023) {
                    out.push_back((uint8_t)(ltype | (1 << 2) | ((rs & 0xF) << 4)));
                    out.push_back((uint8_t)((rs >> 4) | ((cs & 3) << 6)));
                    out.push_back((uint8_t)(cs >> 2));
                } else if (rs <= 16383 && cs <= 16383) {
                    out.push_back((uint8_t)(ltype | (2 << 2) | ((rs & 0xF) << 4)));
                    out.push_back((uint8_t)((rs >> 4) & 0xFF));
                    out.push_back((uint8_t)((rs >> 12) | ((cs & 0x3F) << 2)));
                    out.push_back((uint8_t)(cs >> 6));
                } else {
                    out.push_back((uint8_t)(ltype | (3 << 2) | ((rs & 0xF) << 4)));
                    out.push_back((uint8_t)((rs >> 4) & 0xFF));
                    out.push_back((uint8_t)(((rs >> 12) & 0x3F) | ((cs & 3) << 6)));
                    out.push_back((uint8_t)((cs >> 2) & 0xFF));
                    out.push_back((uint8_t)(cs >> 10));
                }
                out.insert(out.end(), tree.begin(), tree.end());
                if (four) {
                    out.push_back((uint8_t)(sn[0] & 0xFF));
                    out.push_back((uint8_t)(sn[0] >> 8));
                    out.push_back((uint8_t)(sn[1] & 0xFF));
                    out.push_back((uint8_t)(sn[1] >> 8));
                    out.push_back((uint8_t)(sn[2] & 0xFF));
                    out.push_back((uint8_t)(sn[2] >> 8));
                    for (int i = 0; i < 4; i++)
                        out.insert(out.end(), s[i].data(), s[i].data() + sn[i]);
                } else {
                    out.insert(out.end(), s[0].data(), s[0].data() + sn[0]);
                }
                if (ltype == 2) {  // fresh table becomes the frame's current
                    ls.prev = t;
                    ls.valid = true;
                }
                return;
            }
        }
    }
    raw_rle_header(0, rs);
    out.insert(out.end(), lits, lits + rs);
}

// pick sequence-table mode: 0 predefined / 1 RLE / 2 custom / 3 repeat;
// fills desc and updates prev to what the decoder's "previous table"
// becomes after this block (so a later block can price Repeat_Mode).
template <typename CodeFn>
static int pick_mode(const std::vector<Seq>& seqs, CodeFn code_of,
                     const int* def_dist, int def_n, int def_al,
                     int max_code, int max_al,
                     FseEnc& custom, std::vector<uint8_t>& desc, int& rle_sym,
                     SeqPrev& prev) {
    uint32_t hist[64] = {0};
    for (const Seq& s : seqs) hist[code_of(s)]++;
    int nz = 0, last = 0;
    for (int c = 0; c <= max_code; c++) if (hist[c]) { nz++; last = c; }
    if (nz == 1) {
        // RLE (1 desc byte) — unless the previous table IS this RLE
        // symbol, where Repeat_Mode saves the byte (libzstd-19 leans on
        // this on code-like shapes: half its blocks repeat ML tables).
        if (prev.kind == 2 && prev.rle_sym == last) { desc.clear(); return 3; }
        rle_sym = last;
        desc.assign(1, (uint8_t)last);
        prev.kind = 2;
        prev.rle_sym = last;
        return 1;
    }
    uint32_t total = (uint32_t)seqs.size();
    int al = optimal_al(total, last, max_al);
    std::vector<int> norm;
    // fractional expected-bits pricing (al - log2(p)): the integer
    // per-symbol upper bound (al - highbit(p)) is too coarse to separate
    // close candidates — with it, Repeat_Mode picks cost MORE actual
    // bitstream than the saved description bytes (measured +103 bits vs
    // -45 desc on the source corpus)
    auto table_bits = [&](const std::vector<int>& counts, int tal) -> double {
        double bits = 0;
        for (int c = 0; c <= last; c++) {
            if (!hist[c]) continue;
            if (c >= (int)counts.size() || counts[c] == 0) return 1e30;
            int p = counts[c] == -1 ? 1 : counts[c];
            bits += hist[c] * (tal - __builtin_log2((double)p));
        }
        return bits;
    };
    static thread_local std::vector<int> defv;
    defv.assign(def_dist, def_dist + def_n);
    double c_pre = table_bits(defv, def_al) / 8;
    double c_rep = prev.kind == 3 ? table_bits(prev.norm, prev.al) / 8 : 1e30;
    double c_cus = 1e30;
    std::vector<uint8_t> d2;
    if (normalize_counts(hist, last + 1, al, total, norm) && write_ncount(norm, al, d2))
        c_cus = table_bits(norm, al) / 8 + d2.size();
    desc.clear();
    if (c_rep <= c_cus && c_rep < c_pre) return 3;  // prev unchanged
    if (c_cus < c_pre && custom.init(norm, al)) {
        desc = std::move(d2);
        prev.kind = 3;
        prev.norm = std::move(norm);
        prev.al = al;
        prev.enc = custom;
        return 2;
    }
    prev.kind = 1;  // decoder's previous table becomes the predefined one
    return 0;
}

struct EncCtx {
    uint64_t rep[3] = {1, 4, 8};
    std::vector<int32_t> htab;    // 4-byte hash -> last pos
    std::vector<int32_t> htab8;   // 8-byte hash -> last pos (dfast-style)
    int h8_bits = 17;
    std::vector<int32_t> chain;   // pos -> previous pos with same hash
    size_t chain_mask = 0xFFFF;   // 64K ring; full table at high levels
};

static inline uint32_t zhash(uint32_t v, int bits) { return (v * 2654435761u) >> (32 - bits); }
static inline uint32_t zhash8(uint64_t v, int bits) {
    return (uint32_t)((v * 0x9E3779B185EBCA87ULL) >> (64 - bits));
}

// resolve offset -> wire offset value with repeat codes; mirrors decoder rules
static uint32_t offset_value(uint64_t offset, uint32_t ll, uint64_t* rep) {
    if (ll != 0) {
        if (offset == rep[0]) return 1;
        if (offset == rep[1]) { rep[1] = rep[0]; rep[0] = offset; return 2; }
        if (offset == rep[2]) { rep[2] = rep[1]; rep[1] = rep[0]; rep[0] = offset; return 3; }
    } else {
        if (offset == rep[1]) { rep[1] = rep[0]; rep[0] = offset; return 1; }
        if (offset == rep[2]) { rep[2] = rep[1]; rep[1] = rep[0]; rep[0] = offset; return 2; }
        if (offset == rep[0] - 1) { rep[2] = rep[1]; rep[1] = rep[0]; rep[0] = offset; return 3; }
    }
    rep[2] = rep[1]; rep[1] = rep[0]; rep[0] = offset;
    return (uint32_t)(offset + 3);
}

static inline size_t match_len(const uint8_t* a, const uint8_t* b, size_t limit) {
    size_t n = 0;
    while (n + 8 <= limit) {
        uint64_t x = rd64e(a + n) ^ rd64e(b + n);
        if (x) return n + (__builtin_ctzll(x) >> 3);  // first differing byte
        n += 8;
    }
    while (n < limit && a[n] == b[n]) n++;
    return n;
}

// zstd_fast-class matcher for the speed levels: ONE 6-byte-hash table
// probe + a rep0 check per position, lz4-style skip acceleration,
// backward extension, insert-at-match-end.  (The general matcher below
// runs rep triples + a dfast 8-byte probe + chain walks — 3x the work.)
static inline uint32_t zhash6(uint64_t v, int bits) {
    return (uint32_t)(((v << 16) * 0x9E3779B185EBCA87ULL) >> (64 - bits));
}
static inline uint32_t zhash5(uint64_t v, int bits) {
    return (uint32_t)(((v << 24) * 0x9E3779B185EBCA87ULL) >> (64 - bits));
}

static void find_sequences_fast(const uint8_t* base, size_t start, size_t end,
                                EncCtx& ctx, int hash_bits, size_t max_offset,
                                std::vector<Seq>& seqs, size_t& lit_tail) {
    enc_init();
    std::vector<int32_t>& htab = ctx.htab;
    size_t pos = start;
    size_t lit_start = start;
    seqs.clear();
    if (end < 13 || end - start < 13) { lit_tail = end - start; return; }
    size_t mf = end - 8;  // 8-byte reads at pos
    size_t limit = end;
    size_t accel = 1;
    while (pos + 1 < mf) {
        size_t best_len = 0, best_off = 0;
        // rep0 first: cheapest code, and only addressable with ll >= 1
        uint64_t r0 = ctx.rep[0];
        if (pos > lit_start && r0 && r0 <= pos &&
            rd32e(base + pos) == rd32e(base + pos - r0)) {
            best_len = match_len(base + pos, base + pos - r0, limit - pos);
            best_off = r0;
        }
        // dual-position probe (zstd_fast's ip0/ip1 pipeline): two table
        // lookups issue together, halving the effective skip granularity
        uint32_t h0 = zhash6(rd64e(base + pos), hash_bits);
        uint32_t h1 = zhash6(rd64e(base + pos + 1), hash_bits);
        int32_t cand0 = htab[h0];
        htab[h0] = (int32_t)pos;
        if (best_len < 4) {
            int32_t cand = cand0;
            if (cand >= 0 && (size_t)cand < pos && pos - (size_t)cand <= max_offset &&
                rd32e(base + cand) == rd32e(base + pos)) {
                size_t l = match_len(base + pos, base + cand, limit - pos);
                if (l >= 6) {  // mml 6: short fresh matches lose to literals here
                    best_len = l;
                    best_off = pos - (size_t)cand;
                    // extend backwards into pending literals
                    while (pos > lit_start && cand > 0 &&
                           base[pos - 1] == base[cand - 1]) {
                        pos--; cand--; best_len++;
                    }
                }
            }
            if (best_len < 4) {
                int32_t c1 = htab[h1];
                htab[h1] = (int32_t)(pos + 1);
                if (c1 >= 0 && (size_t)c1 < pos + 1 && pos + 1 - (size_t)c1 <= max_offset &&
                    rd32e(base + c1) == rd32e(base + pos + 1)) {
                    size_t l = match_len(base + pos + 1, base + c1, limit - pos - 1);
                    if (l >= 6) {
                        pos += 1;
                        best_len = l;
                        best_off = pos - (size_t)c1;
                        size_t cnd = (size_t)c1;
                        while (pos > lit_start && cnd > 0 &&
                               base[pos - 1] == base[cnd - 1]) {
                            pos--; cnd--; best_len++;
                        }
                    }
                }
            }
        }
        if (best_len >= 4) {
            Seq s;
            s.ll = (uint32_t)(pos - lit_start);
            s.ml = (uint32_t)best_len;
            s.ov = offset_value(best_off, s.ll, ctx.rep);
            seqs.push_back(s);
            pos += best_len;
            lit_start = pos;
            if (pos + 8 <= end && pos >= 2)
                htab[zhash6(rd64e(base + pos - 2), hash_bits)] = (int32_t)(pos - 2);
            accel = 1;
            continue;
        }
        pos += 2 + (accel++ >> 6);
    }
    lit_tail = end - lit_start;
}

// dfast-style greedy matcher for the default levels 2-3 (role: libzstd's
// ZSTD_compressBlock_doubleFast behind lib/zpack_write.c:179): two plain
// hash tables (8-byte long + 4-byte short), NO chain array — 2 random
// table accesses per probe position instead of ~6 (the chain walk was
// memory-bound; this measured ~1.4x on find across mixed/text/records
// while every per-level ratio pin still holds).
static void find_sequences_dfast(const uint8_t* base, size_t start, size_t end,
                                 size_t src_total, EncCtx& ctx, int hash_bits,
                                 bool lazy, size_t max_offset,
                                 std::vector<Seq>& seqs, size_t& lit_tail,
                                 int lit_bits) {
    enc_init();
    std::vector<int32_t>& htab = ctx.htab;
    size_t pos = start;
    size_t lit_start = start;
    seqs.clear();
    if (end < 4 || src_total < 13) { lit_tail = end - start; return; }
    size_t mf = end >= 4 ? end - 4 : 0;
    int32_t* h4t = htab.data();
    int32_t* h8t = ctx.htab8.data();
    const int h8b = ctx.h8_bits;
    // Priority-take loop (libzstd doubleFast's shape): rep first, then the
    // long (8-byte) probe, then the short — the FIRST hit is taken, so the
    // common path runs one match_len instead of up to three best-of
    // candidates.  Acceleration = (literal run >> 8) + 1, the smooth
    // doubleFast step that makes incompressible runs cheap.
    // Software pipeline over probe positions (libzstd doubleFast's
    // ip0/ip1 shape, VERDICT r4 item 7): the successor position's hashes
    // are computed and its two table slots LOADED right after the current
    // position's table writes, so those random loads are in flight while
    // the current position runs its rep probe and match_len calls.
    // Decisions are untouched (loads are issued after the writes they
    // must observe), so every ratio pin holds by construction; the
    // pipeline restarts at matches and the +1-skip paths.
    bool pipe = false;
    uint32_t p_h8 = 0, p_h4 = 0;
    int32_t p_c8 = -1, p_c4 = -1;
    while (pos < mf) {
        size_t best_len = 0, best_off = 0;
        bool best_is_rep = false;
        uint32_t ll_now = (uint32_t)(pos - lit_start);
        bool have8 = pos + 8 <= end;
        uint32_t h8 = 0, h;
        int32_t c8 = -1, cand;
        if (pipe) {
            h8 = p_h8; h = p_h4; c8 = p_c8; cand = p_c4;
        } else {
            if (have8) {
                h8 = zhash8(rd64e(base + pos), h8b);
                c8 = h8t[h8];
            }
            // 5-byte short hash (libzstd's L3 minMatch=5): 4-byte
            // candidates on text are mostly "the "-class false positives
            // whose match_len calls dominate find time; 5-byte keys cut
            // them ~3x
            h = have8 ? zhash5(rd64e(base + pos), hash_bits)
                      : zhash(rd32e(base + pos), hash_bits);
            cand = h4t[h];
        }
        if (have8) h8t[h8] = (int32_t)pos;
        h4t[h] = (int32_t)pos;
        // issue the successor's loads NOW (after this position's writes)
        size_t npos = pos + (ll_now >> 8) + 1;
        pipe = false;
        uint32_t nh8 = 0, nh4 = 0;
        int32_t nc8 = -1, nc4 = -1;
        bool np_ok = npos < mf;
        if (np_ok) {
            bool nhave8 = npos + 8 <= end;
            if (nhave8) {
                nh8 = zhash8(rd64e(base + npos), h8b);
                nc8 = h8t[nh8];
            }
            nh4 = nhave8 ? zhash5(rd64e(base + npos), hash_bits)
                         : zhash(rd32e(base + npos), hash_bits);
            nc4 = h4t[nh4];
        }
        {   // rep0 probe (the addressable first repeat for the current ll)
            uint64_t off = ll_now ? ctx.rep[0] : ctx.rep[1];
            if (off && off <= pos &&
                rd32e(base + pos) == rd32e(base + pos - off)) {
                size_t l = match_len(base + pos, base + pos - off, end - pos);
                if (l >= 4) { best_len = l; best_off = off; best_is_rep = true; }
            }
        }
        if (have8) {
            if (!best_is_rep && c8 >= 0 && (size_t)c8 < pos &&
                pos - (size_t)c8 <= max_offset &&
                rd64e(base + c8) == rd64e(base + pos)) {
                best_len = match_len(base + pos, base + c8, end - pos);
                best_off = pos - c8;
            }
        }
        if (best_len < 8 && cand >= 0 && (size_t)cand < pos &&
            pos - (size_t)cand <= max_offset &&
            rd32e(base + cand) == rd32e(base + pos)) {
            size_t l = match_len(base + pos, base + cand, end - pos);
            if (l > best_len + (best_is_rep ? 1 : 0)) {
                best_len = l; best_off = pos - cand; best_is_rep = false;
            }
        }
        // entropy-aware acceptance (same rule as the chain matcher)
        if (best_len >= 4 && !best_is_rep &&
            (long long)best_len * lit_bits <= (long long)highbit32((uint32_t)best_off) + 9) {
            best_len = 0;
        }
        if (best_len >= 4) {
            if (best_off != ctx.rep[0] && pos + 1 < mf) {
                uint64_t r0 = ctx.rep[0];
                if (r0 && r0 <= pos + 1 &&
                    rd32e(base + pos + 1) == rd32e(base + pos + 1 - r0)) {
                    size_t l1 = match_len(base + pos + 1, base + pos + 1 - r0, end - pos - 1);
                    if (l1 >= 4 && l1 + 1 >= best_len) { pos += 1; continue; }
                }
            }
            if (lazy && !best_is_rep && pos + 9 <= end && pos + 1 < mf) {
                uint32_t h2 = zhash5(rd64e(base + pos + 1), hash_bits);
                int32_t c2 = h4t[h2];
                if (c2 >= 0 && pos + 1 - (size_t)c2 <= max_offset &&
                    rd32e(base + c2) == rd32e(base + pos + 1)) {
                    size_t l2 = match_len(base + pos + 1, base + c2, end - pos - 1);
                    if (l2 > best_len + 2) { pos += 1; continue; }
                }
            }
            Seq s;
            s.ll = (uint32_t)(pos - lit_start);
            s.ml = (uint32_t)best_len;
            s.ov = offset_value(best_off, s.ll, ctx.rep);
            seqs.push_back(s);
            size_t mend = pos + best_len;
            // sparse in-match insertion: ~4 anchors per match, stride >= 2
            // (stride-1 on short matches cost ~6 random table writes per
            // match on ELF code for ~0 ratio; two-anchor-only lost 1.2%
            // size on text — this is the measured sweet spot)
            size_t step = best_len / 4 > 2 ? best_len / 4 : 2;
            for (size_t q = pos + 1; q < mend && q < mf; q += step) {
                if (q + 8 <= end) {
                    h4t[zhash5(rd64e(base + q), hash_bits)] = (int32_t)q;
                    h8t[zhash8(rd64e(base + q), h8b)] = (int32_t)q;
                } else {
                    h4t[zhash(rd32e(base + q), hash_bits)] = (int32_t)q;
                }
            }
            pos = mend;
            lit_start = pos;
        } else {
            pos = npos;
            if (np_ok) {
                pipe = true;
                p_h8 = nh8; p_h4 = nh4; p_c8 = nc8; p_c4 = nc4;
            }
        }
    }
    lit_tail = end - lit_start;
}

// greedy matcher over [start, end) of base; sequences relative to block
static void find_sequences(const uint8_t* base, size_t start, size_t end, size_t src_total,
                           EncCtx& ctx, int hash_bits, int chain_depth, bool lazy,
                           size_t max_offset, std::vector<Seq>& seqs, size_t& lit_tail,
                           size_t rep_margin, int lit_bits) {
    enc_init();
    std::vector<int32_t>& htab = ctx.htab;
    std::vector<int32_t>& chain = ctx.chain;
    size_t pos = start;
    size_t lit_start = start;
    size_t accel = 1;  // lz4-style step acceleration over incompressible runs
    seqs.clear();
    if (end < 4 || src_total < 13) { lit_tail = end - start; return; }
    size_t mf = end >= 4 ? end - 4 : 0;
    while (pos < mf) {
        size_t best_len = 0, best_off = 0;
        bool best_is_rep = false;
        // repeat-offset probes at pos (and the "+1 literal" variant below)
        uint32_t ll_now = (uint32_t)(pos - lit_start);
        for (int r = 0; r < 3; r++) {
            uint64_t off = ll_now ? ctx.rep[r]
                                  : (r == 0 ? ctx.rep[1] : r == 1 ? ctx.rep[2] : ctx.rep[0] - 1);
            if (!off || off > pos) continue;
            if (rd32e(base + pos) != rd32e(base + pos - off)) continue;  // cheap filter
            size_t l = match_len(base + pos, base + pos - off, end - pos);
            if (l >= 4 && l > best_len + 1) { best_len = l; best_off = off; best_is_rep = true; }
        }
        // long-hash probe first (8-byte hash: rare collisions, catches
        // far exact repeats the 4-byte chains drown in — dfast-style)
        if (pos + 8 <= end) {
            uint32_t h8 = zhash8(rd64e(base + pos), ctx.h8_bits);
            int32_t c8 = ctx.htab8[h8];
            ctx.htab8[h8] = (int32_t)pos;
            if (c8 >= 0 && (size_t)c8 < pos && pos - (size_t)c8 <= max_offset &&
                rd64e(base + c8) == rd64e(base + pos)) {
                size_t l = match_len(base + pos, base + c8, end - pos);
                if (l > best_len + (best_is_rep ? rep_margin : 0)) {
                    best_len = l; best_off = pos - c8; best_is_rep = false;
                }
            }
        }
        // hash-chain probe
        uint32_t h = zhash(rd32e(base + pos), hash_bits);
        int32_t cand = htab[h];
        size_t cmask = ctx.chain_mask;
        chain[pos & cmask] = cand;
        htab[h] = (int32_t)pos;
        int depth = chain_depth;
        while (cand >= 0 && depth-- > 0 && pos - (size_t)cand <= max_offset) {
            if ((size_t)cand < pos && rd32e(base + cand) == rd32e(base + pos)) {
                size_t l = match_len(base + pos, base + cand, end - pos);
                if (l > best_len + (best_is_rep ? rep_margin : 0)) {
                    best_len = l; best_off = pos - cand; best_is_rep = false;
                }
            }
            int32_t nxt = chain[cand & cmask];
            if (nxt >= cand) break;
            cand = nxt;
        }
        // entropy-aware acceptance: a fresh match must beat re-encoding
        // its bytes as literals (~lit_bits each); reps are nearly free
        if (best_len >= 4 && !best_is_rep &&
            (long long)best_len * lit_bits <= (long long)highbit32((uint32_t)best_off) + 9) {
            best_len = 0;
        }
        if (best_len >= 4) {
            accel = 1;
            // rep probe at pos+1 (ll >= 1 there, so rep0 becomes usable):
            // a repeat-offset match costs ~2 bits vs 10+ for a fresh offset,
            // so prefer it unless the current match is clearly longer
            if (best_off != ctx.rep[0] && pos + 1 < mf) {
                uint64_t r0 = ctx.rep[0];
                if (r0 && r0 <= pos + 1 &&
                    rd32e(base + pos + 1) == rd32e(base + pos + 1 - r0)) {
                    size_t l1 = match_len(base + pos + 1, base + pos + 1 - r0, end - pos - 1);
                    if (l1 >= 4 && l1 + 1 >= best_len) { pos += 1; continue; }
                }
            }
            if (lazy && !best_is_rep && pos + 1 < mf) {
                // 1-step lazy: peek whether pos+1 has a longer hash match
                uint32_t h2 = zhash(rd32e(base + pos + 1), hash_bits);
                int32_t c2 = htab[h2];
                if (c2 >= 0 && pos + 1 - (size_t)c2 <= max_offset &&
                    rd32e(base + c2) == rd32e(base + pos + 1)) {
                    size_t l2 = match_len(base + pos + 1, base + c2, end - pos - 1);
                    if (l2 > best_len + 2) { pos += 1; continue; }
                }
            }
            Seq s;
            s.ll = (uint32_t)(pos - lit_start);
            s.ml = (uint32_t)best_len;
            s.ov = offset_value(best_off, s.ll, ctx.rep);
            seqs.push_back(s);
            // insert hashes inside the match (sparsely)
            size_t mend = pos + best_len;
            size_t ins_step = chain_depth >= 64 ? 1 : 2;
            for (size_t q = pos + 1; q < mend && q < mf; q += ins_step) {
                uint32_t hq = zhash(rd32e(base + q), hash_bits);
                chain[q & cmask] = htab[hq];
                htab[hq] = (int32_t)q;
                if (q + 8 <= end) ctx.htab8[zhash8(rd64e(base + q), ctx.h8_bits)] = (int32_t)q;
            }
            pos = mend;
            lit_start = pos;
        } else {
            pos += 1 + (accel >> 6);
            accel++;
        }
    }
    lit_tail = end - lit_start;
}


// Dominant-stride detection: fixed-record data (tables, logs, telemetry)
// compresses best when every sequence uses ONE offset — the record stride —
// so all three FSE code streams have near-zero entropy.  A static-price DP
// cannot coordinate on that global pattern (measured: libzstd's converged
// parse on stride-32 records is 25% smaller than our DP's local optimum),
// so we detect the stride by sampled autocorrelation and run a dedicated
// offset-locked greedy as one more tournament strategy.
static size_t detect_stride(const uint8_t* p, size_t n) {
    if (n < 4096) return 0;
    const size_t MAXS = 2048;
    static thread_local uint32_t score[2048 + 1];
    memset(score, 0, sizeof(uint32_t) * (MAXS + 1));
    size_t samples = 2048;
    size_t step = (n - MAXS - 4) / samples;
    if (!step) step = 1;
    uint32_t total = 0;
    for (size_t q = MAXS; q + 4 <= n; q += step) {
        uint32_t v = rd32e(p + q);
        // fine linear band for small strides (typical record sizes)…
        for (size_t s = 4; s <= 80; s++)
            if (rd32e(p + q - s) == v) score[s]++;
        // …plus powers of two above it
        for (size_t s = 128; s <= MAXS; s <<= 1)
            if (rd32e(p + q - s) == v) score[s]++;
        total++;
    }
    size_t best = 0;
    uint32_t best_score = 0;
    for (size_t s = 4; s <= MAXS; s++)
        if (score[s] > best_score) { best_score = score[s]; best = s; }
    // require a strong signal: a quarter of samples repeat at the stride
    if (best_score * 4 < total) return 0;
    return best;
}

// Offset-locked greedy: match ONLY at `stride` (3-byte min once the stride
// is the active rep0), everything else literals.
static void find_sequences_stride(const uint8_t* base, size_t start, size_t end,
                                  size_t stride, EncCtx& ctx,
                                  std::vector<Seq>& seqs, size_t& lit_tail) {
    size_t pos = start;
    size_t lit_start = start;
    seqs.clear();
    if (end < start + 16) { lit_tail = end - start; return; }
    size_t mf = end - 4;
    while (pos < mf) {
        if (pos >= stride) {
            uint32_t a = rd32e(base + pos);
            uint32_t b = rd32e(base + pos - stride);
            bool is_rep = ctx.rep[0] == stride && pos > lit_start;
            // 3-byte matches only pay as rep codes; fresh needs 6+
            size_t lmin = is_rep ? 3 : 6;
            if (!((a ^ b) & 0xFFFFFF)) {
                size_t l = match_len(base + pos, base + pos - stride, end - pos);
                if (l >= lmin) {
                    Seq s;
                    s.ll = (uint32_t)(pos - lit_start);
                    s.ml = (uint32_t)l;
                    s.ov = offset_value(stride, s.ll, ctx.rep);
                    seqs.push_back(s);
                    pos += l;
                    lit_start = pos;
                    continue;
                }
            }
        }
        pos++;
    }
    lit_tail = end - lit_start;
}

// ---------------------------------------------------------------------------
// optimal parse (btopt-style): DP with per-cell repeat-offset state and
// statistics-driven bit prices (derived from a first greedy pass)
// ---------------------------------------------------------------------------

struct OptPrices {
    uint16_t lit8[256];       // literal bits, 8x fixed point
    uint16_t llc8[36];
    uint16_t mlc8[53];
    uint16_t ofc8[32];
};

static inline uint16_t bits8_from_freq(uint32_t c, uint32_t total) {
    // -log2((c+1)/(total+alphabet)) approximated via highbit, 8x fixed point
    if (!total) return 8 * 8;
    double p = (double)(c + 1) / (double)(total + 64);
    double bits = -1.4426950408889634 * __builtin_log(p);
    if (bits < 0.05) bits = 0.05;
    if (bits > 20) bits = 20;
    return (uint16_t)(bits * 8);
}

static void build_opt_prices(const uint8_t* block, size_t bsize,
                             const std::vector<Seq>& seqs, OptPrices& P) {
    // literal histogram over the bytes the parse actually leaves as literals
    uint32_t lh[256] = {0};
    uint32_t ltot = 0;
    size_t lpos = 0;
    for (const Seq& q : seqs) {
        for (uint32_t k = 0; k < q.ll; k++) lh[block[lpos + k]]++;
        ltot += q.ll;
        lpos += q.ll + q.ml;
    }
    for (size_t k = lpos; k < bsize; k++) lh[block[k]]++;  // tail literals
    ltot += (uint32_t)(bsize - lpos);
    for (int s = 0; s < 256; s++) P.lit8[s] = bits8_from_freq(lh[s], ltot);
    uint32_t llh[36] = {0}, mlh[53] = {0}, ofh[32] = {0};
    for (const Seq& q : seqs) {
        llh[ll_code(q.ll)]++;
        mlh[ml_code(q.ml)]++;
        ofh[highbit32(q.ov)]++;
    }
    uint32_t tot = (uint32_t)seqs.size();
    // Cap every code price at its predefined-table price (+1 bit slack):
    // the encoder can always fall back to predef mode, so no code ever
    // truly costs more.  Without the cap, codes unused by the seed parse
    // price at 13+ bits and the DP can never explore them (e.g. the fresh
    // mid-range offset that bootstraps a record-stride rep chain).
    auto pre8 = [](int count, int al) -> uint16_t {
        if (count <= 0) return (uint16_t)(al * 8 + 8);
        return (uint16_t)((al - highbit32((uint32_t)count)) * 8);
    };
    for (int c = 0; c < 36; c++) {
        uint16_t cap = pre8(LL_DEF[c], 6) + 8;
        uint16_t m = bits8_from_freq(llh[c], tot);
        P.llc8[c] = m < cap ? m : cap;
    }
    for (int c = 0; c < 53; c++) {
        uint16_t cap = pre8(ML_DEF[c], 6) + 8;
        uint16_t m = bits8_from_freq(mlh[c], tot);
        P.mlc8[c] = m < cap ? m : cap;
    }
    for (int c = 0; c < 32; c++) {
        uint16_t cap = pre8(c < 29 ? OF_DEF[c] : 1, 5) + 8;
        uint16_t m = bits8_from_freq(ofh[c], tot);
        P.ofc8[c] = m < cap ? m : cap;
    }
}

struct OCell {
    uint32_t price;
    uint32_t len;     // 0 = literal step
    uint32_t off;
    uint32_t rep0, rep1, rep2;
    uint32_t litlen;  // pending literal-run length at this cell
};

// persistent binary-tree matchfinder state (absolute positions over the
// whole input, so matches cross block boundaries like the greedy passes)
struct OptState {
    std::vector<int32_t> bt_hash;  // 1<<H4B roots
    std::vector<int32_t> bt;       // 2 children per absolute position
    std::vector<int32_t> h3;       // last position per 3-byte hash (mml=3)
    // long-distance-match table (role: libzstd's LDM / --long): 2-way
    // buckets of (check32, pos) per 32-byte-window hash, inserted every
    // 8th position INCLUDING spans the sufficient-len shortcut skips — far
    // re-occurrences of skipped chunks stay discoverable without
    // perturbing the BT (sparse BT inserts measured a ratio LOSS there).
    // Slot 0 holds the most recent insert; slot 1 an "aged anchor": a
    // displaced slot-0 entry is promoted there only when it is >=1 MiB
    // older than its replacement, so multi-MB-distant candidates survive
    // the recency churn that evicted them from the direct-mapped table
    // (survival ~exp(-D/8MiB) meant only ~29% of 10-MiB-distant entries
    // lived to be queried; measured longrange-16MiB ratio 1.032 vs lib)
    std::vector<uint64_t> ldm;     // (check << 32) | (pos + 1), 2/bucket
    void init(size_t n_total) {
        bt_hash.assign(1u << 22, -1);
        bt.assign(2 * n_total + 2, -1);
        h3.assign(1u << 16, -1);
        // LDM buckets scale with content (~4 positions per bucket at the
        // stride-4 insert rate): small archive blocks stop paying a fixed
        // 32 MiB table, 16 MiB+ inputs get less eviction churn
        size_t lb = 16;
        while ((4ull << lb) < n_total && lb < 23) lb++;
        ldm.assign(2ull << lb, 0);
    }
};

// 2-way bucket insert: slot 0 = newest; displaced entries >=1 MiB older
// than their replacement are promoted to slot 1 (the long-lived anchor)
static inline void ldm_insert(std::vector<uint64_t>& ldm, uint64_t h, size_t pos) {
    size_t b = ((uint32_t)h & (ldm.size() / 2 - 1)) * 2;
    uint64_t old0 = ldm[b];
    ldm[b] = ((h >> 32) << 32) | (uint64_t)(pos + 1);
    if (old0 && (size_t)(uint32_t)old0 - 1 + (1u << 20) <= pos) ldm[b + 1] = old0;
}

static inline uint64_t ldm_hash32(const uint8_t* p) {
    // mix of four 8-byte lanes of the 32-byte window
    uint64_t h = rd64e(p) * 0x9E3779B185EBCA87ull;
    h ^= rd64e(p + 8) * 0xC2B2AE3D27D4EB4Full;
    h ^= rd64e(p + 16) * 0x165667B19E3779F9ull;
    h ^= rd64e(p + 24) * 0x27D4EB2F165667C5ull;
    h ^= h >> 29;
    h *= 0xBF58476D1CE4E5B9ull;
    return h ^ (h >> 32);
}

struct OptCand { uint32_t off; uint32_t len; };

// Per-block candidate cache: lets a second (price-iteration) DP pass reuse
// the BT walk results — re-inserting the same positions would corrupt the
// persistent tree.
struct CandCache {
    std::vector<uint32_t> idx;   // n+1 prefix offsets into flat
    std::vector<OptCand> flat;
    bool filled = false;
};

static void find_sequences_opt(const uint8_t* base, size_t blk_start, size_t blk_end,
                               size_t n_total, size_t max_offset, OptState& ost,
                               EncCtx& ctx, const OptPrices& P,
                               std::vector<Seq>& seqs, size_t& lit_tail,
                               CandCache& cache) {
    size_t n = blk_end - blk_start;
    seqs.clear();
    if (n < 16) { lit_tail = n; return; }
    const uint32_t INF = 0xFFFFFFFFu;
    static thread_local std::vector<OCell> cells;
    cells.assign(n + 1, OCell{INF, 0, 0, 0, 0, 0, 0});
    cells[0] = OCell{0, 0, 0, (uint32_t)ctx.rep[0], (uint32_t)ctx.rep[1], (uint32_t)ctx.rep[2], 0};
    size_t mf = n >= 4 ? n - 4 : 0;

    const int H4B = 22;
    const int BT_DEPTH = 256;
    const size_t SUFFICIENT = 1024;

    auto ml_price = [&](uint32_t l) -> uint32_t {
        int c = ml_code(l);
        return P.mlc8[c] + ML_EXTRA[c] * 8;
    };

    static thread_local std::vector<OptCand> cands;
    std::vector<int32_t>& bt_hash = ost.bt_hash;
    std::vector<int32_t>& bt = ost.bt;
    // per-block compare budget: degenerate (hugely repetitive) data would
    // otherwise drive multi-MB prefix extensions per node; when exhausted
    // the BT degrades to insert-only and the greedy strategies win the block
    long long block_budget = 128ll << 20;

    // insert absolute position p into the BT; collect (off, capped len)
    // improvements as DP candidates for the current block
    auto bt_insert_search = [&](size_t p, bool collect) {
        cands.clear();
        if (p + 4 > n_total) return;
        uint32_t h4 = (rd32e(base + p) * 2654435761u) >> (32 - H4B);
        int32_t cur = bt_hash[h4];
        bt_hash[h4] = (int32_t)p;
        int32_t* smaller = &bt[2 * p];
        int32_t* larger = &bt[2 * p + 1];
        size_t len0 = 0, len1 = 0;
        size_t bestl = 3;
        size_t cap = blk_end - p;  // matches must end within the block
        int d = block_budget > 0 ? BT_DEPTH : 2;
        long long byte_budget = 1 << 16;  // bounds walks on degenerate data
        while (cur >= 0 && d-- > 0 && byte_budget > 0) {
            // window eviction (libzstd's windowLow break): an out-of-window
            // node can never be a candidate, and extending a match against
            // it burns the walk's byte budget — a >window exact duplicate
            // (e.g. a 256 KiB chunk repeated 9 MiB later) ate the whole
            // budget in one extension and starved the DP of near candidates
            // (repeat blocks cost 23 KB vs 19 KB fresh; +12 KB per missed
            // region on the 16 MiB longrange corpus).  Dropping its subtree
            // progressively evicts stale positions exactly like libzstd.
            if (p - (size_t)cur > max_offset) break;
            size_t len = len0 < len1 ? len0 : len1;
            size_t lim = n_total - p;
            size_t clim = n_total - (size_t)cur;
            size_t mx = lim < clim ? lim : clim;
            size_t len_in = len;
            len += match_len(base + cur + len, base + p + len, mx - len);
            byte_budget -= (long long)(len - len_in) + 8;
            block_budget -= (long long)(len - len_in) + 8;
            size_t clen = len < cap ? len : cap;
            if (collect && clen > bestl && p - (size_t)cur <= max_offset) {
                bestl = clen;
                cands.push_back({(uint32_t)(p - (size_t)cur), (uint32_t)clen});
                if (clen >= 1024) { d = 0; }  // long enough; stop searching
            }
            if (len >= mx) break;  // one suffix prefixes the other
            if (base[cur + len] < base[p + len]) {
                *smaller = cur;
                smaller = &bt[2 * cur + 1];
                cur = *smaller;
                len0 = len;
            } else {
                *larger = cur;
                larger = &bt[2 * cur];
                cur = *larger;
                len1 = len;
            }
        }
        *smaller = -1;
        *larger = -1;
    };

    if (!cache.filled) {
        cache.idx.assign(1, 0);
        cache.flat.clear();
    }
    struct RepScan { size_t off, start, end; };
    RepScan rep_scan[3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
    int rep_scan_i = 0;
    for (size_t i = 0; i < n; i++) {
        const OCell cur = cells[i];
        size_t pos = blk_start + i;
        bool reachable = cur.price != INF;
        if (!cache.filled) {
            bt_insert_search(pos, i < mf);
            // mml=3: one hash3 candidate (the most recent same-3-bytes
            // position, libzstd's insertAndFindFirstIndexHash3 role) —
            // pricing decides whether a 3-byte match ever wins
            if (pos + 3 <= n_total) {
                uint32_t h = ((rd32e(base + pos) & 0xFFFFFF) * 506832829u) >> 16;
                int32_t prev3 = ost.h3[h];
                ost.h3[h] = (int32_t)pos;
                if (i < mf && prev3 >= 0 && pos - (size_t)prev3 <= max_offset &&
                    ((rd32e(base + prev3) ^ rd32e(base + pos)) & 0xFFFFFF) == 0) {
                    size_t cap3 = blk_end - pos;
                    size_t L3 = match_len(base + prev3, base + pos,
                                          cap3 < 4096 ? cap3 : 4096);
                    if (L3 < 3) L3 = 3;
                    cands.push_back({(uint32_t)(pos - (size_t)prev3),
                                     (uint32_t)(L3 < cap3 ? L3 : cap3)});
                }
            }
            // long-distance candidate: query/insert the 32-byte-window LDM
            // table; only candidates the BT couldn't see matter, so accept
            // far hits with a verified long match
            if (pos + 32 <= n_total) {
                uint64_t h = ldm_hash32(base + pos);
                size_t b = ((uint32_t)h & (ost.ldm.size() / 2 - 1)) * 2;
                uint64_t slots[2] = {ost.ldm[b], ost.ldm[b + 1]};
                if ((pos & 3) == 0) ldm_insert(ost.ldm, h, pos);
                for (int sI = 0; sI < 2 && i < mf; sI++) {
                    uint64_t slot = slots[sI];
                    if (!slot || (slot >> 32) != (h >> 32)) continue;
                    if (sI == 1 && slots[0] == slots[1]) continue;
                    size_t cand = (size_t)(uint32_t)slot - 1;
                    size_t off = pos - cand;
                    if (cand < pos && off <= max_offset &&
                        rd64e(base + cand) == rd64e(base + pos)) {
                        size_t capL = blk_end - pos;
                        size_t L = match_len(base + cand, base + pos, capL);
                        if (L >= 32)
                            cands.push_back({(uint32_t)off, (uint32_t)L});
                    }
                }
            }
            cache.flat.insert(cache.flat.end(), cands.begin(), cands.end());
            cache.idx.push_back((uint32_t)cache.flat.size());
        } else {
            cands.assign(cache.flat.begin() + cache.idx[i],
                         cache.flat.begin() + cache.idx[i + 1]);
        }
        if (!reachable) continue;
        // literal step (reps inherited, pending run grows)
        {
            // +9/8ths bit flat literal bias: the entropy estimate
            // underprices real literal cost (huffman quantization +
            // section overheads); r5 sweep: 9 edges 8/10/11/12 on source
            // (source-code L19 1.0082 -> 1.0025 vs libzstd with 16 iters)
            uint32_t p = cur.price + P.lit8[base[pos]] + 9;
            if (p < cells[i + 1].price)
                cells[i + 1] = OCell{p, 0, 0, cur.rep0, cur.rep1, cur.rep2,
                                     cur.litlen + 1};
        }
        if (i >= mf) continue;

        // the pending literal run's LL code + extra bits are paid when a
        // match closes the run (mirrors ZSTD_updatePrice's litlen pricing)
        int llc = ll_code(cur.litlen);
        uint32_t ll_price = P.llc8[llc] + LL_EXTRA[llc] * 8;

        auto relax_match = [&](size_t off, size_t L, uint32_t rep_ov) {
            // 3-byte matches (ML code 0) are legal for any offset (L19 uses
            // minMatch 3); the price model decides when they amortize —
            // only repeats (~3 bits) and very short fresh offsets ever do
            uint32_t lmin = 3;
            if (L < lmin) return;
            // offset price: rep_ov in 1..3 when `off` is addressable as a
            // repeat code from this cell (depends on litlen), else fresh
            uint32_t ofp;
            if (rep_ov) {
                // optimistic floor for rep0 only: seed stats are rep-poor
                // when the greedy pass avoided reps, trapping the DP in a
                // rep-poor fixed point (reps also make FUTURE reps cheap —
                // a dynamic static prices can't see).  rep2/rep3 stay at
                // measured prices: cheap floors there make the DP shred
                // data into mixed-slot mini-matches, destroying the code
                // uniformity that makes rep chains nearly free in FSE.
                int oc = highbit32(rep_ov);
                uint32_t measured = P.ofc8[oc] + oc * 8;
                uint32_t floor_p = 20 + oc * 8;
                ofp = measured < floor_p ? measured : floor_p;
            } else {
                uint32_t ov = (uint32_t)(off + 3);
                int oc = highbit32(ov);
                ofp = P.ofc8[oc] + oc * 8;
            }
            uint32_t base_p = cur.price + ofp + ll_price;
            // updated rep triple: off moves to front, prior reps shift with
            // off removed if present (mirrors offset_value / decoder rules)
            uint32_t r0 = (uint32_t)off, r1, r2;
            if (off == cur.rep0) { r1 = cur.rep1; r2 = cur.rep2; }
            else if (off == cur.rep1) { r1 = cur.rep0; r2 = cur.rep2; }
            else { r1 = cur.rep0; r2 = cur.rep1; }
            auto relax_one = [&](uint32_t l) {
                uint32_t mlp;
                if (rep_ov) {
                    // optimistic floor (4.5 bits) on rep-match length codes:
                    // unseen codes (e.g. ml=3, unreachable for the greedy
                    // seed pass) would otherwise price at 13+ bits and the
                    // DP could never discover rep-chain parses.  Safe: the
                    // final strategy selection compares real encoded sizes.
                    int c = ml_code(l);
                    uint32_t m = P.mlc8[c];
                    mlp = (m < 36 ? m : 36) + ML_EXTRA[c] * 8;
                } else {
                    mlp = ml_price(l);
                }
                uint32_t p = base_p + mlp;
                OCell& dst = cells[i + l];
                if (p < dst.price) dst = OCell{p, l, (uint32_t)off, r0, r1, r2, 0};
            };
            // dense through the single-length ML codes + the first ranged
            // ones; above that only code boundaries change the price, and a
            // longer length at equal price never hurts the following cells
            uint32_t dense = (uint32_t)(L < 130 ? L : 130);
            for (uint32_t l = lmin; l <= dense; l++) relax_one(l);
            if (L > 130) {
                for (int c = 43; c < 53 && ML_BASE[c] <= L; c++)
                    relax_one(ML_BASE[c] <= L ? (uint32_t)ML_BASE[c] : (uint32_t)L);
                relax_one((uint32_t)L);
            }
        };

        // repeat candidates: the addressable set depends on whether a
        // literal run is pending (ll==0 shifts codes to rep1/rep2/rep0-1)
        size_t longest = 0;
        uint64_t avail[3];
        if (cur.litlen) {
            avail[0] = cur.rep0; avail[1] = cur.rep1; avail[2] = cur.rep2;
        } else {
            avail[0] = cur.rep1; avail[1] = cur.rep2;
            avail[2] = cur.rep0 ? cur.rep0 - 1 : 0;
        }
        for (int r = 0; r < 3; r++) {
            size_t off = avail[r];
            if (!off || off > pos) continue;
            // 3-byte agreement suffices for rep matches (ML code 0)
            if ((rd32e(base + pos) ^ rd32e(base + pos - off)) & 0xFFFFFF) continue;
            // incremental scan cache: a prior scan at start<=pos with this
            // offset verified [start, rc_end) matches [start-off, ...), so
            // the length here is exactly rc_end - pos (rc_end is either a
            // real mismatch or blk_end; both stay valid as pos advances).
            // Exact, not heuristic — without it, rep-chain data (fixed
            // stride records) rescans ~block_size bytes per DP cell and the
            // block goes quadratic (measured 4x time per 2x input).
            size_t L = 0;
            for (int k = 0; k < 3; k++)
                if (rep_scan[k].off == off && rep_scan[k].start <= pos &&
                    pos < rep_scan[k].end) {
                    L = rep_scan[k].end - pos;
                    break;
                }
            if (!L) {
                L = match_len(base + pos, base + pos - off, blk_end - pos);
                rep_scan[rep_scan_i] = {off, pos, pos + L};
                rep_scan_i = (rep_scan_i + 1) % 3;
            }
            if (L < 3) L = 3;  // first 3 bytes agree even if match_len stopped short
            relax_match(off, L, (uint32_t)(r + 1));
            if (L > longest) longest = L;
        }
        if (longest >= SUFFICIENT) {
            // immediate encoding (btultra2's sufficient_len shortcut): take
            // the long rep greedily and skip the matched region outright —
            // no BT inserts, no per-cell probes.  Without this, rep-chain
            // data (fixed-stride records) pays a BT walk at every one of
            // ~128K cells per block and L19 goes quadratic (measured 400s
            // on 4.8 MiB that libzstd does in 0.06s).  Skipped cells get
            // empty candidate ranges so a second price iteration replays
            // the cache aligned by position.
            size_t stop = i + longest - 1;
            if (stop > n - 1) stop = n - 1;
            // NOTE: sparse BT inserts across the skipped span were tried
            // (every 8th position, budget-exempt) to keep it discoverable
            // for later long-range re-occurrences — measured a ratio LOSS
            // (1.033 -> 1.048 on the 16 MiB long-range corpus): the
            // near-duplicate nodes flood the depth-capped walk and evict
            // diverse candidates.  The LDM table stores (plain array
            // writes, no tree perturbation) do the job instead.
            if (!cache.filled)
                for (size_t q = i + 1; q <= stop; q++) {
                    size_t qp = blk_start + q;
                    if ((qp & 7) == 0 && qp + 32 <= n_total)
                        ldm_insert(ost.ldm, ldm_hash32(base + qp), qp);
                    cache.idx.push_back((uint32_t)cache.flat.size());
                }
            i = stop;
            continue;
        }
        // BT candidates (each improvement along the walk, longest last)
        for (const OptCand& c : cands) {
            relax_match(c.off, c.len, 0);
            if (c.len > longest) longest = c.len;
        }
        (void)pos;
    }
    cache.filled = true;
    // backward reconstruction (cells[n] is always reachable via literals)
    static thread_local std::vector<std::pair<uint32_t, uint32_t>> steps;
    steps.clear();
    size_t i = n;
    while (i > 0) {
        const OCell& c = cells[i];
        if (c.len == 0) { steps.push_back({0, 0}); i -= 1; }
        else { steps.push_back({c.len, c.off}); i -= c.len; }
    }
    size_t lit_run = 0;
    for (auto it = steps.rbegin(); it != steps.rend(); ++it) {
        if (it->first == 0) { lit_run++; continue; }
        Seq s;
        s.ll = (uint32_t)lit_run;
        s.ml = it->first;
        s.ov = offset_value(it->second, s.ll, ctx.rep);
        seqs.push_back(s);
        lit_run = 0;
    }
    lit_tail = lit_run;
}

static bool encode_block_body(const uint8_t* block, size_t bsize,
                              const std::vector<Seq>& seqs, size_t lit_tail,
                              std::vector<uint8_t>& out, EntState& ls) {
    // collect literals
    std::vector<uint8_t> lits;
    lits.reserve(bsize);
    size_t pos = 0;
    for (const Seq& s : seqs) {
        lits.insert(lits.end(), block + pos, block + pos + s.ll);
        pos += s.ll + s.ml;
    }
    lits.insert(lits.end(), block + pos, block + pos + lit_tail);

    encode_literals(lits.data(), lits.size(), out, ls);
    size_t nb = seqs.size();
    if (nb < 128) out.push_back((uint8_t)nb);
    else if (nb < 0x7F00) {
        out.push_back((uint8_t)(128 + (nb >> 8)));
        out.push_back((uint8_t)nb);
    } else {
        size_t v = nb - 0x7F00;
        out.push_back(255);
        out.push_back((uint8_t)v);
        out.push_back((uint8_t)(v >> 8));
    }
    if (!nb) return true;

    FseEnc ll_cus, of_cus, ml_cus;
    std::vector<uint8_t> ll_d, of_d, ml_d;
    int ll_rle = 0, of_rle = 0, ml_rle = 0;
    // mode-3 (repeat) encoding needs the incoming prev tables; pick_mode
    // mutates ls.* to the post-block state, so snapshot the repeat table
    // each kind would reuse BEFORE its pick_mode call
    SeqPrev ll_in = ls.ll, of_in = ls.of, ml_in = ls.ml;
    int ll_mode = pick_mode(seqs, [](const Seq& s){ return ll_code(s.ll); },
                            LL_DEF, 36, 6, 35, 9, ll_cus, ll_d, ll_rle, ls.ll);
    int of_mode = pick_mode(seqs, [](const Seq& s){ return highbit32(s.ov); },
                            OF_DEF, 29, 5, 31, 8, of_cus, of_d, of_rle, ls.of);
    int ml_mode = pick_mode(seqs, [](const Seq& s){ return ml_code(s.ml); },
                            ML_DEF, 53, 6, 52, 9, ml_cus, ml_d, ml_rle, ls.ml);
    out.push_back((uint8_t)((ll_mode << 6) | (of_mode << 4) | (ml_mode << 2)));
    out.insert(out.end(), ll_d.begin(), ll_d.end());
    out.insert(out.end(), of_d.begin(), of_d.end());
    out.insert(out.end(), ml_d.begin(), ml_d.end());

    // interleaved state encoding, mirroring ZSTD_encodeSequences structure
    BitW w;
    auto enc_with = [&](auto&& ll_t, auto&& of_t, auto&& ml_t) {
        size_t last = nb - 1;
        int ml_code_l = ml_code(seqs[last].ml);
        int of_code_l = highbit32(seqs[last].ov);
        int ll_code_l = ll_code(seqs[last].ll);
        int ml_s = ml_t.init_state(ml_code_l);
        int of_s = of_t.init_state(of_code_l);
        int ll_s = ll_t.init_state(ll_code_l);
        w.add(seqs[last].ll - LL_BASE[ll_code_l], LL_EXTRA[ll_code_l]);
        w.add(seqs[last].ml - ML_BASE[ml_code_l], ML_EXTRA[ml_code_l]);
        w.add(seqs[last].ov - (1u << of_code_l), of_code_l);
        for (size_t i = nb - 1; i-- > 0;) {
            int oc = highbit32(seqs[i].ov);
            int mc = ml_code(seqs[i].ml);
            int lc = ll_code(seqs[i].ll);
            of_s = of_t.encode(w, of_s, oc);
            ml_s = ml_t.encode(w, ml_s, mc);
            ll_s = ll_t.encode(w, ll_s, lc);
            w.add(seqs[i].ll - LL_BASE[lc], LL_EXTRA[lc]);
            w.add(seqs[i].ml - ML_BASE[mc], ML_EXTRA[mc]);
            w.add(seqs[i].ov - (1u << oc), oc);
        }
        ml_t.flush(w, ml_s);
        of_t.flush(w, of_s);
        ll_t.flush(w, ll_s);
    };
    // dispatch over the 3x3 table-kind combinations via small shims
    struct AnyT {
        int kind;  // 0 predef, 1 rle, 2 custom
        const FseEnc* fse;
        int init_state(int s) const { return kind == 1 ? 0 : fse->init_state(s); }
        int encode(BitW& w, int st, int s) const { return kind == 1 ? 0 : fse->encode(w, st, s); }
        void flush(BitW& w, int st) const { if (kind != 1) fse->flush(w, st); }
    };
    // mode 3 repeats the incoming prev table (custom enc, or RLE when the
    // previous table was an RLE one — both are legal decoder states)
    auto any_of = [](int mode, const FseEnc* cus, const FseEnc* pre,
                     const SeqPrev& in) -> AnyT {
        if (mode == 1) return AnyT{1, nullptr};
        if (mode == 2) return AnyT{0, cus};
        if (mode == 3) return in.kind == 2 ? AnyT{1, nullptr} : AnyT{0, &in.enc};
        return AnyT{0, pre};
    };
    AnyT llt = any_of(ll_mode, &ll_cus, &g_ll_pre, ll_in);
    AnyT oft = any_of(of_mode, &of_cus, &g_of_pre, of_in);
    AnyT mlt = any_of(ml_mode, &ml_cus, &g_ml_pre, ml_in);
    enc_with(llt, oft, mlt);
    w.finish();
    out.insert(out.end(), w.out.begin(), w.out.end());
    return true;
}

}  // namespace zenc

// Compress one frame (single-threaded); the public entry below segments
// large inputs into independent frames compressed in parallel.
static size_t zn_zstd_compress_one(const uint8_t* src, size_t n, uint8_t* dst, size_t cap, int level) {
    using namespace zenc;
    enc_init();
    const size_t BS = 128 << 10;
    size_t op = 0;
    auto emit = [&](const uint8_t* p, size_t len) -> bool {
        if (op + len > cap) return false;
        memcpy(dst + op, p, len);
        op += len;
        return true;
    };
    // frame header (single-segment for <=256KB, else window descriptor)
    uint8_t hdr[14];
    size_t hlen = 0;
    hdr[hlen++] = 0x28; hdr[hlen++] = 0xB5; hdr[hlen++] = 0x2F; hdr[hlen++] = 0xFD;
    if (n <= (256u << 10)) {
        if (n < 256) { hdr[hlen++] = 0x20; hdr[hlen++] = (uint8_t)n; }
        else if (n <= 0xFFFF + 256) {
            hdr[hlen++] = 0x20 | 0x40;
            uint16_t v = (uint16_t)(n - 256);
            memcpy(hdr + hlen, &v, 2); hlen += 2;
        } else {
            hdr[hlen++] = 0x20 | 0x80;
            uint32_t v = (uint32_t)n;
            memcpy(hdr + hlen, &v, 4); hlen += 4;
        }
    } else {
        // Content-adaptive window at the top levels (the libzstd --long
        // idea folded into our L19 parameter set): multi-MB-distance
        // repeats are reachable up to a 32 MiB window while the stream
        // stays decodable by every standard decoder (wlog <= 27 needs no
        // opt-in).  Measured: longrange-16MiB 1.0046x -> 0.941x libzstd-19.
        int wcap = level > 12 ? 25 : 23;
        int wlog = level <= 3 ? 21 : level <= 12 ? 22 : 23;
        while ((1ull << wlog) > n && wlog > 10) wlog--;
        while ((1ull << wlog) < n && wlog < wcap) wlog++;
        hdr[hlen++] = 0x80;  // fcs 4 bytes
        hdr[hlen++] = (uint8_t)((wlog - 10) << 3);
        uint32_t v = (uint32_t)n;
        memcpy(hdr + hlen, &v, 4); hlen += 4;
    }
    if (!emit(hdr, hlen)) return (size_t)-1;

    if (n == 0) {
        uint8_t bh[3] = {1, 0, 0};  // last, raw, size 0
        if (!emit(bh, 3)) return (size_t)-1;
        return op;
    }

    // r5: 2^16 short-hash entries caused heavy eviction on match-dense
    // text (enwik9-like measured 1.035x libzstd-3; 18/19-bit tables
    // reach 0.974x and improve every text shape 0.3-1.2%).  SIZE-adaptive:
    // on <=4 MiB calls (the 2 MiB chunk-parallel archive path) the big
    // tables cost 16% speed for only -0.08% size vs 16/17 — small inputs
    // can't fill them
    int hash_bits = level <= 3 ? (n > (4u << 20) ? 18 : 16) : 17;
    int depth = level <= 2 ? 1 : level <= 3 ? 4 : level <= 12 ? 16 : 128;
    // shrink the tables for small inputs: fixed-size table memsets would
    // dominate sub-64KB calls (10k-small-file archives, BASELINE config 4)
    while (hash_bits > 10 && (1u << hash_bits) > 2 * n) hash_bits--;
    int h8_bits = n > (4u << 20) ? 19 : 17;
    while (h8_bits > 10 && (1u << h8_bits) > 2 * n) h8_bits--;
    bool lazy = level > 3;
    size_t max_offset = level <= 3 ? (1u << 21) - 1 : level <= 12 ? (1u << 22) - 1 : (1ull << 25) - 1;
    if (max_offset > n) max_offset = n;
    // chain ring is 64K deep; offsets beyond 64K only via htab head
    EncCtx ctx;
    ctx.htab.assign(1u << hash_bits, -1);
    ctx.htab8.assign(1u << h8_bits, -1);
    ctx.h8_bits = h8_bits;
    if (level > 12) {
        // full chain table: far-offset chains stay walkable at high levels
        size_t cm = 1;
        while (cm < n + 1) cm <<= 1;
        ctx.chain.assign(cm, -1);
        ctx.chain_mask = cm - 1;
    } else if (level > 3) {
        size_t cm = 1;
        while (cm < n + 1 && cm < (1u << 16)) cm <<= 1;
        ctx.chain.assign(cm, -1);
        ctx.chain_mask = cm - 1;
    }  // levels <= 3 (fast/dfast matchers) never touch the chain ring

    std::vector<Seq> seqs;
    std::vector<uint8_t> body;
    EntState lit_state;
    OptState opt_state;
    if (level > 12) opt_state.init(n);
    for (size_t off = 0; off < n; off += BS) {
        size_t bsize = n - off < BS ? n - off : BS;
        int last = off + bsize >= n;
        // RLE block: whole block one byte value
        if (bsize > 4) {
            bool all_same = true;
            for (size_t i = 1; i < bsize && all_same; i++)
                all_same = src[off + i] == src[off];
            if (all_same) {
                uint32_t bh = (uint32_t)last | (1u << 1) | ((uint32_t)bsize << 3);
                uint8_t bhb[4] = {(uint8_t)bh, (uint8_t)(bh >> 8), (uint8_t)(bh >> 16), src[off]};
                if (!emit(bhb, 4)) return (size_t)-1;
                continue;
            }
        }
        size_t lit_tail = 0;
        uint64_t rep_backup[3] = {ctx.rep[0], ctx.rep[1], ctx.rep[2]};
        EntState lit_backup = lit_state;
        // crude per-block byte entropy (bits/byte) for match-vs-literal costs
        int lit_bits;
        {
            uint32_t h256[256] = {0};
            for (size_t q = 0; q < bsize; q += 4) h256[src[off + q]]++;
            uint32_t tot = 0, nz = 0;
            for (int q = 0; q < 256; q++) { tot += h256[q]; nz += h256[q] != 0; }
            lit_bits = nz <= 1 ? 1 : highbit32(nz - 1) + 1;  // ≈ log2(alphabet)
            if (lit_bits > 8) lit_bits = 8;
        }
        double t_blk = zn_now();
        if (level <= 1)
            find_sequences_fast(src, off, off + bsize, ctx, hash_bits,
                                max_offset, seqs, lit_tail);
        else if (level <= 3)
            find_sequences_dfast(src, off, off + bsize, n, ctx, hash_bits,
                                 level > 2, max_offset, seqs, lit_tail, lit_bits);
        else
            find_sequences(src, off, off + bsize, n, ctx, hash_bits, depth, lazy,
                           max_offset, seqs, lit_tail, level > 12 ? 3 : 0, lit_bits);
        // Incompressible bail (role: the fast raw-block escape that gives
        // libzstd its multi-GB/s on high-entropy data): almost no matches
        // found + a SAMPLED literal entropy at ~8 bits/byte -> emit the
        // raw block now, skipping encode_block_body's full histogram +
        // literal copies.  Entropy-only-compressible data (base64-class,
        // ~6 bits/byte) stays on the normal path.
        if (level <= 12 && bsize >= (16 << 10) && seqs.size() < bsize / 4096) {
            uint32_t h64[256] = {0};
            size_t step_s = bsize / 4096;
            size_t cnt = 0;
            for (size_t q = 0; q < bsize; q += step_s) { h64[src[off + q]]++; cnt++; }
            double bits = 0;
            for (int q = 0; q < 256; q++) {
                uint32_t c = h64[q];
                if (!c) continue;
                double pr = (double)c / (double)cnt;
                bits -= (double)c * 1.4426950408889634 * __builtin_log(pr);
            }
            if (bits > 7.85 * (double)cnt) {
                ctx.rep[0] = rep_backup[0]; ctx.rep[1] = rep_backup[1]; ctx.rep[2] = rep_backup[2];
                lit_state = lit_backup;
                uint32_t bh = (uint32_t)last | (0u << 1) | ((uint32_t)bsize << 3);
                uint8_t bhb[3] = {(uint8_t)bh, (uint8_t)(bh >> 8), (uint8_t)(bh >> 16)};
                if (!emit(bhb, 3) || !emit(src + off, bsize)) return (size_t)-1;
                continue;
            }
        }
        body.clear();
        bool ok = encode_block_body(src + off, bsize, seqs, lit_tail, body, lit_state);
        // recursive split layout (role: btultra2's ZSTD_splitBlock, also
        // used gated at fast levels below): re-encode a span of the
        // ALREADY-FOUND sequences as multiple blocks so each gets its own
        // entropy tables; sequence order, rep evolution and the decoder's
        // view are unchanged.  The treeless-literal state is threaded in
        // emission order.
        struct Piece { size_t bytes; std::vector<uint8_t> body; };
        std::function<bool(size_t, size_t, const Seq*, size_t, size_t,
                           EntState&, std::vector<Piece>&, int)> layout =
            [&](size_t o, size_t bs, const Seq* sq, size_t nsq,
                size_t ltail, EntState& ls, std::vector<Piece>& outp,
                int depth) -> bool {
            EntState ls1 = ls;
            std::vector<uint8_t> one;
            std::vector<Seq> tmp(sq, sq + nsq);
            if (!encode_block_body(src + o, bs, tmp, ltail, one, ls1) ||
                one.size() >= bs)
                return false;
            if (depth > 0 && nsq >= 8) {
                // Top two levels weigh three split fractions (ELF
                // code/data and record-table boundaries rarely sit
                // at byte midpoints); deeper levels midpoint-only.
                // The two 3-way levels cost ~9 subtree explorations
                // (~40*bs of encode_block_body work vs ~3*bs for the
                // old depth-2 midpoint splitter) — acceptable only
                // because depth > 3 is used only at level > 12 where
                // the DP dominates.
                // Measured on the real corpus: L19 binary 1.0077 ->
                // 1.0028x lib, records 1.0111 -> 1.0067, markup
                // 1.0023, at no wall-clock cost vs the old depth-2
                // midpoint splitter (libzstd emits 2-5x more blocks
                // than we did; this recovers most of that edge).
                static const int fr3[] = {3, 2, 4};  // sixths of bs
                int nfr = depth > 3 ? 3 : 1;
                size_t best_tot = (size_t)-1;
                std::vector<Piece> best_sub;
                EntState best_ls = ls;
                for (int fi = 0; fi < nfr; fi++) {
                    size_t target = bs * (size_t)fr3[fi] / 6;
                    size_t acc = 0, k = 0;
                    while (k < nsq && acc < target)
                        acc += sq[k].ll + sq[k].ml, k++;
                    if (k == 0 || k >= nsq || acc >= bs) continue;
                    EntState ls2 = ls;
                    std::vector<Piece> sub;
                    if (layout(o, acc, sq, k, 0, ls2, sub, depth - 1) &&
                        layout(o + acc, bs - acc, sq + k, nsq - k,
                               ltail, ls2, sub, depth - 1)) {
                        size_t tot = 0;
                        for (auto& pc : sub) tot += 3 + pc.body.size();
                        if (tot < best_tot) {
                            best_tot = tot;
                            best_sub = std::move(sub);
                            best_ls = ls2;
                        }
                    }
                }
                if (best_tot < 3 + one.size()) {
                    ls = best_ls;
                    for (auto& pc : best_sub)
                        outp.push_back(std::move(pc));
                    return true;
                }
            }
            ls = ls1;
            outp.push_back(Piece{bs, std::move(one)});
            return true;
        };
        // emit a multi-piece layout if it beats the single body; returns
        // true when the whole block was emitted (caller continues)
        auto emit_pieces = [&](std::vector<Piece>& pieces, EntState& ls,
                               bool& io_err) -> bool {
            size_t tot = 0;
            for (auto& pc : pieces) tot += 3 + pc.body.size();
            if (tot >= 3 + body.size()) return false;
            for (size_t pi = 0; pi < pieces.size(); pi++) {
                uint32_t lastp = (pi + 1 == pieces.size()) ? (uint32_t)last : 0u;
                uint32_t bh = lastp | (2u << 1) |
                              ((uint32_t)pieces[pi].body.size() << 3);
                uint8_t hb[3] = {(uint8_t)bh, (uint8_t)(bh >> 8), (uint8_t)(bh >> 16)};
                if (!emit(hb, 3) ||
                    !emit(pieces[pi].body.data(), pieces[pi].body.size())) {
                    io_err = true;
                    return true;
                }
            }
            lit_state = ls;
            return true;
        };
        if (level > 12) {
            // per-block strategy tournament: each candidate runs from the
            // same incoming rep state; the smallest actual encoded body
            // wins and its rep evolution carries to the next block
            uint64_t rep_win[3] = {ctx.rep[0], ctx.rep[1], ctx.rep[2]};
            EntState lit_win = lit_state;
            const std::vector<Seq>* seed_seqs = &seqs;  // stats source for opt
            std::vector<Seq> best_seqs = seqs;  // winning parse (splitter input)
            size_t best_lit_tail = lit_tail;
            auto restore = [&] {
                ctx.rep[0] = rep_backup[0]; ctx.rep[1] = rep_backup[1]; ctx.rep[2] = rep_backup[2];
                lit_state = lit_backup;
            };
            auto consider = [&](bool okc, std::vector<uint8_t>& bodyc,
                                const std::vector<Seq>* seqsc,
                                const std::vector<Seq>& seqs_win, size_t lt_win) {
                if (okc && (!ok || bodyc.size() < body.size())) {
                    body.swap(bodyc);
                    ok = true;
                    rep_win[0] = ctx.rep[0]; rep_win[1] = ctx.rep[1]; rep_win[2] = ctx.rep[2];
                    lit_win = lit_state;
                    if (seqsc) seed_seqs = seqsc;
                    best_seqs = seqs_win;
                    best_lit_tail = lt_win;
                }
            };
            // strategy 2: plain fast greedy
            double t_s2 = zn_now();
            restore();
            std::vector<Seq> seqs2;
            size_t lit_tail2 = 0;
            find_sequences(src, off, off + bsize, n, ctx, hash_bits, 4, false,
                           max_offset, seqs2, lit_tail2, 0, lit_bits);
            std::vector<uint8_t> body2;
            bool ok2 = encode_block_body(src + off, bsize, seqs2, lit_tail2, body2, lit_state);
            size_t fast_size = ok2 ? body2.size() : 0;
            consider(ok2, body2, &seqs2, seqs2, lit_tail2);
            // strategy 3: stride-locked greedy on fixed-record data
            double t_s3 = zn_now();
            size_t stride_size = 0;
            size_t stride = detect_stride(src + off, bsize);
            std::vector<Seq> seqsS;  // outlives the tournament (seed_seqs may point here)
            if (stride) {
                restore();
                size_t lit_tailS = 0;
                find_sequences_stride(src, off, off + bsize, stride, ctx,
                                      seqsS, lit_tailS);
                std::vector<uint8_t> bodyS;
                bool okS = encode_block_body(src + off, bsize, seqsS, lit_tailS,
                                             bodyS, lit_state);
                stride_size = okS ? bodyS.size() : 0;
                consider(okS, bodyS, &seqsS, seqsS, lit_tailS);
            }
            // strategy 4: optimal parse (persistent cross-block BT) with
            // prices seeded from the best strategy so far, then price
            // iteration: re-run the DP with prices measured from its own
            // output (btultra2's two-pass scheme; BT walk results cached)
            double t_s4 = zn_now();
            OptPrices P;
            build_opt_prices(src + off, bsize, *seed_seqs, P);
            CandCache cache;
            std::vector<Seq> seqs3;
            std::vector<uint8_t> body3;
            bool ok3 = false;
            size_t opt1_size = 0;
            for (int iter = 0; iter < 8; iter++) {
                restore();
                std::vector<Seq> seqs4;
                size_t lit_tail4 = 0;
                find_sequences_opt(src, off, off + bsize, n, max_offset, opt_state,
                                   ctx, P, seqs4, lit_tail4, cache);
                std::vector<uint8_t> body4;
                bool ok4 = encode_block_body(src + off, bsize, seqs4, lit_tail4, body4, lit_state);
                if (!ok4) break;
                if (iter == 0) opt1_size = body4.size();
                bool improved = !ok3 || body4.size() < body3.size();
                if (improved) {
                    consider(ok4, body4, nullptr, seqs4, lit_tail4);
                    // consider() may swap body4 into body; rebuild body3 as
                    // the best opt body for the improvement test
                    ok3 = true;
                    std::vector<uint8_t> tmp;
                    EntState scratch = lit_backup;
                    encode_block_body(src + off, bsize, seqs4, lit_tail4, tmp, scratch);
                    body3.swap(tmp);
                }
                seqs3.swap(seqs4);
                if (!improved) break;
                build_opt_prices(src + off, bsize, seqs3, P);  // reprice from latest
            }
            if (zn_debug())
                fprintf(stderr,
                        "blk %zu: best=%zu fast=%zu stride[%zu]=%zu opt=%zu opt_it=%zu"
                        "  t: s1=%.3f s2=%.3f s3=%.3f s4=%.3f\n",
                        off / BS, body.size(), fast_size, stride, stride_size,
                        opt1_size, ok3 ? body3.size() : 0,
                        t_s2 - t_blk, t_s3 - t_s2, t_s4 - t_s3, zn_now() - t_s4);
            ctx.rep[0] = rep_win[0]; ctx.rep[1] = rep_win[1]; ctx.rep[2] = rep_win[2];
            lit_state = lit_win;
            // block splitter: re-encode the WINNING parse via the hoisted
            // recursive layout (depth 5, 3-fraction top levels).  Wins on
            // heterogeneous 128 KiB blocks (source text, format boundaries).
            if (ok && body.size() < bsize && best_seqs.size() >= 8) {
                EntState ls = lit_backup;
                std::vector<Piece> pieces;
                if (layout(off, bsize, best_seqs.data(), best_seqs.size(),
                           best_lit_tail, ls, pieces, 5) &&
                    pieces.size() > 1) {
                    bool io_err = false;
                    if (emit_pieces(pieces, ls, io_err)) {
                        if (io_err) return (size_t)-1;
                        continue;  // all pieces emitted; next 128 KiB block
                    }
                }
            }
        } else if (ok && body.size() < bsize && seqs.size() >= 16 &&
                   bsize >= (32 << 10) && body.size() * 25 > bsize * 7) {
            // fast-level gated splitter (role: libzstd's always-on
            // split-after-sequences — it emits ~40 KB blocks on ELF at L3
            // and beat us 0.9% there): a trial split costs ~2 extra
            // entropy passes, so fire only when (a) the block compressed
            // poorly (density > 0.28 — ELF blocks sit at 0.24-0.63, text
            // at 0.07-0.25, so homogeneous shapes never pay) and (b) a
            // SAMPLED half-vs-half literal histogram L1 divergence says
            // the block straddles heterogeneous regions (ELF blocks
            // measure 0.25-0.83, text/source/records 0.07-0.33).
            // Adoption stays size-gated, so a loose gate costs speed,
            // never ratio.  Unlike the L19 path there is no root-level
            // re-encode: the halves race the already-built single body.
            // 16 slice histograms (one strided pass): the half-vs-half L1
            // gates, and the best of 9 candidate boundaries (4/16..12/16,
            // max left-vs-right divergence) picks the split TARGET —
            // libzstd's residual ELF edge is splits landing on section
            // boundaries, which seq-midpoints miss.
            uint32_t hs[16][256] = {{0}};
            size_t slice = bsize / 16;
            for (size_t q = 0; q < bsize; q += 8) {
                size_t si = q / slice;
                hs[si > 15 ? 15 : si][src[off + q]]++;
            }
            uint32_t left[256] = {0}, right[256] = {0};
            uint32_t n1 = 0, n2 = 0;
            for (int si = 0; si < 8; si++)
                for (int q = 0; q < 256; q++) left[q] += hs[si][q];
            for (int si = 8; si < 16; si++)
                for (int q = 0; q < 256; q++) right[q] += hs[si][q];
            for (int q = 0; q < 256; q++) n1 += left[q], n2 += right[q];
            int64_t l1 = 0;  // half-vs-half sum |p1-p2| scaled by 2^20
            for (int q = 0; q < 256; q++) {
                int64_t a = ((int64_t)left[q] << 20) / n1;
                int64_t b = ((int64_t)right[q] << 20) / n2;
                l1 += a > b ? a - b : b - a;
            }
            if (l1 > (int64_t)(0.24 * (1 << 20))) {
                // change-point scan: rebuild left/right at each boundary
                int best_cut = 8;
                int64_t best_div = -1;
                for (int q = 0; q < 256; q++) { left[q] = 0; right[q] = 0; }
                for (int si = 0; si < 4; si++)
                    for (int q = 0; q < 256; q++) left[q] += hs[si][q];
                for (int si = 4; si < 16; si++)
                    for (int q = 0; q < 256; q++) right[q] += hs[si][q];
                for (int cut = 4; cut <= 12; cut++) {
                    uint32_t m1 = 0, m2 = 0;
                    for (int q = 0; q < 256; q++) m1 += left[q], m2 += right[q];
                    int64_t div = 0;
                    for (int q = 0; q < 256; q++) {
                        int64_t a = ((int64_t)left[q] << 20) / (m1 ? m1 : 1);
                        int64_t b = ((int64_t)right[q] << 20) / (m2 ? m2 : 1);
                        div += a > b ? a - b : b - a;
                    }
                    if (div > best_div) { best_div = div; best_cut = cut; }
                    if (cut < 12)
                        for (int q = 0; q < 256; q++) {
                            left[q] += hs[cut][q];
                            right[q] -= hs[cut][q];
                        }
                }
                size_t target = bsize * (size_t)best_cut / 16;
                size_t acc = 0, k = 0;
                const Seq* sq = seqs.data();
                size_t nsq = seqs.size();
                while (k < nsq && acc < target)
                    acc += sq[k].ll + sq[k].ml, k++;
                if (k > 0 && k < nsq && acc < bsize) {
                    EntState ls = lit_backup;
                    std::vector<Piece> pieces;
                    if (layout(off, acc, sq, k, 0, ls, pieces, 1) &&
                        layout(off + acc, bsize - acc, sq + k, nsq - k,
                               lit_tail, ls, pieces, 1) &&
                        pieces.size() > 1) {
                        bool io_err = false;
                        if (emit_pieces(pieces, ls, io_err)) {
                            if (io_err) return (size_t)-1;
                            continue;
                        }
                    }
                }
            }
        }
        if (ok && body.size() < bsize) {
            uint32_t bh = (uint32_t)last | (2u << 1) | ((uint32_t)body.size() << 3);
            uint8_t bhb[3] = {(uint8_t)bh, (uint8_t)(bh >> 8), (uint8_t)(bh >> 16)};
            if (!emit(bhb, 3) || !emit(body.data(), body.size())) return (size_t)-1;
        } else {
            ctx.rep[0] = rep_backup[0]; ctx.rep[1] = rep_backup[1]; ctx.rep[2] = rep_backup[2];
            lit_state = lit_backup;
            uint32_t bh = (uint32_t)last | (0u << 1) | ((uint32_t)bsize << 3);
            uint8_t bhb[3] = {(uint8_t)bh, (uint8_t)(bh >> 8), (uint8_t)(bh >> 16)};
            if (!emit(bhb, 3) || !emit(src + off, bsize)) return (size_t)-1;
        }
    }
    return op;
}

extern "C" {

// Segment size for parallel frame compression.  Each segment becomes an
// independent zstd frame (spec-valid concatenation; the reference decodes
// it via ZSTD_decompressStream / multi-frame ZSTD_decompress).  4 MiB ≥
// the level<=12 window sizes, so the ratio cost is only cross-segment
// matches beyond the window — measured <1%.
size_t zn_zstd_compress(const uint8_t* src, size_t n, uint8_t* dst, size_t cap, int level) {
    const size_t SEG = level <= 12 ? (4u << 20) : (16u << 20);
    size_t min_total = level <= 12 ? (4u << 20) : (32u << 20);
    unsigned nt = zn_nthreads();
    if (nt < 2 || n < min_total || n <= SEG)
        return zn_zstd_compress_one(src, n, dst, cap, level);
    size_t ns = (n + SEG - 1) / SEG;
    size_t bound = SEG + (SEG >> 8) + 512;
    std::unique_ptr<uint8_t[]> scratch(new uint8_t[ns * bound]);
    std::vector<size_t> sizes(ns);
    zn_parallel_for(ns, nt, [&](size_t i) {
        size_t off = i * SEG;
        size_t chunk = n - off < SEG ? n - off : SEG;
        sizes[i] = zn_zstd_compress_one(src + off, chunk, scratch.get() + i * bound,
                                        bound, level);
    });
    size_t op = 0;
    for (size_t i = 0; i < ns; i++) {
        if (sizes[i] == (size_t)-1 || op + sizes[i] > cap) return (size_t)-1;
        memcpy(dst + op, scratch.get() + i * bound, sizes[i]);
        op += sizes[i];
    }
    return op;
}

}  // extern "C"
