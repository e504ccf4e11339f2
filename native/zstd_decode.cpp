// zpack-tpu native zstd frame decoder (RFC 8878), self-contained.
//
// Role parity: ZSTD_decompressDCtx as used by the reference
// (lib/zpack_read.c:380).  Independent implementation written from the
// public spec; mirrors the Python decoder in zpack_tpu/codecs/zstd/ which
// serves as its differential-testing oracle.
//
// Compiled into the same _zpack_native.so as zpack_native.cpp.

#include <cstdint>
#include <cstring>
#include <cstddef>
#include <vector>
#include <atomic>
#include <new>

#include "zn_threads.h"

// Phase profiling (diagnostic builds only: g++ -DZPACK_PROF via
// scripts/profile_native.py).  Accumulates rdtsc ticks per decode phase;
// zn_zstd_prof() snapshots {literals, seq_tables, seq_loop, nb_seq,
// lit_bytes, out_bytes}.
#ifdef ZPACK_PROF
#include <x86intrin.h>
#include <atomic>
// The decoder is normally multithreaded (zn_threads.h worker pools), so
// the accumulators are relaxed atomics: a -DZPACK_PROF build stays
// race-free even without ZPACK_NATIVE_THREADS=1.
static std::atomic<uint64_t> g_prof[8];
extern "C" void zn_zstd_prof(uint64_t* out) {
    for (int i = 0; i < 8; i++)
        out[i] = g_prof[i].exchange(0, std::memory_order_relaxed);
}
#define PROF_T(v) uint64_t v = __rdtsc()
#define PROF_ACC(slot, t0) \
    (g_prof[slot].fetch_add(__rdtsc() - (t0), std::memory_order_relaxed))
#define PROF_ADD(slot, n) \
    (g_prof[slot].fetch_add((n), std::memory_order_relaxed))
#else
#define PROF_T(v) ((void)0)
#define PROF_ACC(slot, t0) ((void)0)
#define PROF_ADD(slot, n) ((void)0)
#endif

namespace {

struct ByteSpan {
    const uint8_t* p;
    size_t n;
};

// ---------------------------------------------------------------------------
// bit readers
// ---------------------------------------------------------------------------

struct FwdBits {  // LSB-first forward (FSE table descriptions)
    const uint8_t* data;
    size_t size;
    size_t bitpos = 0;

    uint32_t peek(int nbits) const {
        if (nbits == 0) return 0;
        size_t byte = bitpos >> 3;
        uint64_t word = 0;
        if (byte + 8 <= size) {
            memcpy(&word, data + byte, 8);
        } else {
            for (int i = 0; i < 8 && byte + i < size; i++)
                word |= (uint64_t)data[byte + i] << (8 * i);
        }
        return (uint32_t)((word >> (bitpos & 7)) & ((1u << nbits) - 1));
    }
    uint32_t read(int nbits) { uint32_t v = peek(nbits); bitpos += nbits; return v; }
    void skip(int nbits) { bitpos += nbits; }
    size_t byte_pos() const { return (bitpos + 7) >> 3; }
};

struct BackBits {  // backward stream with sentinel bit
    const uint8_t* data;
    size_t size = 0;
    long long bits_left = -1;

    bool init(const uint8_t* d, size_t n) {
        if (n == 0 || d[n - 1] == 0) return false;
        data = d;
        size = n;
        int hb = 31 - __builtin_clz((uint32_t)d[n - 1]);
        bits_left = (long long)(n - 1) * 8 + hb;
        return true;
    }
    inline uint64_t word_at(size_t start) const {
        if (start + 8 <= size) {
            uint64_t w;
            memcpy(&w, data + start, 8);
            return w;
        }
        if (size >= 8) {
            // clamp to the last 8 bytes; bytes past the end read as zero
            uint64_t w;
            memcpy(&w, data + size - 8, 8);
            return w >> (8 * (start - (size - 8)));
        }
        uint64_t word = 0;
        size_t lim = start < size ? size - start : 0;
        if (lim > 8) lim = 8;
        for (size_t i = 0; i < lim; i++) word |= (uint64_t)data[start + i] << (8 * i);
        return word;
    }
    uint32_t read(int nbits) {
        if (nbits == 0) return 0;
        bits_left -= nbits;
        long long pos = bits_left;
        if (pos >= 0) {
            uint64_t word = word_at((size_t)(pos >> 3));
            return (uint32_t)((word >> (pos & 7)) & ((1ull << nbits) - 1));
        }
        long long avail = nbits + pos;
        if (avail <= 0) return 0;
        uint64_t word = word_at(0);
        return (uint32_t)((word & ((1ull << avail) - 1)) << (-pos));
    }
};

// ---------------------------------------------------------------------------
// FSE
// ---------------------------------------------------------------------------

struct FseTable {
    int al = 0;
    std::vector<uint16_t> symbols;
    std::vector<uint8_t> nb_bits;
    std::vector<uint16_t> new_state;
    bool valid = false;
};

// Parse normalized counts; returns bytes consumed or -1.
// Windowed reader: one 8-byte load per refill instead of a bounds-checked
// load per peek (the per-peek FwdBits version was ~40% of sequence-table
// parse cost on descriptor-heavy corpora); bits past `size` read as zero,
// matching FwdBits semantics.
long long read_ncount(const uint8_t* data, size_t size, int max_symbol, int max_al,
                      std::vector<int>& counts, int& al_out) {
    size_t bitpos = 0;
    uint64_t win = 0;   // bits [bitpos, bitpos+avail) of the stream, LSB first
    int avail = 0;
    auto refill = [&]() {
        size_t byte = bitpos >> 3;
        uint64_t w = 0;
        if (byte + 8 <= size) {
            memcpy(&w, data + byte, 8);
        } else {
            for (int i = 0; i < 8 && byte + i < size; i++)
                w |= (uint64_t)data[byte + i] << (8 * i);
        }
        win = w >> (bitpos & 7);
        avail = 64 - (int)(bitpos & 7) - 8;  // 56..63 usable (conservative)
        if (avail > 56) avail = 56;
    };
    auto peekb = [&](int nbits) -> uint32_t {
        if (avail < nbits) refill();
        return (uint32_t)(win & ((1u << nbits) - 1));
    };
    auto skipb = [&](int nbits) { win >>= nbits; avail -= nbits; bitpos += nbits; };
    refill();
    int al = (int)peekb(4) + 5;
    skipb(4);
    if (al > max_al) return -1;
    int remaining = (1 << al) + 1;
    int threshold = 1 << al;
    int nbits = al + 1;
    counts.clear();
    bool previous0 = false;
    while (remaining > 1) {
        if ((int)counts.size() > max_symbol) return -1;
        if (previous0) {
            while (peekb(2) == 3) {
                skipb(2);
                counts.push_back(0); counts.push_back(0); counts.push_back(0);
                if ((int)counts.size() > max_symbol + 1) return -1;
            }
            uint32_t n0 = peekb(2);
            skipb(2);
            for (uint32_t i = 0; i < n0; i++) counts.push_back(0);
            if ((int)counts.size() > max_symbol + 1) return -1;
        }
        uint32_t val = peekb(nbits);
        int maxv = (2 * threshold - 1) - remaining;
        if ((int)(val & (threshold - 1)) < maxv) {
            val &= threshold - 1;
            skipb(nbits - 1);
        } else {
            skipb(nbits);
            if ((int)val >= threshold) val -= maxv;
        }
        int count = (int)val - 1;
        remaining -= count < 0 ? -count : count;
        counts.push_back(count);
        previous0 = count == 0;
        while (remaining < threshold && remaining > 1) { nbits--; threshold >>= 1; }
    }
    if (remaining != 1) return -1;
    al_out = al;
    return (long long)((bitpos + 7) >> 3);
}

bool build_fse_table(const std::vector<int>& counts, int al, FseTable& t) {
    int size = 1 << al;
    t.al = al;
    t.symbols.assign(size, 0);
    t.nb_bits.assign(size, 0);
    t.new_state.assign(size, 0);
    int high = size - 1;
    for (size_t s = 0; s < counts.size(); s++)
        if (counts[s] == -1) t.symbols[high--] = (uint16_t)s;
    int step = (size >> 1) + (size >> 3) + 3;
    int mask = size - 1;
    int pos = 0;
    for (size_t s = 0; s < counts.size(); s++) {
        for (int c = 0; c < counts[s]; c++) {
            t.symbols[pos] = (uint16_t)s;
            pos = (pos + step) & mask;
            while (pos > high) pos = (pos + step) & mask;
        }
    }
    if (pos != 0) return false;
    std::vector<int> next(counts.size());
    for (size_t s = 0; s < counts.size(); s++) next[s] = counts[s] == -1 ? 1 : counts[s];
    for (int u = 0; u < size; u++) {
        int s = t.symbols[u];
        int x = next[s]++;
        int hb = 31 - __builtin_clz((uint32_t)x);
        int nb = al - hb;
        t.nb_bits[u] = (uint8_t)nb;
        t.new_state[u] = (uint16_t)((x << nb) - size);
    }
    t.valid = true;
    return true;
}

void build_rle_table(int symbol, FseTable& t) {
    t.al = 0;
    t.symbols.assign(1, (uint16_t)symbol);
    t.nb_bits.assign(1, 0);
    t.new_state.assign(1, 0);
    t.valid = true;
}

// ---------------------------------------------------------------------------
// Huffman
// ---------------------------------------------------------------------------

struct HufTable {
    int max_bits = 0;
    // fused entry: nb_bits | (symbol << 8) — one 16-bit load per decoded
    // symbol; nb_bits sits in the LOW byte so the loop-carried bit-position
    // update is a zero-extend with no shift on the critical path
    std::vector<uint16_t> ent;  // 2^max_bits
    // double-symbol entry (HUF X2 idea): a WIDER window of w2 =
    // min(2*max_bits, 12) bits so a complete second code usually fits —
    // one lookup yields up to two bytes: sym1 | sym2<<8 | total_len<<16 |
    // n<<24.  Halves the dependent load->shift chain when most entries
    // are doubles (typical literal tables); x2_worthwhile gates the
    // decode-loop choice per table.
    std::vector<uint32_t> ent2;  // 2^w2
    int w2 = 0;
    bool x2_worthwhile = false;
    bool valid = false;
};

// Parse tree description at data; returns bytes consumed or -1.
long long read_huf_weights(const uint8_t* data, size_t size, std::vector<int>& weights) {
    if (size < 1) return -1;
    uint8_t header = data[0];
    weights.clear();
    size_t consumed;
    if (header < 128) {
        size_t csize = header;
        if (size < 1 + csize) return -1;
        std::vector<int> counts;
        int al;
        long long desc = read_ncount(data + 1, csize, 255, 6, counts, al);
        if (desc < 0) return -1;
        FseTable table;
        if (!build_fse_table(counts, al, table)) return -1;
        BackBits br;
        if (!br.init(data + 1 + desc, csize - desc)) return -1;
        uint32_t even = br.read(table.al);
        uint32_t odd = br.read(table.al);
        while (weights.size() <= 255) {
            weights.push_back(table.symbols[even]);
            int bits = table.nb_bits[even];
            if (br.bits_left < bits) { weights.push_back(table.symbols[odd]); break; }
            even = table.new_state[even] + br.read(bits);
            weights.push_back(table.symbols[odd]);
            bits = table.nb_bits[odd];
            if (br.bits_left < bits) { weights.push_back(table.symbols[even]); break; }
            odd = table.new_state[odd] + br.read(bits);
        }
        if (weights.size() > 256) return -1;
        consumed = 1 + csize;
    } else {
        int n = header - 127;
        size_t nbytes = (n + 1) / 2;
        if (size < 1 + nbytes) return -1;
        for (int i = 0; i < n; i++) {
            uint8_t b = data[1 + i / 2];
            weights.push_back(i % 2 == 0 ? (b >> 4) : (b & 0xF));
        }
        consumed = 1 + nbytes;
    }
    // implied last weight
    uint64_t total = 0;
    for (int w : weights) if (w > 0) total += 1ull << (w - 1);
    if (total == 0) return -1;
    int hb = 63 - __builtin_clzll(total);
    uint64_t next_pow2 = 1ull << (hb + 1);
    uint64_t rest = next_pow2 - total;
    if (rest & (rest - 1)) return -1;
    int rest_hb = 63 - __builtin_clzll(rest);
    weights.push_back(rest_hb + 1);
    if (hb + 1 > 11) return -1;
    return (long long)consumed;
}

bool build_huf_table(const std::vector<int>& weights, HufTable& t) {
    uint64_t total = 0;
    for (int w : weights) if (w > 0) total += 1ull << (w - 1);
    int max_bits = 63 - __builtin_clzll(total);
    if ((1ull << max_bits) != total || max_bits > 11) return false;
    int size = 1 << max_bits;
    t.max_bits = max_bits;
    t.ent.assign(size, 0);
    int pos = 0;
    for (int w = 1; w <= max_bits; w++) {
        for (size_t s = 0; s < weights.size(); s++) {
            if (weights[s] == w) {
                int length = 1 << (w - 1);
                uint16_t e = (uint16_t)((max_bits + 1 - w) | (s << 8));
                for (int i = 0; i < length; i++) t.ent[pos + i] = e;
                pos += length;
            }
        }
    }
    if (pos != size) return false;
    int W = max_bits * 2 < 12 ? max_bits * 2 : 12;
    t.w2 = W;
    int size2 = 1 << W;
    t.ent2.resize(size2);
    size_t doubles = 0;
    for (int v = 0; v < size2; v++) {
        uint16_t e1 = t.ent[(uint32_t)v >> (W - max_bits)];
        int len1 = e1 & 0xFF;
        uint32_t sym1 = e1 >> 8;
        if (len1 < W) {
            // bits [len1, W) of the window are real for the second code;
            // its entry is well-defined iff its length fits them entirely
            int v2 = ((v << len1) & (size2 - 1)) >> (W - max_bits);
            uint16_t e2 = t.ent[v2];
            int len2 = e2 & 0xFF;
            if (len2 <= W - len1) {
                t.ent2[v] = sym1 | ((uint32_t)(e2 >> 8) << 8)
                          | ((uint32_t)(len1 + len2) << 16) | (2u << 24);
                doubles++;
                continue;
            }
        }
        t.ent2[v] = sym1 | ((uint32_t)len1 << 16) | (1u << 24);
    }
    // the X2 loop does ~W/max_bits fewer lookups per reload round, so it
    // only wins when most lookups actually emit two symbols
    t.x2_worthwhile = doubles * 4 >= (size_t)size2 * 3;
    t.valid = true;
    return true;
}

// Decode symbols [i..n) of one stream from an already-initialized reader
// (the resumable core shared by the 1- and 4-stream entry points).
static bool huf_decode_tail(BackBits& br, const HufTable& t,
                            uint8_t* out, size_t i, size_t n_symbols) {
    int mb = t.max_bits;
    const uint16_t* ent = t.ent.data();
    const uint8_t* data = br.data;
    size_t size = br.size;
    // fast loop: one 8-byte load per window; the container is shifted left
    // as bits are consumed so the per-symbol chain is shl + const-shr + load
    // (no subtract/mask on the critical path)
    while (i < n_symbols && br.bits_left >= mb) {
        size_t byte_end = (size_t)((br.bits_left + 7) >> 3);
        if (byte_end < 8 || byte_end > size) break;
        uint64_t w;
        memcpy(&w, data + byte_end - 8, 8);
        long long bl = br.bits_left;
        int q = (int)(bl - (long long)(byte_end - 8) * 8);  // usable bits, 57..64
        uint64_t ws = w << (64 - q);
        int c = 0;  // consumed this window
        int budget = q - mb;
        while (i < n_symbols && c <= budget) {
            uint16_t e = ent[ws >> (64 - mb)];
            out[i++] = (uint8_t)(e >> 8);
            ws <<= (uint8_t)e;
            c += (uint8_t)e;
        }
        br.bits_left = bl - c;
    }
    // tail (stream start / under-run): exact bit-window semantics
    for (; i < n_symbols; i++) {
        long long pos = br.bits_left;
        uint32_t idx;
        if (pos >= mb) {
            uint64_t word = br.word_at((size_t)((pos - mb) >> 3));
            idx = (uint32_t)((word >> ((pos - mb) & 7)) & ((1u << mb) - 1));
        } else {
            // under-run: zero-fill below
            uint64_t word = br.word_at(0);
            uint32_t avail = (uint32_t)(pos > 0 ? pos : 0);
            idx = (uint32_t)((word & ((1ull << avail) - 1)) << (mb - avail));
        }
        uint16_t e = ent[idx];
        out[i] = (uint8_t)(e >> 8);
        br.bits_left -= (uint8_t)e;
    }
    return br.bits_left == 0;
}

bool huf_decode_stream(const uint8_t* data, size_t size, const HufTable& t,
                       uint8_t* out, size_t n_symbols) {
    BackBits br;
    if (!br.init(data, size)) return false;
    return huf_decode_tail(br, t, out, 0, n_symbols);
}

// Four independent streams decoded round-robin: each round reloads one
// 8-byte window per stream, then runs R check-free symbols per stream —
// four dependency chains keep the load ports busy (HUF_decompress4X's
// interleave, adapted to the windowed reader).
template <int MB>
bool huf_decode_4streams_t(const uint8_t* sp[4], const size_t sizes[4],
                           uint8_t* outp[4], const size_t ns[4], const HufTable& t) {
    BackBits br[4];
    for (int k = 0; k < 4; k++)
        if (!br[k].init(sp[k], sizes[k])) return false;
    constexpr int mb = MB;
    const uint16_t* ent = t.ent.data();
    // R symbols per window are safe: the window holds >= 57 bits above its
    // base and each symbol consumes at most mb
    // last of R lookups starts after (R-1)*mb consumed bits and needs mb
    // more, so R*mb <= 57 is the exact bound (the old (57-mb)/mb was one
    // conservative; +4-8% on literal-heavy shapes)
    constexpr int R = 57 / mb > 1 ? 57 / mb : 1;
    size_t i[4] = {0, 0, 0, 0};
    while (true) {
        // reload: shifted containers (top mb bits = next table index); the
        // four chains are pure shl/shr/load with consumption counted off
        // the critical path
        uint64_t ws[4];
        uint32_t c[4];
        bool ok = true;
        for (int k = 0; k < 4; k++) {
            if (ns[k] - i[k] < (size_t)R) { ok = false; break; }
            long long bl = br[k].bits_left;
            size_t byte_end = (size_t)((bl + 7) >> 3);
            if (bl < mb || byte_end < 8 || byte_end > sizes[k]) { ok = false; break; }
            uint64_t w;
            memcpy(&w, sp[k] + byte_end - 8, 8);
            ws[k] = w << (64 - (int)(bl - (long long)(byte_end - 8) * 8));
            c[k] = 0;
        }
        if (!ok) break;
        for (int r = 0; r < R; r++) {
            for (int k = 0; k < 4; k++) {
                uint16_t e = ent[ws[k] >> (64 - mb)];
                outp[k][i[k] + r] = (uint8_t)(e >> 8);
                ws[k] <<= (uint8_t)e;
                c[k] += (uint8_t)e;
            }
        }
        for (int k = 0; k < 4; k++) {
            i[k] += R;
            br[k].bits_left -= c[k];
        }
    }
    for (int k = 0; k < 4; k++)
        if (!huf_decode_tail(br[k], t, outp[k], i[k], ns[k])) return false;
    return true;
}

// X2 variant: the wide ent2 window — up to two symbols per lookup.  W is
// compile-time so the shifts are immediates; per reload each of the R
// lookups consumes at most W bits and emits 1-2 bytes via an
// unconditional 2-byte store (the 2R output-slack guard keeps every
// store inside the stream's own region).
template <int W>
bool huf_decode_4streams_x2_t(const uint8_t* sp[4], const size_t sizes[4],
                              uint8_t* outp[4], const size_t ns[4], const HufTable& t) {
    BackBits br[4];
    for (int k = 0; k < 4; k++)
        if (!br[k].init(sp[k], sizes[k])) return false;
    const uint32_t* ent2 = t.ent2.data();
    constexpr int R = 57 / W > 1 ? (57 / W < 8 ? 57 / W : 8) : 1;
    size_t i[4] = {0, 0, 0, 0};
    while (true) {
        uint64_t ws[4];
        uint32_t c[4];
        bool ok = true;
        for (int k = 0; k < 4; k++) {
            if (ns[k] - i[k] < (size_t)(2 * R)) { ok = false; break; }
            long long bl = br[k].bits_left;
            size_t byte_end = (size_t)((bl + 7) >> 3);
            if (bl < W || byte_end < 8 || byte_end > sizes[k]) { ok = false; break; }
            uint64_t w;
            memcpy(&w, sp[k] + byte_end - 8, 8);
            ws[k] = w << (64 - (int)(bl - (long long)(byte_end - 8) * 8));
            c[k] = 0;
        }
        if (!ok) break;
        size_t ii[4] = {i[0], i[1], i[2], i[3]};
        for (int r = 0; r < R; r++) {
            for (int k = 0; k < 4; k++) {
                uint32_t e = ent2[ws[k] >> (64 - W)];
                memcpy(outp[k] + ii[k], &e, 2);  // LE: sym1, sym2
                ii[k] += e >> 24;
                ws[k] <<= (uint8_t)(e >> 16);
                c[k] += (uint8_t)(e >> 16);
            }
        }
        for (int k = 0; k < 4; k++) {
            i[k] = ii[k];
            br[k].bits_left -= c[k];
        }
    }
    for (int k = 0; k < 4; k++)
        if (!huf_decode_tail(br[k], t, outp[k], i[k], ns[k])) return false;
    return true;
}

bool huf_decode_4streams(const uint8_t* sp[4], const size_t sizes[4],
                         uint8_t* outp[4], const size_t ns[4], const HufTable& t) {
    if (t.x2_worthwhile) {
        switch (t.w2) {  // compile-time W: unrolled rounds, immediate shifts
            case 2: return huf_decode_4streams_x2_t<2>(sp, sizes, outp, ns, t);
            case 4: return huf_decode_4streams_x2_t<4>(sp, sizes, outp, ns, t);
            case 6: return huf_decode_4streams_x2_t<6>(sp, sizes, outp, ns, t);
            case 8: return huf_decode_4streams_x2_t<8>(sp, sizes, outp, ns, t);
            case 10: return huf_decode_4streams_x2_t<10>(sp, sizes, outp, ns, t);
            case 12: return huf_decode_4streams_x2_t<12>(sp, sizes, outp, ns, t);
        }
    }
    switch (t.max_bits) {  // compile-time mb: unrolled rounds, immediate shifts
        case 1: return huf_decode_4streams_t<1>(sp, sizes, outp, ns, t);
        case 2: return huf_decode_4streams_t<2>(sp, sizes, outp, ns, t);
        case 3: return huf_decode_4streams_t<3>(sp, sizes, outp, ns, t);
        case 4: return huf_decode_4streams_t<4>(sp, sizes, outp, ns, t);
        case 5: return huf_decode_4streams_t<5>(sp, sizes, outp, ns, t);
        case 6: return huf_decode_4streams_t<6>(sp, sizes, outp, ns, t);
        case 7: return huf_decode_4streams_t<7>(sp, sizes, outp, ns, t);
        case 8: return huf_decode_4streams_t<8>(sp, sizes, outp, ns, t);
        case 9: return huf_decode_4streams_t<9>(sp, sizes, outp, ns, t);
        case 10: return huf_decode_4streams_t<10>(sp, sizes, outp, ns, t);
        case 11: return huf_decode_4streams_t<11>(sp, sizes, outp, ns, t);
        default: return false;
    }
}

// ---------------------------------------------------------------------------
// sequences
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

// Fused sequence-decode table entry (libzstd's seq_t table idea): the FSE
// state transition and the symbol's baseline/extra-bit count baked into one
// 8-byte record, so the hot loop does a single indexed load per field
// instead of symbol -> BASE[] -> EXTRA[] chains.
struct SeqEnt {
    uint16_t new_state;
    uint8_t nb_state;   // bits for the FSE state update
    uint8_t nb_extra;   // extra value bits for this symbol
    uint32_t base;      // value baseline (for OF: 1 << code)
};

// (1 << n) - 1 for n in [0, 32]: replaces per-field mask construction
// (shlx+dec) with one load from an always-hot 132-byte table, without
// widening SeqEnt past 8 bytes (16-byte entries measured a text-decode
// LOSS from L1 pressure — ll+ml+of tables grow to ~20 KB)
static const uint32_t kBitMask[33] = {
    0x0, 0x1, 0x3, 0x7, 0xF, 0x1F, 0x3F, 0x7F, 0xFF,
    0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF, 0xFFFF,
    0x1FFFF, 0x3FFFF, 0x7FFFF, 0xFFFFF, 0x1FFFFF, 0x3FFFFF, 0x7FFFFF,
    0xFFFFFF, 0x1FFFFFF, 0x3FFFFFF, 0x7FFFFFF, 0xFFFFFFF, 0x1FFFFFFF,
    0x3FFFFFFF, 0x7FFFFFFF, 0xFFFFFFFF};

static_assert(sizeof(SeqEnt) == 8, "packed-build stores assume 8-byte LE entries");

struct SeqTable {
    int al = 0;
    std::vector<SeqEnt> e;
    bool valid = false;
};

enum SeqKind { SEQ_LL = 0, SEQ_OF = 1, SEQ_ML = 2 };

static inline void seq_value_fields(int kind, unsigned sym, SeqEnt& e) {
    if (kind == SEQ_LL) {
        e.base = LL_BASE[sym];
        e.nb_extra = LL_EXTRA[sym];
    } else if (kind == SEQ_ML) {
        e.base = ML_BASE[sym];
        e.nb_extra = ML_EXTRA[sym];
    } else {  // OF: of_val = (1 << code) + extra(code bits); code 0 -> 1
        e.base = (uint32_t)(1u << sym);
        e.nb_extra = (uint8_t)sym;
    }
}

// Per-kind value fields pre-packed into the high 48 bits of a SeqEnt image
// (nb_extra << 24 | base << 32, matching the LE struct layout) so the
// table-build hot loop emits each entry with one OR + one 8-byte store.
struct SeqValTabs {
    uint64_t ll[36], ml[53], of[32];
    SeqValTabs() {
        for (int s = 0; s < 36; s++)
            ll[s] = ((uint64_t)LL_EXTRA[s] << 24) | ((uint64_t)LL_BASE[s] << 32);
        for (int s = 0; s < 53; s++)
            ml[s] = ((uint64_t)ML_EXTRA[s] << 24) | ((uint64_t)ML_BASE[s] << 32);
        for (int s = 0; s < 32; s++)
            of[s] = ((uint64_t)s << 24) | ((uint64_t)(1u << s) << 32);
    }
};
static const SeqValTabs g_seq_val;

// Single-pass: normalized counts -> fused SeqTable (spread + transitions +
// value fields in one walk; scratch reused across blocks by the caller).
bool build_seq_table(const std::vector<int>& counts, int al, int kind,
                     SeqTable& st, std::vector<uint16_t>& sym_scratch,
                     std::vector<int>& next_scratch) {
    int size = 1 << al;
    st.al = al;
    st.e.resize(size);
    std::vector<uint16_t>& syms = sym_scratch;
    syms.resize(size);
    int high = size - 1;
    for (size_t s = 0; s < counts.size(); s++)
        if (counts[s] == -1) syms[high--] = (uint16_t)s;
    int step = (size >> 1) + (size >> 3) + 3;
    int mask = size - 1;
    int pos = 0;
    if (high == size - 1) {
        // no low-prob (-1) symbols: the walk never lands above `high`, so
        // drop the skip check from the spread loop (most real tables)
        for (size_t s = 0; s < counts.size(); s++) {
            for (int c = 0; c < counts[s]; c++) {
                syms[pos] = (uint16_t)s;
                pos = (pos + step) & mask;
            }
        }
    } else {
        for (size_t s = 0; s < counts.size(); s++) {
            for (int c = 0; c < counts[s]; c++) {
                syms[pos] = (uint16_t)s;
                pos = (pos + step) & mask;
                while (pos > high) pos = (pos + step) & mask;
            }
        }
    }
    if (pos != 0) return false;
    std::vector<int>& next = next_scratch;
    next.resize(counts.size());
    for (size_t s = 0; s < counts.size(); s++) next[s] = counts[s] == -1 ? 1 : counts[s];
    const uint64_t* vt = kind == SEQ_LL ? g_seq_val.ll
                       : kind == SEQ_ML ? g_seq_val.ml : g_seq_val.of;
    uint64_t* ep = reinterpret_cast<uint64_t*>(st.e.data());
    for (int u = 0; u < size; u++) {
        unsigned s = syms[u];
        int x = next[s]++;
        int hb = 31 - __builtin_clz((uint32_t)x);
        int nb = al - hb;
        uint64_t e = vt[s] | (uint16_t)((x << nb) - size) | ((uint64_t)nb << 16);
        memcpy(ep + u, &e, 8);
    }
    st.valid = true;
    return true;
}

struct DCtx {
    SeqTable ll, of, ml;              // block-local table storage
    const SeqTable* llp = nullptr;    // active tables: storage above or the
    const SeqTable* ofp = nullptr;    // shared predefined tables (no copy)
    const SeqTable* mlp = nullptr;
    HufTable huf;
    uint64_t rep[3] = {1, 4, 8};
    std::vector<uint8_t> lits;
    std::vector<int> counts_scratch;      // reused across blocks
    std::vector<uint16_t> sym_scratch;
    std::vector<int> next_scratch;
    // build-skip cache: encoders (incl. libzstd on stationary data) often
    // resend byte-identical FSE descriptors every block without using
    // repeat mode; rebuilding a 512-entry table costs ~10k cycles and
    // dominated record-style corpora (~29% of decode), so keep the counts
    // that produced each block-local table and reuse it on an exact match
    std::vector<int> ll_counts, of_counts, ml_counts;
    int ll_al = -1, of_al = -1, ml_al = -1;
};

// overlap-copy helper tables (offset < 8 pattern expansion)
static const unsigned kInc32[8] = {0, 1, 2, 1, 0, 4, 4, 4};
static const int kDec64[8] = {0, 0, 0, -1, -4, 1, 2, 3};

SeqTable g_ll_def, g_of_def, g_ml_def;
// Thread-safe lazy init (magic static): decode_frame fans blocks out to
// the worker pool, so the first decompression reaches this concurrently
// (TSAN round-5 finding — same plain-bool-guard race as the encoder's
// enc_init, with the same reallocation hazard).
void init_defaults() {
    static const bool done = [] {
        std::vector<uint16_t> ss;
        std::vector<int> ns;
        build_seq_table(std::vector<int>(LL_DEF, LL_DEF + 36), 6, SEQ_LL, g_ll_def, ss, ns);
        build_seq_table(std::vector<int>(OF_DEF, OF_DEF + 29), 5, SEQ_OF, g_of_def, ss, ns);
        build_seq_table(std::vector<int>(ML_DEF, ML_DEF + 53), 6, SEQ_ML, g_ml_def, ss, ns);
        return true;
    }();
    (void)done;
}

// Parse one table descriptor; leaves the active-table pointer in `act`
// (predef tables are shared by pointer, never copied).  Returns new pos
// or -1.
long long read_seq_table(DCtx& ctx, const uint8_t* block, size_t bsize, size_t pos,
                         int mode, const SeqTable& predef, int kind, int max_code,
                         int max_al, SeqTable& t, const SeqTable*& act) {
    if (mode == 0) { act = &predef; return (long long)pos; }
    if (mode == 1) {
        if (pos >= bsize) return -1;
        int sym = block[pos];
        if (sym > max_code) return -1;
        // invalidate the build-skip cache: t no longer matches the counts
        (kind == SEQ_LL ? ctx.ll_al : kind == SEQ_OF ? ctx.of_al : ctx.ml_al) = -1;
        t.al = 0;
        t.e.resize(1);
        t.e[0].new_state = 0;
        t.e[0].nb_state = 0;
        seq_value_fields(kind, (unsigned)sym, t.e[0]);
        t.valid = true;
        act = &t;
        return (long long)(pos + 1);
    }
    if (mode == 2) {
        std::vector<int>& counts = ctx.counts_scratch;
        int al;
        long long consumed = read_ncount(block + pos, bsize - pos, max_code, max_al, counts, al);
        if (consumed < 0) return -1;
        std::vector<int>& prev = kind == SEQ_LL ? ctx.ll_counts
                               : kind == SEQ_OF ? ctx.of_counts : ctx.ml_counts;
        int& prev_al = kind == SEQ_LL ? ctx.ll_al
                     : kind == SEQ_OF ? ctx.of_al : ctx.ml_al;
        if (t.valid && al == prev_al && counts == prev) {
            act = &t;  // identical descriptor: reuse the built table
            return (long long)(pos + consumed);
        }
        if (!build_seq_table(counts, al, kind, t, ctx.sym_scratch, ctx.next_scratch)) {
            prev_al = -1;
            return -1;
        }
        prev = counts;
        prev_al = al;
        act = &t;
        return (long long)(pos + consumed);
    }
    if (act == nullptr || !act->valid) return -1;  // repeat without previous
    return (long long)pos;
}

// Decompress one compressed block directly into dst at opos (history =
// dst[base..opos)).  false on error.
bool decode_block(DCtx& ctx, const uint8_t* block, size_t bsize,
                  uint8_t* dst, size_t& opos, size_t base, size_t cap) {
    init_defaults();
    if (bsize < 1) return false;
    PROF_T(prof_t0);
    // ---- literals section
    uint8_t b0 = block[0];
    int ltype = b0 & 3;
    int sf = (b0 >> 2) & 3;
    size_t pos = 0;
    std::vector<uint8_t>& lits = ctx.lits;
    const uint8_t* lits_p = nullptr;  // literal bytes (may point into block)
    size_t lits_n = 0;                // logical literal count
    size_t lits_wild = 0;             // bytes safely readable from lits_p
    if (ltype <= 1) {
        size_t rs;
        if (sf == 0 || sf == 2) { rs = b0 >> 3; pos = 1; }
        else if (sf == 1) {
            if (bsize < 2) return false;
            rs = (b0 >> 4) + ((size_t)block[1] << 4); pos = 2;
        } else {
            if (bsize < 3) return false;
            rs = (b0 >> 4) + ((size_t)block[1] << 4) + ((size_t)block[2] << 12); pos = 3;
        }
        if (ltype == 0) {
            if (pos + rs > bsize) return false;
            lits_p = block + pos;
            lits_n = rs;
            size_t slack = bsize - (pos + rs);
            lits_wild = rs + (slack < 16 ? slack : 16);
            pos += rs;
        } else {
            if (pos >= bsize) return false;
            lits.assign(rs + 16, block[pos]);
            lits_p = lits.data();
            lits_n = rs;
            lits_wild = rs + 16;
            pos += 1;
        }
    } else {
        size_t rs, cs;
        int streams;
        if (sf == 0) {
            if (bsize < 3) return false;
            streams = 1;
            rs = (b0 >> 4) + ((size_t)(block[1] & 0x3F) << 4);
            cs = (block[1] >> 6) + ((size_t)block[2] << 2);
            pos = 3;
        } else if (sf == 1) {
            if (bsize < 3) return false;
            streams = 4;
            rs = (b0 >> 4) + ((size_t)(block[1] & 0x3F) << 4);
            cs = (block[1] >> 6) + ((size_t)block[2] << 2);
            pos = 3;
        } else if (sf == 2) {
            if (bsize < 4) return false;
            streams = 4;
            rs = (b0 >> 4) + ((size_t)block[1] << 4) + ((size_t)(block[2] & 3) << 12);
            cs = (block[2] >> 2) + ((size_t)block[3] << 6);
            pos = 4;
        } else {
            if (bsize < 5) return false;
            streams = 4;
            rs = (b0 >> 4) + ((size_t)block[1] << 4) + ((size_t)(block[2] & 0x3F) << 12);
            cs = (block[2] >> 6) + ((size_t)block[3] << 2) + ((size_t)block[4] << 10);
            pos = 5;
        }
        if (pos + cs > bsize) return false;
        const uint8_t* payload = block + pos;
        size_t off = 0;
        if (ltype == 2) {
            std::vector<int> weights;
            long long consumed = read_huf_weights(payload, cs, weights);
            if (consumed < 0) return false;
            if (!build_huf_table(weights, ctx.huf)) return false;
            off = (size_t)consumed;
        }
        if (!ctx.huf.valid) return false;
        lits.resize(rs + 16);
        lits_p = lits.data();
        lits_n = rs;
        lits_wild = rs + 16;
        const uint8_t* body = payload + off;
        size_t body_n = cs - off;
        if (streams == 1) {
            if (!huf_decode_stream(body, body_n, ctx.huf, lits.data(), rs)) return false;
        } else {
            if (body_n < 6) return false;
            size_t s1 = body[0] | ((size_t)body[1] << 8);
            size_t s2 = body[2] | ((size_t)body[3] << 8);
            size_t s3 = body[4] | ((size_t)body[5] << 8);
            if (6 + s1 + s2 + s3 > body_n) return false;
            size_t per = (rs + 3) / 4;
            if (3 * per > rs) return false;
            const uint8_t* sp = body + 6;
            size_t sizes[4] = {s1, s2, s3, body_n - 6 - s1 - s2 - s3};
            size_t outs[4] = {per, per, per, rs - 3 * per};
            const uint8_t* sps[4];
            uint8_t* ops[4];
            size_t o = 0;
            for (int i = 0; i < 4; i++) {
                sps[i] = sp;
                ops[i] = lits.data() + o;
                sp += sizes[i];
                o += outs[i];
            }
            if (!huf_decode_4streams(sps, sizes, ops, outs, ctx.huf)) return false;
        }
        pos += cs;
    }
    // ---- sequences section
    PROF_ACC(0, prof_t0);
    PROF_ADD(4, lits_n);
    PROF_T(prof_t1);
    if (pos >= bsize) return false;
    size_t nb_seq;
    uint8_t s0 = block[pos];
    if (s0 < 128) { nb_seq = s0; pos += 1; }
    else if (s0 < 255) {
        if (pos + 2 > bsize) return false;
        nb_seq = ((size_t)(s0 - 128) << 8) + block[pos + 1];
        pos += 2;
    } else {
        if (pos + 3 > bsize) return false;
        nb_seq = block[pos + 1] + ((size_t)block[pos + 2] << 8) + 0x7F00;
        pos += 3;
    }
    if (nb_seq == 0) {
        if (opos + lits_n > cap) return false;
        memcpy(dst + opos, lits_p, lits_n);
        opos += lits_n;
        return true;
    }
    size_t op = opos;  // local cursor: the reference param would be
                       // reloaded around every byte store (char aliasing)
    if (pos >= bsize) return false;
    uint8_t modes = block[pos++];
    if (modes & 3) return false;
    long long r;
    r = read_seq_table(ctx, block, bsize, pos, (modes >> 6) & 3, g_ll_def, SEQ_LL, 35, 9,
                       ctx.ll, ctx.llp);
    if (r < 0) return false; pos = (size_t)r;
    r = read_seq_table(ctx, block, bsize, pos, (modes >> 4) & 3, g_of_def, SEQ_OF, 31, 8,
                       ctx.of, ctx.ofp);
    if (r < 0) return false; pos = (size_t)r;
    r = read_seq_table(ctx, block, bsize, pos, (modes >> 2) & 3, g_ml_def, SEQ_ML, 52, 9,
                       ctx.ml, ctx.mlp);
    if (r < 0) return false; pos = (size_t)r;

    PROF_ACC(1, prof_t1);
    PROF_ADD(3, nb_seq);
    PROF_T(prof_t2);
    BackBits br;
    if (!br.init(block + pos, bsize - pos)) return false;
    uint32_t ll_state = br.read(ctx.llp->al);
    uint32_t of_state = br.read(ctx.ofp->al);
    uint32_t ml_state = br.read(ctx.mlp->al);
    size_t lit_pos = 0;
    uint64_t r0 = ctx.rep[0], r1 = ctx.rep[1], r2 = ctx.rep[2];
    const SeqEnt* LLT = ctx.llp->e.data();
    const SeqEnt* OFT = ctx.ofp->e.data();
    const SeqEnt* MLT = ctx.mlp->e.data();
    const uint8_t* sdata = br.data;
    size_t ssize = br.size;

    // one sequence's output: literal run + rep resolution + match copy
    auto emit = [&](uint64_t ll_val, uint64_t ml_val, uint64_t of_val) -> bool {
        if (ll_val) {
            if (lit_pos + ll_val > lits_n) return false;
            if (ll_val <= 16 && lit_pos + 16 <= lits_wild && op + 16 <= cap) {
                memcpy(dst + op, lits_p + lit_pos, 16);
            } else {
                if (op + ll_val > cap) return false;
                memcpy(dst + op, lits_p + lit_pos, ll_val);
            }
            op += ll_val;
            lit_pos += ll_val;
        }
        uint64_t offset;
        if (of_val > 3) {
            offset = of_val - 3;
            r2 = r1; r1 = r0; r0 = offset;
        } else if (ll_val != 0) {
            if (of_val == 1) offset = r0;
            else if (of_val == 2) { offset = r1; r1 = r0; r0 = offset; }
            else { offset = r2; r2 = r1; r1 = r0; r0 = offset; }
        } else {
            if (of_val == 1) { offset = r1; r1 = r0; r0 = offset; }
            else if (of_val == 2) { offset = r2; r2 = r1; r1 = r0; r0 = offset; }
            else {
                offset = r0 - 1;
                if (offset == 0) return false;
                r2 = r1; r1 = r0; r0 = offset;
            }
        }
        if (offset > op - base) return false;
        uint8_t* o = dst + op;
        const uint8_t* m = o - offset;
        if (op + ml_val + 32 <= cap) {
            uint8_t* cpend = o + ml_val;
            if (offset >= 32 && ml_val > 32 && op + ml_val + 64 <= cap) {
                // long matches at non-overlapping-within-32 offsets: 64 B/iter
                // (two ordered 32 B copies are correct for offset >= 32); this
                // loop overshoots up to 63 B past cpend, hence its own +64 cap
                // guard — measured +9% on long-match-dominated data vs 32 B/iter
                do {
                    memcpy(o, m, 32); memcpy(o + 32, m + 32, 32);
                    o += 64; m += 64;
                } while (o < cpend);
            } else if (offset >= 16) {
                // 32 B/iter (libzstd wildcopy width)
                do {
                    memcpy(o, m, 16); memcpy(o + 16, m + 16, 16);
                    o += 32; m += 32;
                } while (o < cpend);
            } else if (offset >= 8) {
                // successive 8 B copies are ordered, so a 16 B/iter pair is
                // safe at any offset >= 8
                do {
                    memcpy(o, m, 8); memcpy(o + 8, m + 8, 8);
                    o += 16; m += 16;
                } while (o < cpend);
            } else {
                o[0] = m[0]; o[1] = m[1]; o[2] = m[2]; o[3] = m[3];
                m += kInc32[offset];
                memcpy(o + 4, m, 4);
                m -= kDec64[offset];
                o += 8;
                // effective offset is 8 from here: ordered 8 B pairs
                while (o < cpend) {
                    memcpy(o, m, 8); memcpy(o + 8, m + 8, 8);
                    o += 16; m += 16;
                }
            }
            op += ml_val;
        } else {
            if (op + ml_val > cap) return false;
            for (uint64_t k = 0; k < ml_val; k++) o[k] = m[k];
            op += ml_val;
        }
        return true;
    };

    size_t i = 0;
    // Fast path: a 64-bit window replaces per-read loads — two 8-byte loads
    // per sequence, every field extracted with register shifts.  Worst-case
    // bit budget per sequence is 89 (of 31 + ml 16 + ll 16 + states 26);
    // requiring bits_left >= 104 guarantees both windows sit fully inside
    // the buffer, so the tail (and any corrupt under-run) takes the exact
    // BackBits path below with unchanged semantics.
    while (i + 1 < nb_seq && br.bits_left >= 104) {
        size_t byte_end = (size_t)((br.bits_left + 7) >> 3);
        if (byte_end > ssize) break;
        uint64_t w;
        memcpy(&w, sdata + byte_end - 8, 8);
        long long wbase = (long long)(byte_end - 8) * 8;
        long long bl = br.bits_left;
        const SeqEnt oe = OFT[of_state];
        const SeqEnt me = MLT[ml_state];
        const SeqEnt le = LLT[ll_state];
        // Branch around zero-bit extra reads (libzstd's trick): ll/ml
        // extras are 0 for ll<16 / ml<35, i.e. almost always on typical
        // data, and the branches predict near-perfectly — measured
        // text-decode 0.67x -> 0.82x libzstd vs unconditional masked reads.
        uint64_t of_val = oe.base;
        if (oe.nb_extra) {
            bl -= oe.nb_extra;
            of_val += (w >> ((bl - wbase) & 63)) & kBitMask[oe.nb_extra];
        }
        uint64_t ml_val = me.base;
        if (me.nb_extra) {
            bl -= me.nb_extra;
            ml_val += (w >> ((bl - wbase) & 63)) & kBitMask[me.nb_extra];
        }
        if (bl - wbase < 42) {  // reload only when ll extra + states (<=42
            // bits) might not fit the current window; bl >= 57 here
            byte_end = (size_t)((bl + 7) >> 3);
            memcpy(&w, sdata + byte_end - 8, 8);
            wbase = (long long)(byte_end - 8) * 8;
        }
        uint64_t ll_val = le.base;
        if (le.nb_extra) {
            bl -= le.nb_extra;
            ll_val += (w >> ((bl - wbase) & 63)) & kBitMask[le.nb_extra];
        }
        bl -= le.nb_state;
        ll_state = le.new_state + (uint32_t)((w >> ((bl - wbase) & 63)) & kBitMask[le.nb_state]);
        bl -= me.nb_state;
        ml_state = me.new_state + (uint32_t)((w >> ((bl - wbase) & 63)) & kBitMask[me.nb_state]);
        bl -= oe.nb_state;
        of_state = oe.new_state + (uint32_t)((w >> ((bl - wbase) & 63)) & kBitMask[oe.nb_state]);
        br.bits_left = bl;
        if (!emit(ll_val, ml_val, of_val)) return false;
        i++;
    }
    // exact tail: bit-window semantics identical to the reference reader
    for (; i < nb_seq; i++) {
        const SeqEnt& oe = OFT[of_state];
        uint64_t of_val = oe.base + (oe.nb_extra ? br.read(oe.nb_extra) : 0);
        const SeqEnt& me = MLT[ml_state];
        uint64_t ml_val = me.base + (me.nb_extra ? br.read(me.nb_extra) : 0);
        const SeqEnt& le = LLT[ll_state];
        uint64_t ll_val = le.base + (le.nb_extra ? br.read(le.nb_extra) : 0);
        if (i + 1 < nb_seq) {
            ll_state = le.new_state + br.read(le.nb_state);
            ml_state = me.new_state + br.read(me.nb_state);
            of_state = oe.new_state + br.read(oe.nb_state);
        }
        if (!emit(ll_val, ml_val, of_val)) return false;
    }
    ctx.rep[0] = r0; ctx.rep[1] = r1; ctx.rep[2] = r2;
    if (lit_pos > lits_n) return false;
    size_t tail = lits_n - lit_pos;
    if (op + tail > cap) return false;
    memcpy(dst + op, lits_p + lit_pos, tail);
    op += tail;
    PROF_ACC(2, prof_t2);
    PROF_ADD(5, op - opos);
    opos = op;
    return true;
}

}  // namespace

namespace {

struct FrameInfo {
    size_t blocks;           // offset of the first block header
    size_t end;              // one past the frame (incl. checksum)
    uint64_t content_size;   // ~0ull when not declared
};

// Parse one frame's header + hop its block headers. Returns false on
// malformed input. `pos` is at the frame magic on entry, past it on exit.
bool scan_frame(const uint8_t* src, size_t n, size_t& pos, FrameInfo& fi) {
    pos += 4;  // magic (checked by caller)
    if (pos >= n) return false;
    uint8_t fhd = src[pos++];
    int fcs_flag = fhd >> 6;
    bool single_seg = fhd & 0x20;
    if (fhd & 0x08) return false;
    bool has_checksum = fhd & 0x04;
    int did_flag = fhd & 3;
    if (!single_seg) {
        if (pos >= n) return false;
        pos++;  // window descriptor
    }
    static const int did_len[4] = {0, 1, 2, 4};
    if (did_flag) {
        if (pos + (size_t)did_len[did_flag] > n) return false;
        uint32_t dict_id = 0;
        for (int i = 0; i < did_len[did_flag]; i++) dict_id |= (uint32_t)src[pos + i] << (8 * i);
        pos += did_len[did_flag];
        if (dict_id != 0) return false;  // external dicts unsupported
    }
    int fcs_len = (fcs_flag == 0) ? (single_seg ? 1 : 0) : (fcs_flag == 1 ? 2 : fcs_flag == 2 ? 4 : 8);
    if (pos + (size_t)fcs_len > n) return false;
    uint64_t csize = ~0ull;
    if (fcs_len) {
        csize = 0;
        for (int i = 0; i < fcs_len; i++) csize |= (uint64_t)src[pos + i] << (8 * i);
        if (fcs_len == 2) csize += 256;
    }
    pos += fcs_len;
    fi.blocks = pos;
    fi.content_size = csize;
    // hop block headers
    while (true) {
        if (n - pos < 3) return false;
        uint32_t bh = src[pos] | ((uint32_t)src[pos + 1] << 8) | ((uint32_t)src[pos + 2] << 16);
        pos += 3;
        int btype = (bh >> 1) & 3;
        size_t bsize = bh >> 3;
        if (btype == 3) return false;
        size_t payload = btype == 1 ? 1 : bsize;
        if (pos + payload > n) return false;
        pos += payload;
        if (bh & 1) break;
    }
    if (has_checksum) {
        if (n - pos < 4) return false;
        pos += 4;  // content checksum verified at the zpack layer via XXH3
    }
    fi.end = pos;
    return true;
}

// Decode one frame's blocks into dst[0..cap). Returns produced or -1.
size_t decode_frame(const uint8_t* src, size_t n, const FrameInfo& fi,
                    uint8_t* dst, size_t cap) {
    size_t pos = fi.blocks;
    size_t opos = 0;
    DCtx ctx;
    while (true) {
        uint32_t bh = src[pos] | ((uint32_t)src[pos + 1] << 8) | ((uint32_t)src[pos + 2] << 16);
        pos += 3;
        int last = bh & 1;
        int btype = (bh >> 1) & 3;
        size_t bsize = bh >> 3;
        if (btype == 0) {  // raw
            if (opos + bsize > cap) return (size_t)-1;
            memcpy(dst + opos, src + pos, bsize);
            opos += bsize;
            pos += bsize;
        } else if (btype == 1) {  // RLE
            if (opos + bsize > cap) return (size_t)-1;
            memset(dst + opos, src[pos], bsize);
            opos += bsize;
            pos += 1;
        } else {  // compressed (scan_frame rejected btype 3)
            if (!decode_block(ctx, src + pos, bsize, dst, opos, 0, cap)) return (size_t)-1;
            pos += bsize;
        }
        if (last) break;
    }
    (void)n;
    return opos;
}

}  // namespace

extern "C" {

// Decompress concatenated zstd frames. Returns output size or (size_t)-1.
// Multi-frame inputs with declared content sizes decode frame-parallel.
size_t zn_zstd_decompress(const uint8_t* src, size_t n, uint8_t* dst, size_t cap) {
    // scan pass: frame boundaries + declared sizes (headers only, cheap)
    std::vector<FrameInfo> frames;
    bool all_sized = true;
    size_t pos = 0;
    while (pos < n) {
        if (n - pos < 4) return (size_t)-1;
        uint32_t magic;
        memcpy(&magic, src + pos, 4);
        if (magic >= 0x184D2A50u && magic <= 0x184D2A5Fu) {  // skippable
            if (n - pos < 8) return (size_t)-1;
            uint32_t sz;
            memcpy(&sz, src + pos + 4, 4);
            if (n - pos < 8 + (size_t)sz) return (size_t)-1;
            pos += 8 + sz;
            continue;
        }
        if (magic != 0xFD2FB528u) return (size_t)-1;
        FrameInfo fi;
        if (!scan_frame(src, n, pos, fi)) return (size_t)-1;
        if (fi.content_size == ~0ull) all_sized = false;
        frames.push_back(fi);
    }
    unsigned nt = zn_nthreads();
    if (all_sized && frames.size() >= 2 && nt >= 2) {
        size_t nf = frames.size();
        std::vector<size_t> offs(nf + 1, 0);
        for (size_t i = 0; i < nf; i++) {
            if (frames[i].content_size > cap - offs[i]) return (size_t)-1;
            offs[i + 1] = offs[i] + frames[i].content_size;
        }
        std::atomic<bool> bad{false};
        zn_parallel_for(nf, nt, [&](size_t i) {
            size_t want = frames[i].content_size;
            size_t got = decode_frame(src, n, frames[i], dst + offs[i], want);
            if (got != want) bad.store(true);
        });
        if (bad.load()) return (size_t)-1;
        return offs[nf];
    }
    size_t opos = 0;
    for (const FrameInfo& fi : frames) {
        size_t got = decode_frame(src, n, fi, dst + opos, cap - opos);
        if (got == (size_t)-1) return (size_t)-1;
        if (fi.content_size != ~0ull && got != fi.content_size) return (size_t)-1;
        opos += got;
    }
    return opos;
}

// ---------------------------------------------------------------------------
// Incremental streaming decoder (role parity: ZSTD_decompressStream as used
// by the reference's chunked read loop, lib/zpack_read.c:572).  Feed
// arbitrary chunks; blocks decode the moment they complete into a rolling
// window buffer (history = frame window size), so memory stays bounded for
// arbitrarily long frames — the contract behind BASELINE's
// "1 GB single-frame stream decode in bounded RSS at native speed".
// ---------------------------------------------------------------------------

namespace {

constexpr size_t kBlockMax = 1u << 17;      // RFC 8878 Block_Maximum_Size cap
constexpr size_t kWindowMax = 1u << 27;     // refuse larger windows (libzstd default limit)
constexpr size_t kWildSlack = 64;           // wildcopy overshoot room

struct ZnDStream {
    DCtx ctx;
    std::vector<uint8_t> in;    // unparsed input tail
    std::vector<uint8_t> win;   // rolling decode buffer (history + fresh)
    size_t wpos = 0;            // end of decoded data in win
    size_t flushed = 0;         // [0, flushed) already handed to the caller
    size_t window = 0;
    size_t skip_left = 0;
    int state = 0;              // 0 magic, 1 skippable, 2 blocks, 3 checksum
    bool has_checksum = false;
    bool error = false;

    // Make room for one more block: slide consumed history out, keeping the
    // window plus any unflushed bytes; grow only if the caller isn't
    // draining (their memory, their call).
    bool ensure_room(size_t need) {
        if (wpos + need + kWildSlack <= win.size()) return true;
        size_t keep_from = wpos > window ? wpos - window : 0;
        if (keep_from > flushed) keep_from = flushed;
        if (keep_from) {
            memmove(win.data(), win.data() + keep_from, wpos - keep_from);
            wpos -= keep_from;
            flushed -= keep_from;
        }
        if (wpos + need + kWildSlack > win.size())
            win.resize(wpos + need + kWildSlack + window);
        return true;
    }
};

// Parse a frame header at p (past the magic). Returns bytes consumed, 0 if
// more input is needed, -1 if malformed.  Mirrors scan_frame's field logic.
long long parse_stream_header(const uint8_t* p, size_t n, size_t& window,
                              bool& has_checksum) {
    if (n < 1) return 0;
    uint8_t fhd = p[0];
    size_t pos = 1;
    int fcs_flag = fhd >> 6;
    bool single_seg = fhd & 0x20;
    if (fhd & 0x08) return -1;
    has_checksum = fhd & 0x04;
    int did_flag = fhd & 3;
    uint64_t win_sz = 0;
    if (!single_seg) {
        if (n < pos + 1) return 0;
        uint8_t wd = p[pos++];
        int exp = 10 + (wd >> 3);
        uint64_t base = 1ull << exp;
        win_sz = base + (base >> 3) * (wd & 7);
    }
    static const int did_len[4] = {0, 1, 2, 4};
    if (did_flag) {
        if (n < pos + (size_t)did_len[did_flag]) return 0;
        uint32_t dict_id = 0;
        for (int i = 0; i < did_len[did_flag]; i++) dict_id |= (uint32_t)p[pos + i] << (8 * i);
        pos += did_len[did_flag];
        if (dict_id != 0) return -1;  // external dicts unsupported here
    }
    int fcs_len = (fcs_flag == 0) ? (single_seg ? 1 : 0)
                                  : (fcs_flag == 1 ? 2 : fcs_flag == 2 ? 4 : 8);
    if (n < pos + (size_t)fcs_len) return 0;
    uint64_t csize = ~0ull;
    if (fcs_len) {
        csize = 0;
        for (int i = 0; i < fcs_len; i++) csize |= (uint64_t)p[pos + i] << (8 * i);
        if (fcs_len == 2) csize += 256;
    }
    pos += fcs_len;
    if (single_seg) win_sz = csize;
    if (win_sz > kWindowMax) return -1;
    window = (size_t)win_sz;
    return (long long)pos;
}

}  // namespace

extern "C" void* zn_zstd_dstream_new() { return new (std::nothrow) ZnDStream(); }

extern "C" void zn_zstd_dstream_free(void* p) { delete (ZnDStream*)p; }

// Decoded-but-unread byte count (so callers can size the read buffer).
extern "C" size_t zn_zstd_dstream_pending(void* p) {
    ZnDStream& s = *(ZnDStream*)p;
    return s.wpos - s.flushed;
}

// Feed a chunk; decodes every block that completes.  Returns 0, or -1 on
// malformed input (including a truncated stream when is_final).
extern "C" int zn_zstd_dstream_feed(void* p, const uint8_t* src, size_t n,
                                    int is_final) {
    ZnDStream& s = *(ZnDStream*)p;
    if (s.error) return -1;
    s.in.insert(s.in.end(), src, src + n);
    const uint8_t* b = s.in.data();
    size_t len = s.in.size();
    size_t pos = 0;
    bool need_more = false;
    while (!need_more) {
        switch (s.state) {
        case 0: {  // frame magic
            if (len - pos < 4) { need_more = true; break; }
            uint32_t magic;
            memcpy(&magic, b + pos, 4);
            if (magic >= 0x184D2A50u && magic <= 0x184D2A5Fu) {
                if (len - pos < 8) { need_more = true; break; }
                uint32_t sz;
                memcpy(&sz, b + pos + 4, 4);
                pos += 8;
                s.skip_left = sz;
                s.state = 1;
                break;
            }
            if (magic != 0xFD2FB528u) { s.error = true; return -1; }
            size_t window;
            bool has_chk;
            long long used = parse_stream_header(b + pos + 4, len - pos - 4, window, has_chk);
            if (used < 0) { s.error = true; return -1; }
            if (used == 0) { need_more = true; break; }
            pos += 4 + (size_t)used;
            s.window = window ? window : kBlockMax;
            s.has_checksum = has_chk;
            // fresh per-frame codec state (tables must not leak across frames)
            s.ctx.rep[0] = 1; s.ctx.rep[1] = 4; s.ctx.rep[2] = 8;
            s.ctx.llp = s.ctx.ofp = s.ctx.mlp = nullptr;
            s.ctx.huf.valid = false;
            // over-allocate several windows' worth so the history slide
            // (a window-sized memmove) amortizes to <=1/4 byte moved per
            // byte decoded instead of firing every block
            size_t span = s.window + (s.window > (8u << 20) ? s.window * 4
                                                            : (size_t)(32u << 20));
            if (s.win.size() < span + 2 * kBlockMax + kWildSlack)
                s.win.resize(span + 2 * kBlockMax + kWildSlack);
            s.state = 2;
            break;
        }
        case 1: {  // skippable payload
            size_t take = len - pos < s.skip_left ? len - pos : s.skip_left;
            pos += take;
            s.skip_left -= take;
            if (s.skip_left == 0) s.state = 0;
            else need_more = true;
            break;
        }
        case 2: {  // block
            if (len - pos < 3) { need_more = true; break; }
            uint32_t bh = b[pos] | ((uint32_t)b[pos + 1] << 8) | ((uint32_t)b[pos + 2] << 16);
            int last = bh & 1;
            int btype = (bh >> 1) & 3;
            size_t bsize = bh >> 3;
            if (btype == 3 || bsize > (btype == 0 ? (size_t)(1u << 21) : kBlockMax)) {
                s.error = true;
                return -1;
            }
            size_t payload = btype == 1 ? 1 : bsize;
            if (len - pos < 3 + payload) { need_more = true; break; }
            s.ensure_room(btype == 0 ? bsize : kBlockMax);
            const uint8_t* bp = b + pos + 3;
            if (btype == 0) {  // raw
                memcpy(s.win.data() + s.wpos, bp, bsize);
                s.wpos += bsize;
            } else if (btype == 1) {  // RLE
                memset(s.win.data() + s.wpos, bp[0], bsize);
                s.wpos += bsize;
            } else {
                if (!decode_block(s.ctx, bp, bsize, s.win.data(), s.wpos, 0,
                                  s.win.size() - kWildSlack)) {
                    s.error = true;
                    return -1;
                }
            }
            pos += 3 + payload;
            if (last) s.state = s.has_checksum ? 3 : 0;
            break;
        }
        case 3: {  // content checksum: zpack verifies via XXH3 at its layer
            if (len - pos < 4) { need_more = true; break; }
            pos += 4;
            s.state = 0;
            break;
        }
        }
    }
    s.in.erase(s.in.begin(), s.in.begin() + pos);
    if (is_final && (s.state != 0 || !s.in.empty())) { s.error = true; return -1; }
    return 0;
}

// Move up to cap decoded bytes to dst; returns the count.
extern "C" size_t zn_zstd_dstream_read(void* p, uint8_t* dst, size_t cap) {
    ZnDStream& s = *(ZnDStream*)p;
    size_t take = s.wpos - s.flushed;
    if (take > cap) take = cap;
    memcpy(dst, s.win.data() + s.flushed, take);
    s.flushed += take;
    return take;
}

}  // extern "C"
