// Shared worker-thread helpers for the native backend's parallel codecs.
#pragma once

#include <atomic>
#include <cstdlib>
#include <thread>
#include <vector>

// Worker-thread count for the parallel frame codecs (blocks/frames are
// independent).  ZPACK_NATIVE_THREADS overrides; default = hardware
// concurrency, capped.
inline unsigned zn_nthreads() {
    static unsigned n = [] {
        const char* e = getenv("ZPACK_NATIVE_THREADS");
        unsigned hw = std::thread::hardware_concurrency();
        long v = e ? atol(e) : (hw ? hw : 1);
        if (v < 1) v = 1;
        if (v > 16) v = 16;
        return (unsigned)v;
    }();
    return n;
}

// Run fn(i) for i in [0, n) across `nt` threads (including the caller).
template <typename F>
inline void zn_parallel_for(size_t n, unsigned nt, F fn) {
    std::atomic<size_t> next{0};
    auto worker = [&] {
        for (size_t i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    };
    std::vector<std::thread> ts;
    for (unsigned t = 1; t < nt && t < n; t++) ts.emplace_back(worker);
    worker();
    for (auto& t : ts) t.join();
}
