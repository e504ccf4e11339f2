// Shared worker-thread helpers for the native backend's parallel codecs.
#pragma once

#include <atomic>
#include <cstdlib>
#include <thread>
#include <vector>

// Set while the current thread is already running inside a zn_parallel_for
// worker: nested codec calls (e.g. a multi-MB entry inside a batch) must not
// spawn their own thread pools — up to nt×nt threads otherwise.
inline thread_local bool zn_in_parallel = false;

// Worker-thread count for the parallel frame codecs (blocks/frames are
// independent).  ZPACK_NATIVE_THREADS overrides; default = hardware
// concurrency, capped.  Returns 1 inside a parallel region (no nesting).
inline unsigned zn_nthreads() {
    static unsigned n = [] {
        const char* e = getenv("ZPACK_NATIVE_THREADS");
        unsigned hw = std::thread::hardware_concurrency();
        long v = e ? atol(e) : (hw ? hw : 1);
        if (v < 1) v = 1;
        if (v > 16) v = 16;
        return (unsigned)v;
    }();
    return zn_in_parallel ? 1 : n;
}

// Run fn(i) for i in [0, n) across `nt` threads (including the caller).
template <typename F>
inline void zn_parallel_for(size_t n, unsigned nt, F fn) {
    std::atomic<size_t> next{0};
    auto worker = [&] {
        bool saved = zn_in_parallel;
        zn_in_parallel = true;
        for (size_t i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
        zn_in_parallel = saved;
    };
    std::vector<std::thread> ts;
    for (unsigned t = 1; t < nt && t < n; t++) ts.emplace_back(worker);
    worker();
    for (auto& t : ts) t.join();
}
