"""Phase-split profile of the native zstd decoder.

Builds a -DZPACK_PROF variant of the native backend (rdtsc accumulators in
decode_block, see native/zstd_decode.cpp), runs single-thread decode over
the real-corpus shapes, and prints per-phase shares + ns/seq — the data
that decides WHERE decode optimization effort goes.

Usage: python scripts/profile_native.py [level] [mb_per_shape]
"""
import ctypes
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import zstandard

SO = pathlib.Path("/tmp/zpack_prof/_zpack_native_prof.so")


def build() -> None:
    SO.parent.mkdir(parents=True, exist_ok=True)
    srcs = sorted((REPO / "native").glob("*.cpp"))
    if SO.exists() and all(SO.stat().st_mtime >= s.stat().st_mtime for s in srcs):
        return
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", "-DZPACK_PROF",
         "-shared", "-fPIC", "-pthread", *[str(s) for s in srcs], "-o", str(SO)],
        check=True, timeout=300,
    )


def main() -> None:
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    build()
    os.environ["ZPACK_TPU_NATIVE_SO"] = str(SO)
    os.environ["ZPACK_NATIVE_THREADS"] = "1"
    from zpack_tpu import native
    from scripts import corpus as corpus_mod

    lib = native.get_lib()
    assert lib is not None
    lib.zn_zstd_prof.argtypes = [ctypes.POINTER(ctypes.c_uint64)]
    lib.zn_zstd_prof.restype = None

    def prof_reset():
        buf = (ctypes.c_uint64 * 8)()
        lib.zn_zstd_prof(buf)

    def prof_read():
        buf = (ctypes.c_uint64 * 8)()
        lib.zn_zstd_prof(buf)
        return list(buf)

    shapes = {cat: corpus_mod._category_bytes(cat, mb << 20)
              for cat, _ in corpus_mod.MIX}
    print(f"{'shape':<10} {'GB/s':>6} {'lib':>6} {'ratio':>6} "
          f"{'lit%':>5} {'tab%':>5} {'seq%':>5} {'ns/seq':>7} {'B/seq':>6} {'lit/B':>6}")
    for name, data in shapes.items():
        comp = zstandard.ZstdCompressor(level=level).compress(data)
        out = native.zstd_decompress(comp, len(data))
        assert out == data, name
        d = zstandard.ZstdDecompressor()
        d.decompress(comp, max_output_size=len(data))
        reps = max(3, (48 << 20) // len(data))
        b_ours = b_lib = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            native.zstd_decompress(comp, len(data))
            t1 = time.perf_counter()
            d.decompress(comp, max_output_size=len(data))
            t2 = time.perf_counter()
            b_ours = min(b_ours, t1 - t0)
            b_lib = min(b_lib, t2 - t1)
        prof_reset()
        native.zstd_decompress(comp, len(data))
        lit_t, tab_t, seq_t, nseq, litb, outb = prof_read()[:6]
        tot = max(lit_t + tab_t + seq_t, 1)
        # rdtsc at base clock; ns/seq from the measured wall share instead
        seq_ns = b_ours * 1e9 * (seq_t / tot) / max(nseq, 1)
        print(f"{name:<10} {len(data)/b_ours/1e9:>6.3f} {len(data)/b_lib/1e9:>6.3f} "
              f"{b_lib/b_ours:>6.3f} {100*lit_t/tot:>4.0f}% {100*tab_t/tot:>4.0f}% "
              f"{100*seq_t/tot:>4.0f}% {seq_ns:>7.1f} {outb/max(nseq,1):>6.1f} "
              f"{litb/max(outb,1):>6.2f}")


if __name__ == "__main__":
    main()
