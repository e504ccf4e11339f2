"""Micro-benchmark: native zstd single-frame decode throughput.

Isolates the sequence-loop / entropy decode path (single thread, one frame)
against the libzstd C library oracle on the same bytes.

Usage: python scripts/decode_perf.py [level] [mb]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import zstandard  # oracle

from bench import build_corpus
from zpack_tpu import native


def main():
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    data = build_corpus(mb << 20)
    # one single frame compressed by libzstd (typical interop payload)
    comp = zstandard.ZstdCompressor(level=level).compress(data)
    print(f"corpus {len(data)} B, compressed {len(comp)} B (ratio {len(data)/len(comp):.3f})")

    lib = native.get_lib()
    assert lib is not None
    # ours
    out = native.zstd_decompress(comp, len(data))
    assert out == data, "native decode mismatch!"
    reps = max(5, (64 << 20) // len(data))
    # best-of-N single calls, ours/lib interleaved: scheduler noise and CPU
    # frequency drift hit both sides equally and the min discards them
    dctx = zstandard.ZstdDecompressor()
    dctx.decompress(comp, max_output_size=len(data))  # warm
    b_ours = b_lib = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        native.zstd_decompress(comp, len(data))
        t1 = time.perf_counter()
        dctx.decompress(comp, max_output_size=len(data))
        t2 = time.perf_counter()
        b_ours = min(b_ours, t1 - t0)
        b_lib = min(b_lib, t2 - t1)
    ours = len(data) / b_ours / 1e9
    theirs = len(data) / b_lib / 1e9
    print(f"ours   {ours:.3f} GB/s")
    print(f"libzstd {theirs:.3f} GB/s  (ratio ours/lib {ours/theirs:.3f})")
    _ = lib


if __name__ == "__main__":
    main()
