"""Characterize native zstd decode vs libzstd across data shapes.

Each shape stresses a different decoder phase: Huffman literal decode,
the FSE sequence loop, match copies (short/long offsets), raw literals.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import random

import zstandard

from zpack_tpu import native


def gen(kind: str, n: int) -> bytes:
    rng = random.Random(7)
    if kind == "text":  # prose-like: mixed literals + mid matches
        words = [bytes(rng.choices(range(97, 123), k=rng.randint(3, 9))) for _ in range(800)]
        out = bytearray()
        while len(out) < n:
            out += rng.choice(words) + b" "
        return bytes(out[:n])
    if kind == "random":  # incompressible: raw-literal blocks
        return rng.randbytes(n)
    if kind == "rep":  # highly repetitive: long matches, few sequences
        unit = rng.randbytes(512)
        return (unit * (n // 512 + 1))[:n]
    if kind == "records":  # short repeated stride: many short matches/rep offsets
        rec = bytearray(rng.randbytes(64))
        out = bytearray()
        while len(out) < n:
            rec[rng.randrange(64)] = rng.randrange(256)
            out += rec
        return bytes(out[:n])
    if kind == "base64ish":  # low-entropy literals: Huffman-dominated
        return bytes(rng.choices(b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdef", k=n))
    raise ValueError(kind)


def main():
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n = 8 << 20
    assert native.get_lib() is not None
    for kind in ["text", "base64ish", "records", "rep", "random"]:
        data = gen(kind, n)
        comp = zstandard.ZstdCompressor(level=level).compress(data)
        out = native.zstd_decompress(comp, n)
        assert out == data, kind
        reps = max(3, (96 << 20) // n)
        t0 = time.perf_counter()
        for _ in range(reps):
            native.zstd_decompress(comp, n)
        ours = n * reps / (time.perf_counter() - t0) / 1e9
        d = zstandard.ZstdDecompressor()
        t0 = time.perf_counter()
        for _ in range(reps):
            d.decompress(comp, max_output_size=n)
        lib = n * reps / (time.perf_counter() - t0) / 1e9
        print(f"{kind:10s} ratio {n/len(comp):7.2f}  ours {ours:6.3f}  lib {lib:6.3f}  rel {ours/lib:.3f}")


if __name__ == "__main__":
    main()
