#!/usr/bin/env python
"""Run the five BASELINE.json configurations at a chosen scale and report
throughput/ratio for each.  The corpus is Silesia-like (bench.build_corpus);
`--scale` multiplies the data sizes (1.0 ≈ tens of MB; real Silesia/enwik9
runs use the same code paths once the corpora are available).

Usage: python scripts/baseline_configs.py [--scale 0.1]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import build_corpus


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def config1(scale):
    """Single-file LZ4 archive: compress + extract one ~10MB text file."""
    from zpack_tpu import CompressOptions, CompressionMethod, Reader, Writer

    data = build_corpus(int(10e6 * scale))
    w = Writer.to_heap()
    _, enc = timed(lambda: w.write_archive(
        [("silesia.txt", data, CompressOptions(CompressionMethod.LZ4, 1))]))
    r = Reader.from_memory(w.buffer, shared=True)
    out, dec = timed(lambda: r.read_file("silesia.txt"))
    assert out == data
    return {"config": 1, "MB": len(data) / 1e6,
            "enc_MBps": round(len(data) / 1e6 / enc, 1),
            "dec_MBps": round(len(data) / 1e6 / dec, 1),
            "ratio": round(len(data) / len(w.buffer), 3)}


def config2(scale):
    """zstd-3 multi-entry archive with XXH3 verification on read."""
    from zpack_tpu import CompressOptions, CompressionMethod, Reader, Writer

    corpus = build_corpus(int(12e6 * scale))
    third = len(corpus) // 3
    files = [(f"entry{i}.bin", corpus[i * third : (i + 1) * third],
              CompressOptions(CompressionMethod.ZSTD, 3)) for i in range(3)]
    w = Writer.to_heap()
    _, enc = timed(lambda: w.write_archive(files))
    r = Reader.from_memory(w.buffer, shared=True)
    _, dec = timed(lambda: [r.read_file(n) for n, _, _ in files])
    return {"config": 2, "MB": len(corpus) / 1e6,
            "enc_MBps": round(len(corpus) / 1e6 / enc, 1),
            "dec_MBps": round(len(corpus) / 1e6 / dec, 1),
            "ratio": round(len(corpus) / len(w.buffer), 3)}


def config3(scale):
    """Streaming API: chunked write/read of a large file in 256 KiB blocks."""
    from zpack_tpu import CompressOptions, CompressionMethod, Reader, Writer
    from zpack_tpu.stream import read_file_stream_iter

    data = build_corpus(int(64e6 * scale))  # stand-in for the 1 GB config
    w = Writer.to_heap()
    w.write_header()
    w.write_data_header()

    def write():
        w.write_file_stream_begin("big.bin", CompressOptions(CompressionMethod.ZSTD, 3))
        for i in range(0, len(data), 256 << 10):
            w.write_file_stream(data[i : i + (256 << 10)])
        w.write_file_stream_end()
        w.write_cdr()
        w.write_eocdr()

    _, enc = timed(write)
    r = Reader.from_memory(w.buffer, shared=True)
    entry = r.get_file_entry("big.bin")

    def read():
        total = 0
        for chunk in read_file_stream_iter(r, entry, chunk_size=256 << 10):
            total += len(chunk)
        return total

    total, dec = timed(read)
    assert total == len(data)
    return {"config": 3, "MB": len(data) / 1e6,
            "enc_MBps": round(len(data) / 1e6 / enc, 1),
            "dec_MBps": round(len(data) / 1e6 / dec, 1),
            "ratio": round(len(data) / len(w.buffer), 3)}


def config4(scale):
    """Mixed-method archive: many small files with per-entry lz4/zstd."""
    from zpack_tpu import CompressOptions, CompressionMethod, Reader, Writer

    n_files = max(100, int(10000 * scale))
    rng = np.random.default_rng(4)
    files = []
    total = 0
    for i in range(n_files):
        size = int(rng.integers(50, 4000))
        blob = build_corpus(size, seed=i)
        m = [CompressionMethod.LZ4, CompressionMethod.ZSTD, CompressionMethod.NONE][i % 3]
        files.append((f"d{i % 37}/f{i:05d}", blob, CompressOptions(m)))
        total += size
    w = Writer.to_heap()
    _, enc = timed(lambda: w.write_archive(files))
    r = Reader.from_memory(w.buffer, shared=True)
    outs, dec = timed(lambda: r.read_files([n for n, _, _ in files]))
    assert all(o == d for o, (_, d, _) in zip(outs, files))
    return {"config": 4, "files": n_files, "MB": total / 1e6,
            "enc_MBps": round(total / 1e6 / enc, 1),
            "dec_MBps": round(total / 1e6 / dec, 1)}


def config5(scale):
    """zstd-19, blocks sharded data-parallel across 2 processes
    (jax.distributed over the Gloo CPU backend)."""
    size = int(16e6 * scale)
    worker = f"""
import sys, time
pid = int(sys.argv[1]); port = sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
from zpack_tpu.parallel import distributed as D
D.initialize(f"127.0.0.1:{{port}}", 2, pid)
from bench import build_corpus
data = build_corpus({size})
t0 = time.perf_counter()
comp = D.compress_multihost_zstd(data, 19, chunk_size=2 << 20)
dt = time.perf_counter() - t0
if pid == 0:
    from zpack_tpu.codecs.zstd import frame
    assert frame.decompress(comp) == data
    import json
    print("RESULT " + json.dumps({{"config": 5, "MB": len(data)/1e6,
        "enc_MBps": round(len(data)/1e6/dt, 2),
        "ratio": round(len(data)/len(comp), 3), "hosts": 2}}))
"""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen([sys.executable, "-c", worker, str(pid), str(port)],
                              cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
             for pid in (1, 0)]
    result = None
    for p in procs:
        out, _ = p.communicate(timeout=600)
        for line in out.splitlines():
            if line.startswith("RESULT "):
                result = json.loads(line[7:])
        if p.returncode != 0:
            raise RuntimeError(out[-1500:])
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.1)
    ap.add_argument("--configs", default="1,2,3,4,5")
    args = ap.parse_args()
    for c in args.configs.split(","):
        fn = {"1": config1, "2": config2, "3": config3, "4": config4, "5": config5}[c]
        print(json.dumps(fn(args.scale)), flush=True)


if __name__ == "__main__":
    main()
