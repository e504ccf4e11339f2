#!/usr/bin/env python
"""Run the five BASELINE.json configurations and report throughput/ratio,
with same-run reference-CLI comparisons.

Scales:
  --scale S   quick stand-in run (sizes = S x tens of MB; round-1..4 mode)
  --full      the BASELINE spec scale (VERDICT r4 missing #2):
                1: one 10 MB Silesia text file            (lz4:1)
                2: the 212 MB Silesia corpus, multi-entry (zstd:3)
                3: a 1 GB file streamed in 256 KiB blocks (zstd:3)
                4: 10,000 small files, mixed methods
                5: enwik9 zstd-19, sharded over 2 processes
                   (--c5-bytes bounds the slice: full enwik9 at L19 is
                   ~3 h on this 2-core host; the per-MB rate is flat in
                   size, so the slice measures the same thing)
  Real Silesia/enwik9 are used when scripts/fetch_corpora.py has run
  (zero-egress here -> scripts/corpus.py stand-ins, labelled in output).

Usage: python scripts/baseline_configs.py [--scale 0.1 | --full]
         [--configs 1,2,3,4,5] [--c5-bytes N] [--no-ref]
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
from scripts import corpus as corpus_mod


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def _ref_binary():
    try:
        from scripts.build_reference_cli import build as _build_ref

        return _build_ref()
    except Exception:
        return None


def _ref_cli(files: list[tuple[str, bytes]], method: str,
             timeout: int = 7200) -> dict | None:
    """Same-run reference-CLI create+extract on the same payload."""
    binary = _ref_binary()
    if not binary:
        return None
    import shutil

    total = sum(len(d) for _, d in files)
    with tempfile.TemporaryDirectory(
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None) as td:
        srcdir = os.path.join(td, "src")
        os.makedirs(srcdir)
        for name, data in files:
            p = os.path.join(srcdir, name.replace("/", "_"))
            with open(p, "wb") as f:
                f.write(data)
        arch = os.path.join(td, "ref.zpk")
        t0 = time.perf_counter()
        subprocess.run([binary, "c", "-m", method, arch, srcdir], check=True,
                       capture_output=True, timeout=timeout)
        enc = time.perf_counter() - t0
        xdir = os.path.join(td, "x")
        os.mkdir(xdir)
        t0 = time.perf_counter()
        subprocess.run([binary, "x", arch, "-o", xdir], check=True,
                       capture_output=True, timeout=timeout)
        dec = time.perf_counter() - t0
        asize = os.path.getsize(arch)
        shutil.rmtree(xdir)
    return {"enc_MBps": round(total / 1e6 / enc, 1),
            "dec_MBps": round(total / 1e6 / dec, 1),
            "archive_bytes": asize,
            "ratio": round(total / asize, 3)}


def config1(p):
    """Single-file LZ4 archive: compress + extract one Silesia text file."""
    from zpack_tpu import CompressOptions, CompressionMethod, Reader, Writer

    data = corpus_mod._category_bytes("text", p["c1_bytes"])
    if len(data) < p["c1_bytes"]:
        data += build_corpus(p["c1_bytes"] - len(data))
    w = Writer.to_heap()
    _, enc = timed(lambda: w.write_archive(
        [("silesia.txt", data, CompressOptions(CompressionMethod.LZ4, 1))]))
    r = Reader.from_memory(w.buffer, shared=True)
    out, dec = timed(lambda: r.read_file("silesia.txt"))
    assert out == data
    res = {"config": 1, "MB": len(data) / 1e6,
           "enc_MBps": round(len(data) / 1e6 / enc, 1),
           "dec_MBps": round(len(data) / 1e6 / dec, 1),
           "ratio": round(len(data) / len(w.buffer), 3)}
    if p["ref"]:
        res["ref_cli"] = _ref_cli([("silesia.txt", data)], "lz4:1")
    return res


def config2(p):
    """zstd-3 multi-entry Silesia archive with XXH3 verification."""
    from zpack_tpu import CompressOptions, CompressionMethod, Reader, Writer

    d = corpus_mod.real_silesia_dir()
    if d is not None:
        entries = [(f.name, f.read_bytes()) for f in sorted(d.iterdir())]
        label = "real-silesia"
    else:
        corpus, _m = corpus_mod.build(p["c2_bytes"])
        k = 12  # the real corpus has 12 member files
        per = len(corpus) // k
        entries = [(f"entry{i:02d}.bin", corpus[i * per : (i + 1) * per])
                   for i in range(k)]
        label = "silesia-like"
    total = sum(len(d) for _, d in entries)
    files = [(n, d, CompressOptions(CompressionMethod.ZSTD, 3))
             for n, d in entries]
    w = Writer.to_heap()
    _, enc = timed(lambda: w.write_archive(files))
    r = Reader.from_memory(w.buffer, shared=True)
    _, dec = timed(lambda: [r.read_file(n) for n, _, _ in files])
    res = {"config": 2, "MB": total / 1e6, "corpus": label,
           "enc_MBps": round(total / 1e6 / enc, 1),
           "dec_MBps": round(total / 1e6 / dec, 1),
           "ratio": round(total / len(w.buffer), 3)}
    if p["ref"]:
        res["ref_cli"] = _ref_cli(entries, "zstd:3")
    return res


def config3(p):
    """Streaming API: chunked write/read of a large file in 256 KiB blocks."""
    from zpack_tpu import CompressOptions, CompressionMethod, Reader, Writer
    from zpack_tpu.stream import read_file_stream_iter

    path = corpus_mod.enwik9_like(p["c3_bytes"])
    data = path.read_bytes()
    w = Writer.to_heap()
    w.write_header()
    w.write_data_header()

    def write():
        w.write_file_stream_begin("big.bin",
                                  CompressOptions(CompressionMethod.ZSTD, 3))
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
    res = {"config": 3, "MB": len(data) / 1e6,
           "enc_MBps": round(len(data) / 1e6 / enc, 1),
           "dec_MBps": round(len(data) / 1e6 / dec, 1),
           "ratio": round(len(data) / len(w.buffer), 3)}
    if p["ref"]:
        res["ref_cli"] = _ref_cli([("big.bin", data)], "zstd:3")
    return res


def config4(p):
    """Mixed-method archive: many small files with per-entry lz4/zstd."""
    from zpack_tpu import CompressOptions, CompressionMethod, Reader, Writer

    n_files = p["c4_files"]
    rng = np.random.default_rng(4)
    files = []
    total = 0
    for i in range(n_files):
        size = int(rng.integers(50, 4000))
        blob = build_corpus(size, seed=i)
        m = [CompressionMethod.LZ4, CompressionMethod.ZSTD,
             CompressionMethod.NONE][i % 3]
        files.append((f"d{i % 37}/f{i:05d}", blob, CompressOptions(m)))
        total += size
    w = Writer.to_heap()
    _, enc = timed(lambda: w.write_archive(files))
    r = Reader.from_memory(w.buffer, shared=True)
    outs, dec = timed(lambda: r.read_files([n for n, _, _ in files]))
    assert all(o == d for o, (_, d, _) in zip(outs, files))
    res = {"config": 4, "files": n_files, "MB": total / 1e6,
           "enc_MBps": round(total / 1e6 / enc, 1),
           "dec_MBps": round(total / 1e6 / dec, 1)}
    if p["ref"]:
        res["ref_cli"] = _ref_cli([(n, d) for n, d, _ in files], "zstd:3")
    return res


def config5(p):
    """zstd-19 enwik9, blocks sharded data-parallel across 2 processes
    (jax.distributed over the Gloo CPU backend)."""
    size = p["c5_bytes"]
    src = corpus_mod.enwik9_like(max(size, 32 << 20))
    worker = f"""
import sys, time
pid = int(sys.argv[1]); port = sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
from zpack_tpu.parallel import distributed as D
D.initialize(f"127.0.0.1:{{port}}", 2, pid)
data = open({str(src)!r}, "rb").read({size})
t0 = time.perf_counter()
comp = D.compress_multihost_zstd(data, 19, chunk_size=16 << 20)
dt = time.perf_counter() - t0
if pid == 0:
    from zpack_tpu.codecs.zstd import frame
    assert frame.decompress(comp) == data
    import json
    print("RESULT " + json.dumps({{"config": 5, "MB": len(data)/1e6,
        "corpus": "enwik9" if "enwik9/" in {str(src)!r} else "enwik9-like",
        "enc_MBps": round(len(data)/1e6/dt, 2),
        "ratio": round(len(data)/len(comp), 3), "hosts": 2}}))
"""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen(
        [sys.executable, "-c", worker, str(pid), str(port)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (1, 0)]
    result = None
    for pr in procs:
        out, _ = pr.communicate(timeout=14400)
        for line in out.splitlines():
            if line.startswith("RESULT "):
                result = json.loads(line[7:])
        if pr.returncode != 0:
            raise RuntimeError(out[-1500:])
    if result and p["ref"]:
        data = src.read_bytes()[:size]
        result["ref_cli"] = _ref_cli([("enwik9.xml", data)], "zstd:19")
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.1)
    ap.add_argument("--full", action="store_true",
                    help="BASELINE spec scale (see module docstring)")
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--c5-bytes", type=int, default=None,
                    help="config-5 slice bytes (default: 128 MiB at --full)")
    ap.add_argument("--no-ref", action="store_true",
                    help="skip the same-run reference-CLI comparison")
    args = ap.parse_args()
    if args.full:
        p = {"c1_bytes": 10 << 20, "c2_bytes": 212 << 20,
             "c3_bytes": 10 ** 9, "c4_files": 10000,
             "c5_bytes": args.c5_bytes or (128 << 20)}
    else:
        s = args.scale
        p = {"c1_bytes": int(10e6 * s), "c2_bytes": int(12e6 * s),
             "c3_bytes": int(64e6 * s), "c4_files": max(100, int(10000 * s)),
             "c5_bytes": args.c5_bytes or int(16e6 * s)}
    p["ref"] = not args.no_ref
    for c in args.configs.split(","):
        fn = {"1": config1, "2": config2, "3": config3,
              "4": config4, "5": config5}[c]
        print(json.dumps(fn(p)), flush=True)


if __name__ == "__main__":
    main()
