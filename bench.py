#!/usr/bin/env python
"""Benchmark: ZPack archive create+extract round-trip throughput on a
Silesia-like mixed corpus, plus TPU kernel device rate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

value       = end-to-end LZ4 round-trip MB/s (2·bytes / (t_enc + t_dec))
              through the framework's fastest engine (native C++ backend,
              with numpy/JAX fallbacks — the engine the CLI actually uses).
vs_baseline = value / (the same round-trip on the pure-Python framework
              path), i.e. the speedup our native/TPU acceleration delivers
              over the portable baseline.  The reference publishes no
              numbers to compare against (BASELINE.md).
detail      = per-phase MB/s, compression ratios incl. zstd-3/19 vs the
              libzstd oracle, and the TPU tokenizer's device-side rate
              (the mesh pipeline's compute throughput, net of the dev-
              environment host↔device tunnel).
"""

import json
import os
import sys
import time

import numpy as np


def build_corpus(size: int = 8 << 20, seed: int = 0) -> bytes:
    """Deterministic Silesia-like mix: ~1/3 prose-ish, ~1/3 structured
    binary records, ~1/3 high-entropy."""
    rng = np.random.default_rng(seed)
    parts = []
    third = size // 3
    words = [b"compression", b"framework", b"archive", b"entropy", b"stream",
             b"the", b"of", b"and", b"data", b"block", b"pipeline", b"mesh"]
    blob = bytearray()
    while len(blob) < third:
        w = words[int(rng.integers(len(words)))]
        blob += w + b" "
        if rng.random() < 0.02:
            blob += bytes(rng.integers(0, 256, 8).astype(np.uint8))
    parts.append(bytes(blob[:third]))
    n_rec = third // 32
    rec = np.zeros((n_rec, 32), dtype=np.uint8)
    rec[:, 0] = 0x7F
    rec[:, 1] = np.arange(n_rec) % 17
    rec[:, 2:6] = (np.arange(n_rec)[:, None] >> np.arange(4) * 8).astype(np.uint8)
    rec[:, 6:14] = rng.integers(0, 4, (n_rec, 8)).astype(np.uint8)
    parts.append(rec.tobytes())
    parts.append(bytes(rng.integers(0, 256, third).astype(np.uint8)))
    return b"".join(parts)[:size]


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _roundtrip(data: bytes, method, level: int, reps: int = 1):
    """Archive-level round-trip via the framework; returns best-of-reps
    (enc_s, dec_s, csize).  Multiple reps factor out first-touch page
    faults and allocator warmup, reporting steady-state throughput."""
    from zpack_tpu.reader import Reader
    from zpack_tpu.writer import CompressOptions, Writer

    enc = dec = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        w = Writer.to_heap()
        w.write_archive([("bench.bin", data, CompressOptions(method, level))])
        enc = min(enc, time.perf_counter() - t0)
        buf = w.buffer
        t0 = time.perf_counter()
        r = Reader.from_memory(buf, shared=True)
        out = r.read_file("bench.bin")  # includes XXH3 verification
        dec = min(dec, time.perf_counter() - t0)
        assert out == data, "bench round-trip failed"
    return enc, dec, len(buf)


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from zpack_tpu import constants as C

    data = build_corpus(int(os.environ.get("ZPACK_BENCH_BYTES", 8 << 20)))
    size_mb = len(data) / 1e6
    _log(f"corpus {len(data)} bytes")

    # --- headline: LZ4 archive round-trip, fastest engine
    _roundtrip(data[: 1 << 20], C.CompressionMethod.LZ4, 1)  # warm caches
    enc, dec, csize = _roundtrip(data, C.CompressionMethod.LZ4, 1, reps=3)
    value = 2 * size_mb / (enc + dec)
    _log(f"lz4 rt: enc {size_mb/enc:.0f} MB/s dec {size_mb/dec:.0f} MB/s")

    # --- baseline: pure-python/numpy engine (native disabled)
    os.environ["ZPACK_TPU_NO_NATIVE"] = "1"
    import zpack_tpu.native as native

    native._TRIED, native._LIB = True, None  # force fallback paths
    _log("baseline phase start")
    enc_py, dec_py, _ = _roundtrip(data, C.CompressionMethod.LZ4, 1)
    base_value = 2 * size_mb / (enc_py + dec_py)
    native._TRIED = False  # restore
    del os.environ["ZPACK_TPU_NO_NATIVE"]
    _log(f"baseline {base_value:.2f} MB/s")

    # --- zstd ratios/speeds (smaller slice keeps the bench bounded)
    zslice = data[: 2 << 20]
    z3_enc, z3_dec, z3_size = _roundtrip(zslice, C.CompressionMethod.ZSTD, 3, reps=3)
    _log("zstd3 done")
    try:
        import zstandard

        lib3 = len(zstandard.ZstdCompressor(level=3).compress(zslice))
    except Exception:
        lib3 = None

    # --- TPU kernel device rate (tokenizer compute, single 64KiB block),
    # isolated in a subprocess with a hard timeout: the dev-environment
    # device tunnel occasionally stalls and must not block the bench
    tpu_mbps = None
    tpu_huf_mbps = None
    try:
        import subprocess

        script = (
            "import time, numpy as np, jax, jax.numpy as jnp\n"
            "jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')\n"
            "from functools import partial\n"
            "from zpack_tpu.kernels.lz4_jax import tokenize_block_u16\n"
            "rng = np.random.default_rng(0)\n"
            "blks = jnp.asarray(rng.integers(0, 90, (512, 8192)).astype(np.uint8))\n"
            "fn = jax.jit(jax.vmap(partial(tokenize_block_u16, depth=2, n_words=2)))\n"
            "r = fn(blks); jax.block_until_ready(r)\n"
            "t0 = time.perf_counter()\n"
            "for _ in range(10): r = fn(blks)\n"
            "jax.block_until_ready(r)\n"
            "print('tok', 512 * 8192 / ((time.perf_counter()-t0)/10) / 1e6)\n"
            # device huffman entropy stage (the mesh zstd literal coder)
            "from zpack_tpu.codecs.zstd import huffman as H\n"
            "from zpack_tpu.kernels import huffman_jax as HJ\n"
            "lit = rng.choice(np.arange(48, dtype=np.uint8), size=16384,\n"
            "                 p=rng.dirichlet(np.ones(48)*0.3)).astype(np.uint8)\n"
            "et = H.build_encode_table(np.bincount(lit, minlength=256))\n"
            "S, L = 256, 16384\n"
            "syms = jnp.asarray(np.broadcast_to(lit, (S, L)).copy())\n"
            "lens = jnp.full((S,), L, jnp.int32)\n"
            "ct = jnp.asarray(np.broadcast_to(np.pad(et.codes.astype(np.int32), (0, 256-len(et.codes))), (S, 256)).copy())\n"
            "lt = jnp.asarray(np.broadcast_to(np.pad(et.lengths.astype(np.int32), (0, 256-len(et.lengths))), (S, 256)).copy())\n"
            "nw = HJ.words_needed(L)\n"
            "r = HJ.encode_streams(syms, lens, ct, lt, n_words=nw); jax.block_until_ready(r)\n"
            "t0 = time.perf_counter()\n"
            "for _ in range(10): r = HJ.encode_streams(syms, lens, ct, lt, n_words=nw)\n"
            "jax.block_until_ready(r)\n"
            "print('huf', S * L / ((time.perf_counter()-t0)/10) / 1e6)\n"
        )
        proc = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True,
            timeout=int(os.environ.get("ZPACK_BENCH_TPU_TIMEOUT", 240)),
            cwd="/root/repo",
        )
        if proc.returncode == 0:
            for line in proc.stdout.strip().splitlines():
                parts = line.split()
                if parts[0] == "tok":
                    tpu_mbps = float(parts[1])
                elif parts[0] == "huf":
                    tpu_huf_mbps = float(parts[1])
    except Exception as e:
        _log(f"tpu kernel timing skipped: {type(e).__name__}")

    # --- scaling efficiency (VERDICT r1 item 6): mesh weak-scaling on
    # 1/2/4/8 virtual CPU devices + 2-process elastic strong scaling.
    # Subprocess-isolated with timeouts; skippable via ZPACK_BENCH_SCALING=0.
    scaling = None
    if os.environ.get("ZPACK_BENCH_SCALING", "1") != "0":
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
            import scaling as scaling_mod

            s = scaling_mod.measure(bytes_per_dev=256 << 10,
                                    elastic_bytes=32 << 20)
            scaling = {
                "ncores": s["ncores"],
                "mesh_weak_efficiency": {
                    str(m["n"]): m["weak_efficiency"] for m in s["mesh_weak"]},
                "mesh_device_core_limited_efficiency": {
                    str(m["n"]): m["device_core_limited_efficiency"]
                    for m in s["mesh_weak"]},
                "elastic_2proc_work_efficiency":
                    s["elastic_strong"][-1]["work_strong_efficiency"],
            }
            _log(f"scaling: {scaling}")
        except Exception as e:
            _log(f"scaling phase skipped: {type(e).__name__}: {e}")

    result = {
        "metric": "silesia_like_lz4_archive_roundtrip_MBps",
        "value": round(value, 2),
        "unit": "MB/s",
        "vs_baseline": round(value / base_value, 3),
        "detail": {
            "platform": jax.default_backend(),
            "corpus_bytes": len(data),
            "lz4_encode_MBps": round(size_mb / enc, 2),
            "lz4_decode_MBps": round(size_mb / dec, 2),
            "lz4_ratio": round(len(data) / csize, 3),
            "python_baseline_MBps": round(base_value, 2),
            "zstd3_encode_MBps": round(len(zslice) / 1e6 / z3_enc, 2),
            "zstd3_decode_MBps": round(len(zslice) / 1e6 / z3_dec, 2),
            "zstd3_ratio": round(len(zslice) / z3_size, 3),
            "zstd3_size_vs_libzstd": round(z3_size / lib3, 3) if lib3 else None,
            "tpu_tokenizer_MBps": round(tpu_mbps, 2) if tpu_mbps else None,
            "tpu_huffman_encode_MBps": round(tpu_huf_mbps, 2) if tpu_huf_mbps else None,
            "scaling": scaling,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
