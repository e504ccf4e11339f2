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


def build_longrange(size: int = 16 << 20, seed: int = 5) -> bytes:
    """>=16 MiB corpus with multi-MB-distance repeats (256 KiB chunks
    re-emitted up to ~10 MB later): exercises the L19 window/BT reach the
    8 MB-window levels must cover (VERDICT r2 item 4)."""
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"over", b"lazy",
             b"dog", b"compression", b"window", b"distance", b"matching"]
    chunks, total, history = [], 0, []
    while total < size:
        if history and rng.random() < 0.35:
            c = history[int(rng.integers(max(0, len(history) - 40), len(history)))]
        else:
            blob = bytearray()
            while len(blob) < (256 << 10):
                blob += words[int(rng.integers(len(words)))] + b" "
                if rng.random() < 0.01:
                    blob += bytes(rng.integers(0, 256, 32).astype(np.uint8))
            c = bytes(blob[: 256 << 10])
            history.append(c)
        chunks.append(c)
        total += len(c)
    return b"".join(chunks)[:size]


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def load_corpus(size: int) -> bytes:
    """Headline corpus: the Silesia-style LOCAL mix (scripts/corpus.py —
    real prose/source/markup/ELF/records/noise files from the image; the
    environment cannot fetch actual Silesia).  ZPACK_BENCH_CORPUS=synthetic
    selects the legacy generated mix (r1-r3 comparability)."""
    if os.environ.get("ZPACK_BENCH_CORPUS", "local") == "local":
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "scripts"))
            import corpus as corpus_mod

            data, man = corpus_mod.cached_build(size)
            _log(f"corpus local mix: {man}")
            return data
        except Exception as e:  # pragma: no cover - defensive
            _log(f"local corpus failed ({type(e).__name__}); synthetic fallback")
    return build_corpus(size)


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


class _RefCli:
    """The reference CLI (built by scripts/build_reference_cli.py) as a
    single-rep timing oracle, so the headline phase can INTERLEAVE our
    reps with its reps: cross-invocation CPU drift on this box moves
    whole-phase numbers by up to 2x (CLAUDE.md round-3 methodology), and
    a sequential ours-then-reference layout measured rt ratios 0.93 and
    1.15 on back-to-back otherwise-identical runs."""

    def __init__(self, data: bytes):
        import tempfile

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from build_reference_cli import build as _build_ref

        self.binary = _build_ref()
        if not self.binary:
            raise RuntimeError("reference CLI unavailable")
        self.td = tempfile.TemporaryDirectory(
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
        self.src = os.path.join(self.td.name, "bench.bin")
        with open(self.src, "wb") as f:
            f.write(data)
        self.size_mb = len(data) / 1e6
        self.best: dict = {}
        self._k = 0
        self.disabled = False

    @classmethod
    def try_create(cls, data: bytes):
        try:
            return cls(data)
        except Exception as e:  # pragma: no cover - defensive
            _log(f"reference CLI build failed: {type(e).__name__}")
            return None

    def rep(self, mname: str, m: str) -> None:
        """One create + extract rep; folds best-of into self.best.
        A failing rep must not kill the (interleaved) headline phase —
        callers guard with try_rep."""
        import shutil
        import subprocess

        arch = os.path.join(self.td.name, f"{mname}.zpk")
        if os.path.exists(arch):
            os.unlink(arch)
        t0 = time.perf_counter()
        subprocess.run([self.binary, "c", "-m", m, arch, self.src],
                       check=True, capture_output=True, timeout=300)
        c_s = time.perf_counter() - t0
        self._k += 1
        xdir = os.path.join(self.td.name, f"x{mname}{self._k}")
        os.mkdir(xdir)
        t0 = time.perf_counter()
        subprocess.run([self.binary, "x", arch, "-o", xdir],
                       check=True, capture_output=True, timeout=300)
        x_s = time.perf_counter() - t0
        shutil.rmtree(xdir)
        b = self.best.setdefault(mname, [float("inf"), float("inf"), 0])
        b[0] = min(b[0], c_s)
        b[1] = min(b[1], x_s)
        b[2] = os.path.getsize(arch)

    def try_rep(self, mname: str, m: str) -> None:
        """Best-effort rep: a failure stops FURTHER reference reps but
        keeps every method's already-measured best-of (a transient zstd
        rep failure must not discard complete lz4 baselines)."""
        if self.disabled:
            return
        try:
            self.rep(mname, m)
        except Exception as e:  # pragma: no cover - defensive
            _log(f"reference CLI rep failed: {type(e).__name__}")
            self.disabled = True

    def results(self) -> dict:
        out: dict = {}
        for mname, (c_s, x_s, size) in self.best.items():
            out[f"{mname}_create_MBps"] = round(self.size_mb / c_s, 2)
            out[f"{mname}_extract_MBps"] = round(self.size_mb / x_s, 2)
            out[f"{mname}_archive_bytes"] = size
        self.td.cleanup()
        _log(f"reference CLI baseline: {out}")
        return out


def _tpu_kernel_rates() -> dict:
    """Run scripts/tpu_bench.py in a subprocess, harvesting whatever metric
    lines it managed to print even on timeout/crash; retry once (the first
    attempt's XLA compiles persist in .jax_cache, so a retry after a
    compile-induced timeout usually completes)."""
    import subprocess

    metrics: dict[str, float] = {}
    timeout = int(os.environ.get("ZPACK_BENCH_TPU_TIMEOUT", 1600))
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "tpu_bench.py")
    for attempt in range(2):
        out = ""
        try:
            proc = subprocess.run(
                [sys.executable, script], capture_output=True, text=True,
                timeout=timeout, cwd="/root/repo",
            )
            out = proc.stdout or ""
            status = f"rc={proc.returncode}"
            if proc.returncode != 0:
                _log(f"tpu bench stderr tail: {(proc.stderr or '')[-400:]}")
        except subprocess.TimeoutExpired as e:
            raw = e.stdout or b""
            out = raw.decode() if isinstance(raw, bytes) else raw
            status = "timeout"
        except Exception as e:  # pragma: no cover - defensive
            status = f"{type(e).__name__}"
        metrics.pop("degraded", None)  # stale marker from a prior attempt
        for line in out.splitlines():
            parts = line.split()
            if len(parts) == 2:
                try:
                    metrics[parts[0]] = float(parts[1])
                except ValueError:
                    pass
        _log(f"tpu kernel phase attempt {attempt + 1}: {status}, "
             f"metrics {sorted(metrics)}")
        if {"tok", "huf", "hufdec"} <= metrics.keys():
            break
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".tpu_last_good.json")
    if {"tok", "huf", "hufdec"} <= metrics.keys() and not metrics.get("degraded"):
        try:
            with open(cache, "w") as f:
                json.dump({"at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                           **metrics}, f)
        except OSError:
            pass
    elif os.path.exists(cache):
        # tunnel degraded for this whole run: surface the last HEALTHY
        # kernel rates under a separate, clearly-labelled key — the live
        # fields stay null so nobody mistakes cached for current
        try:
            with open(cache) as f:
                metrics["_last_healthy"] = json.load(f)
        except (OSError, ValueError):
            pass
    return metrics


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from zpack_tpu import constants as C

    # 64 MiB default (VERDICT r4 weak #6: headline at real-corpus scale;
    # ZPACK_BENCH_BYTES shrinks it for quick runs)
    data = load_corpus(int(os.environ.get("ZPACK_BENCH_BYTES", 64 << 20)))
    size_mb = len(data) / 1e6
    _log(f"corpus {len(data)} bytes")

    # --- headline: LZ4 archive round-trip, fastest engine, with our reps
    # INTERLEAVED against the reference CLI's (ours/ref/ours/ref...):
    # cross-invocation CPU drift on this box moves whole phases by up to
    # 2x, and the vs-reference ratio is the judged quantity
    from zpack_tpu.utils.observe import metrics as _metrics

    ref = _RefCli.try_create(data)
    _roundtrip(data[: 1 << 20], C.CompressionMethod.LZ4, 1)  # warm caches
    _metrics.reset()  # per-phase counters cover the measured work only
    enc = dec = float("inf")
    for _ in range(3):
        e1, d1, csize = _roundtrip(data, C.CompressionMethod.LZ4, 1)
        enc, dec = min(enc, e1), min(dec, d1)
        if ref:
            ref.try_rep("lz4", "lz4:1")
    value = 2 * size_mb / (enc + dec)
    _log(f"lz4 rt: enc {size_mb/enc:.0f} MB/s dec {size_mb/dec:.0f} MB/s")

    # --- zstd ratios/speeds on the SAME full corpus as the reference-CLI
    # phase (apples-to-apples; VERDICT r3 Weak #7)
    zslice = data
    z3_enc = z3_dec = float("inf")
    for _ in range(3):
        e1, d1, z3_size = _roundtrip(zslice, C.CompressionMethod.ZSTD, 3)
        z3_enc, z3_dec = min(z3_enc, e1), min(z3_dec, d1)
        if ref:
            ref.try_rep("zstd3", "zstd:3")
    _log(f"zstd3 rt: enc {len(zslice)/1e6/z3_enc:.0f} MB/s "
         f"dec {len(zslice)/1e6/z3_dec:.0f} MB/s")
    # per-phase counters for the NATIVE-engine phases only (the baseline's
    # python-fallback runs would otherwise pollute the same phase names)
    phase_metrics = _metrics.snapshot()

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
    try:
        import zstandard

        lib3 = len(zstandard.ZstdCompressor(level=3).compress(zslice))
    except Exception:
        lib3 = None

    # --- L19 long-range slice (>=16 MiB multi-MB-distance repeats);
    # skipped when the corpus is shrunk for smoke runs
    z19_long = None
    if len(data) >= (4 << 20):  # build_corpus truncates a few bytes under 8<<20
        try:
            import zstandard

            from zpack_tpu import native as _native

            lr = build_longrange()
            ours19 = _native.zstd_compress(lr, 19)
            lib19 = zstandard.ZstdCompressor(level=19).compress(lr)
            assert zstandard.ZstdDecompressor().decompress(
                ours19, max_output_size=len(lr)) == lr
            z19_long = round(len(ours19) / len(lib19), 4)
            _log(f"zstd19 longrange {len(ours19)} vs lib {len(lib19)} ({z19_long})")
        except Exception as e:
            _log(f"zstd19 longrange skipped: {type(e).__name__}")

    # --- REAL reference CLI baseline (BASELINE.md's oracle): the reps ran
    # interleaved with ours above — the numbers "match or beat the
    # reference" is judged against.  None when it couldn't be built.
    ref_cli = ref.results() if ref and ref.best else None

    # --- TPU kernel device rates (scripts/tpu_bench.py), isolated in a
    # subprocess with a hard timeout: the dev-environment device tunnel
    # occasionally stalls and must not block the bench.  The script prints
    # each metric line the moment it is measured, so a stall mid-run still
    # yields every earlier metric (parsed out of TimeoutExpired.stdout);
    # one retry reuses the jax compilation cache the first attempt warmed.
    # ZPACK_BENCH_TPU=0 skips the phase for quick CPU-side iterations.
    tpu = (_tpu_kernel_rates()
           if os.environ.get("ZPACK_BENCH_TPU", "1") != "0" else {})

    # --- scaling efficiency (VERDICT r1 item 6): mesh weak-scaling on
    # 1/2/4/8 virtual CPU devices + 2-process elastic strong scaling.
    # Subprocess-isolated with timeouts; skippable via ZPACK_BENCH_SCALING=0.
    scaling = None
    if os.environ.get("ZPACK_BENCH_SCALING", "1") != "0":
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
            import scaling as scaling_mod

            s = scaling_mod.measure(bytes_per_dev=256 << 10,
                                    elastic_bytes=128 << 20)
            scaling = {
                "ncores": s["ncores"],
                "mesh_weak_efficiency": {
                    str(m["n"]): m["weak_efficiency"] for m in s["mesh_weak"]},
                # full production pipeline (device tokenize + native
                # serialize), normalized by the n-virtual-devices-on-
                # ncores ideal — the honest number real chips would see
                "mesh_core_limited_efficiency": {
                    str(m["n"]): m["core_limited_efficiency"]
                    for m in s["mesh_weak"]},
                "mesh_device_core_limited_efficiency": {
                    str(m["n"]): m["device_core_limited_efficiency"]
                    for m in s["mesh_weak"]},
                "elastic_2proc_work_efficiency":
                    s["elastic_strong"][-1]["work_strong_efficiency"],
                # RAW (un-normalized) weak scaling: n independent
                # single-threaded compress processes, n <= ncores (the
                # multi-host deployment shape; VERDICT r3 item 9)
                "proc_raw_weak_efficiency": {
                    str(m["n"]): m["raw_weak_efficiency"]
                    for m in s.get("proc_weak", [])},
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
            "zstd19_longrange_vs_libzstd": z19_long,
            "tpu_tokenizer_MBps": round(tpu["tok"], 2) if "tok" in tpu else None,
            "tpu_huffman_encode_MBps": round(tpu["huf"], 2) if "huf" in tpu else None,
            "tpu_huffman_decode_MBps": round(tpu["hufdec"], 2) if "hufdec" in tpu else None,
            "tpu_huffman_decode_doubling_MBps": round(tpu["hufdec_doubling"], 2) if "hufdec_doubling" in tpu else None,
            "tpu_xxh3_pallas_MBps": round(tpu["xxh3"], 2) if "xxh3" in tpu else None,
            "tpu_fse_encode_Mseqps": round(tpu["fse_mseq"], 3) if "fse_mseq" in tpu else None,
            "tpu_fse_e2e_Mseqps": round(tpu["fse_e2e_mseq"], 3) if "fse_e2e_mseq" in tpu else None,
            "tpu_fse_decode_Mseqps": round(tpu["fsedec_mseq"], 3) if "fsedec_mseq" in tpu else None,
            "tpu_zstd_device_extract_e2e_MBps": round(tpu["zdec_dev_e2e"], 2) if "zdec_dev_e2e" in tpu else None,
            "tpu_rtt_ms": round(tpu["rtt_ms"], 3) if "rtt_ms" in tpu else None,
            # set when the device tunnel stayed degraded (rtt > 3 ms) past
            # the health wait: kernel metrics are withheld, not slow
            "tpu_degraded": bool(tpu.get("degraded")),
            # last healthy-tunnel kernel rates (only present when the live
            # run was degraded; see _tpu_kernel_rates cache)
            "tpu_last_healthy": tpu.get("_last_healthy"),
            "tpu_lz4_replay_MBps": round(tpu["lz4replay"], 2) if "lz4replay" in tpu else None,
            "tpu_zstd_mesh_device_entropy_MBps": round(tpu["zmesh_dev"], 2) if "zmesh_dev" in tpu else None,
            "tpu_zstd_mesh_host_entropy_MBps": round(tpu["zmesh_host"], 2) if "zmesh_host" in tpu else None,
            # entropy-STAGE-only rates (end-to-end zmesh is transfer-bound
            # on the dev tunnel, hiding the device-entropy advantage)
            "tpu_zmesh_dev_entropy_stage_MBps": round(tpu["zmesh_dev_entropy"], 2) if "zmesh_dev_entropy" in tpu else None,
            "tpu_zmesh_host_entropy_stage_MBps": round(tpu["zmesh_host_entropy"], 2) if "zmesh_host_entropy" in tpu else None,
            "scaling": scaling,
            # the REAL reference binary's numbers on this corpus/host
            "reference_cli": ref_cli,
            "lz4_roundtrip_vs_reference_cli": (
                round(value / (2 * size_mb
                               / (size_mb / ref_cli["lz4_create_MBps"]
                                  + size_mb / ref_cli["lz4_extract_MBps"])), 3)
                if ref_cli and "lz4_create_MBps" in ref_cli else None),
            "zstd3_roundtrip_vs_reference_cli": (
                round((2 * len(zslice) / 1e6 / (z3_enc + z3_dec))
                      / (2 * size_mb
                         / (size_mb / ref_cli["zstd3_create_MBps"]
                            + size_mb / ref_cli["zstd3_extract_MBps"])), 3)
                if ref_cli and "zstd3_create_MBps" in ref_cli else None),
            "zstd3_size_vs_reference_cli": (
                round(z3_size / ref_cli["zstd3_archive_bytes"], 4)
                if ref_cli and "zstd3_archive_bytes" in ref_cli else None),
            "lz4_size_vs_reference_cli": (
                round(csize / ref_cli["lz4_archive_bytes"], 4)
                if ref_cli and "lz4_archive_bytes" in ref_cli else None),
            "native_threads": int(os.environ.get("ZPACK_NATIVE_THREADS", 0))
                               or (os.cpu_count() or 1),
            # per-phase GB/s counters from the observe registry (SURVEY §5)
            "metrics": phase_metrics,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
