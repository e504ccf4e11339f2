#!/usr/bin/env python
"""Device kernel timing for bench.py — runs in a subprocess so a stalled
device tunnel cannot hang the bench.

Prints one ``<name> <MB/s>`` line per metric, FLUSHED IMMEDIATELY so the
parent captures every metric computed before any stall/timeout (bench.py
parses partial stdout out of TimeoutExpired).  Cheap metrics print first.

Metrics:
  tok      LZ4 tokenizer device rate (the mesh pipeline's match finder,
           role of the reference's liblz4 encode, lib/zpack_write.c:204)
  huf      batched huffman literal ENCODE rate (role: vendored HUF_*
           behind lib/zpack_write.c:179)
  hufdec   batched huffman literal DECODE rate (role: HUF_* behind
           lib/zpack_read.c:380)
  zmesh_dev / zmesh_host
           end-to-end mesh zstd compress with device vs host entropy
           coding (the A/B for the device-entropy default)
"""

import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("ZPACK_TPU_BENCH_PLATFORM"):  # CPU smoke-testing
    jax.config.update("jax_platforms", os.environ["ZPACK_TPU_BENCH_PLATFORM"])


def emit(name: str, value: float) -> None:
    print(f"{name} {value}", flush=True)


def time_loop(fn, reps: int = 10) -> float:
    fn()  # warm/compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main() -> int:
    rng = np.random.default_rng(0)

    # --- tok: LZ4 tokenizer device rate (512 x 8 KiB blocks = 4 MiB/step)
    from zpack_tpu.kernels.lz4_jax import tokenize_block_u16

    blks = jnp.asarray(rng.integers(0, 90, (512, 8192)).astype(np.uint8))
    fn = jax.jit(jax.vmap(partial(tokenize_block_u16, depth=2, n_words=2)))
    dt = time_loop(lambda: fn(blks))
    emit("tok", 512 * 8192 / dt / 1e6)

    # --- huf: batched huffman encode (256 streams x 16 KiB)
    from zpack_tpu.codecs.zstd import huffman as H
    from zpack_tpu.kernels import huffman_jax as HJ

    lit = rng.choice(np.arange(48, dtype=np.uint8), size=16384,
                     p=rng.dirichlet(np.ones(48) * 0.3)).astype(np.uint8)
    et = H.build_encode_table(np.bincount(lit, minlength=256))
    S, L = 256, 16384
    syms = jnp.asarray(np.broadcast_to(lit, (S, L)).copy())
    lens = jnp.full((S,), L, jnp.int32)
    ct = jnp.asarray(np.broadcast_to(
        np.pad(et.codes.astype(np.int32), (0, 256 - len(et.codes))), (S, 256)).copy())
    lt = jnp.asarray(np.broadcast_to(
        np.pad(et.lengths.astype(np.int32), (0, 256 - len(et.lengths))), (S, 256)).copy())
    nw = HJ.words_needed(L)
    dt = time_loop(lambda: HJ.encode_streams(syms, lens, ct, lt, n_words=nw))
    emit("huf", S * L / dt / 1e6)

    # --- hufdec: batched huffman decode of the same streams
    payload = H._encode_stream(lit, et)
    total = sum((1 << (w - 1)) for w in et.weights if w > 0)
    np2 = 1 << total.bit_length()
    dtb = H.build_decode_table(et.weights + [(np2 - total).bit_length()])
    P = len(payload)
    pay = np.zeros((S, P), dtype=np.uint8)
    pay[:] = np.frombuffer(payload, dtype=np.uint8)
    starts = np.full((S,), (P - 1) * 8 + (payload[-1].bit_length() - 1), np.int32)
    sym_t = jnp.asarray(np.broadcast_to(
        dtb.symbols.astype(np.int32), (S, 1 << dtb.max_bits)).copy())
    nb_t = jnp.asarray(np.broadcast_to(
        dtb.nb_bits.astype(np.int32), (S, 1 << dtb.max_bits)).copy())
    pay_d = jnp.asarray(pay)
    starts_d = jnp.asarray(starts)
    dt = time_loop(lambda: HJ.decode_streams(
        pay_d, starts_d, sym_t, nb_t, max_bits=dtb.max_bits, n_out=L))
    emit("hufdec", S * L / dt / 1e6)

    # --- device-vs-host entropy A/B on the end-to-end mesh zstd path
    if os.environ.get("ZPACK_TPU_BENCH_AB", "1") != "0":
        from zpack_tpu.parallel.pipeline import MeshCompressor

        words = [b"compression", b"archive", b"entropy", b"the", b"of", b"data"]
        blob = bytearray()
        while len(blob) < (1 << 20):
            blob += words[int(rng.integers(len(words)))] + b" "
        data = bytes(blob[: 1 << 20])
        mc = MeshCompressor()
        for name, dev in (("zmesh_dev", True), ("zmesh_host", False)):
            mc.compress_zstd(data, device_entropy=dev)  # warm/compile
            t0 = time.perf_counter()
            mc.compress_zstd(data, device_entropy=dev)
            emit(name, len(data) / (time.perf_counter() - t0) / 1e6)
    return 0


if __name__ == "__main__":
    sys.exit(main())
