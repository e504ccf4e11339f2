"""Probe 6: u16 resort tokenizer on the real chip.

Measures (a) device-side tokenize rate for B=8192 at several batch widths
(input resident, output resident — pure compute), (b) the d2h cost of the
u16 output vs the old i32 pair, (c) end-to-end MeshCompressor.compress.
"""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from functools import partial
from zpack_tpu.kernels.lz4_jax import tokenize_block_u16, tokenize_block_noscatter

rng = np.random.default_rng(0)


def bench(fn, *args, reps=10, warm=2):
    for _ in range(warm):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps, r


B = 8192
for nb in (128, 512, 2048):
    mb = nb * B / 1e6
    # semi-compressible corpus like the bench mix
    a = rng.integers(0, 90, (nb, B)).astype(np.uint8)
    x = jax.device_put(jnp.asarray(a))
    fn = jax.jit(jax.vmap(partial(tokenize_block_u16, depth=2, n_words=2)))
    dt, r = bench(fn, x)
    print(f"u16 tokenize {nb}x8k ({mb:.0f}MB): {dt*1e3:.2f} ms = {mb/dt:.0f} MB/s", flush=True)
    t0 = time.perf_counter()
    h = np.asarray(r)
    d2h = time.perf_counter() - t0
    print(f"  d2h u16 out ({2*mb:.0f}MB): {d2h*1e3:.1f} ms = {2*mb/d2h:.0f} MB/s wire", flush=True)
    fn2 = jax.jit(jax.vmap(partial(tokenize_block_noscatter, depth=2, n_words=2)))
    dt2, _ = bench(fn2, x)
    print(f"  noscatter pair {nb}x8k: {dt2*1e3:.2f} ms = {mb/dt2:.0f} MB/s", flush=True)

print("done", flush=True)
