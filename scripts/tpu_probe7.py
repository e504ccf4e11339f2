"""Probe 7: resort-pair tokenizer (64 KiB blocks) on the real chip."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from functools import partial
from zpack_tpu.kernels.lz4_jax import tokenize_block_resort, tokenize_block_noscatter

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

B = 65536
for nb in (64, 256):
    mb = nb * B / 1e6
    a = rng.integers(0, 90, (nb, B)).astype(np.uint8)
    x = jax.device_put(jnp.asarray(a))
    fn = jax.jit(jax.vmap(partial(tokenize_block_resort, depth=2, n_words=2)))
    dt, r = bench(fn, x)
    print(f"pair tokenize {nb}x64k ({mb:.0f}MB): {dt*1e3:.2f} ms = {mb/dt:.0f} MB/s", flush=True)
    fn2 = jax.jit(jax.vmap(partial(tokenize_block_noscatter, depth=2, n_words=2)))
    dt2, _ = bench(fn2, x)
    print(f"  noscatter {nb}x64k: {dt2*1e3:.2f} ms = {mb/dt2:.0f} MB/s", flush=True)
print("done", flush=True)
