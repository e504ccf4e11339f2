"""Probe 5: raw tunnel transfer rates + output-shrinking variants.

The tokenizer's d2h volume is 8 bytes per input byte (pos,packed i32).
Measures: h2d / d2h bandwidth at several sizes, the device-side re-sort
that replaces the host unsort (output 4 B/B), and sorted-vs-scatter cost.
"""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

rng = np.random.default_rng(0)
dev = jax.devices()[0]

for mb in (1, 4, 16, 64):
    a = rng.integers(0, 255, mb << 20).astype(np.uint8)
    x = jax.device_put(a[:128], dev)  # warm
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = jax.device_put(a, dev)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    print(f"h2d {mb}MB: {dt*1e3:.1f} ms = {mb/dt:.0f} MB/s", flush=True)
    t0 = time.perf_counter()
    b = np.asarray(x)
    dt = time.perf_counter() - t0
    print(f"d2h {mb}MB: {dt*1e3:.1f} ms = {mb/dt:.0f} MB/s", flush=True)

# device-side unsort via a SECOND SORT (2-operand, key=pos) vs scatter
B = 65536
NB = 64
_HASH_MUL = jnp.uint32(2654435761)


def bench(fn, *args, reps=10, warm=2):
    for _ in range(warm):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


keys = jnp.asarray(rng.integers(0, 2**31, (NB, B)).astype(np.int32))
vals = jnp.asarray(rng.integers(0, 2**31, (NB, B)).astype(np.int32))


@jax.jit
def resort(k, v):
    def one(key, val):
        pos = key & 0xFFFF
        _, out = jax.lax.sort((pos, val), num_keys=1)
        return out
    return jax.vmap(one)(k, v)


dt = bench(resort, keys, vals)
print(f"unsort-by-sort 2op {NB}x64k: {dt*1e3:.2f} ms = {NB*B/dt/1e6:.0f} MB/s", flush=True)


@jax.jit
def scat(k, v):
    def one(key, val):
        pos = key & 0xFFFF
        return jnp.zeros((B,), jnp.int32).at[pos].set(val)
    return jax.vmap(one)(k, v)


dt = bench(scat, keys, vals)
print(f"unsort-by-scatter {NB}x64k: {dt*1e3:.2f} ms = {NB*B/dt/1e6:.0f} MB/s", flush=True)
print("done", flush=True)
