"""Device-time breakdown probe for the LZ4 tokenizer on the real TPU.

Times, per 16x64KiB batch: full tokenize_block, the 5-operand sort alone,
3/1-operand sorts, the unsort scatter alone, and elementwise-only hashing.
Writes one line per measurement to stdout (run me with output to a file).
"""
import sys, time
sys.path.insert(0, "/root/repo")
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 65536
NB = 16
rng = np.random.default_rng(0)
blks = jnp.asarray(rng.integers(0, 90, (NB, B)).astype(np.uint8))
key_batch = jnp.asarray(rng.integers(0, 2**31, (NB, B)).astype(np.int32))


def bench(fn, *args, reps=10, warm=2):
    for _ in range(warm):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    return dt


def report(name, dt):
    mbps = NB * B / dt / 1e6
    print(f"{name}: {dt*1e3:.2f} ms/batch = {mbps:.1f} MB/s", flush=True)


from zpack_tpu.kernels.lz4_jax import tokenize_block, _HASH_MUL

full = jax.jit(jax.vmap(partial(tokenize_block, depth=2)))
report("tokenize depth2", bench(full, blks))
full8 = jax.jit(jax.vmap(partial(tokenize_block, depth=8)))
report("tokenize depth8", bench(full8, blks))


@jax.jit
def sort5(b):
    def one(data):
        bp = jnp.pad(data.astype(jnp.uint32), (0, 20))
        u = bp[:B] | (bp[1:B+1] << 8) | (bp[2:B+2] << 16) | (bp[3:B+3] << 24)
        u4 = bp[4:B+4] | (bp[5:B+5] << 8) | (bp[6:B+6] << 16) | (bp[7:B+7] << 24)
        u8 = bp[8:B+8] | (bp[9:B+9] << 8) | (bp[10:B+10] << 16) | (bp[11:B+11] << 24)
        u12 = bp[12:B+12] | (bp[13:B+13] << 8) | (bp[14:B+14] << 16) | (bp[15:B+15] << 24)
        h = (u * _HASH_MUL) >> jnp.uint32(16)
        key = (h << jnp.uint32(16)) | jnp.arange(B, dtype=jnp.uint32)
        return jax.lax.sort((key, u, u4, u8, u12), num_keys=1)[0]
    return jax.vmap(one)(b)


report("sort 5-operand", bench(sort5, blks))


@jax.jit
def sort2(b):
    def one(data):
        bp = jnp.pad(data.astype(jnp.uint32), (0, 20))
        u = bp[:B] | (bp[1:B+1] << 8) | (bp[2:B+2] << 16) | (bp[3:B+3] << 24)
        h = (u * _HASH_MUL) >> jnp.uint32(16)
        key = (h << jnp.uint32(16)) | jnp.arange(B, dtype=jnp.uint32)
        return jax.lax.sort((key, u), num_keys=1)[0]
    return jax.vmap(one)(b)


report("sort 2-operand", bench(sort2, blks))


@jax.jit
def scatter1(k):
    def one(key):
        ps = key & 0xFFFF
        return jnp.zeros((B,), jnp.int32).at[ps].set(key)
    return jax.vmap(one)(k)


report("scatter Bx1", bench(scatter1, key_batch))


@jax.jit
def gatherB(k):
    def one(key):
        idx = key & 0xFFFF
        return key[idx]
    return jax.vmap(one)(k)


report("gather Bx1", bench(gatherB, key_batch))


@jax.jit
def elemwise(b):
    def one(data):
        bp = jnp.pad(data.astype(jnp.uint32), (0, 20))
        u = bp[:B] | (bp[1:B+1] << 8) | (bp[2:B+2] << 16) | (bp[3:B+3] << 24)
        h = (u * _HASH_MUL) >> jnp.uint32(16)
        best = jnp.zeros((B,), jnp.int32)
        for d in range(1, 3):
            same = h == jnp.roll(h, d)
            best = jnp.where(same, best + 1, best)
        return best
    return jax.vmap(one)(b)


report("elementwise window+hash", bench(elemwise, blks))
print("done", flush=True)
