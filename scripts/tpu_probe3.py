"""Probe 3: batch-size sweep + sort-payload variants on the real TPU.

Dispatch latency through the tunnel floors every call at ~3.4 ms, so the
interesting questions are (a) how far bigger batches amortize it and
(b) what the marginal per-byte compute cost of each payload variant is.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 65536
rng = np.random.default_rng(0)
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


def windows(data, k):
    bp = jnp.pad(data.astype(jnp.uint32), (0, 20))
    us = []
    for s in range(0, 4 * k, 4):
        us.append(bp[s:B+s] | (bp[s+1:B+s+1] << 8) | (bp[s+2:B+s+2] << 16) | (bp[s+3:B+s+3] << 24))
    return us


def tz(x):
    return (((x & 0xFF) == 0).astype(jnp.int32)
            + ((x & 0xFFFF) == 0).astype(jnp.int32)
            + ((x & 0xFFFFFF) == 0).astype(jnp.int32))


def make_noscatter(n_words, depth=2):
    """Tokenizer with n_words u32 payload words (CAPJ = 4*n_words)."""
    capj = 4 * n_words

    def one(data):
        us = windows(data, n_words)
        h = (us[0] * _HASH_MUL) >> jnp.uint32(16)
        key = (h << jnp.uint32(16)) | jnp.arange(B, dtype=jnp.uint32)
        srt = jax.lax.sort((key, *us), num_keys=1)
        key_s, us_s = srt[0], srt[1:]
        hs = key_s >> jnp.uint32(16)
        ps = (key_s & jnp.uint32(0xFFFF)).astype(jnp.int32)

        def shift_up(a, d, fill):
            return jnp.concatenate([jnp.full((d,), fill, a.dtype), a[:-d]])

        best_len = jnp.zeros((B,), jnp.int32)
        best_src = jnp.zeros((B,), jnp.int32)
        for d in range(1, max(2, depth + 1)):
            same = hs == shift_up(hs, d, jnp.uint32(0xFFFFFFFF))
            cand = shift_up(ps, d, jnp.int32(0))
            close = same & (ps - cand <= 65535) & (ps > cand)
            xs = [u ^ shift_up(u, d, jnp.uint32(0)) for u in us_s]
            # length from trailing-equal words + tz of first unequal
            mlen = jnp.zeros((B,), jnp.int32)
            carry = jnp.ones((B,), bool)
            for wi, x in enumerate(xs):
                eq = x == 0
                mlen = jnp.where(carry & ~eq, 4 * wi + tz(x), mlen)
                carry = carry & eq
            mlen = jnp.where(carry, capj, mlen)
            mlen = jnp.where(mlen >= 4, mlen, 0)
            mlen = jnp.where(close, mlen, 0)
            better = mlen > best_len
            best_len = jnp.where(better, mlen, best_len)
            best_src = jnp.where(better, cand, best_src)
        match_ok = (best_len >= 4) & (ps < B - 12) & (ps > 0)
        ml = jnp.minimum(best_len, (B - 5) - ps)
        match_ok &= ml >= 4
        mlen_sel = jnp.where(match_ok, ml, 0)
        src_sel = jnp.where(match_ok, best_src, -1)
        return ps, (mlen_sel << 17) | (src_sel & 0x1FFFF)

    return one


for NB in (64, 256):
    blks = jnp.asarray(rng.integers(0, 90, (NB, B)).astype(np.uint8))
    for n_words in (1, 2, 4):
        f = jax.jit(jax.vmap(make_noscatter(n_words)))
        dt = bench(f, blks)
        print(f"NB={NB} noscatter w={n_words}: {dt*1e3:.2f} ms = {NB*B/dt/1e6:.0f} MB/s", flush=True)

from zpack_tpu.kernels.lz4_pallas import tokenize_blocks_device
for NB in (256,):
    blks = jnp.asarray(rng.integers(0, 90, (NB, B)).astype(np.uint8))
    t0 = time.perf_counter()
    f_p = partial(tokenize_blocks_device, depth=2)
    r = f_p(blks); jax.block_until_ready(r)
    print(f"NB={NB} pallas compile: {time.perf_counter()-t0:.1f}s", flush=True)
    dt = bench(f_p, blks)
    print(f"NB={NB} pallas: {dt*1e3:.2f} ms = {NB*B/dt/1e6:.0f} MB/s", flush=True)
print("done", flush=True)
