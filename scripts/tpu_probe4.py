"""Probe 4: sort-width sweep for the w=2 tokenizer (16 MB per dispatch).

Sort cost is O(n log^2 n) per row and XLA batches row sorts, so narrower
rows should buy real speed; the trade is the match window (= row width).
"""
import sys, time
sys.path.insert(0, "/root/repo")
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

rng = np.random.default_rng(0)
_HASH_MUL = jnp.uint32(2654435761)
TOTAL = 16 << 20


def bench(fn, *args, reps=10, warm=2):
    for _ in range(warm):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def tz(x):
    return (((x & 0xFF) == 0).astype(jnp.int32)
            + ((x & 0xFFFF) == 0).astype(jnp.int32)
            + ((x & 0xFFFFFF) == 0).astype(jnp.int32))


def make_tok(B, depth=2):
    def one(data):
        bp = jnp.pad(data.astype(jnp.uint32), (0, 12))
        u = bp[:B] | (bp[1:B+1] << 8) | (bp[2:B+2] << 16) | (bp[3:B+3] << 24)
        u4 = bp[4:B+4] | (bp[5:B+5] << 8) | (bp[6:B+6] << 16) | (bp[7:B+7] << 24)
        h = (u * _HASH_MUL) >> jnp.uint32(16)
        key = (h << jnp.uint32(16)) | jnp.arange(B, dtype=jnp.uint32)
        key_s, u_s, u4_s = jax.lax.sort((key, u, u4), num_keys=1)
        hs = key_s >> jnp.uint32(16)
        ps = (key_s & jnp.uint32(0xFFFF)).astype(jnp.int32)

        def shift_up(a, d, fill):
            return jnp.concatenate([jnp.full((d,), fill, a.dtype), a[:-d]])

        best_len = jnp.zeros((B,), jnp.int32)
        best_src = jnp.zeros((B,), jnp.int32)
        for d in range(1, depth + 1):
            same = hs == shift_up(hs, d, jnp.uint32(0xFFFFFFFF))
            cand = shift_up(ps, d, jnp.int32(0))
            close = same & (ps > cand)
            x0 = u_s ^ shift_up(u_s, d, jnp.uint32(0))
            x1 = u4_s ^ shift_up(u4_s, d, jnp.uint32(0))
            e0 = x0 == 0
            mlen = jnp.where(e0, jnp.where(x1 == 0, 8, 4 + tz(x1)), 0)
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


for B in (65536, 16384, 8192, 4096):
    NB = TOTAL // B
    blks = jnp.asarray(rng.integers(0, 90, (NB, B)).astype(np.uint8))
    f = jax.jit(jax.vmap(make_tok(B)))
    dt = bench(f, blks)
    print(f"W={B} NB={NB}: {dt*1e3:.2f} ms = {TOTAL/dt/1e6:.0f} MB/s", flush=True)


@jax.jit
def elem_only(b):
    def one(data):
        B = data.shape[0]
        bp = jnp.pad(data.astype(jnp.uint32), (0, 12))
        u = bp[:B] | (bp[1:B+1] << 8) | (bp[2:B+2] << 16) | (bp[3:B+3] << 24)
        h = (u * _HASH_MUL) >> jnp.uint32(16)
        return h + jnp.roll(h, 1)
    return jax.vmap(one)(b)


blks = jnp.asarray(rng.integers(0, 90, (256, 65536)).astype(np.uint8))
dt = bench(elem_only, blks)
print(f"elementwise floor 16MB: {dt*1e3:.2f} ms = {TOTAL/dt/1e6:.0f} MB/s", flush=True)
print("done", flush=True)
