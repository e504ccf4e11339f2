#!/usr/bin/env python
"""Decompose the device huffman encode into stages and time each on the
real chip — finds which op eats the 32 MB/s (primitive rates say the
gathers/scatters alone should run ~100x faster)."""
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def emit(name, v):
    print(f"{name} {v:.4g}", flush=True)


def best(fn, reps=5):
    jax.block_until_ready(fn())
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        b = min(b, time.perf_counter() - t0)
    return b


def main():
    rng = np.random.default_rng(0)
    from zpack_tpu.codecs.zstd import huffman as H
    from zpack_tpu.kernels import huffman_jax as HJ

    lit = rng.choice(np.arange(48, dtype=np.uint8), size=16384,
                     p=rng.dirichlet(np.ones(48) * 0.3)).astype(np.uint8)
    et = H.build_encode_table(np.bincount(lit, minlength=256))
    S, L = 256, 16384
    base = np.broadcast_to(lit, (S, L)).copy()
    for i in range(S):
        base[i] = np.roll(lit, i)
    syms = jnp.asarray(base)
    lens = jnp.full((S,), L, jnp.int32)
    ct = jnp.asarray(np.broadcast_to(
        np.pad(et.codes.astype(np.int32), (0, 256 - len(et.codes))), (S, 256)).copy())
    lt = jnp.asarray(np.broadcast_to(
        np.pad(et.lengths.astype(np.int32), (0, 256 - len(et.lengths))), (S, 256)).copy())
    nw = HJ.words_needed(L)
    mbs = S * L / 1e6

    t = best(lambda: HJ.encode_streams(syms, lens, ct, lt, n_words=nw))
    emit("full_MBps", mbs / t)

    # stage 1: the table lookups only
    @jax.jit
    def lookups(syms, lens, ct, lt):
        def one(s, n, c, l):
            idx_r = jnp.arange(L, dtype=jnp.int32)
            valid = idx_r < n
            lens_ = jnp.where(valid, l[s], 0).astype(jnp.int32)
            vals_ = jnp.where(valid, c[s], 0).astype(jnp.uint32)
            return lens_.sum() + vals_.sum().astype(jnp.int32)
        return jax.vmap(one)(syms, lens, ct, lt)

    t = best(lambda: lookups(syms, lens, ct, lt))
    emit("lookups_MBps", mbs / t)

    # stage 2: + tree combine + cumsum (no scatter)
    @jax.jit
    def tree_cumsum(syms, lens, ct, lt):
        def one(s, n, c, l):
            idx_r = jnp.arange(L, dtype=jnp.int32)
            valid = idx_r < n
            lens_ = jnp.where(valid, l[s], 0).astype(jnp.int32)
            vals_ = jnp.where(valid, c[s], 0).astype(jnp.uint32)
            l0, l1, l2, l3 = lens_[0::4], lens_[1::4], lens_[2::4], lens_[3::4]
            v0, v1, v2, v3 = vals_[0::4], vals_[1::4], vals_[2::4], vals_[3::4]
            v01 = v1 | (v0 << l1.astype(jnp.uint32))
            v23 = v3 | (v2 << l3.astype(jnp.uint32))
            l01 = l0 + l1
            l23 = l2 + l3
            s_ = l23.astype(jnp.uint32)
            lo4 = v23 | (v01 << s_)
            hi4 = (v01 >> jnp.uint32(1)) >> (jnp.uint32(31) - s_)
            l4 = l01 + l23
            csum4 = jnp.cumsum(l4)
            return csum4[-1] + lo4.sum().astype(jnp.int32) + hi4.sum().astype(jnp.int32)
        return jax.vmap(one)(syms, lens, ct, lt)

    t = best(lambda: tree_cumsum(syms, lens, ct, lt))
    emit("tree_cumsum_MBps", mbs / t)

    # stage 3: scatter only (precomputed operands)
    Q = L // 4
    w0 = jnp.asarray(rng.integers(0, 2**31, (S, Q)).astype(np.uint32))
    widx = jnp.asarray(np.sort(rng.integers(0, nw - 3, (S, Q)).astype(np.int32))[:, ::-1].copy())

    @jax.jit
    def scatter3(w0, widx):
        def one(v, i):
            acc = jnp.zeros(nw, dtype=jnp.uint32)
            acc = acc.at[i].add(v, mode="drop")
            acc = acc.at[i + 1].add(v ^ jnp.uint32(1), mode="drop")
            acc = acc.at[i + 2].add(v ^ jnp.uint32(2), mode="drop")
            return acc
        return jax.vmap(one)(w0, widx)

    t = best(lambda: scatter3(w0, widx))
    emit("scatter3_MBps", mbs / t)

    # stage 4: cumsum alone at (S, Q)
    l4 = jnp.asarray(rng.integers(0, 44, (S, Q)).astype(np.int32))

    @jax.jit
    def just_cumsum(x):
        return jnp.cumsum(x, axis=1)[:, -1]

    t = best(lambda: just_cumsum(l4))
    emit("cumsum_MBps", mbs / t)
    return 0


if __name__ == "__main__":
    sys.exit(main())
