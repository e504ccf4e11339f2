#!/usr/bin/env python
"""Measure TPU primitive rates that bound the entropy-kernel designs:
scatter-add, gather at several widths, one-hot matmul table lookup, and
lax.scan step overhead.  Prints `<name> <value>` lines immediately.

Methodology: min of single blocking calls, operands pre-staged on device
(docs/roofline.md; the loop-then-block-once idiom over-reports on axon).
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", os.environ.get("ZPACK_TPU_BENCH_PLATFORM", ""))

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
    dev = jax.devices()[0]
    emit("platform_ok", 1)

    # --- scatter-add u32, random vs monotone indices
    S, Q, W = 64, 16384, 8192
    vals = jax.device_put(jnp.asarray(rng.integers(0, 2**31, (S, Q), dtype=np.int64).astype(np.uint32)), dev)
    idx_r = jax.device_put(jnp.asarray(rng.integers(0, W, (S, Q)).astype(np.int32)), dev)
    idx_m = jax.device_put(jnp.asarray(np.sort(rng.integers(0, W, (S, Q)).astype(np.int32), axis=1)), dev)

    @jax.jit
    def scat(v, i):
        acc = jnp.zeros((S, W), jnp.uint32)
        return jax.vmap(lambda a, vv, ii: a.at[ii].add(vv, mode="drop"))(acc, v, i)

    t = best(lambda: scat(vals, idx_r))
    emit("scatter_rand_Melem_s", S * Q / t / 1e6)
    t = best(lambda: scat(vals, idx_m))
    emit("scatter_mono_Melem_s", S * Q / t / 1e6)

    # --- gather via take_along_axis at widths
    for S2, L2 in ((64, 65536), (1024, 16384), (8, 65536)):
        tab = jax.device_put(jnp.asarray(rng.integers(0, 255, (S2, 2048)).astype(np.int32)), dev)
        ids = jax.device_put(jnp.asarray(rng.integers(0, 2048, (S2, L2)).astype(np.int32)), dev)

        @jax.jit
        def gat(t_, i_):
            return jnp.take_along_axis(t_, i_, axis=1)

        t = best(lambda: gat(tab, ids))
        emit(f"gather_S{S2}_L{L2}_Melem_s", S2 * L2 / t / 1e6)

    # --- one-hot matmul lookup: (N,256)f32 @ (256,2)f32
    N = 1 << 20
    syms = jax.device_put(jnp.asarray(rng.integers(0, 256, N).astype(np.uint8)), dev)
    tab2 = jax.device_put(jnp.asarray(rng.integers(0, 2048, (256, 2)).astype(np.float32)), dev)

    @jax.jit
    def onehot_lookup(s, t_):
        oh = (s[:, None] == jnp.arange(256, dtype=jnp.uint8)[None, :]).astype(jnp.float32)
        return oh @ t_

    t = best(lambda: onehot_lookup(syms, tab2))
    emit("onehot_matmul_Melem_s", N / t / 1e6)

    # --- small-domain gather as dense select (256-entry table, dense compare)
    @jax.jit
    def dense_lut(s, t_):
        # sum over one-hot without matmul: segment trick via take? use matmul above.
        oh = (s[:, None] == jnp.arange(256, dtype=jnp.uint8)[None, :])
        return jnp.sum(jnp.where(oh, t_[None, :, 0], 0.0), axis=1)

    t = best(lambda: dense_lut(syms, tab2))
    emit("dense_select_Melem_s", N / t / 1e6)

    # --- plain 2048-entry gather with SHARED table (no per-stream axis)
    ids1 = jax.device_put(jnp.asarray(rng.integers(0, 2048, N).astype(np.int32)), dev)
    tab1 = jax.device_put(jnp.asarray(rng.integers(0, 255, 2048).astype(np.int32)), dev)

    @jax.jit
    def gat1(t_, i_):
        return t_[i_]

    t = best(lambda: gat1(tab1, ids1))
    emit("gather_shared2048_Melem_s", N / t / 1e6)

    # --- scan step overhead: 16384 trivial steps on (1024,) state
    st0 = jax.device_put(jnp.zeros(1024, jnp.int32), dev)

    @jax.jit
    def scan_triv(s0):
        def step(c, _):
            return c + 1, c
        c, ys = jax.lax.scan(step, s0, None, length=16384)
        return c

    t = best(lambda: scan_triv(st0))
    emit("scan_16k_steps_us_per_step", t / 16384 * 1e6)

    # --- scan with one width-S gather per step (decode shape), S=1024
    tabg = jax.device_put(jnp.asarray(rng.integers(0, 2048, (1024, 2048)).astype(np.int32)), dev)

    @jax.jit
    def scan_gather(s0):
        def step(c, _):
            g = jnp.take_along_axis(tabg, (c & 2047)[:, None], axis=1)[:, 0]
            return c + g, ()
        c, _ = jax.lax.scan(step, s0, None, length=4096)
        return c

    t = best(lambda: scan_gather(st0))
    emit("scan_gather_S1024_Melem_s", 1024 * 4096 / t / 1e6)
    return 0


if __name__ == "__main__":
    sys.exit(main())
