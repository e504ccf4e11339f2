"""Probe 2: scatter-free XLA tokenizer vs fused Pallas kernel on real TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 65536
rng = np.random.default_rng(0)


def bench(fn, *args, reps=10, warm=2):
    for _ in range(warm):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


from zpack_tpu.kernels.lz4_jax import tokenize_block, _HASH_MUL


def tokenize_noscatter(data, depth=2):
    """tokenize_block minus the unsort scatter: returns (ps, packed)."""
    b = data.astype(jnp.uint32)
    bp = jnp.pad(b, (0, 20))
    u = bp[:B] | (bp[1:B+1] << 8) | (bp[2:B+2] << 16) | (bp[3:B+3] << 24)
    u4 = bp[4:B+4] | (bp[5:B+5] << 8) | (bp[6:B+6] << 16) | (bp[7:B+7] << 24)
    u8_ = bp[8:B+8] | (bp[9:B+9] << 8) | (bp[10:B+10] << 16) | (bp[11:B+11] << 24)
    u12 = bp[12:B+12] | (bp[13:B+13] << 8) | (bp[14:B+14] << 16) | (bp[15:B+15] << 24)
    h = (u * _HASH_MUL) >> jnp.uint32(16)
    pos_u = jnp.arange(B, dtype=jnp.uint32)
    key = (h << jnp.uint32(16)) | pos_u
    key_s, u_s, u4_s, u8_s, u12_s = jax.lax.sort((key, u, u4, u8_, u12), num_keys=1)
    hs = key_s >> jnp.uint32(16)
    ps = (key_s & jnp.uint32(0xFFFF)).astype(jnp.int32)

    def shift_up(a, d, fill):
        return jnp.concatenate([jnp.full((d,), fill, a.dtype), a[:-d]])

    best_len = jnp.zeros((B,), jnp.int32)
    best_src = jnp.zeros((B,), jnp.int32)
    for d in range(1, max(2, depth + 1)):
        same = hs == shift_up(hs, d, jnp.uint32(0xFFFFFFFF))
        cand_pos = shift_up(ps, d, jnp.int32(0))
        close = same & (ps - cand_pos <= 65535) & (ps > cand_pos)
        x0 = u_s ^ shift_up(u_s, d, jnp.uint32(0))
        x1 = u4_s ^ shift_up(u4_s, d, jnp.uint32(0))
        x2 = u8_s ^ shift_up(u8_s, d, jnp.uint32(0))
        x3 = u12_s ^ shift_up(u12_s, d, jnp.uint32(0))
        def tz(x):
            return (((x & 0xFF) == 0).astype(jnp.int32)
                    + ((x & 0xFFFF) == 0).astype(jnp.int32)
                    + ((x & 0xFFFFFF) == 0).astype(jnp.int32))
        e0 = x0 == 0; e1 = x1 == 0; e2 = x2 == 0
        l3 = jnp.where(e2, jnp.where(x3 == 0, 16, 12 + tz(x3)), 8 + tz(x2))
        mlen = jnp.where(e0, jnp.where(e1, l3, 4 + tz(x1)), 0)
        mlen = jnp.where(close, mlen, 0)
        better = mlen > best_len
        best_len = jnp.where(better, mlen, best_len)
        best_src = jnp.where(better, cand_pos, best_src)
    match_ok = (best_len >= 4) & (ps < B - 12) & (ps > 0)
    ml = jnp.minimum(best_len, (B - 5) - ps)
    match_ok &= ml >= 4
    mlen_sel = jnp.where(match_ok, ml, 0)
    src_sel = jnp.where(match_ok, best_src, -1)
    return ps, (mlen_sel << 17) | (src_sel & 0x1FFFF)


for NB in (16, 64):
    blks = jnp.asarray(rng.integers(0, 90, (NB, B)).astype(np.uint8))
    f_old = jax.jit(jax.vmap(partial(tokenize_block, depth=2)))
    dt = bench(f_old, blks)
    print(f"NB={NB} old tokenize: {dt*1e3:.2f} ms = {NB*B/dt/1e6:.0f} MB/s", flush=True)
    f_ns = jax.jit(jax.vmap(partial(tokenize_noscatter, depth=2)))
    dt = bench(f_ns, blks)
    print(f"NB={NB} noscatter:    {dt*1e3:.2f} ms = {NB*B/dt/1e6:.0f} MB/s", flush=True)

from zpack_tpu.kernels.lz4_pallas import tokenize_blocks_device
for NB in (16, 64):
    blks = jnp.asarray(rng.integers(0, 90, (NB, B)).astype(np.uint8))
    t0 = time.perf_counter()
    f_p = partial(tokenize_blocks_device, depth=2)
    r = f_p(blks); jax.block_until_ready(r)
    print(f"NB={NB} pallas first call (compile): {time.perf_counter()-t0:.1f}s", flush=True)
    dt = bench(f_p, blks)
    print(f"NB={NB} pallas:       {dt*1e3:.2f} ms = {NB*B/dt/1e6:.0f} MB/s", flush=True)
print("done", flush=True)
