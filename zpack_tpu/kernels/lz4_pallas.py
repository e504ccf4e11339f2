"""Fused Pallas LZ4 tokenizer — the whole match-finding pipeline as ONE
VMEM-resident TPU kernel.

Role parity: the encode hot loop the reference delegates to liblz4
(lib/zpack_write.c:204-211 / zn_lz4_compress in the native backend).

The XLA formulation (kernels/lz4_jax.py) burns its budget in the HBM-bound
multi-operand sort.  Here every pass of the bitonic network runs on VPU
registers over (512, 128)-tiled VMEM arrays, using only static lane/sublane
rolls and selects — no gathers, no scatters, no HBM traffic between passes:

  1. window build: bytes i..i+15 as four u32 lanes via masked linear shifts,
  2. key = hash16(u) << 16 | pos16 (unique keys -> stability for free),
  3. bitonic sort of (key, u, u4, u8, u12) — 136 compare-exchange substages,
     each a pair of rolls + selects per operand,
  4. hash-chain candidates = sorted neighbors at depth d; match length by
     leading-equal-bytes over the carried window words,
  5. end-of-block parse rules applied in the sorted domain,
  6. output (pos, packed len<<17|src) still hash-ordered; the host inverts
     the permutation with one vectorized numpy scatter (micro-cheap) —
     cheaper than a second on-device bitonic unsort.

Block size is fixed at 64 KiB (R=512 sublanes x C=128 lanes); smaller
inputs are zero-padded by the caller and re-clamped on the host exactly as
the XLA kernel does.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 512, 128
N = R * C  # 65536: positions fit 16 bits, so key packs (hash16, pos16)

MIN_MATCH = 4
MFLIMIT = 12
LAST_LITERALS = 5
MAX_OFFSET = 65535
CAPJ = 16  # carried-window match-length cap; >=CAPJ re-extended exactly on host
_HASH_MUL = 2654435761 - (1 << 32)  # as a signed i32 bit pattern


def _shift_down(a, d, c_iota, idx, fill=0):
    """out[i] = a[i + d] over the (R, C) row-major linear order, d < C.
    The last d linear positions (wrap-around) become `fill`."""
    A = jnp.roll(a, -d, axis=1)
    B = jnp.roll(A, -1, axis=0)
    out = jnp.where(c_iota >= C - d, B, A)
    return jnp.where(idx >= N - d, fill, out)


def _shift_up(a, d, c_iota, idx, fill):
    """out[i] = a[i - d] over the linear order, d < C; first d -> fill."""
    A = jnp.roll(a, d, axis=1)
    B = jnp.roll(A, 1, axis=0)
    out = jnp.where(c_iota < d, B, A)
    return jnp.where(idx < d, fill, out)


def _tz_bytes(x):
    """leading equal bytes of a little-endian u32 xor (0..3 for x != 0)."""
    return (
        ((x & 0xFF) == 0).astype(jnp.int32)
        + ((x & 0xFFFF) == 0).astype(jnp.int32)
        + ((x & 0xFFFFFF) == 0).astype(jnp.int32)
    )


def _substage(j, k, ops, c_iota, r_iota):
    """One bitonic compare-exchange: partner = i XOR j, ascending iff
    (i & k) == 0.  ops[0] is the (sign-flipped) sort key."""
    if j < C:
        lower = (c_iota & j) == 0
        mi = partial(jnp.roll, shift=-j, axis=1)
        pls = partial(jnp.roll, shift=j, axis=1)
    else:
        m = j // C
        lower = (r_iota & m) == 0
        mi = partial(jnp.roll, shift=-m, axis=0)
        pls = partial(jnp.roll, shift=m, axis=0)
    if k >= N:
        asc = None  # final merge: fully ascending
    elif k < C:
        asc = (c_iota & k) == 0
    else:
        asc = (r_iota & (k // C)) == 0
    key = ops[0]
    pkey = jnp.where(lower, mi(key), pls(key))
    t = pkey < key
    take = lower == t
    if asc is not None:
        take = take == asc
    out = [jnp.where(take, pkey, key)]
    for p in ops[1:]:
        pv = jnp.where(lower, mi(p), pls(p))
        out.append(jnp.where(take, pv, p))
    return out


def _tokenize_kernel(depth: int, x_ref, pos_ref, packed_ref):
    x = x_ref[0]  # (R, C) int32 bytes
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    idx = r_iota * C + c_iota

    # ---- 4-byte windows at offsets 0/4/8/12 (little-endian); the masked
    # shifts reproduce the XLA kernel's zero-padding exactly (byte i+s+j
    # reads as 0 once past the block end)
    b1 = _shift_down(x, 1, c_iota, idx)
    b2 = _shift_down(x, 2, c_iota, idx)
    b3 = _shift_down(x, 3, c_iota, idx)
    u = x | (b1 << 8) | (b2 << 16) | (b3 << 24)
    u4 = _shift_down(u, 4, c_iota, idx)
    u8 = _shift_down(u4, 4, c_iota, idx)
    u12 = _shift_down(u8, 4, c_iota, idx)

    h = jax.lax.shift_right_logical(u * jnp.int32(_HASH_MUL), 16)
    key = ((h << 16) | idx) ^ jnp.int32(-0x80000000)  # unsigned-order bias

    # ---- bitonic sort by key (136 substages, all static rolls)
    ops = [key, u, u4, u8, u12]
    k = 2
    while k <= N:
        j = k // 2
        while j >= 1:
            ops = _substage(j, k, ops, c_iota, r_iota)
            j //= 2
        k *= 2
    key, u, u4, u8, u12 = ops
    key = key ^ jnp.int32(-0x80000000)
    hs = jax.lax.shift_right_logical(key, 16)
    ps = key & 0xFFFF

    # ---- hash-chain candidates: sorted neighbor d rows above
    best_len = jnp.zeros((R, C), jnp.int32)
    best_src = jnp.zeros((R, C), jnp.int32)
    for d in range(1, max(2, depth + 1)):
        hs_d = _shift_up(hs, d, c_iota, idx, fill=-1)
        ps_d = _shift_up(ps, d, c_iota, idx, fill=0)
        same = hs == hs_d
        close = same & (ps - ps_d <= MAX_OFFSET) & (ps > ps_d)
        x0 = u ^ _shift_up(u, d, c_iota, idx, fill=0)
        x1 = u4 ^ _shift_up(u4, d, c_iota, idx, fill=0)
        x2 = u8 ^ _shift_up(u8, d, c_iota, idx, fill=0)
        x3 = u12 ^ _shift_up(u12, d, c_iota, idx, fill=0)
        e0 = x0 == 0
        e1 = x1 == 0
        e2 = x2 == 0
        l3 = jnp.where(e2, jnp.where(x3 == 0, 16, 12 + _tz_bytes(x3)), 8 + _tz_bytes(x2))
        mlen = jnp.where(e0, jnp.where(e1, l3, 4 + _tz_bytes(x1)), 0)
        mlen = jnp.where(close, mlen, 0)
        better = mlen > best_len
        best_len = jnp.where(better, mlen, best_len)
        best_src = jnp.where(better, ps_d, best_src)

    # ---- end-of-block parse rules (in the sorted domain; pos = ps)
    match_ok = (best_len >= MIN_MATCH) & (ps < N - MFLIMIT) & (ps > 0)
    ml = jnp.minimum(best_len, (N - LAST_LITERALS) - ps)
    match_ok &= ml >= MIN_MATCH
    mlen_sel = jnp.where(match_ok, ml, 0)
    src_sel = jnp.where(match_ok, best_src, -1)

    pos_ref[0] = ps
    packed_ref[0] = (mlen_sel << 17) | (src_sel & 0x1FFFF)


@partial(jax.jit, static_argnames=("depth", "interpret"))
def tokenize_blocks_device(blocks: jax.Array, depth: int = 2, interpret: bool = False):
    """Tokenize a batch of 64 KiB blocks: (nb, 65536) uint8 ->
    (pos, packed) int32 arrays of the same shape, still hash-sorted;
    invert with `unsort_host` (one numpy scatter)."""
    nb = blocks.shape[0]
    assert blocks.shape[1] == N, "pallas tokenizer is fixed at 64 KiB blocks"
    x = blocks.astype(jnp.int32).reshape(nb, R, C)
    kernel = partial(_tokenize_kernel, depth)
    pos, packed = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, R, C), jnp.int32),
            jax.ShapeDtypeStruct((nb, R, C), jnp.int32),
        ),
        interpret=interpret,
    )(x)
    return pos.reshape(nb, N), packed.reshape(nb, N)


def unsort_host(pos: np.ndarray, packed: np.ndarray):
    """Invert the hash-sort permutation on the host (vectorized scatter)
    and split the packed word: returns (src, mlen) int32 arrays shaped like
    the inputs — identical contract to lz4_jax.tokenize_block."""
    pos = np.asarray(pos)
    packed = np.asarray(packed)
    out = np.empty_like(packed)
    if pos.ndim == 1:
        out[pos] = packed
    else:
        np.put_along_axis(out, pos, packed, axis=-1)
    mlen = out >> 17
    src = out & 0x1FFFF
    src = np.where(mlen == 0, -1, src).astype(np.int32)
    return src, mlen.astype(np.int32)
