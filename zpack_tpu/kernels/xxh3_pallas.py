"""Batched XXH3-64 as a Pallas TPU kernel.

One kernel hashes up to 128 byte-streams in parallel — each *lane* carries
one stream, the grid walks 1 KiB hash-blocks, and the 8×u64 accumulator
state (as hi/lo uint32 rows) lives in VMEM scratch across grid steps.  All
64-bit arithmetic is built from 16/32-bit limbs (TPUs have no native u64).

This is the TPU-native shape for the many-small-files archive workload
(BASELINE config 4: 10k entries with per-entry XXH3, reference parity:
XXH3_64bits at lib/zpack_write.c:256): per-stream hashing is sequential,
but the fleet of streams vectorizes perfectly across lanes.

Bit-exact against zpack_tpu.codecs.xxh3 (the final <64-byte stripe + merge
run host-side per stream — a handful of scalar ops each).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs import xxh3 as H

LANES = 128
_SPB = 16  # stripes per 1 KiB block
_BLOCK = 1024

_M16 = 0xFFFF


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(jnp.uint32)
    return ah + bh + carry, lo


def _mul32_64(a, b):
    a_lo = a & _M16
    a_hi = a >> 16
    b_lo = b & _M16
    b_hi = b >> 16
    p_ll = a_lo * b_lo
    p_lh = a_lo * b_hi
    p_hl = a_hi * b_lo
    mid = (p_ll >> 16) + (p_lh & _M16) + (p_hl & _M16)
    lo = (p_ll & _M16) | ((mid & _M16) << 16)
    hi = a_hi * b_hi + (p_lh >> 16) + (p_hl >> 16) + (mid >> 16)
    return hi, lo


def _mul64_by_const(ah, al, m: int):
    """(ah, al) * m (python-int u32) → low 64 bits."""
    m_lo = m & _M16
    m_hi = m >> 16
    a_lo = al & _M16
    a_hi = al >> 16
    p_ll = a_lo * m_lo
    p_lh = a_lo * m_hi
    p_hl = a_hi * m_lo
    mid = (p_ll >> 16) + (p_lh & _M16) + (p_hl & _M16)
    lo = (p_ll & _M16) | ((mid & _M16) << 16)
    hi = a_hi * m_hi + (p_lh >> 16) + (p_hl >> 16) + (mid >> 16)
    return hi + ah * np.uint32(m), lo


def _pair_swap(x):
    """(16, 8, LANES) → lanes 0↔1, 2↔3, … swapped along the middle axis."""
    x4 = x.reshape(_SPB, 4, 2, LANES)
    return jnp.concatenate([x4[:, :, 1:2, :], x4[:, :, 0:1, :]], axis=2).reshape(
        _SPB, 8, LANES
    )


def _kernel(nstripes_ref, sec_hi_ref, sec_lo_ref, misc_ref, data_ref, out_ref, acc_ref):
    """Grid step g processes 1 KiB hash-block g of every stream.

    data_ref:  (1, 256, LANES) u32 — rows 0-127 the u64-lane LOW words
               (stripe*8 + lane), rows 128-255 the HIGH words
    nstripes_ref: (8, LANES) i32 — row 0 = whole-stripe count per stream
    sec_*_ref: (16, 8, LANES) u32 — kSecret lane words (hi/lo), broadcast
    misc_ref:  (32, LANES) u32 — rows 0-7 init_hi, 8-15 init_lo,
               16-23 scramble-tail hi, 24-31 scramble-tail lo
    acc_ref:   (16, LANES) u32 VMEM scratch — rows 0-7 acc_hi, 8-15 acc_lo
    out_ref:   (16, LANES) u32 — final accumulator snapshot
    """
    from jax.experimental import pallas as pl

    g = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(g == 0)
    def _init():
        acc_ref[0:8, :] = misc_ref[0:8, :]
        acc_ref[8:16, :] = misc_ref[8:16, :]

    x = data_ref[0]  # (256, LANES)
    lo = x[0:128].reshape(_SPB, 8, LANES)  # u64-lane low words
    hi = x[128:256].reshape(_SPB, 8, LANES)

    k_hi = hi ^ sec_hi_ref[...]
    k_lo = lo ^ sec_lo_ref[...]
    m_hi, m_lo = _mul32_64(k_lo, k_hi)  # (16, 8, LANES)
    s_hi = _pair_swap(hi)
    s_lo = _pair_swap(lo)

    # per-stream stripe mask: stripe (g*16 + s) active iff < nstripes
    ns = nstripes_ref[0, :]  # (LANES,) i32
    a_hi = acc_ref[0:8, :]
    a_lo = acc_ref[8:16, :]
    zero = jnp.zeros((8, LANES), jnp.uint32)
    for s in range(_SPB):
        m = (g * _SPB + s) < ns[None, :]
        mh = jnp.where(m, m_hi[s], zero)
        ml = jnp.where(m, m_lo[s], zero)
        a_hi, a_lo = _add64(a_hi, a_lo, mh, ml)
        sh = jnp.where(m, s_hi[s], zero)
        sl = jnp.where(m, s_lo[s], zero)
        a_hi, a_lo = _add64(a_hi, a_lo, sh, sl)

    # scramble for streams whose block g is full: (g+1)*16 <= nstripes
    t_hi = misc_ref[16:24, :]
    t_lo = misc_ref[24:32, :]
    sc_lo = a_lo ^ (a_hi >> 15) ^ t_lo  # acc ^= acc>>47 (pair: lo ^= hi>>15)
    sc_hi = a_hi ^ t_hi
    n_hi, n_lo = _mul64_by_const(sc_hi, sc_lo, H.PRIME32_1)
    full = ((g + 1) * _SPB) <= ns[None, :]  # (1, LANES)
    a_hi = jnp.where(full, n_hi, a_hi)
    a_lo = jnp.where(full, n_lo, a_lo)

    acc_ref[0:8, :] = a_hi
    acc_ref[8:16, :] = a_lo

    @pl.when(g == n_blocks - 1)
    def _emit():
        out_ref[0:8, :] = acc_ref[0:8, :]
        out_ref[8:16, :] = acc_ref[8:16, :]


def _make_consts():
    sec = H._KSECRET_LANES  # (16, 8) uint64
    sec_hi = np.broadcast_to(
        (sec >> np.uint64(32)).astype(np.uint32)[:, :, None], (16, 8, LANES)
    ).copy()
    sec_lo = np.broadcast_to(
        (sec & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, :, None], (16, 8, LANES)
    ).copy()
    misc = np.zeros((32, LANES), dtype=np.uint32)
    init = np.array(H._INIT_ACC, dtype=np.uint64)
    misc[0:8] = ((init >> np.uint64(32)).astype(np.uint32))[:, None]
    misc[8:16] = ((init & np.uint64(0xFFFFFFFF)).astype(np.uint32))[:, None]
    tail = np.frombuffer(H.KSECRET, dtype="<u8", count=8, offset=H.SECRET_SIZE - 64)
    misc[16:24] = ((tail >> np.uint64(32)).astype(np.uint32))[:, None]
    misc[24:32] = ((tail & np.uint64(0xFFFFFFFF)).astype(np.uint32))[:, None]
    return sec_hi, sec_lo, misc


_CONSTS = None


@functools.partial(jax.jit, static_argnames=("n_blocks", "interpret"))
def _run(nstripes: jax.Array, sec_hi, sec_lo, misc, data: jax.Array, n_blocks: int,
         interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((8, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 8, LANES), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 8, LANES), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, LANES), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((16, LANES), jnp.uint32)],
        interpret=interpret,  # pallas on CPU backend = interpreter mode
    )(nstripes, sec_hi, sec_lo, misc, data)


def xxh3_64_batch(streams: list[bytes]) -> list[int]:
    """Hash up to LANES byte-streams with the accumulate phase on TPU.

    Streams ≤ 240 bytes take the (cheap) host short path; longer streams
    share one Pallas dispatch per LANES-sized group.  Returns one XXH3-64
    per stream, bit-exact.
    """
    global _CONSTS
    results: list[int | None] = [None] * len(streams)
    long_idx = [i for i, s in enumerate(streams) if len(s) > H.MIDSIZE_MAX]
    for i, s in enumerate(streams):
        if len(s) <= H.MIDSIZE_MAX:
            results[i] = H.xxh3_64(s)
    if long_idx and _CONSTS is None:
        sec_hi, sec_lo, misc = _make_consts()
        _CONSTS = (jnp.asarray(sec_hi), jnp.asarray(sec_lo), jnp.asarray(misc))
    for base in range(0, len(long_idx), LANES):
        batch = long_idx[base : base + LANES]
        nstripes = np.zeros((8, LANES), dtype=np.int32)
        max_blocks = 1
        for k, i in enumerate(batch):
            ns = (len(streams[i]) - 1) // 64
            nstripes[0, k] = ns
            max_blocks = max(max_blocks, -(-ns // _SPB))
        data = np.zeros((max_blocks, 256, LANES), dtype=np.uint32)
        for k, i in enumerate(batch):
            s = streams[i]
            ns = (len(s) - 1) // 64
            u = np.frombuffer(s, dtype="<u4", count=ns * 16)
            blocks = -(-ns // _SPB)
            padded = np.zeros(blocks * 256, dtype=np.uint32)
            padded[: ns * 16] = u
            per = padded.reshape(blocks, 128, 2)  # [block, stripe*8+lane, lo/hi]
            data[:blocks, 0:128, k] = per[:, :, 0]
            data[:blocks, 128:256, k] = per[:, :, 1]
        interpret = jax.default_backend() != "tpu"
        acc_out = np.asarray(
            _run(jnp.asarray(nstripes), *_CONSTS, jnp.asarray(data), max_blocks,
                 interpret)
        )
        for k, i in enumerate(batch):
            s = streams[i]
            acc = (acc_out[0:8, k].astype(np.uint64) << np.uint64(32)) | acc_out[
                8:16, k
            ].astype(np.uint64)
            # final (possibly overlapping) stripe + merge on host
            last = np.frombuffer(s, dtype="<u8", count=8, offset=len(s) - 64)
            lsec = np.frombuffer(
                H.KSECRET, dtype="<u8", count=8,
                offset=H.SECRET_SIZE - 64 - H._SECRET_LASTACC_START,
            )
            key = last ^ lsec
            acc = acc + (key & np.uint64(0xFFFFFFFF)) * (key >> np.uint64(32))
            acc = acc + last[H._SWAP_IDX]
            results[i] = H._merge_accs(acc, H.KSECRET, (len(s) * H.PRIME64_1) & H.MASK64)
    return results
