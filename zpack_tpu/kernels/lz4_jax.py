"""Parallel LZ4 block encoding on TPU via JAX.

This is the TPU-native reformulation of LZ4 match finding + parsing
(role parity: the encode path the reference delegates to liblz4,
lib/zpack_write.c:204-211) as dense vector ops — no sequential hash-table
updates, no data-dependent python control flow:

  1. hash every 4-byte window (VPU),
  2. previous-occurrence chains via one stable sort (XLA sort),
  3. match-length extension as fixed-round masked 4-byte compares,
  4. greedy parse as *orbit doubling*: jump[i] = i + (match_len | 1);
     the parse is the orbit of 0 under jump, enumerated in log2(B)
     doubling steps of gathers (S ← S ∥ jump[S], jump ← jump[jump]).

The kernel returns the parse events (positions / sources / lengths);
byte-level serialization to the LZ4 wire format happens host-side in
O(#sequences) (on-TPU serialization via prefix-sum scatter is the
planned follow-up).  Works on any padded power-of-two block size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.lz4 import block as lz4block

MIN_MATCH = 4
MFLIMIT = 12
LAST_LITERALS = 5
MAX_OFFSET = 65535
CAPJ = 64  # on-device match length cap (fixed compare rounds)
_HASH_MUL = jnp.uint32(2654435761)


@partial(jax.jit, static_argnames=("depth",))
def tokenize_block(data: jax.Array, depth: int = 2):
    """Parse one block of B bytes (B static, power of two recommended).

    Returns (orbit, src, mlen):
      orbit: int32[B+1] — parse-event positions in increasing order, padded
             with B past the end of the parse;
      src:   int32[B]   — match source for each position (‑1 if none);
      mlen:  int32[B]   — selected match length at each position (0/1 if
             the event is a 1-byte literal step).
    """
    B = data.shape[0]
    b = data.astype(jnp.uint32)
    # u32 windows at every position (tail positions read zeros)
    bp = jnp.pad(b, (0, 4))
    u = bp[:B] | (bp[1 : B + 1] << 8) | (bp[2 : B + 2] << 16) | (bp[3 : B + 3] << 24)

    h = (u * _HASH_MUL) >> jnp.uint32(16)
    order = jnp.argsort(h, stable=True).astype(jnp.int32)
    h_sorted = h[order]
    same = h_sorted[1:] == h_sorted[:-1]
    cand = jnp.full((B,), -1, jnp.int32).at[order[1:]].set(
        jnp.where(same, order[:-1], -1)
    )

    pos = jnp.arange(B, dtype=jnp.int32)
    best_src = jnp.full((B,), -1, jnp.int32)
    best_len = jnp.zeros((B,), jnp.int32)
    cur = cand
    for _ in range(max(1, depth)):
        valid = (cur >= 0) & (pos - cur <= MAX_OFFSET)
        j = jnp.where(valid, cur, 0)
        valid &= u[j] == u
        mlen = _extend(u, b, pos, j, valid, B)
        better = valid & (mlen > best_len)
        best_src = jnp.where(better, j, best_src)
        best_len = jnp.where(better, mlen, best_len)
        cur = jnp.where(cur >= 0, cand[jnp.maximum(cur, 0)], -1)

    # parse rules: matches start before B-12, end by B-5
    match_ok = (best_len >= MIN_MATCH) & (pos < B - MFLIMIT) & (pos > 0)
    ml = jnp.minimum(best_len, (B - LAST_LITERALS) - pos)
    match_ok &= ml >= MIN_MATCH
    step = jnp.where(match_ok, ml, 1)
    mlen_sel = jnp.where(match_ok, ml, 0)

    # orbit doubling over jump (domain 0..B, B is the fixed point)
    jump = jnp.minimum(pos + step, B)
    jump = jnp.concatenate([jump, jnp.array([B], jnp.int32)])
    orbit = jnp.array([0], jnp.int32)
    n_doublings = max(1, int(np.ceil(np.log2(max(B, 2)))))
    for _ in range(n_doublings):
        if orbit.shape[0] > B:
            break
        orbit = jnp.concatenate([orbit, jump[orbit]])
        jump = jump[jump]
    orbit = orbit[: B + 1]
    return orbit, best_src, mlen_sel


def _extend(u, b, pos, j, valid, B):
    """Match extension as a rolled fori_loop of masked 4-byte compare
    rounds up to CAPJ, then one deferred byte-level remainder phase
    (capped matches are re-extended exactly host-side at serialization).
    Rolled loops keep the XLA graph small → fast compiles."""

    def round_body(_, carry):
        mlen, active = carry
        k = mlen  # active lanes all have mlen == current k
        p_k = jnp.minimum(pos + k, B - 1)
        j_k = jnp.minimum(j + k, B - 1)
        inb = (pos + k) <= (B - 4)
        eq = active & inb & (u[p_k] == u[j_k])
        return jnp.where(eq, mlen + 4, mlen), eq

    mlen = jnp.where(valid, MIN_MATCH, 0).astype(jnp.int32)
    mlen, active = jax.lax.fori_loop(
        0, (CAPJ - MIN_MATCH) // 4, round_body, (mlen, valid)
    )
    done = valid & ~active

    def byte_body(_, carry):
        mlen, done = carry
        pp = jnp.minimum(pos + mlen, B - 1)
        jj = jnp.minimum(j + mlen, B - 1)
        still = done & ((pos + mlen) < B) & (b[pp] == b[jj])
        return jnp.where(still, mlen + 1, mlen), still

    mlen, _ = jax.lax.fori_loop(0, 3, byte_body, (mlen, done))
    return mlen


def serialize_block_host(data: bytes, orbit: np.ndarray, src: np.ndarray,
                         mlen: np.ndarray) -> bytes:
    """Assemble the LZ4 block from device parse events (O(#sequences))."""
    n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    events = orbit[orbit < n]
    ev_len = mlen[events]
    match_ev = events[ev_len >= MIN_MATCH]
    limit = n - LAST_LITERALS
    if not (ev_len >= CAPJ).any():
        # fast path: no device-capped matches — the orbit is final; one
        # fully vectorized serialization
        return lz4block.serialize_sequences_np(
            data, match_ev, src[match_ev], mlen[match_ev]
        )
    from ..codecs import match as M

    mps: list[int] = []
    mss: list[int] = []
    mls: list[int] = []
    pos = 0
    for p in match_ev.tolist():
        if p < pos:
            continue  # covered by a host-extended earlier match
        ml = int(mlen[p])
        j = int(src[p])
        if ml >= CAPJ:
            ml = M.exact_extend(arr, p, j, ml, limit)
        ml = min(ml, limit - p)
        if ml < MIN_MATCH:
            continue
        mps.append(p)
        mss.append(j)
        mls.append(ml)
        pos = p + ml
    return lz4block.serialize_sequences_np(
        data, np.array(mps, np.int64), np.array(mss, np.int64), np.array(mls, np.int64)
    )


def compress_block_tpu(data: bytes, depth: int = 2) -> bytes:
    """One 2^k-sized LZ4 block, matcher+parse on device."""
    n = len(data)
    if n < MFLIMIT + 1:
        return lz4block.compress_block(data)
    B = 1 << max(4, (n - 1).bit_length())
    padded = np.zeros(B, dtype=np.uint8)
    padded[:n] = np.frombuffer(data, dtype=np.uint8)
    orbit, src, mlen = tokenize_block(jnp.asarray(padded), depth)
    orbit = np.asarray(orbit)
    src = np.asarray(src)
    mlen = np.asarray(mlen)
    if n != B:
        # padding may have created matches running past n: re-clamp and
        # drop those violating the real block's end rules
        mlen = np.minimum(mlen, np.maximum(n - LAST_LITERALS - np.arange(B), 0))
        pos = np.arange(B)
        bad = (pos >= n - MFLIMIT) | (mlen < MIN_MATCH)
        mlen = np.where(bad, 0, mlen)
        # re-parse on host over the (cheap) event list
        return _reparse_serialize(data, src, mlen)
    return serialize_block_host(data, orbit, src, mlen)


def _reparse_serialize(data: bytes, src: np.ndarray, mlen: np.ndarray) -> bytes:
    from ..codecs import match as M

    n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    out = bytearray()
    usable = np.flatnonzero(mlen[: max(n - MFLIMIT, 0)] >= MIN_MATCH)
    usable = usable[usable > 0]
    limit = n - LAST_LITERALS
    pos = 0
    lit_start = 0
    while True:
        k = int(np.searchsorted(usable, pos))
        if k >= len(usable):
            break
        p = int(usable[k])
        ml = int(mlen[p])
        j = int(src[p])
        if ml >= CAPJ:
            ml = M.exact_extend(arr, p, j, ml, limit)
        ml = min(ml, limit - p)
        if ml < MIN_MATCH:
            pos = p + 1
            continue
        lz4block._emit_sequence(out, data, lit_start, p - lit_start, p - j, ml)
        pos = p + ml
        lit_start = pos
    lz4block._emit_sequence(out, data, lit_start, n - lit_start, None, None)
    return bytes(out)
