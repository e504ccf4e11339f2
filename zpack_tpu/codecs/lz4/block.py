"""LZ4 *block* codec — independent implementation of the public LZ4 block
format (token / literals / 16-bit offset / LSIC lengths).

Role parity: the block layer underneath the reference's LZ4F_* calls
(reference: lib/zpack_write.c:204-211, lib/zpack_read.c:414-439 delegate to
the lz4 library; the ZPack spec mandates the frame format on disk,
docs/specs.md:101 — frames are built on these blocks in frame.py).

Encoder design is deliberately *parallel-first* (the same formulation the
JAX/Pallas TPU kernel uses, zpack_tpu.kernels.lz4_jax):

  1. hash every 4-byte window (vector op),
  2. previous occurrence of each hash via one stable argsort — a depth-k
     "hash chain" is k gather steps, no sequential table updates,
  3. capped match-length extension as a handful of vectorized 4-byte
     compare rounds over a shrinking active set,
  4. greedy parse over *sequences* (not positions): literals are skipped
     with a searchsorted jump, so parse cost is O(#sequences), and
  5. serialization of token/LSIC/literals per sequence.

Output is valid LZ4 (decodable by any conformant decoder) but not
byte-identical to liblz4's encoder choices — the format permits this and
the archive contract only requires spec-valid frames at ≤ reference size.
"""

from __future__ import annotations

import numpy as np

from ...errors import CompressError, DecompressError

MIN_MATCH = 4
MFLIMIT = 12  # matches must not start within the last 12 bytes
LAST_LITERALS = 5  # last 5 bytes are always literals
MAX_OFFSET = 65535
_HASH_MUL = np.uint32(2654435761)
_CAP = 128  # vectorized match-length cap; capped matches extend exactly in the parse


def compress_bound(size: int) -> int:
    """Worst-case LZ4 block output (LZ4_compressBound formula)."""
    return size + size // 255 + 16


def _u32_windows(b: np.ndarray) -> np.ndarray:
    """u32 little-endian read at every position 0..n-4 (vectorized)."""
    n = len(b)
    u = b[: n - 3].astype(np.uint32)
    u |= b[1 : n - 2].astype(np.uint32) << np.uint32(8)
    u |= b[2 : n - 1].astype(np.uint32) << np.uint32(16)
    u |= b[3:n].astype(np.uint32) << np.uint32(24)
    return u


def _find_matches(b: np.ndarray, depth: int) -> tuple[np.ndarray, np.ndarray]:
    """For each position p return (match_src[p], match_len[p]); match_len < 4
    means no usable match.  match_len is capped at _CAP."""
    n = len(b)
    u = _u32_windows(b)  # length n-3
    m = len(u)
    h = (u * _HASH_MUL) >> np.uint32(16)  # 16-bit hash
    order = np.argsort(h, kind="stable").astype(np.int64)
    # prev-with-same-hash chain (depth 1): neighbors in the stable sort.
    cand = np.full(m, -1, dtype=np.int64)
    same = h[order[1:]] == h[order[:-1]]
    cand[order[1:][same]] = order[:-1][same]

    best_src = np.full(m, -1, dtype=np.int64)
    best_len = np.zeros(m, dtype=np.int64)
    cur = cand
    pos = np.arange(m, dtype=np.int64)
    for _ in range(max(1, depth)):
        valid = (cur >= 0) & (pos - cur <= MAX_OFFSET)
        j = np.where(valid, cur, 0)
        valid &= u[j] == u  # true 4-byte match (rejects hash collisions)
        mlen = _extend_matches(b, u, pos, j, valid)
        better = valid & (mlen > best_len)
        best_src = np.where(better, j, best_src)
        best_len = np.where(better, mlen, best_len)
        cur = np.where(cur >= 0, cand[np.maximum(cur, 0)], -1)
    return best_src, best_len


def _extend_matches(b, u, pos, j, valid) -> np.ndarray:
    """Vectorized LCP: match length for pairs (pos, j) where valid, starting
    from the guaranteed 4-byte match, capped at _CAP."""
    n = len(b)
    m = len(u)
    mlen = np.where(valid, MIN_MATCH, 0).astype(np.int64)
    active = np.flatnonzero(valid)
    k = MIN_MATCH
    while len(active) and k < _CAP:
        p_a = pos[active] + k
        j_a = j[active] + k
        inb = p_a <= m - 1  # u32 read available at p_a
        eq = np.zeros(len(active), dtype=bool)
        if inb.any():
            ia = active[inb]
            eq_i = u[pos[ia] + k] == u[j[ia] + k]
            eq[inb] = eq_i
        mlen[active[eq]] += 4
        # mismatched (or out of u32 range): add exact byte-level remainder
        done = active[~eq]
        if len(done):
            for t in range(3):
                pp = pos[done] + mlen[done]
                jj = j[done] + mlen[done]
                ok = pp < n
                oki = done[ok]
                still = b[pos[oki] + mlen[oki]] == b[j[oki] + mlen[oki]]
                mlen[oki[still]] += 1
        active = active[eq]
        k += 4
    return mlen


def _exact_extend(b: np.ndarray, p: int, j: int, start: int, limit: int) -> int:
    """Exact match extension past the vectorized cap: length of common prefix
    of b[p+start:] and b[j+start:], bounded so the match ends by `limit`."""
    maxlen = limit - p
    a = b[p + start : p + maxlen]
    c = b[j + start : j + maxlen]
    neq = np.flatnonzero(a != c)
    ext = int(neq[0]) if len(neq) else len(a)
    return start + ext


def _write_lsic(out: bytearray, value: int) -> None:
    while value >= 255:
        out.append(255)
        value -= 255
    out.append(value)


def compress_block(data: bytes, level: int = 1) -> bytes:
    """Compress one LZ4 block.  ``level`` maps to hash-chain search depth
    (1-2 → depth 2, higher levels search deeper like the HC modes)."""
    b = np.frombuffer(bytes(data), dtype=np.uint8)
    n = len(b)
    out = bytearray()
    if n == 0:
        return b""
    if n < MFLIMIT + 1:
        # too short for any match: single literal-only sequence
        _emit_sequence(out, data, 0, n, None, None)
        return bytes(out)

    depth = 2 if level <= 2 else min(1 << min(level - 1, 6), 64)
    src, mlen = _find_matches(b, depth)
    limit = n - LAST_LITERALS
    mf = n - MFLIMIT  # last allowed match start (exclusive)

    # positions with a usable match, in order (for searchsorted literal skip)
    usable = np.flatnonzero((mlen >= MIN_MATCH) & (np.arange(len(mlen)) < mf))
    usable = usable[usable > 0]

    pos = 0
    lit_start = 0
    while True:
        k = np.searchsorted(usable, pos)
        if k == len(usable):
            break
        p = int(usable[k])
        j = int(src[p])
        ml = int(mlen[p])
        # clamp to end-of-block rule; extend exactly if we hit the cap
        if ml >= _CAP:
            ml = _exact_extend(b, p, j, ml, limit)
        ml = min(ml, limit - p)
        if ml < MIN_MATCH:
            pos = p + 1
            continue
        _emit_sequence(out, data, lit_start, p - lit_start, p - j, ml)
        pos = p + ml
        lit_start = pos
    # final literals
    _emit_sequence(out, data, lit_start, n - lit_start, None, None)
    return bytes(out)


def _emit_sequence(out: bytearray, data: bytes, lit_off: int, lit_len: int,
                   offset: int | None, match_len: int | None) -> None:
    if offset is None:
        token = (min(lit_len, 15) << 4)
        out.append(token)
        if lit_len >= 15:
            _write_lsic(out, lit_len - 15)
        out += data[lit_off : lit_off + lit_len]
        return
    ml_code = match_len - MIN_MATCH
    token = (min(lit_len, 15) << 4) | min(ml_code, 15)
    out.append(token)
    if lit_len >= 15:
        _write_lsic(out, lit_len - 15)
    out += data[lit_off : lit_off + lit_len]
    out.append(offset & 0xFF)
    out.append((offset >> 8) & 0xFF)
    if ml_code >= 15:
        _write_lsic(out, ml_code - 15)


def decompress_block(data: bytes, max_out: int | None = None,
                     prefix: bytes = b"") -> bytes:
    """Decode one LZ4 block.  ``prefix`` supplies history for linked-block
    frames (matches may reach back into previously decoded blocks).

    Sequence replay runs one python step per *sequence* with C-speed slice
    copies; overlapping matches replicate their period via bytes repetition.
    """
    src = bytes(data)
    n = len(src)
    out = bytearray(prefix)
    base = len(prefix)
    pos = 0
    while pos < n:
        token = src[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise DecompressError("truncated literal length")
                c = src[pos]
                pos += 1
                lit_len += c
                if c != 255:
                    break
        if pos + lit_len > n:
            raise DecompressError("literal run overruns input")
        out += src[pos : pos + lit_len]
        pos += lit_len
        if pos == n:
            break  # last sequence: literals only
        if pos + 2 > n:
            raise DecompressError("truncated match offset")
        offset = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if offset == 0:
            raise DecompressError("zero match offset")
        match_len = (token & 0xF) + MIN_MATCH
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    raise DecompressError("truncated match length")
                c = src[pos]
                pos += 1
                match_len += c
                if c != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise DecompressError("match offset beyond output start")
        if offset >= match_len:
            out += out[start : start + match_len]
        else:
            pattern = out[start:]
            reps = match_len // offset + 1
            out += (bytes(pattern) * reps)[:match_len]
        if max_out is not None and len(out) - base > max_out:
            raise DecompressError("output exceeds declared size")
    return bytes(out[base:])
