"""Device-side zstd FSE sequence-section encoding.

Role parity: the FSE half of the entropy machinery inside the reference's
vendored zstd (behind ``ZSTD_compressCCtx`` at lib/zpack_write.c:179,
RFC 8878 §3.1.1.3.2) — together with kernels/huffman_jax.py this makes the
mesh zstd entropy stage fully device-resident.

TPU formulation: the three FSE state machines (LL/OF/ML) are inherently
sequential per block, but only in the *state* dimension — so a single
``lax.scan`` walks all blocks' state chains in lockstep (3 small
table-gathers of width n_blocks per step), while everything dense (code
mapping, extra-bit values, bit offsets via cumsum, and the bit-plane
scatter) runs vectorized outside the scan.  The final bitstream is packed
exactly like the huffman kernel: disjoint-bit contributions scatter-added
into a u32 plane (add == or because no two items share a bit).

Bit-exactness is pinned against codecs/zstd/seq.encode_sequences in
tests/test_kernels.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.zstd import seq as zseq

#: max symbols of any sequence-code alphabet (ML has 53) padded to a lane
NSYM = 64
#: max FSE table size: 1 << max(LL_MAX_AL, ML_MAX_AL, OF_MAX_AL) = 1 << 9
TABLE = 512

# dense numpy versions of seq.ll_code / seq.ml_code ------------------------

_LL_SMALL_NP = np.array(zseq._LL_SMALL, dtype=np.int32)
_ML_SMALL_NP = np.array(zseq._ML_SMALL, dtype=np.int32)
_LL_BASE_NP = np.array(zseq.LL_BASELINES, dtype=np.int32)
_LL_BITS_NP = np.array(zseq.LL_BITS, dtype=np.int32)
_ML_BASE_NP = np.array(zseq.ML_BASELINES, dtype=np.int32)
_ML_BITS_NP = np.array(zseq.ML_BITS, dtype=np.int32)


def _bit_length(v: np.ndarray) -> np.ndarray:
    """Exact bit_length for int64 values < 2**53 (frexp is exact there)."""
    m = np.asarray(v, dtype=np.float64)
    return np.where(v > 0, np.frexp(m)[1], 0).astype(np.int32)


def ll_codes_np(lls: np.ndarray) -> np.ndarray:
    lls = np.asarray(lls, dtype=np.int64)
    big = 19 + _bit_length(np.maximum(lls, 1)) - 1
    small = _LL_SMALL_NP[np.minimum(lls, 63)]
    return np.where(lls > 63, big, small).astype(np.int32)


def ml_codes_np(mls: np.ndarray) -> np.ndarray:
    m = np.asarray(mls, dtype=np.int64) - 3
    big = 36 + _bit_length(np.maximum(m, 1)) - 1
    small = _ML_SMALL_NP[np.minimum(m, 127)]
    return np.where(m > 127, big, small).astype(np.int32)


def of_codes_np(ovs: np.ndarray) -> np.ndarray:
    return (_bit_length(np.asarray(ovs, dtype=np.int64)) - 1).astype(np.int32)


# device kernel --------------------------------------------------------------


def _init_state(sym, st, dnb, dfs):
    """Vectorized fse.EncodeTable.init_state over the block batch."""
    d = jnp.take_along_axis(dnb, sym[:, None], axis=1)[:, 0]
    nb = (d + (1 << 15)) >> 16
    val = (nb << 16) - d
    f = jnp.take_along_axis(dfs, sym[:, None], axis=1)[:, 0]
    return jnp.take_along_axis(st, ((val >> nb) + f)[:, None], axis=1)[:, 0]


@partial(jax.jit, static_argnames=("n_words",))
def encode_seq_streams(r_llx, r_llnb, r_mlx, r_mlnb, r_ofx, r_ofnb,
                       r_llc, r_mlc, r_ofc, n_seq,
                       ll_st, ll_dnb, ll_dfs, ll_al,
                       of_st, of_dnb, of_dfs, of_al,
                       ml_st, ml_dnb, ml_dfs, ml_al, *, n_words: int):
    """Batched sequence-bitstream encode.

    All r_* arrays are (B, N) int32 in REVERSED sequence order
    (r[b, k] = sequence n_b-1-k of block b, zero past n_b): extra-bit
    values/counts per field plus the three code streams.  n_seq: (B,)
    valid counts; per-kind FSE tables (B, TABLE)/(B, NSYM)/(B,) int32.
    Returns (words (B, n_words) uint32, total_bits (B,) int32) exactly
    matching seq.encode_sequences + BackwardBitWriter.finish().
    """
    B, N = r_llc.shape

    # states init on the LAST sequence (k = 0)
    ll0 = _init_state(r_llc[:, 0], ll_st, ll_dnb, ll_dfs)
    of0 = _init_state(r_ofc[:, 0], of_st, of_dnb, of_dfs)
    ml0 = _init_state(r_mlc[:, 0], ml_st, ml_dnb, ml_dfs)

    # bulk-gather the symbol-indexed deltas for every step up front (the
    # scan body then only does the state-table gathers)
    # MXU one-hot lookups: generic gathers run ~100-175 Melem/s on the
    # v5e (docs/roofline.md session-2 correction) while a one-hot matmul
    # against these tiny (<=64-symbol) tables is ~free and exact — dnb
    # < 2^21 and |dfs| < 512 are both f32-exact
    def _lut(codes, tab):
        oh = jax.nn.one_hot(codes, tab.shape[1], dtype=jnp.float32)
        return jnp.einsum("bnc,bc->bn", oh, tab.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST,
                          ).astype(jnp.int32)

    ll_d = _lut(r_llc, ll_dnb)
    ll_f_ = _lut(r_llc, ll_dfs)
    of_d = _lut(r_ofc, of_dnb)
    of_f_ = _lut(r_ofc, of_dfs)
    ml_d = _lut(r_mlc, ml_dnb)
    ml_f_ = _lut(r_mlc, ml_dfs)

    # ONE concatenated state table: the scan body's three per-kind gathers
    # fuse into a single (B, 3) take_along_axis — in-scan gathers are
    # latency-bound per OP on this TPU (docs/roofline.md), so dispatching
    # one instead of three is the scan's dominant cost lever
    W_of = of_st.shape[1]
    W_ml = ml_st.shape[1]
    cat_st = jnp.concatenate([of_st, ml_st, ll_st], axis=1)

    def step(carry, k):
        ll_s, of_s, ml_s = carry
        active = k < n_seq
        # emission order per host loop: of state bits, ml, ll
        of_n = jnp.where(active, (of_s + of_d[:, k]) >> 16, 0)
        of_v = of_s & ((jnp.int32(1) << of_n) - 1)
        ml_n = jnp.where(active, (ml_s + ml_d[:, k]) >> 16, 0)
        ml_v = ml_s & ((jnp.int32(1) << ml_n) - 1)
        ll_n = jnp.where(active, (ll_s + ll_d[:, k]) >> 16, 0)
        ll_v = ll_s & ((jnp.int32(1) << ll_n) - 1)
        # inactive lanes gather a junk (possibly cross-segment) entry and
        # discard it below, exactly like the old masked per-kind gathers
        idx = jnp.stack([
            (of_s >> of_n) + of_f_[:, k],
            (ml_s >> ml_n) + ml_f_[:, k] + W_of,
            (ll_s >> ll_n) + ll_f_[:, k] + W_of + W_ml,
        ], axis=1)
        nxt = jnp.take_along_axis(cat_st, idx, axis=1)
        of_s2 = jnp.where(active, nxt[:, 0], of_s)
        ml_s2 = jnp.where(active, nxt[:, 1], ml_s)
        ll_s2 = jnp.where(active, nxt[:, 2], ll_s)
        return (ll_s2, of_s2, ml_s2), (of_v, of_n, ml_v, ml_n, ll_v, ll_n)

    (ll_f, of_f, ml_f), ys = jax.lax.scan(
        step, (ll0, of0, ml0), jnp.arange(1, N, dtype=jnp.int32))
    of_v, of_n, ml_v, ml_n, ll_v, ll_n = [y.T for y in ys]  # (B, N-1)

    # item table in emission order, (B, N, 6):
    #   k = 0:   [ll_x, ml_x, of_x, 0, 0, 0]           (init writes no bits)
    #   k >= 1:  [of_state, ml_state, ll_state, ll_x, ml_x, of_x]
    z = jnp.zeros((B, 1), jnp.int32)
    vals = jnp.stack([
        jnp.concatenate([r_llx[:, :1], of_v], axis=1),
        jnp.concatenate([r_mlx[:, :1], ml_v], axis=1),
        jnp.concatenate([r_ofx[:, :1], ll_v], axis=1),
        jnp.concatenate([z, r_llx[:, 1:]], axis=1),
        jnp.concatenate([z, r_mlx[:, 1:]], axis=1),
        jnp.concatenate([z, r_ofx[:, 1:]], axis=1),
    ], axis=2)  # (B, N, 6)
    nbs = jnp.stack([
        jnp.concatenate([r_llnb[:, :1], of_n], axis=1),
        jnp.concatenate([r_mlnb[:, :1], ml_n], axis=1),
        jnp.concatenate([r_ofnb[:, :1], ll_n], axis=1),
        jnp.concatenate([z, r_llnb[:, 1:]], axis=1),
        jnp.concatenate([z, r_mlnb[:, 1:]], axis=1),
        jnp.concatenate([z, r_ofnb[:, 1:]], axis=1),
    ], axis=2)
    # mask items of padded sequences (k >= n_seq): nb = 0 packs nothing
    k_idx = jnp.arange(N, dtype=jnp.int32)[None, :, None]
    nbs = jnp.where(k_idx < n_seq[:, None, None], nbs, 0)

    flat_v = vals.reshape(B, N * 6)
    flat_n = nbs.reshape(B, N * 6)
    # final state flushes: ml, of, ll at their accuracy logs
    flush_v = jnp.stack([ml_f, of_f, ll_f], axis=1)
    flush_n = jnp.stack([ml_al, of_al, ll_al], axis=1)
    flat_v = jnp.concatenate([flat_v, flush_v], axis=1)
    flat_n = jnp.concatenate([flat_n, flush_n], axis=1)

    def pack_one(v, nb):
        v = v.astype(jnp.uint32) & ((jnp.uint32(1) << nb.astype(jnp.uint32)) - 1)
        csum = jnp.cumsum(nb)
        total = csum[-1]
        off = (csum - nb).astype(jnp.uint32)  # LSB-first append: start bit
        widx = (off >> 5).astype(jnp.int32)
        sh = off & jnp.uint32(31)
        lo = v << sh
        hi = (v >> jnp.uint32(1)) >> (jnp.uint32(31) - sh)
        acc = jnp.zeros(n_words, dtype=jnp.uint32)
        acc = acc.at[widx].add(lo, mode="drop")
        acc = acc.at[widx + 1].add(hi, mode="drop")
        acc = acc.at[total >> 5].add(
            jnp.uint32(1) << (total.astype(jnp.uint32) & jnp.uint32(31)),
            mode="drop")
        return acc, total

    return jax.vmap(pack_one)(flat_v, flat_n)


class DeviceSequenceEncoder:
    """Host wrapper: pack per-block sequence tuples + chosen FSE encode
    tables into fixed device batches, run :func:`encode_seq_streams`,
    trim the byte payloads (bit-exact vs seq.encode_sequences).

    ``mesh`` shards the block batch over all mesh devices, like
    DeviceHuffmanEncoder."""

    BUCKETS = (64, 256, 1024, 4096)

    def __init__(self, mesh=None):
        self.mesh = mesh

    def _bucket(self, n: int) -> int:
        for b in self.BUCKETS:
            if n <= b:
                return b
        return int(np.ceil(n / self.BUCKETS[-1])) * self.BUCKETS[-1]

    @staticmethod
    def _bucket_batch(s: int) -> int:
        n = 8
        while n < s:
            n <<= 1
        return n

    def _shard(self, *arrays):
        if self.mesh is None:
            return [jnp.asarray(a) for a in arrays]
        from jax.sharding import NamedSharding, PartitionSpec as P

        out = []
        for a in arrays:
            spec = P(tuple(self.mesh.axis_names), *([None] * (a.ndim - 1)))
            out.append(jax.device_put(a, NamedSharding(self.mesh, spec)))
        return out

    @staticmethod
    def _table_rows(t, al_cap: int):
        """(state_table, delta_nb, delta_fs, al) int32 rows for one
        EncodeTable or _RleEncodeTable (zero 0-bit machine)."""
        st = np.zeros(TABLE, dtype=np.int32)
        dnb = np.zeros(NSYM, dtype=np.int32)
        dfs = np.zeros(NSYM, dtype=np.int32)
        al = getattr(t, "al", 0)
        if al:
            stt = np.asarray(t.state_table, dtype=np.int32)
            st[: len(stt)] = stt
            d1 = np.asarray(t.delta_nb_bits, dtype=np.int64)
            d2 = np.asarray(t.delta_find_state, dtype=np.int64)
            dnb[: len(d1)] = d1.astype(np.int32)
            dfs[: len(d2)] = d2.astype(np.int32)
        return st, dnb, dfs, al

    def encode_batch(self, blocks: list[tuple], tables: list[tuple]) -> list[bytes]:
        """blocks[i] = (lls, mls, ovs) int arrays (non-empty); tables[i] =
        (ll_table, of_table, ml_table) from _pick_table.  Returns each
        block's sequences bitstream (identical to seq.encode_sequences)."""
        if not blocks:
            return []
        S = len(blocks)
        Sp = self._bucket_batch(S)
        ndev = 1
        if self.mesh is not None:
            ndev = int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))
            Sp = max(Sp, ndev)
            Sp += (-Sp) % ndev
        N = self._bucket(max(len(b[0]) for b in blocks))
        shp = (Sp, N)
        r_llx = np.zeros(shp, np.int32)
        r_llnb = np.zeros(shp, np.int32)
        r_mlx = np.zeros(shp, np.int32)
        r_mlnb = np.zeros(shp, np.int32)
        r_ofx = np.zeros(shp, np.int32)
        r_ofnb = np.zeros(shp, np.int32)
        r_llc = np.zeros(shp, np.int32)
        r_mlc = np.zeros(shp, np.int32)
        r_ofc = np.zeros(shp, np.int32)
        n_seq = np.zeros(Sp, np.int32)
        t_rows = {k: ([], [], [], []) for k in ("ll", "of", "ml")}
        for i, ((lls, mls, ovs), (ll_t, of_t, ml_t)) in enumerate(zip(blocks, tables)):
            lls = np.asarray(lls, np.int64)
            mls = np.asarray(mls, np.int64)
            ovs = np.asarray(ovs, np.int64)
            n = len(lls)
            n_seq[i] = n
            llc = ll_codes_np(lls)
            mlc = ml_codes_np(mls)
            ofc = of_codes_np(ovs)
            rev = slice(None, None, -1)
            r_llc[i, :n] = llc[rev]
            r_mlc[i, :n] = mlc[rev]
            r_ofc[i, :n] = ofc[rev]
            r_llx[i, :n] = (lls - _LL_BASE_NP[llc])[rev]
            r_llnb[i, :n] = _LL_BITS_NP[llc][rev]
            r_mlx[i, :n] = (mls - _ML_BASE_NP[mlc])[rev]
            r_mlnb[i, :n] = _ML_BITS_NP[mlc][rev]
            r_ofx[i, :n] = (ovs - (np.int64(1) << ofc.astype(np.int64)))[rev]
            r_ofnb[i, :n] = ofc[rev]
            for kind, t in (("ll", ll_t), ("of", of_t), ("ml", ml_t)):
                st, dnb, dfs, al = self._table_rows(t, 9)
                rows = t_rows[kind]
                rows[0].append(st)
                rows[1].append(dnb)
                rows[2].append(dfs)
                rows[3].append(al)
        tabs = {}
        for kind, rows in t_rows.items():
            pad = Sp - S
            tabs[kind] = (
                np.stack(rows[0] + [np.zeros(TABLE, np.int32)] * pad),
                np.stack(rows[1] + [np.zeros(NSYM, np.int32)] * pad),
                np.stack(rows[2] + [np.zeros(NSYM, np.int32)] * pad),
                np.array(rows[3] + [0] * pad, np.int32),
            )
        # worst case ~58 bits/seq (17+16+9+9+9... capped) + flush + sentinel
        n_words = (N * 64 + 32) // 32 + 2
        args = self._shard(
            r_llx, r_llnb, r_mlx, r_mlnb, r_ofx, r_ofnb,
            r_llc, r_mlc, r_ofc, n_seq,
            *tabs["ll"], *tabs["of"], *tabs["ml"])
        words, total_bits = encode_seq_streams(*args, n_words=n_words)
        words = np.asarray(words)[:S].astype("<u4")
        total_bits = np.asarray(total_bits)[:S]
        out = []
        for i in range(S):
            nbytes = (int(total_bits[i]) + 1 + 7) // 8
            out.append(words[i].tobytes()[:nbytes])
        return out
