"""Batched zstd extraction with device entropy decode.

Role parity: ``ZSTD_decompressDCtx`` at lib/zpack_read.c:380 — but instead
of decoding one block at a time, the whole buffer's frames are walked
structurally first, EVERY huffman literal stream (across all blocks of all
frames) is decoded in ONE batched device dispatch
(kernels/huffman_jax.DeviceHuffmanDecoder, the mirror of the encode-side
mesh entropy stage), and the sequence execution then replays per block on
the host with the pre-decoded literals.  Bit-exact vs the host decoder by
construction (the literal decode kernel is pinned against
huffman._decode_one_stream in tests/test_kernels.py).

Production consumer: ZstdCodec.decompress under ``ZPACK_TPU_ENGINE=tpu``
(the CLI --engine tpu), and direct callers (bench).
"""

from __future__ import annotations

import struct

from ..codecs.zstd import frame as zframe, seq as zseq
from ..errors import DecompressError

_DEC = None
_LZ4 = None


def _device_decoder():
    global _DEC
    if _DEC is None:
        from ..kernels.huffman_jax import DeviceHuffmanDecoder

        _DEC = DeviceHuffmanDecoder()
    return _DEC


def _lz4_replayer():
    global _LZ4
    if _LZ4 is None:
        from ..kernels.lz4_jax import DeviceLZ4Replayer

        _LZ4 = DeviceLZ4Replayer()
    return _LZ4


def decompress_lz4f_batched(data: bytes, max_out: int | None = None) -> bytes:
    """Batched lz4f frame decode: the frame structure is walked host-side
    and every compressed INDEPENDENT block replays its sequences in one
    batched device dispatch (kernels/lz4_jax.replay_sequences — role:
    the LZ4F_decompress loop, lib/zpack_read.c:414-439).  Frames with
    linked blocks raise (the caller falls back to the host decoder:
    history-dependence is inherently sequential)."""
    from ..codecs.lz4 import frame as lz4f
    from ..codecs.xxh3 import XXH32State, xxh32

    pos = 0
    n = len(data)
    pieces: list[tuple] = []  # ("raw", bytes) | ("dev", batch_index)
    comp_blocks: list[bytes] = []
    comp_bounds: list[int] = []
    hash_spans: list[tuple] = []  # (frame_start_piece, n_pieces, expected)
    while pos < n:
        if n - pos < 4:
            raise DecompressError("truncated lz4 frame magic")
        (magic,) = struct.unpack_from("<I", data, pos)
        if lz4f.MAGIC_SKIPPABLE_MIN <= magic <= lz4f.MAGIC_SKIPPABLE_MAX:
            if n - pos < 8:
                raise DecompressError("truncated skippable frame")
            (size,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8 + size
            continue
        if magic != lz4f.MAGIC:
            raise DecompressError(f"bad lz4 frame magic {magic:#x}")
        pos += 4
        if n - pos < 3:
            raise DecompressError("truncated lz4 frame descriptor")
        flg, bd = data[pos], data[pos + 1]
        if (flg >> 6) != 1:
            raise DecompressError("unsupported lz4 frame version")
        if not (flg & 0x20):
            raise DecompressError("linked blocks: host path required")
        desc_len = 2 + (8 if flg & 0x08 else 0) + (4 if flg & 0x01 else 0)
        if n - pos < desc_len + 1:
            raise DecompressError("truncated lz4 frame descriptor")
        bsid = (bd >> 4) & 0x7
        if bsid not in lz4f._BLOCK_SIZES:
            raise DecompressError(f"bad lz4 block size id {bsid}")
        block_max = lz4f._BLOCK_SIZES[bsid]
        hc = data[pos + desc_len]
        if hc != ((xxh32(bytes(data[pos : pos + desc_len]), 0) >> 8) & 0xFF):
            raise DecompressError("lz4 frame header checksum mismatch")
        block_checksum = bool(flg & 0x10)
        content_checksum = bool(flg & 0x04)
        pos += desc_len + 1
        frame_piece0 = len(pieces)
        while True:
            if n - pos < 4:
                raise DecompressError("truncated lz4 block header")
            (bsize,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if bsize == 0:
                break
            uncompressed = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            if bsize > block_max:
                raise DecompressError("lz4 block larger than declared maximum")
            payload = bytes(data[pos : pos + bsize])
            if len(payload) < bsize:
                raise DecompressError("truncated lz4 block")
            pos += bsize
            if block_checksum:
                if n - pos < 4:
                    raise DecompressError("truncated lz4 block checksum")
                (bchk,) = struct.unpack_from("<I", data, pos)
                pos += 4
                if xxh32(payload, 0) != bchk:
                    raise DecompressError("lz4 block checksum mismatch")
            if uncompressed:
                pieces.append(("raw", payload))
            else:
                pieces.append(("dev", len(comp_blocks)))
                comp_blocks.append(payload)
                comp_bounds.append(block_max)
        if content_checksum:
            if n - pos < 4:
                raise DecompressError("truncated lz4 content checksum")
            (chk,) = struct.unpack_from("<I", data, pos)
            pos += 4
            hash_spans.append((frame_piece0, len(pieces) - frame_piece0, chk))

    decoded = _lz4_replayer().decompress_blocks(comp_blocks, comp_bounds) \
        if comp_blocks else []
    parts = [p[1] if p[0] == "raw" else decoded[p[1]] for p in pieces]
    for p0, cnt, chk in hash_spans:
        h = XXH32State(0)
        for part in parts[p0 : p0 + cnt]:
            h.update(part)
        if h.digest() != chk:
            raise DecompressError("lz4 content checksum mismatch")
    out = b"".join(parts)
    if max_out is not None and len(out) > max_out:
        raise DecompressError("lz4 frame output exceeds expected size")
    return out


def decompress_zstd_batched(data: bytes, max_out: int | None = None) -> bytes:
    """One-shot decompress of concatenated zstd frames with the huffman
    literal stage batched onto the device (no dictionary support here —
    dict frames take the host path in ZstdCodec)."""
    # --- pass 1: structural walk; parse literal sections, collect streams
    frames = []  # (header, [(btype, payload, rle_size, plan, lits_end)...])
    streams: list[bytes] = []
    tables = []
    n_syms: list[int] = []
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise DecompressError("truncated frame magic")
        (magic,) = struct.unpack_from("<I", data, pos)
        if zframe.MAGIC_SKIPPABLE_MIN <= magic <= zframe.MAGIC_SKIPPABLE_MAX:
            if n - pos < 8:
                raise DecompressError("truncated skippable frame")
            (size,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8 + size
            continue
        if magic != zframe.MAGIC:
            raise DecompressError(f"bad zstd magic {magic:#x}")
        pos += 4
        header = zframe.parse_frame_header(data, pos)
        pos += header.header_size
        if header.dict_id:
            raise DecompressError(
                f"frame requires dictionary {header.dict_id} (none attached)")
        lit_state = zframe.LiteralsState()
        blocks = []
        while True:
            if n - pos < 3:
                raise DecompressError("truncated block header")
            bh = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == zframe.BLOCK_RLE:
                payload = data[pos : pos + 1]
                if len(payload) < 1:
                    raise DecompressError("truncated RLE block")
                pos += 1
                blocks.append((btype, payload, bsize, None, 0))
            else:
                payload = data[pos : pos + bsize]
                if len(payload) < bsize:
                    raise DecompressError("truncated block")
                pos += bsize
                if btype == zframe.BLOCK_COMPRESSED:
                    plan, lits_end = zframe.parse_literals_section(
                        payload, 0, lit_state)
                    if plan[0] == "huf":
                        # record the device-batch slots this block owns
                        base = len(streams)
                        _, items, table = plan
                        for s, cnt in items:
                            streams.append(s)
                            tables.append(table)
                            n_syms.append(cnt)
                        plan = ("batch", base, len(items))
                    blocks.append((btype, payload, 0, plan, lits_end))
                else:
                    blocks.append((btype, payload, 0, None, 0))
            if last:
                break
        chk = None
        if header.has_checksum:
            if n - pos < 4:
                raise DecompressError("truncated content checksum")
            (chk,) = struct.unpack_from("<I", data, pos)
            pos += 4
        frames.append((header, blocks, chk))

    # --- pass 2: ONE batched device dispatch for every huffman stream
    decoded = _device_decoder().decode_batch(streams, tables, n_syms) if streams else []

    # --- pass 3: sequence decode + execution per block, literals injected
    out = bytearray()
    for header, blocks, chk in frames:
        dec = zframe.FrameDecoder(header)
        for btype, payload, rle_size, plan, lits_end in blocks:
            lits_pos = None
            if plan is not None:
                if plan[0] == "done":
                    lits_pos = (plan[1], lits_end)
                else:
                    _, base, cnt = plan
                    parts = decoded[base : base + cnt]
                    lits = parts[0].tobytes() if cnt == 1 else b"".join(
                        p.tobytes() for p in parts)
                    lits_pos = (lits, lits_end)
            out += dec.decode_block(btype, payload, rle_size, lits_pos=lits_pos)
        if chk is not None and (dec.hasher.digest() & 0xFFFFFFFF) != chk:
            raise DecompressError("content checksum mismatch")
    if max_out is not None and len(out) > max_out:
        raise DecompressError("zstd output exceeds expected size")
    return bytes(out)
