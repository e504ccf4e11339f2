"""zstd codec (method 1): self-contained frame/FSE/Huffman implementation."""

from __future__ import annotations

from ...constants import CompressionMethod
from .. import Codec, register
from . import frame


@register(CompressionMethod.ZSTD)
class ZstdCodec(Codec):
    """ZPack method 1 — zstd frames (parity: ZSTD_compressCCtx /
    ZSTD_decompressDCtx dispatch at lib/zpack_write.c:179 and
    lib/zpack_read.c:380)."""

    method = CompressionMethod.ZSTD

    def compress(self, data: bytes, level: int = 3) -> bytes:
        from ... import native

        comp = native.zstd_compress(bytes(data), level)
        if comp is not None:
            return comp
        from . import encode

        return encode.compress(data, level)

    def decompress(self, data: bytes, uncomp_size: int | None = None) -> bytes:
        if uncomp_size is not None:
            from ... import native

            out = native.zstd_decompress(bytes(data), uncomp_size)
            if out is not None and len(out) == uncomp_size:
                return out
        return frame.decompress(data, uncomp_size)

    def compress_bound(self, size: int) -> int:
        # ZSTD_compressBound shape: size + size/256 + fixed block overhead
        return size + (size >> 8) + (((128 << 10) - size) >> 11 if size < (128 << 10) else 0) + 64

    def compressor(self, level: int = 3):
        from . import encode

        return encode.StreamCompressor(level)

    def decompressor(self):
        return _ZstdStreamDecompressor()


class _ZstdStreamDecompressor:
    """Buffering streaming decoder (parity: ZSTD_decompressStream at
    lib/zpack_read.c:572)."""

    def __init__(self):
        self._buf = bytearray()
        self.finished = False

    def decompress(self, chunk: bytes, is_final: bool = False) -> tuple[bytes, int]:
        # Incremental frame decode: buffer until the frame is complete, then
        # emit.  TODO(block-streaming): emit per-block once the block scanner
        # lands; the ZPack stream contract (read_back=0) is already honored.
        self._buf += chunk
        if is_final:
            out = frame.decompress(bytes(self._buf))
            self._buf.clear()
            self.finished = True
            return out, len(chunk)
        return b"", len(chunk)
