"""Differential tests: native C++ backend vs the Python/numpy
implementations (which are themselves oracle-validated)."""

import random

import pytest
import zstandard

from zpack_tpu import native as N
from zpack_tpu.codecs import xxh3 as H
from zpack_tpu.codecs.lz4 import block as LB, frame as LF
from zpack_tpu.codecs.zstd import frame as ZF


pytestmark = pytest.mark.skipif(N.get_lib() is None, reason="native backend unavailable")


def _corp():
    rng = random.Random(3)
    return {
        "text": b"differential testing of the native backend " * 1000,
        "rand": bytes(rng.getrandbits(8) for _ in range(50000)),
        "zeros": b"\0" * 70000,
        "mixed": b"".join(
            (b"word%d " % (i % 23)) + (bytes([rng.getrandbits(8)]) if i % 4 == 0 else b"")
            for i in range(8000)
        ),
        "small": b"abc",
        "empty": b"",
    }


CORP = _corp()


@pytest.mark.parametrize("name", list(CORP))
def test_xxh3_matches(name):
    import xxhash

    data = CORP[name]
    assert N.xxh3_64(data) == xxhash.xxh3_64_intdigest(data)


@pytest.mark.parametrize("name", list(CORP))
def test_lz4_block_cross(name):
    data = CORP[name]
    c_native = N.lz4_compress_block(data, 1)
    if data:
        assert c_native is not None
        # python decoder reads native output
        assert LB.decompress_block(c_native, len(data)) == data
    # native decoder reads numpy-encoder output
    c_np = LB.compress_block(data, 3)  # level 3 → numpy path
    out = N.lz4_decompress_block(c_np, len(data)) if data else b""
    assert out == data


@pytest.mark.parametrize("name", list(CORP))
def test_lz4_frame_cross(name):
    data = CORP[name]
    comp = N.lz4f_compress(data, 1)
    assert comp is not None
    # python incremental decoder reads native frames
    d = LF.FrameDecompressor()
    out = d.update(comp)
    assert d.finished and out == data
    # native frame decoder reads python-assembled frames (with checksums)
    comp2 = LF.compress_frame(data, 3, content_checksum=True)
    assert N.lz4f_decompress(comp2, len(data)) == data


@pytest.mark.parametrize("name", list(CORP))
@pytest.mark.parametrize("level", [1, 3, 19])
def test_zstd_cross(name, level):
    data = CORP[name]
    comp = N.zstd_compress(data, level)
    assert comp is not None
    # libzstd oracle accepts native frames
    out = zstandard.ZstdDecompressor().decompress(comp, max_output_size=max(len(data), 1))
    assert out == data
    # our python decoder accepts them
    assert ZF.decompress(comp) == data
    # native decoder accepts libzstd frames
    lib = zstandard.ZstdCompressor(level=level).compress(data)
    assert N.zstd_decompress(lib, len(data)) == data


def test_zstd_native_decode_rejects_corruption():
    data = CORP["mixed"]
    comp = bytearray(N.zstd_compress(data, 3))
    comp[len(comp) // 2] ^= 0xFF
    out = N.zstd_decompress(bytes(comp), len(data))
    # either detected (None) or wrong-size output; the zpack layer's XXH3
    # check catches any silent corruption
    assert out is None or out != data


def test_read_files_sparse_span_reads_bounded():
    """Selecting distant entries must read O(selected bytes), not the span
    between them, and the batch path must still verify + decode them."""
    import numpy as np

    from zpack_tpu import constants as C
    from zpack_tpu.reader import Reader
    from zpack_tpu.writer import CompressOptions, Writer

    rng = np.random.default_rng(0)
    filler = rng.integers(0, 256, 4 << 20).astype(np.uint8).tobytes()
    store = CompressOptions(C.CompressionMethod.NONE)
    small = [(f"s{i}.bin", bytes([i]) * 4096, store) for i in range(4)]
    items = small[:2] + [("filler.bin", filler, store)] + small[2:]
    w = Writer.to_heap()
    w.write_archive(items)
    r = Reader.from_memory(w.buffer, shared=True)
    reads = []
    orig = r._source.read_at
    r._source.read_at = lambda off, size: (reads.append(size), orig(off, size))[1]
    outs = r.read_files([f"s{i}.bin" for i in range(4)])
    assert outs == [bytes([i]) * 4096 for i in range(4)]
    assert sum(reads) < (1 << 20), f"read {sum(reads)} bytes for ~16KB of entries"
