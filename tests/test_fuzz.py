"""Property/fuzz tests: randomized round-trips across methods, levels,
sizes, and APIs, plus corruption-rejection sweeps.  Seeded → reproducible."""

import os
import random

import pytest

from zpack_tpu import constants as C
from zpack_tpu.codecs import get_codec
from zpack_tpu.errors import ZPackError
from zpack_tpu.reader import Reader
from zpack_tpu.stream import read_file_stream_iter
from zpack_tpu.writer import CompressOptions, Writer


def _gen(rng: random.Random, size: int) -> bytes:
    kind = rng.randrange(5)
    if kind == 0:
        return bytes(rng.getrandbits(8) for _ in range(size))
    if kind == 1:
        return bytes([rng.getrandbits(8)]) * size
    if kind == 2:
        word = bytes(rng.getrandbits(8) for _ in range(rng.randint(1, 20)))
        return (word * (size // max(len(word), 1) + 1))[:size]
    if kind == 3:
        out = bytearray()
        while len(out) < size:
            if rng.random() < 0.7:
                out += b"token%d " % rng.randrange(30)
            else:
                out += bytes(rng.getrandbits(8) for _ in range(rng.randint(1, 10)))
        return bytes(out[:size])
    # nested structure: repeated far-back segments
    seg = bytes(rng.getrandbits(8) for _ in range(rng.randint(100, 1000)))
    return (seg + b"x" * rng.randint(0, 50)) * (size // (len(seg) + 25) + 1)


@pytest.mark.parametrize("seed", range(8))
def test_codec_roundtrip_fuzz(seed):
    rng = random.Random(seed)
    for _ in range(4):
        size = rng.choice([0, 1, 7, 100, 4095, 4096, 70000])
        data = _gen(rng, size)[:size]
        method = rng.choice([C.CompressionMethod.NONE, C.CompressionMethod.LZ4,
                             C.CompressionMethod.ZSTD])
        level = rng.choice([1, 3] if method == C.CompressionMethod.LZ4 else [1, 2, 3, 19])
        codec = get_codec(method)
        comp = codec.compress(data, level)
        assert codec.decompress(comp, len(data)) == data, (seed, size, method, level)


@pytest.mark.parametrize("seed", range(4))
def test_zstd_dfast_block_boundary_fuzz(seed):
    """Levels 2-3 (dfast matcher) across 128 KiB block boundaries, decoded
    by BOTH our decoder and libzstd — sizes below stay within one block and
    would never exercise cross-block rep/window state."""
    import zstandard

    rng = random.Random(7000 + seed)
    codec = get_codec(C.CompressionMethod.ZSTD)
    for size in [(128 << 10) - 1, 128 << 10, (128 << 10) + 1, 300 << 10]:
        data = _gen(rng, size)[:size]
        for level in (2, 3):
            comp = codec.compress(data, level)
            assert codec.decompress(comp, len(data)) == data, (seed, size, level)
            lib = zstandard.ZstdDecompressor().decompress(comp, max_output_size=size)
            assert lib == data, (seed, size, level)


@pytest.mark.parametrize("seed", range(4))
def test_archive_roundtrip_fuzz(seed):
    rng = random.Random(1000 + seed)
    files = []
    for i in range(rng.randint(1, 25)):
        size = rng.choice([0, 3, 500, 9000, 40000])
        method = rng.choice(list(C.CompressionMethod))
        files.append((f"f/{i}_{rng.randrange(1000000)}", _gen(rng, size)[:size],
                      CompressOptions(method, rng.choice([1, 3]))))
    w = Writer.to_heap()
    w.write_archive(files)
    r = Reader.from_memory(w.buffer)
    for name, data, _ in files:
        assert r.read_file(name) == data
        streamed = b"".join(read_file_stream_iter(r, r.get_file_entry(name),
                                                  chunk_size=rng.choice([16, 4096])))
        assert streamed == data


@pytest.mark.parametrize("seed", range(6))
def test_corruption_never_silent(seed):
    """Flip one byte anywhere in an archive: reading must either raise or
    return correct data (headers/CDR padding may be unused) — never return
    silently corrupted content."""
    rng = random.Random(2000 + seed)
    data = _gen(rng, 5000)[:5000]
    method = rng.choice([C.CompressionMethod.LZ4, C.CompressionMethod.ZSTD,
                         C.CompressionMethod.NONE])
    w = Writer.to_heap()
    w.write_archive([("x.bin", data, CompressOptions(method))])
    buf = bytearray(w.buffer)
    for _ in range(25):
        pos = rng.randrange(len(buf))
        old = buf[pos]
        buf[pos] ^= 1 + rng.getrandbits(7)
        out = None
        try:
            r = Reader.from_memory(bytes(buf))
            out = r.read_file("x.bin")
        except Exception:
            out = None  # detected: fine
        finally:
            buf[pos] = old
        assert out is None or out == data, f"silent corruption at byte {pos}"


@pytest.mark.skipif(os.environ.get("ZPACK_SANITIZE_RUN") == "1",
                    reason="XLA compile aborts under sanitizer preload; "
                           "the native .so is the sanitizer's subject")
def test_device_zstd_decode_differential_fuzz():
    """Differential fuzz of the fully device-resident zstd decode
    (round 5): for mutated frames, decompress_zstd_device must either
    raise DecompressError like the host decoder or produce identical
    bytes — never diverge silently (role: the corruption handling inside
    ZSTD_decompressDCtx, lib/zpack_read.c:380)."""
    import numpy as np
    import zstandard

    from zpack_tpu.codecs.zstd import frame as zframe
    from zpack_tpu.errors import DecompressError
    from zpack_tpu.parallel.extract import decompress_zstd_device

    rng = np.random.default_rng(123)
    words = [rng.integers(65, 90, rng.integers(3, 10)).astype(np.uint8).tobytes()
             for _ in range(100)]
    blob = b" ".join(words[rng.integers(0, 100)] for _ in range(20000))[:150000]
    base = zstandard.ZstdCompressor(level=3).compress(blob)
    agree = 0
    for trial in range(40):
        comp = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            comp[int(rng.integers(12, len(comp)))] ^= int(rng.integers(1, 256))
        comp = bytes(comp)
        try:
            host = zframe.decompress(comp, len(blob))
            host_err = None
        except Exception as e:
            host, host_err = None, e
        try:
            dev = decompress_zstd_device(comp, len(blob))
            dev_err = None
        except DecompressError as e:
            dev, dev_err = None, e
        if host_err is None and dev_err is None:
            assert dev == host, f"trial {trial}: silent divergence"
            agree += 1
        elif host_err is not None:
            # host rejected; device must reject too (a device ACCEPT of a
            # frame the host rejects would be a real bug)
            assert dev_err is not None, (
                f"trial {trial}: device accepted a frame the host rejects")
    # sanity: the clean frame itself round-trips on both
    assert decompress_zstd_device(base, len(blob)) == blob
