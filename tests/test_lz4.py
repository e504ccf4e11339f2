"""LZ4 block + frame codec tests.

Conformance oracles: the golden lz4 archive (reference: tests/workdir/
archive_lz4.zpk, embedded in tests/archive.h:61-101 — uses *linked* blocks,
exercising history-carrying decode) and self round-trip across data shapes.
"""

import random

import pytest

from zpack_tpu.codecs.lz4 import block, frame
from zpack_tpu.reader import Reader


def _corpora():
    rng = random.Random(42)
    text = (b"the quick brown fox jumps over the lazy dog. " * 50)
    return {
        "empty": b"",
        "one": b"x",
        "tiny": b"hello",
        "twelve": b"abcabcabcabc",
        "thirteen": b"abcabcabcabca",
        "text": text,
        "zeros": b"\0" * 100000,
        "runs": b"".join(bytes([i % 7]) * (i % 300 + 1) for i in range(500)),
        "random": bytes(rng.getrandbits(8) for _ in range(50000)),
        "semi": b"".join(
            (b"pattern%d" % (i % 10)) * 3 + bytes([rng.getrandbits(8)]) for i in range(3000)
        ),
        "block_boundary": b"A" * (64 << 10) + b"B" * 100,
        "long_match": b"Q" * 300 + b"unique" + b"Q" * 300,
    }


CORPORA = _corpora()


@pytest.mark.parametrize("name", list(CORPORA))
@pytest.mark.parametrize("level", [1, 4])
def test_block_roundtrip(name, level):
    data = CORPORA[name]
    comp = block.compress_block(data, level)
    assert block.decompress_block(comp, len(data)) == data
    if len(data) > 1000:
        # compressible corpora should actually compress
        if name in ("zeros", "runs", "text", "long_match"):
            assert len(comp) < len(data) // 2


@pytest.mark.parametrize("name", list(CORPORA))
def test_frame_roundtrip(name):
    data = CORPORA[name]
    comp = frame.compress_frame(data, 1)
    assert frame.decompress_frame(comp) == data


def test_frame_checksums_roundtrip():
    data = CORPORA["semi"]
    comp = frame.compress_frame(data, 1, content_checksum=True, store_content_size=True)
    assert frame.decompress_frame(comp) == data
    # corrupt one payload byte → checksum or decode failure
    bad = bytearray(comp)
    bad[30] ^= 0xFF
    with pytest.raises(Exception):
        frame.decompress_frame(bad)


def test_streaming_compressor_matches_oneshot():
    """Streaming emits independent-block frames (bounded memory, no history
    carry); one-shot emits linked blocks via the native path (~10% smaller,
    liblz4's default).  Both must decode bit-exact; the streaming frame must
    also byte-match the pure-python independent one-shot."""
    data = CORPORA["semi"]
    c = frame.FrameCompressor(1)
    out = bytearray()
    for i in range(0, len(data), 1777):
        out += c.update(data[i : i + 1777])
    out += c.finish()
    oneshot = frame.compress_frame(data, 1)
    assert frame.decompress_frame(bytes(out)) == data
    assert frame.decompress_frame(oneshot) == data
    # linked one-shot beats or ~matches indep (the linked path uses the
    # general matcher, ~1% looser per block than fast64k on match-poor data)
    assert len(oneshot) <= len(out) * 1.02


def test_streaming_decoder_tiny_chunks():
    """16-byte input chunks, mirroring tests/read_archive.c:12,39 forcing
    many partial-input iterations."""
    data = CORPORA["runs"]
    comp = frame.compress_frame(data, 1)
    d = frame.FrameDecompressor()
    out = bytearray()
    for i in range(0, len(comp), 16):
        out += d.update(comp[i : i + 16])
    assert d.finished and bytes(out) == data


def test_golden_lz4_archive_decode(golden):
    """Decode the reference-produced linked-block lz4 frames bit-exactly."""
    r = Reader.from_memory(golden["archive_lz4.zpk"])
    assert r.read_file("file1.txt") == golden["file1.txt"]
    assert r.read_file("file2.txt") == golden["file2.txt"]


def test_skippable_frame():
    data = CORPORA["text"]
    comp = frame.compress_frame(data, 1)
    import struct
    skip = struct.pack("<II", 0x184D2A50, 7) + b"padding"
    assert frame.decompress_frame(skip + comp) == data


def test_multiblock_frame():
    data = CORPORA["semi"] * 8  # > 256 KiB → several 64 KiB blocks
    comp = frame.compress_frame(data, 1)
    assert frame.decompress_frame(comp) == data
    assert len(comp) < len(data)


def test_lz4f_linked_size_parity_vs_liblz4():
    """Native linked-frame output must stay within 1% of liblz4's default
    LZ4F output (the reference's lz4 configuration; was 1.049x before the
    linked-mode + 5-byte-hash encoder).  Skips when the system liblz4
    runtime library is unavailable."""
    import ctypes
    import sys

    from zpack_tpu import native as zn

    if zn.get_lib() is None:
        pytest.skip("native backend unavailable")
    try:
        lz4 = ctypes.CDLL("liblz4.so.1")
    except OSError:
        pytest.skip("system liblz4 unavailable")
    lz4.LZ4F_compressFrameBound.restype = ctypes.c_size_t
    lz4.LZ4F_compressFrameBound.argtypes = [ctypes.c_size_t, ctypes.c_void_p]
    lz4.LZ4F_compressFrame.restype = ctypes.c_size_t
    lz4.LZ4F_compressFrame.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_void_p]

    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from bench import build_corpus

    data = build_corpus(2 << 20)
    bound = lz4.LZ4F_compressFrameBound(len(data), None)
    buf = ctypes.create_string_buffer(bound)
    lib_n = lz4.LZ4F_compressFrame(buf, bound, data, len(data), None)
    assert lib_n and not (lib_n >> 63)
    ours = zn.lz4f_compress(data, 1)
    assert ours is not None
    assert frame.decompress_frame(ours, len(data)) == data
    assert len(ours) <= lib_n * 1.01, f"{len(ours)} vs liblz4 {lib_n}"
