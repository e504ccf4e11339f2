"""Streaming API tests, mirroring the reference's chunked exercises
(tests/read_archive.c:39-61 — 16-byte input buffers forcing many
iterations; tests/write_archive.c:44,77 — 16-byte streaming writes)."""

import pytest

from zpack_tpu import constants as C
from zpack_tpu import stream as S
from zpack_tpu.errors import Result, ZPackError
from zpack_tpu.reader import Reader
from zpack_tpu.writer import CompressOptions, Writer

METHODS = [C.CompressionMethod.NONE, C.CompressionMethod.LZ4, C.CompressionMethod.ZSTD]


def _build(golden, method):
    w = Writer.to_heap()
    w.write_archive(
        [
            ("file1.txt", golden["file1.txt"], CompressOptions(method)),
            ("file2.txt", golden["file2.txt"], CompressOptions(method)),
        ]
    )
    return Reader.from_memory(w.buffer)


@pytest.mark.parametrize("method", METHODS)
def test_stream_read_tiny_buffers(golden, method):
    r = _build(golden, method)
    for name in ["file1.txt", "file2.txt"]:
        entry = r.get_file_entry(name)
        stream = S.init_stream()
        stream.avail_in = 16  # as in tests/read_archive.c:12
        stream.avail_out = 16
        out = bytearray()
        guard = 0
        while S.read_file_stream(r, entry, stream):
            out += stream.next_out
            guard += 1
            assert guard < 10000
        out += stream.next_out
        assert bytes(out) == golden[name]
        assert S.read_stream_done(stream, entry)
        assert stream.total_out == entry.uncomp_size


@pytest.mark.parametrize("method", METHODS)
def test_stream_iter_golden_archives(golden, method):
    archive = {
        C.CompressionMethod.NONE: "archive_none.zpk",
        C.CompressionMethod.ZSTD: "archive_zstd.zpk",
        C.CompressionMethod.LZ4: "archive_lz4.zpk",
    }[method]
    r = Reader.from_memory(golden[archive])
    for name in ["file1.txt", "file2.txt"]:
        out = b"".join(r.extract_iter(name, chunk_size=16))
        assert out == golden[name]


@pytest.mark.parametrize("method", METHODS)
def test_streaming_write_roundtrip(golden, method):
    w = Writer.to_heap()
    w.write_header()
    w.write_data_header()
    for name in ["file1.txt", "file2.txt"]:
        data = golden[name]
        w.write_file_stream_begin(name, CompressOptions(method))
        for i in range(0, len(data), 16):
            w.write_file_stream(data[i : i + 16])
        entry = w.write_file_stream_end()
        assert entry.uncomp_size == len(data)
    w.write_cdr()
    w.write_eocdr()
    r = Reader.from_memory(w.buffer)
    for name in ["file1.txt", "file2.txt"]:
        assert r.read_file(name) == golden[name]


def test_stream_hash_mismatch(golden):
    r = _build(golden, C.CompressionMethod.NONE)
    entry = r.get_file_entry("file1.txt")
    entry.hash ^= 1
    with pytest.raises(ZPackError) as ei:
        list(r.extract_iter(entry))
    assert ei.value.code == Result.ERROR_FILE_HASH_MISMATCH


def test_stream_reset():
    s = S.init_stream()
    s.total_in = 5
    s.reset()
    assert s.total_in == 0 and s.total_out == 0 and s.read_back == 0


def test_raw_file_stream(golden):
    """parity: zpack_read_raw_file_stream — chunked raw reads reassemble
    the exact compressed bytes."""
    r = Reader.from_memory(golden["archive_zstd.zpk"])
    entry = r.get_file_entry("file1.txt")
    stream = S.init_stream()
    stream.avail_out = 16
    raw = bytearray()
    more = True
    while more:
        more = S.read_raw_file_stream(r, entry, stream)
        raw += stream.next_out
    assert bytes(raw) == r.read_raw_file(entry)


@pytest.mark.parametrize("method", METHODS)
def test_stream_caller_buffer_read_back(golden, method):
    """Faithful caller-carry protocol (tests/read_archive.c:52-74): 16-byte
    input buffer + small output budget forces nonzero read_back carries,
    which the caller must memmove to the buffer front."""
    archive = {
        C.CompressionMethod.NONE: "archive_none.zpk",
        C.CompressionMethod.ZSTD: "archive_zstd.zpk",
        C.CompressionMethod.LZ4: "archive_lz4.zpk",
    }[method]
    r = Reader.from_memory(golden[archive])
    carries = 0
    for name in ["file1.txt", "file2.txt"]:
        entry = r.get_file_entry(name)
        stream = S.init_stream()
        buf = bytearray(16)  # STREAM_IN_SIZE, tests/read_archive.c:12
        out = bytearray()
        guard = 0
        while not S.read_stream_done(stream, entry):
            if stream.read_back:  # the caller-side memmove
                buf[: stream.read_back] = buf[stream.in_pos - stream.read_back : stream.in_pos]
                carries += 1
            stream.next_in = buf
            stream.avail_in = len(buf)
            stream.avail_out = 7  # small budget → output saturates → carry
            S.read_file_stream_buffer(r, entry, stream)
            out += stream.next_out
            guard += 1
            assert guard < 10000
        assert bytes(out) == golden[name]
        assert stream.total_in == entry.comp_size
        assert stream.total_out == entry.uncomp_size
    if method != C.CompressionMethod.ZSTD:
        # the golden zstd entries are single tiny blocks whose block end IS
        # the frame end — all input is legitimately consumed before output
        # saturates, so read_back stays 0 (as with libzstd); multi-block
        # carries are forced in test_stream_caller_buffer_zstd_multiblock
        assert carries > 0, "protocol never exercised a nonzero read_back carry"


def test_stream_caller_buffer_zstd_multiblock():
    """A multi-block zstd entry forces nonzero read_back: block 1 completes
    while raw input keeps arriving, so a small output budget strands
    unconsumed input every call."""
    import numpy as np

    rng = np.random.default_rng(3)
    data = bytes(
        np.where(
            rng.random(300_000) < 0.85,
            np.tile(np.frombuffer(b"zstd carry stream ", dtype=np.uint8), 17000)[:300_000],
            rng.integers(0, 256, 300_000),
        ).astype(np.uint8)
    )
    w = Writer.to_heap()
    w.write_archive([("big.bin", data, CompressOptions(C.CompressionMethod.ZSTD, 3))])
    r = Reader.from_memory(w.buffer)
    entry = r.get_file_entry("big.bin")
    stream = S.init_stream()
    buf = bytearray(4096)
    out = bytearray()
    carries = 0
    guard = 0
    while not S.read_stream_done(stream, entry):
        if stream.read_back:
            buf[: stream.read_back] = buf[stream.in_pos - stream.read_back : stream.in_pos]
            carries += 1
        stream.next_in = buf
        stream.avail_in = len(buf)
        stream.avail_out = 4096
        S.read_file_stream_buffer(r, entry, stream)
        out += stream.next_out
        guard += 1
        assert guard < 100000
    assert bytes(out) == data
    assert carries > 0, "multi-block zstd never exercised a read_back carry"


def test_stream_caller_buffer_hash_mismatch(golden):
    """Corrupted data must surface through the buffered mode's final digest."""
    raw = bytearray(golden["archive_none.zpk"])
    # flip a byte inside file1's stored data region (header is 10 bytes)
    raw[14] ^= 0xFF
    r = Reader.from_memory(bytes(raw))
    entry = r.get_file_entry("file1.txt")
    stream = S.init_stream()
    buf = bytearray(16)
    with pytest.raises(ZPackError):
        while not S.read_stream_done(stream, entry):
            if stream.read_back:
                buf[: stream.read_back] = buf[stream.in_pos - stream.read_back : stream.in_pos]
            stream.next_in = buf
            stream.avail_in = len(buf)
            stream.avail_out = 64
            S.read_file_stream_buffer(r, entry, stream)


def test_recommended_sizes_codec_specific():
    """parity: zpack_get_{c,d}stream_{in,out}_size return codec-derived
    values (lib/zpack_read.c:719-758, lib/zpack_write.c:858-897)."""
    zstd, lz4, none = C.CompressionMethod.ZSTD, C.CompressionMethod.LZ4, C.CompressionMethod.NONE
    assert S.recommended_cstream_in_size(lz4) == 64 << 10
    assert S.recommended_cstream_in_size(zstd) == 128 << 10
    # NONE falls through to the largest available codec's value
    assert S.recommended_cstream_in_size(none) == S.recommended_cstream_in_size(zstd)
    # out bounds must cover one worst-case block of the codec
    assert S.recommended_cstream_out_size(lz4) > 64 << 10
    assert S.recommended_cstream_out_size(zstd) > 128 << 10
    assert S.recommended_dstream_in_size(zstd) == (128 << 10) + 3
    assert S.recommended_dstream_out_size(lz4) == 64 << 10
    assert S.recommended_dstream_in_size(99) == 0
    # disabled codecs drop out of the fall-through chain
    import os
    os.environ["ZPACK_TPU_DISABLE_ZSTD"] = "1"
    try:
        assert S.recommended_cstream_in_size(none) == S.recommended_cstream_in_size(lz4)
        assert S.recommended_cstream_in_size(zstd) == 0
    finally:
        del os.environ["ZPACK_TPU_DISABLE_ZSTD"]
