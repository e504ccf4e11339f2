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
