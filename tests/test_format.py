"""Container-format conformance tests against the reference golden archives
(reference: tests/open_archive.c — all three init modes; tests/archive.h
golden constants; docs/specs.md layout)."""

import io

import pytest

from zpack_tpu import constants as C
from zpack_tpu.errors import Result, ZPackError
from zpack_tpu.format import records
from zpack_tpu.reader import Reader
from zpack_tpu.writer import CompressOptions, Writer

GOLDEN_ENTRIES = [
    # (filename, uncomp_size, xxh3) — reference: tests/archive.h:103-115
    ("file1.txt", 169, 0x7874CBA47D02B07D),
    ("file2.txt", 349, 0x15F25C0F24DD8E52),
]


def check_entries(r: Reader):
    assert r.file_count == 2
    for e, (name, size, h) in zip(r.file_entries, GOLDEN_ENTRIES):
        assert e.filename == name
        assert e.uncomp_size == size
        assert e.hash == h


@pytest.mark.parametrize("archive", ["archive_none.zpk", "archive_zstd.zpk", "archive_lz4.zpk"])
def test_open_all_modes(golden, archive, tmp_path):
    """Parity: tests/open_archive.c:59-95 — file, memory-copy, memory-shared."""
    data = golden[archive]
    p = tmp_path / archive
    p.write_bytes(data)
    for r in [
        Reader.open(p),
        Reader.from_file(io.BytesIO(data)),
        Reader.from_memory(data),
        Reader.from_memory(data, shared=True),
    ]:
        assert r.version == 1
        check_entries(r)
        r.close()


def test_read_store_entries(golden):
    r = Reader.from_memory(golden["archive_none.zpk"])
    assert r.read_file("file1.txt") == golden["file1.txt"]
    assert r.read_file("file2.txt") == golden["file2.txt"]


def test_store_writer_bit_exact(golden):
    """A store-method archive we emit must be byte-identical to the golden
    archive_none.zpk (deterministic layout: header‖data‖CDR‖EOCDR)."""
    w = Writer.to_heap()
    w.write_archive(
        [
            ("file1.txt", golden["file1.txt"], CompressOptions(C.CompressionMethod.NONE)),
            ("file2.txt", golden["file2.txt"], CompressOptions(C.CompressionMethod.NONE)),
        ]
    )
    assert w.buffer == golden["archive_none.zpk"]


def test_file_writer_matches_heap(golden, tmp_path):
    p = tmp_path / "out.zpk"
    with Writer.open(p) as w:
        w.write_archive([("file1.txt", golden["file1.txt"], CompressOptions(C.CompressionMethod.NONE))])
    data = p.read_bytes()
    w2 = Writer.to_heap()
    w2.write_archive([("file1.txt", golden["file1.txt"], CompressOptions(C.CompressionMethod.NONE))])
    assert data == w2.buffer
    r = Reader.open(p)
    assert r.read_file("file1.txt") == golden["file1.txt"]
    r.close()


def test_streaming_write_store(golden):
    """Chunked write path must produce the same bytes as one-shot for store
    (parity model: tests/write_archive.c streaming × heap combos)."""
    w = Writer.to_heap()
    w.write_header()
    w.write_data_header()
    w.write_file_stream_begin("file1.txt", CompressOptions(C.CompressionMethod.NONE))
    data = golden["file1.txt"]
    for i in range(0, len(data), 16):  # 16-byte chunks like tests/write_archive.c:44
        w.write_file_stream(data[i : i + 16])
    e = w.write_file_stream_end()
    assert e.uncomp_size == len(data) and e.hash == GOLDEN_ENTRIES[0][2]
    w.write_cdr()
    w.write_eocdr()
    r = Reader.from_memory(w.buffer)
    assert r.read_file("file1.txt") == data


def test_copy_between_archives(golden):
    src = Reader.from_memory(golden["archive_none.zpk"])
    w = Writer.to_heap()
    w.write_header()
    w.write_data_header()
    w.write_files_from_archive(src, [src.file_entries[1]])
    w.write_cdr()
    w.write_eocdr()
    r = Reader.from_memory(w.buffer)
    assert r.file_count == 1
    assert r.read_file("file2.txt") == golden["file2.txt"]


def test_corrupt_signature(golden):
    data = bytearray(golden["archive_none.zpk"])
    data[0] ^= 0xFF
    with pytest.raises(ZPackError) as ei:
        Reader.from_memory(bytes(data))
    assert ei.value.code == Result.ERROR_SIGNATURE_INVALID


def test_too_small():
    with pytest.raises(ZPackError) as ei:
        Reader.from_memory(b"ZPK\x15tiny")
    assert ei.value.code == Result.ERROR_FILE_TOO_SMALL


def test_bad_version(golden):
    data = bytearray(golden["archive_none.zpk"])
    data[4] = 99
    with pytest.raises(ZPackError) as ei:
        Reader.from_memory(bytes(data))
    assert ei.value.code == Result.ERROR_VERSION_INCOMPATIBLE


def test_hash_mismatch_detected(golden):
    data = bytearray(golden["archive_none.zpk"])
    data[20] ^= 0xFF  # flip a byte inside file1's stored data
    r = Reader.from_memory(bytes(data))
    with pytest.raises(ZPackError) as ei:
        r.read_file("file1.txt")
    assert ei.value.code == Result.ERROR_FILE_HASH_MISMATCH


def test_entry_serialization_roundtrip():
    e = records.FileEntry("dir/файл.bin", offset=10, comp_size=5, uncomp_size=9,
                          hash=0x123456789ABCDEF0, comp_method=2)
    blob = e.serialize()
    entries, comp, uncomp = records.parse_file_entries(blob, 1)
    assert entries[0] == e and comp == 5 and uncomp == 9


@pytest.mark.parametrize("method", [C.CompressionMethod.NONE, C.CompressionMethod.ZSTD, C.CompressionMethod.LZ4])
@pytest.mark.parametrize("streaming", [False, True])
@pytest.mark.parametrize("to_file", [False, True])
def test_write_matrix(golden, method, streaming, to_file, tmp_path):
    """Parity: tests/write_archive.c:146-187 — method × {oneshot, streaming}
    × {file, heap} = 12 combinations, streamed with 16-byte chunks."""
    w = Writer.open(tmp_path / "m.zpk") if to_file else Writer.to_heap()
    w.write_header()
    w.write_data_header()
    for name in ["file1.txt", "file2.txt"]:
        data = golden[name]
        if streaming:
            w.write_file_stream_begin(name, CompressOptions(method))
            for i in range(0, len(data), 16):
                w.write_file_stream(data[i : i + 16])
            w.write_file_stream_end()
        else:
            w.add_file(name, data, CompressOptions(method))
    w.write_cdr()
    w.write_eocdr()
    if to_file:
        w.close()
        r = Reader.open(tmp_path / "m.zpk")
    else:
        r = Reader.from_memory(w.buffer)
    for name in ["file1.txt", "file2.txt"]:
        assert r.read_file(name) == golden[name]
    r.close()
