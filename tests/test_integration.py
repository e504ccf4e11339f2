"""Archive-scale integration tests mirroring the BASELINE.json configs at
test scale: many small files with per-entry method choice, larger streamed
entries, codec gating, and metric counters."""

import os
import random

import pytest

from zpack_tpu import constants as C
from zpack_tpu.codecs import _INSTANCES  # noqa: F401  (warm registry)
from zpack_tpu.errors import Result, ZPackError
from zpack_tpu.reader import Reader
from zpack_tpu.stream import read_file_stream_iter
from zpack_tpu.writer import CompressOptions, Writer


def _files(n, seed=0):
    rng = random.Random(seed)
    methods = [C.CompressionMethod.NONE, C.CompressionMethod.LZ4, C.CompressionMethod.ZSTD]
    files = []
    for i in range(n):
        size = rng.choice([0, 5, 100, 1000, 5000])
        if rng.random() < 0.5:
            data = (b"small file %d content " % i) * (size // 20 + 1)
            data = data[:size]
        else:
            data = bytes(rng.getrandbits(8) for _ in range(size))
        method = methods[i % 3]
        files.append((f"dir{i % 7}/file{i:05d}.bin", data, CompressOptions(method)))
    return files


def test_many_small_files_mixed_methods():
    """BASELINE config 4 at test scale: per-entry lz4/zstd/store choice
    with central directory round-trip."""
    files = _files(300)
    w = Writer.to_heap()
    w.write_archive(files)
    r = Reader.from_memory(w.buffer)
    assert r.file_count == 300
    for name, data, opt in files:
        e = r.get_file_entry(name)
        assert e.comp_method == int(opt.method)
        assert r.read_file(e) == data


def test_streamed_large_entry_256k_blocks():
    """BASELINE config 3 shape: chunked write/read of a multi-MB entry in
    256 KiB blocks via the streaming API."""
    rng = random.Random(9)
    piece = bytes(rng.getrandbits(8) for _ in range(1024))
    data = (piece + b"compressible filler " * 500)[:]
    data = data * 12  # ~ a few hundred KB; CI-sized stand-in for 1 GB
    w = Writer.to_heap()
    w.write_header()
    w.write_data_header()
    w.write_file_stream_begin("big.bin", CompressOptions(C.CompressionMethod.ZSTD, 3))
    for i in range(0, len(data), 256 << 10):
        w.write_file_stream(data[i : i + (256 << 10)])
    w.write_file_stream_end()
    w.write_cdr()
    w.write_eocdr()
    r = Reader.from_memory(w.buffer)
    entry = r.get_file_entry("big.bin")
    out = b"".join(read_file_stream_iter(r, entry, chunk_size=256 << 10))
    assert out == data


def test_codec_gating_env():
    """Runtime analog of ZPACK_DISABLE_ZSTD → ERROR_NOT_AVAILABLE
    (reference: lib/zpack_read.c:371)."""
    w = Writer.to_heap()
    w.write_archive([("a.txt", b"hello world " * 10, CompressOptions(C.CompressionMethod.ZSTD))])
    r = Reader.from_memory(w.buffer)
    os.environ["ZPACK_TPU_DISABLE_ZSTD"] = "1"
    try:
        with pytest.raises(ZPackError) as ei:
            r.read_file("a.txt")
        assert ei.value.code == Result.ERROR_NOT_AVAILABLE
    finally:
        del os.environ["ZPACK_TPU_DISABLE_ZSTD"]
    assert r.read_file("a.txt") == b"hello world " * 10


def test_metrics_phases():
    from zpack_tpu.utils.observe import metrics

    metrics.reset()
    with metrics.phase("test.compress", nbytes=1000):
        pass
    snap = metrics.snapshot()
    assert snap["test.compress"]["calls"] == 1
    assert snap["test.compress"]["bytes"] == 1000


def test_host_parallel_chunked_large_entry():
    """>16MB entries route through host-parallel chunked frames (one frame
    per chunk, GIL released in native calls); all decoders handle the
    concatenation."""
    import numpy as np

    from zpack_tpu.codecs import get_codec

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, 1 << 16).astype(np.uint8).tobytes()
    data = ((base + b"chunk parallel pattern " * 400) * 220)[: 18 << 20]
    for method in [C.CompressionMethod.ZSTD, C.CompressionMethod.LZ4]:
        codec = get_codec(method)
        comp = codec.compress(data, 1)
        assert codec.decompress(comp, len(data)) == data


def test_checkpoint_resume(tmp_path):
    """SURVEY §5 parity promise: per-block progress map; a crashed job
    resumes at the first unfinished chunk and produces identical output."""
    import pytest as _pytest

    from zpack_tpu.codecs.lz4 import frame as LF
    from zpack_tpu.parallel.checkpoint import CheckpointedCompressor

    data = (b"checkpointed content block! " * 20000)[:400000]
    cc = CheckpointedCompressor(tmp_path / "job.spool", method="lz4",
                                chunk_size=64 << 10)
    with _pytest.raises(RuntimeError):
        cc.compress(data, fail_after=3)  # crash mid-job
    import json

    meta = json.loads((tmp_path / "job.spool.progress.json").read_text())
    assert len(meta["chunks"]) == 3  # progress persisted
    comp = cc.compress(data)  # resume
    assert LF.decompress_frame(comp) == data
    # reference output: uninterrupted run
    cc2 = CheckpointedCompressor(tmp_path / "job2.spool", method="lz4",
                                 chunk_size=64 << 10)
    assert cc2.compress(data) == comp
    # input change invalidates the checkpoint
    cc3 = CheckpointedCompressor(tmp_path / "job.spool", method="lz4",
                                 chunk_size=64 << 10)
    comp3 = cc3.compress(data[:-1] + b"!")
    assert LF.decompress_frame(comp3) == data[:-1] + b"!"


def test_batch_write_and_read_files_roundtrip():
    """Batched writer (zn_compress_batch) + Reader.read_files
    (zn_decompress_batch) against per-entry paths."""
    import numpy as np

    from zpack_tpu import constants as C
    from zpack_tpu.reader import Reader
    from zpack_tpu.writer import CompressOptions, Writer

    rng = np.random.default_rng(11)
    methods = [C.CompressionMethod.ZSTD, C.CompressionMethod.LZ4, C.CompressionMethod.NONE]
    files = []
    for i in range(60):
        size = int(rng.integers(0, 5000))
        blob = bytes(rng.integers(0, 48, size, dtype=np.uint8))
        files.append((f"n{i:03d}", blob, CompressOptions(methods[i % 3])))
    w = Writer.to_heap()
    w.write_archive(files)
    r = Reader.from_memory(w.buffer, shared=True)
    outs = r.read_files([n for n, _, _ in files])
    assert [o for o in outs] == [d for _, d, _ in files]
    # per-entry path agrees (hash verified both ways)
    for n, d, _ in files[:10]:
        assert r.read_file(n) == d
    # subset + FileEntry objects
    subset = r.read_files(r.file_entries[5:15])
    assert subset == [d for _, d, _ in files[5:15]]


def test_batch_read_files_detects_corruption():
    import numpy as np
    import pytest

    from zpack_tpu import constants as C
    from zpack_tpu.errors import ZPackError
    from zpack_tpu.reader import Reader
    from zpack_tpu.writer import CompressOptions, Writer

    rng = np.random.default_rng(12)
    files = [(f"n{i}", bytes(rng.integers(0, 250, 3000, dtype=np.uint8)) * 2,
              CompressOptions(C.CompressionMethod.LZ4)) for i in range(8)]
    w = Writer.to_heap()
    w.write_archive(files)
    buf = bytearray(w.buffer)
    e = Reader.from_memory(bytes(buf)).get_file_entry("n3")
    buf[e.offset + e.comp_size // 2] ^= 0xFF
    r = Reader.from_memory(bytes(buf))
    with pytest.raises(ZPackError):
        r.read_files([n for n, _, _ in files])


def test_concurrent_readers_shared_buffer():
    """Thread-safety contract parity (lib/zpack.h:335-341): buffer-based
    reading is thread safe with per-thread decompression state.  N threads
    hammer one shared zero-copy Reader with one-shot reads AND tiny-buffer
    streaming reads; every result must be bit-exact (XXH3-verified on the
    read path, memcmp here)."""
    import threading

    import numpy as np

    rng = np.random.default_rng(77)
    words = [b"stress", b"the", b"reader", b"concurrently", b"zpack"]
    files = []
    for i in range(12):
        blob = bytearray()
        while len(blob) < 40_000:
            blob += words[int(rng.integers(len(words)))] + b" "
            if rng.random() < 0.1:
                blob += bytes(rng.integers(0, 256, 16).astype(np.uint8))
        method = [C.CompressionMethod.NONE, C.CompressionMethod.LZ4,
                  C.CompressionMethod.ZSTD][i % 3]
        files.append((f"f{i:02}", bytes(blob), CompressOptions(method, None)))
    w = Writer.to_heap()
    w.write_archive(files)
    r = Reader.from_memory(w.buffer, shared=True)  # ONE shared reader
    expected = {n: d for n, d, _ in files}

    errors: list[BaseException] = []
    barrier = threading.Barrier(8)

    def worker(seed: int) -> None:
        try:
            trng = random.Random(seed)
            barrier.wait()
            for _ in range(30):
                name = f"f{trng.randrange(len(files)):02}"
                if trng.random() < 0.5:
                    got = r.read_file(name)
                else:
                    entry = r.get_file_entry(name)
                    got = b"".join(read_file_stream_iter(r, entry,
                                                         chunk_size=4096))
                assert got == expected[name], name
        except BaseException as e:  # noqa: BLE001 - re-raised on main thread
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]


def test_fused_writer_large_entry_both_sinks(tmp_path):
    """>2 MiB zstd/lz4 entries take the fused native path (chunk-parallel
    frames + entry XXH3 in one call, round 4): heap and file sinks must
    produce identical archives that round-trip with full verification."""
    import numpy as np

    from zpack_tpu.reader import Reader
    from zpack_tpu.writer import CompressOptions, Writer

    rng = np.random.default_rng(11)
    word = b"fused writer path exercises the chunked native compressor "
    noise = rng.integers(0, 256, 1 << 20).astype(np.uint8).tobytes()
    data = (word * 40000 + noise + word * 30000)[: 5 << 20]
    for method, lvl in ((C.CompressionMethod.ZSTD, 3), (C.CompressionMethod.LZ4, 1)):
        w = Writer.to_heap()
        w.write_archive([("big.bin", data, CompressOptions(method, lvl))])
        heap_buf = w.buffer
        path = tmp_path / f"fused_{int(method)}.zpk"
        with Writer.open(path) as wf:
            wf.write_archive([("big.bin", data, CompressOptions(method, lvl))])
        assert path.read_bytes() == heap_buf  # sink-independent output
        r = Reader.from_memory(heap_buf, shared=True)
        assert r.read_file("big.bin") == data  # includes XXH3 verify
        with Reader.open(path) as rf:
            assert rf.read_file("big.bin") == data
