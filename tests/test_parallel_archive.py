"""Mesh-parallel archive building tests (8-device virtual CPU mesh)."""

import random

from zpack_tpu.parallel.archive import write_archive_parallel
from zpack_tpu.parallel.pipeline import make_mesh
from zpack_tpu.reader import Reader
from zpack_tpu.writer import Writer


def _mix(n, seed):
    rng = random.Random(seed)
    out = bytearray()
    while len(out) < n:
        if rng.random() < 0.75:
            out += b"content piece %d " % rng.randint(0, 20)
        else:
            out += bytes(rng.getrandbits(8) for _ in range(6))
    return bytes(out[:n])


def test_parallel_archive_roundtrip():
    files = [
        ("small.txt", _mix(500, 1)),
        ("medium.bin", _mix(20000, 2)),
        ("large.dat", _mix(150000, 3)),
        ("empty.txt", b""),
    ]
    mesh = make_mesh()
    w = Writer.to_heap()
    w.write_header()
    w.write_data_header()
    write_archive_parallel(w, files, mesh, block_size=4096)
    w.write_cdr()
    w.write_eocdr()

    r = Reader.from_memory(w.buffer)
    assert r.file_count == 4
    for name, data in files:
        assert r.read_file(name) == data  # includes XXH3 verification
    # entries decode with the incremental stream path too
    for name, data in files:
        entry = r.get_file_entry(name)
        out = b"".join(r.extract_iter(entry, chunk_size=777))
        assert out == data
