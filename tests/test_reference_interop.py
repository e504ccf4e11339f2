"""Interop against the REAL reference CLI binary (LeadRDRK/ZPack v2.0.3).

BASELINE.md's correctness oracle: "archives our framework emits must open
with that CLI; bytes we decode must match its output bit-for-bit".  The
binary is built from /root/reference against the system codec libraries by
scripts/build_reference_cli.py (cached in /tmp); these tests skip when the
environment can't build it.

Covers both directions and the mutation commands:
  - ours -> reference: create with every method/level, reference `t`
    verifies hashes and `x` extracts bit-exact
  - reference -> ours: reference `c` archives, our Reader decodes bit-exact
  - reference mutates our archive (`a`), we read the result
"""
from __future__ import annotations

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from scripts.build_reference_cli import build as build_ref_cli  # noqa: E402

from zpack_tpu import CompressionMethod, Reader  # noqa: E402
from zpack_tpu.writer import CompressOptions, Writer  # noqa: E402


@pytest.fixture(scope="module")
def ref_cli():
    path = build_ref_cli()
    if not path:
        pytest.skip("reference CLI not buildable in this environment")
    return path


@pytest.fixture()
def corpus(tmp_path):
    files = {
        "hello.txt": b"hello reference interop\n" * 40,
        "sub/dir/data.bin": bytes(range(256)) * 700,
        "rand.bin": os.urandom(120000),
        "empty.txt": b"",
        "big.txt": (b"the quick brown fox jumps over the lazy dog " * 5000),
    }
    for name, data in files.items():
        p = tmp_path / "src" / name
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(data)
    return files


def _ref(ref_cli, *args, cwd):
    proc = subprocess.run([ref_cli, *args], cwd=cwd, capture_output=True,
                          text=True, timeout=120)
    return proc


@pytest.mark.parametrize("method,level", [
    ("none", 0), ("lz4", 1), ("zstd", 1), ("zstd", 3), ("zstd", 19),
])
def test_ours_to_reference(ref_cli, corpus, tmp_path, method, level):
    """Reference binary verifies + extracts archives we create."""
    m = {"none": CompressionMethod.NONE, "lz4": CompressionMethod.LZ4,
         "zstd": CompressionMethod.ZSTD}[method]
    arch = tmp_path / f"ours_{method}{level}.zpk"
    with Writer.open(arch) as w:
        w.write_archive([
            (name, data, CompressOptions(m, level))
            for name, data in corpus.items()
        ])
    t = _ref(ref_cli, "t", str(arch), cwd=tmp_path)
    assert t.returncode == 0, t.stdout + t.stderr
    assert "Corrupted files: 0/" in t.stdout
    out = tmp_path / f"out_{method}{level}"
    out.mkdir()
    x = _ref(ref_cli, "x", str(arch), "-o", str(out), cwd=tmp_path)
    assert x.returncode == 0, x.stdout + x.stderr
    for name, data in corpus.items():
        got = (out / name).read_bytes()
        assert got == data, (method, level, name)


@pytest.mark.parametrize("margs", [["-m", "none"], ["-m", "lz4:1"],
                                   ["-m", "zstd:3"], ["-m", "zstd:19"]])
def test_reference_to_ours(ref_cli, corpus, tmp_path, margs):
    """Our Reader decodes archives the reference binary creates."""
    arch = tmp_path / "ref.zpk"
    src = tmp_path / "src"
    c = _ref(ref_cli, "c", *margs, str(arch), *[str(src / n) for n in corpus],
             cwd=tmp_path)
    assert c.returncode == 0, c.stdout + c.stderr
    with Reader.open(arch) as r:
        by_name = {e.filename: e for e in r.file_entries}
        # reference stores basenames for these paths
        for name, data in corpus.items():
            base = name.rsplit("/", 1)[-1]
            assert base in by_name, (name, sorted(by_name))
            assert r.read_file(by_name[base]) == data, name


def test_reference_mutates_our_archive(ref_cli, corpus, tmp_path):
    """Reference `a` (add, rewrite via temp file) on our archive; we read
    the mutated result."""
    arch = tmp_path / "mut.zpk"
    with Writer.open(arch) as w:
        w.write_archive([
            ("hello.txt", corpus["hello.txt"],
             CompressOptions(CompressionMethod.ZSTD, 3)),
        ])
    extra = tmp_path / "extra.bin"
    extra.write_bytes(b"added by the reference binary" * 100)
    a = _ref(ref_cli, "a", "-m", "zstd:3", str(arch), str(extra), cwd=tmp_path)
    assert a.returncode == 0, a.stdout + a.stderr
    with Reader.open(arch) as r:
        names = {e.filename for e in r.file_entries}
        assert "hello.txt" in names and "extra.bin" in names
        for e in r.file_entries:
            if e.filename == "extra.bin":
                assert r.read_file(e) == extra.read_bytes()
            if e.filename == "hello.txt":
                assert r.read_file(e) == corpus["hello.txt"]


def test_reference_golden_store_bytes(ref_cli, tmp_path):
    """Store-method archives are byte-identical between the two
    implementations (the format fixes every byte when no codec runs)."""
    f1 = tmp_path / "f1.txt"
    f2 = tmp_path / "f2.txt"
    f1.write_bytes(b"deterministic store archive body one\n")
    f2.write_bytes(b"deterministic store archive body two!\n")
    ref_arch = tmp_path / "ref_store.zpk"
    c = _ref(ref_cli, "c", "-m", "none", str(ref_arch), str(f1), str(f2),
             cwd=tmp_path)
    assert c.returncode == 0, c.stdout + c.stderr
    ours = tmp_path / "ours_store.zpk"
    with Writer.open(ours) as w:
        w.write_archive([
            ("f1.txt", f1.read_bytes(), CompressOptions(CompressionMethod.NONE, 0)),
            ("f2.txt", f2.read_bytes(), CompressOptions(CompressionMethod.NONE, 0)),
        ])
    assert ours.read_bytes() == ref_arch.read_bytes()


@pytest.mark.parametrize("margs", [["-m", "lz4:1"], ["-m", "zstd:3"]])
def test_read_back_carry_on_reference_archive(ref_cli, corpus, tmp_path, margs):
    """The faithful caller-buffer streaming decode (read_file_stream_buffer)
    exercises REAL nonzero read_back carries against an archive produced by
    the reference binary — the reference's defining streaming subtlety
    (lib/zpack_read.c:529-536, caller memmove protocol
    tests/read_archive.c:56-61 / programs/commands.c:394-397)."""
    from zpack_tpu import stream as S

    # mildly compressible payload: compressed size must dwarf the input
    # buffer or there is genuinely nothing to carry
    import random

    rng = random.Random(7)
    payload = b"".join(
        (b"carry protocol %d " % i) + rng.randbytes(24) for i in range(6000))
    src = tmp_path / "carry.bin"
    src.write_bytes(payload)
    arch = tmp_path / "ref.zpk"
    c = _ref(ref_cli, "c", *margs, str(arch), str(src), cwd=tmp_path)
    assert c.returncode == 0, c.stdout + c.stderr
    with Reader.open(arch) as r:
        entry = r.file_entries[0]
        assert entry.comp_size > 8 * 1024  # sanity: many buffer refills
        stream = S.init_stream()
        buf = bytearray(1024)       # small input buffer
        stream.next_in = buf
        out = bytearray()
        carries = 0
        for _ in range(10_000_000):
            if stream.read_back:    # the caller-side memmove carry
                buf[: stream.read_back] = (
                    buf[stream.in_pos - stream.read_back : stream.in_pos])
                carries += 1
            stream.avail_in = len(buf)
            stream.avail_out = 512  # output budget < decoded block size
            S.read_file_stream_buffer(r, entry, stream)
            out += stream.next_out
            if S.read_stream_done(stream, entry):
                break
        assert bytes(out) == payload
        assert carries > 0, "no real read_back carry against a reference archive"
