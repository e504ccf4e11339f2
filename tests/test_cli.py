"""CLI end-to-end tests covering all 8 commands and the switches
(parity surface: programs/zpack_cli.c:16-39, programs/commands.c)."""

import os
import pathlib

import pytest

from zpack_tpu.cli import paths as P
from zpack_tpu.cli.main import main
from zpack_tpu.reader import Reader


@pytest.fixture
def tree(tmp_path):
    d = tmp_path / "src"
    (d / "sub").mkdir(parents=True)
    (d / "a.txt").write_bytes(b"alpha " * 100)
    (d / "b.bin").write_bytes(bytes(range(256)) * 40)
    (d / "sub" / "c.txt").write_bytes(b"nested content! " * 64)
    return tmp_path


def test_create_list_extract_roundtrip(tree, capsys):
    arc = tree / "out.zpk"
    assert main(["c", str(arc), str(tree / "src")]) == 0
    r = Reader.open(arc)
    names = sorted(e.filename for e in r.file_entries)
    assert names == ["src/a.txt", "src/b.bin", "src/sub/c.txt"]
    r.close()

    assert main(["l", str(arc)]) == 0
    out = capsys.readouterr().out
    assert "src/a.txt" in out and "zstd" in out and "3 files" in out

    dest = tree / "extract"
    assert main(["x", str(arc), "-o", str(dest)]) == 0
    assert (dest / "src" / "a.txt").read_bytes() == b"alpha " * 100
    assert (dest / "src" / "sub" / "c.txt").read_bytes() == b"nested content! " * 64

    flat = tree / "flat"
    assert main(["e", str(arc), "-o", str(flat)]) == 0
    assert (flat / "c.txt").exists() and not (flat / "sub").exists()


@pytest.mark.parametrize("mspec", ["none", "lz4", "lz4:4", "zstd:1", "zstd:19"])
def test_create_methods(tree, mspec):
    arc = tree / f"m_{mspec.replace(':', '_')}.zpk"
    assert main(["c", "-m", mspec, str(arc), str(tree / "src" / "a.txt")]) == 0
    r = Reader.open(arc)
    assert r.read_file("a.txt") == b"alpha " * 100
    r.close()


def test_add_delete_move_test(tree, capsys):
    arc = tree / "arch.zpk"
    assert main(["c", str(arc), str(tree / "src" / "a.txt")]) == 0
    # add
    assert main(["a", "-m", "lz4", str(arc), str(tree / "src" / "b.bin")]) == 0
    r = Reader.open(arc)
    assert sorted(e.filename for e in r.file_entries) == ["a.txt", "b.bin"]
    assert r.get_file_entry("b.bin").comp_method == 2
    assert r.read_file("a.txt") == b"alpha " * 100
    r.close()
    # move
    assert main(["m", str(arc), "b.bin", "renamed.bin"]) == 0
    r = Reader.open(arc)
    assert r.read_file("renamed.bin") == bytes(range(256)) * 40
    r.close()
    # test (all good)
    assert main(["t", str(arc)]) == 0
    assert "All files OK" in capsys.readouterr().out
    # delete
    assert main(["d", str(arc), "a.txt"]) == 0
    r = Reader.open(arc)
    assert [e.filename for e in r.file_entries] == ["renamed.bin"]
    r.close()


def test_test_detects_corruption(tree, capsys):
    arc = tree / "bad.zpk"
    assert main(["c", str(arc), str(tree / "src" / "a.txt")]) == 0
    data = bytearray(arc.read_bytes())
    data[14] ^= 0xFF  # inside file data
    arc.write_bytes(bytes(data))
    assert main(["t", str(arc)]) == 1
    assert "corrupted" in capsys.readouterr().out


def test_exclude_switch(tree):
    arc = tree / "ex.zpk"
    assert main(["c", str(arc), str(tree / "src")]) == 0
    dest = tree / "exout"
    assert main(["x", str(arc), "-o", str(dest), "-x", "src/b.bin"]) == 0
    assert (dest / "src" / "a.txt").exists()
    assert not (dest / "src" / "b.bin").exists()


def test_help_and_bad_command(capsys):
    assert main(["-h"]) == 1
    assert "Usage: zpack" in capsys.readouterr().out
    assert main(["q", "x.zpk"]) == 1


def test_process_path_sanitizer():
    """parity: utils_process_path semantics (programs/utils.c:526-590)."""
    assert P.process_path("/etc/passwd", windows=False) == "etc/passwd"
    assert P.process_path("//a//b", windows=False) == "a/b"
    assert P.process_path("../a", windows=False) == "./a"
    assert P.process_path("a/../b", windows=False) == "a/./b"
    assert P.process_path("normal/path.txt", windows=False) == "normal/path.txt"
    assert P.process_path("C:\\evil", windows=True) == "C/_evil"
    assert P.process_path("a\\b", windows=True) == "a_b"


def test_unsafe_extraction_path_kept(tree):
    # with --unsafe the stored name is used verbatim (except we still join
    # to the output dir); sanity: extraction works
    arc = tree / "u.zpk"
    assert main(["c", str(arc), str(tree / "src" / "a.txt")]) == 0
    dest = tree / "uout"
    assert main(["x", "--unsafe", str(arc), "-o", str(dest)]) == 0
    assert (dest / "a.txt").exists()


def test_mutation_crash_safety(tree, monkeypatch):
    """a/d/m write to a temp file and only replace on success
    (parity: utils_get_tmp_path + utils_move, programs/utils.c:477-500,
    143-158): a failure mid-rewrite must leave the original intact."""
    arc = tree / "safe.zpk"
    assert main(["c", str(arc), str(tree / "src" / "a.txt")]) == 0
    original = arc.read_bytes()

    from zpack_tpu.errors import Result, ZPackError

    def boom(self, entries=None):
        raise ZPackError(Result.ERROR_WRITE_FAILED, "boom")

    monkeypatch.setattr("zpack_tpu.writer.Writer.write_cdr", boom)
    assert main(["d", str(arc), "a.txt"]) == 1
    assert arc.read_bytes() == original  # untouched
    leftovers = [p for p in arc.parent.iterdir() if ".tmp" in p.name]
    assert not leftovers  # temp file cleaned up


def test_parallel_extract_many_files(tmp_path):
    """>16 entries extract via the thread pool on memory-backed readers."""
    src = tmp_path / "many"
    src.mkdir()
    for i in range(30):
        (src / f"f{i:02d}.txt").write_bytes(b"content %d " % i * 50)
    arc = tmp_path / "many.zpk"
    assert main(["c", str(arc), str(src)]) == 0
    dest = tmp_path / "out"
    assert main(["x", str(arc), "-o", str(dest)]) == 0
    for i in range(30):
        assert (dest / "many" / f"f{i:02d}.txt").read_bytes() == b"content %d " % i * 50
