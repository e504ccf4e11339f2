"""Fault-injection tests for the elastic multi-process compression driver
(failure detection + chunk redistribution; SURVEY.md §5 — the reference has
no failure handling beyond temp-file archive mutation)."""

import pathlib

import numpy as np
import pytest

from zpack_tpu.parallel import elastic


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.default_rng(21)
    data = bytes(
        np.where(
            rng.random(600_000) < 0.8,
            np.tile(np.frombuffer(b"elastic recovery", dtype=np.uint8), 37500),
            rng.integers(0, 256, 600_000),
        ).astype(np.uint8)
    )
    p = tmp_path / "input.bin"
    p.write_bytes(data)
    return p, data


def _decode(comp: bytes, want: int) -> bytes:
    from zpack_tpu import native

    out = native.zstd_decompress(comp, want)
    assert out is not None
    return out


def test_elastic_happy_path(corpus, tmp_path):
    path, data = corpus
    comp = elastic.compress_file_elastic(
        path, tmp_path / "spool", chunk_size=64 << 10, workers=2)
    assert _decode(comp, len(data)) == data
    # one frame per chunk landed
    n_chunks = -(-len(data) // (64 << 10))
    assert len(list((tmp_path / "spool").glob("chunk_*.bin"))) == n_chunks


def test_elastic_worker_crash_recovers(corpus, tmp_path):
    path, data = corpus
    spool = tmp_path / "spool"
    # worker 0 dies after 1 chunk in round 0; driver must detect the exit
    # code and redistribute its remaining chunks
    comp = elastic.compress_file_elastic(
        path, spool, chunk_size=64 << 10, workers=2,
        fault_args={0: ["--fail-after", "1"]})
    assert _decode(comp, len(data)) == data
    # completed chunks were NOT recompressed: every chunk file exists once
    n_chunks = -(-len(data) // (64 << 10))
    assert len(list(spool.glob("chunk_*.bin"))) == n_chunks
    assert not list(spool.glob("*.tmp.*"))  # no orphaned partials


def test_elastic_hung_worker_times_out(corpus, tmp_path):
    path, data = corpus
    comp = elastic.compress_file_elastic(
        path, tmp_path / "spool", chunk_size=128 << 10, workers=2,
        worker_timeout=10.0,
        fault_env={1: {"ZPACK_ELASTIC_HANG": "1"}})
    assert _decode(comp, len(data)) == data


def test_elastic_all_workers_fail_raises(corpus, tmp_path):
    path, data = corpus
    with pytest.raises(RuntimeError, match="incomplete"):
        elastic.compress_file_elastic(
            path, tmp_path / "spool", chunk_size=64 << 10, workers=2,
            max_rounds=1,
            fault_args={0: ["--fail-after", "0"], 1: ["--fail-after", "0"]})


def test_elastic_resume_from_partial_spool(corpus, tmp_path):
    """A fresh driver run over a spool with pre-existing chunks only
    compresses the missing ones (checkpoint/resume semantics)."""
    path, data = corpus
    spool = tmp_path / "spool"
    spool.mkdir()
    # pre-complete chunk 0 with authoritative content
    from zpack_tpu.parallel.elastic import _compress_one, chunk_path

    chunk0 = _compress_one(data[: 64 << 10], "zstd", 3)
    chunk_path(spool, 0).write_bytes(chunk0)
    before = chunk_path(spool, 0).stat().st_mtime_ns
    comp = elastic.compress_file_elastic(path, spool, chunk_size=64 << 10, workers=2)
    assert chunk_path(spool, 0).stat().st_mtime_ns == before  # untouched
    assert comp.startswith(chunk0)
    assert _decode(comp, len(data)) == data
