"""Elastic multi-process compression: failure detection + recovery.

The reference has no failure handling beyond crash-safe archive mutation
via temp files (SURVEY.md §5: programs/utils.c:477-500, utils_move
:143-158).  Pod-scale compression jobs need more: a worker (host) can
crash or hang mid-job.  This driver runs N worker processes over a shared
chunk spool; chunk completion is an ATOMIC RENAME (the marker is the
output file itself), so any re-execution is idempotent.  The driver
detects dead workers (exit code) and hung workers (wall-clock timeout),
then redistributes the remaining chunks over fresh workers — the elastic
analog of jax.distributed's coordinator restart flow, kept at the process
level where single-chunk granularity makes recovery trivial.

Each chunk compresses to an independent frame, so the assembled output is
a spec-valid multi-frame stream (zstd: RFC 8878 §3.1; lz4f: concatenated
frames) that any conformant decoder — including the reference CLI's
streaming loop — consumes transparently.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys
import time


def chunk_path(spool: pathlib.Path, idx: int) -> pathlib.Path:
    return spool / f"chunk_{idx:06d}.bin"


def _compress_one(data: bytes, method: str, level: int) -> bytes:
    from ..codecs import get_codec
    from ..constants import CompressionMethod

    m = CompressionMethod.LZ4 if method == "lz4" else CompressionMethod.ZSTD
    return get_codec(m).compress(data, level)


def worker_main(argv: list[str]) -> int:
    """Worker process entry: compress the given chunk indices of the input
    file into the spool.  Fault injection (tests): --fail-after N aborts
    after N fresh chunks; ZPACK_ELASTIC_HANG=1 hangs instead of working."""
    input_path, spool_dir, method, level, chunk_size, *idxs = argv
    fail_after = None
    if "--fail-after" in idxs:
        k = idxs.index("--fail-after")
        fail_after = int(idxs[k + 1])
        idxs = idxs[:k] + idxs[k + 2 :]
    if os.environ.get("ZPACK_ELASTIC_HANG"):
        time.sleep(3600)
    spool = pathlib.Path(spool_dir)
    level = int(level)
    chunk_size = int(chunk_size)
    fresh = 0
    with open(input_path, "rb") as f:
        for idx_s in idxs:
            idx = int(idx_s)
            dest = chunk_path(spool, idx)
            if dest.exists():
                continue
            f.seek(idx * chunk_size)
            data = f.read(chunk_size)
            comp = _compress_one(data, method, level)
            tmp = dest.with_suffix(f".tmp.{os.getpid()}")
            tmp.write_bytes(comp)
            os.replace(tmp, dest)  # atomic completion marker
            fresh += 1
            if fail_after is not None and fresh >= fail_after:
                print(f"injected failure after {fresh} chunks", file=sys.stderr)
                return 17
    return 0


def compress_file_elastic(
    input_path: str | os.PathLike,
    spool_dir: str | os.PathLike,
    *,
    method: str = "zstd",
    level: int = 3,
    chunk_size: int = 4 << 20,
    workers: int = 2,
    max_rounds: int = 4,
    worker_timeout: float = 600.0,
    fault_args: dict[int, list[str]] | None = None,
    fault_env: dict[int, dict[str, str]] | None = None,
) -> bytes:
    """Compress ``input_path`` with ``workers`` processes, recovering from
    worker crashes/hangs by redistributing unfinished chunks.  Returns the
    assembled multi-frame stream.  ``fault_args`` / ``fault_env`` inject
    per-worker faults in round 0 (tests only)."""
    input_path = os.fspath(input_path)
    spool = pathlib.Path(spool_dir)
    spool.mkdir(parents=True, exist_ok=True)
    size = os.path.getsize(input_path)
    n_chunks = max(1, -(-size // chunk_size))
    repo_root = pathlib.Path(__file__).resolve().parents[2]

    for rnd in range(max_rounds):
        pending = [i for i in range(n_chunks) if not chunk_path(spool, i).exists()]
        if not pending:
            break
        # strided assignment: contiguous halves load-imbalance badly when
        # compressibility varies along the file (prose chunks take ~3x a
        # random chunk at zstd-3); interleaving gives every worker the same
        # mix (measured 2-proc work efficiency 0.69 -> ~0.9 on the bench
        # corpus).  Redistribution rounds still rebalance after faults.
        shards = [pending[w::workers] for w in range(workers)]
        procs = []
        for w, shard in enumerate(shards):
            if not shard:
                continue
            # -S skips site processing: the axon sitecustomize force-imports
            # jax (~1.8s) which chunk workers never use; PYTHONPATH carries
            # the parent's package resolution instead (startup 1.8s -> 0.3s)
            args = [sys.executable, "-S", "-m", "zpack_tpu.parallel.elastic",
                    input_path, str(spool), method, str(level), str(chunk_size),
                    *map(str, shard)]
            env = dict(os.environ)
            env["PYTHONPATH"] = os.pathsep.join(
                [p for p in sys.path if p] + [str(repo_root)])
            if rnd == 0 and fault_env and w in fault_env:
                env.update(fault_env[w])
            if rnd == 0 and fault_args and w in fault_args:
                args += fault_args[w]
            procs.append((w, subprocess.Popen(args, cwd=repo_root, env=env)))
        deadline = time.monotonic() + worker_timeout
        failures = []
        for w, p in procs:
            remaining = max(0.0, deadline - time.monotonic())
            try:
                rc = p.wait(timeout=remaining)
            except subprocess.TimeoutExpired:
                p.kill()
                p.wait()
                failures.append((w, "hang"))
                continue
            if rc != 0:
                failures.append((w, f"exit {rc}"))
        if not failures:
            continue  # next round's pending-scan confirms completion
        # failed workers' chunks stay pending; the next round redistributes
    pending = [i for i in range(n_chunks) if not chunk_path(spool, i).exists()]
    if pending:
        raise RuntimeError(f"elastic job incomplete after {max_rounds} rounds: {len(pending)} chunks")
    out = bytearray()
    for i in range(n_chunks):
        out += chunk_path(spool, i).read_bytes()
    return bytes(out)


if __name__ == "__main__":
    sys.exit(worker_main(sys.argv[1:]))
