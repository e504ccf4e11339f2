"""Multi-host (jax.distributed) smoke test: 2 real processes over the Gloo
CPU backend compress shard ranges and assemble one frame."""

import pathlib
import socket
import subprocess
import sys
import textwrap

REPO = pathlib.Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    from zpack_tpu.parallel import distributed as D
    D.initialize(f"127.0.0.1:{port}", nproc, pid)
    import numpy as np
    rng = np.random.default_rng(1)
    data = bytes(np.where(rng.random(200000) < 0.8,
                          np.tile(np.frombuffer(b"distributed!", dtype=np.uint8), 16667)[:200000],
                          rng.integers(0, 256, 200000)).astype(np.uint8))
    comp = D.compress_multihost(data, 1, block_size=32 << 10)
    if pid == 0:
        from zpack_tpu.codecs.lz4 import frame as LF
        assert LF.decompress_frame(comp) == data
        print("MULTIHOST_OK", flush=True)
    """
)


def test_two_process_compress():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), "2", str(port)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (1, 0)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    assert any("MULTIHOST_OK" in o for o in outs)


ARCHIVE_WORKER = textwrap.dedent(
    """
    import sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    from zpack_tpu.parallel import distributed as D
    D.initialize(f"127.0.0.1:{port}", nproc, pid)
    import numpy as np
    rng = np.random.default_rng(5)
    # similar-but-distinct JSON-ish records: the shape shared dictionaries
    # exist for
    files = []
    for i in range(12):
        rows = b"".join(
            b'{"user":"u%04d","score":%05d,"tag":"%s"}\\n'
            % (int(rng.integers(5000)), int(rng.integers(90000)),
               [b"alpha", b"beta", b"gamma"][int(rng.integers(3))])
            for _ in range(400))
        files.append((f"logs/part{i:02d}.jsonl", rows))
    arch = D.build_archive_multihost(files, level=3)
    # every host assembles the identical archive
    import hashlib
    digests = D._allgather_ragged(hashlib.sha256(arch).digest())
    assert all(d == digests[0] for d in digests), "hosts disagree"
    if pid == 0:
        from zpack_tpu.reader import Reader
        r = Reader.from_memory(arch, shared=True)
        names = [e.filename for e in r.file_entries]
        assert "__zpack.dict" in names
        for name, data in files:
            assert r.read_file(name) == data  # XXH3-verified, dict decode
        print("MULTIHOST_ARCHIVE_OK", flush=True)
    """
)


def test_two_process_archive_with_dictionary():
    """2-process jax.distributed build of a real multi-entry zstd archive
    with a broadcast shared dictionary (VERDICT r4 item 5)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", ARCHIVE_WORKER, str(pid), "2", str(port)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (1, 0)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    assert any("MULTIHOST_ARCHIVE_OK" in o for o in outs)
