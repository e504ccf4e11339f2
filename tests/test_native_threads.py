"""Cold-start concurrency tests for the threaded native backend.

The round-5 TSAN finding: the encoder's and decoder's lazy table init
used a plain-bool guard, so a FRESH process whose first zstd call fans
out to the worker pool raced the initializers (with a vector-reallocation
use-after-free hazard).  These tests exercise exactly that shape in a
child process so a TSAN run of this file (scripts/sanitize_native.py
--tsan) reproduces the class; under a plain build they are functional
smoke tests.  Reference contrast: single-threaded by design
(/root/reference/lib/zpack.h:337-341)."""

import os
import subprocess
import sys

import pytest

CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["ZPACK_NATIVE_THREADS"] = "4"
import numpy as np
from zpack_tpu import native
if native.get_lib() is None:
    sys.exit(77)
rng = np.random.default_rng(0)
text = (b"the quick brown fox jumps " * 400000)[:8 << 20]
data = bytes(text[: 3 << 20]) + rng.integers(0, 256, 1 << 20).astype(
    np.uint8).tobytes() + bytes(text[: 2 << 20])
mode = sys.argv[1]
if mode == "zstd_enc":
    c = native.zstd_compress(data, 3)
    assert native.zstd_decompress(c, len(data)) == data
elif mode == "zstd_dec":
    c = native.zstd_compress(data, 3)
else:
    c = native.lz4f_compress(data, 1)
    assert native.lz4f_decompress(c, len(data)) == data
print("ok")
"""

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("mode", ["zstd_enc", "zstd_dec", "lz4"])
def test_cold_start_parallel_codec(mode):
    """First native call in a fresh process runs the worker pool (the
    lazy-init race window); any sanitizer report fails the child."""
    proc = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), mode],
        capture_output=True, text=True, timeout=240)
    if proc.returncode == 77:
        pytest.skip("native backend unavailable")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ok" in proc.stdout
