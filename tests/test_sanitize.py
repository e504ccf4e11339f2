"""ASan/UBSan gate over the native C++ backend (VERDICT r3 item 8).

Runs scripts/sanitize_native.py — an instrumented build of native/*.cpp
plus the native-touching test files under it — as a subprocess.  Any
sanitizer diagnostic aborts that run and fails here.  Skippable via
ZPACK_SKIP_SANITIZE=1 (e.g. when a CI lane lacks libasan).
"""
from __future__ import annotations

import os
import pathlib
import shutil
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.skipif(os.environ.get("ZPACK_SKIP_SANITIZE") == "1",
                    reason="sanitizer pass disabled by env")
@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
@pytest.mark.skipif(os.environ.get("ZPACK_TPU_NATIVE_SO") is not None,
                    reason="already running under a native .so override")
def test_native_under_asan_ubsan():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "sanitize_native.py"),
         "tests/test_native.py"],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (proc.stdout[-2000:] + proc.stderr[-2000:])
