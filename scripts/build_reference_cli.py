"""Build the REAL reference CLI from /root/reference against system libs.

The reference vendors its codecs as git submodules which are empty in this
checkout, but the distro ships runtime libraries (libzstd.so, liblz4.so.1,
libxxhash.so.0).  Development headers are missing for lz4/xxhash, so:
  - lz4frame.h/lz4.h: minimal ABI-compatible shims (scripts/ref_shim/)
  - xxhash.h: the full vendored copy inside the pyarrow wheel

The resulting binary is the round-trip conformance oracle BASELINE.md asks
for: archives our framework emits must open with it, and vice versa
(tests/test_reference_interop.py).

Usage: python scripts/build_reference_cli.py [build_dir] -> prints binary path
"""
from __future__ import annotations

import glob
import os
import pathlib
import shutil
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE = pathlib.Path("/root/reference")


def find_xxhash_h() -> str | None:
    for pat in [
        "/opt/venv/lib/python*/site-packages/pyarrow/include/arrow/vendored/xxhash/xxhash.h",
        "/usr/include/xxhash.h",
    ]:
        hits = glob.glob(pat)
        if hits:
            return hits[0]
    return None


def find_lib(name: str) -> str | None:
    for d in ["/lib/x86_64-linux-gnu", "/usr/lib/x86_64-linux-gnu", "/usr/lib"]:
        for cand in sorted(glob.glob(os.path.join(d, f"lib{name}.so*"))):
            return cand
    return None


def build(build_dir: str | os.PathLike = "/tmp/zpack_ref_build") -> str | None:
    """Build (cached) and return the reference CLI path, or None if the
    environment lacks the pieces (missing libs/cmake/reference checkout)."""
    build_dir = pathlib.Path(build_dir)
    binary = build_dir / "programs" / "zpack"
    if binary.exists():
        return str(binary)
    if not REFERENCE.is_dir() or not shutil.which("cmake"):
        return None
    xxh = find_xxhash_h()
    zstd_lib = find_lib("zstd")
    lz4_lib = find_lib("lz4")
    xxh_lib = find_lib("xxhash")
    if not (xxh and zstd_lib and lz4_lib and xxh_lib):
        return None
    hdr = build_dir / "shim"
    hdr.mkdir(parents=True, exist_ok=True)
    shutil.copy(xxh, hdr / "xxhash.h")
    for f in ["lz4frame.h", "lz4.h"]:
        shutil.copy(REPO / "scripts" / "ref_shim" / f, hdr / f)
    for name, lib in [("xxhash", xxh_lib), ("lz4", lz4_lib), ("zstd", zstd_lib)]:
        link = hdr / f"lib{name}.so"
        if not link.exists():
            link.symlink_to(lib)
    cfg = [
        "cmake", "-S", str(REFERENCE), "-B", str(build_dir),
        "-DZPACK_USE_SYSTEM_LIBS=ON",
        f"-DCMAKE_INCLUDE_PATH={hdr}",
        f"-DCMAKE_LIBRARY_PATH={hdr}",
        "-DCMAKE_BUILD_TYPE=Release",
        "-DZPACK_BUILD_TESTS=OFF",
    ]
    try:
        subprocess.run(cfg, check=True, capture_output=True, timeout=120)
        subprocess.run(["cmake", "--build", str(build_dir), "-j2"],
                       check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return None
    return str(binary) if binary.exists() else None


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/zpack_ref_build")
    if not path:
        print("reference CLI build unavailable", file=sys.stderr)
        sys.exit(1)
    print(path)
