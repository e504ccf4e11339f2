#!/usr/bin/env python
"""Deterministic Silesia-style benchmark corpus from LOCAL files.

The driver environment has no network (BASELINE.md names Silesia but it
cannot be fetched), so this assembles the same *mix of content classes*
Silesia standardizes — English prose, source code, markup, executable
code, structured records, noisy data — from files baked into the image,
with a fixed manifest so runs are reproducible on one box and the recipe
is documented for any other (VERDICT r3 item 6).

Category map (Silesia counterpart in parens):
  text    (dickens/webster)  /usr/share/doc/*/copyright prose, sorted
  source  (samba)            site-packages numpy/*.py, sorted
  markup  (xml)              *.dist-info/METADATA concatenated, sorted
  binary  (mozilla/ooffice)  /usr/bin ELF executables, sorted
  records (osdb/sao)         /usr/share/perl Unicode allkeys.txt table
  noise   (x-ray)            seeded numpy PCG64 bytes

Each category contributes a fixed fraction; a category whose source files
are missing falls back to the synthetic generator in bench.py for its
slice (logged in the manifest).  build() caches the assembled corpus in
/tmp keyed by (size, manifest hash).
"""
from __future__ import annotations

import glob
import hashlib
import os
import pathlib

import numpy as np

# fraction of the corpus per category (sums to 1)
MIX = [
    ("text", 0.25),
    ("source", 0.20),
    ("markup", 0.10),
    ("binary", 0.25),
    ("records", 0.14),
    ("noise", 0.06),
]


def _read_sorted(paths: list[str], budget: int) -> bytes:
    out = bytearray()
    for p in sorted(paths):
        if len(out) >= budget:
            break
        try:
            with open(p, "rb") as f:
                out += f.read(min(budget - len(out), 4 << 20))
        except OSError:
            continue
    return bytes(out[:budget])


def _category_bytes(cat: str, budget: int) -> bytes:
    if cat == "text":
        return _read_sorted(glob.glob("/usr/share/doc/*/copyright"), budget)
    if cat == "source":
        import numpy as _np
        pkg = pathlib.Path(_np.__file__).parent
        return _read_sorted([str(p) for p in pkg.rglob("*.py")], budget)
    if cat == "markup":
        roots = glob.glob(os.path.join(
            os.path.dirname(os.path.dirname(np.__file__)), "*.dist-info", "METADATA"))
        return _read_sorted(roots, budget)
    if cat == "binary":
        paths = []
        for p in sorted(glob.glob("/usr/bin/*"))[:400]:
            try:
                if os.path.isfile(p) and not os.path.islink(p):
                    with open(p, "rb") as f:
                        if f.read(4) == b"\x7fELF":
                            paths.append(p)
            except OSError:
                continue
        return _read_sorted(paths, budget)
    if cat == "records":
        hits = glob.glob("/usr/share/perl/*/Unicode/Collate/allkeys.txt")
        return _read_sorted(hits, budget)
    if cat == "noise":
        rng = np.random.default_rng(42)
        return bytes(rng.integers(0, 256, budget).astype(np.uint8))
    raise ValueError(cat)


def build(size: int = 8 << 20):
    """Assemble the corpus; returns (bytes, manifest dict)."""
    parts = []
    manifest = {}
    for cat, frac in MIX:
        budget = int(size * frac)
        blob = _category_bytes(cat, budget)
        fallback = len(blob) < budget
        if fallback:
            # deterministic synthetic filler for the missing tail
            import sys
            sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
            from bench import build_corpus as _syn
            blob = blob + _syn(budget - len(blob), seed=hash(cat) & 0xFFFF)
        parts.append(blob)
        manifest[cat] = {"bytes": len(blob), "fallback": fallback}
    data = b"".join(parts)[:size]
    manifest["sha256"] = hashlib.sha256(data).hexdigest()[:16]
    manifest["total"] = len(data)
    return data, manifest


_CACHE: dict[int, tuple[bytes, dict]] = {}


def cached_build(size: int = 8 << 20):
    if size not in _CACHE:
        _CACHE[size] = build(size)
    return _CACHE[size]


if __name__ == "__main__":
    import json
    data, man = build()
    print(json.dumps(man, indent=1))
