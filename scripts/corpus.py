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


# ---------------------------------------------------------------------------
# Round 5: full-scale corpora (VERDICT r4 missing #2)
# ---------------------------------------------------------------------------

#: where scripts/fetch_corpora.py puts the real corpora when egress exists
CORPORA_DIR = pathlib.Path(__file__).resolve().parents[1] / "corpora"


def real_silesia_dir() -> pathlib.Path | None:
    d = CORPORA_DIR / "silesia"
    if d.is_dir() and any(d.iterdir()):
        return d
    return None


def real_enwik9_path() -> pathlib.Path | None:
    p = CORPORA_DIR / "enwik9" / "enwik9"
    if p.is_file() and p.stat().st_size == 10**9:
        return p
    return None


def _wiki_vocab(n_words: int = 24000) -> list[bytes]:
    """Deterministic English-ish vocabulary from local prose."""
    blob = _category_bytes("text", 4 << 20)
    seen: dict[bytes, int] = {}
    for w in blob.split():
        w = bytes(c for c in w if (65 <= c <= 90) or (97 <= c <= 122))
        if 2 <= len(w) <= 14:
            seen[w] = seen.get(w, 0) + 1
    vocab = [w for w, _ in sorted(seen.items(), key=lambda kv: -kv[1])]
    while len(vocab) < n_words:  # degenerate /usr/share: synthesize tail
        vocab.append(b"w%06d" % len(vocab))
    return vocab[:n_words]


def enwik9_like(size: int = 10**9,
                cache: str | os.PathLike | None = None) -> pathlib.Path:
    """A full-scale enwik9 stand-in: Wikipedia-XML-shaped text with a
    zipfian word distribution, distinct per 8 MiB tile (so no trivially
    dedupable long-range repeats), written to disk and cached.  If the
    REAL enwik9 is present (scripts/fetch_corpora.py) it is returned
    instead.  Returns the file path (1 GB does not belong in RAM)."""
    real = real_enwik9_path()
    if real is not None:
        return real
    cache = pathlib.Path(cache or "/tmp/zpack_corpora")
    cache.mkdir(parents=True, exist_ok=True)
    out = cache / f"enwik9_like_{size}.xml"
    if out.exists() and out.stat().st_size == size:
        return out
    vocab = _wiki_vocab()
    V = len(vocab)
    # zipf-ish ranks: p(r) ~ 1/(r+3)
    ranks = np.arange(V, dtype=np.float64)
    p = 1.0 / (ranks + 3.0)
    p /= p.sum()
    rng = np.random.default_rng(20260821)
    tile_words = 1 << 20
    tmp = out.with_suffix(".part")
    written = 0
    page = 0
    with open(tmp, "wb") as f:
        while written < size:
            idx = rng.choice(V, size=tile_words, p=p)
            words = [vocab[i] for i in idx]
            body = bytearray()
            wi = 0
            while wi < len(words) and written + len(body) < size + (1 << 20):
                page += 1
                para_words = words[wi : wi + 180 + (page % 90)]
                wi += len(para_words)
                body += (b"  <page>\n    <title>%s %s</title>\n    <id>%d</id>\n"
                         b"    <revision>\n      <id>%d</id>\n"
                         b"      <timestamp>2006-0%d-%02dT%02d:%02d:%02dZ"
                         b"</timestamp>\n      <text xml:space=\"preserve\">"
                         % (words[wi % len(words)].capitalize(),
                            words[(wi + 7) % len(words)], page, page * 3 + 11,
                            page % 9 + 1, page % 28 + 1, page % 24,
                            page % 60, (page * 7) % 60))
                body += b" ".join(para_words)
                if page % 5 == 0:
                    body += (b" [[Category:%s]] {{cite web|url=http://www."
                             b"%s.org/%d}}"
                             % (words[wi % len(words)],
                                words[(wi + 3) % len(words)], page))
                body += b"</text>\n    </revision>\n  </page>\n"
            take = min(len(body), size - written)
            f.write(body[:take])
            written += take
    tmp.rename(out)
    return out


def silesia_like(size: int = 212 << 20) -> tuple[bytes, dict]:
    """Full-scale Silesia stand-in (the real corpus is 211.9 MB); uses the
    REAL corpus files when present."""
    d = real_silesia_dir()
    if d is not None:
        files = sorted(d.iterdir())
        data = b"".join(p.read_bytes() for p in files)
        return data[:size], {"real": True, "files": [p.name for p in files],
                             "total": len(data)}
    return build(size)
