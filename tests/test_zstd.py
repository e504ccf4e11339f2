"""zstd codec tests.

Decode oracle: frames produced by the `zstandard` C library (stand-in for
the reference's vendored zstd, lib/zpack_read.c:380) across levels and
features; encode oracle: our frames must decode bit-exactly with that same
library (the archive contract: reference CLI must open our archives).
Golden fixture: archive_zstd.zpk (reference: tests/workdir, tests/archive.h).
"""

import random

import pytest
import zstandard

from zpack_tpu.codecs.zstd import encode, frame
from zpack_tpu.reader import Reader


def _corpora():
    rng = random.Random(42)
    words = [bytes(rng.getrandbits(8) for _ in range(rng.randint(2, 12))) for _ in range(500)]
    return {
        "empty": b"",
        "one": b"x",
        "tiny": b"hello world",
        "text": b"the quick brown fox jumps over the lazy dog. " * 300,
        "zeros": b"\0" * 100000,
        "rand": bytes(rng.getrandbits(8) for _ in range(30000)),
        "semi": b"".join(
            (b"pat%d " % (i % 13)) * 2 + bytes([rng.getrandbits(8)]) for i in range(3000)
        ),
        "runs": b"".join(bytes([i % 7]) * (i % 300 + 1) for i in range(400)),
        "big": b"".join(rng.choice(words) for _ in range(60000)),  # multi-block
    }


CORPORA = _corpora()


@pytest.mark.parametrize("name", list(CORPORA))
@pytest.mark.parametrize("level", [1, 3, 19])
def test_decode_libzstd_frames(name, level):
    data = CORPORA[name]
    comp = zstandard.ZstdCompressor(level=level).compress(data)
    assert frame.decompress(comp) == data


@pytest.mark.parametrize("name", ["text", "big"])
def test_decode_libzstd_features(name):
    data = CORPORA[name]
    for kwargs in [
        {"write_checksum": True},
        {"write_content_size": False},
        {"write_checksum": True, "write_content_size": False},
    ]:
        comp = zstandard.ZstdCompressor(level=5, **kwargs).compress(data)
        assert frame.decompress(comp) == data


def test_decode_streamed_and_concatenated():
    data = CORPORA["big"]
    cobj = zstandard.ZstdCompressor(level=3).compressobj()
    comp = cobj.compress(data) + cobj.flush()
    comp += zstandard.ZstdCompressor(level=1).compress(CORPORA["text"])
    assert frame.decompress(comp) == data + CORPORA["text"]


@pytest.mark.parametrize("name", list(CORPORA))
@pytest.mark.parametrize("level", [1, 3, 19])
def test_encode_roundtrip_and_oracle(name, level):
    data = CORPORA[name]
    comp = encode.compress(data, level)
    assert frame.decompress(comp) == data
    out = zstandard.ZstdDecompressor().decompress(comp, max_output_size=len(data) + 16)
    assert out == data


def test_encode_checksum():
    data = CORPORA["semi"]
    comp = encode.compress(data, 3, checksum=True)
    assert frame.decompress(comp) == data
    assert zstandard.ZstdDecompressor().decompress(comp, max_output_size=len(data)) == data


@pytest.mark.parametrize("level", [1, 3])
def test_encode_ratio_reasonable(level):
    """Ratio guardrail: stay within 15% of libzstd on compressible corpora
    (the BASELINE contract is ≤ reference size; track closely here)."""
    for name in ["semi", "runs", "zeros", "text", "big"]:
        data = CORPORA[name]
        ours = len(encode.compress(data, level))
        ref = len(zstandard.ZstdCompressor(level=level).compress(data))
        assert ours <= ref * 1.15, (name, level, ours, ref)


def test_golden_zstd_archive(golden):
    r = Reader.from_memory(golden["archive_zstd.zpk"])
    assert r.read_file("file1.txt") == golden["file1.txt"]
    assert r.read_file("file2.txt") == golden["file2.txt"]


def test_corrupt_frame_detected():
    data = CORPORA["semi"]
    comp = bytearray(encode.compress(data, 3, checksum=True))
    comp[len(comp) // 2] ^= 0xFF
    with pytest.raises(Exception):
        frame.decompress(bytes(comp))


def test_encode_ratio_parity_pinned():
    """Pin the claimed libzstd parity per level on the bench-like mixed
    corpus (native encoder — the engine the CLI uses).  These caps are the
    project's actual claims, not loose guardrails: a regression to 1.1x
    must fail CI.  (BASELINE: ratio <= reference per level.)"""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from bench import build_corpus

    from zpack_tpu import native

    if native.get_lib() is None:
        pytest.skip("native backend unavailable")
    data = build_corpus(2 << 20)
    caps = {1: 1.02, 2: 1.00, 3: 1.00, 19: 1.00}
    for lvl, cap in caps.items():
        ours = len(native.zstd_compress(data, lvl))
        ref = len(zstandard.ZstdCompressor(level=lvl).compress(data))
        assert ours <= ref * cap, f"L{lvl}: {ours} vs libzstd {ref} ({ours/ref:.4f} > {cap})"


def test_encode_l19_prose_slice_pinned():
    """The round-2 verdict's named gap: L19 on the PROSE slice alone must
    be <= libzstd-19 (was 1.11x before the deeper-BT budgets, price
    iteration, mml=3 candidates and the recursive block splitter; now
    0.9999).  Kept as its own pin so a mixed-corpus win can never mask a
    prose regression."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from bench import build_corpus

    from zpack_tpu import native

    if native.get_lib() is None:
        pytest.skip("native backend unavailable")
    full = build_corpus(3 << 20)
    prose = full[: len(full) // 3]
    ours = len(native.zstd_compress(prose, 19))
    ref = len(zstandard.ZstdCompressor(level=19).compress(prose))
    assert ours <= ref, f"L19 prose: {ours} vs libzstd {ref} ({ours/ref:.4f})"


def test_encode_l19_longrange_pinned():
    """16 MiB multi-MB-distance corpus (bench.build_longrange, shrunk to
    8 MiB for CI time): L19 must stay within 2% of libzstd-19 (measured
    1.0046 at 16 MiB after the BT window-eviction fix — out-of-window
    exact duplicates used to eat the walk byte-budget and starve the DP
    of near candidates — plus the 2-way aged LDM buckets)."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from bench import build_longrange

    from zpack_tpu import native

    if native.get_lib() is None:
        pytest.skip("native backend unavailable")
    data = build_longrange(8 << 20)
    ours = len(native.zstd_compress(data, 19))
    ref = len(zstandard.ZstdCompressor(level=19).compress(data))
    assert ours <= ref * 1.02, f"L19 longrange: {ours} vs {ref} ({ours/ref:.4f})"


def test_encode_l19_real_source_code_pinned():
    """VERDICT r3 item 7: L19 on REAL source-code text (numpy's .py files
    via the local-corpus builder).  The +1-bit flat literal-price bias
    closed 1.0082 -> 1.0028 vs libzstd-19; pinned at <= 1.005 so the
    remaining ~0.3% (entropy-section equilibrium, see docs/parity.md)
    can only shrink.  Skips if the corpus source files are unavailable."""
    from scripts import corpus as corpus_mod

    from zpack_tpu import native

    if native.get_lib() is None:
        pytest.skip("native backend unavailable")
    blob = corpus_mod._category_bytes("source", 2 << 20)
    if len(blob) < (2 << 20):
        pytest.skip("local source corpus unavailable")
    ours = len(native.zstd_compress(blob, 19))
    ref = len(zstandard.ZstdCompressor(level=19).compress(blob))
    assert ours <= ref * 1.005, f"L19 source: {ours} vs {ref} ({ours/ref:.4f})"


def test_encode_l19_real_elf_and_records_pinned():
    """Round-4 splitter gains pinned (depth-5 recursive block splitter
    with 3-fraction top levels, native/zstd_encode.cpp): ELF executables
    1.0077 -> 1.0028 and collation-record tables 1.0111 -> 1.0067 vs
    libzstd-19 on the real local corpus.  Pinned with small headroom so
    regressions surface; skips where the corpus sources are missing."""
    from scripts import corpus as corpus_mod

    from zpack_tpu import native

    if native.get_lib() is None:
        pytest.skip("native backend unavailable")
    for shape, cap in (("binary", 1.005), ("records", 1.009)):
        blob = corpus_mod._category_bytes(shape, 2 << 20)
        if len(blob) < (2 << 20):
            pytest.skip(f"local {shape} corpus unavailable")
        ours = len(native.zstd_compress(blob, 19))
        ref = len(zstandard.ZstdCompressor(level=19).compress(blob))
        assert ours <= ref * cap, f"L19 {shape}: {ours} vs {ref} ({ours/ref:.4f})"


def test_l19_longrange_adaptive_window_beats_libzstd():
    """Round 5: level > 12 uses a content-adaptive window (up to 32 MiB,
    plain zstd every decoder accepts) — multi-MB-distance repeats that
    libzstd-19's fixed 8 MiB window cannot reach compress ~6% smaller
    (16 MiB bench corpus: 1.0046x -> 0.941x libzstd-19).  Pinned on a
    12 MiB slice with ~10 MiB-distance repeats; also round-trips through
    libzstd (window acceptance interop)."""
    from bench import build_longrange
    from zpack_tpu import native

    if native.get_lib() is None:
        pytest.skip("native backend unavailable")
    lr = build_longrange(12 << 20)
    ours = native.zstd_compress(lr, 19)
    lib = len(zstandard.ZstdCompressor(level=19).compress(lr))
    assert zstandard.ZstdDecompressor().decompress(
        ours, max_output_size=len(lr)) == lr
    assert len(ours) <= lib * 0.99, f"longrange: {len(ours)} vs {lib}"


def test_fse_repeat_mode_fires_and_interops():
    """Round 5: the native encoder prices FSE Repeat_Mode (wire mode 3,
    RFC 8878 §3.1.1.3.2.1.1 — zero table-description bytes reusing the
    previous block's table; the reference's vendored libzstd emits it in
    half its blocks on code-like shapes).  On a multi-block input with a
    stable sequence distribution at least one block must choose mode 3
    for some kind, the archive must shrink or hold vs no-repeat pricing,
    and libzstd must accept the frame."""
    from zpack_tpu import native

    if native.get_lib() is None:
        pytest.skip("native backend unavailable")
    rng = random.Random(5)
    # stable, skewed record structure across many 128 KiB blocks
    rec = bytes(rng.randrange(0, 9) for _ in range(40)) * 3
    blob = b"".join(
        rec[o % 17:] + rec[: o % 17] + bytes([o & 0xFF]) * 9
        for o in range(4500)
    )
    assert len(blob) > (3 << 17)  # at least 4 blocks
    comp = native.zstd_compress(blob, 3)
    assert zstandard.ZstdDecompressor().decompress(
        comp, max_output_size=len(blob)) == blob
    # walk block mode bytes: some sequence section must use mode 3
    from zpack_tpu.codecs.zstd import seq as SEQ
    from zpack_tpu.codecs.zstd.frame import (FrameDecoder,
                                             parse_frame_header,
                                             parse_literals_section)
    hdr = parse_frame_header(comp, 4)
    pos = 4 + hdr.header_size
    dec = FrameDecoder(hdr)
    saw_repeat = False
    while True:
        b0 = int.from_bytes(comp[pos:pos + 3], "little")
        last, btype, bsize = b0 & 1, (b0 >> 1) & 3, b0 >> 3
        pos += 3
        payload = comp[pos:pos + (1 if btype == 1 else bsize)]
        if btype == 2:
            plan, p1 = parse_literals_section(payload, 0, dec.lit_state)
            if plan[0] == "huf":
                _, items, table = plan
                import numpy as _np
                from zpack_tpu.codecs.zstd import huffman as _huf
                outs = [_huf._decode_one_stream(s, table, n) for s, n in items]
                lits = (_np.concatenate(outs).tobytes() if len(outs) > 1
                        else outs[0].tobytes())
            else:
                lits = plan[1]
            nb, p2 = SEQ.parse_nb_sequences(payload, p1)
            if nb:
                mode = payload[p2]
                if 3 in ((mode >> 6) & 3, (mode >> 4) & 3, (mode >> 2) & 3):
                    saw_repeat = True
                lls, mls, ofs, _ = SEQ.decode_sequences(payload, p1,
                                                        dec.seq_tables)
                SEQ.execute_sequences(lits, lls, mls, ofs, dec.rep,
                                      dec.window)
            else:
                dec.window += lits
        elif btype == 1:
            dec.window += payload * bsize
        else:
            dec.window += payload
        pos += len(payload) if btype != 1 else 1
        if last:
            break
    assert saw_repeat, "no block chose FSE Repeat_Mode on a stable shape"


def test_fse_rle_repeat_mode_roundtrips():
    """Repeat_Mode after an RLE table (the decoder's previous table may be
    an RLE one — RFC 8878 §3.1.1.3.2.1.1): a periodic pattern makes every
    128 KiB block one giant rep match, so all three code histograms are
    single-symbol; block 1 emits RLE tables, later blocks must repeat
    them at zero description bytes.  libzstd and the native decoder must
    both accept."""
    from zpack_tpu import native

    if native.get_lib() is None:
        pytest.skip("native backend unavailable")
    blob = (b"\x07\x3a\x91\xc4 zpack rle-repeat probe \x11\x22" * 40000)[: 640 * 1024]
    comp = native.zstd_compress(blob, 3)
    assert zstandard.ZstdDecompressor().decompress(
        comp, max_output_size=len(blob)) == blob
    assert native.zstd_decompress(comp, len(blob)) == blob
    from zpack_tpu.codecs.zstd import seq as SEQ
    from zpack_tpu.codecs.zstd.frame import (FrameDecoder, decode_literals,
                                             parse_frame_header)
    hdr = parse_frame_header(comp, 4)
    pos = 4 + hdr.header_size
    dec = FrameDecoder(hdr)
    modes = []
    while True:
        b0 = int.from_bytes(comp[pos:pos + 3], "little")
        last, btype, bsize = b0 & 1, (b0 >> 1) & 3, b0 >> 3
        pos += 3
        payload = comp[pos:pos + (1 if btype == 1 else bsize)]
        if btype == 2:
            lits, p1 = decode_literals(payload, 0, dec.lit_state)
            nb, p2 = SEQ.parse_nb_sequences(payload, p1)
            if nb:
                modes.append(payload[p2])
                lls, mls, ofs, _ = SEQ.decode_sequences(payload, p1,
                                                        dec.seq_tables)
                SEQ.execute_sequences(lits, lls, mls, ofs, dec.rep,
                                      dec.window)
            else:
                dec.window += lits
        elif btype == 1:
            dec.window += payload * bsize
        else:
            dec.window += payload
        pos += len(payload) if btype != 1 else 1
        if last:
            break
    assert len(modes) >= 3
    ml_kinds = [(m >> 2) & 3 for m in modes]
    assert ml_kinds[0] == 1, "first sequence block should emit an RLE table"
    assert 3 in ml_kinds[1:], "later blocks should repeat the RLE table"
