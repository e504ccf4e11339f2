"""XXH32/XXH64/XXH3-64 bit-compatibility tests against the installed xxhash
C extension (oracle) and the reference golden hashes
(reference: tests/archive.h:112-115 — the two fixture files' XXH3-64)."""

import random

import pytest
import xxhash

from zpack_tpu.codecs import xxh3 as H

LENGTHS = [0, 1, 2, 3, 4, 5, 7, 8, 9, 12, 16, 17, 31, 32, 63, 64, 65, 96, 127,
           128, 129, 160, 192, 240, 241, 255, 256, 511, 512, 1023, 1024, 1025,
           2048, 4096, 10000, 65536, 100000, 1 << 20]


def _data(n, seed=1234):
    rng = random.Random(seed + n)
    return bytes(rng.getrandbits(8) for _ in range(min(n, 4096))) * (n // min(n, 4096) + 1) if n else b""


@pytest.mark.parametrize("n", LENGTHS)
def test_xxh3_64_oneshot(n):
    data = _data(n)[:n]
    assert H.xxh3_64(data) == xxhash.xxh3_64_intdigest(data)


@pytest.mark.parametrize("n", [0, 1, 4, 9, 17, 100, 240, 241, 1024, 5000, 1 << 17])
@pytest.mark.parametrize("seed", [1, 0xDEADBEEF, (1 << 63) + 12345])
def test_xxh3_64_seeded(n, seed):
    data = _data(n, seed=7)[:n]
    assert H.xxh3_64(data, seed) == xxhash.xxh3_64_intdigest(data, seed)


@pytest.mark.parametrize("n", LENGTHS)
def test_xxh32_xxh64(n):
    data = _data(n)[:n]
    assert H.xxh32(data) == xxhash.xxh32_intdigest(data)
    assert H.xxh64(data) == xxhash.xxh64_intdigest(data)
    assert H.xxh32(data, 42) == xxhash.xxh32_intdigest(data, 42)
    assert H.xxh64(data, 42) == xxhash.xxh64_intdigest(data, 42)


@pytest.mark.parametrize("chunks", [
    [0], [1], [5, 11], [16, 16, 16], [240, 1], [241], [100, 200, 300],
    [1, 63, 64, 65, 1000], [1024, 1024], [4096, 1, 4096], [250000, 3, 70000],
])
def test_xxh3_streaming(chunks):
    rng = random.Random(99)
    state = H.XXH3State()
    oracle = xxhash.xxh3_64()
    for c in chunks:
        chunk = bytes(rng.getrandbits(8) for _ in range(min(c, 1024))) * (c // min(c, 1024) + 1) if c else b""
        chunk = chunk[:c]
        state.update(chunk)
        oracle.update(chunk)
    assert state.digest() == oracle.intdigest()
    # digest() must not disturb state: more updates still work
    state.update(b"tail")
    oracle.update(b"tail")
    assert state.digest() == oracle.intdigest()


def test_xxh32_64_streaming():
    rng = random.Random(5)
    s32, s64 = H.XXH32State(7), H.XXH64State(7)
    o32, o64 = xxhash.xxh32(seed=7), xxhash.xxh64(seed=7)
    for c in [0, 1, 15, 16, 17, 100, 1000, 31, 32, 33]:
        chunk = bytes(rng.getrandbits(8) for _ in range(c))
        s32.update(chunk); o32.update(chunk)
        s64.update(chunk); o64.update(chunk)
    assert s32.digest() == o32.intdigest()
    assert s64.digest() == o64.intdigest()


def test_golden_file_hashes(golden):
    # reference: tests/archive.h:112-115
    assert H.xxh3_64(golden["file1.txt"]) == 0x7874CBA47D02B07D
    assert H.xxh3_64(golden["file2.txt"]) == 0x15F25C0F24DD8E52
