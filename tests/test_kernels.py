"""JAX kernel + mesh pipeline tests (run on the 8-device virtual CPU mesh
set up in conftest; the driver dry-runs real multi-chip separately)."""

import random

import numpy as np
import pytest

import jax

from zpack_tpu.codecs.lz4 import block as lz4block, frame as lz4frame
from zpack_tpu.codecs.xxh3 import xxh3_64
from zpack_tpu.kernels import lz4_jax
from zpack_tpu.kernels.xxh3_jax import xxh3_64_jax
from zpack_tpu.parallel.pipeline import MeshCompressor, make_mesh


def _mix(n, seed=0):
    rng = random.Random(seed)
    out = bytearray()
    while len(out) < n:
        if rng.random() < 0.7:
            out += b"repeating chunk %d " % (rng.randint(0, 8))
        else:
            out += bytes(rng.getrandbits(8) for _ in range(8))
    return bytes(out[:n])


@pytest.mark.parametrize("n", [241, 1024, 1025, 65536, 200001])
def test_xxh3_jax_bit_exact(n):
    data = _mix(n, seed=n)
    assert xxh3_64_jax(data) == xxh3_64(data)


@pytest.mark.parametrize("kind", ["mix", "rand", "zeros", "text"])
def test_lz4_tokenize_roundtrip(kind):
    data = {
        "mix": _mix(16384),
        "rand": bytes(random.Random(1).getrandbits(8) for _ in range(16384)),
        "zeros": b"\0" * 16384,
        "text": (b"orbit doubling parse on tpu! " * 600)[:16384],
    }[kind]
    comp = lz4_jax.compress_block_tpu(data)
    assert lz4block.decompress_block(comp, len(data)) == data


def test_lz4_tokenize_partial_block():
    data = _mix(10000, seed=3)
    comp = lz4_jax.compress_block_tpu(data)
    assert lz4block.decompress_block(comp, len(data)) == data


def test_mesh_compressor_roundtrip():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh()
    assert mesh.shape["entry"] * mesh.shape["block"] == 8
    mc = MeshCompressor(mesh, block_size=4096)
    data = _mix(100000, seed=9)
    comp = mc.compress(data)
    assert lz4frame.decompress_frame(comp) == data


def test_mesh_compressor_matches_reference_decoder():
    """Frames from the mesh pipeline decode with the incremental decoder
    too (stand-in for reference CLI conformance)."""
    mc = MeshCompressor(make_mesh(), block_size=4096)
    data = _mix(50000, seed=11)
    comp = mc.compress(data)
    d = lz4frame.FrameDecompressor()
    out = bytearray()
    for i in range(0, len(comp), 997):
        out += d.update(comp[i : i + 997])
    assert d.finished and bytes(out) == data


def test_graft_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert len(out) == 2
    g.dryrun_multichip(8)


def test_pallas_batched_xxh3():
    """Pallas batched hash kernel (interpret mode on CPU) is bit-exact."""
    rng = random.Random(77)
    streams = [b"", b"short", b"x" * 240]
    streams += [bytes(rng.getrandbits(8) for _ in range(rng.randint(241, 5000)))
                for _ in range(40)]
    from zpack_tpu.kernels.xxh3_pallas import xxh3_64_batch

    got = xxh3_64_batch(streams)
    assert all(g == xxh3_64(s) for g, s in zip(got, streams))


def test_mesh_zstd_pipeline():
    """TPU-tokenized zstd blocks (BASELINE config-5 shape) decode with both
    our decoder and the libzstd oracle."""
    import zstandard

    from zpack_tpu.codecs.zstd import frame as ZF

    mc = MeshCompressor(make_mesh(), block_size=4096)
    data = _mix(120000, seed=21)
    comp = mc.compress_zstd(data, 3)
    assert ZF.decompress(comp) == data
    assert zstandard.ZstdDecompressor().decompress(comp, max_output_size=len(data)) == data
