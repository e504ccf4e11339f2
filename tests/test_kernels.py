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


@pytest.mark.parametrize("kind", ["mix", "rand", "zeros", "text"])
def test_tokenize_u16_matches_noscatter(kind):
    """The u16 resort tokenizer must agree exactly with the reference
    (pos, packed) formulation after host unpack/unsort."""
    import jax.numpy as jnp

    from zpack_tpu.kernels.lz4_pallas import unsort_host

    data = {
        "mix": _mix(8192, seed=5),
        "rand": bytes(random.Random(6).getrandbits(8) for _ in range(8192)),
        "zeros": b"\0" * 8192,
        "text": (b"one u16 per byte down the tunnel " * 256)[:8192],
    }[kind]
    arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
    pos, packed = lz4_jax.tokenize_block_noscatter(arr, depth=2, n_words=2)
    want_src, want_mlen = unsort_host(np.asarray(pos), np.asarray(packed))
    tok = lz4_jax.tokenize_block_u16(arr, depth=2, n_words=2)
    got_src, got_mlen = lz4_jax.unpack_u16_host(tok)
    np.testing.assert_array_equal(got_mlen, want_mlen)
    np.testing.assert_array_equal(np.where(got_mlen > 0, got_src, -1),
                                  np.where(want_mlen > 0, want_src, -1))


@pytest.mark.parametrize("n", [8192, 65536])
def test_tokenize_resort_pair_matches_noscatter(n):
    """The (src u16, code u8) resort tokenizer must agree with the
    reference formulation at any B <= 65536."""
    import jax.numpy as jnp

    from zpack_tpu.kernels.lz4_pallas import unsort_host

    data = _mix(n, seed=n)
    arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
    pos, packed = lz4_jax.tokenize_block_noscatter(arr, depth=2, n_words=2)
    want_src, want_mlen = unsort_host(np.asarray(pos), np.asarray(packed))
    src16, code = lz4_jax.tokenize_block_resort(arr, depth=2, n_words=2)
    got_src, got_mlen = lz4_jax.unpack_resort_host(src16, code)
    np.testing.assert_array_equal(got_mlen, want_mlen)
    np.testing.assert_array_equal(np.where(got_mlen > 0, got_src, -1),
                                  np.where(want_mlen > 0, want_src, -1))


def test_mesh_default_block_ratio_robust():
    """Long-period stride data (the 8 KiB-block failure mode: a full
    period of literals per block restart) must stay near native ratio at
    the default mesh block size."""
    from zpack_tpu.codecs.lz4 import frame as lz4frame

    rec = (np.arange(0, 500_000, dtype=np.uint32) % 977).astype(np.uint16).tobytes()
    mc = MeshCompressor(make_mesh())  # default 64 KiB blocks
    comp = mc.compress(rec)
    assert lz4frame.decompress_frame(comp) == rec
    native = lz4frame.compress_frame(rec, 1)
    assert len(comp) <= int(len(native) * 1.25)


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
