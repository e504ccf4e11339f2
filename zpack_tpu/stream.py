"""Streaming read/write state.

Parity model: ``zpack_stream`` (reference: lib/zpack.h:169-184,
lib/zpack_stream.c:4-29) and the chunked decode path
``zpack_read_file_stream`` (lib/zpack_read.c:473-640).

Contract notes (reference: lib/zpack.h:399-415 and §3.5 of SURVEY.md):
the reference may leave an unconsumed suffix of the input buffer and
report it in ``read_back`` for the caller to re-present.  Our codec
decompressors buffer partial input internally instead, so ``read_back``
is always 0 — a legal degenerate of the same contract — and completion
is still ``total_in == comp_size and read_back == 0`` plus drained
output (see :func:`read_stream_done`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .codecs import get_codec
from .codecs.xxh3 import XXH3State, make_xxh3_state
from .errors import HashMismatchError, Result, StreamStateError, ZPackError


@dataclass
class ZPackStream:
    """zlib-style stream object (parity: zpack_stream fields)."""

    next_in: bytes = b""
    avail_in: int = 0
    total_in: int = 0
    next_out: bytearray = field(default_factory=bytearray)
    avail_out: int = 0
    total_out: int = 0
    read_back: int = 0
    xxh3: object = field(default_factory=make_xxh3_state)

    # internal decode state (reference keeps the codec ctx on the reader;
    # we keep per-stream state so concurrent streams never collide)
    _decomp: object | None = None
    _stash: bytearray = field(default_factory=bytearray)
    _stash_pos: int = 0
    _entry: object | None = None

    def _stash_left(self) -> int:
        return len(self._stash) - self._stash_pos

    def reset(self) -> None:
        """parity: zpack_reset_stream (lib/zpack_stream.c:14-22)."""
        self.next_in = b""
        self.avail_in = 0
        self.total_in = 0
        self.next_out = bytearray()
        self.avail_out = 0
        self.total_out = 0
        self.read_back = 0
        self.xxh3 = make_xxh3_state()
        self._decomp = None
        self._stash = bytearray()
        self._stash_pos = 0
        self._entry = None


def init_stream() -> ZPackStream:
    """parity: zpack_init_stream (lib/zpack_stream.c:4-12)."""
    return ZPackStream()


def read_file_stream(reader, entry, stream: ZPackStream, verify: bool = True) -> bool:
    """One chunked-decode step (parity: zpack_read_file_stream,
    lib/zpack_read.c:515-640).

    Reads up to ``stream.avail_in`` raw bytes from the archive at the
    entry's current position, decodes, and appends at most
    ``stream.avail_out`` bytes to ``stream.next_out`` (cleared first).
    Returns True while more calls are needed; False when the file is done
    (at which point the XXH3 digest has been verified when ``verify``).
    """
    entry = reader._resolve(entry)
    if stream._entry is None:
        stream._entry = entry
        stream._decomp = get_codec(entry.comp_method).decompressor()
    elif stream._entry is not entry:
        raise StreamStateError("stream already bound to another entry")
    if stream.avail_out <= 0:
        raise StreamStateError("no output space provided")

    # pull raw bytes only when no decoded output is pending
    if not stream._stash_left() and stream.total_in < entry.comp_size:
        take = min(stream.avail_in or (1 << 20), entry.comp_size - stream.total_in)
        raw = reader._source.read_at(entry.offset + stream.total_in, take)
        if len(raw) < take:
            raise ZPackError(Result.ERROR_FILE_INCOMPLETE, "entry data truncated")
        is_final = stream.total_in + take >= entry.comp_size
        out, _consumed = stream._decomp.decompress(raw, is_final=is_final)
        stream.total_in += take
        stream.read_back = 0
        if out:
            stream.xxh3.update(out)
            stream._stash = bytearray(out)
            stream._stash_pos = 0

    emit = min(stream.avail_out, stream._stash_left())
    p = stream._stash_pos
    stream.next_out = bytearray(stream._stash[p : p + emit])
    stream._stash_pos = p + emit
    stream.total_out += emit

    done = stream.total_in >= entry.comp_size and not stream._stash_left()
    if done:
        if stream.total_out != entry.uncomp_size:
            raise ZPackError(
                Result.ERROR_FILE_SIZE_INVALID,
                f"stream produced {stream.total_out}, expected {entry.uncomp_size}",
            )
        if verify:
            h = stream.xxh3.digest()
            if h != entry.hash:
                raise HashMismatchError(entry.hash, h)
    return not done


def read_raw_file_stream(reader, entry, stream: ZPackStream) -> bool:
    """Chunked *raw* (still-compressed) reads of an entry
    (parity: zpack_read_raw_file_stream, lib/zpack_read.c:473-513): each
    call fills ``stream.next_out`` with up to ``avail_out`` compressed
    bytes from the entry's data; returns True while more remain."""
    entry = reader._resolve(entry)
    if stream._entry is None:
        stream._entry = entry
    elif stream._entry is not entry:
        raise StreamStateError("stream already bound to another entry")
    if stream.avail_out <= 0:
        raise StreamStateError("no output space provided")
    take = min(stream.avail_out, entry.comp_size - stream.total_in)
    raw = reader._source.read_at(entry.offset + stream.total_in, take) if take else b""
    if len(raw) < take:
        raise ZPackError(Result.ERROR_FILE_INCOMPLETE, "entry data truncated")
    stream.next_out = bytearray(raw)
    stream.total_in += take
    stream.total_out += take
    return stream.total_in < entry.comp_size


def read_stream_done(stream: ZPackStream, entry) -> bool:
    """parity: ZPACK_READ_STREAM_DONE (lib/zpack.h:713-714)."""
    return (
        stream.total_in >= entry.comp_size
        and stream.read_back == 0
        and not stream._stash_left()
    )


def read_file_stream_iter(reader, entry, chunk_size: int = 1 << 20, verify: bool = True):
    """Generator face of the streaming decode: yields decompressed chunks
    (bounded memory for store/lz4; zstd currently frames-buffered)."""
    stream = init_stream()
    stream.avail_in = chunk_size
    stream.avail_out = max(chunk_size, 1)
    if entry.comp_size == 0:
        if entry.uncomp_size != 0:
            raise ZPackError(Result.ERROR_FILE_SIZE_INVALID, "empty data, nonzero size")
        return
    more = True
    while more:
        more = read_file_stream(reader, entry, stream, verify)
        if stream.next_out:
            yield bytes(stream.next_out)


def recommended_cstream_in_size(method: int) -> int:
    """parity: zpack_get_cstream_in_size (lib/zpack_write.c:858-874)."""
    return 128 << 10


def recommended_cstream_out_size(method: int) -> int:
    return (128 << 10) + (128 << 7)


def recommended_dstream_in_size(method: int) -> int:
    """parity: zpack_get_dstream_in_size (lib/zpack_read.c:719-737)."""
    return 128 << 10


def recommended_dstream_out_size(method: int) -> int:
    return 128 << 10
