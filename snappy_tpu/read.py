"""Streaming readers: ``FrameDecoder`` and ``FrameEncoder``.

File-object adapters over the Snappy frame format, mirroring reference
``src/read.rs``:

- ``FrameDecoder`` wraps a readable binary stream of frame-format data and
  reads as *decompressed* bytes;
- ``FrameEncoder`` wraps a readable binary stream of plain data and reads
  as *compressed* frame-format bytes (one underlying ``read`` per frame).

Corrupt input raises :class:`snappy_tpu.error.SnappyError` subclasses; a
stream truncated mid-chunk raises ``EOFError`` (the analog of the
reference's ``io::ErrorKind::UnexpectedEof``).
"""

from __future__ import annotations

import io

from . import error as err
from .engine import get_engine
from .format.constants import (
    CHUNK_HEADER_AND_CRC_SIZE,
    MAX_BLOCK_SIZE,
    MAX_COMPRESS_BLOCK_SIZE,
    STREAM_BODY,
    STREAM_IDENTIFIER,
)
from .frame import ChunkType, compress_frame

__all__ = ["FrameDecoder", "FrameEncoder"]

#: Largest single frame the reading encoder can emit: stream identifier +
#: chunk header + maximally-expanded block (reference ``src/read.rs:33-35``).
MAX_READ_FRAME_ENCODER_BLOCK_SIZE = (
    len(STREAM_IDENTIFIER) + CHUNK_HEADER_AND_CRC_SIZE + MAX_COMPRESS_BLOCK_SIZE
)


def _read_exact(r, n: int) -> bytes:
    """Read exactly n bytes or raise EOFError (unexpected EOF)."""
    buf = bytearray()
    while len(buf) < n:
        chunk = r.read(n - len(buf))
        if not chunk:
            raise EOFError("snappy: unexpected EOF while reading frame chunk")
        buf += chunk
    return bytes(buf)


def _read_exact_eof(r, n: int) -> bytes | None:
    """Like _read_exact, but returns None on a clean EOF at the first byte."""
    first = r.read(n)
    if not first:
        return None
    if len(first) == n:
        return first
    return first + _read_exact(r, n - len(first))


class FrameDecoder(io.RawIOBase):
    """Reads a Snappy frame stream as decompressed bytes.

    Chunk handling follows the framing spec exactly (reference
    ``src/read.rs:105-238``): the stream identifier must come first and may
    recur (concatenated files), reserved chunk types 0x02-0x7F are errors,
    0x80-0xFD and padding are skipped, and every data chunk's masked CRC32C
    is verified against the decompressed payload.
    """

    def __init__(self, reader, engine: str = "auto"):
        super().__init__()
        self._r = reader
        self._engine = get_engine(engine)
        self._dst = b""
        self._dsts = 0
        self._read_stream_ident = False

    def get_ref(self):
        return self._r

    def into_inner(self):
        return self._r

    def __repr__(self) -> str:
        # Deliberately redacts the internal buffer, like the reference's
        # hand-written Debug impls (src/read.rs:241-254).
        return (
            f"FrameDecoder(r={self._r!r}, dst=[...], dsts={self._dsts}, "
            f"dste={len(self._dst)}, read_stream_ident={self._read_stream_ident})"
        )

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        data = self.read(len(memoryview(b)))
        n = len(data)
        memoryview(b)[:n] = data
        return n

    def read(self, size: int = -1) -> bytes:
        if size is None or size < 0:
            # Device and native engines slurp and decode the whole
            # remaining stream chunk-parallel (one batched launch / a
            # multithreaded native call) when nothing has been consumed.
            if (
                self._engine.name in ("native", "device", "device-fast")
                and not self._read_stream_ident
                and not self._dst
            ):
                rest = bytearray()
                while True:
                    piece = self._r.read(1 << 20)
                    if not piece:
                        break
                    rest += piece
                self._read_stream_ident = True
                if self._engine.name == "native":
                    from . import native

                    return native.frame_decompress(bytes(rest))
                from .ops import api as device_api

                return device_api.decompress_frame(bytes(rest))
            out = bytearray()
            while True:
                chunk = self.read(io.DEFAULT_BUFFER_SIZE)
                if not chunk:
                    return bytes(out)
                out += chunk
        while True:
            if self._dsts < len(self._dst):
                n = min(len(self._dst) - self._dsts, size)
                out = self._dst[self._dsts : self._dsts + n]
                self._dsts += n
                return out
            if not self._fill():
                return b""

    def _fill(self) -> bool:
        """Decode chunks until one yields data; False on clean EOF."""
        while True:
            header = _read_exact_eof(self._r, 4)
            if header is None:
                return False
            ty = ChunkType.from_u8(header[0])
            if not self._read_stream_ident:
                if ty is not ChunkType.Stream:
                    raise err.StreamHeader(byte=header[0])
                self._read_stream_ident = True
            length = header[1] | (header[2] << 8) | (header[3] << 16)
            if length > MAX_COMPRESS_BLOCK_SIZE:
                raise err.UnsupportedChunkLength(len=length, header=False)

            if not isinstance(ty, ChunkType):  # reserved chunk type
                if 0x02 <= ty <= 0x7F:
                    raise err.UnsupportedChunkType(byte=ty)
                # 0x80-0xFD: reserved but skippable.
                _read_exact(self._r, length)
                continue
            if ty is ChunkType.Padding:
                _read_exact(self._r, length)
                continue
            if ty is ChunkType.Stream:
                if length != len(STREAM_BODY):
                    raise err.UnsupportedChunkLength(len=length, header=True)
                body = _read_exact(self._r, length)
                if body != STREAM_BODY:
                    raise err.StreamHeaderMismatch(bytes=body)
                continue
            if ty is ChunkType.Uncompressed:
                if length < 4:
                    raise err.UnsupportedChunkLength(len=length, header=False)
                payload = _read_exact(self._r, length)
                expected_sum = int.from_bytes(payload[:4], "little")
                data = payload[4:]
                if len(data) > MAX_BLOCK_SIZE:
                    raise err.UnsupportedChunkLength(len=len(data), header=False)
                got_sum = self._engine.crc32c_masked(data)
                if expected_sum != got_sum:
                    raise err.Checksum(expected=expected_sum, got=got_sum)
                self._dst = data
                self._dsts = 0
                return True
            # Compressed chunk.
            if length < 4:
                raise err.UnsupportedChunkLength(len=length, header=False)
            payload = _read_exact(self._r, length)
            expected_sum = int.from_bytes(payload[:4], "little")
            comp = payload[4:]
            declen = self._engine.decompress_len(comp)
            if declen > MAX_BLOCK_SIZE:
                raise err.UnsupportedChunkLength(len=declen, header=False)
            data = self._engine.decompress(comp)
            got_sum = self._engine.crc32c_masked(data)
            if expected_sum != got_sum:
                raise err.Checksum(expected=expected_sum, got=got_sum)
            self._dst = data
            self._dsts = 0
            return True


class FrameEncoder(io.RawIOBase):
    """Reads plain data from ``reader`` as compressed frame-format bytes.

    Makes exactly one underlying ``read`` per emitted frame (reference
    ``src/read.rs:365-409``), so short reads from the source produce
    smaller (still valid) frames.
    """

    def __init__(self, reader, engine: str = "auto"):
        super().__init__()
        self._r = reader
        self._engine = get_engine(engine)
        self._dst = b""
        self._dsts = 0
        self._wrote_stream_ident = False

    def get_ref(self):
        return self._r

    def __repr__(self) -> str:
        # Buffer-redacting repr (reference src/read.rs:412-434).
        return (
            f"FrameEncoder(inner=Inner(r={self._r!r}, dst=[...], "
            f"wrote_stream_ident={self._wrote_stream_ident}), "
            f"dsts={self._dsts}, dste={len(self._dst)})"
        )

    def readable(self) -> bool:
        return True

    def read(self, size: int = -1) -> bytes:
        if size is None or size < 0:
            out = bytearray()
            while True:
                chunk = self.read(io.DEFAULT_BUFFER_SIZE)
                if not chunk:
                    return bytes(out)
                out += chunk
        while True:
            if self._dsts < len(self._dst):
                n = min(len(self._dst) - self._dsts, size)
                out = self._dst[self._dsts : self._dsts + n]
                self._dsts += n
                return out
            frame = self._read_frame()
            if frame is None:
                return b""
            self._dst = frame
            self._dsts = 0

    def readinto(self, b) -> int:
        data = self.read(len(memoryview(b)))
        n = len(data)
        memoryview(b)[:n] = data
        return n

    def _read_frame(self) -> bytes | None:
        src = self._r.read(MAX_BLOCK_SIZE)
        if not src:
            return None
        parts = []
        if not self._wrote_stream_ident:
            parts.append(STREAM_IDENTIFIER)
            self._wrote_stream_ident = True
        header, payload = compress_frame(self._engine, src)
        parts.append(header)
        parts.append(payload)
        return b"".join(parts)
