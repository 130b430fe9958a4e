"""Frame-format core: chunk taxonomy and single-chunk construction.

Mirrors reference ``src/frame.rs``: each chunk carries the masked CRC32C of
its *uncompressed* payload, and compression is abandoned for a chunk when it
saves less than 12.5%.
"""

from __future__ import annotations

import enum

from .engine import HostEngine
from .format.constants import (
    CHUNK_HEADER_AND_CRC_SIZE,
    CHUNK_TYPE_COMPRESSED,
    CHUNK_TYPE_PADDING,
    CHUNK_TYPE_STREAM,
    CHUNK_TYPE_UNCOMPRESSED,
    MAX_BLOCK_SIZE,
    MAX_COMPRESS_BLOCK_SIZE,
    STREAM_BODY,
    STREAM_IDENTIFIER,
)

__all__ = [
    "ChunkType",
    "compress_frame",
    "STREAM_IDENTIFIER",
    "STREAM_BODY",
    "CHUNK_HEADER_AND_CRC_SIZE",
    "MAX_COMPRESS_BLOCK_SIZE",
]


class ChunkType(enum.IntEnum):
    Stream = CHUNK_TYPE_STREAM
    Compressed = CHUNK_TYPE_COMPRESSED
    Uncompressed = CHUNK_TYPE_UNCOMPRESSED
    Padding = CHUNK_TYPE_PADDING

    @staticmethod
    def from_u8(b: int):
        """Returns a ChunkType, or the raw byte for reserved types."""
        try:
            return ChunkType(b)
        except ValueError:
            return b


def compress_frame(engine: HostEngine, src: bytes) -> tuple[bytes, bytes]:
    """Build one frame chunk for ``src`` (<= MAX_BLOCK_SIZE bytes).

    Returns ``(chunk_header, payload)`` where ``chunk_header`` is the 8-byte
    {type, u24 length, u32 masked CRC} prefix and ``payload`` is either the
    compressed bytes or ``src`` itself when compression saved < 1/8.
    """
    assert len(src) <= MAX_BLOCK_SIZE
    checksum = engine.crc32c_masked(src)
    compressed = engine.compress(src)
    if len(compressed) >= len(src) - (len(src) // 8):
        chunk_type, payload = ChunkType.Uncompressed, src
    else:
        chunk_type, payload = ChunkType.Compressed, compressed
    chunk_len = 4 + len(payload)
    header = bytes(
        (
            int(chunk_type),
            chunk_len & 0xFF,
            (chunk_len >> 8) & 0xFF,
            (chunk_len >> 16) & 0xFF,
            checksum & 0xFF,
            (checksum >> 8) & 0xFF,
            (checksum >> 16) & 0xFF,
            (checksum >> 24) & 0xFF,
        )
    )
    return header, payload
