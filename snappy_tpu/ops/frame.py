"""Device frame-chunk pipeline: compress + CRC + chunk framing, fused.

Mirrors ``compress_frame`` (reference ``src/frame.rs:62-104``) as one
batched device computation: every 64 KiB frame chunk is a lane; the
masked CRC of the *uncompressed* bytes, the raw compression, the
"compression must save >= 1/8" fallback decision, and the 8-byte chunk
header are all computed on device, emitting finished wire bytes per
chunk. The host's only job is the ordered concat of row prefixes (and
the one-time stream identifier).

This is the flagship end-to-end step: bytes in, framed stream out, one
jit, shardable over the chunk axis with zero cross-lane communication.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import (
    CHUNK_TYPE_COMPRESSED,
    CHUNK_TYPE_UNCOMPRESSED,
    MAX_BLOCK_SIZE,
)
from .crc32c import crc32c_masked_blocks
from .encode import OUT_W, compress_blocks

#: Row width of an emitted frame chunk: 8-byte header + worst-case
#: payload (3-byte varint + OUT_W), 16-aligned.
CHUNK_W = 8 + 3 + OUT_W + 5


def _varint_u17(n):
    """LE base-128 varint of a length <= 65536: (3 bytes, true length)."""
    b0 = (n & 0x7F) | jnp.where(n >= 0x80, 0x80, 0)
    b1 = ((n >> 7) & 0x7F) | jnp.where(n >= 0x4000, 0x80, 0)
    b2 = (n >> 14) & 0x7F
    vlen = jnp.where(n >= 0x4000, 3, jnp.where(n >= 0x80, 2, 1))
    return jnp.stack([b0, b1, b2], axis=-1), vlen


@partial(jax.jit, static_argnames=("fast",))
def encode_frame_chunks(chunks, lengths, fast: bool = False):
    """Frame-encode a batch of uncompressed chunks into wire bytes.

    ``chunks``: ``(B, 65536)`` uint8 zero-padded; ``lengths``: ``(B,)``.
    Returns ``(rows (B, CHUNK_W) uint8, row_len (B,) int32)`` where each
    row's valid prefix is one complete frame chunk (header included).
    ``fast=True`` swaps in the parallel-parse compressor (valid frames,
    not byte-identical to the reference's).
    """
    bsz = chunks.shape[0]
    lengths = lengths.astype(jnp.int32)

    crc = crc32c_masked_blocks(chunks, lengths)  # CRC of uncompressed bytes
    if fast:
        from .encode_fast import compress_blocks_fast

        comp, comp_len = compress_blocks_fast(chunks, lengths)
    else:
        comp, comp_len = compress_blocks(chunks, lengths)
    vbytes, vlen = _varint_u17(lengths)
    payload_comp = vlen + comp_len

    # Fallback to an Uncompressed chunk unless compression saves >= 12.5%
    # (reference src/frame.rs:83-89).
    use_comp = payload_comp < lengths - (lengths // 8)
    payload_len = jnp.where(use_comp, payload_comp, lengths)
    chunk_type = jnp.where(use_comp, CHUNK_TYPE_COMPRESSED, CHUNK_TYPE_UNCOMPRESSED)
    body_len = payload_len + 4  # includes the CRC

    p = jnp.arange(CHUNK_W, dtype=jnp.int32)[None, :]
    hdr = jnp.concatenate(
        [
            chunk_type[:, None],
            (body_len & 0xFF)[:, None],
            ((body_len >> 8) & 0xFF)[:, None],
            ((body_len >> 16) & 0xFF)[:, None],
            (crc & np.uint32(0xFF)).astype(jnp.int32)[:, None],
            ((crc >> np.uint32(8)) & np.uint32(0xFF)).astype(jnp.int32)[:, None],
            ((crc >> np.uint32(16)) & np.uint32(0xFF)).astype(jnp.int32)[:, None],
            ((crc >> np.uint32(24)) & np.uint32(0xFF)).astype(jnp.int32)[:, None],
        ],
        axis=1,
    )

    rel = p - 8
    # Compressed payload byte at rel: varint (rel < vlen) then comp bytes.
    vb = jnp.take_along_axis(vbytes, jnp.clip(rel, 0, 2), axis=1)
    cb = jnp.take_along_axis(
        comp.astype(jnp.int32), jnp.clip(rel - vlen[:, None], 0, OUT_W - 1), axis=1
    )
    comp_byte = jnp.where(rel < vlen[:, None], vb, cb)
    raw_byte = jnp.take_along_axis(
        chunks.astype(jnp.int32), jnp.clip(rel, 0, MAX_BLOCK_SIZE - 1), axis=1
    )
    payload = jnp.where(use_comp[:, None], comp_byte, raw_byte)

    row_len = 8 + payload_len  # type+len3+crc4, then the payload
    byte = jnp.where(p < 8, jnp.take_along_axis(hdr, jnp.clip(p, 0, 7), axis=1), payload)
    byte = jnp.where(p < row_len[:, None], byte, 0)
    return byte.astype(jnp.uint8), row_len
