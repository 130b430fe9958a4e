"""Device CRC32C (Castagnoli): table-free, batched, log-depth.

The reference computes CRC32C byte-serially with lookup tables or SSE4.2
instructions (``src/crc32.rs``). Serial table walks are hostile to a vector
machine, so this is a different algorithm with the same answer, built on
CRC linearity over GF(2):

1. **Leaf**: the conditioned CRC of every aligned 4-byte word is computed
   in parallel with 32 branch-free shift/xor steps (pure VPU work, no
   tables, no gathers).
2. **Combine tree**: ``crc(A || B) = M_{len(B)} . crc(A) ^ crc(B)`` where
   ``M_L`` is the GF(2) matrix advancing a CRC register past ``L`` zero
   bytes. Chunk CRCs are reduced pairwise in ``log2(S)`` rounds; each
   round applies one constant 32x32 bit-matrix (32 select+xor vector ops).
3. **Length fixup**: rows are zero-padded to the static width ``S``;
   padding is removed algebraically by applying inverse zero-byte
   operators selected by the bits of the pad length, so one compiled
   kernel serves every row length.

Masking matches reference ``src/crc32.rs:35-38``.
"""

from __future__ import annotations

import functools

import numpy as np

from ..format.constants import CASTAGNOLI_POLY, CRC_MASK_DELTA

_POLY = CASTAGNOLI_POLY
_LOG2_MAX = 32  # operators cover shifts up to 2**32 bytes


def _byte_step_cols() -> list[int]:
    """Columns of M_1: the register map for one zero byte."""
    cols = []
    for j in range(32):
        r = 1 << j
        for _ in range(8):
            r = (r >> 1) ^ (_POLY if (r & 1) else 0)
        cols.append(r)
    return cols


def _byte_unstep_cols() -> list[int]:
    """Columns of M_1^-1 (exact inverse of the zero-byte register map).

    The bit step ``r' = (r >> 1) ^ (P if r & 1 else 0)`` is invertible
    because bit 31 of P is set while bit 31 of ``r >> 1`` is clear: bit 31
    of r' records whether P was folded in.
    """
    cols = []
    for j in range(32):
        r = 1 << j
        for _ in range(8):
            b = (r >> 31) & 1
            r = (((r ^ (_POLY * b)) << 1) | b) & 0xFFFFFFFF
        cols.append(r)
    return cols


def _apply_int(cols: list[int], v: int) -> int:
    acc = 0
    for j in range(32):
        if (v >> j) & 1:
            acc ^= cols[j]
    return acc


def _compose(a: list[int], b: list[int]) -> list[int]:
    """Columns of a∘b (apply b, then a)."""
    return [_apply_int(a, bj) for bj in b]


@functools.lru_cache(maxsize=None)
def shift_operators() -> tuple[tuple[int, ...], ...]:
    """``ops[k]`` = columns of M_{2^k}: advance a CRC past 2^k zero bytes."""
    ops = [_byte_step_cols()]
    for _ in range(_LOG2_MAX - 1):
        ops.append(_compose(ops[-1], ops[-1]))
    return tuple(tuple(o) for o in ops)


@functools.lru_cache(maxsize=None)
def unshift_operators() -> tuple[tuple[int, ...], ...]:
    """``ops[k]`` = columns of M_{2^k}^-1: retract a CRC by 2^k zero bytes."""
    ops = [_byte_unstep_cols()]
    for _ in range(_LOG2_MAX - 1):
        ops.append(_compose(ops[-1], ops[-1]))
    return tuple(tuple(o) for o in ops)


def _apply_mat(cols, v):
    """Apply a constant GF(2) matrix to a uint32 array: 32 select+xors."""
    import jax.numpy as jnp

    acc = jnp.zeros_like(v)
    one = np.uint32(1)
    for j in range(32):
        bit = (v >> np.uint32(j)) & one
        acc = acc ^ jnp.where(bit != 0, np.uint32(cols[j]), np.uint32(0))
    return acc


def _leaf_word_crc(words):
    """Conditioned CRC32C of each independent 4-byte LE word."""
    import jax.numpy as jnp

    ff = np.uint32(0xFFFFFFFF)
    r = words ^ ff
    for _ in range(32):
        r = (r >> np.uint32(1)) ^ (np.uint32(_POLY) * (r & np.uint32(1)))
    return r ^ ff


def crc32c_blocks(blocks, lengths):
    """Unmasked CRC32C of each row of ``blocks`` up to ``lengths``.

    ``blocks``: ``(..., S)`` uint8, zero-padded past each row's length;
    ``S`` must be a power of two >= 4. ``lengths``: ``(...,)`` int32.
    Returns ``(...,)`` uint32. Jit/vmap/shard_map friendly (no host
    sync, static shapes only).
    """
    import jax.numpy as jnp

    s = blocks.shape[-1]
    if s < 4 or (s & (s - 1)) != 0:
        raise ValueError(f"row width must be a power of two >= 4, got {s}")
    b = blocks.astype(jnp.uint32)
    w = b[..., 0::4] | (b[..., 1::4] << 8) | (b[..., 2::4] << 16) | (b[..., 3::4] << 24)
    c = _leaf_word_crc(w)

    shifts = shift_operators()
    width = 4
    while c.shape[-1] > 1:
        left = c[..., 0::2]
        right = c[..., 1::2]
        k = width.bit_length() - 1  # width == 2**k bytes covered by `right`
        c = _apply_mat(shifts[k], left) ^ right
        width *= 2
    c = c[..., 0]

    # Retract the zero padding: crc(m) = unshift_Z(crc(m || 0^Z)) on the
    # raw register (undo/redo the final xor around the linear part).
    ff = np.uint32(0xFFFFFFFF)
    z = (np.int32(s) - lengths).astype(jnp.uint32)
    r = c ^ ff
    unshifts = unshift_operators()
    for j in range(s.bit_length()):
        bit = (z >> np.uint32(j)) & np.uint32(1)
        r = jnp.where(bit != 0, _apply_mat(unshifts[j], r), r)
    return r ^ ff


def crc32c_masked_blocks(blocks, lengths):
    """Masked CRC32C per row, as stored in frame chunk headers."""
    import jax.numpy as jnp  # noqa: F401

    c = crc32c_blocks(blocks, lengths)
    return ((c >> np.uint32(15)) | (c << np.uint32(17))) + np.uint32(CRC_MASK_DELTA)
