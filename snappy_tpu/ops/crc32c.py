"""Device CRC32C (Castagnoli) as one MXU matmul, batched.

The reference computes CRC32C byte-serially with lookup tables or SSE4.2
instructions (``src/crc32.rs``) — a chain of 64 Ki dependent steps per
block. On TPU the whole computation collapses into dense linear algebra,
because a CRC register is an affine-linear function of the message over
GF(2):

    register(init, msg) = M_S(init)  ^  XOR_i  M_{S-1-i}(T[msg_i])

where ``M_d`` advances a register past ``d`` zero bytes and ``T`` is the
(linear) single-byte table. Precomputing the 32-bit contribution of
every *bit position* of the block gives a constant ``(S*8, 32)`` 0/1
matrix ``W``; then for a whole batch:

    crc_bits = ( bits(blocks) @ W ) mod 2

one int8 x int8 -> int32 contraction on the systolic array — exact
integer arithmetic, ~34 MFLOP per 64 KiB block, no tables, no gathers,
no sequential dependency. Rows are zero-padded to the static width
``S``; the padding is retracted algebraically with ``M^{-Z}`` looked up
from two 256-entry operator tables (one tiny gather + xor-reduce), so a
single compiled kernel serves every row length.

Masking matches reference ``src/crc32.rs:35-38``.
"""

from __future__ import annotations

import functools

import numpy as np

from ..format.constants import CASTAGNOLI_POLY, CRC_MASK_DELTA

_POLY = CASTAGNOLI_POLY
_LOG2_MAX = 32  # operators cover shifts up to 2**32 bytes


# ---------------------------------------------------------------------------
# GF(2) operator algebra (host-side precompute)
# ---------------------------------------------------------------------------


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
    because bit 31 of P is set while bit 31 of ``r >> 1`` is clear: bit
    31 of r' records whether P was folded in.
    """
    cols = []
    for j in range(32):
        r = 1 << j
        for _ in range(8):
            b = (r >> 31) & 1
            r = (((r ^ (_POLY * b)) << 1) | b) & 0xFFFFFFFF
        cols.append(r)
    return cols


def _apply_int(cols, v: int) -> int:
    acc = 0
    for j in range(32):
        if (v >> j) & 1:
            acc ^= cols[j]
    return acc


def _apply_np(cols, v: np.ndarray) -> np.ndarray:
    """Vectorized GF(2) matrix application over a uint32 array."""
    acc = np.zeros_like(v)
    for j in range(32):
        acc ^= np.where((v >> np.uint32(j)) & 1, np.uint32(cols[j]), np.uint32(0))
    return acc


def _compose(a, b):
    """Columns of a∘b (apply b, then a)."""
    return [_apply_int(a, bj) for bj in b]


_IDENTITY = [1 << j for j in range(32)]


def _power(cols, n: int):
    """Columns of ``cols``^n via binary decomposition."""
    acc = _IDENTITY
    sq = list(cols)
    while n:
        if n & 1:
            acc = _compose(sq, acc)
        sq = _compose(sq, sq) if n > 1 else sq
        n >>= 1
    return acc


@functools.lru_cache(maxsize=None)
def shift_operators() -> tuple[tuple[int, ...], ...]:
    """``ops[k]`` = columns of M_{2^k}: advance a CRC past 2^k zero bytes."""
    ops = [_byte_step_cols()]
    for _ in range(_LOG2_MAX - 1):
        ops.append(_compose(ops[-1], ops[-1]))
    return tuple(tuple(o) for o in ops)


@functools.lru_cache(maxsize=None)
def _unshift_tables(max_z: int) -> tuple[np.ndarray, np.ndarray]:
    """Two-level M^{-Z} tables: T1[z&255], T2[z>>8] with Z <= max_z."""
    m1 = _byte_unstep_cols()
    t1 = [_IDENTITY]
    for _ in range(255):
        t1.append(_compose(m1, t1[-1]))
    m256 = _power(m1, 256)
    hi = max_z // 256 + 1
    t2 = [_IDENTITY]
    for _ in range(hi):
        t2.append(_compose(m256, t2[-1]))
    return np.asarray(t1, dtype=np.uint32), np.asarray(t2, dtype=np.uint32)


@functools.lru_cache(maxsize=None)
def _contribution_matrix(s: int) -> tuple[np.ndarray, int]:
    """``(W (s*8, 32) int8, r0)``: positional bit contributions + M_s(FF).

    ``W[i*8 + k, j]`` is bit j of the register contribution of bit k of
    the byte at position i in an s-byte message (zero init); ``r0`` is
    the contribution of the 0xFFFFFFFF init conditioning.
    """
    from ..format.tables import crc32c_table

    t = crc32c_table().astype(np.uint32)
    base = np.array([t[1 << k] for k in range(8)], dtype=np.uint32)  # (8,)
    m1 = _byte_step_cols()

    # First 256 distance vectors sequentially, then vectorized M_256
    # jumps per 256-distance stride.
    head = min(s, 256)
    d0 = np.zeros((head, 8), dtype=np.uint32)
    cur = base.copy()
    for d in range(head):
        d0[d] = cur
        cur = _apply_np(m1, cur)

    v = np.zeros((s, 8), dtype=np.uint32)  # v[i] = contribution at byte i
    m256 = _power(m1, 256)
    blk = d0
    for lo in range(0, s, 256):  # distances [lo, lo + 256)
        rows = s - 1 - (lo + np.arange(blk.shape[0]))
        v[rows] = blk
        if lo + 256 < s:
            blk = _apply_np(m256, blk)

    bits = (v[:, :, None] >> np.uint32(np.arange(32))) & np.uint32(1)
    w = bits.astype(np.int8).reshape(s * 8, 32)
    r0 = _apply_int(_power(m1, s), 0xFFFFFFFF)
    return w, r0


def _xor_reduce(terms, dims):
    import jax

    return jax.lax.reduce(terms, np.uint32(0), jax.lax.bitwise_xor, dims)


def _apply_gathered(table: np.ndarray, idx, v):
    """Apply a per-lane operator looked up from ``table[idx]``."""
    import jax.numpy as jnp

    cols = jnp.asarray(table)[idx]  # (..., 32)
    bits = (v[..., None] >> np.uint32(np.arange(32))) & np.uint32(1)
    terms = jnp.where(bits != 0, cols, np.uint32(0))
    return _xor_reduce(terms, (terms.ndim - 1,))


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------


def crc32c_blocks(blocks, lengths):
    """Unmasked CRC32C of each row of ``blocks`` up to ``lengths``.

    ``blocks``: ``(B, S)`` uint8, zero-padded past each row's length, S a
    power of two in [4, 65536]; ``lengths``: ``(B,)`` int32. Returns
    ``(B,)`` uint32. Jit/vmap/shard_map friendly (static shapes, no host
    sync).
    """
    import jax
    import jax.numpy as jnp

    s = blocks.shape[-1]
    if s < 4 or s > 65536 or (s & (s - 1)) != 0:
        raise ValueError(f"row width must be a power of two in [4, 65536], got {s}")
    w, r0 = _contribution_matrix(s)

    # bits: (B, S*8) int8; counts = bits @ W is exact in int32.
    b = blocks.astype(jnp.uint8)
    bits = ((b[..., None] >> np.uint8(np.arange(8))) & np.uint8(1)).astype(jnp.int8)
    bits = bits.reshape(bits.shape[:-2] + (s * 8,))
    counts = jax.lax.dot_general(
        bits,
        jnp.asarray(w),
        (((bits.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (B, 32)
    reg_bits = (counts & 1).astype(jnp.uint32)
    reg = _xor_reduce(reg_bits << np.uint32(np.arange(32)), (reg_bits.ndim - 1,))
    reg = reg ^ np.uint32(r0)
    c = reg ^ np.uint32(0xFFFFFFFF)

    # Retract the zero padding: crc(m) = M^{-Z}(crc(m || 0^Z) ^ FF) ^ FF
    # on the raw register (undo/redo the final xor around the linear map).
    ff = np.uint32(0xFFFFFFFF)
    z = (np.int32(s) - lengths).astype(jnp.int32)
    t1, t2 = _unshift_tables(s)
    r = c ^ ff
    r = _apply_gathered(t1, z & 0xFF, r)
    r = _apply_gathered(t2, z >> 8, r)
    return r ^ ff


def crc32c_masked_blocks(blocks, lengths):
    """Masked CRC32C per row, as stored in frame chunk headers."""
    c = crc32c_blocks(blocks, lengths)
    return ((c >> np.uint32(15)) | (c << np.uint32(17))) + np.uint32(CRC_MASK_DELTA)
