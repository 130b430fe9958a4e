"""Fast parallel device compression (valid Snappy, not bit-identical).

The bit-exact automaton (``ops/encode.py``) must replay the reference's
greedy hash-probe sequence and is therefore serial per block — the wrong
shape for a vector machine. This module is the throughput encoder: a
different match-finding algorithm producing *valid* raw Snappy whose
size is <= the reference encoder's on real data (verified per corpus
file in tests), built from dense vector primitives only:

1. **Previous-occurrence candidates.** Instead of a lossy 16 Ki hash
   table probed serially (``src/compress.rs:195-317``), every position's
   candidate is its nearest previous occurrence of the same 4-gram,
   computed for all 64 Ki positions at once with one stable sort by
   (4-gram, position) — strictly stronger candidates than the
   reference's (no collisions, no skip heuristic losses).
2. **Match lengths.** Each position extends against its candidate in
   4-byte vector compares up to a 256-byte cap; the serializer peels
   long ops into 64-byte copy tags exactly like the reference
   (``src/compress.rs:323-357``), and runs longer than the cap continue
   as follow-on matches at the same 3-bytes-per-64 cost.
3. **Greedy parse by pointer doubling.** ``next[p] = p + (L(p) if
   eligible else 1)``; the op boundaries are the orbit of 0 (the same
   log-depth recurrence the decoder uses), then single-byte literal
   positions are coalesced into runs and ops are compacted by a prefix
   sum.

Serialization reuses the exact-mode vectorized serializer
(``ops/encode.py:serialize_ops``): the op record format is shared.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import MIN_NON_LITERAL_BLOCK_SIZE
from .encode import MAX_OPS, S, serialize_ops

_MAX_COPY = 256  # per-op match cap; the serializer peels 64-byte copy tags
_NCHUNK = _MAX_COPY // 4


def _u32_at(blocks):
    b = blocks.astype(jnp.uint32)
    z = jnp.zeros((b.shape[0], _MAX_COPY + 11), jnp.uint32)
    bp = jnp.concatenate([b, z], axis=1)
    n = S + _MAX_COPY + 8
    return (
        bp[:, 0:n]
        | (bp[:, 1 : n + 1] << np.uint32(8))
        | (bp[:, 2 : n + 2] << np.uint32(16))
        | (bp[:, 3 : n + 3] << np.uint32(24))
    )


def _tz_bytes(x):
    return jnp.where(
        x & np.uint32(0xFF) != 0,
        0,
        jnp.where(
            x & np.uint32(0xFFFF) != 0,
            1,
            jnp.where(x & np.uint32(0xFFFFFF) != 0, 2, jnp.where(x != 0, 3, 4)),
        ),
    ).astype(jnp.int32)


def _prev_occurrence(u32, n):
    """(B, S) index of the nearest previous position with the same 4-gram
    (-1 if none). Positions past ``n - 4`` are ineligible."""
    bsz = u32.shape[0]
    p = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = p <= (n[:, None] - 4)
    # Invalid (tail/padding) positions share one sentinel key; they sort
    # after any valid position with the same gram (larger index), so a
    # valid position can never pick an invalid candidate, and invalid
    # positions' own candidates are masked out below.
    key = jnp.where(valid, u32[:, :S], np.uint32(0xFFFFFFFF))
    idx = jnp.broadcast_to(p, (bsz, S)).astype(jnp.int32)
    # Position is an explicit secondary sort key: correctness must not
    # depend on backend sort stability (TPU sorts are not stable).
    skey, sidx = jax.lax.sort((key, idx), dimension=1, num_keys=2)
    same = jnp.concatenate(
        [jnp.zeros((bsz, 1), bool), skey[:, 1:] == skey[:, :-1]], axis=1
    )
    cand = jnp.concatenate([jnp.full((bsz, 1), -1, jnp.int32), sidx[:, :-1]], axis=1)
    cand = jnp.where(same, cand, -1)
    prev = jnp.zeros((bsz, S), jnp.int32)
    prev = jax.vmap(lambda pr, si, ca: pr.at[si].set(ca))(prev, sidx, cand)
    valid_prev = (prev >= 0) & valid
    return jnp.where(valid_prev, prev, -1)


def _match_lengths(u32, prev, n):
    """Match length (0, or 4.._MAX_COPY) of each position vs its candidate.

    The extension loop is data-adaptive: each round compares one 4-byte
    chunk for every still-matching lane and exits as soon as no lane
    anywhere in the batch is alive — typical text converges in ~6-16
    rounds instead of the fixed ``_NCHUNK`` (64) worst case (the cap
    only binds on long runs, e.g. zero blocks). Candidate-less lanes
    start dead, so incompressible data pays almost nothing.
    """
    p = jnp.arange(S, dtype=jnp.int32)[None, :]
    bsz = u32.shape[0]
    q = jnp.maximum(prev, 0)

    def chunk(base, off):
        idx = jnp.clip(base + off, 0, u32.shape[1] - 1)
        return jnp.take_along_axis(u32, idx, axis=1)

    def body(st):
        length, alive, i = st
        x = chunk(p, 4 * i) ^ chunk(q, 4 * i)
        eq = x == 0
        length = length + jnp.where(alive, jnp.where(eq, 4, _tz_bytes(x)), 0)
        return length, alive & eq, i + 1

    def cond(st):
        _, alive, i = st
        return (i < _NCHUNK) & jnp.any(alive)

    length, _, _ = jax.lax.while_loop(
        cond,
        body,
        (jnp.zeros((bsz, S), jnp.int32), prev >= 0, jnp.int32(0)),
    )
    length = jnp.minimum(length, n[:, None] - p)
    has = (prev >= 0) & (length >= 4)
    return jnp.where(has, length, 0)


def _orbit(next_, n_rounds):
    """Mark the orbit of position 0 under ``next`` (arrays (B, S+1))."""
    jump = next_
    mark = jnp.zeros(next_.shape, jnp.int8).at[:, 0].set(1)

    def body(st):
        mark, jump, _, r = st
        mark = jax.vmap(lambda m, j: m.at[j].max(m, mode="drop"))(mark, jump)
        jump2 = jnp.take_along_axis(jump, jump, axis=1)
        return mark, jump2, jnp.all(jump2 == jump), r + 1

    def cond(st):
        return (~st[2]) & (st[3] < n_rounds)

    mark, _, _, _ = jax.lax.while_loop(
        cond, body, (mark, jump, jnp.bool_(False), jnp.int32(0))
    )
    return mark == 1


@jax.jit
def compress_blocks_fast(blocks, lengths):
    """Fast-parse compress of a ``(B, 65536)`` block batch.

    Returns ``(out (B, OUT_W) uint8, out_len (B,) int32)``: valid raw
    Snappy per block (round-trips bit-exactly through any conforming
    decoder), typically a hair *smaller* than the reference's output.
    """
    bsz = blocks.shape[0]
    n = lengths.astype(jnp.int32)
    p = jnp.arange(S, dtype=jnp.int32)[None, :]

    u32 = _u32_at(blocks)
    prev = _prev_occurrence(u32, n)
    length = _match_lengths(u32, prev, n)

    # Tiny blocks are a single literal (mirrors the reference's bailout,
    # src/compress.rs:139-146; also keeps the n<4 edge out of the parse).
    tiny = n < MIN_NON_LITERAL_BLOCK_SIZE
    length = jnp.where(tiny[:, None], 0, length)

    # One-step lazy matching: defer a match when the next position matches
    # longer (the classic greedy refinement; the reference's skip
    # heuristic plays a similar role by accident of its probe schedule).
    nxt_len = jnp.concatenate(
        [length[:, 1:], jnp.zeros((bsz, 1), length.dtype)], axis=1
    )
    # Cost model: an isolated 4-byte copy2 (3 tag bytes + an extra literal
    # header to resume the run) is a net loss inside literal runs — skip
    # it unless another match starts right after the copied bytes.
    offs = p - jnp.maximum(prev, 0)
    len_p4 = jnp.concatenate([length[:, 4:], jnp.zeros((bsz, 4), length.dtype)], axis=1)
    isolated = (length == 4) & (offs > 2047) & (len_p4 < 4)
    eligible = (length >= 4) & ~isolated & ~(nxt_len > length)
    live = p < n[:, None]
    step = jnp.where(eligible, length, 1)
    nxt = jnp.where(live, jnp.minimum(p + step, S), p)
    nxt = jnp.concatenate([nxt, jnp.full((bsz, 1), S, jnp.int32)], axis=1)

    mark = _orbit(nxt, max(1, (S - 1).bit_length()))[:, :S] & live

    is_copy = mark & eligible
    is_lit = mark & ~eligible
    prev_lit = jnp.concatenate([jnp.zeros((bsz, 1), bool), is_lit[:, :-1]], axis=1)
    lit_start = is_lit & ~prev_lit

    # Literal run end: the next copy start at/after p (else n).
    copy_pos = jnp.where(is_copy, p, jnp.int32(S))
    nxt_copy = jax.lax.cummin(copy_pos[:, ::-1], axis=1)[:, ::-1]
    run_end = jnp.minimum(nxt_copy, n[:, None])

    record = is_copy | lit_start
    opnum = jnp.cumsum(record.astype(jnp.int32), axis=1) - record.astype(jnp.int32)
    nops = jnp.sum(record.astype(jnp.int32), axis=1)

    kind_v = jnp.where(is_copy, 1, 0)
    a_v = jnp.where(is_copy, p - prev, p)
    b_v = jnp.where(is_copy, length, run_end)

    tgt = jnp.where(record, jnp.minimum(opnum, MAX_OPS - 1), jnp.int32(MAX_OPS))

    def scat_ops(vals):
        buf = jnp.zeros((bsz, MAX_OPS + 1), jnp.int32)
        buf = jax.vmap(lambda bu, t, v: bu.at[t].set(v, mode="drop"))(buf, tgt, vals)
        return buf[:, :MAX_OPS]

    op_kind = scat_ops(kind_v)
    op_a = scat_ops(a_v)
    op_b = scat_ops(b_v)
    return serialize_ops(blocks, op_kind, op_a, op_b, nops)


def compress_blocks_fast_host(blocks: np.ndarray, lengths: np.ndarray):
    out, out_len = compress_blocks_fast(jnp.asarray(blocks), jnp.asarray(lengths))
    return np.asarray(out), np.asarray(out_len)
