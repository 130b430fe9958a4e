"""Batched bit-exact raw-block compression on device.

The reference compressor is a greedy byte-pointer automaton
(``src/compress.rs:195-317``): a hash-table probe loop with an
accelerating skip, match extension, and copy emission. Its greedy
choices (hash collisions included) determine the output bytes, and the
golden-data contract requires reproducing them exactly, so the automaton
itself cannot be reordered. What *can* be changed for a vector machine
is where the parallelism comes from:

- **Across blocks** (the throughput axis): every 64 KiB block is an
  independent lane; one ``lax.while_loop`` steps B automata in lockstep,
  all lane state batched into ``(B, ...)`` arrays. A step executes one
  probe (SCAN) or one 8-byte match-extension quantum (EXTEND) per lane.
  This replaces the reference's per-block sequential outer loop
  (``src/compress.rs:129-152``) with a batch dimension sized to fill the
  chip.
- **Within the serializer**: the automaton only records (literal, copy)
  *ops*; turning ops into bytes (tag splitting per
  ``src/compress.rs:323-357``, literal headers per
  ``src/compress.rs:432-474``) is closed-form per output byte and runs
  as a fully vectorized second phase — scatter op starts, running-max to
  find each output byte's op, then branch-free byte synthesis.

Phase 2 never sees a data-dependent loop: copy splitting (64-byte peels,
the 60-byte fixup, copy1-vs-copy2 selection) is computed arithmetically
from (offset, length).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import (
    HASH_MULTIPLIER,
    INPUT_MARGIN,
    MAX_BLOCK_SIZE,
    MIN_NON_LITERAL_BLOCK_SIZE,
    TAG_COPY1,
    TAG_COPY2,
    TAG_LITERAL,
)

S = MAX_BLOCK_SIZE
#: Worst-case ops per 64 KiB block: copies cover >= 4 bytes each, at most
#: one pending literal per copy, plus the final literal.
MAX_OPS = S // 4 + S // 4 + 4
#: Output row width: >= max_compress_len(65536) = 76490, 256-aligned.
OUT_W = 76800

_SCAN = 0
_EXTEND = 1


def _u32_at(blocks):
    """(B, S+8) little-endian u32 read at every byte position (zero padded)."""
    b = blocks.astype(jnp.uint32)
    z = jnp.zeros((b.shape[0], 11), jnp.uint32)
    bp = jnp.concatenate([b, z], axis=1)
    return (
        bp[:, 0 : S + 8]
        | (bp[:, 1 : S + 9] << np.uint32(8))
        | (bp[:, 2 : S + 10] << np.uint32(16))
        | (bp[:, 3 : S + 11] << np.uint32(24))
    )


def _gather(arr, idx):
    """Per-row gather: arr (B, N), idx (B,) -> (B,)."""
    return jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]


def _scatter(arr, idx, val, active):
    """Per-row scatter of ``val`` at ``idx`` where ``active``."""
    old = _gather(arr, idx)
    new = jnp.where(active, val, old)
    return jnp.put_along_axis(arr, idx[:, None], new[:, None], axis=1, inplace=False)


def _tz_bytes(x):
    """Trailing zero bytes of a u32 (4 if x == 0)."""
    return jnp.where(
        x & np.uint32(0xFF) != 0,
        0,
        jnp.where(
            x & np.uint32(0xFFFF) != 0,
            1,
            jnp.where(x & np.uint32(0xFFFFFF) != 0, 2, jnp.where(x != 0, 3, 4)),
        ),
    ).astype(jnp.int32)


def find_ops(blocks, lengths):
    """Phase 1: run the greedy automaton; emit op records, not bytes.

    ``blocks``: ``(B, S)`` uint8 zero-padded; ``lengths``: ``(B,)`` int32.
    Returns ``(op_kind (B, MAX_OPS) int32 {0 literal, 1 copy},
    op_a, op_b, nops)`` where a literal is src range ``[a, b)`` and a
    copy is ``(offset=a, len=b)``.
    """
    bsz = blocks.shape[0]
    u32 = _u32_at(blocks)
    n = lengths.astype(jnp.int32)
    rows = jnp.arange(bsz, dtype=jnp.int32)

    # Hash shift per lane (table sizing, src/compress.rs:491-518).
    nm1 = jnp.maximum(n - 1, 1).astype(jnp.uint32)
    ceil_log2 = jnp.int32(32) - jax.lax.clz(nm1)  # ceil(log2(n)) for n >= 2
    table_bits = jnp.clip(ceil_log2, 8, 14)
    shift = (jnp.int32(32) - table_bits).astype(jnp.uint32)

    def hash_(x):
        return ((x * np.uint32(HASH_MULTIPLIER)) >> shift).astype(jnp.int32)

    def u32at(idx):
        return _gather(u32, jnp.clip(idx, 0, S + 7))

    small = n < MIN_NON_LITERAL_BLOCK_SIZE
    s_limit = n - INPUT_MARGIN

    state = dict(
        mode=jnp.full((bsz,), _SCAN, jnp.int32),
        done=small | (n == 0),
        s=jnp.ones((bsz,), jnp.int32),
        s_next=jnp.ones((bsz,), jnp.int32),
        skip=jnp.full((bsz,), 32, jnp.int32),
        next_emit=jnp.zeros((bsz,), jnp.int32),
        next_hash=hash_(u32at(jnp.ones((bsz,), jnp.int32))),
        candidate=jnp.zeros((bsz,), jnp.int32),
        base=jnp.zeros((bsz,), jnp.int32),
        ext_s=jnp.zeros((bsz,), jnp.int32),
        ext_cand=jnp.zeros((bsz,), jnp.int32),
        nops=jnp.zeros((bsz,), jnp.int32),
        overflow=jnp.zeros((bsz,), bool),
        table=jnp.zeros((bsz, 1 << 14), jnp.int32),
        op_kind=jnp.zeros((bsz, MAX_OPS), jnp.int32),
        op_a=jnp.zeros((bsz, MAX_OPS), jnp.int32),
        op_b=jnp.zeros((bsz, MAX_OPS), jnp.int32),
    )
    # Small blocks are one literal op (src/compress.rs:139-146).
    emit_small = small & (n > 0)
    state["op_kind"] = _scatter(state["op_kind"], jnp.zeros_like(rows), 0, emit_small)
    state["op_a"] = _scatter(state["op_a"], jnp.zeros_like(rows), 0, emit_small)
    state["op_b"] = _scatter(state["op_b"], jnp.zeros_like(rows), n, emit_small)
    state["nops"] = jnp.where(emit_small, 1, 0)

    def record_op(st, active, kind, a, b):
        idx = jnp.clip(st["nops"], 0, MAX_OPS - 1)
        st = dict(st)
        # MAX_OPS (32772) exceeds the worst case (32769 for a 64 KiB
        # block); if that bound argument is ever wrong, flag the lane
        # instead of silently overwriting the last op slot.
        st["overflow"] = st["overflow"] | (active & (st["nops"] >= MAX_OPS))
        st["op_kind"] = _scatter(st["op_kind"], idx, kind, active)
        st["op_a"] = _scatter(st["op_a"], idx, a, active)
        st["op_b"] = _scatter(st["op_b"], idx, b, active)
        st["nops"] = jnp.where(active, st["nops"] + 1, st["nops"])
        return st

    def finish(st, active):
        """Emit the trailing literal (if any) and mark the lane done."""
        has_tail = active & (st["next_emit"] < n)
        st = record_op(st, has_tail, 0, st["next_emit"], n)
        st["done"] = st["done"] | active
        return st

    def scan_step(st, active):
        s = st["s_next"]
        bb = st["skip"] >> 5
        s_next = s + bb
        skip = st["skip"] + bb
        out_of_input = s_next > s_limit

        cand = _gather(st["table"], jnp.clip(st["next_hash"], 0, (1 << 14) - 1))
        probe = active & ~out_of_input
        table = _scatter(st["table"], jnp.clip(st["next_hash"], 0, (1 << 14) - 1), s, probe)
        next_hash = hash_(u32at(s_next))
        matched = probe & (u32at(s) == u32at(cand))

        st = dict(st)
        st["s"] = jnp.where(active, s, st["s"])
        st["s_next"] = jnp.where(active, s_next, st["s_next"])
        st["skip"] = jnp.where(active, skip, st["skip"])
        st["table"] = table
        st["next_hash"] = jnp.where(probe, next_hash, st["next_hash"])
        st["candidate"] = jnp.where(matched, cand, st["candidate"])

        # Literal for the pending gap, then enter match extension.
        st = record_op(st, matched & (s > st["next_emit"]), 0, st["next_emit"], s)
        st["base"] = jnp.where(matched, s, st["base"])
        st["ext_s"] = jnp.where(matched, s + 4, st["ext_s"])
        st["ext_cand"] = jnp.where(matched, st["candidate"] + 4, st["ext_cand"])
        st["mode"] = jnp.where(matched, _EXTEND, st["mode"])
        st = finish(st, active & out_of_input)
        return st

    def extend_step(st, active):
        # Compare a 16-byte quantum; advance past equal prefix bytes.
        # (The reference extends 8 bytes at a time, src/compress.rs:377-412,
        # but only the final match length is observable in the output, so
        # a wider quantum halves the automaton's extend iterations without
        # touching bit-exactness.)
        es, ec = st["ext_s"], st["ext_cand"]
        xa = u32at(es) ^ u32at(ec)
        xb = u32at(es + 4) ^ u32at(ec + 4)
        xc = u32at(es + 8) ^ u32at(ec + 8)
        xd = u32at(es + 12) ^ u32at(ec + 12)
        adv = jnp.where(
            xa != 0,
            _tz_bytes(xa),
            jnp.where(
                xb != 0,
                4 + _tz_bytes(xb),
                jnp.where(xc != 0, 8 + _tz_bytes(xc), 12 + _tz_bytes(xd)),
            ),
        )
        rem = n - es
        ext = jnp.minimum(adv, rem)
        es2 = es + ext
        finished = active & ((adv < 16) | (ext < adv))

        st = dict(st)
        st["ext_s"] = jnp.where(active, es2, es)
        st["ext_cand"] = jnp.where(active, ec + ext, ec)

        # Copy op: offset = base - candidate, len = ext_s - base.
        offset = st["base"] - st["candidate"]
        clen = es2 - st["base"]
        st = record_op(st, finished, 1, offset, clen)
        st["next_emit"] = jnp.where(finished, es2, st["next_emit"])
        st["s"] = jnp.where(finished, es2, st["s"])

        hit_limit = finished & (es2 >= s_limit)
        st = finish(st, hit_limit)
        cont = finished & ~hit_limit

        # Post-copy double table update from one wide load
        # (src/compress.rs:285-313).
        s = st["s"]
        tmask = (1 << 14) - 1
        h1 = hash_(u32at(s - 1))
        st["table"] = _scatter(st["table"], jnp.clip(h1, 0, tmask), s - 1, cont)
        cur = u32at(s)
        ch = jnp.clip(hash_(cur), 0, tmask)
        cand = _gather(st["table"], ch)
        st["table"] = _scatter(st["table"], ch, s, cont)
        again = cont & (cur == u32at(cand))
        st["candidate"] = jnp.where(again, cand, st["candidate"])
        st["base"] = jnp.where(again, s, st["base"])
        st["ext_s"] = jnp.where(again, s + 4, st["ext_s"])
        st["ext_cand"] = jnp.where(again, cand + 4, st["ext_cand"])

        back = cont & ~again
        st["next_hash"] = jnp.where(back, hash_(u32at(s + 1)), st["next_hash"])
        st["s"] = jnp.where(back, s + 1, st["s"])
        st["s_next"] = jnp.where(back, s + 1, st["s_next"])
        st["skip"] = jnp.where(back, 32, st["skip"])
        st["mode"] = jnp.where(back, _SCAN, st["mode"])
        return st

    def body(st):
        live = ~st["done"]
        st = scan_step(st, live & (st["mode"] == _SCAN))
        st = extend_step(st, ~st["done"] & (st["mode"] == _EXTEND))
        return st

    def cond(st):
        return jnp.any(~st["done"])

    state = jax.lax.while_loop(cond, body, state)
    return (
        state["op_kind"],
        state["op_a"],
        state["op_b"],
        state["nops"],
        state["overflow"],
    )


# ---------------------------------------------------------------------------
# Phase 2: vectorized serialization
# ---------------------------------------------------------------------------


def _emit_sizes(op_kind, op_a, op_b, valid):
    """Emitted byte count per op (closed-form tag splitting)."""
    lit_len = op_b - op_a
    llm1 = lit_len - 1
    lit_hdr = jnp.where(llm1 <= 59, 1, jnp.where(llm1 < 256, 2, 3))
    lit_sz = lit_hdr + lit_len

    off, clen = op_a, op_b
    n64 = jnp.where(clen >= 68, (clen - 68) // 64 + 1, 0)
    rem1 = clen - 64 * n64
    peel60 = rem1 > 64
    rem = rem1 - jnp.where(peel60, 60, 0)
    use_copy1 = (rem <= 11) & (off <= 2047)
    copy_sz = 3 * n64 + 3 * peel60.astype(jnp.int32) + jnp.where(use_copy1, 2, 3)

    sz = jnp.where(op_kind == 0, lit_sz, copy_sz)
    return jnp.where(valid, sz, 0)


def serialize_ops(blocks, op_kind, op_a, op_b, nops):
    """Phase 2: ops -> raw op-stream bytes, fully vectorized.

    Returns ``(out (B, OUT_W) uint8, out_len (B,))`` (no varint preamble;
    the caller owns stream assembly).
    """
    bsz = blocks.shape[0]
    oi = jnp.arange(MAX_OPS, dtype=jnp.int32)
    valid = oi[None, :] < nops[:, None]

    sizes = _emit_sizes(op_kind, op_a, op_b, valid)
    ends = jnp.cumsum(sizes, axis=1)
    starts = ends - sizes
    out_len = ends[:, -1]

    # Covering op per output byte: scatter op index at its start offset.
    opidx = jnp.where(valid & (sizes > 0), oi[None, :], -1)
    pos = jnp.where(valid & (sizes > 0), starts, OUT_W)
    cover = jnp.full((bsz, OUT_W), -1, jnp.int32)
    cover = jax.vmap(lambda c, p, v: c.at[p].max(v, mode="drop"))(cover, pos, opidx)
    cover = jax.lax.cummax(cover, axis=1)
    cov = jnp.clip(cover, 0, MAX_OPS - 1)

    def g(arr):
        return jnp.take_along_axis(arr, cov, axis=1)

    kind = g(op_kind)
    a = g(op_a)
    b = g(op_b)
    start = g(starts)
    p = jnp.arange(OUT_W, dtype=jnp.int32)[None, :]
    rel = p - start

    # --- literal bytes ---
    lit_len = b - a
    llm1 = lit_len - 1
    hdr = jnp.where(llm1 <= 59, 1, jnp.where(llm1 < 256, 2, 3))
    h0 = jnp.where(
        llm1 <= 59,
        (llm1 << 2) | TAG_LITERAL,
        jnp.where(hdr == 2, (60 << 2) | TAG_LITERAL, (61 << 2) | TAG_LITERAL),
    )
    lit_hdr_byte = jnp.where(
        rel == 0, h0, jnp.where(rel == 1, llm1 & 0xFF, (llm1 >> 8) & 0xFF)
    )
    content_idx = jnp.clip(a + rel - hdr, 0, S - 1)
    content = jnp.take_along_axis(blocks.astype(jnp.int32), content_idx, axis=1)
    lit_byte = jnp.where(rel < hdr, lit_hdr_byte, content)

    # --- copy bytes (64-peels, optional 60-peel, copy1/copy2 tail) ---
    off, clen = a, b
    n64 = jnp.where(clen >= 68, (clen - 68) // 64 + 1, 0)
    rem1 = clen - 64 * n64
    peel60 = (rem1 > 64).astype(jnp.int32)
    rem = rem1 - 60 * peel60
    use_copy1 = (rem <= 11) & (off <= 2047)

    in64 = rel < 3 * n64
    in60 = ~in64 & (rel < 3 * (n64 + peel60))
    j = rel % 3
    tail_rel = rel - 3 * (n64 + peel60)
    sub_len = jnp.where(in64, 64, jnp.where(in60, 60, rem))
    # copy2 byte layout: tag((len-1)<<2|10), off&0xFF, off>>8
    copy2_byte = jnp.where(
        (in64 | in60),
        jnp.where(j == 0, ((sub_len - 1) << 2) | TAG_COPY2,
                  jnp.where(j == 1, off & 0xFF, off >> 8)),
        jnp.where(
            use_copy1,
            jnp.where(
                tail_rel == 0,
                ((off >> 8) << 5) | ((rem - 4) << 2) | TAG_COPY1,
                off & 0xFF,
            ),
            jnp.where(tail_rel == 0, ((rem - 1) << 2) | TAG_COPY2,
                      jnp.where(tail_rel == 1, off & 0xFF, off >> 8)),
        ),
    )

    byte = jnp.where(kind == 0, lit_byte, copy2_byte)
    byte = jnp.where((cover >= 0) & (p < out_len[:, None]), byte, 0)
    return byte.astype(jnp.uint8), out_len


@partial(jax.jit, donate_argnums=())
def compress_blocks(blocks, lengths):
    """Compress a ``(B, S)`` batch of independent 64 KiB blocks.

    Returns ``(out (B, OUT_W) uint8, out_len (B,) int32)`` — per-block
    raw op streams, byte-identical to the reference encoder's per-block
    output. Stream assembly (varint + ordered concat) is the caller's.
    """
    op_kind, op_a, op_b, nops, overflow = find_ops(blocks, lengths)
    out, out_len = serialize_ops(blocks, op_kind, op_a, op_b, nops)
    # An overflowed lane would have emitted a corrupt stream; poison its
    # length with an impossible value (> OUT_W) so every consumer either
    # rejects it (raw host wrapper) or falls back to an Uncompressed
    # frame chunk (the compressibility test fails against OUT_W + 1).
    out_len = jnp.where(overflow, jnp.int32(OUT_W + 1), out_len)
    return out, out_len


def compress_blocks_host(blocks: np.ndarray, lengths: np.ndarray):
    """NumPy-in/NumPy-out convenience wrapper."""
    out, out_len = compress_blocks(jnp.asarray(blocks), jnp.asarray(lengths))
    out, out_len = np.asarray(out), np.asarray(out_len)
    if np.any(out_len > OUT_W):
        raise RuntimeError(
            "device encoder op-count overflow (MAX_OPS bound violated); "
            "this is a bug — the bound argument covers every valid block"
        )
    return out, out_len
