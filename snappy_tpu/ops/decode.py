"""Batched parallel raw-block decompression on device.

The reference decodes with one sequential tag-dispatch loop over the
compressed bytes (``src/decompress.rs:130-148``); every op's position
depends on all previous op lengths, and copies read earlier output. On a
vector machine both dependences are broken with log-depth recurrences:

1. **Speculative per-position parse.** For *every* src byte position,
   decode the op that would start there (kind, consumed src bytes,
   produced dst bytes, copy offset, literal content start) — pure
   element-wise work over the whole compressed stream at once. This is
   the vector analogue of the 256-entry tag lookup table
   (``src/decompress.rs:377-475``): here the "table" is branch-free
   arithmetic on byte lanes.
2. **Op-boundary discovery.** ``next[i] = i + consumed[i]`` defines a
   successor chain; the true op starts are the orbit of position 0.
   Marked by pointer-doubling (``mark |= scatter(mark, jump)``,
   ``jump = jump[jump]``) in ``ceil(log2(S))`` rounds; the same rounds
   hop-double ``produced`` sums, yielding every op's absolute dst offset
   — the prefix-sum the sequential loop carries implicitly.
3. **Copy resolution.** Each dst byte's value is either a src byte (from
   a literal) or the dst byte at ``d - offset``. Following parents is a
   pointer-jumping problem: literal bytes are roots; ``parent = parent[
   parent]`` for ``log2(D)`` rounds resolves every byte — including
   run-length chains with ``offset < len`` (``src/decompress.rs:281-326``)
   whose chains just take more doubling rounds, never more passes.

Validation mirrors the reference's exact checks as per-op flags reduced
to the *first* (in stream order) erroring op, so the host can re-raise
the same error the sequential loop would have (kernels cannot raise;
SURVEY.md §5 failure-detection mapping). Everything is jit/vmap/
shard_map-compatible: static shapes, no host sync.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Device error codes (reduced on device, rehydrated host-side).
OK = 0
E_LITERAL = 1
E_COPYREAD = 2
E_OFFSET = 3
E_COPYWRITE = 4
E_HEADER_MISMATCH = 5

_CAP = np.int32(1 << 30)  # clamp for lengths that provably overrun


def _parse_positions(src, src_len):
    """Element-wise speculative op decode at every position.

    Returns a dict of ``(S,)`` arrays; entries are meaningful only where a
    position turns out to be a real op start.
    """
    s = src.shape[0]
    i = jnp.arange(s, dtype=jnp.int32)
    z = jnp.zeros((4,), dtype=src.dtype)

    def shifted(k):
        return jnp.concatenate([src[k:], z[:k]])

    b0 = src.astype(jnp.int32)
    u1 = shifted(1).astype(jnp.uint32)
    u2 = shifted(2).astype(jnp.uint32)
    u3 = shifted(3).astype(jnp.uint32)
    u4 = shifted(4).astype(jnp.uint32)
    trail32 = u1 | (u2 << np.uint32(8)) | (u3 << np.uint32(16)) | (u4 << np.uint32(24))
    b1 = u1.astype(jnp.int32)
    b2 = u2.astype(jnp.int32)

    tag = b0 & 3
    lenm1 = b0 >> 2
    is_lit = tag == 0

    # Literal: 1-byte tag, then 0-4 length bytes, then the content.
    long_lit = lenm1 >= 60
    bytecount = jnp.clip(lenm1 - 59, 1, 4)
    mask = jnp.uint32(0xFFFFFFFF) >> (np.uint32(8) * (4 - bytecount).astype(jnp.uint32))
    lit_trailing = trail32 & mask  # uint32; true L-1 for long literals
    lit_l = (
        jnp.where(
            long_lit,
            jnp.minimum(lit_trailing, _CAP.astype(np.uint32)).astype(jnp.int32),
            lenm1,
        )
        + 1
    )
    lit_extra = jnp.where(long_lit, bytecount, 0)
    lit_content = i + 1 + lit_extra
    # Reference demands 4 readable bytes for any long length read
    # (src/decompress.rs:189-205), then content must fit in src and dst.
    lit_err_src = (long_lit & (i + 5 > src_len)) | (src_len - lit_content < lit_l)

    # Copy: 1-byte tag + 1/2/4 trailing offset bytes.
    ntb = jnp.where(tag == 1, 1, jnp.where(tag == 2, 2, 4))
    copy_len = jnp.where(tag == 1, 4 + (lenm1 & 7), lenm1 + 1)
    off1 = ((b0 >> 5) << 8) | b1
    off2 = b1 | (b2 << 8)
    copy_off = jnp.where(
        tag == 1,
        off1.astype(jnp.uint32),
        jnp.where(tag == 2, off2.astype(jnp.uint32), trail32),
    )
    copy_err_read = i + 1 + ntb > src_len

    return dict(
        is_lit=is_lit,
        consumed=jnp.where(is_lit, 1 + lit_extra + lit_l, 1 + ntb),
        produced=jnp.where(is_lit, lit_l, copy_len),
        lit_content=lit_content,
        lit_err_src=lit_err_src,
        copy_off=copy_off,
        copy_err_read=copy_err_read,
    )


def _discover_ops(consumed, produced, src_len):
    """Orbit-of-0 marking + hop-doubled dst prefix sums.

    Returns ``(op_mask (S,), dst_start (S,), total_d scalar)``.
    """
    s = consumed.shape[0]
    i = jnp.arange(s, dtype=jnp.int32)
    live = i < src_len
    # Positions at/after src_len are absorbing self-loops producing 0.
    sent = jnp.int32(s)
    jump = jnp.where(live, jnp.minimum(i + consumed, sent), i)
    jump = jnp.concatenate([jump, jnp.full((1,), sent, jnp.int32)])
    mark = jnp.zeros((s + 1,), jnp.int8).at[0].set(1)

    # Hop-double until every chain is absorbed. Chains are at most
    # ops-per-stream deep, usually far less, so a convergence check beats
    # the worst-case log2(S) fixed unroll (jumps reach their self-loop
    # fixpoints monotonically; lockstep across the vmapped batch). The
    # loop carries only (mark, jump): dst offsets don't need hop-doubled
    # sums — once op starts are known they're an ordinary prefix sum.
    rounds = max(1, (s - 1).bit_length())

    def body(st):
        mark, jump, _, r = st
        # Push marks one jump forward in place: mark[jump[i]] |= mark[i].
        mark = mark.at[jump].max(mark, mode="drop")
        jump2 = jump[jump]
        converged = jnp.all(jump2 == jump)
        return mark, jump2, converged, r + 1

    def cond(st):
        _, _, converged, r = st
        return (~converged) & (r < rounds)

    mark, jump, _, _ = jax.lax.while_loop(
        cond, body, (mark, jump, jnp.bool_(False), jnp.int32(0))
    )
    op_mask = (mark[:s] == 1) & live
    # Exclusive prefix sum of produced over op starts = dst offsets (the
    # prefix the sequential loop carries implicitly).
    contrib = jnp.where(op_mask, produced, 0)
    ends = jnp.cumsum(contrib)
    total = ends[-1] if s > 0 else jnp.int32(0)
    dst_start = ends - contrib
    return op_mask, dst_start, total


def _first_error(op_mask, dst_start, declen, total_d, fields):
    """Reduce per-op validity flags to the first sequential error."""
    s = op_mask.shape[0]
    i = jnp.arange(s, dtype=jnp.int32)
    d = dst_start
    lit_err = fields["lit_err_src"] | (declen - d < fields["produced"])
    off_u = fields["copy_off"]
    d_u = jnp.maximum(d, 0).astype(jnp.uint32)
    copy_code = jnp.where(
        fields["copy_err_read"],
        E_COPYREAD,
        jnp.where(
            (off_u == np.uint32(0)) | (d_u < off_u),
            E_OFFSET,
            jnp.where(d + fields["produced"] > declen, E_COPYWRITE, OK),
        ),
    )
    code = jnp.where(fields["is_lit"], jnp.where(lit_err, E_LITERAL, OK), copy_code)
    code = jnp.where(op_mask, code, OK)
    bad = code != OK
    first = jnp.min(jnp.where(bad, i, jnp.int32(s)))
    err = jnp.where(first < s, code[jnp.minimum(first, s - 1)], OK)
    err = jnp.where((err == OK) & (total_d != declen), E_HEADER_MISMATCH, err)
    return err.astype(jnp.int32), first


def _resolve(src, fields, op_mask, dst_start, d_pad):
    """Materialize dst bytes: covering-op map, then root-finding."""
    s = src.shape[0]
    i = jnp.arange(s, dtype=jnp.int32)
    d = jnp.arange(d_pad, dtype=jnp.int32)

    # Per-op record packed into one int32 so the d_pad-wide fetch is a
    # single gather: literals store (lit_content - dst_start) biased by
    # +d_pad (>= 0: content and start are bounded by the row widths);
    # copies store -(offset + 1) (< 0).
    off_clip = jnp.minimum(fields["copy_off"], np.uint32(d_pad)).astype(jnp.int32)
    packed = jnp.where(
        fields["is_lit"],
        fields["lit_content"] - dst_start + jnp.int32(d_pad),
        -(off_clip + 1),
    )

    # Covering op for every dst byte: scatter each op's packed record at
    # its dst start, then a running max... max doesn't compose with the
    # packed payload, so scatter the op *index* and gather the record.
    opsrc = jnp.where(op_mask, i, -1)
    ds = jnp.where(op_mask, dst_start, jnp.int32(d_pad))  # OOB -> dropped
    cover = jnp.full((d_pad,), -1, jnp.int32).at[ds].max(opsrc, mode="drop")
    cover = jax.lax.cummax(cover, axis=0)
    covc = jnp.clip(cover, 0, s - 1)

    pg = packed[covc]
    c_is_lit = pg >= 0
    lit_src = jnp.clip(pg - jnp.int32(d_pad) + d, 0, s - 1)
    off = -(pg + 1)
    parent = jnp.where(c_is_lit, d, jnp.maximum(d - off, 0))
    val = src[lit_src]

    # Chase parents to their literal roots by pointer doubling, stopping
    # at the measured fixpoint (corpus chains run ~2^9 deep -> ~9 rounds,
    # under the log2(D) worst case). Indices fit uint16 whenever
    # d_pad <= 2^16 (every frame chunk), halving loop traffic.
    rounds = max(1, (d_pad - 1).bit_length())
    idx_t = jnp.uint16 if d_pad <= (1 << 16) else jnp.int32
    parent = parent.astype(idx_t)

    def body(st):
        parent, _, r = st
        parent2 = parent[parent]
        return parent2, jnp.all(parent2 == parent), r + 1

    def cond(st):
        _, converged, r = st
        return (~converged) & (r < rounds)

    parent, _, _ = jax.lax.while_loop(
        cond, body, (parent, jnp.bool_(False), jnp.int32(0))
    )
    return val[parent]


def decode_block(src, src_len, declen, d_pad: int):
    """Decode one raw op stream (post-varint-header bytes).

    ``src``: ``(S,)`` uint8 zero-padded; ``src_len``/``declen`` scalars.
    Returns ``(dst (d_pad,) uint8, err int32, total_d int32)``.
    """
    fields = _parse_positions(src, src_len)
    op_mask, dst_start, total_d = _discover_ops(
        fields["consumed"], fields["produced"], src_len
    )
    err, _ = _first_error(op_mask, dst_start, declen, total_d, fields)
    dst = _resolve(src, fields, op_mask, dst_start, d_pad)
    return dst, err, total_d


@partial(
    __import__("jax").jit,
    static_argnames=("d_pad",),
)
def decode_batch(srcs, src_lens, declens, d_pad: int):
    """Batched :func:`decode_block` over ``(B, S)`` streams."""
    return jax.vmap(lambda s, n, d: decode_block(s, n, d, d_pad))(
        srcs, src_lens, declens
    )


def _decode_block_hosted(src, src_len, declen, opbits, d_pad: int):
    """Decode one stream given a host-computed op-start bitmask.

    The hybrid split: op-boundary discovery is a tiny sequential tag walk
    (0.03% of the bytes; ``native.scan_ops`` does it at host-core speed),
    while parsing, validation, and copy resolution — the bandwidth-bound
    99.97% — stay on device. The mask must equal the orbit the device
    would discover itself (asserted by differential tests); every per-op
    validity check and the total-length check still run on device, so a
    wrong mask yields a flagged stream, not silent corruption.
    """
    fields = _parse_positions(src, src_len)
    s = src.shape[0]
    i = jnp.arange(s, dtype=jnp.int32)
    bits = jnp.repeat(opbits, 8)[:s]
    mask = ((bits >> (i & 7).astype(jnp.uint8)) & 1) == 1
    op_mask = mask & (i < src_len)
    contrib = jnp.where(op_mask, fields["produced"], 0)
    ends = jnp.cumsum(contrib)
    total_d = ends[-1] if s > 0 else jnp.int32(0)
    dst_start = ends - contrib
    err, _ = _first_error(op_mask, dst_start, declen, total_d, fields)
    dst = _resolve(src, fields, op_mask, dst_start, d_pad)
    return dst, err, total_d


@partial(jax.jit, static_argnames=("d_pad",))
def decode_batch_hosted(srcs, src_lens, declens, opbits, d_pad: int):
    """Batched hybrid decode: host op-mask in, device parse/resolve out.

    ``opbits``: ``(B, S//8)`` uint8 little-endian op-start bitmaps from
    :func:`snappy_tpu.native.scan_ops`. Same returns and error codes as
    :func:`decode_batch`.
    """
    return jax.vmap(lambda s, n, d, m: _decode_block_hosted(s, n, d, m, d_pad))(
        srcs, src_lens, declens, opbits
    )


@partial(jax.jit, static_argnames=("d_pad",))
def decode_crc_batch(srcs, src_lens, declens, d_pad: int):
    """Batched decode + masked CRC32C of the decompressed rows, fused.

    One launch serves the frame read path: the CRC is computed on the
    device-resident output (rows zero-masked past their declared
    lengths, which the CRC pad-retraction requires), so decompressed
    bytes cross the host boundary exactly once.
    """
    from .crc32c import crc32c_masked_blocks

    dst, errs, total = jax.vmap(lambda s, n, d: decode_block(s, n, d, d_pad))(
        srcs, src_lens, declens
    )
    d = jnp.arange(d_pad, dtype=jnp.int32)[None, :]
    masked = jnp.where(d < declens[:, None], dst, jnp.uint8(0))
    crc = crc32c_masked_blocks(masked, declens)
    return dst, errs, total, crc


@partial(jax.jit, static_argnames=("d_pad",))
def decode_crc_batch_hosted(srcs, src_lens, declens, opbits, d_pad: int):
    """Hybrid variant of :func:`decode_crc_batch` (host op masks)."""
    from .crc32c import crc32c_masked_blocks

    dst, errs, total = decode_batch_hosted(srcs, src_lens, declens, opbits, d_pad)
    d = jnp.arange(d_pad, dtype=jnp.int32)[None, :]
    masked = jnp.where(d < declens[:, None], dst, jnp.uint8(0))
    crc = crc32c_masked_blocks(masked, declens)
    return dst, errs, total, crc
