"""Pallas TPU raw-block decoder: VMEM-staged replay with vector moves.

The reference decodes with a sequential tag-dispatch loop over bytes
(``src/decompress.rs:130-148``). The XLA twin (``ops/decode.py``) breaks
the sequential dependences with log-depth recurrences — the throughput
formulation for batched launches. This kernel is the complementary
design point: one grid cell per block, the compressed stream staged in
VMEM, the op walk on the scalar core, and literal/copy payload movement
as 128-lane vector window moves — "resolve copies in-register" — with
byte-exact output and the reference's exact first-error codes.

Why not a fully parallel Pallas decode: on this Mosaic toolchain,
gathers only lower as ``take_along_axis`` on the last (128-lane) axis
and there is no data-dependent lane scatter, while both halves of the
parallel formulation (orbit marking, copy-parent resolution) need
cross-row gathers or scatters over the whole 64 KiB index space. The
measured phase split and the constraint analysis live in PARITY.md.

Layout: a block's compressed body is ``(S/128, 128)`` uint8 in VMEM
(int32-widened scratch for scalar addressing); dst accumulates in an
``(d_pad/128, 128)`` int32 scratch. A flat byte offset ``p`` addresses
``(p // 128, p % 128)``; a 128-byte window at any byte offset spans two
rows and is realigned with a lane rotation (``take_along_axis`` with a
modular iota), which is how byte-granular moves ride the 8x128 VPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..decode import (
    E_COPYREAD,
    E_COPYWRITE,
    E_HEADER_MISMATCH,
    E_LITERAL,
    E_OFFSET,
    OK,
)

try:  # import guard mirrors ops/pallas/crc32c.py
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except Exception:  # pragma: no cover - pallas unavailable on this backend
    _PALLAS = False

LANES = 128
_CAP = np.int32(1 << 30)  # clamp for lengths that provably overrun


def _flat_fiota(shape, dim):
    """f32 iota — shared by the flat-gather kernel family (ADVICE r3:
    the routing-math helpers were duplicated across v1/v2/v3/v4)."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _flat_ind(a, b):
    """0/1 indicator |a-b|<1 (one-hot building block), f32-exact."""
    return jnp.maximum(jnp.float32(1) - jnp.abs(a - b), jnp.float32(0))


def _flat_ident128():
    """(128,128) identity for MXU transposes (bf16-exact for bytes)."""
    return _flat_ind(_flat_fiota((128, 128), 0), _flat_fiota((128, 128), 1)).astype(
        jnp.bfloat16
    )


def _round128(x: int) -> int:
    """Round up to a 128 multiple (bf16 operands need full lane tiles)."""
    return -(-x // 128) * 128


def _roll(x, shift):
    """Lane rotation by a traced shift: ``out[l] = x[(l - shift) % 128]``.

    ``pltpu.roll`` is the one dynamic-lane-permute Mosaic lowers (a
    ``take_along_axis`` with a modular iota interprets identically but
    is rejected by the real TPU lowering at (1, 128) shapes).
    """
    return pltpu.roll(x, shift, 1)


def _rot_read(arr_ref, row, sh, nrows):
    """Read 128 bytes starting at flat offset ``row*128 + sh`` (two-row
    window + lane rotation). ``sh`` in [0, 128)."""
    r1 = jnp.minimum(row + 1, nrows - 1)
    row0 = arr_ref[pl.ds(row, 1), :]
    row1 = arr_ref[pl.ds(r1, 1), :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    # out[l] = rowX[(l + sh) % 128]  ->  roll right by (128 - sh).
    back = jnp.remainder(LANES - sh, LANES)
    rot0 = _roll(row0, back)
    rot1 = _roll(row1, back)
    return jnp.where(lane < LANES - sh, rot0, rot1)


def _rot_write(arr_ref, row, sh, count, chunk, nrows):
    """Write ``count`` (<=128) bytes of ``chunk`` at flat offset
    ``row*128 + sh`` via masked read-modify-write of the two rows."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    # Un-rotate: target lane l of row0 takes chunk[(l - sh) mod 128].
    unrot = _roll(chunk, sh)
    m0 = (lane >= sh) & (lane < sh + count)
    row0 = arr_ref[pl.ds(row, 1), :]
    arr_ref[pl.ds(row, 1), :] = jnp.where(m0, unrot, row0)
    r1 = jnp.minimum(row + 1, nrows - 1)
    m1 = (lane < sh + count - LANES) & (row + 1 < nrows)
    row1 = arr_ref[pl.ds(r1, 1), :]
    arr_ref[pl.ds(r1, 1), :] = jnp.where(m1, unrot, row1)


def _move_window(dst_ref, src_ref, d0, a0, count, dst_rows, src_rows):
    """One <=128-byte move: read a window at ``a0``, write ``count`` at
    ``d0``. The loop-free fast path for short ops (the common case)."""
    chunk = _rot_read(src_ref, a0 // LANES, a0 % LANES, src_rows)
    _rot_write(dst_ref, d0 // LANES, d0 % LANES, count, chunk, dst_rows)


def _bulk_move(dst_ref, src_ref, d0, a0, length, dst_rows, src_rows):
    """Move ``length`` bytes src[a0:] -> dst[d0:] in 128-byte windows.

    Requires the source region to be fully materialized (literals, and
    copies with offset >= 128)."""

    def body(state):
        q, d, a = state
        rem = jnp.minimum(length - q, LANES)
        _move_window(dst_ref, src_ref, d, a, rem, dst_rows, src_rows)
        return q + LANES, d + LANES, a + LANES

    jax.lax.while_loop(lambda st: st[0] < length, body, (jnp.int32(0), d0, a0))


def _overlap_move(dst_ref, d0, offset, length, d_rows):
    """Copy ``dst[d0+i] = dst[d0+i-offset]`` for any offset >= 1.

    Semantically the reference's overlapping-copy path
    (``src/decompress.rs:281-339``), vectorized by period doubling (the
    same trick the native decoder uses): the run
    ``[d0-offset, d0+length)`` is periodic in ``offset``, so it can be
    extended by copying the materialized prefix forward at a shift that
    is a multiple of ``offset`` — the shift starts at ``offset`` and
    doubles, giving log2(length/offset) vector rounds and zero scalar
    VMEM access (Mosaic cannot store scalars to VMEM)."""
    src0 = d0 - offset
    total = offset + length

    def body(region):
        k = jnp.minimum(region, total - region)
        _bulk_move(dst_ref, dst_ref, src0 + region, src0, k, d_rows, d_rows)
        return region + k

    jax.lax.while_loop(lambda r: r < total, body, offset)


# --- compose-in-register machinery ------------------------------------
#
# The measured per-op cost split on the chip (R2_NOTES.md): ~65 ns for
# the loop + SMEM walk, ~174 ns for the masked read-modify-write move.
# The RMW is eliminated by carrying the *current dst row under
# construction* as a (1, 128) vector register through the while loop:
# each op merges its payload into the tail with selects, and VMEM sees
# one aligned store per completed row (~1 store per 128 output bytes)
# instead of two loads + two stores per op. The wire format caps copy
# lengths at 64 bytes (tag layout, ``src/decompress.rs:377-475``), so
# every copy — including overlapping ones, via the periodic-extension
# gather below — is a single-window op; only long literals (> 128 B)
# fall back to the bulk RMW path, bracketed by a tail flush/reload.


def _merge_tail(dstw_ref, tail, chunk, d, ln):
    """Merge ``ln`` (<= 128) bytes of ``chunk`` (window-aligned: byte j
    at lane j) into the carried tail row at dst offset ``d``; store the
    completed row to VMEM on a row crossing. Returns the new tail.
    Lanes >= (d+ln) % 128 of the result stay zero (the zero-pad
    contract rides the carry)."""
    sh = jnp.remainder(d, LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    rolled = _roll(chunk, sh)
    nt = jnp.where((lane >= sh) & (lane < sh + ln), rolled, tail)

    def cross(_):
        dstw_ref[pl.ds(d // LANES, 1), :] = nt
        return jnp.where(lane < sh + ln - LANES, rolled, 0)

    return jax.lax.cond(sh + ln >= LANES, cross, lambda _: nt, None)


def _compose_copy(dstw_ref, tail, d, offset, ln, d_rows):
    """Copy ``dst[d+i] = dst[d+i-offset]`` (ln <= 64, offset >= 1)
    against the register tail: one two-row window read with the tail
    overlaid, one periodic gather, one merge — no dst RMW and no
    period-doubling loop for overlaps."""
    sh = jnp.remainder(d, LANES)
    row_start = d - sh
    a0 = d - offset
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    vm = _rot_read(dstw_ref, a0 // LANES, jnp.remainder(a0, LANES), d_rows)
    # Bytes at [row_start, d) live in the tail register, not VMEM.
    rt = _roll(tail, jnp.remainder(row_start - a0, LANES))
    win = jnp.where(a0 + lane >= row_start, rt, vm)
    # Overlapping copy == periodic extension: out[j] = win[j % offset]
    # (the prefix [d-offset, d) is fully materialized, so one gather
    # replaces the sequential/doubling resolution). Mosaic lowers
    # take_along_axis only at (8, 128), hence the broadcast.
    idx = jnp.where(offset < ln, jnp.remainder(lane, offset), lane)
    g = jnp.take_along_axis(
        jnp.broadcast_to(win, (8, LANES)),
        jnp.broadcast_to(idx, (8, LANES)),
        axis=1,
    )[:1]
    return _merge_tail(dstw_ref, tail, g, d, ln)


def _compose_literal(dstw_ref, srcw_ref, tail, d, content, ln, d_rows, s_rows):
    """Single-window literal (ln <= 128): one src read, one merge."""
    chunk = _rot_read(srcw_ref, content // LANES, jnp.remainder(content, LANES), s_rows)
    return _merge_tail(dstw_ref, tail, chunk, d, ln)


def _compose_bulk_literal(dstw_ref, srcw_ref, tail, d, content, ln, d_rows, s_rows):
    """Long-literal (> 128 B) fallback: flush the tail row, run the
    bulk RMW move, reload the new tail row from VMEM. Rare (requires a
    tag-60+ literal), so the flush/reload cost is noise."""
    dstw_ref[pl.ds(d // LANES, 1), :] = tail
    _bulk_move(dstw_ref, srcw_ref, d, content, ln, d_rows, s_rows)
    d2 = d + ln
    sh2 = jnp.remainder(d2, LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    loaded = dstw_ref[pl.ds(jnp.minimum(d2 // LANES, d_rows - 1), 1), :]
    return jnp.where(lane < sh2, loaded, 0)


def _compose_flush(dstw_ref, tail, d):
    """Store the final partial tail row (no-op when d is row-aligned —
    the tail is all zeros there, and d // 128 could equal d_rows)."""

    def store(_):
        dstw_ref[pl.ds(d // LANES, 1), :] = tail
        return 0

    jax.lax.cond(jnp.remainder(d, LANES) != 0, store, lambda _: 0, None)


def _make_kernel(s_rows: int, d_rows: int, fastpath: bool = False):
    def kernel(len_ref, declen_ref, src_ref, srcsm_ref, dst_ref, err_ref, srcw_ref, dstw_ref):
        # Scalar vectors ride SMEM unblocked (whole (B,) array visible to
        # every grid cell, indexed by program_id) — per-cell (1,) blocks
        # interpret fine but fail real Mosaic lowering, which requires
        # rank-1 blocks to be whole-array or 128-multiples. The op walk's
        # byte reads come from ``srcsm_ref``, the stream's int32 SMEM
        # copy (rank-1 block of a flat array): Mosaic has no scalar
        # loads from VMEM, and SMEM is the scalar memory.
        i = pl.program_id(0)
        n = len_ref[i]
        declen = declen_ref[i]
        srcw_ref[:] = src_ref[0].astype(jnp.int32)
        dstw_ref[:] = jnp.zeros((d_rows, LANES), jnp.int32)

        def at(p):
            return srcsm_ref[jnp.clip(p, 0, s_rows * LANES - 1)]

        def trail32u(p):
            """Little-endian 4-byte read at ``p`` as uint32."""
            return (
                at(p).astype(jnp.uint32)
                | (at(p + 1).astype(jnp.uint32) << np.uint32(8))
                | (at(p + 2).astype(jnp.uint32) << np.uint32(16))
                | (at(p + 3).astype(jnp.uint32) << np.uint32(24))
            )

        def step(state):
            s, d, err = state
            tag = at(s)
            kind = tag & 3
            lenm1 = tag >> 2

            def do_literal(s, d):
                long_lit = lenm1 >= 60
                bytecount = jnp.clip(lenm1 - 59, 1, 4)
                mask = jnp.uint32(0xFFFFFFFF) >> (
                    np.uint32(8) * (4 - bytecount).astype(jnp.uint32)
                )
                raw_u = trail32u(s + 1) & mask
                # Clamp pathological declared lengths (corrupt input) so
                # int32 arithmetic stays ordered; the clamp always still
                # fails the bounds checks (same trick as ops/decode._CAP).
                ll = (
                    jnp.where(
                        long_lit,
                        jnp.minimum(raw_u, _CAP.astype(np.uint32)).astype(jnp.int32),
                        lenm1,
                    )
                    + 1
                )
                content = s + 1 + jnp.where(long_lit, bytecount, 0)
                bad = (long_lit & (s + 5 > n)) | (n - content < ll) | (declen - d < ll)

                def ok_fn(_):
                    if fastpath:
                        # Short literals (the common case) take the
                        # loop-free single-window move.
                        jax.lax.cond(
                            ll <= LANES,
                            lambda _: _move_window(
                                dstw_ref, srcw_ref, d, content, ll, d_rows, s_rows
                            ),
                            lambda _: _bulk_move(
                                dstw_ref, srcw_ref, d, content, ll, d_rows, s_rows
                            ),
                            None,
                        )
                    else:
                        _bulk_move(dstw_ref, srcw_ref, d, content, ll, d_rows, s_rows)
                    return content + ll, d + ll, OK

                return jax.lax.cond(bad, lambda _: (s, d, E_LITERAL), ok_fn, None)

            def do_copy(s, d):
                ntb = jnp.where(kind == 1, 1, jnp.where(kind == 2, 2, 4))
                length = jnp.where(kind == 1, 4 + (lenm1 & 7), lenm1 + 1)
                offmask = jnp.uint32(0xFFFFFFFF) >> (
                    np.uint32(8) * (4 - ntb).astype(jnp.uint32)
                )
                off_u = jnp.where(
                    kind == 1,
                    (((tag >> 5) << 8) | at(s + 1)).astype(jnp.uint32),
                    trail32u(s + 1) & offmask,
                )
                err_read = s + 1 + ntb > n
                err_off = (off_u == np.uint32(0)) | (
                    jnp.maximum(d, 0).astype(jnp.uint32) < off_u
                )
                err_write = d + length > declen
                code = jnp.where(
                    err_read,
                    E_COPYREAD,
                    jnp.where(err_off, E_OFFSET, jnp.where(err_write, E_COPYWRITE, OK)),
                )

                def ok_fn(_):
                    offset = off_u.astype(jnp.int32)  # validated: <= d
                    if fastpath:
                        # Short non-overlapping copies (the common case)
                        # take the loop-free single-window move; anything
                        # else goes through period doubling.
                        jax.lax.cond(
                            (offset >= length) & (length <= LANES),
                            lambda _: _move_window(
                                dstw_ref, dstw_ref, d, d - offset, length,
                                d_rows, d_rows,
                            ),
                            lambda _: _overlap_move(
                                dstw_ref, d, offset, length, d_rows
                            ),
                            None,
                        )
                    else:
                        _overlap_move(dstw_ref, d, offset, length, d_rows)
                    return s + 1 + ntb, d + length, OK

                return jax.lax.cond(code != OK, lambda _: (s, d, code), ok_fn, None)

            return jax.lax.cond(kind == 0, do_literal, do_copy, s, d)

        s, d, err = jax.lax.while_loop(
            lambda st: (st[0] < n) & (st[2] == OK),
            step,
            (jnp.int32(0), jnp.int32(0), jnp.int32(OK)),
        )
        err = jnp.where((err == OK) & (d != declen), E_HEADER_MISMATCH, err)
        err_ref[i] = err

        # Zero-pad contract: bytes past declen are zero.
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (d_rows, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (d_rows, LANES), 1)
        )
        dst_ref[0] = jnp.where(pos < declen, dstw_ref[:], 0).astype(jnp.uint8)

    return kernel


def _make_compose_kernel(s_rows: int, d_rows: int):
    """Compose-in-register variant of :func:`_make_kernel`: identical
    op walk and validation (lockstep with ``_make_kernel`` — same
    checks, same order, same codes; parity pinned by the parametrized
    error tests), but the payload moves ride the carried tail row."""

    def kernel(len_ref, declen_ref, src_ref, srcsm_ref, dst_ref, err_ref, srcw_ref, dstw_ref):
        i = pl.program_id(0)
        n = len_ref[i]
        declen = declen_ref[i]
        srcw_ref[:] = src_ref[0].astype(jnp.int32)
        dstw_ref[:] = jnp.zeros((d_rows, LANES), jnp.int32)

        def at(p):
            return srcsm_ref[jnp.clip(p, 0, s_rows * LANES - 1)]

        def trail32u(p):
            return (
                at(p).astype(jnp.uint32)
                | (at(p + 1).astype(jnp.uint32) << np.uint32(8))
                | (at(p + 2).astype(jnp.uint32) << np.uint32(16))
                | (at(p + 3).astype(jnp.uint32) << np.uint32(24))
            )

        def step(state):
            s, d, err, tail = state
            tag = at(s)
            kind = tag & 3
            lenm1 = tag >> 2

            def do_literal(args):
                s, d, tail = args
                long_lit = lenm1 >= 60
                bytecount = jnp.clip(lenm1 - 59, 1, 4)
                mask = jnp.uint32(0xFFFFFFFF) >> (
                    np.uint32(8) * (4 - bytecount).astype(jnp.uint32)
                )
                raw_u = trail32u(s + 1) & mask
                ll = (
                    jnp.where(
                        long_lit,
                        jnp.minimum(raw_u, _CAP.astype(np.uint32)).astype(jnp.int32),
                        lenm1,
                    )
                    + 1
                )
                content = s + 1 + jnp.where(long_lit, bytecount, 0)
                bad = (long_lit & (s + 5 > n)) | (n - content < ll) | (declen - d < ll)

                def ok_fn(tail):
                    tail = jax.lax.cond(
                        ll <= LANES,
                        lambda t: _compose_literal(
                            dstw_ref, srcw_ref, t, d, content, ll, d_rows, s_rows
                        ),
                        lambda t: _compose_bulk_literal(
                            dstw_ref, srcw_ref, t, d, content, ll, d_rows, s_rows
                        ),
                        tail,
                    )
                    return content + ll, d + ll, OK, tail

                return jax.lax.cond(
                    bad, lambda t: (s, d, E_LITERAL, t), ok_fn, tail
                )

            def do_copy(args):
                s, d, tail = args
                ntb = jnp.where(kind == 1, 1, jnp.where(kind == 2, 2, 4))
                length = jnp.where(kind == 1, 4 + (lenm1 & 7), lenm1 + 1)
                offmask = jnp.uint32(0xFFFFFFFF) >> (
                    np.uint32(8) * (4 - ntb).astype(jnp.uint32)
                )
                off_u = jnp.where(
                    kind == 1,
                    (((tag >> 5) << 8) | at(s + 1)).astype(jnp.uint32),
                    trail32u(s + 1) & offmask,
                )
                err_read = s + 1 + ntb > n
                err_off = (off_u == np.uint32(0)) | (
                    jnp.maximum(d, 0).astype(jnp.uint32) < off_u
                )
                err_write = d + length > declen
                code = jnp.where(
                    err_read,
                    E_COPYREAD,
                    jnp.where(err_off, E_OFFSET, jnp.where(err_write, E_COPYWRITE, OK)),
                )

                def ok_fn(tail):
                    offset = off_u.astype(jnp.int32)  # validated: <= d
                    tail = _compose_copy(dstw_ref, tail, d, offset, length, d_rows)
                    return s + 1 + ntb, d + length, OK, tail

                return jax.lax.cond(
                    code != OK, lambda t: (s, d, code, t), ok_fn, tail
                )

            return jax.lax.cond(kind == 0, do_literal, do_copy, (s, d, tail))

        zero_tail = jnp.zeros((1, LANES), jnp.int32)
        s, d, err, tail = jax.lax.while_loop(
            lambda st: (st[0] < n) & (st[2] == OK),
            step,
            (jnp.int32(0), jnp.int32(0), jnp.int32(OK), zero_tail),
        )
        _compose_flush(dstw_ref, tail, d)
        err = jnp.where((err == OK) & (d != declen), E_HEADER_MISMATCH, err)
        err_ref[i] = err

        # Zero-pad contract: bytes past declen are zero.
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (d_rows, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (d_rows, LANES), 1)
        )
        dst_ref[0] = jnp.where(pos < declen, dstw_ref[:], 0).astype(jnp.uint8)

    return kernel


def _make_records_kernel(s_rows: int, d_rows: int):
    """Kernel for the record-replay route: the op walk's parsing and
    validation are already done (host ``native.scan_records_batch``, a
    lockstep mirror of this file's validation — same checks, same
    order, same codes), so each loop step is just two SMEM reads, an
    unpack, and one vector window move. Cuts the scalar-core work per
    op to the minimum the replay's sequential dependence allows; the
    op-record stream (8 B/op) replaces the 4 B/byte int32 SMEM copy of
    the compressed stream that the self-contained kernel walks."""

    def kernel(nops_ref, declen_ref, recs_ref, src_ref, dst_ref, srcw_ref, dstw_ref):
        i = pl.program_id(0)
        nops = nops_ref[i]
        declen = declen_ref[i]
        srcw_ref[:] = src_ref[0].astype(jnp.int32)
        dstw_ref[:] = jnp.zeros((d_rows, LANES), jnp.int32)

        def step(state):
            j, d = state
            w0 = recs_ref[2 * j]
            w1 = recs_ref[2 * j + 1]
            ln = w0 & ((1 << 30) - 1)

            def lit_fn(_):
                # w1 = content offset in the compressed stream.
                jax.lax.cond(
                    ln <= LANES,
                    lambda _: _move_window(
                        dstw_ref, srcw_ref, d, w1, ln, d_rows, s_rows
                    ),
                    lambda _: _bulk_move(
                        dstw_ref, srcw_ref, d, w1, ln, d_rows, s_rows
                    ),
                    None,
                )

            def copy_fn(_):
                # w1 = copy offset (validated: 1 <= w1 <= d).
                jax.lax.cond(
                    (w1 >= ln) & (ln <= LANES),
                    lambda _: _move_window(
                        dstw_ref, dstw_ref, d, d - w1, ln, d_rows, d_rows
                    ),
                    lambda _: _overlap_move(dstw_ref, d, w1, ln, d_rows),
                    None,
                )

            jax.lax.cond(w0 >> 30 != 0, lit_fn, copy_fn, None)
            return j + 1, d + ln

        jax.lax.while_loop(
            lambda st: st[0] < nops, step, (jnp.int32(0), jnp.int32(0))
        )

        # Zero-pad contract: bytes past declen are zero.
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (d_rows, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (d_rows, LANES), 1)
        )
        dst_ref[0] = jnp.where(pos < declen, dstw_ref[:], 0).astype(jnp.uint8)

    return kernel


def _make_records_compose_kernel(s_rows: int, d_rows: int):
    """Compose-in-register variant of :func:`_make_records_kernel`:
    per op, two SMEM reads + one register merge — the minimum the
    replay's sequential dependence allows on this toolchain."""

    def kernel(nops_ref, declen_ref, recs_ref, src_ref, dst_ref, srcw_ref, dstw_ref):
        i = pl.program_id(0)
        nops = nops_ref[i]
        declen = declen_ref[i]
        srcw_ref[:] = src_ref[0].astype(jnp.int32)
        dstw_ref[:] = jnp.zeros((d_rows, LANES), jnp.int32)

        def step(state):
            j, d, tail = state
            w0 = recs_ref[2 * j]
            w1 = recs_ref[2 * j + 1]
            ln = w0 & ((1 << 30) - 1)

            def lit_fn(tail):
                # w1 = content offset in the compressed stream.
                return jax.lax.cond(
                    ln <= LANES,
                    lambda t: _compose_literal(
                        dstw_ref, srcw_ref, t, d, w1, ln, d_rows, s_rows
                    ),
                    lambda t: _compose_bulk_literal(
                        dstw_ref, srcw_ref, t, d, w1, ln, d_rows, s_rows
                    ),
                    tail,
                )

            def copy_fn(tail):
                # w1 = copy offset (validated: 1 <= w1 <= d); wire
                # format caps copy lengths at 64 <= 128.
                return _compose_copy(dstw_ref, tail, d, w1, ln, d_rows)

            tail = jax.lax.cond(w0 >> 30 != 0, lit_fn, copy_fn, tail)
            return j + 1, d + ln, tail

        zero_tail = jnp.zeros((1, LANES), jnp.int32)
        _, d, tail = jax.lax.while_loop(
            lambda st: st[0] < nops,
            step,
            (jnp.int32(0), jnp.int32(0), zero_tail),
        )
        _compose_flush(dstw_ref, tail, d)

        # Zero-pad contract: bytes past declen are zero.
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (d_rows, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (d_rows, LANES), 1)
        )
        dst_ref[0] = jnp.where(pos < declen, dstw_ref[:], 0).astype(jnp.uint8)

    return kernel


def _make_flat_kernel(s_rows: int, d_rows: int):
    """Flat-gather decode kernel: one windowed MXU gather per 8-row tile.

    The host flattener (``native.flatten_idx_batch`` /
    ``stpu_flatten_idx`` in ``core.cpp``) resolves every copy chain to
    the literal content byte it ultimately reads, so decode reduces to
    ``out[d] = src[idx[d]]`` — no sequential walk, no pointer-chase
    rounds. XLA lowers that gather at ~9 cycles/element; this kernel
    runs it on the MXU instead: per tile, a one-hot row-routing matmul
    over the tile's source window (narrow 128-row, mid 256-row, or wide
    512-row bucket, chosen by the host) followed by a lane-select.

    Formulation choices are measured, not argued (FLAT_PROFILE.json /
    tools/flat_profile.py stage attribution on the chip): the
    element-major input relayout is one f32 K=8 matmul + lane-select
    (f32 is exact for indices < 2^24 and these shapes are call-bound,
    not rate-bound; the two-plane bf16 variant was 63% of kernel time);
    Mosaic's native shape casts ((8,128)→(1,1024)→.T) lower but run
    SLOWER in context than the matmul relayout — kept out; the output
    relayout batches 8 tiles into one (64,8192)@(8192,128) matmul
    because per-tile (8,1024) matmuls were ~25% of kernel time in call
    overhead. The routing matmul's operands are small integers (one-hot
    0/1, source bytes <= 255) so the bf16 MXU pass is exact; boolean
    masks are built arithmetically (relu(1-|a-b|)) because i1 vectors
    hit a Mosaic relayout bug at (1024, 128).

    Replaces the tag-dispatch loop of ``src/decompress.rs:130-148``
    with a byte-parallel formulation measured ~20x faster than the
    sequential replay kernel on real hardware (DEVICE_TIME.json).
    """
    n_tiles = d_rows // 8
    n_groups = n_tiles // 8
    rem_tiles = n_tiles % 8
    w_narrow = min(128, s_rows)
    w_mid = min(256, s_rows)
    w_wide = min(512, s_rows)

    def kernel(meta_ref, declen_ref, src_ref, idx_ref, dst_ref, srcw_ref, dstw_ref, vstash_ref):
        i = pl.program_id(0)
        declen = declen_ref[i]
        # Widen src to int32 once: dynamic row windows on uint8 refs hit
        # the (32, 128) tiling's provable-alignment requirement; int32
        # (8, 128) tiles take arbitrary dynamic row offsets.
        srcw_ref[:] = src_ref[0].astype(jnp.int32)

        fiota, ind = _flat_fiota, _flat_ind

        lane2f = fiota((1024, LANES), 1)
        sublef = fiota((1024, LANES), 0)
        pmf = sublef - jnp.floor(sublef * (1.0 / LANES)) * LANES
        sel_pm = ind(lane2f, pmf)
        # Input relayout matrix A2 (1024, 8): A2[p, s] = [s == p // 128].
        a2 = ind(
            fiota((1024, 8), 1), jnp.floor(fiota((1024, 8), 0) * (1.0 / LANES))
        )
        # Batched output relayout AOUT8 (64, 8192): [p // 128 == s] —
        # one matmul re-tiles 8 tiles' element-major values at once.
        aout8 = ind(
            jnp.floor(fiota((64, 8 * 1024), 1) * (1.0 / LANES)),
            fiota((64, 8 * 1024), 0),
        )

        def bdot(a, b):
            # bf16 MXU matmul, exact for small-integer operands.
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16),
                b.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def fdot(a, b):
            # f32 MXU matmul: exact for operands < 2^24; K=8 shapes are
            # call-bound, so the f32 rate penalty is immaterial and the
            # single pass spares a hi/lo byte-plane split.
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def gather_vals(t, w):
            """Element-major (1024, 1) gathered bytes for tile t."""
            base = meta_ref[i * n_tiles * 2 + 2 * t]
            idx8 = idx_ref[0, pl.ds(t * 8, 8), :]
            ri = fdot(a2, idx8.astype(jnp.float32))
            idx_em = jnp.sum(ri * sel_pm, axis=1, keepdims=True)
            row_em = jnp.floor(idx_em * (1.0 / LANES))
            lane_em = idx_em - row_em * LANES
            # One-hot row-routing matmul over the source window.
            wiof = fiota((1024, w), 1)
            onehot = jnp.maximum(jnp.float32(1) - jnp.abs(wiof - row_em), 0.0)
            win = srcw_ref[pl.ds(base, w), :]
            routed = bdot(onehot, win)  # (1024, 128): full src row per element
            return jnp.sum(routed * ind(lane2f, lane_em), axis=1, keepdims=True)

        def tile_vals(t):
            bucket = meta_ref[i * n_tiles * 2 + 2 * t + 1]
            return jax.lax.switch(
                bucket,
                [
                    lambda _: gather_vals(t, w_narrow),
                    lambda _: gather_vals(t, w_mid),
                    lambda _: gather_vals(t, w_wide),
                ],
                None,
            )

        if n_groups:
            def group(g, acc):
                # 8 tiles' values staged lane-spread into vstash, then
                # re-tiled by ONE (64, 8192) @ (8192, 128) matmul.
                for k in range(8):
                    vals = tile_vals(g * 8 + k)
                    vstash_ref[pl.ds(k * 1024, 1024), :] = vals * sel_pm
                outt = bdot(aout8, vstash_ref[:])
                dstw_ref[pl.ds(g * 64, 64), :] = outt.astype(jnp.int32)
                return acc

            jax.lax.fori_loop(0, n_groups, group, jnp.int32(0))
        # Per-tile output relayout for the tail (< 8 tiles).
        if rem_tiles:
            aout = ind(
                jnp.floor(fiota((8, 1024), 1) * (1.0 / LANES)),
                fiota((8, 1024), 0),
            )
            for k in range(rem_tiles):
                t = n_groups * 8 + k
                vals = tile_vals(t)
                outt = bdot(aout, vals * sel_pm)
                dstw_ref[pl.ds(t * 8, 8), :] = outt.astype(jnp.int32)

        # Zero-pad contract: bytes past declen are zero.
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (d_rows, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (d_rows, LANES), 1)
        )
        dst_ref[0] = jnp.where(pos < declen, dstw_ref[:], 0).astype(jnp.uint8)

    return kernel


def _make_flat_v2_kernel(s_rows: int, d_rows: int, arms: int = 3):
    """Flat-gather decode, v2: transposed idx layout + MXU transpose out.

    The v1 kernel's stage profile on a healthy chip (FLAT_PROFILE.json,
    2026-08-19) shows the routing matmul — the actual gather — is only
    ~16% of kernel time; the element-major relayouts around it (input
    fdot + select, output aout8 matmul + vstash staging) and the f32
    one-hot build eat the rest. v2 removes the relayouts structurally:

    - The host writes ``idx`` PRE-PERMUTED (:func:`flat_v2_permute`):
      each 16-tile group is a natural ``(128, 128)`` block whose column
      ``tt*8 + s`` holds tile ``tt``'s output-row-``s`` indices at
      sublanes — so per-element row/lane splits come from cheap static
      column slices, with no input relayout at all.
    - Each tile's one-hot is built directly in its matmul layout
      ``(1024, w)`` as 8 dense ``(128, w)`` pieces (sublane-offset
      writes), feeding ONE ``(1024, w) @ (w, 128)`` routing matmul per
      tile (M=1024 keeps the MXU full; 8 per-column M=128 matmuls
      would pay 8 fill/drain latencies).
    - Outputs collect as columns of a ``(128, 128)`` scratch and leave
      through ONE MXU transpose per 16-tile group
      (``dot_general(outt, I)`` contracting dim 0 — bytes <= 255 are
      bf16-exact), written straight to ``dst`` — no dstw scratch.
    """
    n_tiles = d_rows // 8
    n_groups = d_rows // 128

    _r128 = _round128

    # Window widths are the host's buckets rounded UP to 128-multiples:
    # bf16 operands with partial lane-tiles fail Mosaic tiling checks.
    # The host's fit test and base clamp use min(w, s_rows), so a
    # rounded-up kernel window only ever adds rows past the host window
    # — covered by the zero-padded tail of the src scratch.
    #
    # ``arms`` restricts the per-tile switch to the first N buckets —
    # block-level routing (round 4): batches whose rows are all-narrow
    # run arms=1 (branchless; per-tile control flow, not FLOPs, binds
    # this kernel — R3_NOTES §2), max-mid rows run arms=2.
    widths = [_r128(min(w, s_rows)) for w in (128, 256, 512)[:arms]]
    w_max = widths[-1]
    s_scr = max(s_rows, w_max)

    def kernel(meta_ref, declen_ref, src_ref, idx_ref, dst_ref, srcw_ref,
               *scratch):
        oh_refs = scratch[:arms]
        sel_ref, outt_ref = scratch[arms], scratch[arms + 1]
        # One full-width one-hot scratch per bucket: partial lane-slice
        # writes to a shared bf16 scratch (oh[:, :w]) crash the Mosaic
        # compiler's tiling checks (tools/v2_bisect.py).
        oh_by_w = {}
        for ref, w in zip(oh_refs, widths):
            oh_by_w.setdefault(w, ref)
        i = pl.program_id(0)
        declen = declen_ref[i]
        srcw_ref[pl.ds(0, s_rows), :] = src_ref[0].astype(jnp.int32)
        if s_scr > s_rows:
            srcw_ref[pl.ds(s_rows, s_scr - s_rows), :] = jnp.zeros(
                (s_scr - s_rows, LANES), jnp.int32
            )

        fiota, ind = _flat_fiota, _flat_ind

        lane2f = fiota((128, LANES), 1)
        # Identity for the MXU transpose (0/1, bf16-exact).
        ident = ind(fiota((128, 128), 0), fiota((128, 128), 1)).astype(
            jnp.bfloat16
        )

        def bdot(a, b):
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16),
                b.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def tile_into(blk, tt, base, w):
            # Build the (1024, w) one-hot and (1024, 128) lane-select
            # in 8 dense (128, ...) pieces from the block's columns.
            oh_ref = oh_by_w[w]
            for s in range(8):
                col = blk[:, tt * 8 + s : tt * 8 + s + 1].astype(jnp.float32)
                row_em = jnp.floor(col * (1.0 / LANES))
                lane_em = col - row_em * LANES
                oh_ref[pl.ds(s * 128, 128), :] = ind(
                    fiota((128, w), 1), row_em
                ).astype(jnp.bfloat16)
                # sel stores bf16 (0/1 exact): halves select scratch
                # traffic, measured +3% (FLAT_AB2.json).
                sel_ref[pl.ds(s * 128, 128), :] = ind(lane2f, lane_em).astype(
                    jnp.bfloat16
                )
            win = srcw_ref[pl.ds(base, w), :]
            routed = jax.lax.dot_general(
                oh_ref[:],
                win.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            vals = jnp.sum(
                routed * sel_ref[:].astype(jnp.float32), axis=1, keepdims=True
            )
            for s in range(8):
                outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = vals[
                    s * 128 : (s + 1) * 128, :
                ]

        # Groups wholly past declen (partial tail blocks) skip the
        # gather work and emit zeros — measured +7% on the corpus batch
        # (FLAT_AB2.json; ~11% of its tiles are pad).
        n_active = (declen + 16383) // 16384

        def group(g, acc):
            def live_group(_):
                # idx ships and stages as uint16 (halves its HBM and
                # VMEM footprint; +2.6% measured, FLAT_AB2.json) and
                # widens at the block read.
                blk = idx_ref[0, pl.ds(g * 128, 128), :].astype(jnp.int32)
                for tt in range(16):
                    t = g * 16 + tt
                    base = meta_ref[i * n_tiles * 2 + 2 * t]
                    bucket = meta_ref[i * n_tiles * 2 + 2 * t + 1]

                    def mk(w):
                        def f(_):
                            tile_into(blk, tt, base, w)
                            return 0

                        return f

                    if arms == 1:
                        mk(widths[0])(None)
                    else:
                        jax.lax.switch(
                            bucket, [mk(w) for w in widths], None
                        )
                return 0

            def dead_group(_):
                outt_ref[:] = jnp.zeros((128, 128), jnp.float32)
                return 0

            jax.lax.cond(g < n_active, live_group, dead_group, None)
            # MXU transpose: T[a, b] = outt[b, a]; bytes are bf16-exact.
            t_out = jax.lax.dot_general(
                outt_ref[:].astype(jnp.bfloat16),
                ident,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # Zero-pad contract: bytes past declen are zero.
            pos = (
                g * (128 * LANES)
                + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 1)
            )
            dst_ref[0, pl.ds(g * 128, 128), :] = jnp.where(
                pos < declen, t_out.astype(jnp.int32), 0
            ).astype(jnp.uint8)
            return acc

        jax.lax.fori_loop(0, n_groups, group, jnp.int32(0))

    return kernel


def _make_flat_v3_kernel(s_rows: int, d_rows: int, w_nom: int, k: int):
    """Flat-gather decode, v3: one zero-branch kernel per window bucket.

    The round-3 A/B record pinned the v2 kernel's gap to its matmul
    ceiling on the per-tile 3-way width switch: Mosaic runs the 3-branch
    mix at ~52 effective TFLOPs while a zero-branch single-width kernel
    runs at ~108 (FLAT_AB2.json, R3_NOTES.md) — switch *arity* (compiled
    code size), not FLOPs, binds the kernel. v3 removes the switch
    structurally: window buckets are raised to each 16-tile group's max
    (host side, +14% FLOPs measured on the corpus batch), and the batch
    decodes in three passes — one ``pallas_call`` per width, each
    compiled with a single static window width and therefore branch-free
    in the tile path. A pass writes zeros for groups owned by the other
    buckets (or past declen), and the three outputs combine with one
    fused bitwise-or.

    Same contract as :func:`_make_flat_v2_kernel` otherwise: pre-permuted
    uint16 idx blocks (:func:`flat_v2_permute`), per-tile window bases in
    ``meta``, MXU one-hot routing + MXU transpose out, zero-pad past
    declen. Replaces the tag-dispatch loop of
    ``src/decompress.rs:130-148``.
    """
    n_tiles = d_rows // 8
    n_groups = d_rows // 128

    _r128 = _round128

    w = _r128(min(w_nom, s_rows))
    # Bumped tiles keep their own (smaller-bucket) base, whose clamp was
    # ``base <= s_rows - min(128, s_rows)``; the widened window can
    # overhang s_rows by up to (w_nom - 128) rows of zero padding.
    s_scr = max(s_rows + max(w_nom - 128, 0), w)

    def kernel(meta_ref, gbuck_ref, declen_ref, src_ref, idx_ref, dst_ref,
               srcw_ref, oh_ref, sel_ref, outt_ref):
        i = pl.program_id(0)
        declen = declen_ref[i]
        srcw_ref[pl.ds(0, s_rows), :] = src_ref[0].astype(jnp.int32)
        if s_scr > s_rows:
            srcw_ref[pl.ds(s_rows, s_scr - s_rows), :] = jnp.zeros(
                (s_scr - s_rows, LANES), jnp.int32
            )

        fiota, ind = _flat_fiota, _flat_ind

        lane2f = fiota((128, LANES), 1)
        ident = ind(fiota((128, 128), 0), fiota((128, 128), 1)).astype(
            jnp.bfloat16
        )

        def tile_into(blk, tt, base):
            for s in range(8):
                col = blk[:, tt * 8 + s : tt * 8 + s + 1].astype(jnp.float32)
                row_em = jnp.floor(col * (1.0 / LANES))
                lane_em = col - row_em * LANES
                oh_ref[pl.ds(s * 128, 128), :] = ind(
                    fiota((128, w), 1), row_em
                ).astype(jnp.bfloat16)
                sel_ref[pl.ds(s * 128, 128), :] = ind(lane2f, lane_em).astype(
                    jnp.bfloat16
                )
            win = srcw_ref[pl.ds(base, w), :]
            routed = jax.lax.dot_general(
                oh_ref[:],
                win.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            vals = jnp.sum(
                routed * sel_ref[:].astype(jnp.float32), axis=1, keepdims=True
            )
            for s in range(8):
                outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = vals[
                    s * 128 : (s + 1) * 128, :
                ]

        def group(g, acc):
            def live_group(_):
                blk = idx_ref[0, pl.ds(g * 128, 128), :].astype(jnp.int32)
                for tt in range(16):
                    t = g * 16 + tt
                    base = meta_ref[i * n_tiles * 2 + 2 * t]
                    tile_into(blk, tt, base)
                # MXU transpose: T[a, b] = outt[b, a]; bytes are bf16-exact.
                t_out = jax.lax.dot_general(
                    outt_ref[:].astype(jnp.bfloat16),
                    ident,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                pos = (
                    g * (128 * LANES)
                    + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 0)
                    * LANES
                    + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 1)
                )
                dst_ref[0, pl.ds(g * 128, 128), :] = jnp.where(
                    pos < declen, t_out.astype(jnp.int32), 0
                ).astype(jnp.uint8)
                return 0

            def other_group(_):
                dst_ref[0, pl.ds(g * 128, 128), :] = jnp.zeros(
                    (128, LANES), jnp.uint8
                )
                return 0

            jax.lax.cond(
                gbuck_ref[i * n_groups + g] == k, live_group, other_group, None
            )
            return acc

        jax.lax.fori_loop(0, n_groups, group, jnp.int32(0))

    return kernel


def _make_flat_v4_kernel(s_rows: int, d_rows: int):
    """Flat-gather decode, v4: single pass, group-level width switch.

    Same group-homogeneous buckets as v3 (:func:`group_buckets`), but
    one kernel with a 3-way ``lax.switch`` per 16-tile group instead of
    per tile — 16x fewer switch executions than v2 at the same compiled
    arity, without v3's triple-pass fixed costs. A/B'd against v2/v3 on
    hardware (FLAT_AB4.json).
    """
    n_tiles = d_rows // 8
    n_groups = d_rows // 128

    _r128 = _round128

    w_narrow = _r128(min(128, s_rows))
    w_mid = _r128(min(256, s_rows))
    w_wide = _r128(min(512, s_rows))
    s_scr = max(s_rows + 384, w_wide)

    def kernel(meta_ref, gbuck_ref, declen_ref, src_ref, idx_ref, dst_ref,
               srcw_ref, oh_n_ref, oh_m_ref, oh_w_ref, sel_ref, outt_ref):
        oh_by_w = {}
        for ref, w in ((oh_n_ref, w_narrow), (oh_m_ref, w_mid), (oh_w_ref, w_wide)):
            oh_by_w.setdefault(w, ref)
        i = pl.program_id(0)
        declen = declen_ref[i]
        srcw_ref[pl.ds(0, s_rows), :] = src_ref[0].astype(jnp.int32)
        if s_scr > s_rows:
            srcw_ref[pl.ds(s_rows, s_scr - s_rows), :] = jnp.zeros(
                (s_scr - s_rows, LANES), jnp.int32
            )

        fiota, ind = _flat_fiota, _flat_ind

        lane2f = fiota((128, LANES), 1)
        ident = ind(fiota((128, 128), 0), fiota((128, 128), 1)).astype(
            jnp.bfloat16
        )

        def tile_into(blk, tt, base, w):
            oh_ref = oh_by_w[w]
            for s in range(8):
                col = blk[:, tt * 8 + s : tt * 8 + s + 1].astype(jnp.float32)
                row_em = jnp.floor(col * (1.0 / LANES))
                lane_em = col - row_em * LANES
                oh_ref[pl.ds(s * 128, 128), :] = ind(
                    fiota((128, w), 1), row_em
                ).astype(jnp.bfloat16)
                sel_ref[pl.ds(s * 128, 128), :] = ind(lane2f, lane_em).astype(
                    jnp.bfloat16
                )
            win = srcw_ref[pl.ds(base, w), :]
            routed = jax.lax.dot_general(
                oh_ref[:],
                win.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            vals = jnp.sum(
                routed * sel_ref[:].astype(jnp.float32), axis=1, keepdims=True
            )
            for s in range(8):
                outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = vals[
                    s * 128 : (s + 1) * 128, :
                ]

        def group(g, acc):
            def live_at(w):
                def f(_):
                    blk = idx_ref[0, pl.ds(g * 128, 128), :].astype(jnp.int32)
                    for tt in range(16):
                        t = g * 16 + tt
                        base = meta_ref[i * n_tiles * 2 + 2 * t]
                        tile_into(blk, tt, base, w)
                    return 0

                return f

            def dead_group(_):
                outt_ref[:] = jnp.zeros((128, 128), jnp.float32)
                return 0

            gb = gbuck_ref[i * n_groups + g]
            # gbuck is -1 for groups wholly past declen: branch 0.
            jax.lax.switch(
                jnp.clip(gb + 1, 0, 3),
                [dead_group, live_at(w_narrow), live_at(w_mid), live_at(w_wide)],
                None,
            )
            t_out = jax.lax.dot_general(
                outt_ref[:].astype(jnp.bfloat16),
                ident,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pos = (
                g * (128 * LANES)
                + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 1)
            )
            dst_ref[0, pl.ds(g * 128, 128), :] = jnp.where(
                pos < declen, t_out.astype(jnp.int32), 0
            ).astype(jnp.uint8)
            return acc

        jax.lax.fori_loop(0, n_groups, group, jnp.int32(0))

    return kernel


def decode_flat_pallas_v4(
    srcs, idx_phys, tile_meta, gbuck, declens, d_pad: int,
    interpret: bool | None = None,
):
    """v4 flat-gather decode: single pass, group-level switch."""
    if not _PALLAS:
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _decode_flat_pallas_v4(
        srcs, idx_phys, tile_meta, gbuck, declens, d_pad, bool(interpret)
    )


@partial(jax.jit, static_argnames=("d_pad", "interpret"))
def _decode_flat_pallas_v4(
    srcs, idx_phys, tile_meta, gbuck, declens, d_pad: int, interpret: bool
):
    idx_phys = idx_phys.astype(jnp.uint16)
    b, s = srcs.shape
    assert s % LANES == 0 and d_pad % 16384 == 0
    s_rows, d_rows = s // LANES, d_pad // LANES
    n_tiles = d_rows // 8

    _r128 = _round128

    w_narrow = _r128(min(128, s_rows))
    w_mid = _r128(min(256, s_rows))
    w_wide = _r128(min(512, s_rows))
    s_scr = max(s_rows + 384, w_wide)
    kernel = _make_flat_v4_kernel(s_rows, d_rows)
    dst = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, s_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d_rows, LANES), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((s_scr, LANES), jnp.int32),
            pltpu.VMEM((1024, w_narrow), jnp.bfloat16),
            pltpu.VMEM((1024, w_mid), jnp.bfloat16),
            pltpu.VMEM((1024, w_wide), jnp.bfloat16),
            pltpu.VMEM((1024, LANES), jnp.bfloat16),
            pltpu.VMEM((128, 128), jnp.float32),
        ],
        interpret=interpret,
    )(
        tile_meta.reshape(b * n_tiles * 2),
        gbuck.reshape(b * (d_rows // 128)),
        declens.astype(jnp.int32),
        srcs.reshape(b, s_rows, LANES),
        idx_phys.reshape(b, d_rows, LANES),
    )
    return dst.reshape(b, d_pad)


def group_buckets(tile_meta, declens, d_pad: int):
    """Host-side group bucket assignment for the v3 flat kernels.

    ``tile_meta``: ``(B, d_pad//1024, 2)`` int32 from
    :func:`snappy_tpu.native.flatten_idx_batch`. Each 16-tile (16 KiB)
    group takes the max bucket over its tiles (every tile's window-
    relative indices stay valid under a wider window — the base is
    unchanged); groups wholly past declen get -1 so no pass touches
    them (all passes emit zeros there). Returns ``(B, d_pad//16384)``
    int32.
    """
    b, t, _ = tile_meta.shape
    assert d_pad % 16384 == 0 and t == d_pad // 1024
    g = t // 16
    gb = np.asarray(tile_meta)[:, :, 1].reshape(b, g, 16).max(axis=2)
    n_active = (np.asarray(declens).astype(np.int64) + 16383) // 16384
    dead = np.arange(g)[None, :] >= n_active[:, None]
    return np.where(dead, -1, gb).astype(np.int32)


def decode_flat_pallas_v3(
    srcs, idx_phys, tile_meta, gbuck, declens, d_pad: int,
    interpret: bool | None = None,
):
    """v3 flat-gather decode: three zero-branch per-width passes.

    Same contract as :func:`decode_flat_pallas_v2` plus ``gbuck`` from
    :func:`group_buckets`. Byte-exact with v1/v2 (pinned by tests).
    """
    if not _PALLAS:
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _decode_flat_pallas_v3(
        srcs, idx_phys, tile_meta, gbuck, declens, d_pad, bool(interpret)
    )


@partial(jax.jit, static_argnames=("d_pad", "interpret"))
def _decode_flat_pallas_v3(
    srcs, idx_phys, tile_meta, gbuck, declens, d_pad: int, interpret: bool
):
    idx_phys = idx_phys.astype(jnp.uint16)
    b, s = srcs.shape
    assert s % LANES == 0 and d_pad % 16384 == 0
    s_rows, d_rows = s // LANES, d_pad // LANES
    n_tiles = d_rows // 8

    _r128 = _round128

    outs = []
    for k, w_nom in enumerate((128, 256, 512)):
        kernel = _make_flat_v3_kernel(s_rows, d_rows, w_nom, k)
        w = _r128(min(w_nom, s_rows))
        s_scr = max(s_rows + max(w_nom - 128, 0), w)
        outs.append(
            pl.pallas_call(
                kernel,
                grid=(b,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, s_rows, LANES), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((b, d_rows, LANES), jnp.uint8),
                scratch_shapes=[
                    pltpu.VMEM((s_scr, LANES), jnp.int32),
                    pltpu.VMEM((1024, w), jnp.bfloat16),
                    pltpu.VMEM((1024, LANES), jnp.bfloat16),
                    pltpu.VMEM((128, 128), jnp.float32),
                ],
                interpret=interpret,
            )(
                tile_meta.reshape(b * n_tiles * 2),
                gbuck.reshape(b * (d_rows // 128)),
                declens.astype(jnp.int32),
                srcs.reshape(b, s_rows, LANES),
                idx_phys.reshape(b, d_rows, LANES),
            )
        )
    # Disjoint supports (each group is owned by exactly one pass, or by
    # none past declen): one fused elementwise OR assembles the batch.
    dst = outs[0] | outs[1] | outs[2]
    return dst.reshape(b, d_pad)


def flat_v2_permute(idx_rel, d_pad: int):
    """Host-side layout permutation for the v2 flat kernel.

    ``idx_rel``: ``(B, d_pad)`` uint16 in output order (from
    :func:`snappy_tpu.native.flatten_idx_batch`). Returns the same
    values re-laid so that each 16-tile (16 KiB) group forms a
    ``(128, 128)`` device block with column ``tt*8 + s`` holding tile
    ``tt`` / output-row ``s``'s 128 lane indices at sublanes:
    ``phys[g, l, tt*8 + s] = idx_rel[g*16384 + tt*1024 + s*128 + l]``.
    """
    b = idx_rel.shape[0]
    assert d_pad % 16384 == 0, d_pad
    g = d_pad // 16384
    x = idx_rel.reshape(b, g, 16, 8, LANES)
    return np.ascontiguousarray(x.transpose(0, 1, 4, 2, 3)).reshape(b, d_pad)


def decode_flat_pallas_v2(
    srcs, idx_phys, tile_meta, declens, d_pad: int,
    interpret: bool | None = None, arms: int = 3,
):
    """v2 flat-gather decode: pre-permuted per-byte indices in, bytes out.

    Same contract as :func:`decode_flat_pallas` except ``idx_phys`` must
    be in the :func:`flat_v2_permute` layout and ``d_pad`` a multiple of
    16384 (16-tile groups). Callers with other widths use v1.
    """
    if not _PALLAS:
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _decode_flat_pallas_v2(
        srcs, idx_phys, tile_meta, declens, d_pad, bool(interpret), int(arms)
    )


@partial(jax.jit, static_argnames=("d_pad", "interpret", "arms"))
def _decode_flat_pallas_v2(srcs, idx_phys, tile_meta, declens, d_pad: int,
                           interpret: bool, arms: int = 3):
    idx_phys = idx_phys.astype(jnp.uint16)
    b, s = srcs.shape
    assert s % LANES == 0 and d_pad % (128 * LANES) == 0
    s_rows, d_rows = s // LANES, d_pad // LANES
    n_tiles = d_rows // 8

    kernel = _make_flat_v2_kernel(s_rows, d_rows, arms)

    _r128 = _round128

    widths = [_r128(min(w, s_rows)) for w in (128, 256, 512)[:arms]]
    s_scr = max(s_rows, widths[-1])
    dst = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, s_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d_rows, LANES), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((s_scr, LANES), jnp.int32),
            *[pltpu.VMEM((1024, w), jnp.bfloat16) for w in widths],
            pltpu.VMEM((1024, LANES), jnp.bfloat16),
            pltpu.VMEM((128, 128), jnp.float32),
        ],
        interpret=interpret,
    )(
        tile_meta.reshape(b * n_tiles * 2),
        declens.astype(jnp.int32),
        srcs.reshape(b, s_rows, LANES),
        idx_phys.reshape(b, d_rows, LANES),
    )
    return dst.reshape(b, d_pad)


def decode_flat_pallas(srcs, idx, tile_meta, declens, d_pad: int, interpret: bool | None = None):
    """Flat-gather decode: host-flattened per-byte indices in, bytes out.

    ``srcs``: ``(B, S)`` uint8 zero-padded compressed bodies;
    ``idx``: ``(B, d_pad)`` uint16 (or any int dtype) window-relative
    source indices from
    :func:`snappy_tpu.native.flatten_idx_batch`; ``tile_meta``:
    ``(B, d_pad//1024, 2)`` int32 (window base row, bucket). Returns
    ``(B, d_pad)`` uint8 with the zero-pad contract. Error codes come
    from the host flatten scan (lockstep device-validation mirror), so
    together they reproduce ``decode_batch``'s (bytes, err) contract.
    """
    if not _PALLAS:
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _decode_flat_pallas(srcs, idx, tile_meta, declens, d_pad, bool(interpret))


@partial(jax.jit, static_argnames=("d_pad", "interpret"))
def _decode_flat_pallas(srcs, idx, tile_meta, declens, d_pad: int, interpret: bool):
    # Callers ship uint16 window-relative indices (half the PCIe bytes
    # of int32); widen on device before the kernel.
    idx = idx.astype(jnp.int32)
    b, s = srcs.shape
    assert s % LANES == 0 and d_pad % 1024 == 0
    s_rows, d_rows = s // LANES, d_pad // LANES
    n_tiles = d_rows // 8

    kernel = _make_flat_kernel(s_rows, d_rows)
    dst = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, s_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d_rows, LANES), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((s_rows, LANES), jnp.int32),
            pltpu.VMEM((d_rows, LANES), jnp.int32),
            pltpu.VMEM((8 * 1024, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        tile_meta.reshape(b * n_tiles * 2),
        declens.astype(jnp.int32),
        srcs.reshape(b, s_rows, LANES),
        idx.reshape(b, d_rows, LANES),
    )
    return dst.reshape(b, d_pad)


def decode_records_pallas(
    srcs,
    recs,
    nops,
    declens,
    d_pad: int,
    interpret: bool | None = None,
    compose: bool | None = None,
):
    """Replay pre-validated op records (host scan) into output blocks.

    ``srcs``: ``(B, S)`` uint8 zero-padded compressed bodies (literal
    content source); ``recs``: ``(B, R, 2)`` int32 packed records from
    :func:`snappy_tpu.native.scan_records_batch` (R a multiple of 512);
    ``nops``: ``(B,)`` valid-op counts (must be <= R — the caller
    handles overflow by falling back to :func:`decode_batch_pallas`).
    Returns ``(B, d_pad)`` uint8 with the usual zero-pad contract.
    Error codes come from the host scan, not this kernel — together
    they reproduce ``decode_batch``'s (bytes, err) contract exactly.
    Selected via ``Config.pallas_records=True`` (opt-in until its
    Mosaic compile is A/B-verified on a healthy chip). ``compose``
    (default: ``Config.pallas_compose``) swaps in the
    compose-in-register move machinery."""
    if not _PALLAS:
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if compose is None:
        from ...config import get_config

        compose = get_config().pallas_compose
    return _decode_records_pallas(
        srcs, recs, nops, declens, d_pad, bool(interpret), bool(compose)
    )


@partial(jax.jit, static_argnames=("d_pad", "interpret", "compose"))
def _decode_records_pallas(srcs, recs, nops, declens, d_pad: int, interpret: bool, compose: bool):
    b, s = srcs.shape
    _, r, two = recs.shape
    assert two == 2 and s % LANES == 0 and d_pad % LANES == 0
    # Rank-1 SMEM blocks must be multiples of the (1024,) SMEM tiling.
    assert (2 * r) % 1024 == 0, r
    s_rows, d_rows = s // LANES, d_pad // LANES

    make = _make_records_compose_kernel if compose else _make_records_kernel
    kernel = make(s_rows, d_rows)
    dst = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2 * r,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, s_rows, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d_rows, LANES), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((s_rows, LANES), jnp.int32),
            pltpu.VMEM((d_rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(
        nops.astype(jnp.int32),
        declens.astype(jnp.int32),
        recs.reshape(b * r * 2),
        srcs.reshape(b, s_rows, LANES),
    )
    return dst.reshape(b, d_pad)


def decode_batch_pallas(
    srcs,
    src_lens,
    declens,
    d_pad: int,
    interpret: bool | None = None,
    fastpath: bool | str | None = None,
):
    """Pallas twin of :func:`snappy_tpu.ops.decode.decode_batch`.

    ``srcs``: ``(B, S)`` uint8 zero-padded (S a multiple of 128);
    returns ``(dst (B, d_pad) uint8, err (B,) int32)`` with byte-exact
    output and the same device error codes. Lowers and runs byte-correct
    on real TPU hardware (``BENCH_TPU_VALIDATE.json``); ``interpret``
    defaults to the backend's native mode (compiled on TPU, interpreter
    elsewhere). Selected in production via ``SNAPPY_TPU_PALLAS_DECODE=1``
    (see ``ops.api.decompress_streams``): measured 2-4x faster than the
    XLA formulation on the development chip (``BENCH_PALLAS_VS_XLA.json``)
    because the whole block stays VMEM/SMEM-resident.

    ``fastpath`` (default: the ``SNAPPY_TPU_PALLAS_FASTPATH`` env knob,
    off unless set) selects the move machinery: ``False`` = bulk/
    doubling loops everywhere; ``True`` = loop-free single-window moves
    for ops that fit one 128-byte window; ``"compose"`` = the
    compose-in-register kernel (tail row carried in a vector register,
    no dst read-modify-write, one periodic gather resolves any overlap
    copy). All three are byte-exact on the full interpret suite; the
    env knob takes ``0``/``1``/``compose``.
    """
    if not _PALLAS:
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if fastpath is None:
        from ...config import get_config

        knob = get_config().pallas_fastpath
        fastpath = "compose" if knob == "compose" else knob == "1"
    mode = fastpath if isinstance(fastpath, str) else ("fast" if fastpath else "plain")
    return _decode_batch_pallas(
        srcs, src_lens, declens, d_pad, bool(interpret), mode
    )


@partial(jax.jit, static_argnames=("d_pad", "interpret", "mode"))
def _decode_batch_pallas(srcs, src_lens, declens, d_pad: int, interpret: bool, mode: str):
    b, s = srcs.shape
    assert s % LANES == 0 and d_pad % LANES == 0
    s_rows, d_rows = s // LANES, d_pad // LANES
    # Rank-1 SMEM blocks must be multiples of the (1024,) SMEM tiling.
    s_sm = -(-s // 1024) * 1024

    if mode == "compose":
        kernel = _make_compose_kernel(s_rows, d_rows)
    else:
        kernel = _make_kernel(s_rows, d_rows, mode == "fast")
    dst, err = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, s_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((s_sm,), lambda i: (i,), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d_rows, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((b,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((s_rows, LANES), jnp.int32),
            pltpu.VMEM((d_rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(
        src_lens.astype(jnp.int32),
        declens.astype(jnp.int32),
        srcs.reshape(b, s_rows, LANES),
        jnp.pad(srcs.astype(jnp.int32), ((0, 0), (0, s_sm - s))).reshape(b * s_sm),
    )
    return dst.reshape(b, d_pad), err
