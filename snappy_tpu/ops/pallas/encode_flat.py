"""Pallas TPU flat encoder: lane-parallel segment parse + gather emission.

The round-4 device fast encoder (the decode flat-gather kernel's
analogue for compression). The insight that unlocks vectorization: with
pure-greedy acceptance the parse decision at position ``p`` depends only
on positional precomputed data (candidate offset, chain-consistency
length estimate, skip hop) — never on parser history. That makes every
512-byte segment's walk independent, so one kernel runs 128 segment
walks in lockstep, one segment per vector SUBLANE (Mosaic implements
lane broadcasts but not sublane broadcasts, so per-segment state rides
``(128, 1)`` vectors and segment data rides ``(128, SEG)`` blocks):

- segment-local reads (the packed jump word, the u32-at-p array) are
  one masked multiply-reduce over a ``(128, SEG)`` VMEM block;
- the only cross-segment data need — comparing match bytes at the
  candidate source ``q = p - off`` during extension — routes through
  bf16 one-hot MXU matmuls against four byte-shifted copies of the
  block (bytes <= 255 are bf16-exact), the decode kernel's
  windowed-gather machinery (``decode.py:_make_flat_v2_kernel``);
- matches truncate at segment ends (GREEDY2_PROTO.json: +0.2% total
  cost) and literal runs merge across segments at emission, so output
  quality is the prototype's: below the reference encoder on every
  corpus file.

Algorithm quality matches ``tools/greedy_parse_proto2.py`` (pure greedy
+ isolated-copy skip + chain-estimate-first extension); the reference
counterpart is the hash-probe loop in ``src/compress.rs:195-317`` —
same output contract (valid Snappy, size <= reference), parallel
formulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except Exception:  # pragma: no cover
    _PALLAS = False

LANES = 128
SEG = 512
S = 65536
NSEG = S // SEG  # 128 segments = 128 sublanes

#: Copy records per segment. The corpus maxes at 111 (GREEDY2_PROTO);
#: the theoretical cap is a copy every 4 bytes = 128. Overflowing lanes
#: flag their block for the host/XLA fallback (never observed on real
#: data, but crafted input could hit it).
MAX_REC = 144

#: Jump-word layout (one int32 per position, segment layout):
#:   candidate:      bit 27 = 1, bits [0,16) = offset,
#:                   bits [16,26) = capped length estimate
#:   non-candidate:  bits [0,10) = next-candidate row within segment
#:                   (SEG when none -> lane parks at segment end)
JW_CAND = 1 << 27


def _ind(a, b):
    return jnp.maximum(jnp.float32(1) - jnp.abs(a - b), jnp.float32(0))


def _fiota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _make_parse_kernel():
    """Kernel body: 128 lockstep segment walks for one 64 KiB block."""

    def kernel(len_ref, jw_ref, u32_ref, planes_ref, rec0_ref, rec1_ref,
               cnt_ref, oh_ref):
        i = pl.program_id(0)
        n = len_ref[i]

        segv = jax.lax.broadcasted_iota(jnp.int32, (NSEG, 1), 0)
        lo = segv * SEG  # segment base (absolute)
        hi = jnp.minimum(lo + SEG, n)  # segment end

        colf = _fiota((NSEG, SEG), 1)
        lane2f = _fiota((NSEG, LANES), 1)
        recf = _fiota((NSEG, MAX_REC), 1)

        def seg_read(ref, j):
            # (NSEG,1) per-segment own-row read at column j (clipped;
            # callers mask dead lanes): masked multiply-reduce over the
            # (NSEG, SEG) block.
            jj = jnp.clip(j, 0, SEG - 1).astype(jnp.float32)
            sel = _ind(colf, jj)
            return jnp.sum(ref[0] * sel.astype(jnp.int32), axis=1,
                           keepdims=True)

        def q_read_u32(a):
            # (NSEG,1) little-endian u32 at arbitrary absolute position
            # a per segment: one one-hot row routing against the four
            # shifted byte planes (bf16-exact), then a lane select.
            r = jnp.clip(a >> 7, 0, 511).astype(jnp.float32)
            c = (a & 127).astype(jnp.float32)
            oh_ref[:] = _ind(_fiota((NSEG, 512), 1), r).astype(jnp.bfloat16)
            acc = jnp.zeros((NSEG, 1), jnp.int32)
            sel = _ind(lane2f, c)
            for k in range(4):
                routed = jax.lax.dot_general(
                    oh_ref[:],
                    planes_ref[0, pl.ds(k * 512, 512), :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (NSEG, LANES): row s = plane row r_s
                byte = jnp.sum(routed * sel, axis=1, keepdims=True)
                acc = acc | (byte.astype(jnp.int32) << (8 * k))
            return acc

        def tz_bytes(x):
            return jnp.where(
                x & 0xFF != 0, 0,
                jnp.where(x & 0xFFFF != 0, 1,
                          jnp.where(x & 0xFFFFFF != 0, 2,
                                    jnp.where(x != 0, 3, 4))))

        zero = jnp.zeros((NSEG, 1), jnp.int32)

        def body(st):
            p, mode, lp, offc, k, _alive = st
            alive = p < hi
            scan_m = alive & (mode == 0)

            # --- scan: read the packed jump word at p ---
            jw = seg_read(jw_ref, p - lo)
            cand = (jw & JW_CAND) != 0
            offv = jw & 0xFFFF
            lhat = (jw >> 16) & 0x3FF
            nxtj = jw & 0x3FF  # non-candidate: next candidate column

            # scan->extension fusion: a found candidate enters extension
            # THIS iteration (saves one lockstep round per record)
            start_ext = scan_m & cand
            lp = jnp.where(start_ext, lhat, lp)
            offc = jnp.where(start_ext, offv, offc)
            ext_m = alive & ((mode == 1) | start_ext)

            # --- extension: compare 4 bytes at (p+lp, q+lp) ---
            a_p = p + lp
            u32p = seg_read(u32_ref, a_p - lo)
            u32q = q_read_u32(jnp.maximum(a_p - offc, 0))
            rem = hi - a_p
            x = u32p ^ u32q
            adv = jnp.minimum(tz_bytes(x), jnp.maximum(rem, 0))
            new_lp = lp + jnp.where(ext_m, adv, 0)
            ext_done = ext_m & ((adv < 4) | (p + new_lp >= hi))

            # --- record finished copies (column k of the (NSEG, MAX_REC)
            # record blocks) ---
            rec_ok = ext_done & (k < MAX_REC)
            ksel = _ind(recf, jnp.clip(k, 0, MAX_REC - 1).astype(jnp.float32))
            wmask = (ksel * rec_ok.astype(jnp.float32)) > 0
            v0 = (p - lo) | (new_lp << 10)  # pos_rel | len<<10
            rec0_ref[0] = jnp.where(wmask, v0, rec0_ref[0])
            rec1_ref[0] = jnp.where(wmask, offc, rec1_ref[0])

            # --- state update ---
            hop = scan_m & ~cand
            p2 = jnp.where(ext_done, p + new_lp, jnp.where(hop, lo + nxtj, p))
            # overflowing segments park at the segment end (block flagged)
            p2 = jnp.where(ext_done & (k >= MAX_REC), hi, p2)
            mode2 = jnp.where(ext_done, 0, jnp.where(start_ext, 1, mode))
            lp2 = jnp.where(ext_done, zero, new_lp)
            k2 = k + rec_ok.astype(jnp.int32)
            alive2 = p2 < hi
            return (p2, mode2, lp2, offc, k2,
                    jnp.sum(alive2.astype(jnp.int32)))

        rec0_ref[0] = jnp.zeros((NSEG, MAX_REC), jnp.int32)
        rec1_ref[0] = jnp.zeros((NSEG, MAX_REC), jnp.int32)
        init = (lo, zero, zero, jnp.ones((NSEG, 1), jnp.int32), zero,
                jnp.int32(1))
        p, mode, lp, offc, k, _ = jax.lax.while_loop(
            lambda st: st[5] > 0, body, init
        )
        out = jnp.concatenate(
            [k, (k >= MAX_REC).astype(jnp.int32),
             jnp.zeros((NSEG, 6), jnp.int32)], axis=1
        )
        cnt_ref[0] = out

    return kernel


def parse_blocks_pallas(lens, jw, u32seg, planes, interpret: bool | None = None):
    """Run the lockstep parse over a block batch.

    Args (per block row): ``lens (B,)`` int32; ``jw``/``u32seg``
    ``(B, 128, SEG)`` int32 segment layout (row = segment); ``planes
    (B, 4*512, 128)`` bf16 byte-shifted copies of the block (absolute
    layout).

    Returns ``(rec0, rec1, cnt)``: ``(B, 128, MAX_REC)`` int32 packed
    records (pos_rel | len << 10; offset) and ``(B, 128, 8)`` int32
    (col 0 = per-segment record count, col 1 = overflow flag).
    """
    if not _PALLAS:
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _parse_blocks_pallas(lens, jw, u32seg, planes, bool(interpret))


@partial(jax.jit, static_argnames=("interpret",))
def _parse_blocks_pallas(lens, jw, u32seg, planes, interpret: bool):
    b = lens.shape[0]
    kernel = _make_parse_kernel()
    rec0, rec1, cnt = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NSEG, SEG), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, NSEG, SEG), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 4 * 512, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, NSEG, MAX_REC), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, NSEG, MAX_REC), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, NSEG, 8), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, NSEG, MAX_REC), jnp.int32),
            jax.ShapeDtypeStruct((b, NSEG, MAX_REC), jnp.int32),
            jax.ShapeDtypeStruct((b, NSEG, 8), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((NSEG, 512), jnp.bfloat16)],
        interpret=interpret,
    )(lens.astype(jnp.int32), jw, u32seg, planes)
    return rec0, rec1, cnt


# --- fast emission kernels -------------------------------------------------

OUT_ROWS_PAD = 640  # 80 groups of 1024 output bytes (81920 >= OUT_W)
C_NARROW = 256  # narrow content-window rows (per-tile bucket 0)
# Breakpoint window rows per 1024-byte output group. Wire-format worst
# case: every record emits >= 2 bytes and <= 3 breakpoints, so a group
# intersects <= 514 records -> <= 1542 breakpoints + 127 row-alignment
# slack = 1669 < 14*128. No input can overflow this window.
BP_WIN_ROWS = 14
STACK_SRC_ROWS = 512  # block bytes occupy virtual rows [0, 512)


def _make_shift_kernel(nbp_rows: int):
    """Evaluate idx(d) = d + shift(d) per output position.

    shift is a step function (sorted breakpoints, telescoping deltas,
    ops/encode_flat._breakpoints). Per 1024-byte group: the windowed
    step sum rides two thin MXU matmuls per breakpoint row — a rank-1
    broadcast (Mosaic has no sublane broadcast; ``ones @ bp_row`` is
    one) and a contraction against the delta row. All values < 2^24,
    exact in f32.
    """

    def kernel(lo_ref, base_ref, rows_ref, olen_ref, bp_ref, dlt_ref,
               out_ref, tmp_ref):
        i = pl.program_id(0)
        ones_col = jnp.ones((1024, 1), jnp.float32)
        dcol = jax.lax.broadcasted_iota(jnp.int32, (1024, 1), 0)
        ident = _ind(_fiota((128, 128), 0), _fiota((128, 128), 1))
        # only groups below out_len carry real bytes (the emit kernel
        # zero-masks past it) — skipping the rest halves the work on
        # the corpus mix
        ng = (olen_ref[i] + 1023) >> 10

        def group(g, _):
            lo = lo_ref[i * 80 + g]
            b0 = base_ref[i * 80 + g]
            nrows = rows_ref[i * 80 + g]  # actual breakpoint rows (<= 14)
            dg = (dcol + g * 1024).astype(jnp.float32)

            def bprow(j, acc):
                bp = bp_ref[0, pl.ds(lo + j, 1), :].astype(jnp.float32)
                dl = dlt_ref[0, pl.ds(lo + j, 1), :].astype(jnp.float32)
                # HIGHEST precision: the real MXU runs f32 inputs at
                # bf16 unless told otherwise, and bp/delta values use up
                # to 20 mantissa bits (measured off-by-1 idx corruption)
                bc = jax.lax.dot_general(
                    ones_col, bp, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                cmp = (dg >= bc).astype(jnp.float32)
                return acc + jax.lax.dot_general(
                    cmp, dl, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            acc = jax.lax.fori_loop(
                0, nrows, bprow,
                jnp.full((1024, 1), 0.0, jnp.float32),
            )
            idx = acc + b0.astype(jnp.float32) + dg  # idx = d + shift
            # (1024,1) column -> (8,128) natural rows via a (128,8)
            # staging + one MXU transpose (f32-exact for < 2^24)
            for s in range(8):
                tmp_ref[:, s : s + 1] = idx[s * 128 : (s + 1) * 128, :]
            t8 = jax.lax.dot_general(
                tmp_ref[:], ident, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )[:8, :]
            out_ref[0, pl.ds(g * 8, 8), :] = t8.astype(jnp.int32)
            return _

        jax.lax.fori_loop(0, ng, group, jnp.int32(0))

    return kernel


def shift_idx_pallas(lo_row, base, rows_g, out_len, bp_rows, dlt_rows,
                     interpret: bool | None = None):
    """(B, OUT_ROWS_PAD, 128) int32 emission source indices.

    ``rows_g``: per-group actual breakpoint-row counts (<= BP_WIN_ROWS;
    corpus average ~3) — looping only those cut the kernel ~7x vs the
    worst-case-sized static loop. Rows past ceil(out_len/1024) groups
    are never written (callers mask by out_len)."""
    if not _PALLAS:
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _shift_idx_pallas(
        lo_row, base, rows_g, out_len, bp_rows, dlt_rows, bool(interpret)
    )


@partial(jax.jit, static_argnames=("interpret",))
def _shift_idx_pallas(lo_row, base, rows_g, out_len, bp_rows, dlt_rows,
                      interpret):
    b = lo_row.shape[0]
    nbp_rows = bp_rows.shape[1]
    kernel = _make_shift_kernel(nbp_rows)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nbp_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, nbp_rows, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, OUT_ROWS_PAD, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, OUT_ROWS_PAD, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((128, 8), jnp.float32)],
        interpret=interpret,
    )(
        lo_row.reshape(-1).astype(jnp.int32),
        base.reshape(-1).astype(jnp.int32),
        rows_g.reshape(-1).astype(jnp.int32),
        out_len.astype(jnp.int32),
        bp_rows, dlt_rows,
    )


def _make_emit_kernel(stack_rows: int, hdr_w: int):
    """Byte materialization: decode-v2 windowed one-hot gather over the
    virtual source [block bytes (rows 0..512) | header plane].

    idx arrives in the v2 permuted layout (flat_v2_permute), so each
    128-row group block's columns are natural output slices. Content
    routes against the full 512-row src window (no meta needed: the
    window IS the block); header bytes route against a per-tile
    ``hdr_w``-row window of the header plane."""
    n_groups = OUT_ROWS_PAD // 128  # 5

    def kernel(hbase_ref, olen_ref, stack_ref, idx_ref, out_ref,
               ohc_ref, ohh_ref, sel_ref, outt_ref):
        i = pl.program_id(0)
        olen = olen_ref[i]
        lane2f = _fiota((128, LANES), 1)

        def fiota(shape, dim):
            return _fiota(shape, dim)

        ident = _ind(fiota((128, 128), 0), fiota((128, 128), 1)).astype(
            jnp.bfloat16
        )

        # dynamic bound: only group-blocks holding real bytes run the
        # gather; the rest are zero-filled below (zero-past-out_len
        # contract)
        ngb = (olen + 16383) >> 14

        def group(gg, _):
            blk = idx_ref[0, pl.ds(gg * 128, 128), :]
            for tt in range(16):
                hbase = hbase_ref[i * 80 + gg * 16 + tt] * 8
                for s in range(8):
                    col = blk[:, tt * 8 + s : tt * 8 + s + 1]
                    is_hdr = (col >= STACK_SRC_ROWS * LANES).astype(
                        jnp.float32
                    )
                    rowa = col // LANES
                    lane_em = (col % LANES).astype(jnp.float32)
                    rc = jnp.clip(rowa, 0, STACK_SRC_ROWS - 1).astype(
                        jnp.float32
                    )
                    rh = jnp.clip(rowa - hbase, 0, hdr_w - 1).astype(
                        jnp.float32
                    )
                    ohc_ref[pl.ds(s * 128, 128), :] = (
                        _ind(fiota((128, STACK_SRC_ROWS), 1), rc)
                        * (jnp.float32(1) - is_hdr)
                    ).astype(jnp.bfloat16)
                    ohh_ref[pl.ds(s * 128, 128), :] = (
                        _ind(fiota((128, hdr_w), 1), rh)
                        * is_hdr
                    ).astype(jnp.bfloat16)
                    sel_ref[pl.ds(s * 128, 128), :] = _ind(
                        lane2f, lane_em
                    ).astype(jnp.bfloat16)
                winc = stack_ref[0, pl.ds(0, STACK_SRC_ROWS), :]
                routc = jax.lax.dot_general(
                    ohc_ref[:], winc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # hbase ships as an 8-row-group index so Mosaic can
                # prove the dynamic load start is sublane-aligned
                hb = hbase_ref[i * 80 + gg * 16 + tt] * 8
                winh = stack_ref[0, pl.ds(hb, hdr_w), :]
                routh = jax.lax.dot_general(
                    ohh_ref[:], winh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                selv = sel_ref[:].astype(jnp.float32)
                vals = jnp.sum((routc + routh) * selv, axis=1, keepdims=True)
                for s in range(8):
                    outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = vals[
                        s * 128 : (s + 1) * 128, :
                    ]
            t_out = jax.lax.dot_general(
                outt_ref[:].astype(jnp.bfloat16), ident,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pos = (
                gg * (128 * LANES)
                + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 1)
            )
            out_ref[0, pl.ds(gg * 128, 128), :] = jnp.where(
                pos < olen, t_out.astype(jnp.int32), 0
            ).astype(jnp.uint8)
            return _

        jax.lax.fori_loop(0, ngb, group, jnp.int32(0))

        def zfill(gg, _):
            out_ref[0, pl.ds(gg * 128, 128), :] = jnp.zeros(
                (128, LANES), jnp.uint8
            )
            return _

        jax.lax.fori_loop(ngb, n_groups, zfill, jnp.int32(0))

    return kernel


def emit_bytes_pallas(hbase, out_len, stack, idx_perm, hdr_w: int = 256,
                      interpret: bool | None = None):
    """(B, OUT_ROWS_PAD*128) uint8 compressed rows (zero past out_len)."""
    if not _PALLAS:
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _emit_bytes_pallas(
        hbase, out_len, stack, idx_perm, int(hdr_w), bool(interpret)
    )


@partial(jax.jit, static_argnames=("hdr_w", "interpret"))
def _emit_bytes_pallas(hbase, out_len, stack, idx_perm, hdr_w, interpret):
    b = out_len.shape[0]
    stack_rows = stack.shape[1]
    kernel = _make_emit_kernel(stack_rows, hdr_w)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, stack_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, OUT_ROWS_PAD, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, OUT_ROWS_PAD, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, OUT_ROWS_PAD, LANES), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((1024, STACK_SRC_ROWS), jnp.bfloat16),
            pltpu.VMEM((1024, hdr_w), jnp.bfloat16),
            pltpu.VMEM((1024, LANES), jnp.bfloat16),
            pltpu.VMEM((128, 128), jnp.float32),
        ],
        interpret=interpret,
    )(
        hbase.reshape(-1).astype(jnp.int32),
        out_len.astype(jnp.int32),
        stack, idx_perm,
    )
    return out.reshape(b, OUT_ROWS_PAD * LANES)


def _make_fused_emit_kernel(stack_rows: int, hdr_w: int):
    """Fused shift + gather: one kernel from breakpoints to bytes.

    The split pipeline computed idx in one kernel ((1024,1) columns,
    MXU-transposed to rows), round-tripped it through HBM, permuted it
    in XLA, and re-sliced it into (128,1) columns for the gather's
    one-hot builds. But the gather consumes exactly the column slices
    the shift produces — fusing removes the idx HBM traffic, the
    permute, the staging transpose, and a launch. The header window
    base comes in precomputed from record counts (closed form, no
    idx-dependent reduce).
    """

    def kernel(lo_ref, base_ref, rows_ref, hb8_ref, cb8_ref, cbk_ref,
               olen_ref, bp_ref, dlt_ref, stack_ref, out_ref, ohc_ref,
               ohn_ref, ohh_ref, sel_ref, outt_ref):
        i = pl.program_id(0)
        olen = olen_ref[i]
        ones_col = jnp.ones((1024, 1), jnp.float32)
        dcol = jax.lax.broadcasted_iota(jnp.int32, (1024, 1), 0)
        lane2f = _fiota((128, LANES), 1)
        ident = _ind(_fiota((128, 128), 0), _fiota((128, 128), 1)).astype(
            jnp.bfloat16
        )
        ngb = (olen + 16383) >> 14
        n_groups = OUT_ROWS_PAD // 128

        def group(gg, _):
            for tt in range(16):
                g = gg * 16 + tt
                lo = lo_ref[i * 80 + g]
                b0 = base_ref[i * 80 + g]
                nrows = rows_ref[i * 80 + g]
                hbase = hb8_ref[i * 80 + g] * 8
                dg = (dcol + g * 1024).astype(jnp.float32)

                def bprow(j, acc):
                    # pure-VPU step sum with IMPLICIT broadcasts: the
                    # (1024,1) vs (1,128) compare/multiply stay in
                    # registers; explicit broadcast_to materialized
                    # ~1 MB of VMEM traffic per row and was 52% of the
                    # kernel (FUSED_PROFILE.json)
                    bp = bp_ref[0, pl.ds(lo + j, 1), :].astype(jnp.float32)
                    dl = dlt_ref[0, pl.ds(lo + j, 1), :].astype(jnp.float32)
                    cmp = (dg >= bp).astype(jnp.float32)
                    return acc + jnp.sum(cmp * dl, axis=1, keepdims=True)

                acc = jax.lax.fori_loop(
                    0, nrows, bprow, jnp.zeros((1024, 1), jnp.float32)
                )
                idx = (acc + b0.astype(jnp.float32) + dg).astype(jnp.int32)
                for s in range(8):
                    col = idx[s * 128 : (s + 1) * 128, :]
                    is_hdr = (col >= STACK_SRC_ROWS * LANES).astype(
                        jnp.float32
                    )
                    rowa = col // LANES
                    lane_em = (col % LANES).astype(jnp.float32)
                    rh = jnp.clip(rowa - hbase, 0, hdr_w - 1).astype(
                        jnp.float32
                    )
                    ohh_ref[pl.ds(s * 128, 128), :] = (
                        _ind(_fiota((128, hdr_w), 1), rh) * is_hdr
                    ).astype(jnp.bfloat16)
                    sel_ref[pl.ds(s * 128, 128), :] = _ind(
                        lane2f, lane_em
                    ).astype(jnp.bfloat16)
                cbk = cbk_ref[i * 80 + g]
                cbase = cb8_ref[i * 80 + g] * 8

                def route_narrow(_):
                    # conservative per-tile source-span bounds say the
                    # content fits a 256-row window: half the build and
                    # half the routing matmul (~95% of corpus tiles)
                    for s2 in range(8):
                        col2 = idx[s2 * 128 : (s2 + 1) * 128, :]
                        is_h2 = (col2 >= STACK_SRC_ROWS * LANES).astype(
                            jnp.float32
                        )
                        rn = jnp.clip(
                            col2 // LANES - cbase, 0, C_NARROW - 1
                        ).astype(jnp.float32)
                        ohn_ref[pl.ds(s2 * 128, 128), :] = (
                            _ind(_fiota((128, C_NARROW), 1), rn)
                            * (jnp.float32(1) - is_h2)
                        ).astype(jnp.bfloat16)
                    winn = stack_ref[0, pl.ds(cbase, C_NARROW), :]
                    return jax.lax.dot_general(
                        ohn_ref[:], winn, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                def route_wide(_):
                    for s2 in range(8):
                        col2 = idx[s2 * 128 : (s2 + 1) * 128, :]
                        is_h2 = (col2 >= STACK_SRC_ROWS * LANES).astype(
                            jnp.float32
                        )
                        rc = jnp.clip(
                            col2 // LANES, 0, STACK_SRC_ROWS - 1
                        ).astype(jnp.float32)
                        ohc_ref[pl.ds(s2 * 128, 128), :] = (
                            _ind(_fiota((128, STACK_SRC_ROWS), 1), rc)
                            * (jnp.float32(1) - is_h2)
                        ).astype(jnp.bfloat16)
                    winc = stack_ref[0, pl.ds(0, STACK_SRC_ROWS), :]
                    return jax.lax.dot_general(
                        ohc_ref[:], winc, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                routc = jax.lax.cond(cbk == 0, route_narrow, route_wide, 0)
                winh = stack_ref[0, pl.ds(hbase, hdr_w), :]
                routh = jax.lax.dot_general(
                    ohh_ref[:], winh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                selv = sel_ref[:].astype(jnp.float32)
                vals = jnp.sum((routc + routh) * selv, axis=1, keepdims=True)
                for s in range(8):
                    outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = vals[
                        s * 128 : (s + 1) * 128, :
                    ]
            t_out = jax.lax.dot_general(
                outt_ref[:].astype(jnp.bfloat16), ident,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pos = (
                gg * (128 * LANES)
                + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 1)
            )
            out_ref[0, pl.ds(gg * 128, 128), :] = jnp.where(
                pos < olen, t_out.astype(jnp.int32), 0
            ).astype(jnp.uint8)
            return _

        jax.lax.fori_loop(0, ngb, group, jnp.int32(0))

        def zfill(gg, _):
            out_ref[0, pl.ds(gg * 128, 128), :] = jnp.zeros(
                (128, LANES), jnp.uint8
            )
            return _

        jax.lax.fori_loop(ngb, n_groups, zfill, jnp.int32(0))

    return kernel


def fused_emit_pallas(lo_row, base, rows_g, hb8, cb8, cbk, out_len,
                      bp_rows, dlt_rows, stack, hdr_w: int = 256,
                      interpret: bool | None = None):
    """(B, OUT_ROWS_PAD*128) uint8 rows straight from the breakpoint plan."""
    if not _PALLAS:
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_emit_pallas(
        lo_row, base, rows_g, hb8, cb8, cbk, out_len, bp_rows, dlt_rows,
        stack, int(hdr_w), bool(interpret),
    )


@partial(jax.jit, static_argnames=("hdr_w", "interpret"))
def _fused_emit_pallas(lo_row, base, rows_g, hb8, cb8, cbk, out_len,
                       bp_rows, dlt_rows, stack, hdr_w, interpret):
    b = out_len.shape[0]
    nbp_rows = bp_rows.shape[1]
    stack_rows = stack.shape[1]
    kernel = _make_fused_emit_kernel(stack_rows, hdr_w)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nbp_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, nbp_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, stack_rows, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, OUT_ROWS_PAD, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, OUT_ROWS_PAD, LANES), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((1024, STACK_SRC_ROWS), jnp.bfloat16),
            pltpu.VMEM((1024, C_NARROW), jnp.bfloat16),
            pltpu.VMEM((1024, hdr_w), jnp.bfloat16),
            pltpu.VMEM((1024, LANES), jnp.bfloat16),
            pltpu.VMEM((128, 128), jnp.float32),
        ],
        interpret=interpret,
    )(
        lo_row.reshape(-1).astype(jnp.int32),
        base.reshape(-1).astype(jnp.int32),
        rows_g.reshape(-1).astype(jnp.int32),
        hb8.reshape(-1).astype(jnp.int32),
        cb8.reshape(-1).astype(jnp.int32),
        cbk.reshape(-1).astype(jnp.int32),
        out_len.astype(jnp.int32),
        bp_rows, dlt_rows, stack,
    )
    return out.reshape(b, OUT_ROWS_PAD * LANES)
