"""Pallas TPU kernel: in-place copy-chain resolution over the A plane.

Turns the first-hop pointer plane from ``ops.resolve.records_to_pointers``
into fully-resolved literal-origin indices ON DEVICE — the step the
round-4 production decode did on the host (C++ ``stpu_flatten_idx`` at
0.3 GB/s/core, the measured pipeline bottleneck). With this kernel the
host contributes only the O(records) op scan.

Algorithm (corpus shape in CHAIN_DEPTH_r05.json: chains to depth 1108,
per-byte median 4):

- The block's A plane (64 KiB positions, a (512, 128) f32 VMEM
  scratch) is processed one 1024-byte tile at a time, LEFT TO RIGHT and
  IN PLACE. Snappy pointers go strictly backward, so when tile t runs,
  every position in tiles < t is final — pointers that leave the tile
  resolve in the tile's ONE windowed gather. Only intra-tile chains
  survive pass 1; they Jacobi-double per pass (hops covered double), so
  <= ceil(log2(1024)) = 10 passes guarantee convergence, 1-2 typical.
- Each tile resolves to completion before the sweep moves on (the
  corpus needs 2.9 rounds per live tile, max 5). Round state stays in
  a VMEM scratch and the round loop carries only a scalar done flag:
  carrying the (128, 8) column state through fori/cond measured 310
  us/block of copy overhead (RESOLVE_AB), and a flat multi-pass
  worklist variant re-gathered dependency-blocked tiles every pass.
- The gather is the flat-v2 one-hot routing idiom, but pointer values
  reach 2^18 — beyond bf16's exact-int range, and HIGHEST-precision
  f32 routing measures 110 us/block of overhead (6-pass emulation).
  Instead the A plane is mirrored into three uint8 base-256 digit
  planes packed side-by-side in one (rows, 384) f32 scratch (f32 so
  8-row tile updates take arbitrary dynamic offsets; cast to bf16 at
  the dot): ONE
  DEFAULT-precision matmul routes all three digits (operands <= 255,
  bf16-exact; f32 accumulation of one-hot selections is exact), and
  ``g = lo + 256*mid + 65536*hi`` reassembles. The two (128, 8) MXU
  transposes per tile do stay HIGHEST (measured ~16 us/block total).
- Out-of-window rows (already-final values gathered as garbage) fall
  out naturally: their one-hot row is all-zero, the gather returns 0,
  and ``where(col >= FLAG, col, gathered)`` keeps the original value.

Replaces the sequential copy loop of
/root/reference/src/decompress.rs:232-343 with a tile-wavefront
formulation; the reference resolves chains byte-at-a-time in program
order, this kernel resolves 1024 positions per MXU gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..resolve import FLAG
from .decode import _PALLAS, LANES, _flat_fiota, _flat_ind

if _PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

#: Max extra rounds per tile: Jacobi doubling covers 2^11 hops after
#: 11 rounds, past the 1024-hop worst case a tile can contain.
_MAX_PASSES = 11


def _make_resolve_kernel(d_rows: int):
    n_tiles = d_rows * LANES // 1024
    widths = [min(w, d_rows) for w in (128, 256, 512)]

    def dot_hi(a, b, dims):
        # Exact transpose for values < 2^24 (HIGHEST = full f32 path;
        # HIGH/bf16_3x measured off by +-2 at 2^17 magnitudes).
        return jax.lax.dot_general(
            a, b, (dims, ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    def bdot(a, b):
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def kernel(rmeta_ref, a_ref, out_ref, af_ref, pln_ref, oh_n_ref,
               oh_m_ref, oh_w_ref, sel_ref, colv_ref):
        i = pl.program_id(0)
        af_ref[:] = a_ref[0].astype(jnp.float32)
        # Digit planes: pln[:, 0:128]=lo, [128:256]=mid, [256:384]=hi.
        hi = jnp.floor(af_ref[:] * (1.0 / 65536.0))
        rem = af_ref[:] - hi * 65536.0
        mid = jnp.floor(rem * (1.0 / 256.0))
        pln_ref[:, 0:128] = rem - mid * 256.0
        pln_ref[:, 128:256] = mid
        pln_ref[:, 256:384] = hi

        fiota, ind = _flat_fiota, _flat_ind
        ident = ind(fiota((128, 128), 0), fiota((128, 128), 1))
        lane2f = fiota((128, LANES), 1)
        oh_by_w = dict(zip(widths, (oh_n_ref, oh_m_ref, oh_w_ref)))

        def tile_once(t, base, w, first):
            """One gather round for tile t; returns all-done flag.

            Round state (the tile's element-major columns) lives in
            colv_ref[:, 0:8] — a scratch, not a loop carry: carrying a
            (128, 8) value through fori/cond measured 310 us/block of
            copy overhead (RESOLVE_AB). ``first`` rounds load it via
            one MXU transpose; later rounds reuse it.
            """
            oh_ref = oh_by_w[w]
            # rmeta bases are 16-row aligned by construction; Mosaic
            # needs the proof attached to the traced value.
            base = pl.multiple_of(base, 16)
            if first:
                av = af_ref[pl.ds(t * 8, 8), :]
                colv_ref[:, 0:8] = dot_hi(ident, av, ((1,), (1,)))
            colv = colv_ref[:, 0:8]
            basef = jnp.float32(base)
            for s in range(8):
                col = colv[:, s : s + 1]
                row_em = jnp.floor(col * (1.0 / LANES))
                lane_em = col - row_em * LANES
                oh_ref[pl.ds(s * 128, 128), :] = ind(
                    fiota((128, w), 1), row_em - basef
                ).astype(jnp.bfloat16)
                sel_ref[pl.ds(s * 128, 128), :] = ind(
                    lane2f, lane_em
                ).astype(jnp.bfloat16)
            win = pln_ref[pl.ds(base, w), :].astype(jnp.bfloat16)
            routed = bdot(oh_ref[:], win)  # (1024, 384) f32
            # Reassemble digits BEFORE the lane-select: one combined
            # (1024, 128) reduce instead of three.
            comb = (
                routed[:, 0:128]
                + 256.0 * routed[:, 128:256]
                + 65536.0 * routed[:, 256:384]
            )
            g = jnp.sum(
                comb * sel_ref[:].astype(jnp.float32), axis=1, keepdims=True
            )
            cols = []
            alldone = jnp.bool_(True)
            for s in range(8):
                col = colv[:, s : s + 1]
                newv = jnp.where(
                    col >= FLAG, col, g[s * 128 : (s + 1) * 128, :]
                )
                cols.append(newv)
                alldone = alldone & (jnp.min(newv) >= FLAG)
            colv2 = jnp.concatenate(cols, axis=1)
            colv_ref[:, 0:8] = colv2
            avn = dot_hi(colv2, ident, ((0,), (0,)))  # back to (8, 128)
            af_ref[pl.ds(t * 8, 8), :] = avn
            hi = jnp.floor(avn * (1.0 / 65536.0))
            rem = avn - hi * 65536.0
            mid = jnp.floor(rem * (1.0 / 256.0))
            pln_ref[pl.ds(t * 8, 8), 0:128] = rem - mid * 256.0
            pln_ref[pl.ds(t * 8, 8), 128:256] = mid
            pln_ref[pl.ds(t * 8, 8), 256:384] = hi
            return alldone

        def tile_complete(t):
            """Resolve tile t fully: one first round, then cheap
            scalar-guarded extra rounds until done (left-to-right
            invariant: tiles < t are final, so completion is always
            possible; <= ceil(log2(1024)) + 1 rounds)."""
            base = rmeta_ref[i * n_tiles * 2 + 2 * t]
            bucket = rmeta_ref[i * n_tiles * 2 + 2 * t + 1]

            def mk(w, first):
                return lambda _: tile_once(t, base, w, first)

            done0 = jax.lax.switch(
                bucket, [mk(w, True) for w in widths], None
            )

            def round_body(_r, done):
                return jax.lax.cond(
                    done,
                    lambda _: done,
                    lambda _: jax.lax.switch(
                        bucket, [mk(w, False) for w in widths], None
                    ),
                    None,
                )

            jax.lax.fori_loop(0, _MAX_PASSES, round_body, done0)

        # Left-to-right tile sweep; all-final tiles skip everything.
        def tile_step(t, acc):
            av = af_ref[pl.ds(t * 8, 8), :]

            def live(_):
                tile_complete(t)
                return 0

            jax.lax.cond(jnp.min(av) >= FLAG, lambda _: 0, live, None)
            return acc

        jax.lax.fori_loop(0, n_tiles, tile_step, jnp.int32(0))
        out_ref[0] = af_ref[:].astype(jnp.int32)

    return kernel


def resolve_pallas(a0, rmeta, interpret: bool | None = None):
    """Resolve every pointer in ``a0`` to FLAG|src_idx on device.

    ``a0``: (B, d_pad) int32 from ``records_to_pointers``; ``rmeta``:
    (B, d_pad//1024, 2) int32 per-tile (window base row, bucket).
    Returns (B, d_pad) int32, all values >= FLAG.
    """
    if not _PALLAS:
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _resolve_pallas(a0, rmeta, bool(interpret))


@partial(jax.jit, static_argnames=("interpret",))
def _resolve_pallas(a0, rmeta, interpret: bool):
    b, d_pad = a0.shape
    assert d_pad % 1024 == 0
    d_rows = d_pad // LANES
    n_tiles = d_pad // 1024
    kernel = _make_resolve_kernel(d_rows)
    widths = [min(w, d_rows) for w in (128, 256, 512)]
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d_rows, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((d_rows, LANES), jnp.float32),
            pltpu.VMEM((d_rows, 3 * LANES), jnp.float32),
            *[pltpu.VMEM((1024, w), jnp.bfloat16) for w in widths],
            pltpu.VMEM((1024, LANES), jnp.bfloat16),
            pltpu.VMEM((128, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        rmeta.reshape(b * n_tiles * 2),
        a0.reshape(b, d_rows, LANES),
    )
    return out.reshape(b, d_pad)


def _make_resolve_fh_kernel(d_rows: int, st_rows: int, pk_rows: int):
    """Fused first-hop + resolve: records in, resolved A plane out.

    Replaces the XLA scatter/cummax pointer prepass (296 us/block,
    RESOLVE_BENCH_r05) with in-kernel per-tile construction: a windowed
    step-count over the starts plane gives each byte its covering
    record; ONE (1024, 72) HIGHEST-precision routing matmul over the
    16-records-per-row pack fetches (start, payload) for the whole tile
    (a per-128-piece variant measured ~2.5x slower); the first-hop
    arithmetic (literal -> FLAG|content+j, copy -> start - off +
    j mod off) runs element-major and feeds the same in-place tile
    rounds as :func:`_make_resolve_kernel`.
    """
    n_tiles = d_rows * LANES // 1024
    widths = [min(w, d_rows) for w in (128, 256, 512)]

    def dot_hi(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    def bdot(a, b):
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    FLAGF = float(FLAG)

    def kernel(rmeta_ref, wlo_ref, nwin_ref, declen_ref, st_ref, pk_ref,
               out_ref, af_ref, pln_ref, oh_n_ref, oh_m_ref, oh_w_ref,
               sel_ref, colv_ref):
        i = pl.program_id(0)
        declen = declen_ref[i]
        # NaN-safety: rounds may read window rows past the live region;
        # initialize the planes so every gathered value is finite.
        af_ref[:] = jnp.full((d_rows, LANES), FLAGF)
        pln_ref[:, 0:128] = jnp.zeros((d_rows, LANES), jnp.float32)
        pln_ref[:, 128:256] = jnp.zeros((d_rows, LANES), jnp.float32)
        pln_ref[:, 256:384] = jnp.full((d_rows, LANES), jnp.float32(2.0))

        fiota, ind = _flat_fiota, _flat_ind
        ident = ind(fiota((128, 128), 0), fiota((128, 128), 1))
        lane2f = fiota((128, LANES), 1)
        oh_by_w = dict(zip(widths, (oh_n_ref, oh_m_ref, oh_w_ref)))

        def writeback(t, colv2):
            avn = dot_hi(colv2, ident, ((0,), (0,)))
            af_ref[pl.ds(t * 8, 8), :] = avn
            hi = jnp.floor(avn * (1.0 / 65536.0))
            rem = avn - hi * 65536.0
            mid = jnp.floor(rem * (1.0 / 256.0))
            pln_ref[pl.ds(t * 8, 8), 0:128] = rem - mid * 256.0
            pln_ref[pl.ds(t * 8, 8), 128:256] = mid
            pln_ref[pl.ds(t * 8, 8), 256:384] = hi

        def round_once(t, base, w):
            """One gather round from colv_ref state; returns all-done."""
            oh_ref = oh_by_w[w]
            base = pl.multiple_of(base, 16)
            colv = colv_ref[:, 0:8]
            basef = jnp.float32(base)
            for s in range(8):
                col = colv[:, s : s + 1]
                row_em = jnp.floor(col * (1.0 / LANES))
                lane_em = col - row_em * LANES
                oh_ref[pl.ds(s * 128, 128), :] = ind(
                    fiota((128, w), 1), row_em - basef
                ).astype(jnp.bfloat16)
                sel_ref[pl.ds(s * 128, 128), :] = ind(
                    lane2f, lane_em
                ).astype(jnp.bfloat16)
            win = pln_ref[pl.ds(base, w), :].astype(jnp.bfloat16)
            routed = bdot(oh_ref[:], win)
            comb = (
                routed[:, 0:128]
                + 256.0 * routed[:, 128:256]
                + 65536.0 * routed[:, 256:384]
            )
            g = jnp.sum(
                comb * sel_ref[:].astype(jnp.float32), axis=1, keepdims=True
            )
            cols = []
            alldone = jnp.bool_(True)
            for s in range(8):
                col = colv[:, s : s + 1]
                newv = jnp.where(
                    col >= FLAGF, col, g[s * 128 : (s + 1) * 128, :]
                )
                cols.append(newv)
                alldone = alldone & (jnp.min(newv) >= FLAGF)
            colv2 = jnp.concatenate(cols, axis=1)
            colv_ref[:, 0:8] = colv2
            writeback(t, colv2)
            return alldone

        def first_hop(t):
            """Build the tile's first-hop columns into colv_ref; returns
            the all-final flag."""
            wlo = wlo_ref[i * n_tiles + t]
            nwin = nwin_ref[i * n_tiles + t]
            wrow_st = wlo // LANES
            wrow_pk = wlo // 16
            dcol0 = jax.lax.broadcasted_iota(jnp.int32, (1024, 1), 0)
            dv = (t * 1024 + dcol0).astype(jnp.float32)

            def wrow(j, cnt):
                strow = st_ref[0, pl.ds(wrow_st + j, 1), :]
                return cnt + jnp.sum(
                    (dv >= strow).astype(jnp.float32), axis=1,
                    keepdims=True,
                )

            cnt = jax.lax.fori_loop(
                0, nwin, wrow, jnp.zeros((1024, 1), jnp.float32)
            )
            # covering record, window-relative (records before the
            # window all have start <= tile start <= d)
            rrel = cnt - 1.0
            rrow = jnp.floor(rrel * (1.0 / 16.0))
            lgrp = rrel - rrow * 16.0
            oh2 = ind(fiota((1024, pk_rows), 1), rrow).astype(jnp.float32)
            win_pk = pk_ref[0, pl.ds(wrow_pk, pk_rows), :]
            routed = dot_hi(oh2, win_pk, ((1,), (0,)))  # (1024, 128)
            lane2f_t = fiota((1024, LANES), 1)
            sel0 = ind(lane2f_t, lgrp * 8.0)
            sel1 = ind(lane2f_t, lgrp * 8.0 + 1.0)
            start_d = jnp.sum(routed * sel0, axis=1, keepdims=True)
            pay = jnp.sum(routed * sel1, axis=1, keepdims=True)
            jv = dv - start_d
            islit = (pay >= FLAGF).astype(jnp.float32)
            w1v = pay - islit * FLAGF
            off = jnp.maximum(w1v, 1.0)
            q = jnp.floor(jv / off)
            jj = jv - off * q
            jj = jj + off * (jj < 0).astype(jnp.float32)
            jj = jj - off * (jj >= off).astype(jnp.float32)
            a_lit = FLAGF + w1v + jv
            a_copy = start_d - off + jj
            a0 = islit * a_lit + (1.0 - islit) * a_copy
            live = (dv < jnp.float32(declen)).astype(jnp.float32)
            a0 = live * a0 + (1.0 - live) * FLAGF
            alldone = jnp.bool_(True)
            for sx in range(8):
                piece = a0[sx * 128 : (sx + 1) * 128, :]
                colv_ref[:, sx : sx + 1] = piece
                alldone = alldone & (jnp.min(piece) >= FLAGF)
            return alldone

        def tile_step(t, acc):
            def live_tile(_):
                done0 = first_hop(t)
                writeback(t, colv_ref[:, 0:8])

                base = rmeta_ref[i * n_tiles * 2 + 2 * t]
                bucket = rmeta_ref[i * n_tiles * 2 + 2 * t + 1]

                def mk(w):
                    return lambda _: round_once(t, base, w)

                def round_body(_r, done):
                    return jax.lax.cond(
                        done,
                        lambda _: done,
                        lambda _: jax.lax.switch(
                            bucket, [mk(w) for w in widths], None
                        ),
                        None,
                    )

                jax.lax.fori_loop(0, _MAX_PASSES, round_body, done0)
                return 0

            # tiles wholly past declen keep the FLAG fill
            jax.lax.cond(t * 1024 < declen, live_tile, lambda _: 0, None)
            return acc

        jax.lax.fori_loop(0, n_tiles, tile_step, jnp.int32(0))
        out_ref[0] = af_ref[:].astype(jnp.int32)

    return kernel


def resolve_fh_pallas(st_pln, rec_pack, wlo, nwin, rmeta, declens,
                      d_pad: int, interpret: bool | None = None):
    """Fused first-hop resolve: record planes in, resolved A plane out.

    Inputs from :func:`snappy_tpu.ops.resolve.records_to_kernel_inputs`.
    Returns (B, d_pad) int32; callers still run the defensive
    unresolved check (adversarially deep cross-tile chains beyond the
    round budget fall back to the host flatten route).
    """
    if not _PALLAS:
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _resolve_fh_pallas(
        st_pln, rec_pack, wlo, nwin, rmeta,
        declens, d_pad, bool(interpret),
    )


@partial(jax.jit, static_argnames=("d_pad", "interpret"))
def _resolve_fh_pallas(st_pln, rec_pack, wlo, nwin, rmeta, declens,
                       d_pad: int, interpret: bool):
    b = st_pln.shape[0]
    assert d_pad % 1024 == 0
    d_rows = d_pad // LANES
    n_tiles = d_pad // 1024
    st_rows = st_pln.shape[1]
    pk_rows_total = rec_pack.shape[1]
    from ..resolve import _WIN_PK_ROWS

    kernel = _make_resolve_fh_kernel(d_rows, st_rows, _WIN_PK_ROWS)
    widths = [min(w, d_rows) for w in (128, 256, 512)]
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, st_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, pk_rows_total, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d_rows, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((d_rows, LANES), jnp.float32),
            pltpu.VMEM((d_rows, 3 * LANES), jnp.float32),
            *[pltpu.VMEM((1024, w), jnp.bfloat16) for w in widths],
            pltpu.VMEM((1024, LANES), jnp.bfloat16),
            pltpu.VMEM((128, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        rmeta.reshape(b * n_tiles * 2),
        wlo.reshape(-1),
        nwin.reshape(-1),
        declens.astype(jnp.int32),
        st_pln.reshape(b, st_rows, LANES),
        rec_pack.reshape(b, pk_rows_total, LANES),
    )
    return out.reshape(b, d_pad)
