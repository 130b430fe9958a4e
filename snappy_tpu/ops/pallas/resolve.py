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
