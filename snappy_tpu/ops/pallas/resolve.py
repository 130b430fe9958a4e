"""Pallas TPU kernel: in-place copy-chain resolution over the A plane.

Turns the first-hop pointer plane from ``ops.resolve.records_to_pointers``
into fully-resolved literal-origin indices ON DEVICE — the step the
round-4 production decode did on the host (C++ ``stpu_flatten_idx`` at
0.3 GB/s/core, the measured pipeline bottleneck). With this kernel the
host contributes only the O(records) op scan.

Algorithm (see CHAIN_DEPTH_r05.json for the measured corpus shape:
chains to depth 1108, per-byte median 4):

- The block's A plane (64 KiB positions as a (512, 128) f32 VMEM
  scratch) is processed one 1024-byte tile at a time, LEFT TO RIGHT
  and IN PLACE. Snappy pointers go strictly backward, so by the time
  tile t runs, every position in tiles < t is final — any pointer that
  leaves the tile resolves in the tile's ONE windowed gather. Only
  intra-tile chains iterate, and those Jacobi-double (each round
  doubles the hops covered): <= ceil(log2(1024)) = 10 rounds
  guaranteed, 1-3 typical, with an all-final early exit per round.
- The gather is the flat-v2 one-hot routing-matmul idiom
  (``decode.py``): per output element a (1024, w) one-hot over the
  tile's window of A rows, one MXU matmul, lane-select. Pointer values
  are up to 2^18 (FLAG | 17-bit src index) — beyond bf16's exact-int
  range — so the routing and transpose matmuls run at
  ``precision=HIGH`` (bf16_3x): the 3-term bf16 split of an 18-bit
  integer is NOT exactly reproduced by the 3-pass product (measured
  ±2 at 2^17 magnitudes — the cross-term accumulation rounds), so all
  value-carrying matmuls run at HIGHEST, the only exact setting
  (matches R4's step-sum finding: DEFAULT-precision f32 corrupts
  indices off-by-1).
- Out-of-window rows (already-final values gathered as garbage) fall
  out naturally: their one-hot row is all-zero, the gather returns 0,
  and the final ``where(col >= FLAG, col, gathered)`` keeps the
  original value.

Replaces the sequential copy loop of
/root/reference/src/decompress.rs:232-343 with a tile-wavefront
formulation; the reference resolves chains byte-at-a-time in program
order, this kernel resolves 1024 positions per MXU gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..resolve import FLAG
from .decode import _PALLAS, LANES, _flat_fiota, _flat_ind

if _PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

#: Max intra-tile Jacobi rounds: doubling covers 2^10 = 1024 hops,
#: the longest chain a 1024-byte tile can contain.
_MAX_ROUNDS = 10


def _make_resolve_kernel(d_rows: int):
    n_tiles = d_rows * LANES // 1024
    widths = [min(w, d_rows) for w in (128, 256, 512)]

    def dot_h(a, b, dims):
        # HIGHEST: pointer values reach 2^18, and bf16_3x (HIGH) rounds
        # at that magnitude (measured max error 2.0; tools probe in
        # R5 notes) — only the 6-pass f32 emulation is exact here.
        return jax.lax.dot_general(
            a, b, (dims, ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    def kernel(rmeta_ref, a_ref, out_ref, af_ref, oh_n_ref, oh_m_ref,
               oh_w_ref, sel_ref):
        i = pl.program_id(0)
        af_ref[:] = a_ref[0].astype(jnp.float32)

        fiota, ind = _flat_fiota, _flat_ind
        ident = ind(fiota((128, 128), 0), fiota((128, 128), 1))
        lane2f = fiota((128, LANES), 1)
        oh_by_w = dict(zip(widths, (oh_n_ref, oh_m_ref, oh_w_ref)))

        def tile_rounds(t, base, w):
            oh_ref = oh_by_w[w]
            av = af_ref[pl.ds(t * 8, 8), :]
            # colv[l, s] = av[s, l]: one MXU transpose; carried as a
            # value through the round loop (a (128, 8) scratch would
            # need a sub-128 lane dim Mosaic dislikes).
            colv0 = dot_h(ident, av, ((1,), (1,)))
            done0 = jnp.min(av) >= FLAG

            def round_body(_r, st):
                done, colv = st

                def work(colv):
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
                    win = af_ref[pl.ds(base, w), :]
                    routed = dot_h(
                        oh_ref[:].astype(jnp.float32), win, ((1,), (0,))
                    )
                    g = jnp.sum(
                        routed * sel_ref[:].astype(jnp.float32),
                        axis=1, keepdims=True,
                    )
                    alldone = jnp.bool_(True)
                    cols = []
                    for s in range(8):
                        col = colv[:, s : s + 1]
                        newv = jnp.where(
                            col >= FLAG, col, g[s * 128 : (s + 1) * 128, :]
                        )
                        cols.append(newv)
                        alldone = alldone & (jnp.min(newv) >= FLAG)
                    colv2 = jnp.concatenate(cols, axis=1)
                    # Write back so later rounds (and later tiles) read
                    # current values — the in-place invariant.
                    af_ref[pl.ds(t * 8, 8), :] = dot_h(
                        colv2, ident, ((0,), (0,))
                    )
                    return alldone, colv2

                return jax.lax.cond(
                    done, lambda c: (done, c), work, colv
                )

            jax.lax.fori_loop(0, _MAX_ROUNDS, round_body, (done0, colv0))

        def tile_step(t, acc):
            base = rmeta_ref[i * n_tiles * 2 + 2 * t]
            bucket = rmeta_ref[i * n_tiles * 2 + 2 * t + 1]

            def mk(w):
                def f(_):
                    tile_rounds(t, base, w)
                    return 0

                return f

            jax.lax.switch(bucket, [mk(w) for w in widths], None)
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
            *[pltpu.VMEM((1024, w), jnp.bfloat16) for w in widths],
            pltpu.VMEM((1024, LANES), jnp.bfloat16),
        ],
        interpret=interpret,
    )(
        rmeta.reshape(b * n_tiles * 2),
        a0.reshape(b, d_rows, LANES),
    )
    return out.reshape(b, d_pad)
