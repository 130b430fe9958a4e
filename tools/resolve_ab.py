"""A/B variants of the resolve kernel to attribute per-tile cost.

Variants (timing-only; results invalid for most):
  full      — production structure (transpose-in, rounds w/ cond, HIGHEST)
  noround   — single round, no fori/cond wrapper
  bf16      — noround with DEFAULT-precision bf16 routing (wrong values)
  notrans   — noround without the two transposes (wrong values)
  gatheronly— just the routing matmul + reduce per tile (wrong values)
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snappy_tpu.ops.pallas.decode import LANES, _flat_fiota, _flat_ind
from snappy_tpu.ops.resolve import FLAG


def make_kernel(d_rows, variant):
    n_tiles = d_rows * LANES // 1024
    widths = [min(w, d_rows) for w in (128, 256, 512)]

    def dot_p(a, b, dims, prec):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), precision=prec,
            preferred_element_type=jnp.float32)

    HI = jax.lax.Precision.HIGHEST
    DE = jax.lax.Precision.DEFAULT

    def kernel(rmeta_ref, a_ref, out_ref, af_ref, oh_n, oh_m, oh_w, sel_ref):
        i = pl.program_id(0)
        af_ref[:] = a_ref[0].astype(jnp.float32)
        fiota, ind = _flat_fiota, _flat_ind
        ident = ind(fiota((128, 128), 0), fiota((128, 128), 1))
        lane2f = fiota((128, LANES), 1)
        oh_by_w = dict(zip(widths, (oh_n, oh_m, oh_w)))

        def one_round(t, base, w, colv):
            oh_ref = oh_by_w[w]
            for s in range(8):
                col = colv[:, s : s + 1]
                row_em = jnp.floor(col * (1.0 / LANES))
                lane_em = col - row_em * LANES
                oh_ref[pl.ds(s * 128, 128), :] = ind(
                    fiota((128, w), 1), row_em - jnp.float32(base)
                ).astype(jnp.bfloat16)
                sel_ref[pl.ds(s * 128, 128), :] = ind(lane2f, lane_em).astype(
                    jnp.bfloat16)
            win = af_ref[pl.ds(base, w), :]
            prec = DE if variant == "bf16" else HI
            if variant == "bf16":
                routed = dot_p(oh_ref[:], win.astype(jnp.bfloat16), ((1,), (0,)), DE)
            else:
                routed = dot_p(oh_ref[:].astype(jnp.float32), win, ((1,), (0,)), HI)
            g = jnp.sum(routed * sel_ref[:].astype(jnp.float32), axis=1,
                        keepdims=True)
            cols = []
            for s in range(8):
                col = colv[:, s : s + 1]
                cols.append(jnp.where(col >= FLAG, col,
                                      g[s * 128 : (s + 1) * 128, :]))
            return jnp.concatenate(cols, axis=1)

        def tile_body(t, base, w):
            av = af_ref[pl.ds(t * 8, 8), :]
            if variant == "gatheronly":
                colv = af_ref[pl.ds(0, 128), 0:8] * 1.0  # bogus cols
                colv2 = one_round(t, base, w, colv)
                # consume colv2 without a transpose (bogus values)
                af_ref[pl.ds(t * 8, 8), :] = av + jnp.sum(colv2) * 0.0
                return
            colv = dot_p(ident, av, ((1,), (1,)), HI)
            if variant in ("noround", "bf16"):
                colv2 = one_round(t, base, w, colv)
                af_ref[pl.ds(t * 8, 8), :] = dot_p(colv2, ident, ((0,), (0,)), HI)
                return
            done0 = jnp.min(av) >= FLAG

            def round_body(_r, st):
                done, colv = st

                def work(colv):
                    colv2 = one_round(t, base, w, colv)
                    af_ref[pl.ds(t * 8, 8), :] = dot_p(
                        colv2, ident, ((0,), (0,)), HI)
                    alldone = jnp.min(colv2) >= FLAG
                    return alldone, colv2

                return jax.lax.cond(done, lambda c: (done, c), work, colv)

            jax.lax.fori_loop(0, 10, round_body, (done0, colv))

        def tile_step(t, acc):
            base = rmeta_ref[i * n_tiles * 2 + 2 * t]
            bucket = rmeta_ref[i * n_tiles * 2 + 2 * t + 1]

            def mk(w):
                def f(_):
                    tile_body(t, base, w)
                    return 0
                return f

            jax.lax.switch(bucket, [mk(w) for w in widths], None)
            return acc

        jax.lax.fori_loop(0, n_tiles, tile_step, jnp.int32(0))
        out_ref[0] = af_ref[:].astype(jnp.int32)

    return kernel


@partial(jax.jit, static_argnames=("variant",))
def run_variant(a0, rmeta, variant):
    b, d_pad = a0.shape
    d_rows = d_pad // LANES
    n_tiles = d_pad // 1024
    kernel = make_kernel(d_rows, variant)
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
        interpret=False,
    )(rmeta.reshape(b * n_tiles * 2), a0.reshape(b, d_rows, LANES))
    return out.reshape(b, d_pad)


def main():
    from resolve_bench import corpus_batch, device_rate, REC_CAP, D_PAD
    from snappy_tpu import native
    from snappy_tpu.ops import resolve as R

    srcs, lens, decl = corpus_batch()
    n = len(lens)
    recs, nops, errs, dt = native.scan_records_batch(srcs, lens, decl, REC_CAP, threads=4)
    a0, rmeta = jax.jit(lambda r, no, dc: R.records_to_pointers(r, no, dc, D_PAD))(
        jnp.asarray(recs), jnp.asarray(nops), jnp.asarray(decl.astype(np.int64)))
    a0 = jax.block_until_ready(a0)
    rmeta = jax.block_until_ready(rmeta)

    for variant in ("full", "noround", "bf16", "gatheronly"):
        @jax.jit
        def run(k, variant=variant):
            def body(i, acc):
                a2 = jnp.roll(a0, i, axis=0)
                r2 = jnp.roll(rmeta, i, axis=0)
                a_ = run_variant(a2, r2, variant)
                return acc + a_[:, ::4096].sum()
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        t = device_rate(run)
        print(f"{variant}: {t*1e3:.1f} ms ({t/n*1e6:.0f} us/blk)")


if __name__ == "__main__":
    main()
