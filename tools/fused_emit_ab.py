"""A/B variants of the fused emission kernel (encode hot stage).

Variants:
  prod     — current production kernel (baseline, exact)
  skeleton — group/tile loop with all math stubbed (overhead floor)
  nostep   — production minus the breakpoint step-sum (timing only)
  merged   — ONE combined content+header one-hot and routing matmul
             (exact — candidate to land if faster)
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

from snappy_tpu.ops.pallas.encode_flat import (
    LANES, OUT_ROWS_PAD, STACK_SRC_ROWS, C_NARROW, _ind, _fiota,
)


def make_kernel(stack_rows, hdr_w, variant):
    def kernel(lo_ref, base_ref, rows_ref, hb8_ref, cb8_ref, cbk_ref,
               olen_ref, bp_ref, dlt_ref, stack_ref, out_ref, ohc_ref,
               ohn_ref, ohh_ref, sel_ref, outt_ref):
        i = pl.program_id(0)
        olen = olen_ref[i]
        dcol = jax.lax.broadcasted_iota(jnp.int32, (1024, 1), 0)
        lane2f = _fiota((128, LANES), 1)
        ident = _ind(_fiota((128, 128), 0), _fiota((128, 128), 1)).astype(
            jnp.bfloat16)
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

                if variant == "skeleton":
                    outt_ref[:, tt * 8 : tt * 8 + 8] = jnp.full(
                        (128, 8), jnp.float32(b0 + lo + nrows))
                    continue

                if variant == "nostep":
                    acc = jnp.zeros((1024, 1), jnp.float32) + jnp.float32(
                        nrows)
                else:
                    def bprow(j, acc):
                        bp = bp_ref[0, pl.ds(lo + j, 1), :].astype(
                            jnp.float32)
                        dl = dlt_ref[0, pl.ds(lo + j, 1), :].astype(
                            jnp.float32)
                        cmp = (dg >= bp).astype(jnp.float32)
                        return acc + jnp.sum(cmp * dl, axis=1, keepdims=True)

                    acc = jax.lax.fori_loop(
                        0, nrows, bprow, jnp.zeros((1024, 1), jnp.float32))
                idx = (acc + b0.astype(jnp.float32) + dg).astype(jnp.int32)
                cbk = cbk_ref[i * 80 + g]
                cbase = cb8_ref[i * 80 + g] * 8

                if variant == "merged":
                    # Combined content+header one-hot over a stacked
                    # window [content w | header hdr_w]: one build per
                    # s, one routing matmul, no is_hdr mask multiplies.
                    def arm(w, oh_ref, win_base_rows):
                        for s in range(8):
                            col = idx[s * 128 : (s + 1) * 128, :]
                            is_hdr = col >= STACK_SRC_ROWS * LANES
                            rowa = col // LANES
                            rn = jnp.clip(rowa - win_base_rows, 0, w - 1)
                            rh = w + jnp.clip(rowa - hbase, 0, hdr_w - 1)
                            rcat = jnp.where(is_hdr, rh, rn).astype(
                                jnp.float32)
                            oh_ref[pl.ds(s * 128, 128), :] = _ind(
                                _fiota((128, w + hdr_w), 1), rcat
                            ).astype(jnp.bfloat16)
                            sel_ref[pl.ds(s * 128, 128), :] = _ind(
                                lane2f, (col % LANES).astype(jnp.float32)
                            ).astype(jnp.bfloat16)
                        win = jnp.concatenate(
                            [stack_ref[0, pl.ds(win_base_rows, w), :],
                             stack_ref[0, pl.ds(hbase, hdr_w), :]], axis=0)
                        return jax.lax.dot_general(
                            oh_ref[:], win, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

                    routs = jax.lax.cond(
                        cbk == 0,
                        lambda _: arm(C_NARROW, ohn_ref, cbase),
                        lambda _: arm(STACK_SRC_ROWS, ohc_ref, 0),
                        0)
                    selv = sel_ref[:].astype(jnp.float32)
                    vals = jnp.sum(routs * selv, axis=1, keepdims=True)
                else:
                    for s in range(8):
                        col = idx[s * 128 : (s + 1) * 128, :]
                        is_hdr = (col >= STACK_SRC_ROWS * LANES).astype(
                            jnp.float32)
                        rowa = col // LANES
                        lane_em = (col % LANES).astype(jnp.float32)
                        rh = jnp.clip(rowa - hbase, 0, hdr_w - 1).astype(
                            jnp.float32)
                        ohh_ref[pl.ds(s * 128, 128), :] = (
                            _ind(_fiota((128, hdr_w), 1), rh) * is_hdr
                        ).astype(jnp.bfloat16)
                        sel_ref[pl.ds(s * 128, 128), :] = _ind(
                            lane2f, lane_em).astype(jnp.bfloat16)

                    def route_narrow(_a):
                        for s2 in range(8):
                            col2 = idx[s2 * 128 : (s2 + 1) * 128, :]
                            is_h2 = (col2 >= STACK_SRC_ROWS * LANES).astype(
                                jnp.float32)
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
                            preferred_element_type=jnp.float32)

                    def route_wide(_a):
                        for s2 in range(8):
                            col2 = idx[s2 * 128 : (s2 + 1) * 128, :]
                            is_h2 = (col2 >= STACK_SRC_ROWS * LANES).astype(
                                jnp.float32)
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
                            preferred_element_type=jnp.float32)

                    routc = jax.lax.cond(
                        cbk == 0, route_narrow, route_wide, 0)
                    winh = stack_ref[0, pl.ds(hbase, hdr_w), :]
                    routh = jax.lax.dot_general(
                        ohh_ref[:], winh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    selv = sel_ref[:].astype(jnp.float32)
                    vals = jnp.sum(
                        (routc + routh) * selv, axis=1, keepdims=True)
                for s in range(8):
                    outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = vals[
                        s * 128 : (s + 1) * 128, :]
            t_out = jax.lax.dot_general(
                outt_ref[:].astype(jnp.bfloat16), ident,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            pos = (gg * (128 * LANES)
                   + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 0)
                   * LANES
                   + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 1))
            out_ref[0, pl.ds(gg * 128, 128), :] = jnp.where(
                pos < olen, t_out.astype(jnp.int32), 0).astype(jnp.uint8)
            return _

        jax.lax.fori_loop(0, ngb, group, jnp.int32(0))

        def zfill(gg, _):
            out_ref[0, pl.ds(gg * 128, 128), :] = jnp.zeros(
                (128, LANES), jnp.uint8)
            return _

        jax.lax.fori_loop(ngb, n_groups, zfill, jnp.int32(0))

    return kernel


@partial(jax.jit, static_argnames=("hdr_w", "variant"))
def run_variant(lo_row, base, rows_g, hb8, cb8, cbk, out_len, bp_rows,
                dlt_rows, stack, hdr_w, variant):
    b = out_len.shape[0]
    nbp_rows = bp_rows.shape[1]
    stack_rows = stack.shape[1]
    kernel = make_kernel(stack_rows, hdr_w, variant)
    # merged variant: oh scratches must hold w+hdr_w columns
    ohc_w = STACK_SRC_ROWS + (hdr_w if variant == "merged" else 0)
    ohn_w = C_NARROW + (hdr_w if variant == "merged" else 0)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 7 + [
            pl.BlockSpec((1, nbp_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, nbp_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, stack_rows, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, OUT_ROWS_PAD, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, OUT_ROWS_PAD, LANES), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((1024, ohc_w), jnp.bfloat16),
            pltpu.VMEM((1024, ohn_w), jnp.bfloat16),
            pltpu.VMEM((1024, hdr_w), jnp.bfloat16),
            pltpu.VMEM((1024, LANES), jnp.bfloat16),
            pltpu.VMEM((128, 128), jnp.float32),
        ],
        interpret=False,
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


def main():
    from bench import _load_corpus_blocks
    from snappy_tpu.ops import encode_flat as ef
    from snappy_tpu.ops.pallas.encode_flat import _parse_blocks_pallas

    blocks, lens = _load_corpus_blocks(1)
    B = 64
    blocks, lens = blocks[:B], lens[:B]
    blocks_d = jnp.asarray(blocks)
    n = jnp.asarray(lens).astype(jnp.int32)

    # Build the emission inputs once (prepass+parse+plan)
    jw, u32seg, planes = jax.jit(ef.prepass)(blocks_d, n)
    rec0, rec1, cnt = _parse_blocks_pallas(n, jw, u32seg, planes, False)
    plan_full = ef._fused_plan(blocks_d, n, rec0, rec1, cnt)
    plan = plan_full[:11]  # drop ovf_bp
    (lo_row, basep, rows_g, hb8, cb8, cbk, out_len, bp_rows, dlt_rows,
     stack, hdr_w) = plan

    want = None
    for variant in ("prod", "merged", "skeleton", "nostep"):
        args = [jax.block_until_ready(x) if hasattr(x, 'block_until_ready')
                else x for x in plan[:10]]
        t0 = time.perf_counter()
        out = run_variant(*args, hdr_w, variant)
        out = jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        if variant == "prod":
            want = np.asarray(out)
        elif variant == "merged":
            same = bool((np.asarray(out) == want).all())
            print("merged exact vs prod:", same)

        @jax.jit
        def runk(k, variant=variant):
            def body(i, acc):
                ol2 = jnp.roll(plan[6], i)
                o = run_variant(plan[0], plan[1], plan[2], plan[3],
                                plan[4], plan[5], ol2, plan[7], plan[8],
                                plan[9], hdr_w, variant)
                return acc + o[:, ::4096].astype(jnp.int32).sum()
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        def t(f, it=3):
            f()
            best = float("inf")
            for _ in range(it):
                t0 = time.perf_counter()
                f()
                best = min(best, time.perf_counter() - t0)
            return best

        t1 = t(lambda: int(runk(jnp.int32(1))))
        tk = t(lambda: int(runk(jnp.int32(7))))
        per = (tk - t1) / 6
        print(f"{variant}: {per*1e3:.1f} ms ({per/B*1e6:.0f} us/blk) "
              f"[compile {compile_s:.0f}s]")


if __name__ == "__main__":
    main()
