#!/usr/bin/env python
"""Stage ablation of the fused emission kernel: where does tile time go?

The modeled per-tile cost (~2 us: builds + 2 matmuls + reduce + step
sum) is ~6x under the measured ~12 us/tile. Variants with stages
knocked out (garbage output, timing only):

  full        step sum + builds + routings + reduce + outt
  no_step     acc = 0 (skip the breakpoint fori)
  no_builds   skip ohh/sel/narrow builds (consume stale scratch)
  no_route    skip both routing matmuls
  no_reduce   vals = first routed column
  skeleton    only idx-independent outt/transpose/writes

Writes FUSED_PROFILE.json. Methodology as tools/flat_ab2.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(HERE, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import _load_corpus_blocks
    from snappy_tpu.ops import encode_flat as ef
    from snappy_tpu.ops.pallas import encode_flat as pe
    from snappy_tpu.ops.pallas.encode_flat import (
        C_NARROW, LANES, OUT_ROWS_PAD, STACK_SRC_ROWS, _fiota, _ind,
        _parse_blocks_pallas,
    )

    KBIG, ROUNDS, B = 5, 6, 64
    blocks_np, lens_np = _load_corpus_blocks(repeat=2)
    blocks_np, lens_np = blocks_np[:B], lens_np[:B]
    bb = jnp.asarray(blocks_np)
    nn = jnp.asarray(lens_np).astype(jnp.int32)
    nbytes = int(lens_np.sum())

    jw, u32s, pls = jax.jit(ef.prepass)(bb, nn)
    rec0, rec1, cnt = _parse_blocks_pallas(nn, jw, u32s, pls, False)

    # reproduce the fused-path inputs once (XLA)
    @jax.jit
    def plan(r0, r1, c0):
        f = ef._record_fields(nn, r0, r1, c0)
        plane = ef._hdr_plane(f)
        bp, dlt, lo_row, base, rows_g, _ovf = ef._breakpoints(f)
        return f["out_len"], plane, bp, dlt, lo_row, base, rows_g, f

    # easiest: reuse records_to_bytes_fused's own meta via a small shim
    import snappy_tpu.ops.encode_flat as EFM

    f = EFM._record_fields(nn, rec0, rec1, cnt)
    plane = EFM._hdr_plane(f)
    bp, dlt, lo_row, base, rows_g, _ovf = EFM._breakpoints(f)
    bp_rows = jnp.asarray(bp.reshape(B, EFM.NBP_PAD // 128, 128))
    dlt_rows = jnp.asarray(dlt.reshape(B, EFM.NBP_PAD // 128, 128))
    stack = jnp.concatenate(
        [bb.reshape(B, 512, 128).astype(jnp.bfloat16), jnp.asarray(plane)],
        axis=1,
    )
    out_len = f["out_len"]
    # meta: reuse the production path's computation by calling it once
    # and re-deriving hb8/cb8/cbk here exactly as records_to_bytes_fused
    nvalid = jnp.sum(f["valid"].astype(jnp.int32), axis=1)
    d0 = (jnp.arange(EFM.N_GROUPS, dtype=jnp.int32) * 1024)[None, :, None]
    cnt_le = jnp.sum((f["valid"][:, None, :] & (f["starts"][:, None, :] < d0)).astype(jnp.int32), axis=2)
    rank0 = jnp.clip(cnt_le - 1, 0, nvalid[:, None])
    row_first = 512 + ((rank0 * EFM.HDR_PITCH) >> 7)
    stack_rows = 512 + plane.shape[1]
    hb8 = jnp.clip(row_first >> 3, 64, (stack_rows - 256) >> 3)
    cb8 = jnp.zeros_like(hb8)
    cbk = jnp.ones_like(hb8)  # all-wide for the ablation (uniform)

    hdr_w = 256

    def make_kernel(mode: str):
        def kernel(lo_ref, base_ref, rows_ref, hb8_ref, cb8_ref, cbk_ref,
                   olen_ref, bp_ref, dlt_ref, stack_ref, out_ref, ohc_ref,
                   ohn_ref, ohh_ref, sel_ref, outt_ref):
            i = pl.program_id(0)
            olen = olen_ref[i]
            dcol = jax.lax.broadcasted_iota(jnp.int32, (1024, 1), 0)
            lane2f = _fiota((128, LANES), 1)
            ident = _ind(_fiota((128, 128), 0), _fiota((128, 128), 1)).astype(jnp.bfloat16)
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

                    if mode == "no_step":
                        acc = jnp.zeros((1024, 1), jnp.float32)
                    else:
                        def bprow(j, acc):
                            bpv = jnp.broadcast_to(
                                bp_ref[0, pl.ds(lo + j, 1), :], (1024, LANES)
                            ).astype(jnp.float32)
                            dlv = jnp.broadcast_to(
                                dlt_ref[0, pl.ds(lo + j, 1), :], (1024, LANES)
                            ).astype(jnp.float32)
                            cmp = (dg >= bpv).astype(jnp.float32)
                            return acc + jnp.sum(cmp * dlv, axis=1, keepdims=True)

                        acc = jax.lax.fori_loop(
                            0, nrows, bprow, jnp.zeros((1024, 1), jnp.float32))
                    idx = (acc + b0.astype(jnp.float32) + dg).astype(jnp.int32)
                    if mode == "skeleton":
                        for s in range(8):
                            outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = (
                                idx[s * 128 : (s + 1) * 128, :].astype(jnp.float32))
                        continue
                    if mode != "no_builds":
                        for s in range(8):
                            col = idx[s * 128 : (s + 1) * 128, :]
                            is_hdr = (col >= STACK_SRC_ROWS * LANES).astype(jnp.float32)
                            rowa = col // LANES
                            lane_em = (col % LANES).astype(jnp.float32)
                            rh = jnp.clip(rowa - hbase, 0, hdr_w - 1).astype(jnp.float32)
                            rc = jnp.clip(rowa, 0, STACK_SRC_ROWS - 1).astype(jnp.float32)
                            ohh_ref[pl.ds(s * 128, 128), :] = (
                                _ind(_fiota((128, hdr_w), 1), rh) * is_hdr
                            ).astype(jnp.bfloat16)
                            sel_ref[pl.ds(s * 128, 128), :] = _ind(lane2f, lane_em).astype(jnp.bfloat16)
                            ohc_ref[pl.ds(s * 128, 128), :] = (
                                _ind(_fiota((128, STACK_SRC_ROWS), 1), rc)
                                * (jnp.float32(1) - is_hdr)
                            ).astype(jnp.bfloat16)
                    if mode in ("no_route",):
                        routc = ohc_ref[:, :LANES].astype(jnp.float32)
                        routh = ohh_ref[:, :LANES].astype(jnp.float32)
                    else:
                        winc = stack_ref[0, pl.ds(0, STACK_SRC_ROWS), :]
                        routc = jax.lax.dot_general(
                            ohc_ref[:], winc, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        winh = stack_ref[0, pl.ds(hbase, hdr_w), :]
                        routh = jax.lax.dot_general(
                            ohh_ref[:], winh, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    if mode == "no_reduce":
                        vals = routc[:, :1] + routh[:, :1]
                    else:
                        selv = sel_ref[:].astype(jnp.float32)
                        vals = jnp.sum((routc + routh) * selv, axis=1, keepdims=True)
                    for s in range(8):
                        outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = vals[
                            s * 128 : (s + 1) * 128, :]
                t_out = jax.lax.dot_general(
                    outt_ref[:].astype(jnp.bfloat16), ident,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                pos = (gg * (128 * LANES)
                       + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 0) * LANES
                       + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 1))
                out_ref[0, pl.ds(gg * 128, 128), :] = jnp.where(
                    pos < olen, t_out.astype(jnp.int32), 0).astype(jnp.uint8)
                return _

            jax.lax.fori_loop(0, ngb, group, jnp.int32(0))

        return kernel

    def runner(mode):
        kernel = make_kernel(mode)

        @partial(jax.jit, static_argnames=())
        def call(lo, ba, ro, hb, cb, ck, ol, bpr, dlr, st):
            return pl.pallas_call(
                kernel,
                grid=(B,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 7 + [
                    pl.BlockSpec((1, bpr.shape[1], LANES), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, bpr.shape[1], LANES), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, st.shape[1], LANES), lambda i: (i, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, OUT_ROWS_PAD, LANES), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, OUT_ROWS_PAD, LANES), jnp.uint8),
                scratch_shapes=[
                    pltpu.VMEM((1024, STACK_SRC_ROWS), jnp.bfloat16),
                    pltpu.VMEM((1024, C_NARROW), jnp.bfloat16),
                    pltpu.VMEM((1024, hdr_w), jnp.bfloat16),
                    pltpu.VMEM((1024, LANES), jnp.bfloat16),
                    pltpu.VMEM((128, 128), jnp.float32),
                ],
                interpret=False,
            )(lo.reshape(-1).astype(jnp.int32), ba.reshape(-1).astype(jnp.int32),
              ro.reshape(-1).astype(jnp.int32), hb.reshape(-1).astype(jnp.int32),
              cb.reshape(-1).astype(jnp.int32), ck.reshape(-1).astype(jnp.int32),
              ol.astype(jnp.int32), bpr, dlr, st)

        @jax.jit
        def run(k):
            def body(i, acc):
                out = call(jnp.roll(lo_row, i, axis=0), jnp.roll(base, i, axis=0),
                           jnp.roll(rows_g, i, axis=0), jnp.roll(hb8, i, axis=0),
                           cb8, cbk, jnp.roll(out_len, i), bp_rows, dlt_rows,
                           stack)
                return acc + out[:, ::512, ::64].astype(jnp.int32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    runs = {m: runner(m) for m in
            ("full", "no_step", "no_builds", "no_route", "no_reduce",
             "skeleton")}
    out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "B": B, "bytes": nbytes,
           "t1": {k: [] for k in runs}, "tk": {k: [] for k in runs}}
    for name, run in runs.items():
        t0 = time.perf_counter()
        int(run(jnp.int32(1)))
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)
    for r in range(ROUNDS):
        for name, run in runs.items():
            t0 = time.perf_counter()
            int(run(jnp.int32(1)))
            out["t1"][name].append(round(time.perf_counter() - t0, 5))
            t0 = time.perf_counter()
            int(run(jnp.int32(KBIG)))
            out["tk"][name].append(round(time.perf_counter() - t0, 5))
        print(f"round {r}", flush=True)
    for name in runs:
        per = (min(out["tk"][name]) - min(out["t1"][name])) / (KBIG - 1)
        out[name] = {"s_per_iter": round(per, 6),
                     "us_per_block": round(per / B * 1e6, 2)}
        print(name, json.dumps(out[name]), flush=True)
    with open(os.path.join(HERE, "FUSED_PROFILE.json"), "w") as f2:
        json.dump(out, f2, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
