#!/usr/bin/env python
"""Stage-attribution probe for the v2 flat-gather kernel.

Times stripped variants (device-only K-loop, same methodology as
tpu_device_time.py) to attribute v2 kernel time between the one-hot
build, the lane-select build, the routing matmul, the mul-reduce, the
output column writes, and the MXU transpose. Also times a bf16-built
one-hot variant (legal for w <= 256; at w = 512 timing-only here — the
production change would build w=512 in f32). Writes V2_PROFILE.json.
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

    from bench import _compressed_rows, _load_corpus_blocks
    from snappy_tpu import native

    LANES = 128
    KBIG = int(os.environ.get("VP_KBIG", "17"))

    blocks, lens = _load_corpus_blocks(repeat=1)
    srcs_np, slens_np = _compressed_rows(blocks, lens)
    width = max(1024, -(-int(slens_np.max()) // 1024) * 1024)
    srcs_np = np.ascontiguousarray(srcs_np[:, :width])
    nbytes = int(lens.sum())
    d_pad = 65536

    idxp, tmeta, fallb, _e, _d = native.flatten_idx_batch(
        srcs_np, slens_np.astype(np.uint64), np.asarray(lens, np.uint64),
        d_pad, layout=1,
    )
    assert not fallb.any()

    b = srcs_np.shape[0]
    s_rows, d_rows = width // LANES, d_pad // LANES
    n_tiles = d_rows // 8
    n_groups = d_rows // 128

    def r128(x):
        return -(-x // 128) * 128

    w_narrow, w_mid, w_wide = (
        r128(min(128, s_rows)), r128(min(256, s_rows)), r128(min(512, s_rows)),
    )
    s_scr = max(s_rows, w_wide)

    def make_kernel(mode: str):
        def kernel(meta_ref, declen_ref, src_ref, idx_ref, dst_ref, srcw_ref,
                   oh_n, oh_m, oh_w, oh_q, sel_ref, outt_ref):
            oh_by_w = {}
            for ref, w in ((oh_n, w_narrow), (oh_m, w_mid), (oh_w, w_wide)):
                oh_by_w.setdefault(w, ref)
            oh_by_w.setdefault(64, oh_q)
            i = pl.program_id(0)
            declen = declen_ref[i]
            srcw_ref[pl.ds(0, s_rows), :] = src_ref[0].astype(jnp.int32)
            if s_scr > s_rows:
                srcw_ref[pl.ds(s_rows, s_scr - s_rows), :] = jnp.zeros(
                    (s_scr - s_rows, LANES), jnp.int32)

            def fiota(shape, dim, dt=jnp.float32):
                return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(dt)

            def ind(a, b_):
                return jnp.maximum(a.dtype.type(1) - jnp.abs(a - b_), a.dtype.type(0))

            lane2f = fiota((128, LANES), 1)
            lane2b = fiota((128, LANES), 1, jnp.bfloat16)
            ident = ind(fiota((128, 128), 0), fiota((128, 128), 1)).astype(jnp.bfloat16)

            def tile_into(blk, tt, base, w):
                oh_ref = oh_by_w[w]
                pack2 = mode in ("pack2b", "pack2b_sum")
                wq = w // 2 if pack2 else w
                for s in range(8):
                    col = blk[:, tt * 8 + s : tt * 8 + s + 1]
                    colf = col.astype(jnp.float32)
                    row_em = jnp.floor(colf * (1.0 / LANES))
                    if pack2:
                        row_em = jnp.floor(row_em * 0.5)
                    if mode not in ("oh_once", "skel") or s == 0:
                        # Write full rows of the (1024, wq) region; pack2
                        # modes use the narrower bucket scratch (full
                        # width there — partial lane-slice writes crash
                        # Mosaic, v2_bisect).
                        tgt = oh_by_w.get(wq, oh_ref) if pack2 else oh_ref
                        tgt[pl.ds(s * 128, 128), :] = ind(
                            fiota((128, wq), 1), row_em).astype(jnp.bfloat16)
                    if mode not in ("take_sel", "pack2b", "sel_once", "skel") or (
                        mode in ("sel_once",) and s == 0
                    ):
                        if mode not in ("take_sel", "pack2b"):
                            lane_em = colf - jnp.floor(colf * (1.0 / LANES)) * LANES
                            sel_ref[pl.ds(s * 128, 128), :] = ind(lane2f, lane_em)

                def emit(vals):
                    for s in range(8):
                        outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = vals[
                            s * 128 : (s + 1) * 128, :]

                if mode == "skel":
                    emit(srcw_ref[pl.ds(0, 1024), :1].astype(jnp.float32))
                    return
                if mode == "no_mm":
                    emit(jnp.sum(sel_ref[:], axis=1, keepdims=True))
                    return
                if pack2:
                    ohq = oh_by_w.get(wq, oh_ref)
                    win = srcw_ref[pl.ds(base, w), :]
                    we = win[0::2, :].astype(jnp.bfloat16)
                    wo = win[1::2, :].astype(jnp.bfloat16)
                    r_lo = jax.lax.dot_general(
                        ohq[:], we, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    r_hi = jax.lax.dot_general(
                        ohq[:], wo, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if mode == "pack2b_sum":
                        v_lo = jnp.sum(r_lo * sel_ref[:], axis=1, keepdims=True)
                        v_hi = jnp.sum(r_hi * sel_ref[:], axis=1, keepdims=True)
                        for s in range(8):
                            col = blk[:, tt * 8 + s : tt * 8 + s + 1]
                            par = (col >> 7) & 1
                            piece = jnp.where(
                                par > 0,
                                v_hi[s * 128 : (s + 1) * 128, :],
                                v_lo[s * 128 : (s + 1) * 128, :],
                            )
                            outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = piece
                    else:  # pack2b: take_along per piece
                        for s in range(8):
                            col = blk[:, tt * 8 + s : tt * 8 + s + 1]
                            lane_i = col & 127
                            par = (col >> 7) & 1
                            li = jnp.broadcast_to(lane_i, (128, 128))
                            lo = jnp.take_along_axis(
                                r_lo[s * 128 : (s + 1) * 128, :], li, axis=1)[:, :1]
                            hi = jnp.take_along_axis(
                                r_hi[s * 128 : (s + 1) * 128, :], li, axis=1)[:, :1]
                            piece = jnp.where(par > 0, hi, lo)
                            outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = piece
                    return
                win = srcw_ref[pl.ds(base, w), :]
                routed = jax.lax.dot_general(
                    oh_ref[:], win.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if mode == "no_sel":
                    emit(routed[:, :1])
                elif mode == "take_sel":
                    for s in range(8):
                        lane_i = blk[:, tt * 8 + s : tt * 8 + s + 1] & 127
                        li = jnp.broadcast_to(lane_i, (128, 128))
                        piece = jnp.take_along_axis(
                            routed[s * 128 : (s + 1) * 128, :], li, axis=1)[:, :1]
                        outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = piece
                else:
                    emit(jnp.sum(routed * sel_ref[:], axis=1, keepdims=True))

            def group(g, acc):
                blk = idx_ref[0, pl.ds(g * 128, 128), :]
                for tt in range(16):
                    t = g * 16 + tt
                    base = meta_ref[i * n_tiles * 2 + 2 * t]
                    bucket = meta_ref[i * n_tiles * 2 + 2 * t + 1]

                    def mk(w):
                        def f(_):
                            tile_into(blk, tt, base, w)
                            return 0
                        return f

                    jax.lax.switch(bucket, [mk(w_narrow), mk(w_mid), mk(w_wide)], None)
                t_out = jax.lax.dot_general(
                    outt_ref[:].astype(jnp.bfloat16), ident,
                    (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                pos = (g * (128 * LANES)
                       + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 0) * LANES
                       + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 1))
                dst_ref[0, pl.ds(g * 128, 128), :] = jnp.where(
                    pos < declen, t_out.astype(jnp.int32), 0).astype(jnp.uint8)
                return acc

            jax.lax.fori_loop(0, n_groups, group, jnp.int32(0))

        return kernel

    @partial(jax.jit, static_argnames=("mode",))
    def run_mode(srcs, idx, meta, dls, mode):
        idx = idx.astype(jnp.int32)
        return pl.pallas_call(
            make_kernel(mode),
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
                pltpu.VMEM((1024, w_narrow), jnp.bfloat16),
                pltpu.VMEM((1024, w_mid), jnp.bfloat16),
                pltpu.VMEM((1024, w_wide), jnp.bfloat16),
                pltpu.VMEM((1024, 64), jnp.bfloat16),
                pltpu.VMEM((1024, LANES), jnp.float32),
                pltpu.VMEM((128, 128), jnp.float32),
            ],
        )(meta.reshape(b * n_tiles * 2), dls.astype(jnp.int32),
          srcs.reshape(b, s_rows, LANES), idx.reshape(b, d_rows, LANES))

    srcs = jnp.asarray(srcs_np)
    idxj = jnp.asarray(idxp)
    metaj = jnp.asarray(tmeta)
    dls = jnp.asarray(lens).astype(jnp.int32)

    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "blocks": b, "bytes": nbytes, "k_big": KBIG,
    }

    def k_loop(mode):
        @jax.jit
        def run(k):
            def body(i2, acc):
                i_ = jnp.roll(idxj, i2, axis=0)
                d_ = jnp.roll(dls, i2)
                dst = run_mode(srcs, i_, metaj, d_, mode)
                return acc + dst[:, :, ::64].astype(jnp.int32).sum()
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return run

    modes = os.environ.get(
        "VP_MODES", "skel,no_mm,oh_once,sel_once,no_sel,full,bf16_build"
    ).split(",")
    for mode in modes:
        try:
            run = k_loop(mode)
            t0 = time.perf_counter()
            int(run(jnp.int32(1)))
            compile_s = time.perf_counter() - t0

            def once(k):
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    int(run(jnp.int32(k)))
                    best = min(best, time.perf_counter() - t0)
                return best

            t1, tk = once(1), once(KBIG)
            per = (tk - t1) / (KBIG - 1)
            out[mode] = {
                "compile_s": round(compile_s, 1),
                "device_s_per_iter": round(per, 5),
                "device_GBps": round(nbytes / per / 1e9, 4) if per > 0 else None,
            }
        except Exception as e:
            out[mode] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(mode, json.dumps(out[mode]), flush=True)

    with open(os.path.join(HERE, "V2_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote V2_PROFILE.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
