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
                   oh_n, oh_m, oh_w, sel_ref, outt_ref):
            oh_by_w = {}
            for ref, w in ((oh_n, w_narrow), (oh_m, w_mid), (oh_w, w_wide)):
                oh_by_w.setdefault(w, ref)
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
                use_pack2 = mode in ("pack2", "pack2_int", "combo")
                int_oh = mode in ("int_oh", "pack2_int", "combo", "take_sel")
                for s in range(8):
                    col = blk[:, tt * 8 + s : tt * 8 + s + 1]
                    row_i = col >> 7
                    lane_i = col & 127
                    if use_pack2:
                        # One-hot over packed row PAIRS: width w/2.
                        if int_oh:
                            ohp = (
                                jax.lax.broadcasted_iota(
                                    jnp.int32, (128, w // 2), 1) == (row_i >> 1)
                            ).astype(jnp.float32)
                        else:
                            ohp = ind(fiota((128, w // 2), 1),
                                      (row_i >> 1).astype(jnp.float32))
                        oh_ref[pl.ds(s * 128, 128), : w // 2] = ohp.astype(
                            jnp.bfloat16)  # stored bf16; matmul casts to f32
                    elif int_oh:
                        oh_ref[pl.ds(s * 128, 128), :] = (
                            jax.lax.broadcasted_iota(jnp.int32, (128, w), 1)
                            == row_i
                        ).astype(jnp.bfloat16)
                    else:
                        colf = col.astype(jnp.float32)
                        row_em = jnp.floor(colf * (1.0 / LANES))
                        if mode not in ("oh_once", "skel") or s == 0:
                            oh_ref[pl.ds(s * 128, 128), :] = ind(
                                fiota((128, w), 1), row_em).astype(jnp.bfloat16)
                    if mode != "take_sel":
                        if mode not in ("sel_once", "skel") or s == 0:
                            sel_ref[pl.ds(s * 128, 128), :] = ind(
                                lane2f, lane_i.astype(jnp.float32))
                    if mode == "take_sel" and False:
                        pass
                if mode == "skel":
                    vals = srcw_ref[pl.ds(0, 1024), :1].astype(jnp.float32)
                elif mode == "no_mm":
                    vals = jnp.sum(sel_ref[:], axis=1, keepdims=True)
                elif use_pack2:
                    win = srcw_ref[pl.ds(base, w), :]
                    # Pack row pairs: value = lo + 256*hi < 2^16; exact in
                    # an f32 matmul (operands < 2^24).
                    win_pk = (
                        win[0::2, :] + win[1::2, :] * 256
                    ).astype(jnp.float32)
                    routed = jax.lax.dot_general(
                        oh_ref[:, : w // 2].astype(jnp.float32), win_pk,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    vals16 = jnp.sum(routed * sel_ref[:], axis=1, keepdims=True)
                    hi = jnp.floor(vals16 * (1.0 / 256.0))
                    lo = vals16 - hi * 256.0
                    # Row parity selects the byte.
                    par = jnp.zeros((1024, 1), jnp.float32)
                    for s in range(8):
                        pslice = (blk[:, tt * 8 + s : tt * 8 + s + 1] >> 7) & 1
                        par = jax.lax.dynamic_update_slice(
                            par, pslice.astype(jnp.float32), (s * 128, 0))
                    vals = jnp.where(par > 0, hi, lo)
                else:
                    win = srcw_ref[pl.ds(base, w), :]
                    routed = jax.lax.dot_general(
                        oh_ref[:], win.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if mode == "no_sel":
                        vals = routed[:, :1]
                    elif mode == "take_sel":
                        lane_all = jnp.zeros((1024, 1), jnp.int32)
                        for s in range(8):
                            lslice = blk[:, tt * 8 + s : tt * 8 + s + 1] & 127
                            lane_all = jax.lax.dynamic_update_slice(
                                lane_all, lslice, (s * 128, 0))
                        vals = jnp.take_along_axis(routed, lane_all, axis=1)
                    else:
                        vals = jnp.sum(routed * sel_ref[:], axis=1, keepdims=True)
                for s in range(8):
                    outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = vals[
                        s * 128 : (s + 1) * 128, :]

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
