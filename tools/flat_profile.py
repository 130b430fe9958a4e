#!/usr/bin/env python
"""Stage-attribution probe for the flat-gather decode kernel.

Times kernel variants with stages stripped (device-only K-loop, same
methodology as tpu_device_time.py) to attribute time between the
element-major relayout, the one-hot build, the routing matmul, and the
lane select. Writes FLAT_PROFILE.json.
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
    KBIG = int(os.environ.get("FP_KBIG", "9"))

    blocks, lens = _load_corpus_blocks(repeat=1)
    srcs_np, slens_np = _compressed_rows(blocks, lens)
    width = max(1024, -(-int(slens_np.max()) // 1024) * 1024)
    srcs_np = np.ascontiguousarray(srcs_np[:, :width])
    nbytes = int(lens.sum())
    d_pad = 65536

    idxr, tmeta, fallb, _e, _d = native.flatten_idx_batch(
        srcs_np, slens_np.astype(np.uint64), np.asarray(lens, np.uint64), d_pad
    )
    assert not fallb.any()

    b = srcs_np.shape[0]
    s_rows, d_rows = width // LANES, d_pad // LANES
    n_tiles = d_rows // 8
    w_narrow = min(128, s_rows)
    w_wide = min(512, s_rows)

    def make_kernel(mode: str):
        def kernel(meta_ref, declen_ref, src_ref, idx_ref, dst_ref, srcw_ref, dstw_ref):
            i = pl.program_id(0)
            declen = declen_ref[i]
            srcw_ref[:] = src_ref[0].astype(jnp.int32)

            def fiota(shape, dim):
                return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

            def ind(a, b_):
                return jnp.maximum(jnp.float32(1) - jnp.abs(a - b_), jnp.float32(0))

            lane2f = fiota((1024, LANES), 1)
            sublef = fiota((1024, LANES), 0)
            pmf = sublef - jnp.floor(sublef * (1.0 / LANES)) * LANES
            a2 = ind(fiota((1024, 8), 1), jnp.floor(fiota((1024, 8), 0) * (1.0 / LANES)))
            aout = ind(jnp.floor(fiota((8, 1024), 1) * (1.0 / LANES)), fiota((8, 1024), 0))
            sel_pm = ind(lane2f, pmf)

            def bdot(a, b_):
                return jax.lax.dot_general(
                    a.astype(jnp.bfloat16), b_.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            def gather_tile(t, w):
                base = meta_ref[i * n_tiles * 2 + 2 * t]
                idx8 = idx_ref[0, pl.ds(t * 8, 8), :]
                if mode == "loop_only":
                    dstw_ref[pl.ds(t * 8, 8), :] = idx8 + base
                    return
                if mode == "fdot_only":
                    ri = jax.lax.dot_general(
                        a2, idx8.astype(jnp.float32),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    dstw_ref[pl.ds(t * 8, 8), :] = ri[0:8, :].astype(jnp.int32)
                    return
                if mode == "sum_only":
                    ri = jax.lax.dot_general(
                        a2, idx8.astype(jnp.float32),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    idx_em = jnp.sum(ri * sel_pm, axis=1, keepdims=True)
                    dstw_ref[pl.ds(t * 8, 8), :] = (
                        idx_em[0:8, :] + jnp.zeros((8, LANES), jnp.float32)
                    ).astype(jnp.int32)
                    return
                if mode in ("reshape_em", "reshape_full"):
                    idx_em = idx8.astype(jnp.float32).reshape(1024, 1)
                    if mode == "reshape_em":
                        dstw_ref[pl.ds(t * 8, 8), :] = idx_em.reshape(8, LANES).astype(jnp.int32)
                        return
                    row_em = jnp.floor(idx_em * (1.0 / LANES))
                    lane_em = idx_em - row_em * LANES
                    wiof = fiota((1024, w), 1)
                    onehot = jnp.maximum(jnp.float32(1) - jnp.abs(wiof - row_em), 0.0)
                    win = srcw_ref[pl.ds(base, w), :]
                    routed = bdot(onehot, win)
                    vals = jnp.sum(routed * ind(lane2f, lane_em), axis=1, keepdims=True)
                    dstw_ref[pl.ds(t * 8, 8), :] = vals.reshape(8, LANES).astype(jnp.int32)
                    return
                if mode in ("native_in", "native_both"):
                    idx_em = idx8.astype(jnp.float32).reshape(1, 1024).T
                elif mode in ("f32_in", "native_out"):
                    ri = jax.lax.dot_general(
                        a2, idx8.astype(jnp.float32),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    idx_em = jnp.sum(ri * sel_pm, axis=1, keepdims=True)
                else:
                    hi = (idx8 >> 8).astype(jnp.float32)
                    lo = (idx8 & 255).astype(jnp.float32)
                    ri_h = bdot(a2, hi)
                    ri_l = bdot(a2, lo)
                    idx_em = (
                        jnp.sum(ri_h * sel_pm, axis=1, keepdims=True) * 256.0
                        + jnp.sum(ri_l * sel_pm, axis=1, keepdims=True)
                    )
                if mode == "relayout_only":
                    outt = bdot(aout, idx_em * sel_pm)
                    dstw_ref[pl.ds(t * 8, 8), :] = outt.astype(jnp.int32)
                    return
                row_em = jnp.floor(idx_em * (1.0 / LANES))
                lane_em = idx_em - row_em * LANES
                wiof = fiota((1024, w), 1)
                onehot = jnp.maximum(jnp.float32(1) - jnp.abs(wiof - row_em), 0.0)
                if mode == "no_route":
                    # one-hot built but routed through a thin matmul
                    vals = jnp.sum(onehot[:, :1], axis=1, keepdims=True) + lane_em
                    outt = bdot(aout, vals * sel_pm)
                    dstw_ref[pl.ds(t * 8, 8), :] = outt.astype(jnp.int32)
                    return
                win = srcw_ref[pl.ds(base, w), :]
                routed = bdot(onehot, win)
                if mode == "no_sel":
                    vals = routed[:, :1] + lane_em
                else:
                    vals = jnp.sum(routed * ind(lane2f, lane_em), axis=1, keepdims=True)
                if mode in ("native_out", "native_both"):
                    dstw_ref[pl.ds(t * 8, 8), :] = (
                        vals.T.reshape(8, LANES).astype(jnp.int32)
                    )
                else:
                    outt = bdot(aout, vals * sel_pm)
                    dstw_ref[pl.ds(t * 8, 8), :] = outt.astype(jnp.int32)

            def tile(t, acc):
                bucket = meta_ref[i * n_tiles * 2 + 2 * t + 1]
                jax.lax.cond(
                    bucket == 0,
                    lambda _: gather_tile(t, w_narrow),
                    lambda _: gather_tile(t, w_wide),
                    None,
                )
                return acc

            jax.lax.fori_loop(0, n_tiles, tile, jnp.int32(0))
            pos = (
                jax.lax.broadcasted_iota(jnp.int32, (d_rows, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (d_rows, LANES), 1)
            )
            dst_ref[0] = jnp.where(pos < declen, dstw_ref[:], 0).astype(jnp.uint8)

        return kernel

    @partial(jax.jit, static_argnames=("mode",))
    def run_mode(srcs, idx, meta, dls, mode):
        idx = idx.astype(jnp.int32)
        kernel = make_kernel(mode)
        return pl.pallas_call(
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
            ],
        )(
            meta.reshape(b * n_tiles * 2), dls.astype(jnp.int32),
            srcs.reshape(b, s_rows, LANES), idx.reshape(b, d_rows, LANES),
        )

    srcs = jnp.asarray(srcs_np)
    idxj = jnp.asarray(idxr)
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
        "FP_MODES", "loop_only,relayout_only,no_route,no_sel,full"
    ).split(",")
    for mode in modes:
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
        print(mode, json.dumps(out[mode]), flush=True)

    with open(os.path.join(HERE, "FLAT_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote FLAT_PROFILE.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
