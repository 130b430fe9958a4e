#!/usr/bin/env python
"""Stage ablation of the v3 narrow (w=128) pass: where does tile time go?

Variants of the single-width kernel with stages knocked out (outputs are
garbage for ablated variants — timing only):
  full      oh build + sel build + routing matmul + sel-reduce + outt
  no_oh     skip one-hot builds (matmul consumes stale scratch)
  no_sel    skip sel builds
  no_mm     skip routing matmul (reduce consumes stale sel as routed)
  no_reduce skip the sel multiply-reduce (write routed[:, :1])
  empty     only idx block read + outt/transpose/write

Writes V5_PROFILE.json. Methodology as tools/flat_ab2.py.
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
    from snappy_tpu.ops.pallas import decode as pd

    LANES = pd.LANES
    KBIG = int(os.environ.get("AB_KBIG", "9"))
    ROUNDS = int(os.environ.get("AB_ROUNDS", "6"))
    K = 0
    W_NOM = 128

    blocks, lens = _load_corpus_blocks(repeat=1)
    srcs_np, slens_np = _compressed_rows(blocks, lens)
    width = max(1024, -(-int(slens_np.max()) // 1024) * 1024)
    srcs_np = np.ascontiguousarray(srcs_np[:, :width])
    nbytes = int(lens.sum())
    d_pad = 65536

    idx2, meta2, f2, _e2, _d2 = native.flatten_idx_batch(
        srcs_np, slens_np.astype(np.uint64), np.asarray(lens, np.uint64),
        d_pad, layout=1,
    )
    gbuck = pd.group_buckets(meta2, lens, d_pad)

    def make_kernel(s_rows, d_rows, ablate):
        n_tiles = d_rows // 8
        n_groups = d_rows // 128
        _r128 = lambda x: -(-x // 128) * 128
        w = _r128(min(W_NOM, s_rows))
        s_scr = max(s_rows, w)

        def kernel(meta_ref, gbuck_ref, declen_ref, src_ref, idx_ref, dst_ref,
                   srcw_ref, oh_ref, sel_ref, outt_ref):
            i = pl.program_id(0)
            declen = declen_ref[i]
            srcw_ref[pl.ds(0, s_rows), :] = src_ref[0].astype(jnp.int32)
            if s_scr > s_rows:
                srcw_ref[pl.ds(s_rows, s_scr - s_rows), :] = jnp.zeros(
                    (s_scr - s_rows, LANES), jnp.int32)

            def fiota(shape, dim):
                return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
                    jnp.float32)

            def ind(a, b):
                return jnp.maximum(jnp.float32(1) - jnp.abs(a - b),
                                   jnp.float32(0))

            lane2f = fiota((128, LANES), 1)
            ident = ind(fiota((128, 128), 0), fiota((128, 128), 1)).astype(
                jnp.bfloat16)

            def tile_into(blk, tt, base):
                if "empty" not in ablate:
                    for s in range(8):
                        col = blk[:, tt * 8 + s : tt * 8 + s + 1].astype(
                            jnp.float32)
                        row_em = jnp.floor(col * (1.0 / LANES))
                        lane_em = col - row_em * LANES
                        if "oh" not in ablate:
                            oh_ref[pl.ds(s * 128, 128), :] = ind(
                                fiota((128, w), 1), row_em).astype(jnp.bfloat16)
                        if "sel" not in ablate:
                            sel_ref[pl.ds(s * 128, 128), :] = ind(
                                lane2f, lane_em).astype(jnp.bfloat16)
                if "mm" not in ablate and "empty" not in ablate:
                    win = srcw_ref[pl.ds(base, w), :]
                    routed = jax.lax.dot_general(
                        oh_ref[:], win.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    routed = sel_ref[:].astype(jnp.float32)
                if "reduce" not in ablate and "empty" not in ablate:
                    vals = jnp.sum(
                        routed * sel_ref[:].astype(jnp.float32), axis=1,
                        keepdims=True)
                else:
                    vals = routed[:, :1]
                for s in range(8):
                    outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = vals[
                        s * 128 : (s + 1) * 128, :]

            def group(g, acc):
                def live_group(_):
                    blk = idx_ref[0, pl.ds(g * 128, 128), :].astype(jnp.int32)
                    for tt in range(16):
                        t = g * 16 + tt
                        base = meta_ref[i * n_tiles * 2 + 2 * t]
                        tile_into(blk, tt, base)
                    return 0

                def dead(_):
                    dst_ref[0, pl.ds(g * 128, 128), :] = jnp.zeros(
                        (128, LANES), jnp.uint8)
                    return 0

                def live_and_write(_):
                    live_group(None)
                    t_out = jax.lax.dot_general(
                        outt_ref[:].astype(jnp.bfloat16), ident,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    pos = (
                        g * (128 * LANES)
                        + jax.lax.broadcasted_iota(
                            jnp.int32, (128, LANES), 0) * LANES
                        + jax.lax.broadcasted_iota(
                            jnp.int32, (128, LANES), 1))
                    dst_ref[0, pl.ds(g * 128, 128), :] = jnp.where(
                        pos < declen, t_out.astype(jnp.int32), 0
                    ).astype(jnp.uint8)
                    return 0

                jax.lax.cond(
                    gbuck_ref[i * n_groups + g] == K, live_and_write, dead,
                    None)
                return acc

            jax.lax.fori_loop(0, n_groups, group, jnp.int32(0))

        return kernel, w, s_scr

    @partial(jax.jit, static_argnames=("d_pad", "ablate"))
    def run_variant(srcs, idx_phys, tile_meta, gbuck, declens, d_pad, ablate):
        idx_phys = idx_phys.astype(jnp.uint16)
        b, s = srcs.shape
        s_rows, d_rows = s // LANES, d_pad // LANES
        n_tiles = d_rows // 8
        kernel, w, s_scr = make_kernel(s_rows, d_rows, ablate)
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, s_rows, LANES), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, d_rows, LANES), jnp.uint8),
            scratch_shapes=[
                pltpu.VMEM((s_scr, LANES), jnp.int32),
                pltpu.VMEM((1024, w), jnp.bfloat16),
                pltpu.VMEM((1024, LANES), jnp.bfloat16),
                pltpu.VMEM((128, 128), jnp.float32),
            ],
            interpret=False,
        )(
            tile_meta.reshape(b * n_tiles * 2),
            gbuck.reshape(b * (d_rows // 128)),
            declens.astype(jnp.int32),
            srcs.reshape(b, s_rows, LANES),
            idx_phys.reshape(b, d_rows, LANES),
        ).reshape(b, d_pad)

    srcs = jnp.asarray(srcs_np)
    dls = jnp.asarray(lens).astype(jnp.int32)
    idxj = jnp.asarray(idx2)
    metaj = jnp.asarray(meta2)
    gbj = jnp.asarray(gbuck)

    def loop(ablate):
        @jax.jit
        def run(k):
            def body(i, acc):
                ii = jnp.roll(idxj, i, axis=0)
                dd = jnp.roll(dls, i)
                dst = run_variant(srcs, ii, metaj, gbj, dd, d_pad, ablate)
                return acc + dst[:, ::4096].astype(jnp.int32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    variants = {
        "full": loop(()),
        "no_oh": loop(("oh",)),
        "no_sel": loop(("sel",)),
        "no_mm": loop(("mm",)),
        "no_reduce": loop(("reduce",)),
        "no_builds": loop(("oh", "sel")),
        "empty": loop(("empty",)),
    }
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "bytes": nbytes, "k_big": KBIG, "rounds": ROUNDS, "pass": K,
        "t1": {k: [] for k in variants}, "tk": {k: [] for k in variants},
    }
    for name, run in variants.items():
        t0 = time.perf_counter()
        int(run(jnp.int32(1)))
        print(f"{name} compiled in {time.perf_counter() - t0:.1f}s", flush=True)

    for r in range(ROUNDS):
        for name, run in variants.items():
            t0 = time.perf_counter()
            int(run(jnp.int32(1)))
            out["t1"][name].append(round(time.perf_counter() - t0, 5))
            t0 = time.perf_counter()
            int(run(jnp.int32(KBIG)))
            out["tk"][name].append(round(time.perf_counter() - t0, 5))
        print(f"round {r} done", flush=True)

    for name in variants:
        per = (min(out["tk"][name]) - min(out["t1"][name])) / (KBIG - 1)
        out[name] = {
            "min_t1": min(out["t1"][name]),
            "min_tk": min(out["tk"][name]),
            "s_per_iter": round(per, 5),
        }
        print(name, json.dumps(out[name]), flush=True)

    with open(os.path.join(HERE, "V5_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
