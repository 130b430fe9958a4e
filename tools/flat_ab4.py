#!/usr/bin/env python
"""A/B: flat-gather v2 vs v3 (3 zero-branch passes) vs v4 (single pass,
group-level switch), plus single-pass probes isolating v3's fixed costs.

Methodology as tools/flat_ab2.py (interleaved, K-chained, min-of-samples
t1/tk). Writes FLAT_AB4.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(HERE, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _compressed_rows, _load_corpus_blocks
    from snappy_tpu import native
    from snappy_tpu.ops.pallas import decode as pd

    KBIG = int(os.environ.get("AB_KBIG", "9"))
    ROUNDS = int(os.environ.get("AB_ROUNDS", "8"))

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
    assert not f2.any()
    gbuck = pd.group_buckets(meta2, lens, d_pad)

    srcs = jnp.asarray(srcs_np)
    dls = jnp.asarray(lens).astype(jnp.int32)
    idxj = jnp.asarray(idx2)
    metaj = jnp.asarray(meta2)
    gbj = jnp.asarray(gbuck)

    # Correctness: v4 bytes == oracle blocks (v3 verified in FLAT_AB3).
    dst4 = np.asarray(
        pd._decode_flat_pallas_v4(srcs, idxj, metaj, gbj, dls, d_pad, False)
    )
    bad = sum(
        bytes(dst4[i, : lens[i]]) != bytes(blocks[i, : lens[i]])
        for i in range(len(lens))
    )
    print(f"v4 correctness: {bad} mismatching rows", flush=True)

    import functools

    @functools.partial(jax.jit, static_argnames=("d_pad", "interpret", "k"))
    def v3_single(srcs, idx_phys, tile_meta, gbuck, declens, d_pad, interpret, k):
        # One v3 pass alone (partial output): isolates per-pass fixed cost.
        idx_phys = idx_phys.astype(jnp.uint16)
        b, s = srcs.shape
        s_rows, d_rows = s // pd.LANES, d_pad // pd.LANES
        n_tiles = d_rows // 8
        w_nom = (128, 256, 512)[k]
        kernel = pd._make_flat_v3_kernel(s_rows, d_rows, w_nom, k)
        _r128 = lambda x: -(-x // 128) * 128
        w = _r128(min(w_nom, s_rows))
        s_scr = max(s_rows + max(w_nom - 128, 0), w)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, s_rows, pd.LANES), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, d_rows, pd.LANES), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, d_rows, pd.LANES), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, d_rows, pd.LANES), jnp.uint8),
            scratch_shapes=[
                pltpu.VMEM((s_scr, pd.LANES), jnp.int32),
                pltpu.VMEM((1024, w), jnp.bfloat16),
                pltpu.VMEM((1024, pd.LANES), jnp.bfloat16),
                pltpu.VMEM((128, 128), jnp.float32),
            ],
            interpret=interpret,
        )(
            tile_meta.reshape(b * n_tiles * 2),
            gbuck.reshape(b * (d_rows // 128)),
            declens.astype(jnp.int32),
            srcs.reshape(b, s_rows, pd.LANES),
            idx_phys.reshape(b, d_rows, pd.LANES),
        ).reshape(b, d_pad)

    def loop(fn):
        # Roll every per-row input with the same shift (idx, declen,
        # meta, gbuck) so all variants see identical self-consistent
        # work each iteration (ADVICE r3).
        @jax.jit
        def run(k):
            def body(i, acc):
                ii = jnp.roll(idxj, i, axis=0)
                dd = jnp.roll(dls, i)
                mm = jnp.roll(metaj, i, axis=0)
                gg = jnp.roll(gbj, i, axis=0)
                dst = fn(srcs, ii, mm, gg, dd, d_pad)
                return acc + dst[:, ::4096].astype(jnp.int32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    runs = {
        "prod_v2": loop(
            lambda s_, i_, m_, g_, d_, dp: pd._decode_flat_pallas_v2(
                s_, i_, m_, d_, dp, False
            )
        ),
        "v3": loop(
            lambda s_, i_, m_, g_, d_, dp: pd._decode_flat_pallas_v3(
                s_, i_, m_, g_, d_, dp, False
            )
        ),
        "v4": loop(
            lambda s_, i_, m_, g_, d_, dp: pd._decode_flat_pallas_v4(
                s_, i_, m_, g_, d_, dp, False
            )
        ),
        "v3_p0": loop(
            lambda s_, i_, m_, g_, d_, dp: v3_single(s_, i_, m_, g_, d_, dp, False, 0)
        ),
        "v3_p1": loop(
            lambda s_, i_, m_, g_, d_, dp: v3_single(s_, i_, m_, g_, d_, dp, False, 1)
        ),
        "v3_p2": loop(
            lambda s_, i_, m_, g_, d_, dp: v3_single(s_, i_, m_, g_, d_, dp, False, 2)
        ),
    }
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "bytes": nbytes, "k_big": KBIG, "rounds": ROUNDS,
        "v4_mismatches": int(bad),
        "t1": {k: [] for k in runs}, "tk": {k: [] for k in runs},
    }
    for name, run in runs.items():
        t0 = time.perf_counter()
        int(run(jnp.int32(1)))
        print(f"{name} compiled in {time.perf_counter() - t0:.1f}s", flush=True)

    for r in range(ROUNDS):
        for name, run in runs.items():
            t0 = time.perf_counter()
            int(run(jnp.int32(1)))
            out["t1"][name].append(round(time.perf_counter() - t0, 5))
            t0 = time.perf_counter()
            int(run(jnp.int32(KBIG)))
            out["tk"][name].append(round(time.perf_counter() - t0, 5))
        print(f"round {r} done", flush=True)

    for name in runs:
        per = (min(out["tk"][name]) - min(out["t1"][name])) / (KBIG - 1)
        out[name] = {
            "min_t1": min(out["t1"][name]),
            "min_tk": min(out["tk"][name]),
            "s_per_iter": round(per, 5),
            "GBps": round(nbytes / per / 1e9, 4) if per > 0 else None,
        }
        print(name, json.dumps(out[name]), flush=True)

    with open(os.path.join(HERE, "FLAT_AB4.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
