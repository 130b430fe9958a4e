#!/usr/bin/env python
"""A/B: v2 3-branch bucket switch vs 2-branch {128,512} vs zero-branch.

Round-3 evidence says per-tile switch arity, not FLOPs, binds the flat
decode kernel (R3_NOTES §2: a balanced 2-branch {256,512} set paid +41%
FLOPs for one fewer branch and netted zero). This measures the other
2-branch candidate — {narrow 128, wide 512}, which keeps the dominant
narrow tiles cheap — by remapping bucket 1 (mid) to 2 (wide) in-kernel
(wider windows from the same base stay valid: the scratch zero-pads
past s_rows). Also re-measures the zero-branch all-512 formulation on
the same data. Interleaved rounds, min-of-samples. Writes FLAT_AB5.json.
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

    KBIG = int(os.environ.get("AB_KBIG", "9"))
    ROUNDS = int(os.environ.get("AB_ROUNDS", "8"))
    REPEAT = int(os.environ.get("AB_REPEAT", "1"))

    blocks, lens = _load_corpus_blocks(repeat=REPEAT)
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
    import collections
    hist = collections.Counter(np.asarray(meta2)[:, :, 1].ravel().tolist())
    print("bucket histogram:", dict(hist), flush=True)

    srcs = jnp.asarray(srcs_np)
    dls = jnp.asarray(lens).astype(jnp.int32)
    idxj = jnp.asarray(idx2)
    metaj = jnp.asarray(meta2)

    # --- 2-branch variant: _make_flat_v2_kernel with bucket 1 -> 2 ---
    LANES = pd.LANES

    def make_b2_kernel(s_rows, d_rows):
        base_kernel = pd._make_flat_v2_kernel(s_rows, d_rows)
        # wrap: remap meta buckets on the fly is easiest done by patching
        # meta host-side; kernel itself unchanged. (see meta_b2 below)
        return base_kernel

    meta_np = np.asarray(meta2).copy()
    meta_b2 = meta_np.copy()
    meta_b2[:, :, 1] = np.where(meta_b2[:, :, 1] == 1, 2, meta_b2[:, :, 1])
    meta_b1 = meta_np.copy()
    meta_b1[:, :, 1] = 2
    # wide windows from unchanged bases stay in range: fit used
    # min(w,s_rows); rows past s_rows are zero in the kernel scratch.

    variants = {
        "prod_v2": jnp.asarray(meta_np),
        "b2_128_512": jnp.asarray(meta_b2),
        "b1_512": jnp.asarray(meta_b1),
    }

    def loop(mj):
        @jax.jit
        def run(k):
            def body(i, acc):
                ii = jnp.roll(idxj, i, axis=0)
                dd = jnp.roll(dls, i)
                mm = jnp.roll(mj, i, axis=0)
                dst = pd._decode_flat_pallas_v2(srcs, ii, mm, dd, d_pad, False)
                return acc + dst[:, ::4096].astype(jnp.int32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    runs = {name: loop(mj) for name, mj in variants.items()}
    # correctness spot: b2 must be byte-exact with prod
    d0 = np.asarray(pd._decode_flat_pallas_v2(srcs, idxj, variants["prod_v2"], dls, d_pad, False))
    d1 = np.asarray(pd._decode_flat_pallas_v2(srcs, idxj, variants["b2_128_512"], dls, d_pad, False))
    d2 = np.asarray(pd._decode_flat_pallas_v2(srcs, idxj, variants["b1_512"], dls, d_pad, False))
    assert np.array_equal(d0, d1), "b2 mismatch"
    assert np.array_equal(d0, d2), "b1 mismatch"
    print("correctness: byte-exact across variants", flush=True)

    out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "bytes": nbytes, "k_big": KBIG, "rounds": ROUNDS,
           "bucket_histogram": {str(k): v for k, v in hist.items()},
           "t1": {k: [] for k in runs}, "tk": {k: [] for k in runs}}
    for name, run in runs.items():
        int(run(jnp.int32(1)))
        print(f"compiled {name}", flush=True)
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
        out[name] = {
            "s_per_iter": round(per, 5),
            "GBps": round(nbytes / per / 1e9, 4) if per > 0 else None,
        }
        print(name, json.dumps(out[name]), flush=True)
    with open(os.path.join(HERE, "FLAT_AB5.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
