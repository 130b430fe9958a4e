#!/usr/bin/env python
"""Interleaved A/B of the flat v1 and v2 decode kernels.

DEVICE_TIME runs show the MXU-bound flat kernels swinging ~2x between
processes while the scalar-bound replay kernel stays within 0.2%. This
harness measures v1 and v2 interleaved (v1, v2, v1, v2, ...) with
several K-loop reps each, in one process, to separate real kernel
differences from machine/compile variance. Writes FLAT_AB.json.
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
    from snappy_tpu.ops.pallas.decode import (
        _decode_flat_pallas,
        _decode_flat_pallas_v2,
    )

    KBIG = int(os.environ.get("AB_KBIG", "17"))
    ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))

    blocks, lens = _load_corpus_blocks(repeat=1)
    srcs_np, slens_np = _compressed_rows(blocks, lens)
    width = max(1024, -(-int(slens_np.max()) // 1024) * 1024)
    srcs_np = np.ascontiguousarray(srcs_np[:, :width])
    nbytes = int(lens.sum())
    d_pad = 65536

    idx1, meta1, f1, _e1, _d1 = native.flatten_idx_batch(
        srcs_np, slens_np.astype(np.uint64), np.asarray(lens, np.uint64),
        d_pad, layout=0,
    )
    idx2, meta2, f2, _e2, _d2 = native.flatten_idx_batch(
        srcs_np, slens_np.astype(np.uint64), np.asarray(lens, np.uint64),
        d_pad, layout=1,
    )
    assert not f1.any() and not f2.any()

    srcs = jnp.asarray(srcs_np)
    dls = jnp.asarray(lens).astype(jnp.int32)
    i1, m1 = jnp.asarray(idx1), jnp.asarray(meta1)
    i2, m2 = jnp.asarray(idx2), jnp.asarray(meta2)

    def loop(decode_fn, idxj, metaj):
        @jax.jit
        def run(k):
            def body(i, acc):
                ii = jnp.roll(idxj, i, axis=0)
                dd = jnp.roll(dls, i)
                dst = decode_fn(srcs, ii, metaj, dd, d_pad, False)
                return acc + dst[:, ::4096].astype(jnp.int32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    runs = {
        "v1": loop(_decode_flat_pallas, i1, m1),
        "v2": loop(_decode_flat_pallas_v2, i2, m2),
    }
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "bytes": nbytes, "k_big": KBIG, "rounds": ROUNDS,
        "samples": {k: [] for k in runs},
    }
    for name, run in runs.items():
        int(run(jnp.int32(1)))  # compile

    for r in range(ROUNDS):
        for name, run in runs.items():
            t0 = time.perf_counter()
            int(run(jnp.int32(1)))
            t1s = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(run(jnp.int32(KBIG)))
            tks = time.perf_counter() - t0
            per = (tks - t1s) / (KBIG - 1)
            out["samples"][name].append(round(per, 5))
            print(f"round {r} {name}: {per*1000:.2f} ms/iter "
                  f"({nbytes/per/1e9:.3f} GB/s)", flush=True)

    for name in runs:
        best = min(out["samples"][name])
        med = sorted(out["samples"][name])[len(out["samples"][name]) // 2]
        out[name] = {
            "best_s_per_iter": best,
            "median_s_per_iter": med,
            "best_GBps": round(nbytes / best / 1e9, 4),
            "median_GBps": round(nbytes / med / 1e9, 4),
        }
        print(name, json.dumps(out[name]), flush=True)

    with open(os.path.join(HERE, "FLAT_AB.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
