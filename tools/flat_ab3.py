#!/usr/bin/env python
"""A/B: flat-gather v2 (3-branch per-tile switch) vs v3 (zero-branch
per-width passes, group-homogeneous buckets).

Methodology as tools/flat_ab2.py: one process, interleaved variants,
K-chained iterations inside one jit, per-iter from (tk - t1)/(K - 1),
min-of-samples for t1 and tk separately (the chip is time-shared).
Also runs a byte-exactness leg of v3 against the host oracle on the
real corpus batch. Writes FLAT_AB3.json.
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
        _decode_flat_pallas_v2,
        _decode_flat_pallas_v3,
        group_buckets,
    )

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
    gbuck = group_buckets(meta2, lens, d_pad)

    srcs = jnp.asarray(srcs_np)
    dls = jnp.asarray(lens).astype(jnp.int32)
    idxj = jnp.asarray(idx2)
    metaj = jnp.asarray(meta2)
    gbj = jnp.asarray(gbuck)

    # Correctness leg on the chip first: v3 bytes == oracle blocks.
    dst3 = np.asarray(
        _decode_flat_pallas_v3(srcs, idxj, metaj, gbj, dls, d_pad, False)
    )
    bad = sum(
        bytes(dst3[i, : lens[i]]) != bytes(blocks[i, : lens[i]])
        for i in range(len(lens))
    )
    pad_bad = sum(bool(dst3[i, lens[i]:].any()) for i in range(len(lens)))
    print(f"correctness: {bad} byte mismatches, {pad_bad} pad violations",
          flush=True)

    def loop_v2():
        @jax.jit
        def run(k):
            def body(i, acc):
                ii = jnp.roll(idxj, i, axis=0)
                dd = jnp.roll(dls, i)
                mm = jnp.roll(metaj, i, axis=0)
                dst = _decode_flat_pallas_v2(srcs, ii, mm, dd, d_pad, False)
                return acc + dst[:, ::4096].astype(jnp.int32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    def loop_v3():
        @jax.jit
        def run(k):
            def body(i, acc):
                ii = jnp.roll(idxj, i, axis=0)
                dd = jnp.roll(dls, i)
                mm = jnp.roll(metaj, i, axis=0)
                gg = jnp.roll(gbj, i, axis=0)
                dst = _decode_flat_pallas_v3(
                    srcs, ii, mm, gg, dd, d_pad, False
                )
                return acc + dst[:, ::4096].astype(jnp.int32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    runs = {"prod_v2": loop_v2(), "v3": loop_v3()}
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "bytes": nbytes, "k_big": KBIG, "rounds": ROUNDS,
        "correct_mismatches": int(bad), "pad_violations": int(pad_bad),
        "t1": {k: [] for k in runs}, "tk": {k: [] for k in runs},
    }
    for name, run in runs.items():
        t0 = time.perf_counter()
        int(run(jnp.int32(1)))  # compile
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

    with open(os.path.join(HERE, "FLAT_AB3.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
