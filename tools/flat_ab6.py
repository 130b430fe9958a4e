#!/usr/bin/env python
"""A/B: block-level switch-arm routing for the flat-v2 decode.

Round-3 evidence: per-tile switch arity binds the kernel (zero-branch
w=512 ran 108 effective TFLOPs vs 52 for the 3-branch mix). Instead of
changing bucket sets (FLAT_AB5: losers), route whole ROWS by their max
bucket: all-narrow rows (26% of corpus bytes) run a branchless arms=1
kernel, max-mid rows (36%) run arms=2, the rest keep the 3-branch
production kernel. Measures each subset under its kernel and the same
subset under production, then the blended batch rate. Byte-exactness
asserted per subset. Writes FLAT_AB6.json.
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
    mb = np.asarray(meta2)[:, :, 1].max(axis=1)

    subsets = {}
    for arms, name in ((1, "narrow"), (2, "mid"), (3, "wide")):
        sel = np.nonzero(mb == arms - 1)[0]
        if len(sel) == 0:
            continue
        subsets[name] = dict(
            arms=arms,
            srcs=jnp.asarray(srcs_np[sel]),
            idx=jnp.asarray(idx2[sel]),
            meta=jnp.asarray(meta2[sel]),
            dls=jnp.asarray(lens[sel]).astype(jnp.int32),
            bytes=int(lens[sel].sum()),
            n=len(sel),
        )
        print(f"{name}: {len(sel)} rows, {int(lens[sel].sum())} bytes",
              flush=True)

    # exactness: routed kernels must match production bytes per subset
    for name, sub in subsets.items():
        want = np.asarray(pd._decode_flat_pallas_v2(
            sub["srcs"], sub["idx"], sub["meta"], sub["dls"], d_pad, False, 3))
        got = np.asarray(pd._decode_flat_pallas_v2(
            sub["srcs"], sub["idx"], sub["meta"], sub["dls"], d_pad, False,
            sub["arms"]))
        assert np.array_equal(want, got), f"{name} mismatch"
    print("correctness: routed == production per subset", flush=True)

    def loop(sub, arms):
        srcs, idxj, metaj, dls = (sub["srcs"], sub["idx"], sub["meta"],
                                  sub["dls"])

        @jax.jit
        def run(k):
            def body(i, acc):
                ii = jnp.roll(idxj, i, axis=0)
                dd = jnp.roll(dls, i)
                mm = jnp.roll(metaj, i, axis=0)
                dst = pd._decode_flat_pallas_v2(
                    srcs, ii, mm, dd, d_pad, False, arms)
                return acc + dst[:, ::4096].astype(jnp.int32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    runs = {}
    for name, sub in subsets.items():
        runs[f"{name}_routed"] = (loop(sub, sub["arms"]), sub["bytes"])
        if sub["arms"] != 3:
            runs[f"{name}_prod"] = (loop(sub, 3), sub["bytes"])

    out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "bytes": nbytes, "k_big": KBIG, "rounds": ROUNDS,
           "subsets": {n: {"rows": s["n"], "bytes": s["bytes"]}
                       for n, s in subsets.items()},
           "t1": {k: [] for k in runs}, "tk": {k: [] for k in runs}}
    for name, (run, _) in runs.items():
        int(run(jnp.int32(1)))
        print(f"compiled {name}", flush=True)
    for r in range(ROUNDS):
        for name, (run, _) in runs.items():
            t0 = time.perf_counter()
            int(run(jnp.int32(1)))
            out["t1"][name].append(round(time.perf_counter() - t0, 5))
            t0 = time.perf_counter()
            int(run(jnp.int32(KBIG)))
            out["tk"][name].append(round(time.perf_counter() - t0, 5))
        print(f"round {r}", flush=True)
    total_routed = total_prod = 0.0
    for name, (run, nb) in runs.items():
        per = (min(out["tk"][name]) - min(out["t1"][name])) / (KBIG - 1)
        out[name] = {"s_per_iter": round(per, 5),
                     "GBps": round(nb / per / 1e9, 4) if per > 0 else None}
        print(name, json.dumps(out[name]), flush=True)
        if name.endswith("_routed"):
            total_routed += per
        if name.endswith("_prod") or name == "wide_routed":
            total_prod += per
    out["blended_routed_GBps"] = round(nbytes / total_routed / 1e9, 4)
    out["blended_prod_GBps"] = round(nbytes / total_prod / 1e9, 4)
    print("blended routed", out["blended_routed_GBps"], "vs prod",
          out["blended_prod_GBps"], flush=True)
    with open(os.path.join(HERE, "FLAT_AB6.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
