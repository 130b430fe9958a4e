#!/usr/bin/env python
"""Batch-size scaling of the flat-v2 decode kernel on the chip.

BENCH r3 measured the 16-block batch at 1.79 GB/s vs 1.08 for the
392-block batch — if smaller launches are genuinely faster per byte,
DECODE_ROWS_PER_LAUNCH should shrink. One process, interleaved rounds,
min-of-samples. Writes FLAT_BATCH_SCALE.json.
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
    from snappy_tpu.ops.pallas.decode import _decode_flat_pallas_v2

    KBIG = int(os.environ.get("BS_KBIG", "9"))
    ROUNDS = int(os.environ.get("BS_ROUNDS", "6"))

    blocks, lens = _load_corpus_blocks(repeat=8)
    srcs_np, slens_np = _compressed_rows(blocks, lens)
    width = max(1024, -(-int(slens_np.max()) // 1024) * 1024)
    srcs_np = np.ascontiguousarray(srcs_np[:, :width])
    d_pad = 65536

    idxp, tmeta, fallb, _e, _d = native.flatten_idx_batch(
        srcs_np, slens_np.astype(np.uint64), np.asarray(lens, np.uint64),
        d_pad, layout=1,
    )
    assert not fallb.any()

    sizes = [int(x) for x in os.environ.get("BS_SIZES", "16,49,98,196,392").split(",")]
    runs = {}
    meta_bytes = {}
    for bsz in sizes:
        srcs = jnp.asarray(srcs_np[:bsz])
        dls = jnp.asarray(lens[:bsz]).astype(jnp.int32)
        idxj = jnp.asarray(idxp[:bsz])
        metaj = jnp.asarray(tmeta[:bsz])
        meta_bytes[bsz] = int(lens[:bsz].sum())

        def loop(srcs=srcs, dls=dls, idxj=idxj, metaj=metaj):
            @jax.jit
            def run(k):
                def body(i, acc):
                    ii = jnp.roll(idxj, i, axis=0)
                    dd = jnp.roll(dls, i)
                    dst = _decode_flat_pallas_v2(srcs, ii, metaj, dd, d_pad, False)
                    return acc + dst[:, ::4096].astype(jnp.int32).sum()

                return jax.lax.fori_loop(0, k, body, jnp.int32(0))

            return run

        runs[bsz] = loop()

    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "k_big": KBIG, "rounds": ROUNDS,
        "t1": {b: [] for b in sizes}, "tk": {b: [] for b in sizes},
    }
    for run in runs.values():
        int(run(jnp.int32(1)))
    for r in range(ROUNDS):
        for b, run in runs.items():
            t0 = time.perf_counter()
            int(run(jnp.int32(1)))
            out["t1"][b].append(round(time.perf_counter() - t0, 5))
            t0 = time.perf_counter()
            int(run(jnp.int32(KBIG)))
            out["tk"][b].append(round(time.perf_counter() - t0, 5))
        print(f"round {r} done", flush=True)
    for b in sizes:
        per = (min(out["tk"][b]) - min(out["t1"][b])) / (KBIG - 1)
        out[str(b)] = {
            "s_per_iter": round(per, 5),
            "GBps": round(meta_bytes[b] / per / 1e9, 4) if per > 0 else None,
            "us_per_block": round(per / b * 1e6, 1) if per > 0 else None,
        }
        print(b, json.dumps(out[str(b)]), flush=True)
    out["t1"] = {str(k): v for k, v in out["t1"].items()}
    out["tk"] = {str(k): v for k, v in out["tk"].items()}
    with open(os.path.join(HERE, "FLAT_BATCH_SCALE.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
