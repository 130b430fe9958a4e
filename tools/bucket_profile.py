#!/usr/bin/env python
"""Attribute the decode16 vs full-corpus device-rate split per file.

BENCH_r03 measured 1.41 GB/s on the 16-block first-signal batch vs
1.13 GB/s on the full 392-block corpus batch — a 24% swing the verdict
asked us to explain. FLAT_BATCH_SCALE.json already showed flat-v2 is
batch-size-invariant (~56 us/block from 49 blocks up), leaving content
mix as the hypothesis: the first 16 corpus blocks are mostly
urls/html/jpeg, while the full corpus is dominated by plain text.

This harness measures the v2 kernel's device rate per corpus file —
every file's blocks tiled to the same 16-row batch shape so ONE
compiled executable serves all groups (no per-group compile variance)
— plus the bench's actual first-16 batch and the 392-block batch.
Interleaved rounds, min-of-samples for t1 and tk separately (the chip
is time-shared; see R3_NOTES.md §1). Writes BUCKET_PROFILE_r04.json.
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

CORPUS = [
    "html", "urls.10K", "fireworks.jpeg", "paper-100k.pdf", "html_x_4",
    "alice29.txt", "asyoulik.txt", "lcet10.txt", "plrabn12.txt",
    "geo.protodata", "kppkn.gtb",
]


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _compressed_rows, _load_corpus_blocks
    from snappy_tpu import native
    from snappy_tpu.ops.packing import blocks_of
    from snappy_tpu.ops.pallas.decode import _decode_flat_pallas_v2

    KBIG = int(os.environ.get("BP_KBIG", "9"))
    ROUNDS = int(os.environ.get("BP_ROUNDS", "8"))
    d_pad = 65536
    width = 81920  # bench's corpus row width

    def prep(blocks, lens):
        srcs, slens = _compressed_rows(blocks, lens, width)
        idx, meta, fallb, errs, _dt = native.flatten_idx_batch(
            srcs, slens.astype(np.uint64), np.asarray(lens, np.uint64),
            d_pad, layout=1,
        )
        assert not fallb.any() and not errs.any()
        return srcs, idx, meta, np.asarray(lens, np.int32)

    groups = {}
    per_file_meta = {}
    for name in CORPUS:
        with open(os.path.join(HERE, "data", name), "rb") as f:
            data = f.read()
        b, l = blocks_of(data)
        # Tile to exactly 16 rows so every file group shares one
        # compiled executable (b=16).
        reps = -(-16 // b.shape[0])
        b16 = np.tile(b, (reps, 1))[:16]
        l16 = np.tile(l, reps)[:16]
        groups[name] = prep(b16, l16)
        per_file_meta[name] = {
            "natural_blocks": int(b.shape[0]),
            "bytes16": int(l16.sum()),
        }

    blocks, lens = _load_corpus_blocks(repeat=1)
    groups["first16"] = prep(blocks[:16], lens[:16])
    per_file_meta["first16"] = {"bytes16": int(lens[:16].sum())}
    blocks8, lens8 = _load_corpus_blocks(repeat=8)
    groups["full392"] = prep(blocks8, lens8)
    per_file_meta["full392"] = {"bytes16": int(lens8.sum())}

    def loop(srcs_np, idx_np, meta_np, lens_np):
        srcs = jnp.asarray(srcs_np)
        idxj = jnp.asarray(idx_np)
        metaj = jnp.asarray(meta_np)
        dls = jnp.asarray(lens_np)

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

    runs = {name: loop(*g) for name, g in groups.items()}
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "k_big": KBIG, "rounds": ROUNDS, "d_pad": d_pad, "width": width,
        "t1": {k: [] for k in runs}, "tk": {k: [] for k in runs},
    }
    for name, run in runs.items():
        t0 = time.perf_counter()
        int(run(jnp.int32(1)))
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

    for r in range(ROUNDS):
        for name, run in runs.items():
            t0 = time.perf_counter()
            int(run(jnp.int32(1)))
            out["t1"][name].append(round(time.perf_counter() - t0, 5))
            t0 = time.perf_counter()
            int(run(jnp.int32(KBIG)))
            out["tk"][name].append(round(time.perf_counter() - t0, 5))
        print(f"round {r} done", flush=True)

    results = {}
    for name in runs:
        per = (min(out["tk"][name]) - min(out["t1"][name])) / (KBIG - 1)
        nbytes = per_file_meta[name]["bytes16"]
        nblocks = groups[name][0].shape[0]
        results[name] = {
            **per_file_meta[name],
            "s_per_iter": round(per, 6),
            "us_per_block": round(per / nblocks * 1e6, 2) if per > 0 else None,
            "GBps": round(nbytes / per / 1e9, 4) if per > 0 else None,
        }
        print(name, json.dumps(results[name]), flush=True)
    out["results"] = results

    with open(os.path.join(HERE, "BUCKET_PROFILE_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
