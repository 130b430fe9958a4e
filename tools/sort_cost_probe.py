#!/usr/bin/env python
"""Device cost of the encoder pre-pass primitives vs batch size.

The round-4 device encoder budget: >= 0.3 GB/s/chip means <= 218 us
per 64 KiB block for the WHOLE pipeline. ENCODE_PROFILE.json measured
the 2-key sort at 12 ms / 32 blocks (375 us/block) — over budget on
its own if it doesn't amortize with batch. This probe times, chained
device-resident (min-of-samples):

- the 2-key sort (u32 key, position) per block at B = 8/32/64;
- the full `_prev_occurrence` (sort + same-key scatter);
- the candidate/skip-hop prepass (cummin etc.);

Writes SORT_COST_r04.json.
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

    from bench import _load_corpus_blocks
    from snappy_tpu.ops import encode_fast as ef
    from snappy_tpu.ops.encode import S

    KBIG = int(os.environ.get("SC_KBIG", "5"))
    ROUNDS = int(os.environ.get("SC_ROUNDS", "6"))

    blocks, lens = _load_corpus_blocks(repeat=2)

    def mk_sort(b):
        bb = jnp.asarray(blocks[:b])
        nn = jnp.asarray(lens[:b]).astype(jnp.int32)

        @jax.jit
        def run(k):
            def body(i, acc):
                u32 = ef._u32_at(jnp.roll(bb, i, axis=0))
                key = u32[:, :S]
                idx = jnp.broadcast_to(
                    jnp.arange(S, dtype=jnp.int32)[None, :], (b, S)
                )
                skey, sidx = jax.lax.sort((key, idx), dimension=1, num_keys=2)
                return acc + sidx[:, ::4096].sum() + skey[:, ::4096].astype(jnp.int32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    def mk_prev(b):
        bb = jnp.asarray(blocks[:b])
        nn = jnp.asarray(lens[:b]).astype(jnp.int32)

        @jax.jit
        def run(k):
            def body(i, acc):
                u32 = ef._u32_at(jnp.roll(bb, i, axis=0))
                prev = ef._prev_occurrence(u32, nn)
                return acc + prev[:, ::4096].sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    def mk_cand(b):
        bb = jnp.asarray(blocks[:b])
        nn = jnp.asarray(lens[:b]).astype(jnp.int32)

        @jax.jit
        def run(k):
            def body(i, acc):
                u32 = ef._u32_at(jnp.roll(bb, i, axis=0))
                prev = ef._prev_occurrence(u32, nn)
                p = jnp.arange(S, dtype=jnp.int32)[None, :]
                cand = (prev >= 0) & (p + 4 <= nn[:, None])
                off = jnp.where(cand, p - prev, 0)
                zc = jnp.where(cand, p, jnp.int32(S))
                nxtc = jax.lax.cummin(zc[:, ::-1], axis=1)[:, ::-1]
                return acc + off[:, ::4096].sum() + nxtc[:, ::4096].sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    runs = {}
    for b in (8, 32, 64):
        runs[f"sort_b{b}"] = (mk_sort(b), b)
        runs[f"prev_b{b}"] = (mk_prev(b), b)
    runs["cand_b64"] = (mk_cand(64), 64)

    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "k_big": KBIG, "rounds": ROUNDS,
        "t1": {k: [] for k in runs}, "tk": {k: [] for k in runs},
    }
    for name, (run, b) in runs.items():
        t0 = time.perf_counter()
        int(run(jnp.int32(1)))
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)
    for r in range(ROUNDS):
        for name, (run, b) in runs.items():
            t0 = time.perf_counter()
            int(run(jnp.int32(1)))
            out["t1"][name].append(round(time.perf_counter() - t0, 5))
            t0 = time.perf_counter()
            int(run(jnp.int32(KBIG)))
            out["tk"][name].append(round(time.perf_counter() - t0, 5))
        print(f"round {r} done", flush=True)

    results = {}
    for name, (run, b) in runs.items():
        per = (min(out["tk"][name]) - min(out["t1"][name])) / (KBIG - 1)
        results[name] = {
            "s_per_iter": round(per, 6),
            "us_per_block": round(per / b * 1e6, 2),
            "GBps_input": round(b * 65536 / per / 1e9, 4) if per > 0 else None,
        }
        print(name, json.dumps(results[name]), flush=True)
    out["results"] = results
    with open(os.path.join(HERE, "SORT_COST_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
