#!/usr/bin/env python
"""Device cost of the encode-flat building blocks (round-4 encoder).

Measures, chained device-resident at B=64 on the real chip:

- prev2sort: exact prev-occurrence via two 2-key sorts (the scatter-free
  replacement for `_prev_occurrence`, whose XLA scatter measured 400
  us/block in SORT_COST_r04.json);
- prepass_full: prev2sort + candidate set + chain estimate + skip hops
  + the (SEG,128) lane transposes — everything the parse kernel needs;
- serialize: the existing vectorized serialize_ops on realistic op
  records (the emission-path incumbent);
- serialize_scatter/gather legs isolated (cover-scatter vs the
  take_along_axis block) to locate its cost.

Writes ENCODE_FLAT_PROBE.json.
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

SEG = 512


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _load_corpus_blocks
    from snappy_tpu.ops import encode_fast as ef
    from snappy_tpu.ops.encode import MAX_OPS, S, serialize_ops

    KBIG = int(os.environ.get("EF_KBIG", "5"))
    ROUNDS = int(os.environ.get("EF_ROUNDS", "6"))
    B = 64

    blocks_np, lens_np = _load_corpus_blocks(repeat=2)
    blocks_np, lens_np = blocks_np[:B], lens_np[:B]
    bb = jnp.asarray(blocks_np)
    nn = jnp.asarray(lens_np).astype(jnp.int32)

    def prev2sort(u32, n):
        bsz = u32.shape[0]
        p = jnp.arange(S, dtype=jnp.int32)[None, :]
        valid = p <= (n[:, None] - 4)
        key = jnp.where(valid, u32[:, :S], np.uint32(0xFFFFFFFF))
        idx = jnp.broadcast_to(p, (bsz, S)).astype(jnp.int32)
        skey, sidx = jax.lax.sort((key, idx), dimension=1, num_keys=2)
        same = jnp.concatenate(
            [jnp.zeros((bsz, 1), bool), skey[:, 1:] == skey[:, :-1]], axis=1
        )
        cand = jnp.concatenate(
            [jnp.full((bsz, 1), -1, jnp.int32), sidx[:, :-1]], axis=1
        )
        cand = jnp.where(same, cand, -1)
        # inverse permutation via second sort: key = sidx, payload = cand
        _, prev = jax.lax.sort((sidx, cand), dimension=1, num_keys=1)
        return jnp.where(valid, prev, -1)

    @jax.jit
    def run_prev(k):
        def body(i, acc):
            u32 = ef._u32_at(jnp.roll(bb, i, axis=0))
            prev = prev2sort(u32, nn)
            return acc + prev[:, ::4096].sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def run_prepass(k):
        def body(i, acc):
            blocks = jnp.roll(bb, i, axis=0)
            u32 = ef._u32_at(blocks)
            prev = prev2sort(u32, nn)
            p = jnp.arange(S, dtype=jnp.int32)[None, :]
            bsz = prev.shape[0]
            cand = (prev >= 0) & (p + 4 <= nn[:, None]) & (nn[:, None] >= 16)
            off = jnp.where(cand, p - prev, 0)
            nxt_prev = jnp.concatenate(
                [prev[:, 1:], jnp.full((bsz, 1), -1, jnp.int32)], axis=1
            )
            c = cand & (nxt_prev == prev + 1)
            c = c & jnp.concatenate([cand[:, 1:], jnp.zeros((bsz, 1), bool)], axis=1)
            z = jnp.where(c, jnp.int32(S), p)
            nxt0 = jax.lax.cummin(z[:, ::-1], axis=1)[:, ::-1]
            Lhat = jnp.where(cand, 4 + (nxt0 - p), 0)
            Lhat = jnp.minimum(Lhat, jnp.maximum(nn[:, None] - p, 0))
            Lp4 = jnp.concatenate([Lhat[:, 4:], jnp.zeros((bsz, 4), jnp.int32)], axis=1)
            iso = (Lhat == 4) & (off > 2047) & (Lp4 < 4)
            cand = cand & ~iso
            off = jnp.where(cand, off, 0)
            Lhat = jnp.where(cand, Lhat, 0)
            zc = jnp.where(cand, p, jnp.int32(S))
            nxtc = jax.lax.cummin(zc[:, ::-1], axis=1)[:, ::-1]
            # lane transposes for the kernel: (B, S) -> (B, SEG, 128)
            def tr(x):
                return x.reshape(bsz, 128, SEG).transpose(0, 2, 1)

            ct = tr(jnp.where(cand, 1, 0))
            ot = tr(off)
            lt = tr(Lhat)
            st = tr(nxtc)
            return (
                acc + ct[:, ::256, ::32].sum() + ot[:, ::256, ::32].sum()
                + lt[:, ::256, ::32].sum() + st[:, ::256, ::32].sum()
            )

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    # Realistic op records for serialize: take them from the existing
    # fast-profile parse on the host (cheap, once).
    of, ol = ef.compress_blocks_fast(bb, nn)  # warm path not timed
    # Build records via the NumPy proto walk would be slow; approximate
    # with synthetic records at corpus-like density: one op per ~7 bytes.
    rng = np.random.default_rng(5)
    nops_np = np.full(B, 9000, np.int32)
    kind_np = (rng.random((B, MAX_OPS)) < 0.55).astype(np.int32)
    # literal (a=start, b=end) / copy (a=off, b=len) with plausible values
    pos = np.minimum(np.cumsum(rng.integers(4, 11, (B, MAX_OPS)), axis=1), S - 64)
    a_np = np.where(kind_np == 1, rng.integers(1, 60000, (B, MAX_OPS)), pos)
    b_np = np.where(kind_np == 1, rng.integers(4, 40, (B, MAX_OPS)), pos + rng.integers(1, 30, (B, MAX_OPS)))
    a_np = np.minimum(a_np, np.maximum(pos, 1))
    kj = jnp.asarray(kind_np)
    aj = jnp.asarray(a_np)
    bj = jnp.asarray(b_np)
    nj = jnp.asarray(nops_np)

    @jax.jit
    def run_serialize(k):
        def body(i, acc):
            out, olen = serialize_ops(
                jnp.roll(bb, i, axis=0), kj, aj, bj, nj
            )
            return acc + out[:, ::4096].astype(jnp.int32).sum() + olen.sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    runs = {
        "prev2sort_b64": run_prev,
        "prepass_full_b64": run_prepass,
        "serialize_b64": run_serialize,
    }
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "k_big": KBIG, "rounds": ROUNDS, "B": B,
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
    for name, run in runs.items():
        per = (min(out["tk"][name]) - min(out["t1"][name])) / (KBIG - 1)
        results[name] = {
            "s_per_iter": round(per, 6),
            "us_per_block": round(per / B * 1e6, 2),
            "GBps_input": round(B * 65536 / per / 1e9, 4) if per > 0 else None,
        }
        print(name, json.dumps(results[name]), flush=True)
    out["results"] = results
    with open(os.path.join(HERE, "ENCODE_FLAT_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
