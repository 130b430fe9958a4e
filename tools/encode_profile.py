#!/usr/bin/env python
"""Phase attribution for the fast device encoder on TPU.

compress_blocks_fast measured ~0.001 GB/s device-resident on the chip
(BENCH r3) — an XLA-formulation problem, not a tunnel artifact. This
times phase-stripped variants (chained K-loop, min-of-samples) to find
where the time goes: the 2-key sort (prev-occurrence), the gather-loop
match extension, the orbit scatter/gather loop, or serialization.
Writes ENCODE_PROFILE.json.
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
    from snappy_tpu.ops.encode import MAX_OPS, S, serialize_ops
    from snappy_tpu.format.constants import MIN_NON_LITERAL_BLOCK_SIZE

    KBIG = int(os.environ.get("EP_KBIG", "5"))
    ROUNDS = int(os.environ.get("EP_ROUNDS", "5"))
    NSUB = int(os.environ.get("EP_BLOCKS", "48"))

    blocks, lens = _load_corpus_blocks(repeat=1)
    blocks, lens = blocks[:NSUB], lens[:NSUB]
    nbytes = int(lens.sum())
    blocks_d = jnp.asarray(blocks)
    lens_d = jnp.asarray(lens).astype(jnp.int32)

    def make(mode):
        def fn(bb, nn):
            bsz = bb.shape[0]
            n = nn.astype(jnp.int32)
            p = jnp.arange(S, dtype=jnp.int32)[None, :]
            u32 = ef._u32_at(bb)
            if mode == "u32":
                return u32[:, ::4096].astype(jnp.int32).sum()
            prev = ef._prev_occurrence(u32, n)
            if mode == "prev":
                return prev[:, ::4096].sum()
            length = ef._match_lengths(u32, prev, n)
            if mode == "len":
                return length[:, ::4096].sum()
            tiny = n < MIN_NON_LITERAL_BLOCK_SIZE
            length = jnp.where(tiny[:, None], 0, length)
            nxt_len = jnp.concatenate(
                [length[:, 1:], jnp.zeros((bsz, 1), length.dtype)], axis=1)
            offs = p - jnp.maximum(prev, 0)
            len_p4 = jnp.concatenate(
                [length[:, 4:], jnp.zeros((bsz, 4), length.dtype)], axis=1)
            isolated = (length == 4) & (offs > 2047) & (len_p4 < 4)
            eligible = (length >= 4) & ~isolated & ~(nxt_len > length)
            live = p < n[:, None]
            step = jnp.where(eligible, length, 1)
            nxt = jnp.where(live, jnp.minimum(p + step, S), p)
            nxt = jnp.concatenate([nxt, jnp.full((bsz, 1), S, jnp.int32)], axis=1)
            mark = ef._orbit(nxt, max(1, (S - 1).bit_length()))[:, :S] & live
            if mode == "orbit":
                return mark[:, ::4096].astype(jnp.int32).sum()
            is_copy = mark & eligible
            is_lit = mark & ~eligible
            prev_lit = jnp.concatenate(
                [jnp.zeros((bsz, 1), bool), is_lit[:, :-1]], axis=1)
            lit_start = is_lit & ~prev_lit
            copy_pos = jnp.where(is_copy, p, jnp.int32(S))
            nxt_copy = jax.lax.cummin(copy_pos[:, ::-1], axis=1)[:, ::-1]
            run_end = jnp.minimum(nxt_copy, n[:, None])
            record = is_copy | lit_start
            opnum = jnp.cumsum(record.astype(jnp.int32), axis=1) - record.astype(jnp.int32)
            nops = jnp.sum(record.astype(jnp.int32), axis=1)
            kind_v = jnp.where(is_copy, 1, 0)
            a_v = jnp.where(is_copy, p - prev, p)
            b_v = jnp.where(is_copy, length, run_end)
            tgt = jnp.where(record, jnp.minimum(opnum, MAX_OPS - 1), jnp.int32(MAX_OPS))

            def scat_ops(vals):
                buf = jnp.zeros((bsz, MAX_OPS + 1), jnp.int32)
                buf = jax.vmap(lambda bu, t, v: bu.at[t].set(v, mode="drop"))(buf, tgt, vals)
                return buf[:, :MAX_OPS]

            op_kind = scat_ops(kind_v)
            op_a = scat_ops(a_v)
            op_b = scat_ops(b_v)
            if mode == "parse":
                return op_kind[:, ::512].sum() + op_a[:, ::512].sum() + op_b[:, ::512].sum()
            out, out_len = serialize_ops(bb, op_kind, op_a, op_b, nops)
            return out_len.sum()

        return fn

    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "blocks": NSUB, "bytes": nbytes, "k_big": KBIG, "rounds": ROUNDS,
    }
    modes = os.environ.get("EP_MODES", "u32,prev,len,orbit,parse,full").split(",")
    if len(sys.argv) > 1:
        modes = sys.argv[1].split(",")
    runs = {}
    for mode in modes:
        body = make(mode)

        def k_loop(body=body):
            @jax.jit
            def run(k):
                def loop(i, acc):
                    b2 = jnp.roll(blocks_d, i, axis=0)
                    l2 = jnp.roll(lens_d, i)
                    return acc + body(b2, l2).astype(jnp.int64)
                return jax.lax.fori_loop(0, k, loop, jnp.int64(0))
            return run

        runs[mode] = k_loop()

    t1s = {m: [] for m in runs}
    tks = {m: [] for m in runs}
    for m, run in runs.items():
        t0 = time.perf_counter()
        int(run(jnp.int32(1)))
        print(f"{m}: compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    for r in range(ROUNDS):
        for m, run in runs.items():
            t0 = time.perf_counter()
            int(run(jnp.int32(1)))
            t1s[m].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            int(run(jnp.int32(KBIG)))
            tks[m].append(time.perf_counter() - t0)
        print(f"round {r} done", flush=True)
    for m in runs:
        per = (min(tks[m]) - min(t1s[m])) / (KBIG - 1)
        out[m] = {
            "s_per_iter": round(per, 4),
            "GBps": round(nbytes / per / 1e9, 4) if per > 0 else None,
        }
        print(m, json.dumps(out[m]), flush=True)

    path = os.path.join(HERE, "ENCODE_PROFILE.json")
    try:
        with open(path) as f:
            acc = json.load(f)
    except Exception:
        acc = {}
    acc.update(out)
    with open(path, "w") as f:
        json.dump(acc, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
