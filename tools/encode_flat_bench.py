#!/usr/bin/env python
"""Device-resident throughput of the flat encoder (and its stages).

Chained K-loop methodology (min-of-samples, interleaved rounds) at
B=64 on the corpus batch. Stages: prepass / parse kernel / emission /
full pipeline. Writes ENCODE_FLAT_BENCH.json.
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
    from snappy_tpu.ops import encode_flat as ef
    from snappy_tpu.ops.pallas.encode_flat import _parse_blocks_pallas

    KBIG = int(os.environ.get("EB_KBIG", "5"))
    ROUNDS = int(os.environ.get("EB_ROUNDS", "6"))
    B = int(os.environ.get("EB_B", "64"))

    blocks_np, lens_np = _load_corpus_blocks(repeat=2)
    blocks_np, lens_np = blocks_np[:B], lens_np[:B]
    bb = jnp.asarray(blocks_np)
    nn = jnp.asarray(lens_np).astype(jnp.int32)
    nbytes = int(lens_np.sum())

    # fixed kernel inputs for the stage runs
    jw0, u32s0, pl0 = jax.jit(ef.prepass)(bb, nn)
    r0, r1, c0 = _parse_blocks_pallas(nn, jw0, u32s0, pl0, False)

    @jax.jit
    def run_prepass(k):
        def body(i, acc):
            jw, u32s, pls = ef.prepass(jnp.roll(bb, i, axis=0), nn)
            return acc + jw[:, ::64, ::256].sum() + u32s[:, ::64, ::256].sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def run_parse(k):
        def body(i, acc):
            rec0, rec1, cnt = _parse_blocks_pallas(
                nn, jnp.roll(jw0, i, axis=0), jnp.roll(u32s0, i, axis=0),
                jnp.roll(pl0, i, axis=0), False
            )
            return acc + cnt[:, :, 0].sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def run_emit(k):
        def body(i, acc):
            out, olen = ef.records_to_bytes(
                bb, nn, jnp.roll(r0, i, axis=0), jnp.roll(r1, i, axis=0),
                jnp.roll(c0, i, axis=0)
            )
            return acc + out[:, ::4096].astype(jnp.int32).sum() + olen.sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def run_full(k):
        def body(i, acc):
            out, olen, ovf = ef._compress_blocks_flat(
                jnp.roll(bb, i, axis=0), nn, False
            )
            return acc + out[:, ::4096].astype(jnp.int32).sum() + olen.sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def run_emit_fast(k):
        def body(i, acc):
            out, olen, ovf = ef.records_to_bytes_fast(
                bb, nn, jnp.roll(r0, i, axis=0), jnp.roll(r1, i, axis=0),
                jnp.roll(c0, i, axis=0), interpret=False
            )
            return acc + out[:, ::4096].astype(jnp.int32).sum() + olen.sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def run_full_fast(k):
        def body(i, acc):
            out, olen, ovf = ef._compress_blocks_flat_split(
                jnp.roll(bb, i, axis=0), nn, False
            )
            return acc + out[:, ::4096].astype(jnp.int32).sum() + olen.sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def run_full_fused(k):
        def body(i, acc):
            out, olen, ovf = ef._compress_blocks_flat_fused(
                jnp.roll(bb, i, axis=0), nn, False
            )
            return acc + out[:, ::4096].astype(jnp.int32).sum() + olen.sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def run_emit_fused(k):
        def body(i, acc):
            out, olen, ovf = ef.records_to_bytes_fused(
                bb, nn, jnp.roll(r0, i, axis=0), jnp.roll(r1, i, axis=0),
                jnp.roll(c0, i, axis=0), interpret=False
            )
            return acc + out[:, ::4096].astype(jnp.int32).sum() + olen.sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    runs = {"prepass": run_prepass, "parse": run_parse, "emit": run_emit,
            "emit_fast": run_emit_fast, "full": run_full,
            "full_fast": run_full_fast}
    if os.environ.get("EB_FAST_ONLY"):
        runs = {"prepass": run_prepass, "parse": run_parse,
                "emit_fast": run_emit_fast, "full_fast": run_full_fast}
    if os.environ.get("EB_FUSED"):
        runs = {"prepass": run_prepass, "parse": run_parse,
                "emit_fast": run_emit_fast, "emit_fused": run_emit_fused,
                "full_fast": run_full_fast, "full_fused": run_full_fused}
    out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "B": B, "bytes": nbytes,
           "t1": {k: [] for k in runs}, "tk": {k: [] for k in runs}}
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
        print(f"round {r}", flush=True)
    res = {}
    for name in runs:
        per = (min(out["tk"][name]) - min(out["t1"][name])) / (KBIG - 1)
        res[name] = {"s_per_iter": round(per, 6),
                     "us_per_block": round(per / B * 1e6, 2),
                     "GBps_input": round(nbytes / per / 1e9, 4) if per > 0 else None}
        print(name, json.dumps(res[name]), flush=True)
    out["results"] = res
    with open(os.path.join(HERE, "ENCODE_FLAT_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0




def substages() -> int:
    """EB_SUB=1: fast-emission sub-stage attribution."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _load_corpus_blocks
    from snappy_tpu.ops import encode_flat as ef
    from snappy_tpu.ops.pallas.encode_flat import (
        _parse_blocks_pallas, emit_bytes_pallas, shift_idx_pallas,
        OUT_ROWS_PAD,
    )

    KBIG, ROUNDS, B = 5, 6, 64
    blocks_np, lens_np = _load_corpus_blocks(repeat=2)
    blocks_np, lens_np = blocks_np[:B], lens_np[:B]
    bb = jnp.asarray(blocks_np)
    nn = jnp.asarray(lens_np).astype(jnp.int32)
    nbytes = int(lens_np.sum())
    jw0, u32s0, pl0 = jax.jit(ef.prepass)(bb, nn)
    r0, r1, c0 = _parse_blocks_pallas(nn, jw0, u32s0, pl0, False)

    @jax.jit
    def plan(rec0, rec1, cnt):
        f = ef._record_fields(nn, rec0, rec1, cnt)
        plane = ef._hdr_plane(f)
        bp, dlt, lo_row, base, rows_g, ovf = ef._breakpoints(f)
        return (plane, bp.reshape(B, ef.NBP_PAD // 128, 128),
                dlt.reshape(B, ef.NBP_PAD // 128, 128), lo_row, base,
                rows_g, f["out_len"])

    plane0, bpr0, dlr0, lo0, base0, rows0, olen0 = plan(r0, r1, c0)
    idx0 = shift_idx_pallas(lo0, base0, rows0, olen0, bpr0, dlr0,
                            interpret=False)

    @jax.jit
    def run_plan(k):
        def body(i, acc):
            plane, bpr, dlr, lo, base, rows, olen = plan(
                jnp.roll(r0, i, axis=0), jnp.roll(r1, i, axis=0),
                jnp.roll(c0, i, axis=0))
            return acc + bpr[:, ::64, ::64].sum() + lo[:, ::16].sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def run_shift(k):
        def body(i, acc):
            idx = shift_idx_pallas(
                jnp.roll(lo0, i, axis=0), jnp.roll(base0, i, axis=0),
                jnp.roll(rows0, i, axis=0), jnp.roll(olen0, i),
                jnp.roll(bpr0, i, axis=0), jnp.roll(dlr0, i, axis=0),
                interpret=False)
            return acc + idx[:, ::64, ::64].sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def run_meta_gather(k):
        def body(i, acc):
            idx = jnp.roll(idx0, i, axis=0)
            rowa = idx >> 7
            d_pos = jnp.arange(OUT_ROWS_PAD * 128, dtype=jnp.int32).reshape(
                1, OUT_ROWS_PAD, 128)
            live = d_pos < olen0[:, None, None]
            hrow = jnp.where((idx >= 65536) & live, rowa, jnp.int32(1 << 20))
            hmin = jnp.min(hrow.reshape(B, OUT_ROWS_PAD // 8, 8 * 128), axis=2)
            stack_rows = 512 + plane0.shape[1]
            hbase = jnp.clip((hmin >> 3) << 3, 512, stack_rows - 256) >> 3
            stack = jnp.concatenate(
                [bb.reshape(B, 512, 128).astype(jnp.bfloat16), plane0], axis=1)
            idx_perm = ef._v2_permute(
                idx.reshape(B, OUT_ROWS_PAD * 128), OUT_ROWS_PAD * 128
            ).reshape(B, OUT_ROWS_PAD, 128)
            out = emit_bytes_pallas(hbase, olen0, stack, idx_perm,
                                    interpret=False)
            return acc + out[:, ::4096].astype(jnp.int32).sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    import json, time
    runs = {"plan": run_plan, "shift": run_shift, "meta+gather": run_meta_gather}
    t1 = {k: [] for k in runs}
    tk = {k: [] for k in runs}
    for name, run in runs.items():
        t0 = time.perf_counter()
        int(run(jnp.int32(1)))
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)
    for r in range(ROUNDS):
        for name, run in runs.items():
            t0 = time.perf_counter()
            int(run(jnp.int32(1)))
            t1[name].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            int(run(jnp.int32(KBIG)))
            tk[name].append(time.perf_counter() - t0)
        print(f"round {r}", flush=True)
    res = {}
    for name in runs:
        per = (min(tk[name]) - min(t1[name])) / (KBIG - 1)
        res[name] = {"us_per_block": round(per / B * 1e6, 2)}
        print(name, json.dumps(res[name]), flush=True)
    with open(os.path.join(HERE, "ENCODE_FLAT_SUB.json"), "w") as f:
        json.dump(res, f, indent=1)
    return 0


if __name__ == "__main__":
    if os.environ.get("EB_SUB"):
        sys.exit(substages())
    sys.exit(main())
