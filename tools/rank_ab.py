#!/usr/bin/env python
"""On-chip A/B: counts-based rank permutation vs the 5-operand sort.

Times the emission PLAN (record fields -> plan tensors) and the FULL
fused pipeline under both compaction formulations, chained-K
methodology at B=64 on the corpus batch. Writes RANK_AB.json.
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

    KBIG = int(os.environ.get("RA_KBIG", "5"))
    ROUNDS = int(os.environ.get("RA_ROUNDS", "6"))
    B = int(os.environ.get("RA_B", "64"))

    blocks_np, lens_np = _load_corpus_blocks(repeat=2)
    blocks_np, lens_np = blocks_np[:B], lens_np[:B]
    bb = jnp.asarray(blocks_np)
    nn = jnp.asarray(lens_np).astype(jnp.int32)
    nbytes = int(lens_np.sum())

    jw0, u32s0, pl0 = jax.jit(ef.prepass)(bb, nn)
    r0, r1, c0 = _parse_blocks_pallas(nn, jw0, u32s0, pl0, False)

    def hdr_plane_sort(f):
        """Old formulation: 5-operand rank-compaction sort."""
        bsz = f["valid"].shape[0]
        nr = f["nr"]
        v = f["valid"]
        slot = jnp.broadcast_to(
            jnp.arange(nr, dtype=jnp.int32)[None, :], (bsz, nr)
        )
        key = jnp.where(v, slot, jnp.int32(nr + 1))
        p1 = (
            f["off"] | (f["rem"] << 16) | (f["n64"] << 23)
            | (f["peel60"] << 27) | (f["use_c1"].astype(jnp.int32) << 28)
        )
        p2 = f["lit_len"] | (f["lh"] << 17)
        _, p1s, p2s, starts_r, pos_r = jax.lax.sort(
            (key, p1, p2, f["starts"], f["pos"]), dimension=1, num_keys=1
        )
        f["rank_starts"] = starts_r
        f["rank_pos"] = pos_r
        f["rank_litlen"] = p2s & 0x1FFFF
        f["rank_lh"] = p2s >> 17
        return ef._hdr_plane_tail(f, p1s, p2s)

    # Split today's _hdr_plane so the tool can share the cell math: if
    # the helper does not exist, fall back to calling the production
    # function twice with monkeypatched internals.
    have_tail = hasattr(ef, "_hdr_plane_tail")

    new_hdr = ef._hdr_plane

    def make_full(hdr_fn):
        def full(blocks, lengths, k):
            def body(i, acc):
                n = lengths.astype(jnp.int32)
                jw, u32seg, planes = ef.prepass(
                    jnp.roll(blocks, i, axis=0), n)
                rec0, rec1, cnt = _parse_blocks_pallas(
                    n, jw, u32seg, planes, False)
                out, out_len, ovf = ef.records_to_bytes_fused(
                    jnp.roll(blocks, i, axis=0), n, rec0, rec1, cnt,
                    interpret=False)
                return acc + out[:, ::4096].astype(jnp.int32).sum() + \
                    out_len.sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return full

    def make_plan(hdr_fn):
        def plan(blocks, lengths, k):
            def body(i, acc):
                f = ef._record_fields(
                    lengths.astype(jnp.int32), jnp.roll(r0, i, axis=0),
                    jnp.roll(r1, i, axis=0), jnp.roll(c0, i, axis=0))
                plane = hdr_fn(f)
                bp, dlt, lo_row, base, rows_g, ovf = ef._breakpoints(f)
                return (acc + plane[:, ::64, ::64].astype(jnp.int32).sum()
                        + bp[:, ::512].sum() + base[:, ::16].sum())

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return plan

    variants = {}
    if have_tail:
        variants["plan_sort"] = make_plan(hdr_plane_sort)
    variants["plan_counts"] = make_plan(new_hdr)

    # full pipeline: counts version is what the module now ships; the
    # sort version needs _hdr_plane monkeypatched during trace
    res = {}
    timings_t1 = {}
    timings_tk = {}

    def measure(name, fn, *args):
        jf = jax.jit(lambda *a: fn(*a))
        t1s, tks = [], []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            jf(*args, 1).block_until_ready()
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jf(*args, 1 + KBIG).block_until_ready()
            tks.append(time.perf_counter() - t0)
        t1 = min(t1s)
        tk = min(tks)
        s = max(tk - t1, 1e-9) / KBIG
        res[name] = {
            "s_per_iter": round(s, 6),
            "us_per_block": round(s / B * 1e6, 2),
            "GBps_input": round(nbytes / s / 1e9, 4),
        }
        timings_t1[name] = [round(x, 5) for x in t1s]
        timings_tk[name] = [round(x, 5) for x in tks]
        print(name, res[name], flush=True)

    for name, fn in variants.items():
        measure(name, fn, bb, nn)

    # full pipeline A/B
    measure("full_counts", make_full(new_hdr), bb, nn)
    if have_tail:
        ef._hdr_plane = hdr_plane_sort
        try:
            measure("full_sort", make_full(hdr_plane_sort), bb, nn)
        finally:
            ef._hdr_plane = new_hdr

    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "B": B, "bytes": nbytes, "k_big": KBIG, "rounds": ROUNDS,
        "t1": timings_t1, "tk": timings_tk, "results": res,
    }
    with open(os.path.join(HERE, "RANK_AB.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote RANK_AB.json", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
