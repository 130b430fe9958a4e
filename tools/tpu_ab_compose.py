#!/usr/bin/env python
"""A/B the compose-in-register Pallas decode kernels on real TPU.

Variants, all byte-compared against the plain self-contained kernel:
  - ``compose``: ``decode_batch_pallas(..., fastpath="compose")`` — the
    tail row rides a vector register through the op loop, dst sees one
    aligned store per completed row instead of a two-row RMW per op,
    and overlap copies resolve with one periodic gather instead of a
    period-doubling loop.
  - ``records`` / ``records_compose``: the host-validated record-replay
    route with the same two move machineries.

Writes ``BENCH_COMPOSE_AB.json``. Exits nonzero on any divergence.
AB_SIZES env (comma-separated row counts, 0 = whole corpus batch)
controls the batch sweep, default "8,0".
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
        decode_batch_pallas,
        decode_records_pallas,
    )

    dev = jax.devices()[0]
    out: dict = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "platform": dev.platform,
        "device": str(getattr(dev, "device_kind", dev)),
        "runs": [],
    }

    blocks, lens = _load_corpus_blocks(repeat=1)
    srcs_np, slens_np = _compressed_rows(blocks, lens)
    width = max(1024, -(-int(slens_np.max()) // 1024) * 1024)
    srcs_np = np.ascontiguousarray(srcs_np[:, :width])

    sizes = [
        int(x) or blocks.shape[0]
        for x in os.environ.get("AB_SIZES", "8,0").split(",")
    ]

    ok = True
    for nrows in sizes:
        srcs = jnp.asarray(srcs_np[:nrows])
        slens = jnp.asarray(slens_np[:nrows])
        dls = jnp.asarray(lens[:nrows]).astype(jnp.int32)
        nbytes = int(lens[:nrows].sum())
        row: dict = {"blocks": int(nrows), "bytes": nbytes}

        def timed(label: str, fn):
            nonlocal ok
            t0 = time.perf_counter()
            ref_out = np.asarray(fn())
            row[f"{label}_compile_s"] = round(time.perf_counter() - t0, 1)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                # Thin fetch: sync on completion without the full output
                # transfer (uniform across variants).
                np.asarray(fn()[:, :128])
                best = min(best, time.perf_counter() - t0)
            row[f"{label}_GBps"] = round(nbytes / best / 1e9, 4)
            return ref_out, best

        dst_a, t_a = timed(
            "plain", lambda: decode_batch_pallas(srcs, slens, dls, 65536, fastpath=False)[0]
        )
        dst_c, t_c = timed(
            "compose",
            lambda: decode_batch_pallas(srcs, slens, dls, 65536, fastpath="compose")[0],
        )
        same = bool(np.array_equal(dst_a, dst_c))
        row["compose_bit_identical"] = same
        row["compose_speedup"] = round(t_a / t_c, 2)
        ok &= same

        if native.available():
            rec_cap = 16384
            recs, nops, herrs, _ = native.scan_records_batch(
                srcs_np[:nrows], slens_np[:nrows].astype(np.uint64),
                lens[:nrows].astype(np.uint64), rec_cap,
            )
            assert int(herrs.max(initial=0)) == 0
            r_pad = max(512, -(-int(nops.max()) // 512) * 512)
            recs_dev = jnp.asarray(np.ascontiguousarray(recs[:, :r_pad]))
            nops_dev = jnp.asarray(nops.astype(np.int32))

            for label, comp in (("records", False), ("records_compose", True)):
                dst_r, t_r = timed(
                    label,
                    lambda comp=comp: decode_records_pallas(
                        srcs, recs_dev, nops_dev, dls, 65536,
                        interpret=False, compose=comp,
                    ),
                )
                rsame = bool(np.array_equal(dst_a, dst_r))
                row[f"{label}_bit_identical"] = rsame
                row[f"{label}_speedup"] = round(t_a / t_r, 2)
                ok &= rsame

        out["runs"].append(row)
        print(json.dumps(row), flush=True)

    out["all_bit_identical"] = ok
    with open(os.path.join(HERE, "BENCH_COMPOSE_AB.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH_COMPOSE_AB.json; ok =", ok)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
