#!/usr/bin/env python
"""A/B the Pallas decode single-window fast path on real TPU hardware.

The fast path (``decode_batch_pallas(..., fastpath=True)``, env knob
``SNAPPY_TPU_PALLAS_FASTPATH``) short-circuits ops that fit one
128-byte window through a loop-free move. It is byte-exact on the full
interpret suite; this harness supplies the missing hardware evidence:
both variants are compiled on the real chip, byte-compared on a corpus
batch, and timed at three batch sizes. Run by ``tools/tpu_watch.sh``
when the chip is healthy, or by hand.

Writes ``BENCH_FASTPATH_AB.json``. Exits nonzero on any divergence.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, HERE)
    from bench import _compressed_rows, _load_corpus_blocks
    from snappy_tpu.ops.pallas.decode import decode_batch_pallas

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

    # AB_SIZES: comma-separated batch sizes (0 = the whole corpus batch).
    sizes = [
        int(x) or blocks.shape[0]
        for x in os.environ.get("AB_SIZES", "8,64,0").split(",")
    ]

    ok = True
    for nrows in sizes:
        srcs = jnp.asarray(srcs_np[:nrows])
        slens = jnp.asarray(slens_np[:nrows])
        dls = jnp.asarray(lens[:nrows]).astype(jnp.int32)
        nbytes = int(lens[:nrows].sum())

        def run(fp: bool):
            dst, errs = decode_batch_pallas(srcs, slens, dls, 65536, fastpath=fp)
            return np.asarray(dst), np.asarray(errs)

        t0 = time.perf_counter()
        dst_a, err_a = run(False)
        base_compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        dst_b, err_b = run(True)
        fast_compile_s = time.perf_counter() - t0

        same = bool(np.array_equal(dst_a, dst_b) and np.array_equal(err_a, err_b))
        ok &= same and int(err_a.max(initial=0)) == 0

        def tmin(fp: bool, iters: int = 3) -> float:
            best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                np.asarray(
                    decode_batch_pallas(srcs, slens, dls, 65536, fastpath=fp)[1]
                )
                best = min(best, time.perf_counter() - t0)
            return best

        ta, tb = tmin(False), tmin(True)
        row = {
            "blocks": int(nrows),
            "bytes": nbytes,
            "bit_identical": same,
            "base_GBps": round(nbytes / ta / 1e9, 4),
            "fastpath_GBps": round(nbytes / tb / 1e9, 4),
            "speedup": round(ta / tb, 2),
            "base_compile_s": round(base_compile_s, 1),
            "fastpath_compile_s": round(fast_compile_s, 1),
        }

        # Record-replay route (SNAPPY_TPU_PALLAS_RECORDS): host scan +
        # record transfer + replay kernel, timed end to end.
        try:
            from snappy_tpu import native
            from snappy_tpu.ops.pallas.decode import decode_records_pallas

            srcs_h = srcs_np[:nrows]
            rec_cap = 16384
            recs, nops, herrs, _ = native.scan_records_batch(
                srcs_h, slens_np[:nrows].astype(np.uint64),
                lens[:nrows].astype(np.uint64), rec_cap,
            )
            assert int(herrs.max(initial=0)) == 0
            r_pad = max(512, -(-int(nops.max()) // 512) * 512)

            def run_records():
                recs2, nops2, _, _ = native.scan_records_batch(
                    srcs_h, slens_np[:nrows].astype(np.uint64),
                    lens[:nrows].astype(np.uint64), rec_cap,
                )
                return decode_records_pallas(
                    srcs,
                    jnp.asarray(np.ascontiguousarray(recs2[:, :r_pad])),
                    jnp.asarray(nops2.astype(np.int32)),
                    dls,
                    65536,
                    interpret=False,
                )

            t0 = time.perf_counter()
            dst_r = np.asarray(run_records())
            row["records_compile_s"] = round(time.perf_counter() - t0, 1)
            rsame = bool(np.array_equal(dst_a, dst_r))
            row["records_bit_identical"] = rsame
            ok &= rsame
            tr = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                # Thin fetch: sync on completion without paying the full
                # output transfer the other variants don't pay either.
                np.asarray(run_records()[:, :128])
                tr = min(tr, time.perf_counter() - t0)
            row["records_GBps"] = round(nbytes / tr / 1e9, 4)
            row["records_speedup_vs_base"] = round(ta / tr, 2)
        except Exception as e:
            row["records_error"] = repr(e)

        out["runs"].append(row)
        print(json.dumps(row), flush=True)

    out["verdict"] = "identical" if ok else "DIVERGENCE"
    with open(os.path.join(HERE, "BENCH_FASTPATH_AB.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"verdict": out["verdict"]}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
