#!/usr/bin/env python
"""Measure device-only decode time per route via a K-iteration loop.

Every previous on-chip number (BENCH_TPU_r02, the fastpath/compose
A/Bs) is fetch-synced: it includes launch latency and host<->device
transfers, which on this tunnel are degraded by orders of magnitude
(~58 MB/s PCIe measured) and therefore can swamp the kernel itself.
This harness times ``fori_loop(K) { decode(roll(inputs, i)) }`` as one
jitted call at K=1 and K=BIG with a single compile (traced trip
count): the difference isolates pure device time per decode iteration,
with a "null" variant (roll + trivial reduce, no decode) measuring the
loop scaffolding itself for subtraction.

Routes: pallas replay (plain), pallas compose, and the XLA hybrid
(host-scan-assisted) formulation. Writes ``DEVICE_TIME.json`` — the
number that decides which route a *healthy* chip should default to
(the replay kernel is scalar-walk-bound and does not scale with HBM;
the XLA formulation is HBM-bound and does).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

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
    from snappy_tpu.ops.decode import decode_batch_hosted
    from snappy_tpu.ops.pallas.decode import _decode_batch_pallas

    KBIG = int(os.environ.get("DT_KBIG", "9"))
    out: dict = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "platform": jax.devices()[0].platform,
        "k_big": KBIG,
    }

    blocks, lens = _load_corpus_blocks(repeat=1)
    srcs_np, slens_np = _compressed_rows(blocks, lens)
    width = max(1024, -(-int(slens_np.max()) // 1024) * 1024)
    srcs_np = np.ascontiguousarray(srcs_np[:, :width])
    nbytes = int(lens.sum())
    out["blocks"] = int(blocks.shape[0])
    out["bytes"] = nbytes

    srcs = jnp.asarray(srcs_np)
    slens = jnp.asarray(slens_np)
    dls = jnp.asarray(lens).astype(jnp.int32)

    bits_np = np.zeros((srcs_np.shape[0], width // 8), np.uint8)
    native.scan_ops_batch(srcs_np, slens_np.astype(np.uint64), bits_np)
    bits = jnp.asarray(bits_np)

    def k_loop(decode_fn, with_bits: bool):
        @jax.jit
        def run(k, srcs, slens, dls, bits):
            def body(i, acc):
                s2 = jnp.roll(srcs, i, axis=0)
                l2 = jnp.roll(slens, i)
                d2 = jnp.roll(dls, i)
                if with_bits:
                    b2 = jnp.roll(bits, i, axis=0)
                    dst = decode_fn(s2, l2, d2, b2)
                else:
                    dst = decode_fn(s2, l2, d2)
                # Data dependence so iterations can't be folded away:
                # sample a few lanes of the output into the carry.
                return acc + dst[:, ::4096].astype(jnp.int32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    def measure(name, run):
        t0 = time.perf_counter()
        int(run(jnp.int32(1), srcs, slens, dls, bits))
        compile_s = time.perf_counter() - t0

        def once(k):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                int(run(jnp.int32(k), srcs, slens, dls, bits))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, tk = once(1), once(KBIG)
        per_iter = (tk - t1) / (KBIG - 1)
        out[name] = {
            "compile_s": round(compile_s, 1),
            "t1_s": round(t1, 4),
            "tk_s": round(tk, 4),
            "device_s_per_iter": round(per_iter, 4),
            "device_GBps": round(nbytes / per_iter / 1e9, 4) if per_iter > 0 else None,
        }
        print(name, json.dumps(out[name]), flush=True)

    # Loop scaffolding baseline (roll + reduce, no decode).
    measure("null", k_loop(lambda s, l, d: s[:, :1] + (l + d)[:, None].astype(jnp.uint8), False))

    # Pallas replay, plain machinery (the current TPU default).
    measure(
        "pallas_plain",
        k_loop(lambda s, l, d: _decode_batch_pallas(s, l, d, 65536, False, "plain")[0], False),
    )

    # Pallas compose-in-register.
    if os.environ.get("DT_COMPOSE", "1") == "1":
        measure(
            "pallas_compose",
            k_loop(lambda s, l, d: _decode_batch_pallas(s, l, d, 65536, False, "compose")[0], False),
        )

    # Pallas flat-gather (host flatten precomputed; one windowed MXU
    # gather per 8-row tile — no sequential device walk at all).
    if os.environ.get("DT_FLAT", "1") == "1":
        from snappy_tpu.ops.pallas.decode import _decode_flat_pallas

        t0 = time.perf_counter()
        idxr, tmeta, fallb, _herrs, _dts = native.flatten_idx_batch(
            srcs_np, slens_np.astype(np.uint64),
            np.asarray(lens, np.uint64), 65536,
        )
        flat_host_s = time.perf_counter() - t0
        assert not fallb.any()
        out["flat_host_s"] = round(flat_host_s, 4)
        out["flat_host_GBps"] = round(nbytes / flat_host_s / 1e9, 4)
        idxj = jnp.asarray(idxr)  # uint16; widened on device
        tmetaj = jnp.asarray(tmeta)

        @jax.jit
        def run_flat(k, srcs, slens, dls, bits):
            def body(i, acc):
                s2 = jnp.roll(srcs, i, axis=0)
                d2 = jnp.roll(dls, i)
                i2 = jnp.roll(idxj, i, axis=0)
                m2 = jnp.roll(tmetaj, i, axis=0)
                dst = _decode_flat_pallas(s2, i2, m2, d2, 65536, False)
                return acc + dst[:, ::4096].astype(jnp.int32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        measure("pallas_flat", run_flat)

    # Pallas flat v2 (transposed idx layout + MXU-transpose output).
    if os.environ.get("DT_FLAT2", "1") == "1":
        from snappy_tpu.ops.pallas.decode import _decode_flat_pallas_v2

        t0 = time.perf_counter()
        idxp2, tmeta2, fallb2, _h2, _d2 = native.flatten_idx_batch(
            srcs_np, slens_np.astype(np.uint64),
            np.asarray(lens, np.uint64), 65536, layout=1,
        )
        flat2_host_s = time.perf_counter() - t0
        assert not fallb2.any()
        out["flat2_host_s"] = round(flat2_host_s, 4)
        idxj2 = jnp.asarray(idxp2)
        tmetaj2 = jnp.asarray(tmeta2)

        @jax.jit
        def run_flat2(k, srcs, slens, dls, bits):
            def body(i, acc):
                s2 = jnp.roll(srcs, i, axis=0)
                d2 = jnp.roll(dls, i)
                i2 = jnp.roll(idxj2, i, axis=0)
                m2 = jnp.roll(tmetaj2, i, axis=0)
                dst = _decode_flat_pallas_v2(s2, i2, m2, d2, 65536, False)
                return acc + dst[:, ::4096].astype(jnp.int32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        measure("pallas_flat2", run_flat2)

    # XLA hybrid (host scan bits precomputed; device parse + resolve).
    if os.environ.get("DT_HYBRID", "1") == "1":
        measure(
            "xla_hybrid",
            k_loop(lambda s, l, d, b: decode_batch_hosted(s, l, d, b, 65536)[0], True),
        )

    with open(os.path.join(HERE, "DEVICE_TIME.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote DEVICE_TIME.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
