#!/usr/bin/env python
"""Validate device kernels on real TPU hardware; record an artifact.

Runs (each in a bounded try): the canary matmul, the Pallas CRC32C
kernel vs the host oracle, a Pallas decode lowering attempt, and a small
XLA decode batch vs the oracle. Writes ``BENCH_TPU_VALIDATE.json`` at
the repo root — the artifact PARITY.md points at for "verified on TPU
hardware" claims. Timings force host fetches (block_until_ready does
not reliably wait through this environment's tunnel).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(HERE, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    out: dict = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    dev = jax.devices()[0]
    out["platform"] = dev.platform
    out["device"] = str(dev)

    # Canary.
    try:
        x = jnp.ones((2048, 2048), jnp.bfloat16)
        mm = jax.jit(lambda a: jnp.sum((a @ a).astype(jnp.float32)))
        float(mm(x))
        t0 = time.perf_counter()
        float(mm(x))
        out["canary_tflops"] = round(2 * 2048**3 / (time.perf_counter() - t0) / 1e12, 2)
    except Exception:
        out["canary_error"] = traceback.format_exc(limit=2)

    # Pallas CRC32C on hardware vs host oracle.
    try:
        from snappy_tpu.format.crc32c import crc32c
        from snappy_tpu.ops.pallas.crc32c import crc32c_blocks_pallas

        rng = np.random.default_rng(5)
        b, s = 32, 65536
        rows = rng.integers(0, 256, (b, s), dtype=np.uint8)
        lens = rng.integers(1, s + 1, b).astype(np.int32)
        pos = np.arange(s)[None, :]
        rows = np.where(pos < lens[:, None], rows, 0).astype(np.uint8)
        t0 = time.perf_counter()
        got = np.asarray(crc32c_blocks_pallas(jnp.asarray(rows), jnp.asarray(lens)))
        compile_s = time.perf_counter() - t0
        want = np.array(
            [crc32c(rows[i, : lens[i]].tobytes()) for i in range(b)], np.uint32
        )
        out["pallas_crc32c"] = {
            "lowered": True,
            "correct": bool(np.array_equal(got, want)),
            "first_call_s": round(compile_s, 1),
        }
        t0 = time.perf_counter()
        got = np.asarray(crc32c_blocks_pallas(jnp.asarray(rows), jnp.asarray(lens)))
        t = time.perf_counter() - t0
        out["pallas_crc32c"]["GBps"] = round(int(lens.sum()) / t / 1e9, 4)
    except Exception:
        out["pallas_crc32c"] = {"lowered": False, "error": traceback.format_exc(limit=2)}

    # Pallas decode lowering attempt (interpret=False).
    try:
        from snappy_tpu.format import reference as ref
        from snappy_tpu.format.varint import read_varu64
        from snappy_tpu.ops.pallas.decode import decode_batch_pallas

        data = open(os.path.join(HERE, "data", "html"), "rb").read()[:4096]
        c = ref.compress(data)
        _, h = read_varu64(c)
        body = c[h:]
        s_pad = -(-len(body) // 128) * 128
        srcs = np.zeros((2, s_pad), np.uint8)
        srcs[0, : len(body)] = np.frombuffer(body, np.uint8)
        srcs[1, : len(body)] = np.frombuffer(body, np.uint8)
        slens = np.full(2, len(body), np.int32)
        declens = np.full(2, len(data), np.int32)
        t0 = time.perf_counter()
        dst, errs = decode_batch_pallas(
            jnp.asarray(srcs), jnp.asarray(slens), jnp.asarray(declens),
            4096, interpret=False,
        )
        dst = np.asarray(dst)
        out["pallas_decode"] = {
            "lowered": True,
            "correct": bool(
                dst[0, : len(data)].tobytes() == data
                and int(np.asarray(errs).max()) == 0
            ),
            "first_call_s": round(time.perf_counter() - t0, 1),
        }
    except Exception:
        out["pallas_decode"] = {"lowered": False, "error": traceback.format_exc(limit=2)}

    # Pallas decode fast-path variant (gated: SNAPPY_TPU_PALLAS_FASTPATH).
    try:
        t0 = time.perf_counter()
        dstf, errsf = decode_batch_pallas(
            jnp.asarray(srcs), jnp.asarray(slens), jnp.asarray(declens),
            4096, interpret=False, fastpath=True,
        )
        dstf = np.asarray(dstf)
        out["pallas_decode_fastpath"] = {
            "lowered": True,
            "correct": bool(
                dstf[0, : len(data)].tobytes() == data
                and int(np.asarray(errsf).max()) == 0
            ),
            "first_call_s": round(time.perf_counter() - t0, 1),
        }
    except Exception:
        out["pallas_decode_fastpath"] = {
            "lowered": False, "error": traceback.format_exc(limit=2),
        }

    # Record-replay decode (gated: SNAPPY_TPU_PALLAS_RECORDS).
    try:
        from snappy_tpu import native
        from snappy_tpu.ops.pallas.decode import decode_records_pallas

        recs, nops, herrs, _ = native.scan_records_batch(
            srcs, np.full(2, len(body), np.uint64),
            np.full(2, len(data), np.uint64), 2048,
        )
        r_pad = max(512, -(-int(nops.max()) // 512) * 512)
        t0 = time.perf_counter()
        dstr = np.asarray(
            decode_records_pallas(
                jnp.asarray(srcs),
                jnp.asarray(np.ascontiguousarray(recs[:, :r_pad])),
                jnp.asarray(nops.astype(np.int32)),
                jnp.asarray(declens),
                4096,
                interpret=False,
            )
        )
        out["pallas_decode_records"] = {
            "lowered": True,
            "correct": bool(
                dstr[0, : len(data)].tobytes() == data
                and int(herrs.max()) == 0
            ),
            "first_call_s": round(time.perf_counter() - t0, 1),
        }
    except Exception:
        out["pallas_decode_records"] = {
            "lowered": False, "error": traceback.format_exc(limit=2),
        }

    # Flat-gather v2 (the production TPU route): full corpus file,
    # C++ layout=1 flatten + kernel byte-exactness on hardware.
    try:
        from snappy_tpu import native
        from snappy_tpu.format import reference as ref
        from snappy_tpu.format.varint import read_varu64
        from snappy_tpu.ops.pallas.decode import decode_flat_pallas_v2

        data2 = open(os.path.join(HERE, "data", "html"), "rb").read()[:65536]
        c2 = ref.compress(data2)
        _, h2 = read_varu64(c2)
        body2 = c2[h2:]
        w2 = -(-len(body2) // 1024) * 1024
        srcs2 = np.zeros((2, w2), np.uint8)
        srcs2[0, : len(body2)] = np.frombuffer(body2, np.uint8)
        srcs2[1, : len(body2)] = np.frombuffer(body2, np.uint8)
        idxp, tmeta, fallb, herrs2, _dt = native.flatten_idx_batch(
            srcs2, np.full(2, len(body2), np.uint64),
            np.full(2, len(data2), np.uint64), 65536, layout=1,
        )
        t0 = time.perf_counter()
        dstv = np.asarray(
            decode_flat_pallas_v2(
                jnp.asarray(srcs2), jnp.asarray(idxp), jnp.asarray(tmeta),
                jnp.asarray(np.full(2, len(data2), np.int32)), 65536,
                interpret=False,
            )
        )
        out["pallas_decode_flat_v2"] = {
            "lowered": True,
            "correct": bool(
                dstv[0, : len(data2)].tobytes() == data2
                and not fallb.any()
                and int(herrs2.max(initial=0)) == 0
            ),
            "first_call_s": round(time.perf_counter() - t0, 1),
        }
    except Exception:
        out["pallas_decode_flat_v2"] = {
            "lowered": False, "error": traceback.format_exc(limit=2),
        }

    # Pallas encode lowering attempt (interpret=False).
    try:
        from snappy_tpu.format import reference as ref
        from snappy_tpu.format.varint import read_varu64
        from snappy_tpu.ops.pallas.encode import compress_blocks_pallas

        rows = np.zeros((2, 4096), np.uint8)
        payload = open(os.path.join(HERE, "data", "html"), "rb").read()[:3000]
        rows[0, : len(payload)] = np.frombuffer(payload, np.uint8)
        rows[1, : len(payload)] = np.frombuffer(payload, np.uint8)
        lens2 = np.full(2, len(payload), np.int32)
        t0 = time.perf_counter()
        eout, elen = compress_blocks_pallas(
            jnp.asarray(rows), jnp.asarray(lens2), interpret=False
        )
        eout = np.asarray(eout)
        want = ref.compress(payload)
        _, hh = read_varu64(want)
        out["pallas_encode"] = {
            "lowered": True,
            "correct": bool(eout[0, : int(np.asarray(elen)[0])].tobytes() == want[hh:]),
            "first_call_s": round(time.perf_counter() - t0, 1),
        }
    except Exception:
        out["pallas_encode"] = {"lowered": False, "error": traceback.format_exc(limit=2)}

    # XLA decode, small batch.
    try:
        from snappy_tpu.ops.decode import decode_batch

        t0 = time.perf_counter()
        dst, errs, _ = decode_batch(
            jnp.asarray(srcs), jnp.asarray(slens), jnp.asarray(declens), 4096
        )
        dst = np.asarray(dst)
        out["xla_decode_small"] = {
            "correct": bool(
                dst[0, : len(data)].tobytes() == data
                and int(np.asarray(errs).max()) == 0
            ),
            "first_call_s": round(time.perf_counter() - t0, 1),
        }
    except Exception:
        out["xla_decode_small"] = {"error": traceback.format_exc(limit=2)}

    path = os.path.join(HERE, "BENCH_TPU_VALIDATE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
