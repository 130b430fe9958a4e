#!/usr/bin/env python
"""Characterize the TPU platform: compute/HBM rates vs tunnel latency.

Every fetch-synced measurement on this development tunnel mixes three
very different quantities: device compute rate, host<->device transfer
rate, and the tunnel's per-call round-trip latency. This probe
separates them with chained-iteration timing (K kernel applications
inside one jit, one fetch) and writes ``TPU_HEALTH.json``:

- ``matmul_tflops``: bf16 MXU rate from a K-chained 4096 matmul.
- ``hbm_gbps``: vector-pass rate from a K-chained elementwise op.
- ``roundtrip_ms``: a null dispatch+fetch (the latency floor every
  single-shot measurement pays).
- ``h2d_gbps`` / ``d2h_gbps``: 64 MB transfer each way.

Round-2 context: BENCH_r02 recorded "canary 0.34 TFLOPs / HBM 11.5
GB/s" and concluded the platform was degraded. This probe shows the
chip itself is healthy (~80 TFLOPs, ~1 TB/s) and the "degradation" is
the tunnel: ~30 ms round-trip latency and ~0.01-0.02 GB/s D2H. Any
honest throughput number on this environment must therefore be
device-rate (chained) with transfers reported separately; on real v5e
hosts PCIe is ~32 GB/s and the distinction disappears.
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

    out: dict = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    dev = jax.devices()[0]
    out["platform"] = dev.platform
    out["device"] = str(dev)
    K = int(os.environ.get("PROBE_K", "32"))
    out["k"] = K

    # Null round-trip: dispatch + fetch of a scalar.
    h = jax.jit(lambda a: a + 1)
    z = jnp.zeros((), jnp.int32)
    int(h(z))
    t0 = time.perf_counter()
    for _ in range(10):
        int(h(z))
    out["roundtrip_ms"] = round((time.perf_counter() - t0) / 10 * 1000, 1)

    # Chained matmul: MXU rate with latency amortized over K.
    x = jnp.ones((4096, 4096), jnp.bfloat16)

    def chain_mm(a):
        for _ in range(K):
            a = (a @ a) * 1e-9
        return jnp.sum(a.astype(jnp.float32))

    mm = jax.jit(chain_mm)
    float(mm(x))
    t0 = time.perf_counter()
    float(mm(x))
    dt = time.perf_counter() - t0
    out["matmul_tflops"] = round(K * 2 * 4096**3 / dt / 1e12, 1)

    # Chained elementwise pass over 512 MiB: HBM rate.
    y = jnp.ones((1 << 27,), jnp.float32)

    def chain_ew(a):
        for _ in range(K):
            a = a * 1.0000001
        return a[0]

    ew = jax.jit(chain_ew)
    float(ew(y))
    t0 = time.perf_counter()
    float(ew(y))
    dt = time.perf_counter() - t0
    out["hbm_gbps"] = round(K * 2 * (1 << 29) / dt / 1e9, 0)

    # Transfers (64 MB each way).
    buf = np.random.randint(0, 255, (64 << 20,), np.uint8)
    jax.device_put(buf[:1024]).block_until_ready()
    t0 = time.perf_counter()
    j = jax.device_put(buf)
    j.block_until_ready()
    out["h2d_gbps"] = round(64 / 1024 / (time.perf_counter() - t0), 2)
    t0 = time.perf_counter()
    np.asarray(j)
    out["d2h_gbps"] = round(64 / 1024 / (time.perf_counter() - t0), 3)

    path = os.path.join(HERE, "TPU_HEALTH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
