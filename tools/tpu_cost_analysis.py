#!/usr/bin/env python
"""AOT-compile the device kernels on the TPU backend; dump XLA's own
cost analysis (flops, bytes accessed) per compiled executable.

Compile-only: produces TPU-lowering evidence (what the *TPU* executable
moves, not the CPU twin `tools/traffic_model.py` measures) even when the
tunnel device is too degraded to time executions. Results stream into
``TPU_COST.json`` after every kernel so a hung compile costs one entry.

Run standalone (owns the TPU slot — stop other TPU processes first):
    timeout 1800 python tools/tpu_cost_analysis.py
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402

CORPUS = [
    "html", "urls.10K", "fireworks.jpeg", "paper-100k.pdf", "html_x_4",
    "alice29.txt", "asyoulik.txt", "lcet10.txt", "plrabn12.txt",
    "geo.protodata", "kppkn.gtb",
]
OUT = os.path.join(HERE, "TPU_COST.json")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from snappy_tpu import native
    from snappy_tpu.format.varint import read_varu64
    from snappy_tpu.ops import packing
    from snappy_tpu.ops.crc32c import crc32c_masked_blocks
    from snappy_tpu.ops.decode import decode_batch, decode_batch_hosted
    from snappy_tpu.ops.encode_fast import compress_blocks_fast

    platform = jax.devices()[0].platform
    blocks, bodies, declens = [], [], []
    for name in CORPUS:
        with open(os.path.join(HERE, "data", name), "rb") as f:
            data = f.read()
        for i in range(0, len(data), 65536):
            blk = data[i : i + 65536]
            blocks.append(blk)
            comp = native.compress(blk)
            _, h = read_varu64(comp)
            bodies.append(comp[h:])
            declens.append(len(blk))
    in_bytes = sum(declens)
    width = packing.pad_to_bucket(max(len(b) for b in bodies))
    srcs, lens = packing.batch_streams(bodies, width)
    decl = np.asarray(declens, np.int32)
    bits = np.zeros((len(bodies), width // 8), np.uint8)
    native.scan_ops_batch(srcs, lens.astype(np.uint64), bits)
    rows, row_lens = packing.batch_streams(blocks, 65536)

    results = {
        "platform": platform,
        "batch_blocks": len(bodies),
        "uncompressed_bytes": in_bytes,
        "src_width": width,
    }

    def record(name, fn, args, static=None):
        t0 = time.time()
        try:
            j = jax.jit(fn, static_argnames=tuple(static or ()))
            kw = dict(static or {})
            comp = j.lower(*args, **kw).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            entry = {
                "compile_s": round(time.time() - t0, 1),
                "flops": float(ca.get("flops", 0.0)),
                "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
                "bytes_per_input_byte": round(
                    float(ca.get("bytes accessed", 0.0)) / in_bytes, 1
                ),
            }
            try:
                ma = comp.memory_analysis()
                entry["temp_bytes"] = int(getattr(ma, "temp_size_in_bytes", 0))
            except Exception:
                pass
        except Exception as e:  # noqa: BLE001 - record and continue
            entry = {"error": f"{type(e).__name__}: {e}"[:300],
                     "compile_s": round(time.time() - t0, 1)}
        results[name] = entry
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps({name: entry}), flush=True)

    a = (jnp.asarray(srcs), jnp.asarray(lens), jnp.asarray(decl))
    record("decode_hybrid", decode_batch_hosted, a + (jnp.asarray(bits),),
           {"d_pad": 65536})
    record("decode_pure", decode_batch, a, {"d_pad": 65536})
    record("crc32c", crc32c_masked_blocks,
           (jnp.asarray(rows), jnp.asarray(np.asarray(row_lens, np.int32))))
    record("encode_fast", compress_blocks_fast,
           (jnp.asarray(rows), jnp.asarray(np.asarray(row_lens, np.int32))))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
