#!/usr/bin/env python
"""Measure host copy-chain flatten throughput vs thread count.

The production flat-gather decode splits work: the host resolves copy
chains to per-byte source indices (``stpu_flatten_idx_batch``,
``native/core.cpp``), the chip runs the MXU gather. The round-3 verdict
asked for the missing number: does the host pass *scale* well enough to
feed 8 chips at the 1.25 GB/s/chip device rate, or is "1.13 GB/s/chip"
silently bounded by one host core?

This harness times the batch flattener (layout=1, the v2 kernel's
layout) over the full bench corpus batch at 1/2/4/8 threads on this
host (no JAX, no device — pure host work), reports decode-bytes/s, and
derives chips-fed-per-host at the measured per-thread slope. Writes
``FLATTEN_SCALE_r04.json``; TRAFFIC.md carries the analysis.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = [
    "html", "urls.10K", "fireworks.jpeg", "paper-100k.pdf", "html_x_4",
    "alice29.txt", "asyoulik.txt", "lcet10.txt", "plrabn12.txt",
    "geo.protodata", "kppkn.gtb",
]


def corpus_batch():
    from snappy_tpu.format.varint import read_varu64
    from snappy_tpu.native import compress
    from snappy_tpu.ops.packing import blocks_of

    blocks_list, lens_list = [], []
    for name in CORPUS:
        with open(os.path.join(REPO, "data", name), "rb") as f:
            data = f.read()
        b, l = blocks_of(data)
        blocks_list.append(b)
        lens_list.append(l)
    blocks = np.concatenate(blocks_list, axis=0)
    lens = np.concatenate(lens_list, axis=0)
    width = 81920
    srcs = np.zeros((blocks.shape[0], width), np.uint8)
    slens = np.zeros(blocks.shape[0], np.uint64)
    for i in range(blocks.shape[0]):
        c = compress(blocks[i, : lens[i]].tobytes())
        _, h = read_varu64(c)
        body = c[h:]
        srcs[i, : len(body)] = np.frombuffer(body, np.uint8)
        slens[i] = len(body)
    return srcs, slens, lens.astype(np.uint64)


def main() -> int:
    from snappy_tpu import native

    if not native.available():
        print("native runtime unavailable", file=sys.stderr)
        return 1

    srcs, slens, declens = corpus_batch()
    repeat = int(os.environ.get("FLATTEN_REPEAT", "8"))  # bench's 392-block batch
    srcs = np.ascontiguousarray(np.tile(srcs, (repeat, 1)))
    slens = np.tile(slens, repeat)
    declens = np.tile(declens, repeat)
    # d_pad must be a whole number of 16 KiB groups for layout=1; bench
    # uses 65536-wide rows for the corpus batch.
    d_pad = 65536
    decode_bytes = int(declens.sum())
    print(f"batch: {srcs.shape[0]} blocks, {decode_bytes} decode bytes",
          file=sys.stderr, flush=True)

    reps = int(os.environ.get("FLATTEN_REPS", "7"))
    results = {}
    ncpu = os.cpu_count() or 1
    for threads in (1, 2, 4, 8):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            idx, meta, fallb, errs, dt = native.flatten_idx_batch(
                srcs, slens, declens, d_pad, threads=threads, layout=1
            )
            best = min(best, time.perf_counter() - t0)
        assert not fallb.any() and not errs.any()
        gbps = decode_bytes / best / 1e9
        results[str(threads)] = {"s": round(best, 5), "GBps": round(gbps, 4)}
        print(f"threads={threads}: {best*1e3:.1f} ms, {gbps:.3f} GB/s",
              file=sys.stderr, flush=True)

    g1 = results["1"]["GBps"]
    gmax = max(v["GBps"] for v in results.values())
    # Per-core slope from the largest non-oversubscribed point.
    gphys = results[str(min(ncpu, 4))]["GBps"]
    slope = gphys / min(ncpu, 4)
    device_rate = 1.13  # GB/s/chip, BENCH_r03 flat-v2 device-resident
    target_aggregate = 10.0  # GB/s, BASELINE v5e-8 north star
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "host_cpus": ncpu,
        "batch_blocks": int(srcs.shape[0]),
        "decode_bytes": decode_bytes,
        "d_pad": d_pad,
        "layout": 1,
        "threads": results,
        "per_core_GBps": round(slope, 4),
        "scaling_1_to_4": round(gphys / g1, 3),
        "chips_fed_at_1p13": round(gmax / device_rate, 3),
        "cores_to_feed_8_chips": int(np.ceil(8 * device_rate / slope)),
        "cores_to_feed_10GBps": int(np.ceil(target_aggregate / slope)),
        "note": (
            "flatten GB/s counts decoded output bytes; chips_fed assumes "
            "the 1.13 GB/s/chip flat-v2 device rate (BENCH_r03); "
            "cores_to_* extrapolate the measured per-core slope "
            "(chunk-parallel across rows, no shared state) to a "
            "production v5e host"
        ),
    }
    with open(os.path.join(REPO, "FLATTEN_SCALE_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
