"""Measure (a) host scan_records throughput and (b) copy-chain depth
distribution per 64 KiB block on the corpus — the two quantities that
decide whether device-side chain resolution from op records is viable
(VERDICT r4 item 1).

Chain depth of an output byte = number of copy hops to reach its literal
origin (reference resolves this sequentially in the copy loop,
/root/reference/src/decompress.rs:232-343). A device pointer-doubling
resolver needs ceil(log2(depth_max)) gather rounds per block.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from snappy_tpu import native
from snappy_tpu.format import reference as ref

DATA = Path(__file__).resolve().parents[1] / "data"
CORPUS = [
    "html", "urls.10K", "fireworks.jpeg", "paper-100k.pdf", "html_x_4",
    "alice29.txt", "asyoulik.txt", "lcet10.txt", "plrabn12.txt",
    "geo.protodata", "kppkn.gtb",
]
BS = 1 << 16


def corpus_blocks():
    """Per-64KiB-block compressed bodies (no varint preamble) + declens."""
    bodies, declens, files = [], [], []
    for name in CORPUS:
        raw = (DATA / name).read_bytes()
        for i in range(0, len(raw), BS):
            blk = raw[i : i + BS]
            comp = native.compress(blk)
            # strip varint preamble
            p = 0
            while comp[p] & 0x80:
                p += 1
            bodies.append(comp[p + 1 :])
            declens.append(len(blk))
            files.append(name)
    return bodies, declens, files


def depth_stats(recs, nops, declen):
    dep = np.zeros(declen + 64, np.int32)
    d = 0
    rec_depth_max = 0
    for k in range(nops):
        w0 = int(recs[k, 0]); w1 = int(recs[k, 1])
        if w0 & (1 << 30):
            ln = w0 & ((1 << 30) - 1)
            dep[d : d + ln] = 0
            d += ln
        else:
            ln = w0; off = w1
            if off >= ln:
                dep[d : d + ln] = dep[d - off : d - off + ln] + 1
            else:
                # overlapping: fill period-by-period
                j = 0
                while j < ln:
                    m = min(off, ln - j)
                    dep[d + j : d + j + m] = dep[d + j - off : d + j - off + m] + 1
                    j += m
            rec_depth_max = max(rec_depth_max, int(dep[d : d + ln].max()))
            d += ln
    return int(dep[:d].max()) if d else 0


def main():
    bodies, declens, files = corpus_blocks()
    n = len(bodies)
    stride = -(-max(len(b) for b in bodies) // 128) * 128
    srcs = np.zeros((n, stride), np.uint8)
    for i, b in enumerate(bodies):
        srcs[i, : len(b)] = np.frombuffer(b, np.uint8)
    lens = np.array([len(b) for b in bodies], np.uint64)
    decl = np.array(declens, np.uint64)

    # --- scan_records throughput (the proposed host-side cost) ---
    # First pass with a generous cap to learn the real op counts, then
    # re-time with a cap sized to the workload (the wrapper zero-allocs
    # (n, cap, 2) int32 per call — cap dominates wrapper overhead).
    recs, nops, errs, dt = native.scan_records_batch(srcs, lens, decl, 1 << 16, threads=1)
    assert int(errs.sum()) == 0
    rec_cap = 1 << max(int(nops.max()) - 1, 1).bit_length()
    print(f"max ops/block = {int(nops.max())}, timing cap = {rec_cap}")
    for threads in (1, 4):
        t = []
        for _ in range(10):
            t0 = time.perf_counter()
            native.scan_records_batch(srcs, lens, decl, rec_cap, threads=threads)
            t.append(time.perf_counter() - t0)
        tb = min(t)
        out_bytes = int(decl.sum())
        print(f"scan_records threads={threads}: {tb*1e3:.1f} ms, "
              f"{out_bytes/tb/1e9:.2f} GB/s (decoded), {tb/n*1e6:.1f} us/block")

    # --- flatten throughput for comparison ---
    t = []
    for _ in range(3):
        t0 = time.perf_counter()
        native.flatten_idx_batch(srcs, lens, decl, BS, threads=1, layout=1)
        t.append(time.perf_counter() - t0)
    print(f"flatten threads=1: {min(t)*1e3:.1f} ms, {int(decl.sum())/min(t)/1e9:.2f} GB/s, {min(t)/n*1e6:.1f} us/block")

    # --- chain depth per block ---
    depths = []
    ops_per_block = []
    t0 = time.perf_counter()
    for i in range(n):
        dm = depth_stats(recs[i], int(nops[i]), int(decl[i]))
        depths.append(dm)
        ops_per_block.append(int(nops[i]))
    depths = np.array(depths)
    ops_per_block = np.array(ops_per_block)
    rounds = np.ceil(np.log2(np.maximum(depths, 1) + 1)).astype(int)
    per_file = {}
    for f in CORPUS:
        m = np.array([ff == f for ff in files])
        per_file[f] = {
            "blocks": int(m.sum()),
            "depth_max": int(depths[m].max()),
            "depth_med": float(np.median(depths[m])),
            "rounds_max": int(rounds[m].max()),
            "ops_max": int(ops_per_block[m].max()),
            "ops_med": float(np.median(ops_per_block[m])),
        }
    out = {
        "n_blocks": n,
        "depth_hist_max_per_block": {
            "p50": float(np.percentile(depths, 50)),
            "p90": float(np.percentile(depths, 90)),
            "p99": float(np.percentile(depths, 99)),
            "max": int(depths.max()),
        },
        "doubling_rounds": {
            "p50": float(np.percentile(rounds, 50)),
            "p90": float(np.percentile(rounds, 90)),
            "max": int(rounds.max()),
        },
        "ops_per_block": {
            "p50": float(np.percentile(ops_per_block, 50)),
            "max": int(ops_per_block.max()),
        },
        "per_file": per_file,
    }
    print(json.dumps(out, indent=1))
    Path(__file__).resolve().parents[1].joinpath("CHAIN_DEPTH_r05.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
