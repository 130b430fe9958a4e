"""Count literal-origin runs in the flattened idx per corpus block.

A "run" is a maximal interval where idx_abs[d+1] == idx_abs[d] + 1 —
the run-compressed representation of the flatten result. If runs ~
O(records), the host can emit runs (8 B each) instead of per-byte
indices (2-4 B/byte), and the device can materialize per-byte idx with
a step-function kernel. This decides the run-flatten design
(VERDICT r4 item 1).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from snappy_tpu import native
from tools.chain_depth_probe import corpus_blocks, CORPUS, BS


def main():
    bodies, declens, files = corpus_blocks()
    n = len(bodies)
    stride = -(-max(len(b) for b in bodies) // 128) * 128
    srcs = np.zeros((n, stride), np.uint8)
    for i, b in enumerate(bodies):
        srcs[i, : len(b)] = np.frombuffer(b, np.uint8)
    lens = np.array([len(b) for b in bodies], np.uint64)
    decl = np.array(declens, np.uint64)

    # layout 0 = output-order idx_rel; we need absolute-ish run structure.
    idx_rel, tile_meta, fallbacks, errs, dt = native.flatten_idx_batch(
        srcs, lens, decl, BS, threads=4, layout=0)
    assert int(np.asarray(errs).sum()) == 0 and int(np.asarray(fallbacks).sum()) == 0

    recs, nops, rerrs, rdt = native.scan_records_batch(srcs, lens, decl, 1 << 16, threads=4)

    run_counts = []
    copy_runs = []
    for i in range(n):
        d = int(decl[i])
        # idx_rel is window-relative per tile; reconstruct absolute via
        # tile_meta base rows (tile = 1024 bytes, base row * 128).
        idx = idx_rel[i][:d].astype(np.int64)
        tm = np.asarray(tile_meta[i]).reshape(-1, 2)
        base = (tm[:, 0].astype(np.int64) * 128).repeat(1024)[:d]
        idx = idx + base
        breaks = np.count_nonzero(idx[1:] != idx[:-1] + 1) + 1
        run_counts.append(breaks)
        copy_runs.append(breaks)
    run_counts = np.array(run_counts)

    per_file = {}
    for f in CORPUS:
        m = np.array([ff == f for ff in files])
        per_file[f] = {
            "runs_max": int(run_counts[m].max()),
            "runs_med": float(np.median(run_counts[m])),
            "ops_med": float(np.median(nops[m])),
            "runs_over_ops": float(np.median(run_counts[m] / np.maximum(nops[m], 1))),
        }
    out = {
        "n_blocks": n,
        "runs": {
            "p50": float(np.percentile(run_counts, 50)),
            "p90": float(np.percentile(run_counts, 90)),
            "max": int(run_counts.max()),
        },
        "runs_over_ops_total": float(run_counts.sum() / max(int(nops.sum()), 1)),
        "bytes_per_run_p50": float(np.percentile(
            np.array([int(d) for d in decl]) / np.maximum(run_counts, 1), 50)),
        "per_file": per_file,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
