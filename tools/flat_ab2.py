#!/usr/bin/env python
"""Regression isolation: old v2 kernel (cc1e7b6) vs current variants.

The current v2 (4 buckets, 16-aligned bases, window-dtype options)
measures ~2x slower than the committed v2 did in its own runs. This
harness loads the OLD kernel from git (/tmp/old_decode_v2.py, prepared
by the caller), feeds it layout=0 meta + the python permute (its
original input contract), and interleaves it with the current variants
— one process, many rounds, min-of-samples for t1 and tk separately
(spike-resistant). Writes FLAT_AB2.json.
"""

from __future__ import annotations

import importlib.util
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
        _decode_flat_pallas_v2,
        flat_v2_permute,
    )

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    variants = {}
    for name, path in (
        ("u16", "/tmp/v2_u16.py"),
    ):
        try:
            variants[name] = load(name, path)
        except Exception as e:
            print(f"variant {name} unavailable: {e}", flush=True)

    KBIG = int(os.environ.get("AB_KBIG", "9"))
    ROUNDS = int(os.environ.get("AB_ROUNDS", "8"))

    blocks, lens = _load_corpus_blocks(repeat=1)
    srcs_np, slens_np = _compressed_rows(blocks, lens)
    width = max(1024, -(-int(slens_np.max()) // 1024) * 1024)
    srcs_np = np.ascontiguousarray(srcs_np[:, :width])
    nbytes = int(lens.sum())
    d_pad = 65536

    # Old kernel inputs: layout=0 meta (3 buckets, 8-aligned bases) +
    # python permute — its original contract at commit time.
    idx0, meta0, f0, _e0, _d0 = native.flatten_idx_batch(
        srcs_np, slens_np.astype(np.uint64), np.asarray(lens, np.uint64),
        d_pad, layout=0,
    )
    idx0p = flat_v2_permute(idx0, d_pad)
    # Current kernel inputs: layout=1 (4 buckets, 16-aligned bases).
    idx2, meta2, f2, _e2, _d2 = native.flatten_idx_batch(
        srcs_np, slens_np.astype(np.uint64), np.asarray(lens, np.uint64),
        d_pad, layout=1,
    )
    assert not f0.any() and not f2.any()

    srcs = jnp.asarray(srcs_np)
    dls = jnp.asarray(lens).astype(jnp.int32)

    def loop(decode_fn, idxj, metaj):
        @jax.jit
        def run(k):
            def body(i, acc):
                ii = jnp.roll(idxj, i, axis=0)
                dd = jnp.roll(dls, i)
                dst = decode_fn(srcs, ii, metaj, dd, d_pad, False)
                return acc + dst[:, ::4096].astype(jnp.int32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    # w64 meta: recompute 4-bucket assignments + rebased indices on the
    # host (numpy) from the 3-bucket layout=1 outputs.
    s_rows = width // 128
    B = srcs_np.shape[0]
    g = d_pad // 16384
    # unpermute idx2 -> output order
    rel = idx2.reshape(B, g, 128, 16, 8).transpose(0, 1, 3, 4, 2).reshape(B, d_pad).astype(np.int64)
    bases3 = meta2[:, :, 0].astype(np.int64)
    n_tiles = d_pad // 1024
    abs_idx = rel.reshape(B, n_tiles, 1024) + (bases3 * 128)[:, :, None]
    mn = abs_idx.min(axis=2)
    mx = abs_idx.max(axis=2)
    meta4 = np.zeros_like(meta2)
    rel4 = np.zeros((B, n_tiles, 1024), np.int64)
    for wi, w in enumerate((64, 128, 256, 512)):
        wcap = min(w, s_rows)
        base_w = np.clip(mn // 128, 0, max(s_rows - wcap, 0)) & ~7
        fit = (mx - base_w * 128) < w * 128
        todo = (meta4[:, :, 1] == 0) & (rel4.max(axis=2) == 0) if wi else np.ones_like(fit)
        # assign the first fitting width
        newly = fit & todo if wi else fit
        if wi == 0:
            assigned = fit
            meta4[:, :, 0] = np.where(fit, base_w, 0)
            meta4[:, :, 1] = np.where(fit, 0, -1)
        else:
            take = (meta4[:, :, 1] == -1) & fit
            meta4[:, :, 0] = np.where(take, base_w, meta4[:, :, 0])
            meta4[:, :, 1] = np.where(take, wi, meta4[:, :, 1])
    assert (meta4[:, :, 1] >= 0).all()
    rel4 = abs_idx - (meta4[:, :, 0].astype(np.int64) * 128)[:, :, None]
    assert rel4.min() >= 0 and rel4.max() < 65536
    idx4 = rel4.reshape(B, g, 16, 8, 128).transpose(0, 1, 4, 2, 3).reshape(B, d_pad).astype(np.uint16)
    import collections
    print('w64 bucket histogram:', dict(collections.Counter(meta4[:, :, 1].ravel().tolist())), flush=True)

    runs = {
        "prod_v2": loop(
            _decode_flat_pallas_v2, jnp.asarray(idx2), jnp.asarray(meta2)
        ),
    }
    # br2: buckets {mid, wide} -> remap 0,1->0 and 2->1; bases must be
    # recomputed for the wider windows. Recompute meta + rebased idx on
    # the host from abs indices (mn/mx computed above).
    for name, mod in variants.items():
        runs[name] = loop(
            mod._decode_flat_pallas_v2, jnp.asarray(idx2), jnp.asarray(meta2)
        )
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "bytes": nbytes, "k_big": KBIG, "rounds": ROUNDS,
        "t1": {k: [] for k in runs}, "tk": {k: [] for k in runs},
    }
    for run in runs.values():
        int(run(jnp.int32(1)))  # compile

    for r in range(ROUNDS):
        for name, run in runs.items():
            t0 = time.perf_counter()
            int(run(jnp.int32(1)))
            out["t1"][name].append(round(time.perf_counter() - t0, 5))
            t0 = time.perf_counter()
            int(run(jnp.int32(KBIG)))
            out["tk"][name].append(round(time.perf_counter() - t0, 5))
        print(f"round {r} done", flush=True)

    for name in runs:
        per = (min(out["tk"][name]) - min(out["t1"][name])) / (KBIG - 1)
        out[name] = {
            "min_t1": min(out["t1"][name]),
            "min_tk": min(out["tk"][name]),
            "s_per_iter": round(per, 5),
            "GBps": round(nbytes / per / 1e9, 4) if per > 0 else None,
        }
        print(name, json.dumps(out[name]), flush=True)

    with open(os.path.join(HERE, "FLAT_AB2.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
