#!/usr/bin/env python
"""Correctness of the counts-based rank permutation vs the old sort.

Leg 1: on real parse records from corpus blocks, the counts-based
compaction (slot gather) must equal the 5-operand sort's output for
every rank < nvalid (and the tail handling must agree downstream).
Leg 2: full fused pipeline output prefix must equal the reference
emission (records_to_bytes) on every block.
Runs on CPU (interpret kernels); the on-chip speed A/B is
tools/rank_ab.py.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

os.environ["JAX_PLATFORMS"] = "cpu"  # interpret-mode legs; keep off the chip

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from snappy_tpu.ops import encode_flat as ef
    from snappy_tpu.ops.packing import blocks_of
    from snappy_tpu.ops.pallas.encode_flat import _parse_blocks_pallas

    names = [
        "html", "fireworks.jpeg", "alice29.txt", "geo.protodata",
        "kppkn.gtb", "urls.10K",
    ]
    allb, alll = [], []
    for name in names:
        data = open(os.path.join(HERE, "data", name), "rb").read()[: 4 * 65536]
        b, l = blocks_of(data)
        allb.append(b)
        alll.append(l)
    rng = np.random.default_rng(7)
    # synthetic edges: empty-ish, all-zero (max RLE), random bytes,
    # low-alphabet, and a short final block
    edge = np.zeros((5, 65536), np.uint8)
    edge[1, :] = 0
    edge[2, :] = rng.integers(0, 256, 65536)
    edge[3, :] = rng.integers(0, 4, 65536)
    edge[4, :100] = rng.integers(0, 256, 100)
    elens = np.array([65536, 65536, 65536, 65536, 100], np.int32)
    blocks = np.concatenate(allb + [edge], axis=0)
    lens = np.concatenate(alll + [elens], axis=0)
    B = blocks.shape[0]
    print(f"batch: {B} blocks", flush=True)

    bb = jnp.asarray(blocks)
    nn = jnp.asarray(lens).astype(jnp.int32)
    jw, u32s, pls = jax.jit(ef.prepass)(bb, nn)
    rec0, rec1, cnt = _parse_blocks_pallas(nn, jw, u32s, pls, True)

    f = ef._record_fields(nn, rec0, rec1, cnt)
    nr = f["nr"]
    p1 = (
        f["off"] | (f["rem"] << 16) | (f["n64"] << 23)
        | (f["peel60"] << 27) | (f["use_c1"].astype(jnp.int32) << 28)
    )
    p2 = f["lit_len"] | (f["lh"] << 17)

    # old formulation: 5-operand sort
    slot = jnp.broadcast_to(jnp.arange(nr, dtype=jnp.int32)[None, :], (B, nr))
    key = jnp.where(f["valid"], slot, jnp.int32(nr + 1))
    _, p1_s, p2_s, st_s, po_s = jax.lax.sort(
        (key, p1, p2, f["starts"], f["pos"]), dimension=1, num_keys=1
    )

    # new formulation: counts-based permutation + gathers
    slot_r, okr = ef._rank_perm(f["cnt"], nr)
    nvalid = np.asarray(jnp.sum(f["valid"].astype(jnp.int32), axis=1))
    okr_np = np.asarray(okr)
    assert (okr_np.sum(axis=1) == nvalid).all(), "nvalid mismatch"
    for name, old, new_src in (
        ("p1", p1_s, p1), ("p2", p2_s, p2),
        ("starts", st_s, f["starts"]), ("pos", po_s, f["pos"]),
    ):
        new = jnp.where(okr, jnp.take_along_axis(new_src, slot_r, axis=1), 0)
        o = np.asarray(old)
        nw = np.asarray(new)
        mask = okr_np
        bad = (o != nw) & mask
        assert not bad.any(), f"{name}: {bad.sum()} mismatches"
    print("leg 1 ok: permutation identical on all valid ranks", flush=True)

    # leg 2: fused pipeline vs reference emission
    out_ref, len_ref = ef.records_to_bytes(bb, nn, rec0, rec1, cnt)
    out_new, len_new, ovf = ef.records_to_bytes_fused(
        bb, nn, rec0, rec1, cnt, interpret=True
    )
    out_ref, len_ref = np.asarray(out_ref), np.asarray(len_ref)
    out_new, len_new = np.asarray(out_new), np.asarray(len_new)
    assert not np.asarray(ovf).any()
    assert (len_ref == len_new).all(), "out_len mismatch"
    for i in range(B):
        L = int(len_ref[i])
        assert (out_ref[i, :L] == out_new[i, :L]).all(), f"block {i} bytes"
    print(f"leg 2 ok: fused emission bit-exact on {B} blocks", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
