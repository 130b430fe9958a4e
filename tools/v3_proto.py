#!/usr/bin/env python
"""Prototype: bucket-partitioned flat-gather decode (v3).

br1/br2 experiments (FLAT_AB2.json) show the per-tile bucket switch
dominates the v2 kernel: a zero-control-flow kernel at w=512 runs at
108 TFLOPs effective vs 52 with the 3-way switch. v3 removes the
switch: the host orders tiles by bucket (16-slot groups, dummy-padded),
and the kernel runs three switch-free loops — each with a STATIC
window width — staging output tiles through an int32 scratch with
dynamic 8-row stores (u8 stores would need 32-row alignment).

This prototype builds the slot layout in numpy from the layout=1
flattener outputs, byte-checks against the corpus, and A/Bs against
the production v2 kernel. Writes V3_PROTO.json.
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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SCATTER_IN_KERNEL = os.environ.get('V3_SCATTER', '1') == '1'


def build_slots(idx2, meta2, d_pad, n_tiles):
    """Per-block bucket-partitioned slot layout from layout=1 outputs.

    Returns (idx_slots (B, n_slots*1024) uint16 in transposed-block
    order, smeta (B, 6 + 2*n_slots) int32, n_slots). smeta per block:
    [goff0, goff1, goff2, gcnt0, gcnt1, gcnt2, slot_base..., slot_t...]
    with goff in groups, slot_t = n_tiles for dummy slots.
    """
    B = meta2.shape[0]
    g16 = 16
    n_slots = n_tiles + 3 * (g16 - 1) // 1 + 3  # upper bound; tighten below
    # exact max padding: each bucket pads to a multiple of 16 -> up to
    # 15 dummies per bucket.
    n_slots = n_tiles + 45
    n_slots = -(-n_slots // g16) * g16
    rel = idx2.reshape(B, d_pad // 16384, 128, 16, 8).transpose(
        0, 1, 3, 4, 2
    ).reshape(B, n_tiles, 1024).astype(np.int64)  # output order per tile
    idx_slots = np.zeros((B, n_slots, 1024), np.uint16)
    smeta = np.zeros((B, 6 + 2 * n_slots), np.int32)
    for b in range(B):
        order = []
        counts = []
        for bk in (0, 1, 2):
            tiles = np.nonzero(meta2[b, :, 1] == bk)[0].tolist()
            pad = (-len(tiles)) % g16
            order += [(t, False) for t in tiles] + [(0, True)] * pad
            counts.append((len(tiles) + pad) // g16)
        goff = [0, counts[0], counts[0] + counts[1]]
        smeta[b, 0:3] = goff
        smeta[b, 3:6] = counts
        for j, (t, dummy) in enumerate(order):
            smeta[b, 6 + j] = 0 if dummy else int(meta2[b, t, 0])
            smeta[b, 6 + n_slots + j] = n_tiles if dummy else int(t)
            if not dummy:
                idx_slots[b, j] = rel[b, t]
    # transposed block layout over slots
    gs = n_slots // g16
    phys = idx_slots.reshape(B, gs, g16, 8, 128).transpose(
        0, 1, 4, 2, 3
    ).reshape(B, n_slots * 1024)
    return np.ascontiguousarray(phys), smeta, n_slots


def make_v3(s_rows, d_rows, n_slots, n_tiles):
    w_narrow = min(128, -(-s_rows // 128) * 128)
    w_mid = min(256, max(-(-s_rows // 128) * 128, 128))
    w_mid = 256 if s_rows > 128 else w_narrow
    w_wide = 512 if s_rows > 256 else w_mid
    # match production bucket widths (r128-capped)
    def r128(x):
        return -(-x // 128) * 128
    w_narrow = r128(min(128, s_rows))
    w_mid = r128(min(256, s_rows))
    w_wide = r128(min(512, s_rows))
    s_scr = max(s_rows, w_wide)
    stage_rows = d_rows + 8  # + trash zone for dummy slots

    def kernel(smeta_ref, declen_ref, src_ref, idx_ref, dst_ref, srcw_ref,
               oh_n_ref, oh_m_ref, oh_w_ref, sel_ref, outt_ref, dstw_ref):
        i = pl.program_id(0)
        declen = declen_ref[i]
        srcw_ref[pl.ds(0, s_rows), :] = src_ref[0].astype(jnp.int32)
        if s_scr > s_rows:
            srcw_ref[pl.ds(s_rows, s_scr - s_rows), :] = jnp.zeros(
                (s_scr - s_rows, LANES), jnp.int32)

        mbase = i * (6 + 2 * n_slots)

        def fiota(shape, dim):
            return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
                jnp.float32)

        def ind(a, b):
            return jnp.maximum(jnp.float32(1) - jnp.abs(a - b), jnp.float32(0))

        lane2f = fiota((128, LANES), 1)
        ident = ind(fiota((128, 128), 0), fiota((128, 128), 1)).astype(
            jnp.bfloat16)

        def tile_into(blk, tt, base, w, oh_ref):
            for s in range(8):
                col = blk[:, tt * 8 + s : tt * 8 + s + 1].astype(jnp.float32)
                row_em = jnp.floor(col * (1.0 / LANES))
                lane_em = col - row_em * LANES
                oh_ref[pl.ds(s * 128, 128), :] = ind(
                    fiota((128, w), 1), row_em).astype(jnp.bfloat16)
                sel_ref[pl.ds(s * 128, 128), :] = ind(lane2f, lane_em)
            win = srcw_ref[pl.ds(base, w), :]
            routed = jax.lax.dot_general(
                oh_ref[:], win.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            vals = jnp.sum(routed * sel_ref[:], axis=1, keepdims=True)
            for s in range(8):
                outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = vals[
                    s * 128 : (s + 1) * 128, :]

        def bucket_loop(bk, w, oh_ref):
            goff = smeta_ref[mbase + bk]
            gcnt = smeta_ref[mbase + 3 + bk]

            def group(g, acc):
                g_abs = goff + g
                blk = idx_ref[0, pl.ds(g_abs * 128, 128), :]
                for tt in range(16):
                    j = g_abs * 16 + tt
                    base = smeta_ref[mbase + 6 + j]
                    tile_into(blk, tt, base, w, oh_ref)
                t_out = jax.lax.dot_general(
                    outt_ref[:].astype(jnp.bfloat16), ident,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
                if SCATTER_IN_KERNEL:
                    for k in range(16):
                        j = g_abs * 16 + k
                        t_orig = smeta_ref[mbase + 6 + n_slots + j]
                        dstw_ref[pl.ds(t_orig * 8, 8), :] = t_out[
                            k * 8 : (k + 1) * 8, :]
                else:
                    dst_ref[0, pl.ds(g_abs * 128, 128), :] = t_out.astype(
                        jnp.uint8)
                return acc

            jax.lax.fori_loop(0, gcnt, group, jnp.int32(0))

        bucket_loop(0, w_narrow, oh_n_ref)
        bucket_loop(1, w_mid, oh_m_ref)
        bucket_loop(2, w_wide, oh_w_ref)

        if SCATTER_IN_KERNEL:
            pos = (
                jax.lax.broadcasted_iota(jnp.int32, (d_rows, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (d_rows, LANES), 1)
            )
            dst_ref[0] = jnp.where(
                pos < declen, dstw_ref[pl.ds(0, d_rows), :], 0
            ).astype(jnp.uint8)

    return kernel, (w_narrow, w_mid, w_wide, s_scr, stage_rows)


@partial(jax.jit, static_argnames=("d_pad", "n_slots", "interpret"))
def decode_v3(srcs, idx_slots, smeta, declens, d_pad, n_slots, interpret=False):
    idx_slots = idx_slots.astype(jnp.int32)
    b, s = srcs.shape
    s_rows, d_rows = s // LANES, d_pad // LANES
    n_tiles = d_rows // 8
    kernel, (w_n, w_m, w_w, s_scr, stage_rows) = make_v3(
        s_rows, d_rows, n_slots, n_tiles)
    slot_rows = n_slots * 1024 // LANES
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, s_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, slot_rows, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, d_rows if SCATTER_IN_KERNEL else slot_rows, LANES),
            lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (b, d_rows if SCATTER_IN_KERNEL else slot_rows, LANES),
            jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((s_scr, LANES), jnp.int32),
            pltpu.VMEM((1024, w_n), jnp.bfloat16),
            pltpu.VMEM((1024, w_m), jnp.bfloat16),
            pltpu.VMEM((1024, w_w), jnp.bfloat16),
            pltpu.VMEM((1024, LANES), jnp.float32),
            pltpu.VMEM((128, 128), jnp.float32),
            pltpu.VMEM((stage_rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(
        smeta.reshape(-1), declens.astype(jnp.int32),
        srcs.reshape(b, s_rows, LANES),
        idx_slots.reshape(b, slot_rows, LANES),
    )


def decode_v3_full(srcs, idx_slots, smeta, declens, perm_rows, d_pad, n_slots):
    raw = decode_v3(srcs, idx_slots, smeta, declens, d_pad, n_slots)
    if SCATTER_IN_KERNEL:
        return raw.reshape(srcs.shape[0], d_pad)
    # XLA-side unpermute: out rows t*8+r come from slot rows.
    b = srcs.shape[0]
    d_rows = d_pad // LANES
    g = jnp.take_along_axis(raw, perm_rows[:, :, None].astype(jnp.int32), axis=1)
    # zero-pad contract
    pos = (jnp.arange(d_rows)[None, :, None] * LANES
           + jnp.arange(LANES)[None, None, :])
    g = jnp.where(pos < declens[:, None, None], g, 0)
    return g.reshape(b, d_pad)


def main() -> int:
    from bench import _compressed_rows, _load_corpus_blocks
    from snappy_tpu import native
    from snappy_tpu.ops.pallas.decode import _decode_flat_pallas_v2

    KBIG = int(os.environ.get("AB_KBIG", "9"))
    ROUNDS = int(os.environ.get("AB_ROUNDS", "8"))

    blocks, lens = _load_corpus_blocks(repeat=1)
    srcs_np, slens_np = _compressed_rows(blocks, lens)
    width = max(1024, -(-int(slens_np.max()) // 1024) * 1024)
    srcs_np = np.ascontiguousarray(srcs_np[:, :width])
    nbytes = int(lens.sum())
    d_pad = 65536
    n_tiles = d_pad // 1024

    idx2, meta2, f2, _e2, _d2 = native.flatten_idx_batch(
        srcs_np, slens_np.astype(np.uint64), np.asarray(lens, np.uint64),
        d_pad, layout=1)
    assert not f2.any()

    t0 = time.perf_counter()
    phys, smeta, n_slots = build_slots(idx2, meta2, d_pad, n_tiles)
    print(f"slot build (numpy, unoptimized): {time.perf_counter()-t0:.2f}s, "
          f"n_slots={n_slots}", flush=True)

    srcs = jnp.asarray(srcs_np)
    dls = jnp.asarray(lens).astype(jnp.int32)
    physj = jnp.asarray(phys)
    smetaj = jnp.asarray(smeta)

    # Row permutation for the XLA-side unpermute: output row t*8+r
    # comes from slot row slot_of_t*8+r.
    B = srcs_np.shape[0]
    slot_of_t = np.zeros((B, n_tiles), np.int64)
    for b in range(B):
        for j in range(n_slots):
            t = smeta[b, 6 + n_slots + j]
            if t < n_tiles:
                slot_of_t[b, t] = j
    perm_rows = (slot_of_t[:, :, None] * 8 + np.arange(8)[None, None, :]).reshape(B, -1)
    permj = jnp.asarray(perm_rows)

    # Correctness first.
    dst = np.asarray(jax.jit(decode_v3_full, static_argnames=("d_pad", "n_slots"))(
        srcs, physj, smetaj, dls, permj, d_pad, n_slots))
    ok = all(
        np.array_equal(dst[i, : lens[i]], blocks[i, : lens[i]])
        and not dst[i, lens[i]:].any()
        for i in range(blocks.shape[0])
    )
    print("v3 byte-check:", "PASS" if ok else "FAIL", flush=True)

    i2, m2 = jnp.asarray(idx2), jnp.asarray(meta2)

    def loop_v2():
        @jax.jit
        def run(k):
            def body(i, acc):
                ii = jnp.roll(i2, i, axis=0)
                dd = jnp.roll(dls, i)
                dst = _decode_flat_pallas_v2(srcs, ii, m2, dd, d_pad, False)
                return acc + dst[:, ::4096].astype(jnp.int32).sum()
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return run

    def loop_v3():
        @jax.jit
        def run(k):
            def body(i, acc):
                ii = jnp.roll(physj, i, axis=0)
                dd = jnp.roll(dls, i)
                dst = decode_v3_full(srcs, ii, smetaj, dd, permj, d_pad, n_slots)
                return acc + dst[:, ::4096].astype(jnp.int32).sum()
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return run

    runs = {"v2": loop_v2(), "v3": loop_v3()}
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "bytes": nbytes, "k_big": KBIG, "rounds": ROUNDS,
        "byte_check": bool(ok), "n_slots": n_slots,
        "t1": {k: [] for k in runs}, "tk": {k: [] for k in runs},
    }
    for run in runs.values():
        int(run(jnp.int32(1)))
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
            "s_per_iter": round(per, 5),
            "GBps": round(nbytes / per / 1e9, 4) if per > 0 else None,
        }
        print(name, json.dumps(out[name]), flush=True)
    with open(os.path.join(HERE, "V3_PROTO.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
