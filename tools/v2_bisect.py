#!/usr/bin/env python
"""Bisect the v2 kernel's Mosaic compile crash: compile stripped
variants at the corpus shape (s_rows=520, d_pad=65536) and report which
stage triggers the jellyfish CHECK failure. Each variant runs in a
subprocess so a SIGABRT doesn't kill the sweep."""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANT_SRC = r"""
import os, sys
sys.path.insert(0, {here!r})
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join({here!r}, ".jax_cache"))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MODE = {mode!r}
s_rows, d_rows = 520, 512
n_tiles, n_groups = 64, 4
w_narrow, w_mid, w_wide = 128, 256, 512
w_max = 512
s_scr = max(s_rows, w_max)

def kernel(meta_ref, declen_ref, src_ref, idx_ref, dst_ref, srcw_ref, oh_ref, sel_ref, outt_ref):
    i = pl.program_id(0)
    declen = declen_ref[i]
    srcw_ref[pl.ds(0, s_rows), :] = src_ref[0].astype(jnp.int32)
    if s_scr > s_rows:
        srcw_ref[pl.ds(s_rows, s_scr - s_rows), :] = jnp.zeros((s_scr - s_rows, LANES), jnp.int32)

    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

    def ind(a, b):
        return jnp.maximum(jnp.float32(1) - jnp.abs(a - b), jnp.float32(0))

    lane2f = fiota((128, LANES), 1)
    wio = fiota((128, w_max), 1)
    ident = ind(fiota((128, 128), 0), fiota((128, 128), 1)).astype(jnp.bfloat16)

    def tile_into(blk, tt, base, w):
        for s in range(8):
            col = blk[:, tt * 8 + s : tt * 8 + s + 1].astype(jnp.float32)
            row_em = jnp.floor(col * (1.0 / LANES))
            lane_em = col - row_em * LANES
            if MODE != "no_oh":
                oh_ref[pl.ds(s * 128, 128), :w] = ind(wio[:, :w], row_em).astype(jnp.bfloat16)
            sel_ref[pl.ds(s * 128, 128), :] = ind(lane2f, lane_em)
        if MODE in ("no_oh", "no_mm"):
            vals = jnp.sum(sel_ref[:], axis=1, keepdims=True)
        else:
            win = srcw_ref[pl.ds(base, w), :]
            routed = jax.lax.dot_general(
                oh_ref[:, :w], win.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            vals = jnp.sum(routed * sel_ref[:], axis=1, keepdims=True)
        for s in range(8):
            outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = vals[s * 128 : (s + 1) * 128, :]

    def group(g, acc):
        blk = idx_ref[0, pl.ds(g * 128, 128), :]
        for tt in range(16):
            t = g * 16 + tt
            base = meta_ref[i * n_tiles * 2 + 2 * t]
            bucket = meta_ref[i * n_tiles * 2 + 2 * t + 1]
            if MODE == "no_switch":
                tile_into(blk, tt, base, w_wide)
            else:
                def mk(w):
                    def f(_):
                        tile_into(blk, tt, base, w)
                        return 0
                    return f
                jax.lax.switch(bucket, [mk(w_narrow), mk(w_mid), mk(w_wide)], None)
        if MODE == "no_transpose":
            t_out = outt_ref[:]
        elif MODE == "jnp_transpose":
            t_out = outt_ref[:].T
        else:
            t_out = jax.lax.dot_general(
                outt_ref[:].astype(jnp.bfloat16), ident,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        pos = (g * (128 * LANES)
               + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 0) * LANES
               + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 1))
        dst_ref[0, pl.ds(g * 128, 128), :] = jnp.where(
            pos < declen, t_out.astype(jnp.int32), 0).astype(jnp.uint8)
        return acc

    jax.lax.fori_loop(0, n_groups, group, jnp.int32(0))

b = 2
d_pad = d_rows * LANES
srcs = jnp.zeros((b, s_rows * LANES), jnp.uint8)
idx = jnp.zeros((b, d_pad), jnp.int32)
meta = jnp.zeros((b * n_tiles * 2,), jnp.int32)
dls = jnp.full((b,), d_pad, jnp.int32)
out = pl.pallas_call(
    kernel, grid=(b,),
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, s_rows, LANES), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
    ],
    out_specs=pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((b, d_rows, LANES), jnp.uint8),
    scratch_shapes=[
        pltpu.VMEM((s_scr, LANES), jnp.int32),
        pltpu.VMEM((1024, w_max), jnp.bfloat16),
        pltpu.VMEM((1024, LANES), jnp.float32),
        pltpu.VMEM((128, 128), jnp.float32),
    ],
)(meta, dls, srcs.reshape(b, s_rows, LANES), idx.reshape(b, d_rows, LANES))
np.asarray(out)
print("COMPILED_OK", MODE)
"""


def main() -> int:
    modes = sys.argv[1:] or [
        "no_oh", "no_mm", "no_transpose", "jnp_transpose", "no_switch", "full",
    ]
    for mode in modes:
        src = VARIANT_SRC.format(here=HERE, mode=mode)
        p = subprocess.run(
            [sys.executable, "-c", src], capture_output=True, text=True,
            timeout=420,
        )
        ok = "COMPILED_OK" in p.stdout
        line = ""
        if not ok:
            for ln in (p.stderr or "").splitlines():
                if "Check failed" in ln or "Error" in ln or "error" in ln:
                    line = ln.strip()[:160]
                    break
        print(f"{mode:14s} {'OK' if ok else 'CRASH'} {line}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
