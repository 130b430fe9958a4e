#!/usr/bin/env python
"""Probe Mosaic lowering + rates for flat-gather matmul variants.

The flat-gather decode kernel's cost is the one-hot routing matmul
(1024, w) @ (w, 128) per 1024-byte tile. This probe checks, on the
real chip, which operand dtypes Mosaic lowers and how fast each runs
in a realistic loop: bf16 (current production), int8 with int32
accumulation (2x MXU rate, 4x less operand traffic), and f32.
Writes MOSAIC_INT8.json.
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


def make_kernel(w: int, n_tiles: int, mode: str):
    """Per grid cell: n_tiles routing matmuls over a (w, 128) window."""

    def kernel(rows_ref, win_ref, out_ref, acc_ref):
        def fiota(shape, dim):
            return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

        def ind(a, b):
            return jnp.maximum(jnp.float32(1) - jnp.abs(a - b), jnp.float32(0))

        wiof = fiota((1024, w), 1)

        def tile(t, acc):
            # Data-dependent row targets (from SMEM) so nothing folds.
            r0 = rows_ref[t]
            row_em = (
                jax.lax.broadcasted_iota(jnp.int32, (1024, 1), 0) + r0
            ).astype(jnp.float32)
            row_em = row_em - jnp.floor(row_em * (1.0 / w)) * w
            onehot = ind(wiof, row_em)
            if mode == "bf16":
                routed = jax.lax.dot_general(
                    onehot.astype(jnp.bfloat16),
                    win_ref[:].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif mode == "int8":
                routed = jax.lax.dot_general(
                    onehot.astype(jnp.int8),
                    win_ref[:].astype(jnp.int8),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
            elif mode == "f32":
                routed = jax.lax.dot_general(
                    onehot,
                    win_ref[:].astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                raise ValueError(mode)
            return acc + routed[:, :1]

        acc = jax.lax.fori_loop(0, n_tiles, tile, jnp.zeros((1024, 1), jnp.float32))
        acc_ref[:] = acc
        out_ref[:] = acc[:8, :]

    return kernel


@partial(jax.jit, static_argnames=("w", "n_tiles", "mode"))
def run(rows, win, w: int, n_tiles: int, mode: str):
    return pl.pallas_call(
        make_kernel(w, n_tiles, mode),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((w, LANES), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1024, 1), jnp.float32)],
    )(rows, win)


def main() -> int:
    out: dict = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "platform": jax.devices()[0].platform,
    }
    # Latency-corrected: time N and 4N tiles, difference isolates the
    # per-tile device rate (the ~34 ms tunnel round-trip cancels).
    for w in (128, 256, 512):
        N = max(2048, (1 << 23) // w)
        win = jnp.asarray(
            np.random.randint(0, 256, (w, LANES), np.int32), jnp.int32
        )
        rows_n = jnp.asarray(np.random.randint(0, w, (N,), np.int32))
        rows_4n = jnp.asarray(np.random.randint(0, w, (4 * N,), np.int32))
        for mode in ("bf16", "int8", "f32"):
            key = f"w{w}_{mode}"
            try:
                t0 = time.perf_counter()
                np.asarray(run(rows_n, win, w, N, mode))
                np.asarray(run(rows_4n, win, w, 4 * N, mode))
                compile_s = time.perf_counter() - t0

                def best_of(rows, n, k=3):
                    best = float("inf")
                    for _ in range(k):
                        t0 = time.perf_counter()
                        np.asarray(run(rows, win, w, n, mode))
                        best = min(best, time.perf_counter() - t0)
                    return best

                t1 = best_of(rows_n, N)
                t4 = best_of(rows_4n, 4 * N)
                per_tile = (t4 - t1) / (3 * N)
                flops = 1024 * w * LANES * 2
                out[key] = {
                    "compile_s": round(compile_s, 1),
                    "t1_s": round(t1, 4),
                    "t4_s": round(t4, 4),
                    "tflops": round(flops / per_tile / 1e12, 1),
                    "GBps_gather": round(1024 / per_tile / 1e9, 3),
                }
            except Exception as e:  # lowering failure is a result too
                out[key] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(key, json.dumps(out[key]), flush=True)

    with open(os.path.join(HERE, "MOSAIC_INT8.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
