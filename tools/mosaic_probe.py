#!/usr/bin/env python
"""Probe which relayout primitives this Mosaic toolchain compiles on TPU.

Each probe is compiled AND executed on the chip with a value check, so a
"yes" means usable-and-correct, not just lowerable. Results drive the
flat-gather kernel's formulation choices.
"""

from __future__ import annotations

import os
import sys
import traceback

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(HERE, ".jax_cache"))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x_np = np.arange(1024, dtype=np.float32).reshape(8, 128)

    def run(body, out_shape):
        def kernel(x_ref, o_ref):
            o_ref[...] = body(x_ref[...])

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(jnp.asarray(x_np))

    probes = {
        "reshape_8x128_to_1024x1": (lambda x: x.reshape(1024, 1), (1024, 1),
                                    x_np.reshape(1024, 1)),
        "reshape_8x128_to_1x1024": (lambda x: x.reshape(1, 1024), (1, 1024),
                                    x_np.reshape(1, 1024)),
        "transpose_8x128": (lambda x: x.T, (128, 8), x_np.T),
        "swapaxes_to_col": (lambda x: x.reshape(1, 1024).T, (1024, 1),
                            x_np.reshape(1024, 1)),
        "eq_where_onehot": (
            lambda x: jnp.where(
                jax.lax.broadcasted_iota(jnp.float32, (8, 128), 1) == x[:, :1],
                jnp.float32(1), jnp.float32(0)),
            (8, 128),
            np.where(np.arange(128)[None, :] == x_np[:, :1], 1.0, 0.0).astype(np.float32),
        ),
        "take_along_axis_lanes": (
            lambda x: jnp.take_along_axis(
                x, (jnp.arange(128)[::-1])[None, :].astype(jnp.int32).repeat(8, 0), axis=1
            ).astype(jnp.float32),
            (8, 128),
            x_np[:, ::-1],
        ),
        "dynamic_gather_rows_iota": (
            # roll lanes uniformly via pltpu.roll
            lambda x: pltpu.roll(x, 5, 1),
            (8, 128),
            np.roll(x_np, 5, axis=1),
        ),
    }

    results = {}
    for name, (fn, oshape, want) in probes.items():
        try:
            got = np.asarray(run(fn, oshape))
            ok = np.array_equal(got, want)
            results[name] = "OK" if ok else "WRONG-VALUES"
        except Exception as e:
            msg = str(e).split("\n")[0][:100]
            results[name] = f"FAIL: {msg}"
        print(f"{name}: {results[name]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
