#!/usr/bin/env python
"""Device cost of candidate emission-expansion primitives.

The encoder's last stage must map each output byte to its covering
record. Candidates (chained device-resident, B=64):

- merge2: two 2-operand sorts over the 95K-element record/output merge;
- taa: one take_along_axis field gather at (B, 76800);
- telescope: 144-step XLA fori accumulating step functions over
  (B, 600, 128) (the Pallas-free cover loop);

Writes EMIT_PROBE.json.
"""

from __future__ import annotations

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

    B = 64
    NREC = 18432
    OUTW = 76800
    M = NREC + OUTW

    rng = np.random.default_rng(7)
    starts_np = np.sort(rng.integers(0, OUTW, (B, NREC)), axis=1).astype(np.int32)
    fields_np = rng.integers(0, 1 << 24, (B, NREC), dtype=np.int32)
    cov_np = rng.integers(0, NREC, (B, OUTW), dtype=np.int32)
    st = jnp.asarray(starts_np)
    fl = jnp.asarray(fields_np)
    cv = jnp.asarray(cov_np)

    KBIG = 5
    ROUNDS = 6

    @jax.jit
    def run_merge2(k):
        def body(i, acc):
            s = jnp.roll(st, i, axis=0)
            d = jnp.broadcast_to(jnp.arange(OUTW, dtype=jnp.int32)[None, :], (B, OUTW))
            key = jnp.concatenate([s * 2, d * 2 + 1], axis=1)
            pay = jnp.concatenate(
                [jnp.broadcast_to(jnp.arange(NREC, dtype=jnp.int32)[None, :], (B, NREC)),
                 jnp.full((B, OUTW), -1, jnp.int32)], axis=1)
            sk, sp = jax.lax.sort((key, pay), dimension=1, num_keys=1)
            cover = jax.lax.cummax(sp, axis=1)
            # second sort: outputs back to d order
            okey = jnp.where(sk & 1 == 1, sk >> 1, jnp.int32(1 << 20))
            k2, c2 = jax.lax.sort((okey, cover), dimension=1, num_keys=1)
            return acc + c2[:, ::8192].sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def run_taa(k):
        def body(i, acc):
            c = jnp.roll(cv, i, axis=0)
            g = jnp.take_along_axis(fl, c, axis=1)
            return acc + g[:, ::8192].sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def run_telescope(k):
        def body(i, acc):
            s = jnp.roll(st, i, axis=0)
            d = jnp.arange(OUTW, dtype=jnp.int32).reshape(1, 600, 128)
            # 144 steps, each adds one record-slot's step function per
            # segment (128 segments' k-th record -> 128 breakpoints on
            # lanes... approximated here as 144 slot-steps of (B,600,128))
            def step(t, a):
                bp = jax.lax.dynamic_slice(s, (0, t * 128), (B, 128))
                # element (b, r, l) accumulates [d >= bp[b, l]] * delta
                cmp = (d >= bp[:, None, :]).astype(jnp.int32)
                return a + cmp

            a = jax.lax.fori_loop(0, 144, step, jnp.zeros((B, 600, 128), jnp.int32))
            return acc + a[:, ::128, ::64].sum()

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    runs = {"merge2": run_merge2, "taa": run_taa, "telescope": run_telescope}
    out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "B": B, "t1": {k: [] for k in runs}, "tk": {k: [] for k in runs}}
    for name, run in runs.items():
        t0 = time.perf_counter()
        int(run(jnp.int32(1)))
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)
    for r in range(ROUNDS):
        for name, run in runs.items():
            t0 = time.perf_counter()
            int(run(jnp.int32(1)))
            out["t1"][name].append(round(time.perf_counter() - t0, 5))
            t0 = time.perf_counter()
            int(run(jnp.int32(KBIG)))
            out["tk"][name].append(round(time.perf_counter() - t0, 5))
        print(f"round {r}", flush=True)
    res = {}
    for name in runs:
        per = (min(out["tk"][name]) - min(out["t1"][name])) / (KBIG - 1)
        res[name] = {"s_per_iter": round(per, 6),
                     "us_per_block": round(per / B * 1e6, 2)}
        print(name, json.dumps(res[name]), flush=True)
    out["results"] = res
    with open(os.path.join(HERE, "EMIT_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
