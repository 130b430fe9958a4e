#!/usr/bin/env python
"""Randomized decode sweep on real TPU hardware.

The interpret-mode suite and the fuzz campaigns validate the kernels'
semantics on CPU; this sweep validates the *compiled* production route
on the chip at scale: N random streams (mixed compressibility, sizes
up to 64 KiB, a third mutated) decode through ``decompress_streams``
with the Pallas routes enabled, and every accepted row's bytes are
checked via its on-device masked CRC32C against the host oracle's CRC
(full outputs never cross the ~0.02 GB/s D2H tunnel). Accept/reject
must agree with the oracle row-for-row. Writes TPU_SWEEP.json.
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
os.environ["SNAPPY_TPU_PALLAS_DECODE"] = "1"


def gen_input(rng) -> bytes:
    kind = int(rng.integers(0, 5))
    n = int(rng.integers(1, 65537))
    if kind == 0:  # uniform random (incompressible)
        return rng.integers(0, 256, n, dtype="uint8").tobytes()
    if kind == 1:  # low entropy
        return rng.integers(0, 4, n, dtype="uint8").tobytes()
    if kind == 2:  # repeated snippet
        snip = rng.integers(0, 256, int(rng.integers(1, 256)), dtype="uint8").tobytes()
        return (snip * (n // max(len(snip), 1) + 1))[:n]
    if kind == 3:  # text-ish
        base = open(os.path.join(HERE, "data", "plrabn12.txt"), "rb").read()
        off = int(rng.integers(0, max(len(base) - n, 1)))
        return base[off : off + n]
    return bytes(n)  # zeros (long overlap copies)


def main() -> int:
    import numpy as np

    from snappy_tpu import error as err
    from snappy_tpu import native
    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import read_varu64, write_varu64
    from snappy_tpu.ops.api import OK, decompress_streams

    N = int(os.environ.get("SWEEP_N", "200"))
    SEED = int(os.environ.get("SWEEP_SEED", "20260819"))
    rng = np.random.default_rng(SEED)
    enc_engine = "native" if native.available() else "reference"
    from snappy_tpu import raw

    enc = raw.Encoder(engine=enc_engine)

    bodies, declens = [], []
    for i in range(N):
        data = gen_input(rng)
        comp = enc.compress_vec(data)
        _, h = read_varu64(comp)
        body = bytearray(comp[h:])
        if i % 3 == 0 and len(body) > 2:
            body[int(rng.integers(0, len(body)))] ^= int(rng.integers(1, 256))
        bodies.append(bytes(body))
        declens.append(len(data))

    t0 = time.perf_counter()
    outs_unused, errs, crcs = decompress_streams(bodies, declens, with_crc=True)
    wall = time.perf_counter() - t0

    import jax

    ok_rows = 0
    rejected = 0
    failures = []
    for i in range(N):
        stream = write_varu64(declens[i]) + bodies[i]
        try:
            want = ref.decompress(stream)
        except err.SnappyError:
            if int(errs[i]) == OK:
                failures.append({"row": i, "kind": "accepted-bad"})
            else:
                rejected += 1
            continue
        if int(errs[i]) != OK:
            failures.append({"row": i, "kind": "rejected-good"})
            continue
        want_crc = native.crc32c_masked(want) if native.available() else None
        if want_crc is None:
            from snappy_tpu.format.crc32c import crc32c_masked as _m

            want_crc = _m(want)
        if int(crcs[i]) != int(want_crc):
            failures.append({"row": i, "kind": "crc-mismatch"})
        else:
            ok_rows += 1

    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "platform": jax.devices()[0].platform,
        "cases": N,
        "seed": SEED,
        "accepted_crc_verified": ok_rows,
        "rejected_agreeing": rejected,
        "failures": failures,
        "wall_s": round(wall, 1),
        "ok": not failures,
    }
    with open(os.path.join(HERE, "TPU_SWEEP.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
