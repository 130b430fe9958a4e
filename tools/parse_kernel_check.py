#!/usr/bin/env python
"""Check the Pallas lockstep parse kernel against the prototype walk.

Runs interpret mode on CPU: records (pos, off, len) per segment must
match tools/greedy_parse_proto2.py's walk exactly on corpus blocks.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    import greedy_parse_proto2 as gp
    from snappy_tpu.ops.encode_flat import prepass
    from snappy_tpu.ops.pallas.encode_flat import (
        MAX_REC, SEG, parse_blocks_pallas,
    )
    from snappy_tpu.ops.packing import blocks_of

    names = sys.argv[1:] or ["html", "fireworks.jpeg", "geo.protodata",
                             "plrabn12.txt"]
    datas = []
    for name in names:
        raw = open(os.path.join(HERE, "data", name), "rb").read()
        b, l = blocks_of(raw)
        datas.append((name + "#0", b[0], int(l[0])))
        if b.shape[0] > 1:
            datas.append((name + "#last", b[-1], int(l[-1])))
    # synthetic edges
    rng = np.random.default_rng(3)
    z = np.zeros(65536, np.uint8)
    datas.append(("zeros", z, 65536))
    small = np.zeros(65536, np.uint8)
    small[:300] = np.frombuffer(b"abcd" * 75, np.uint8)
    datas.append(("short300", small, 300))
    tiny = np.zeros(65536, np.uint8)
    tiny[:10] = 65
    datas.append(("tiny10", tiny, 10))

    blocks = np.stack([d[1] for d in datas])
    lens = np.array([d[2] for d in datas], np.int32)

    jw, u32seg, planes = prepass(jnp.asarray(blocks), jnp.asarray(lens))
    rec0, rec1, cnt = parse_blocks_pallas(
        jnp.asarray(lens), jw, u32seg, planes
    )
    rec0, rec1, cnt = np.asarray(rec0), np.asarray(rec1), np.asarray(cnt)

    fails = 0
    for bi, (name, blk, n) in enumerate(datas):
        if n < 16:
            want = []
        else:
            cand, off, Lhat, nxtc = gp.prepass(blk, n)
            ops, _ = gp.walk(blk, n, cand, off, Lhat, nxtc)
            want = [(a, b_, c) for (k, b_, c) in [] ] if False else None
            copies = []
            ne = 0
            for kind, a, b_ in ops:
                if kind == 1:
                    pass
            # rebuild copies with positions from walk
            copies = []
            pos = 0
            for kind, a, b_ in ops:
                if kind == 0:
                    pos = b_
                else:
                    copies.append((pos, a, b_))
                    pos += b_
            want = copies
        got = []
        assert cnt[bi, :, 1].max() == 0, f"{name}: overflow flagged"
        for l in range(128):
            for k in range(int(cnt[bi, l, 0])):
                v0 = int(rec0[bi, l, k])
                got.append((l * SEG + (v0 & 0x3FF), int(rec1[bi, l, k]),
                            v0 >> 10))
        got.sort()
        if got != want:
            fails += 1
            print(f"FAIL {name}: {len(got)} vs {len(want)} records")
            for g, w in zip(got[:2000], want[:2000]):
                if g != w:
                    print("  first diff: got", g, "want", w)
                    break
            if len(got) != len(want):
                sg, sw = set(got), set(want)
                print("  only-got:", sorted(sg - sw)[:5])
                print("  only-want:", sorted(sw - sg)[:5])
        else:
            print(f"OK   {name}: {len(got)} records")
    print("FAILURES:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
