#!/usr/bin/env python
"""End-to-end correctness of the flat device encoder vs the prototype.

One fixed-shape batch holds every corpus block (single compile), so
this runs on the real TPU in one pipeline pass. Per block: output
bytes must equal greedy_parse_proto2's emission exactly and round-trip
through the native decoder; per file, total size must stay <= the
reference encoder's. EFC_FAST=1 checks the fast-emission path
(records_to_bytes_fast); default checks the reference emission.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))

import numpy as np


def main() -> int:
    import jax as _jax
    import jax.numpy as jnp

    import greedy_parse_proto2 as gp
    from snappy_tpu import native, raw
    from snappy_tpu.format.varint import write_varu64
    from snappy_tpu.ops.encode_flat import (
        _compress_blocks_flat, _compress_blocks_flat_split,
    )
    from snappy_tpu.ops.packing import blocks_of

    fast = os.environ.get("EFC_FAST") == "1"
    interp = _jax.default_backend() != "tpu"
    names = sys.argv[1:] or [
        "html", "urls.10K", "fireworks.jpeg", "paper-100k.pdf", "html_x_4",
        "alice29.txt", "asyoulik.txt", "lcet10.txt", "plrabn12.txt",
        "geo.protodata", "kppkn.gtb",
    ]
    allb, alll, spans = [], [], []
    nblocks = 0
    for name in names:
        data = open(os.path.join(HERE, "data", name), "rb").read()
        b, l = blocks_of(data)
        spans.append((name, nblocks, nblocks + b.shape[0]))
        nblocks += b.shape[0]
        allb.append(b)
        alll.append(l)
    blocks = np.concatenate(allb, axis=0)
    lens = np.concatenate(alll, axis=0)
    print(f"batch: {blocks.shape[0]} blocks", flush=True)

    fn = _compress_blocks_flat_split if fast else _compress_blocks_flat
    out, out_len, ovf = fn(jnp.asarray(blocks), jnp.asarray(lens), interp)
    out, out_len, ovf = np.asarray(out), np.asarray(out_len), np.asarray(ovf)
    assert not ovf.any(), "overflow flagged"
    print("device pass done", flush=True)

    enc_ref = raw.Encoder(engine="native")
    fails = 0
    over = []
    for name, lo, hi in spans:
        sz = ref_sz = 0
        for i in range(lo, hi):
            blk, n = blocks[i], int(lens[i])
            got = out[i, : out_len[i]].tobytes()
            if n < 16:
                want_ops = [(0, 0, n)] if n else []
            else:
                cand, offv, Lhat, nxtc = gp.prepass(blk, n)
                want_ops, _ = gp.walk(blk, n, cand, offv, Lhat, nxtc)
            want = gp.emit(blk, want_ops)
            if got != want:
                fails += 1
                print(f"FAIL {name}#{i-lo}: {len(got)} vs {len(want)} bytes")
                for j, (a, b) in enumerate(zip(got, want)):
                    if a != b:
                        print(f"  first diff at {j}: {a} vs {b}")
                        break
            if n and native.decompress(write_varu64(n) + got) != blk[:n].tobytes():
                fails += 1
                print(f"FAIL {name}#{i-lo}: round-trip")
            sz += len(got)
            ref_sz += len(enc_ref.compress_vec(blk[:n].tobytes())) - len(
                write_varu64(n)
            )
        tag = "OK " if sz <= ref_sz else "OVER"
        if sz > ref_sz:
            over.append(name)
        print(f"{tag} {name}: {sz} vs ref {ref_sz} = {sz/ref_sz:.4f}", flush=True)
    print("FAILURES:", fails, "OVER:", over)
    return 1 if (fails or over) else 0


if __name__ == "__main__":
    sys.exit(main())
