#!/usr/bin/env python
"""Prototype: chain lengths + repair-at-accept sequential parse.

The round-3 chain-consistency estimate (CHAINLEN_PROTO.json) was valid
but +8.5% size vs the reference because chain breaks truncate match
lengths. This prototypes the round-4 design: the parse walks each block
sequentially (the future Pallas scalar-core kernel), and *repairs*
(extends by real byte compares) only the matches it actually accepts —
bounded work exactly where it pays. Heuristics mirror the production
fast profile (one-step lazy defer, isolated-copy skip).

Validates the size contract per corpus file (<= reference encoder) and
round-trips every block through the oracle. Writes FASTPARSE_PROTO.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(HERE, ".jax_cache"))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.constants import MIN_NON_LITERAL_BLOCK_SIZE
    from snappy_tpu.format.varint import write_varu64
    from snappy_tpu.ops import encode_fast as ef
    from snappy_tpu.ops.encode import S

    def prepass(blocks, lens):
        """XLA pre-pass: prev-occurrence offsets + chain lengths (+ next
        candidate delta), all vector primitives — no gather loops."""
        n = jnp.asarray(lens).astype(jnp.int32)
        u32 = ef._u32_at(jnp.asarray(blocks))
        prev = ef._prev_occurrence(u32, n)
        bsz = prev.shape[0]
        p = jnp.arange(S, dtype=jnp.int32)[None, :]
        nxt_prev = jnp.concatenate(
            [prev[:, 1:], jnp.full((bsz, 1), -1, jnp.int32)], axis=1
        )
        c = (prev >= 0) & (nxt_prev == prev + 1)
        z = jnp.where(c, jnp.int32(S), p)
        nxt0 = jax.lax.cummin(z[:, ::-1], axis=1)[:, ::-1]
        run = nxt0 - p
        length = jnp.where(prev >= 0, 4 + run, 0)
        length = jnp.minimum(length, jnp.minimum(256, n[:, None] - p))
        tiny = n < MIN_NON_LITERAL_BLOCK_SIZE
        length = jnp.where(tiny[:, None], 0, length)
        length = jnp.where((prev >= 0) & (length >= 4), length, 0)
        off = jnp.where(length >= 4, p - prev, 0)
        cand = length >= 4
        zc = jnp.where(cand, p, jnp.int32(S))
        nxtc = jax.lax.cummin(zc[:, ::-1], axis=1)[:, ::-1]
        delta = jnp.minimum(nxtc - p, 63)
        packed = (delta << 25) | (length << 16) | off
        return np.asarray(packed), np.asarray(length), np.asarray(off)

    def walk(block, n, L, off):
        """Sequential parse with repair-at-accept (numpy; the future
        Pallas kernel's exact control flow)."""
        ops = []
        p = 0
        next_emit = 0
        while p < n:
            lp = int(L[p])
            op = int(off[p])
            if lp < 4:
                # skip to next candidate (kernel: via packed delta hops)
                p += 1
                while p < n and L[p] < 4:
                    p += 1
                continue
            # isolated-copy heuristic (production fast profile)
            lp4 = int(L[p + 4]) if p + 4 < n else 0
            if lp == 4 and op > 2047 and lp4 < 4:
                p += 1
                continue
            # one-step lazy defer
            if p + 1 < n and int(L[p + 1]) > lp:
                p += 1
                continue
            # accept: repair-extend by real byte compares
            q = p - op
            while p + lp < n and block[p + lp] == block[q + lp]:
                lp += 1
            if p > next_emit:
                ops.append((0, next_emit, p))
            ops.append((1, op, lp))
            next_emit = p + lp
            p = next_emit
        if next_emit < n:
            ops.append((0, next_emit, n))
        return ops

    def emit(block, ops):
        """Host serializer mirroring serialize_ops' emission rules."""
        out = bytearray()
        for kind, a, b in ops:
            if kind == 0:
                lit = block[a:b]
                llm1 = len(lit) - 1
                if llm1 <= 59:
                    out.append(llm1 << 2)
                elif llm1 < 256:
                    out.append(60 << 2)
                    out.append(llm1)
                else:
                    out.append(61 << 2)
                    out.append(llm1 & 0xFF)
                    out.append((llm1 >> 8) & 0xFF)
                out += bytes(lit)
            else:
                offset, length = a, b
                while length >= 68:
                    out.append(((64 - 1) << 2) | 2)
                    out.append(offset & 0xFF)
                    out.append((offset >> 8) & 0xFF)
                    length -= 64
                if length > 64:
                    out.append(((60 - 1) << 2) | 2)
                    out.append(offset & 0xFF)
                    out.append((offset >> 8) & 0xFF)
                    length -= 60
                if length <= 11 and offset <= 2047:
                    out.append(((offset >> 8) << 5) | ((length - 4) << 2) | 1)
                    out.append(offset & 0xFF)
                else:
                    out.append(((length - 1) << 2) | 2)
                    out.append(offset & 0xFF)
                    out.append((offset >> 8) & 0xFF)
        return bytes(out)

    from bench import CORPUS
    from snappy_tpu import raw
    from snappy_tpu.ops.packing import blocks_of

    enc_ref = raw.Encoder(engine="native")
    out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()), "per_file": []}
    tot_new = tot_fast = tot_ref = 0
    bad = 0
    over = []
    for name in CORPUS:
        data = open(os.path.join(HERE, "data", name), "rb").read()
        blocks, lens = blocks_of(data)
        packed, Lc, Oc = prepass(blocks, lens)
        new_sz = 0
        for i in range(blocks.shape[0]):
            blk = blocks[i]
            ops = walk(blk, int(lens[i]), Lc[i], Oc[i])
            body = emit(blk, ops)
            new_sz += len(body)
            stream = write_varu64(int(lens[i])) + body
            if ref.decompress(stream) != blk[: lens[i]].tobytes():
                bad += 1
        of, olf = ef.compress_blocks_fast_host(blocks, lens)
        fast_sz = int(olf.sum())
        ref_sz = sum(
            len(enc_ref.compress_vec(blocks[i, : lens[i]].tobytes()))
            - len(write_varu64(int(lens[i])))
            for i in range(blocks.shape[0])
        )
        row = {
            "file": name,
            "new_bytes": new_sz,
            "fast_bytes": fast_sz,
            "ref_bytes": ref_sz,
            "new_vs_fast": round(new_sz / fast_sz, 4),
            "new_vs_ref": round(new_sz / ref_sz, 4),
        }
        if new_sz > ref_sz:
            over.append(name)
        out["per_file"].append(row)
        tot_new += new_sz
        tot_fast += fast_sz
        tot_ref += ref_sz
        print(row, flush=True)
    out["total_new_vs_fast"] = round(tot_new / tot_fast, 4)
    out["total_new_vs_ref"] = round(tot_new / tot_ref, 4)
    out["roundtrip_failures"] = bad
    out["files_over_reference"] = over
    print(
        f"new/fast {out['total_new_vs_fast']}, new/ref {out['total_new_vs_ref']}, "
        f"failures {bad}, over-ref {over}",
        flush=True,
    )
    with open(os.path.join(HERE, "FASTPARSE_PROTO.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
