#!/usr/bin/env python
"""Prototype: pure-greedy positional parse vs reference size, per file.

Question for the round-4 device encoder: if the parse drops the
estimate-based heuristics (one-step lazy defer, isolated-copy skip)
and simply accepts EVERY candidate (exact u32 prev-occurrence => true
match >= 4) with exact extension at accept, is compressed size <= the
reference on every corpus file? If yes, the parse decision function
f(p) is purely positional (no estimated-length comparisons), which is
what the lockstep Pallas walk needs.

Also measures the cost of forced op boundaries every K bytes
(K = segment size of the future lockstep kernel): matches truncate at
segment ends; offsets still reach the whole 64 KiB window.

Writes GREEDY_PARSE_PROTO.json.
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
        n = jnp.asarray(lens).astype(jnp.int32)
        u32 = ef._u32_at(jnp.asarray(blocks))
        prev = ef._prev_occurrence(u32, n)
        bsz = prev.shape[0]
        p = jnp.arange(S, dtype=jnp.int32)[None, :]
        tiny = n < MIN_NON_LITERAL_BLOCK_SIZE
        cand = (prev >= 0) & (p + 4 <= n[:, None]) & ~tiny[:, None]
        off = jnp.where(cand, p - prev, 0)
        # skip hop: distance to next candidate (for literal runs)
        zc = jnp.where(cand, p, jnp.int32(S))
        nxtc = jax.lax.cummin(zc[:, ::-1], axis=1)[:, ::-1]
        return np.asarray(cand), np.asarray(off), np.asarray(nxtc)

    def walk(block, n, cand, off, nxtc, seg):
        """Pure greedy: accept every candidate, exact extension, optional
        forced boundary every `seg` bytes (0 = none)."""
        ops = []
        p = 0
        next_emit = 0
        while p < n:
            if not cand[p]:
                p = int(nxtc[p]) if nxtc[p] < n else n
                continue
            o = int(off[p])
            q = p - o
            lim = n if not seg else min(n, (p // seg + 1) * seg)
            lp = 4
            # exact extension (bytes guaranteed equal for first 4)
            while p + lp < lim and block[p + lp] == block[q + lp]:
                lp += 1
            if p > next_emit:
                ops.append((0, next_emit, p))
            ops.append((1, o, lp))
            next_emit = p + lp
            p = next_emit
        if next_emit < n:
            ops.append((0, next_emit, n))
        return ops

    def emit(block, ops):
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
    segs = [0, 4096, 2048, 1024]
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "per_file": [],
    }
    totals = {s: 0 for s in segs}
    tot_ref = 0
    bad = 0
    over = {s: [] for s in segs}
    for name in CORPUS:
        data = open(os.path.join(HERE, "data", name), "rb").read()
        blocks, lens = blocks_of(data)
        cand, off, nxtc = prepass(blocks, lens)
        row = {"file": name}
        ref_sz = sum(
            len(enc_ref.compress_vec(blocks[i, : lens[i]].tobytes()))
            - len(write_varu64(int(lens[i])))
            for i in range(blocks.shape[0])
        )
        row["ref_bytes"] = ref_sz
        tot_ref += ref_sz
        for seg in segs:
            sz = 0
            for i in range(blocks.shape[0]):
                blk = blocks[i]
                ops = walk(blk, int(lens[i]), cand[i], off[i], nxtc[i], seg)
                body = emit(blk, ops)
                sz += len(body)
                stream = write_varu64(int(lens[i])) + body
                if ref.decompress(stream) != blk[: lens[i]].tobytes():
                    bad += 1
            row[f"seg{seg}"] = sz
            row[f"seg{seg}_vs_ref"] = round(sz / ref_sz, 4)
            totals[seg] += sz
            if sz > ref_sz:
                over[seg].append(name)
        out["per_file"].append(row)
        print(row, flush=True)
    out["totals_vs_ref"] = {
        str(s): round(totals[s] / tot_ref, 4) for s in segs
    }
    out["roundtrip_failures"] = bad
    out["files_over_reference"] = {str(s): over[s] for s in segs}
    print(json.dumps({k: out[k] for k in
                      ("totals_vs_ref", "roundtrip_failures",
                       "files_over_reference")}), flush=True)
    with open(os.path.join(HERE, "GREEDY_PARSE_PROTO.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
