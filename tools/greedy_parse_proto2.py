#!/usr/bin/env python
"""Prototype v2: the exact positional parse the Pallas kernel will run.

Kernel-faithful rules (all decisions positional — no parser history):

- candidates: nearest previous position with the same 15-bit hash of
  the u32 gram, u32-verified in the prepass (one gather), so false
  candidates never reach the walk;
- chain-consistency length estimate L̂ (a guaranteed lower bound);
- pure greedy accept (no lazy defer) + the isolated-copy skip rule
  evaluated on L̂ (fixes fireworks.jpeg, the one file pure greedy
  loses on — GREEDY_PARSE_PROTO.json);
- extension starts at L̂ and repairs bytewise (chain breaks only);
- forced op boundaries every SEG bytes (the lockstep segment size);
  matches truncate at segment end, offsets reach the whole block;
- copies split to <= 64-byte records with the reference's 68/64/60
  rule applied at emission.

Validates size <= reference per corpus file, round-trips through the
native codec, and reports the kernel-sizing stats (max ops/segment,
max walk steps/segment, max extension rounds/segment). Writes
GREEDY2_PROTO.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SEG = 512
S = 65536
HASH_MULT = 0x1E35A7BD


def prepass(block, n):
    """NumPy mirror of the future XLA prepass (vector ops + 2 sorts).

    Exact u32 grouping (no hash): sort (u32 key, position) 2-key, read
    the previous same-key neighbor, return to position order with a
    second 2-key sort. SORT_COST_r04.json measures each sort at ~54
    us/block device-resident at B=64."""
    b = block.astype(np.uint32)
    bp = np.concatenate([b, np.zeros(8, np.uint32)])
    u32 = bp[:S] | (bp[1 : S + 1] << 8) | (bp[2 : S + 2] << 16) | (bp[3 : S + 3] << 24)
    p = np.arange(S, dtype=np.int64)
    valid = p <= n - 4
    key = np.where(valid, u32.astype(np.int64), 1 << 40)
    order = np.lexsort((p, key))  # device: 2-key sort
    sk = key[order]
    same = np.zeros(S, bool)
    same[1:] = sk[1:] == sk[:-1]
    cand_sorted = np.where(same, np.concatenate([[0], order[:-1]]), -1)
    prev = np.full(S, -1, np.int64)
    prev[order] = cand_sorted  # device: second 2-key sort (inverse perm)
    cand = (prev >= 0) & valid
    prev = np.where(cand, prev, -1)
    off = np.where(cand, p - prev, 0).astype(np.int64)
    # chain-consistency estimate
    c = np.zeros(S, bool)
    c[: S - 1] = cand[: S - 1] & cand[1:] & (prev[1:] == prev[: S - 1] + 1)
    z = np.where(c, S, p)
    nxt0 = np.minimum.accumulate(z[::-1])[::-1]
    run = nxt0 - p
    Lhat = np.where(cand, 4 + run, 0).astype(np.int64)
    Lhat = np.minimum(Lhat, np.maximum(n - p, 0))
    # isolated-copy skip on the estimate
    Lp4 = np.concatenate([Lhat[4:], np.zeros(4, np.int64)])
    isolated = (Lhat == 4) & (off > 2047) & (Lp4 < 4)
    cand = cand & ~isolated
    off = np.where(cand, off, 0)
    Lhat = np.where(cand, Lhat, 0)
    # skip hops over the final candidate set
    zc = np.where(cand, p, S)
    nxtc = np.minimum.accumulate(zc[::-1])[::-1]
    return cand, off, Lhat, nxtc


def walk(block, n, cand, off, Lhat, nxtc, seg=SEG):
    """The lockstep kernel's control flow, one segment at a time.

    Returns (ops, stats). ops = (kind, a, b): kind 0 literal [a, b);
    kind 1 copy (offset a, length b), already <= boundary.

    Records only COPIES (pos, off, len): literal spans are the gaps
    between consecutive copies, derived globally at emission — which
    merges literal runs across segment boundaries for free (the
    per-segment literal break cost +0.58% on fireworks.jpeg).
    """
    copies = []
    max_ops_seg = max_steps_seg = max_ext_seg = 0
    nseg = -(-n // seg)
    for s in range(nseg):
        lo, hi = s * seg, min((s + 1) * seg, n)
        p = lo
        n_ops = n_steps = n_ext = 0
        while p < hi:
            n_steps += 1
            if not cand[p]:
                nx = int(nxtc[p])
                p = nx if nx < hi else hi
                continue
            if hi - p < 4:
                p = hi  # too close to the boundary for a copy: literal tail
                continue
            o = int(off[p])
            q = p - o
            lp = int(min(Lhat[p], hi - p))
            # repair extension (chain breaks only)
            while p + lp < hi and block[p + lp] == block[q + lp]:
                lp += 1
                n_ext += 1
            copies.append((p, o, lp))
            n_ops += 1
            p += lp
        max_ops_seg = max(max_ops_seg, n_ops)
        max_steps_seg = max(max_steps_seg, n_steps)
        max_ext_seg = max(max_ext_seg, n_ext)
    # Literal spans from copy gaps (position order; cross-boundary runs
    # merge automatically).
    ops = []
    next_emit = 0
    for pos, o, lp in copies:
        if pos > next_emit:
            ops.append((0, next_emit, pos))
        ops.append((1, o, lp))
        next_emit = pos + lp
    if next_emit < n:
        ops.append((0, next_emit, n))
    return ops, (max_ops_seg, max_steps_seg, max_ext_seg)


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


def main() -> int:
    from bench import CORPUS
    from snappy_tpu import native, raw
    from snappy_tpu.format.varint import write_varu64
    from snappy_tpu.ops.packing import blocks_of

    enc_ref = raw.Encoder(engine="native")
    out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()), "per_file": []}
    tot = tot_ref = 0
    bad = 0
    over = []
    gstats = [0, 0, 0]
    for name in CORPUS:
        data = open(os.path.join(HERE, "data", name), "rb").read()
        blocks, lens = blocks_of(data)
        sz = 0
        ref_sz = 0
        for i in range(blocks.shape[0]):
            blk = blocks[i]
            n = int(lens[i])
            if n < 16:  # MIN_NON_LITERAL: single literal
                ops = [(0, 0, n)]
                stats = (1, 1, 0)
            else:
                cand, off, Lhat, nxtc = prepass(blk, n)
                ops, stats = walk(blk, n, cand, off, Lhat, nxtc)
            body = emit(blk, ops)
            sz += len(body)
            gstats = [max(g, s) for g, s in zip(gstats, stats)]
            stream = write_varu64(n) + body
            if native.decompress(stream) != blk[:n].tobytes():
                bad += 1
            ref_sz += len(enc_ref.compress_vec(blk[:n].tobytes())) - len(
                write_varu64(n)
            )
        row = {
            "file": name, "bytes": sz, "ref_bytes": ref_sz,
            "vs_ref": round(sz / ref_sz, 4),
        }
        if sz > ref_sz:
            over.append(name)
        out["per_file"].append(row)
        tot += sz
        tot_ref += ref_sz
        print(row, flush=True)
    out["total_vs_ref"] = round(tot / tot_ref, 4)
    out["roundtrip_failures"] = bad
    out["files_over_reference"] = over
    out["max_ops_per_segment"] = gstats[0]
    out["max_steps_per_segment"] = gstats[1]
    out["max_ext_rounds_per_segment"] = gstats[2]
    out["seg"] = SEG
    print(json.dumps({k: out[k] for k in (
        "total_vs_ref", "roundtrip_failures", "files_over_reference",
        "max_ops_per_segment", "max_steps_per_segment",
        "max_ext_rounds_per_segment")}), flush=True)
    with open(os.path.join(HERE, "GREEDY2_PROTO.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
