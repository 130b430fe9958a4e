#!/usr/bin/env python
"""Prototype: gather-free match lengths for the fast encoder.

The fast encoder's match-extension gather loop is its TPU bottleneck
(ENCODE_PROFILE.json: 1.19 s of 1.9). This prototype replaces it with
a chain-consistency estimate built from shifts and scans only:

    c(p)   = [prev(p+1) == prev(p) + 1]
    L(p)  >= 4 + run_length_of_ones(c, p)

The estimate underestimates exactly when a nearer occurrence of a
later gram interrupts the chain, so emitted copies remain valid; the
question this prototype answers is the RATIO cost on real data and
whether the size-<=-reference contract would survive. Runs the full
fast-encode pipeline with the estimator swapped in, round-trips every
block through the oracle, and compares compressed sizes per corpus
file against the production fast profile and the reference encoder.
Writes CHAINLEN_PROTO.json.
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

    if os.environ.get("CL_TPU", "0") != "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.constants import MIN_NON_LITERAL_BLOCK_SIZE
    from snappy_tpu.ops import encode_fast as ef
    from snappy_tpu.ops.encode import MAX_OPS, S, serialize_ops

    def match_lengths_chain(u32, prev, n):
        """Gather-free lower bound on match lengths (shifts/scans only)."""
        bsz = u32.shape[0]
        p = jnp.arange(S, dtype=jnp.int32)[None, :]
        nxt_prev = jnp.concatenate(
            [prev[:, 1:], jnp.full((bsz, 1), -1, jnp.int32)], axis=1
        )
        c = (prev >= 0) & (nxt_prev == prev + 1)
        # run[p] = index of first position q >= p with ~c(q), minus p.
        z = jnp.where(c, jnp.int32(S), p)
        nxt0 = jax.lax.cummin(z[:, ::-1], axis=1)[:, ::-1]
        run = nxt0 - p
        length = jnp.where(prev >= 0, 4 + run, 0)
        length = jnp.minimum(length, jnp.minimum(ef._MAX_COPY, n[:, None] - p))
        return jnp.where((prev >= 0) & (length >= 4), length, 0)

    @jax.jit
    def compress_chain(blocks, lengths):
        bsz = blocks.shape[0]
        n = lengths.astype(jnp.int32)
        p = jnp.arange(S, dtype=jnp.int32)[None, :]
        u32 = ef._u32_at(blocks)
        prev = ef._prev_occurrence(u32, n)
        length = match_lengths_chain(u32, prev, n)
        tiny = n < MIN_NON_LITERAL_BLOCK_SIZE
        length = jnp.where(tiny[:, None], 0, length)
        nxt_len = jnp.concatenate(
            [length[:, 1:], jnp.zeros((bsz, 1), length.dtype)], axis=1
        )
        offs = p - jnp.maximum(prev, 0)
        len_p4 = jnp.concatenate(
            [length[:, 4:], jnp.zeros((bsz, 4), length.dtype)], axis=1
        )
        isolated = (length == 4) & (offs > 2047) & (len_p4 < 4)
        eligible = (length >= 4) & ~isolated & ~(nxt_len > length)
        live = p < n[:, None]
        step = jnp.where(eligible, length, 1)
        nxt = jnp.where(live, jnp.minimum(p + step, S), p)
        nxt = jnp.concatenate([nxt, jnp.full((bsz, 1), S, jnp.int32)], axis=1)
        mark = ef._orbit(nxt, max(1, (S - 1).bit_length()))[:, :S] & live
        is_copy = mark & eligible
        is_lit = mark & ~eligible
        prev_lit = jnp.concatenate(
            [jnp.zeros((bsz, 1), bool), is_lit[:, :-1]], axis=1
        )
        lit_start = is_lit & ~prev_lit
        copy_pos = jnp.where(is_copy, p, jnp.int32(S))
        nxt_copy = jax.lax.cummin(copy_pos[:, ::-1], axis=1)[:, ::-1]
        run_end = jnp.minimum(nxt_copy, n[:, None])
        record = is_copy | lit_start
        opnum = jnp.cumsum(record.astype(jnp.int32), axis=1) - record.astype(
            jnp.int32
        )
        nops = jnp.sum(record.astype(jnp.int32), axis=1)
        kind_v = jnp.where(is_copy, 1, 0)
        a_v = jnp.where(is_copy, p - prev, p)
        b_v = jnp.where(is_copy, length, run_end)
        tgt = jnp.where(
            record, jnp.minimum(opnum, MAX_OPS - 1), jnp.int32(MAX_OPS)
        )

        def scat_ops(vals):
            buf = jnp.zeros((bsz, MAX_OPS + 1), jnp.int32)
            buf = jax.vmap(lambda bu, t, v: bu.at[t].set(v, mode="drop"))(
                buf, tgt, vals
            )
            return buf[:, :MAX_OPS]

        return serialize_ops(
            blocks, scat_ops(kind_v), scat_ops(a_v), scat_ops(b_v), nops
        )

    from bench import CORPUS, _load_corpus_blocks

    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "per_file": [],
    }
    data_dir = os.path.join(HERE, "data")
    from snappy_tpu.ops.packing import blocks_of
    from snappy_tpu import raw

    enc_ref = raw.Encoder(engine="native")
    tot_chain = tot_fast = tot_ref = 0
    bad = 0
    for name in CORPUS:
        data = open(os.path.join(data_dir, name), "rb").read()
        blocks, lens = blocks_of(data)
        o, ol = compress_chain(jnp.asarray(blocks), jnp.asarray(lens))
        o, ol = np.asarray(o), np.asarray(ol)
        of, olf = ef.compress_blocks_fast_host(blocks, lens)
        chain_sz = int(ol.sum())
        fast_sz = int(olf.sum())
        ref_sz = sum(
            len(enc_ref.compress_vec(blocks[i, : lens[i]].tobytes())) - 1
            for i in range(blocks.shape[0])
        )  # -1 drops each block's 1-5B varint; close enough per-file
        # validity: every block round-trips through the oracle
        for i in range(blocks.shape[0]):
            from snappy_tpu.format.varint import write_varu64

            stream = write_varu64(int(lens[i])) + o[i, : ol[i]].tobytes()
            got = ref.decompress(stream)
            if got != blocks[i, : lens[i]].tobytes():
                bad += 1
        out["per_file"].append(
            {
                "file": name,
                "chain_bytes": chain_sz,
                "fast_bytes": fast_sz,
                "ref_bytes_approx": ref_sz,
                "chain_vs_fast": round(chain_sz / fast_sz, 4),
                "chain_vs_ref": round(chain_sz / ref_sz, 4),
            }
        )
        tot_chain += chain_sz
        tot_fast += fast_sz
        tot_ref += ref_sz
        print(out["per_file"][-1], flush=True)
    out["total_chain_vs_fast"] = round(tot_chain / tot_fast, 4)
    out["total_chain_vs_ref"] = round(tot_chain / tot_ref, 4)
    out["roundtrip_failures"] = bad
    print(
        f"chain/fast {out['total_chain_vs_fast']}, chain/ref "
        f"{out['total_chain_vs_ref']}, roundtrip failures {bad}",
        flush=True,
    )
    with open(os.path.join(HERE, "CHAINLEN_PROTO.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
