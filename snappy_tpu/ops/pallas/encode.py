"""Pallas TPU raw-block encoder: the exact greedy automaton in VMEM.

SURVEY §7 step 4's kernel: one grid cell per 64 KiB block, the block
staged in VMEM, the reference's greedy hash-probe automaton
(``src/compress.rs:195-317``) walked on the scalar core with its exact
probe sequence — skip schedule, table sizing, double-update after a
copy — so output bytes are bit-identical to the reference (the golden
contract). The walk's byte/u32/table reads live in SMEM (the scalar
memory — Mosaic has no scalar VMEM access); vector units carry the bulk
work: match extension compares 128-byte windows per step (vs the
reference's 8), and literal payloads move through the same two-row
rotated window engine as the Pallas decoder.

Semantics are lifted from the (golden-tested) batched automaton in
``ops/encode.py:find_ops`` / the reference emission rules
(``src/compress.rs:323-357`` copy splitting, ``:432-474`` literal
headers, ``:491-518`` table sizing); differential tests assert byte
equality against the NumPy oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...format.constants import (
    HASH_MULTIPLIER,
    INPUT_MARGIN,
    MIN_NON_LITERAL_BLOCK_SIZE,
)
from .decode import LANES, _bulk_move, _rot_read  # shared window movers

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except Exception:  # pragma: no cover
    _PALLAS = False

#: Output row budget per block: >= max_compress_len(65536) = 76490.
OUT_ROWS = 600  # 600 * 128 = 76800

_SCAN = 0
_EXTEND = 1
_TBL_ROWS = 128  # 128 * 128 = 16384 = max table entries


def _make_kernel(s_rows: int):
    s_cap = s_rows * LANES

    def kernel(len_ref, src_ref, srcsm_ref, out_ref, outlen_ref, srcw_ref, tbl_ref, outw_ref):
        # Scalar vectors ride SMEM unblocked, indexed by program_id
        # (per-cell (1,) blocks fail real Mosaic lowering; see
        # pallas/decode.py). The automaton's byte/u32 reads come from
        # ``srcsm_ref``, the block's int32 SMEM copy: Mosaic has no
        # scalar loads from VMEM, and SMEM is the scalar memory.
        i = pl.program_id(0)
        n = len_ref[i]
        srcw_ref[:] = src_ref[0].astype(jnp.int32)

        # Zero the (SMEM) hash table: scalar memory takes no vector
        # stores, so this is a scalar loop — 16 Ki stores per block,
        # ~25% of the automaton's own step count.
        def zero_tbl(t, _):
            tbl_ref[t] = 0
            return _

        jax.lax.fori_loop(0, _TBL_ROWS * LANES, zero_tbl, None)

        def byte_at(p):
            # Zero-fill past the block capacity (matches the zero-pad
            # contract the shifted-u32 precompute used to provide).
            v = srcsm_ref[jnp.clip(p, 0, s_cap - 1)]
            return jnp.where(p < s_cap, v, 0)

        def u32at(p):
            return (
                byte_at(p).astype(jnp.uint32)
                | (byte_at(p + 1).astype(jnp.uint32) << np.uint32(8))
                | (byte_at(p + 2).astype(jnp.uint32) << np.uint32(16))
                | (byte_at(p + 3).astype(jnp.uint32) << np.uint32(24))
            ).astype(jnp.int32)

        # Table sizing (src/compress.rs:491-518): bits = clip(ceil_log2(n), 8, 14).
        nm1 = jnp.maximum(n - 1, 1)
        ceil_log2 = 32 - jax.lax.clz(nm1.astype(jnp.uint32)).astype(jnp.int32)
        bits = jnp.clip(ceil_log2, 8, 14)
        shift_amt = (32 - bits).astype(jnp.uint32)

        def hash_(x):
            h = (x.astype(jnp.uint32) * np.uint32(HASH_MULTIPLIER)) >> shift_amt
            return h.astype(jnp.int32)

        def emit_byte(d, v):
            # Masked row read-modify-write: Mosaic cannot store scalars
            # to VMEM, so one header byte costs one 128-lane RMW (a few
            # per op; bulk payloads go through _bulk_move).
            row = d // LANES
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            cur = outw_ref[pl.ds(row, 1), :]
            outw_ref[pl.ds(row, 1), :] = jnp.where(lane == d % LANES, v, cur)
            return d + 1

        def emit_literal(d, start, end):
            """Literal header + content for src range [start, end)."""
            ll = end - start
            lenm1 = ll - 1

            def hdr1(d):
                return emit_byte(d, lenm1 << 2)

            def hdr2(d):
                d = emit_byte(d, (60 << 2))
                return emit_byte(d, lenm1)

            def hdr3(d):
                d = emit_byte(d, (61 << 2))
                d = emit_byte(d, lenm1 & 0xFF)
                return emit_byte(d, (lenm1 >> 8) & 0xFF)

            d = jax.lax.cond(
                lenm1 < 60, hdr1, lambda dd: jax.lax.cond(lenm1 < 256, hdr2, hdr3, dd), d
            )
            _bulk_move(outw_ref, srcw_ref, d, start, ll, OUT_ROWS, s_rows)
            return d + ll

        def emit_copy2(d, offset, length):
            d = emit_byte(d, ((length - 1) << 2) | 2)
            d = emit_byte(d, offset & 0xFF)
            return emit_byte(d, (offset >> 8) & 0xFF)

        def emit_copy(d, offset, length):
            """Copy splitting per src/compress.rs:323-357."""

            def peel(st):
                d, ln = st
                return emit_copy2(d, offset, 64), ln - 64

            d, length = jax.lax.while_loop(lambda st: st[1] >= 68, peel, (d, length))

            def peel60(st):
                d, ln = st
                return emit_copy2(d, offset, 60), ln - 60

            d, length = jax.lax.cond(
                length > 64, peel60, lambda st: st, (d, length)
            )

            def copy1(st):
                d, ln = st
                d = emit_byte(d, ((offset >> 8) << 5) | ((ln - 4) << 2) | 1)
                return emit_byte(d, offset & 0xFF)

            def copy2(st):
                d, ln = st
                return emit_copy2(d, offset, ln)

            use1 = (length <= 11) & (offset <= 2047)
            return jax.lax.cond(use1, copy1, copy2, (d, length))

        def small_block(_):
            return jax.lax.cond(
                n > 0, lambda d: emit_literal(d, 0, n), lambda d: d, jnp.int32(0)
            )

        def automaton(_):
            s_limit = n - INPUT_MARGIN

            # State: (mode, s_next, skip, next_emit, next_hash, base,
            #         es, ec, cand, d, done)
            init = (
                jnp.int32(_SCAN),
                jnp.int32(1),
                jnp.int32(32),
                jnp.int32(0),
                hash_(u32at(jnp.int32(1))),
                jnp.int32(0),
                jnp.int32(0),
                jnp.int32(0),
                jnp.int32(0),
                jnp.int32(0),
                jnp.bool_(False),
            )

            def scan_step(st):
                mode, s_next, skip, next_emit, next_hash, base, es, ec, cand, d, done = st
                s = s_next
                bb = skip >> 5
                s_next2 = s + bb
                skip2 = skip + bb
                out_of_input = s_next2 > s_limit

                def finish(_):
                    dd = jax.lax.cond(
                        next_emit < n,
                        lambda x: emit_literal(x, next_emit, n),
                        lambda x: x,
                        d,
                    )
                    return (
                        mode, s_next2, skip2, n, next_hash, base, es, ec, cand,
                        dd, jnp.bool_(True),
                    )

                def probe(_):
                    c = tbl_ref[next_hash]
                    tbl_ref[next_hash] = s
                    nh = hash_(u32at(s_next2))
                    matched = u32at(s) == u32at(c)

                    def on_match(_):
                        dd = jax.lax.cond(
                            s > next_emit,
                            lambda x: emit_literal(x, next_emit, s),
                            lambda x: x,
                            d,
                        )
                        return (
                            jnp.int32(_EXTEND), s_next2, skip2, next_emit, nh,
                            s, s + 4, c + 4, c, dd, jnp.bool_(False),
                        )

                    def no_match(_):
                        return (
                            mode, s_next2, skip2, next_emit, nh, base, es, ec,
                            c, d, jnp.bool_(False),
                        )

                    return jax.lax.cond(matched, on_match, no_match, None)

                return jax.lax.cond(out_of_input, finish, probe, None)

            def extend_step(st):
                mode, s_next, skip, next_emit, next_hash, base, es, ec, cand, d, done = st
                # 128-byte window compare (the reference walks 8 bytes at a
                # time; only the final match length is observable).
                wa = _rot_read(srcw_ref, es // LANES, es % LANES, s_rows)
                wb = _rot_read(srcw_ref, ec // LANES, ec % LANES, s_rows)
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                first = jnp.min(jnp.where(wa != wb, lane, jnp.int32(LANES)))
                rem = n - es
                ext = jnp.minimum(first, rem)
                es2 = es + ext
                ec2 = ec + ext
                finished = (first < LANES) | (ext < first)

                def keep_going(_):
                    return (
                        mode, s_next, skip, next_emit, next_hash, base, es2,
                        ec2, cand, d, done,
                    )

                def emit_and_continue(_):
                    offset = base - cand
                    clen = es2 - base
                    dd = emit_copy(d, offset, clen)
                    s = es2

                    def hit_limit(_):
                        ddd = jax.lax.cond(
                            s < n, lambda x: emit_literal(x, s, n), lambda x: x, dd
                        )
                        return (
                            jnp.int32(_SCAN), s_next, skip, n, next_hash, base,
                            es2, ec2, cand, ddd, jnp.bool_(True),
                        )

                    def post_copy(_):
                        # Double table update from one position pair
                        # (src/compress.rs:285-313).
                        h1 = hash_(u32at(s - 1))
                        tbl_ref[h1] = s - 1
                        cur = u32at(s)
                        ch = hash_(cur)
                        c2 = tbl_ref[ch]
                        tbl_ref[ch] = s
                        again = cur == u32at(c2)

                        def go_again(_):
                            return (
                                jnp.int32(_EXTEND), s_next, skip, s, next_hash,
                                s, s + 4, c2 + 4, c2, dd, jnp.bool_(False),
                            )

                        def back_to_scan(_):
                            return (
                                jnp.int32(_SCAN), s + 1, jnp.int32(32), s,
                                hash_(u32at(s + 1)), base, es2, ec2, c2, dd,
                                jnp.bool_(False),
                            )

                        return jax.lax.cond(again, go_again, back_to_scan, None)

                    return jax.lax.cond(s >= s_limit, hit_limit, post_copy, None)

                return jax.lax.cond(finished, emit_and_continue, keep_going, None)

            def body(st):
                return jax.lax.cond(st[0] == _SCAN, scan_step, extend_step, st)

            st = jax.lax.while_loop(lambda st: ~st[10], body, init)
            return st[9]

        d = jax.lax.cond(n < MIN_NON_LITERAL_BLOCK_SIZE, small_block, automaton, None)
        outlen_ref[i] = d
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, LANES), 1)
        )
        out_ref[0] = jnp.where(pos < d, outw_ref[:], 0).astype(jnp.uint8)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def compress_blocks_pallas(blocks, lengths, interpret: bool | None = None):
    """Pallas twin of :func:`snappy_tpu.ops.encode.compress_blocks`.

    ``blocks``: ``(B, S)`` uint8 zero-padded (S a multiple of 128);
    returns ``(out (B, 76800) uint8, out_len (B,) int32)`` — per-block
    raw op streams, byte-identical to the reference encoder. Manually
    selected twin; lowers and runs byte-correct on real TPU hardware
    (``BENCH_TPU_VALIDATE.json``); ``interpret`` defaults to the
    backend's native mode (compiled on TPU, interpreter elsewhere).
    """
    if not _PALLAS:
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s = blocks.shape
    assert s % LANES == 0
    s_rows = s // LANES

    # Rank-1 SMEM blocks must be multiples of the (1024,) SMEM tiling.
    s_sm = -(-s // 1024) * 1024

    kernel = _make_kernel(s_rows)
    out, out_len = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, s_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((s_sm,), lambda i: (i,), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, OUT_ROWS, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, OUT_ROWS, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((b,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((s_rows, LANES), jnp.int32),
            pltpu.SMEM((_TBL_ROWS * LANES,), jnp.int32),
            pltpu.VMEM((OUT_ROWS, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        blocks.reshape(b, s_rows, LANES),
        jnp.pad(blocks.astype(jnp.int32), ((0, 0), (0, s_sm - s))).reshape(b * s_sm),
    )
    return out.reshape(b, OUT_ROWS * LANES), out_len
