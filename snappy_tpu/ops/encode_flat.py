"""XLA side of the flat device encoder: prepass, record math, emission.

Pipeline per 64 KiB block (design + measured costs in R4_NOTES.md):

1. **Prepass** (this module, pure vector XLA): u32 grams; exact
   nearest-previous-occurrence via two 2-key sorts (the XLA scatter the
   old `_prev_occurrence` used measures 400 us/block on TPU — two sorts
   measure 129 us, ENCODE_FLAT_PROBE.json); candidate set with the
   isolated-copy rule on the chain-consistency length estimate; packed
   per-position jump words in segment layout.
2. **Parse** (``pallas/encode_flat.py``): 128 lockstep segment walks
   per block -> copy records.
3. **Emission**: record-size algebra here (closed-form reference
   68/64/60 copy splitting, literal headers with cross-segment run
   merging), byte materialization through windowed one-hot gather
   kernels (decode-v2 machinery).

Reference behavior matched: greedy parse of ``src/compress.rs:195-317``
(same valid-Snappy output contract, compressed size <= the reference's
on every corpus file per GREEDY2_PROTO.json), emission byte rules of
``src/compress.rs:323-357`` (copy splitting) and ``:432-474`` (literal
headers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import MIN_NON_LITERAL_BLOCK_SIZE
from .encode import S
from .pallas.encode_flat import JW_CAND, LANES, MAX_REC, SEG

NSEG = S // SEG  # 128


def _u32_grams(blocks):
    b = blocks.astype(jnp.uint32)
    z = jnp.zeros((b.shape[0], 8), jnp.uint32)
    bp = jnp.concatenate([b, z], axis=1)
    return (
        bp[:, :S]
        | (bp[:, 1 : S + 1] << np.uint32(8))
        | (bp[:, 2 : S + 2] << np.uint32(16))
        | (bp[:, 3 : S + 3] << np.uint32(24))
    )


def _prev_two_sorts(u32, n):
    """Nearest previous same-u32 position (-1 if none), scatter-free.

    Sort (key, position) 2-key; the previous same-key neighbor in
    sorted order is the candidate; a second sort keyed by position
    applies the inverse permutation (129 us/block at B=64 on chip vs
    452 us for the scatter formulation, ENCODE_FLAT_PROBE/SORT_COST)."""
    bsz = u32.shape[0]
    p = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = p <= (n[:, None] - 4)
    key = jnp.where(valid, u32, np.uint32(0xFFFFFFFF))
    idx = jnp.broadcast_to(p, (bsz, S)).astype(jnp.int32)
    skey, sidx = jax.lax.sort((key, idx), dimension=1, num_keys=2)
    same = jnp.concatenate(
        [jnp.zeros((bsz, 1), bool), skey[:, 1:] == skey[:, :-1]], axis=1
    )
    cand = jnp.concatenate(
        [jnp.full((bsz, 1), -1, jnp.int32), sidx[:, :-1]], axis=1
    )
    cand = jnp.where(same, cand, -1)
    _, prev = jax.lax.sort((sidx, cand), dimension=1, num_keys=1)
    return jnp.where(valid, prev, -1)


def _seg_layout(x):
    """(B, S) position-major -> (B, 128, SEG): row = segment (sublane
    orientation; Mosaic has lane broadcasts but not sublane ones)."""
    b = x.shape[0]
    return x.reshape(b, NSEG, SEG)


def prepass(blocks, lengths):
    """Vector prepass: returns kernel inputs (jw, u32seg, planes).

    ``jw``/``u32seg``: ``(B, 128, SEG)`` int32 segment layout.
    ``planes``: ``(B, 4*512, 128)`` bf16 — four byte-shifted copies of
    the block in absolute (row = pos>>7) layout for the extension
    gather (bytes are bf16-exact).
    """
    bsz = blocks.shape[0]
    n = lengths.astype(jnp.int32)
    p = jnp.arange(S, dtype=jnp.int32)[None, :]
    u32 = _u32_grams(blocks)
    prev = _prev_two_sorts(u32, n)

    usable = n[:, None] >= MIN_NON_LITERAL_BLOCK_SIZE
    cand = (prev >= 0) & usable
    off = jnp.where(cand, p - prev, 0)

    # chain-consistency estimate (a guaranteed lower length bound)
    nxt_prev = jnp.concatenate(
        [prev[:, 1:], jnp.full((bsz, 1), -1, jnp.int32)], axis=1
    )
    nxt_cand = jnp.concatenate([cand[:, 1:], jnp.zeros((bsz, 1), bool)], axis=1)
    c = cand & nxt_cand & (nxt_prev == prev + 1)
    z = jnp.where(c, jnp.int32(S), p)
    nxt0 = jax.lax.cummin(z[:, ::-1], axis=1)[:, ::-1]
    lhat = jnp.where(cand, 4 + (nxt0 - p), 0)
    lhat = jnp.minimum(lhat, jnp.maximum(n[:, None] - p, 0))

    # isolated-copy skip on the estimate (the fast profile's cost-model
    # rule; fixes fireworks.jpeg, GREEDY2_PROTO.json)
    lp4 = jnp.concatenate([lhat[:, 4:], jnp.zeros((bsz, 4), jnp.int32)], axis=1)
    iso = (lhat == 4) & (off > 2047) & (lp4 < 4)
    cand = cand & ~iso

    # segment-boundary exclusion: a copy needs >= 4 bytes before the
    # forced boundary
    seg_end = jnp.minimum((p // SEG + 1) * SEG, n[:, None])
    cand = cand & (seg_end - p >= 4)
    off = jnp.where(cand, off, 0)
    lhatc = jnp.where(cand, jnp.minimum(lhat, seg_end - p), 0)

    # skip hops over the final candidate set, segment-relative
    zc = jnp.where(cand, p, jnp.int32(S))
    nxtc = jax.lax.cummin(zc[:, ::-1], axis=1)[:, ::-1]
    seg_base = (p // SEG) * SEG
    rel = jnp.clip(nxtc - seg_base, 0, SEG)

    jw = jnp.where(cand, off | (lhatc << 16) | JW_CAND, rel)

    planes = []
    zpad = jnp.zeros((bsz, 4), blocks.dtype)
    wide = jnp.concatenate([blocks, zpad], axis=1)
    for k in range(4):
        planes.append(wide[:, k : k + S].reshape(bsz, 512, 128))
    planes = jnp.concatenate(planes, axis=1).astype(jnp.bfloat16)

    return _seg_layout(jw), _seg_layout(u32.astype(jnp.int32)), planes


OUT_W = 76800  # >= max_compress_len(65536); matches ops.encode.OUT_W


def _exclusive_cummax(x):
    z = jnp.zeros((x.shape[0], 1), x.dtype)
    return jax.lax.cummax(jnp.concatenate([z, x[:, :-1]], axis=1), axis=1)


def records_to_bytes(blocks, lengths, rec0, rec1, cnt):
    """Records -> raw op-stream bytes, fully vectorized (no scatter).

    Implements the reference's emission rules: literal headers
    (``src/compress.rs:432-474``; 1-3 bytes by length), copy splitting
    (``src/compress.rs:323-357``: 64-byte peels while len >= 68, a
    60-peel for 65..67, copy1 for short near copies). Literal spans are
    the gaps between copies — derived globally, so runs merge across
    segment boundaries.

    The per-output-byte covering record comes from a sort-based merge
    expansion (record starts + output positions share one sort; a
    cummax labels each output with the last record at-or-before it; a
    second sort returns outputs to position order). Everything else is
    closed-form vector math; the only gather is the literal-content
    ``take_along_axis``.

    Returns ``(out (B, OUT_W) uint8, out_len (B,) int32)``.
    """
    bsz = blocks.shape[0]
    n = lengths.astype(jnp.int32)
    nr = NSEG * MAX_REC

    seg = jnp.arange(NSEG, dtype=jnp.int32)[None, :, None]
    pos = (rec0 & 0x3FF) + seg * SEG
    ln = rec0 >> 10
    off = rec1
    kix = jnp.arange(MAX_REC, dtype=jnp.int32)[None, None, :]
    valid = kix < cnt[:, :, 0:1]
    pos = pos.reshape(bsz, nr)
    ln = jnp.where(valid, ln, 0).reshape(bsz, nr)
    off = off.reshape(bsz, nr)
    valid = valid.reshape(bsz, nr)

    end = jnp.where(valid, pos + ln, 0)
    prev_end = _exclusive_cummax(end)
    lit_len = jnp.where(valid, pos - prev_end, 0)
    llm1 = lit_len - 1
    lh = jnp.where(
        lit_len == 0, 0, jnp.where(llm1 <= 59, 1, jnp.where(llm1 < 256, 2, 3))
    )
    n64 = jnp.where(ln >= 68, (ln - 68) // 64 + 1, 0)
    rem1 = ln - 64 * n64
    peel60 = (rem1 > 64).astype(jnp.int32)
    rem = rem1 - 60 * peel60
    use_c1 = (rem <= 11) & (off <= 2047)
    csize = 3 * n64 + 3 * peel60 + jnp.where(use_c1, 2, 3)
    rsize = jnp.where(valid, lh + lit_len + csize, 0)
    ends_out = jnp.cumsum(rsize, axis=1)
    starts = ends_out - rsize
    body_total = ends_out[:, -1]

    # tail literal after the last copy
    total_end = jnp.max(end, axis=1)
    tl = jnp.maximum(n - total_end, 0)
    tlm1 = tl - 1
    th = jnp.where(tl == 0, 0, jnp.where(tlm1 <= 59, 1, jnp.where(tlm1 < 256, 2, 3)))
    out_len = body_total + th + tl

    # --- cover expansion: two 1-key sorts over the 95K-element merge ---
    d_iota = jnp.arange(OUT_W, dtype=jnp.int32)[None, :]
    rkey = jnp.where(valid, starts * 2, jnp.int32(2 * OUT_W + 2))
    key = jnp.concatenate([rkey, jnp.broadcast_to(d_iota * 2 + 1, (bsz, OUT_W))], axis=1)
    ridx = jnp.broadcast_to(jnp.arange(nr, dtype=jnp.int32)[None, :], (bsz, nr))
    pay = jnp.concatenate([ridx, jnp.full((bsz, OUT_W), -1, jnp.int32)], axis=1)
    sk, sp = jax.lax.sort((key, pay), dimension=1, num_keys=1)
    cover_m = jax.lax.cummax(jnp.where(sp >= 0, sp, -1), axis=1)
    okey = jnp.where(sk & 1 == 1, sk >> 1, jnp.int32(OUT_W + 1))
    _, cover = jax.lax.sort((okey, cover_m), dimension=1, num_keys=1)
    cover = jnp.clip(cover[:, :OUT_W], 0, nr - 1)

    def g(arr):
        return jnp.take_along_axis(arr, cover, axis=1)

    c_start = g(starts)
    c_pos = g(pos)
    c_ln = g(ln)
    c_off = g(off)
    c_litlen = g(lit_len)
    rel = d_iota - c_start
    c_llm1 = c_litlen - 1
    c_lh = jnp.where(
        c_litlen == 0, 0,
        jnp.where(c_llm1 <= 59, 1, jnp.where(c_llm1 < 256, 2, 3)),
    )

    # literal header bytes
    lit_h0 = jnp.where(
        c_llm1 <= 59, c_llm1 << 2, jnp.where(c_lh == 2, 60 << 2, 61 << 2)
    )
    lit_hdr = jnp.where(
        rel == 0, lit_h0, jnp.where(rel == 1, c_llm1 & 0xFF, (c_llm1 >> 8) & 0xFF)
    )

    # copy bytes
    c_n64 = jnp.where(c_ln >= 68, (c_ln - 68) // 64 + 1, 0)
    c_rem1 = c_ln - 64 * c_n64
    c_p60 = (c_rem1 > 64).astype(jnp.int32)
    c_rem = c_rem1 - 60 * c_p60
    c_uc1 = (c_rem <= 11) & (c_off <= 2047)
    u = rel - c_lh - c_litlen
    j3 = u % 3
    in64 = u < 3 * c_n64
    in60 = ~in64 & (u < 3 * (c_n64 + c_p60))
    t_rel = u - 3 * (c_n64 + c_p60)
    sub_len = jnp.where(in64, 64, jnp.where(in60, 60, c_rem))
    copy_byte = jnp.where(
        in64 | in60,
        jnp.where(j3 == 0, ((sub_len - 1) << 2) | 2,
                  jnp.where(j3 == 1, c_off & 0xFF, c_off >> 8)),
        jnp.where(
            c_uc1,
            jnp.where(t_rel == 0,
                      ((c_off >> 8) << 5) | ((c_rem - 4) << 2) | 1,
                      c_off & 0xFF),
            jnp.where(t_rel == 0, ((c_rem - 1) << 2) | 2,
                      jnp.where(t_rel == 1, c_off & 0xFF, c_off >> 8)),
        ),
    )

    # literal content (the single gather): source = pos - lit_len + (rel - lh)
    is_content = (rel >= c_lh) & (rel < c_lh + c_litlen)
    src_idx = jnp.clip(c_pos - c_litlen + (rel - c_lh), 0, S - 1)

    # tail literal (block-level scalars broadcast)
    bt = body_total[:, None]
    t_tlm1 = (tl - 1)[:, None]
    t_th = th[:, None]
    t_h0 = jnp.where(
        t_tlm1 <= 59, t_tlm1 << 2, jnp.where(t_th == 2, 60 << 2, 61 << 2)
    )
    trel = d_iota - bt
    tail_hdr = jnp.where(
        trel == 0, t_h0,
        jnp.where(trel == 1, t_tlm1 & 0xFF, (t_tlm1 >> 8) & 0xFF),
    )
    in_tail_hdr = (trel >= 0) & (trel < t_th)
    in_tail_ct = (trel >= t_th) & (d_iota < out_len[:, None])
    tail_src = jnp.clip(total_end[:, None] + (trel - t_th), 0, S - 1)

    src_idx = jnp.where(in_tail_ct, tail_src, src_idx)
    content = jnp.take_along_axis(blocks.astype(jnp.int32), src_idx, axis=1)

    byte = jnp.where(rel < c_lh, lit_hdr, jnp.where(is_content, content, copy_byte))
    byte = jnp.where(in_tail_hdr, tail_hdr, byte)
    byte = jnp.where(in_tail_ct, content, byte)
    byte = jnp.where(d_iota < out_len[:, None], byte, 0)
    return byte.astype(jnp.uint8), out_len


@partial(jax.jit, static_argnames=("interpret",))
def _compress_blocks_flat(blocks, lengths, interpret):
    from .pallas.encode_flat import _parse_blocks_pallas

    n = lengths.astype(jnp.int32)
    jw, u32seg, planes = prepass(blocks, n)
    rec0, rec1, cnt = _parse_blocks_pallas(n, jw, u32seg, planes, interpret)
    out, out_len = records_to_bytes(blocks, n, rec0, rec1, cnt)
    overflow = jnp.max(cnt[:, :, 1], axis=1)
    return out, out_len, overflow


def compress_blocks_flat(blocks, lengths, interpret: bool | None = None):
    """Flat device fast-compress of a ``(B, 65536)`` block batch.

    Returns ``(out (B, OUT_W) uint8, out_len (B,) int32, overflow (B,)
    int32)`` — valid raw Snappy per block, compressed size <= the
    reference encoder's on every corpus file (GREEDY2_PROTO.json).
    ``overflow[b] != 0`` flags a block whose crafted content exceeded
    the per-segment record budget (route it to another engine; never
    observed on real data).
    """
    import jax as _jax

    if interpret is None:
        interpret = _jax.default_backend() != "tpu"
    return _compress_blocks_flat(blocks, lengths, bool(interpret))


# --- fast emission path ----------------------------------------------------
#
# records_to_bytes above is the *reference* emission (bit-exact, pure
# XLA) but its sort+take_along_axis expansion measures 4.4 ms/block on
# chip (ENCODE_FLAT_BENCH.json; TPU take_along_axis alone is ~10 ns per
# element, EMIT_PROBE.json). The fast path replaces it with:
#
#   1. this closed-form breakpoint plan (pure vector math, no gather):
#      output byte index = d + shift(d), where shift is a step function
#      with <= 3 breakpoints per record (literal header start, literal
#      content start, copy header start) + 2 for the tail literal.
#      Invalid record slots collapse to zero-width steps at the next
#      record's start (their cumsum-carried `starts` equal it), keeping
#      the flattened breakpoint sequence sorted by construction;
#   2. a Pallas kernel that evaluates the step sum per 1024-byte output
#      group against a windowed breakpoint slice (bounded by the wire
#      format: >= 2 output bytes and <= 3 breakpoints per record);
#   3. a Pallas windowed one-hot gather (decode-v2 machinery) that
#      materializes bytes from a virtual source = [block bytes; header
#      plane], where the header plane holds each record's <= 30 header
#      bytes at a fixed 32-byte pitch (closed-form vector math).

HDR_PITCH = 32
NREC2 = NSEG * MAX_REC + 8  # +1 tail slot, padded to a row multiple
HDR_ROWS = NREC2 * HDR_PITCH // LANES  # 4610 -> padded below
HDR_BASE = S  # header plane sits after the src block in virtual space
NBP = 3 * NREC2  # 55,344 -> pad to row multiple
NBP_PAD = -(-NBP // LANES) * LANES
OUT_ROWS = OUT_W // LANES  # 600
#: output groups of 1024 bytes, padded to the kernels' 640-row grid;
#: groups past OUT_W exist only as padding (masked by out_len)
N_GROUPS = 80
N_GROUPS_REAL = 75
BP_WIN_ROWS = 14  # see pallas.encode_flat.BP_WIN_ROWS (wire-format bound)


def _record_fields(lengths, rec0, rec1, cnt):
    """Shared record algebra: positions, sizes, output starts."""
    bsz = rec0.shape[0]
    n = lengths.astype(jnp.int32)
    nr = NSEG * MAX_REC
    seg = jnp.arange(NSEG, dtype=jnp.int32)[None, :, None]
    pos = (rec0 & 0x3FF) + seg * SEG
    ln = rec0 >> 10
    kix = jnp.arange(MAX_REC, dtype=jnp.int32)[None, None, :]
    valid = kix < cnt[:, :, 0:1]
    pos = pos.reshape(bsz, nr)
    ln = jnp.where(valid, ln, 0).reshape(bsz, nr)
    off = rec1.reshape(bsz, nr)
    valid = valid.reshape(bsz, nr)
    # per-segment valid counts, clamped to the slot capacity (overflow
    # blocks are flagged and re-routed by the caller; the clamp keeps
    # the rank permutation well-defined on them)
    cnt0 = jnp.minimum(cnt[:, :, 0], jnp.int32(MAX_REC))

    end = jnp.where(valid, pos + ln, 0)
    prev_end = _exclusive_cummax(end)
    lit_len = jnp.where(valid, pos - prev_end, 0)
    llm1 = lit_len - 1
    lh = jnp.where(
        lit_len == 0, 0, jnp.where(llm1 <= 59, 1, jnp.where(llm1 < 256, 2, 3))
    )
    n64 = jnp.where(ln >= 68, (ln - 68) // 64 + 1, 0)
    rem1 = ln - 64 * n64
    peel60 = (rem1 > 64).astype(jnp.int32)
    rem = rem1 - 60 * peel60
    use_c1 = (rem <= 11) & (off <= 2047)
    csize = 3 * n64 + 3 * peel60 + jnp.where(use_c1, 2, 3)
    rsize = jnp.where(valid, lh + lit_len + csize, 0)
    ends_out = jnp.cumsum(rsize, axis=1)
    starts = ends_out - rsize
    body_total = ends_out[:, -1]
    total_end = jnp.max(end, axis=1)
    tl = jnp.maximum(n - total_end, 0)
    tlm1 = tl - 1
    th = jnp.where(tl == 0, 0, jnp.where(tlm1 <= 59, 1, jnp.where(tlm1 < 256, 2, 3)))
    out_len = body_total + th + tl
    return dict(
        n=n, nr=nr, valid=valid, pos=pos, ln=ln, off=off, lit_len=lit_len,
        lh=lh, n64=n64, peel60=peel60, rem=rem, use_c1=use_c1, csize=csize,
        starts=starts, body_total=body_total, total_end=total_end, tl=tl,
        th=th, out_len=out_len, cnt=cnt0,
    )


def _rank_perm(cnt0, nr):
    """Slot index of each rank (rank -> slot), from per-segment counts.

    Valid records form a per-segment slot prefix (``valid = kix <
    cnt``), so the rank-compaction permutation the old 5-operand
    18K-slot sort computed is a pure function of the 128 per-segment
    counts: rank ``r`` lives in the first segment ``s`` whose inclusive
    count-cumsum exceeds ``r``, at in-segment offset ``r - cumsum_excl
    [s]``. Both lookups are count-below reductions over the 128
    segment boundaries, chunked over the rank axis like
    :func:`_breakpoints`; compaction of the record fields is then four
    gathers. The sort this replaces measured ~315 us/block on chip
    (~86% of the emission plan, R5_NOTES); gathers measure ~2.2x an
    elementwise pass per element (TPU_PRIMS.json).

    Returns ``(slot (B, nr) int32 clamped in-bounds, ok (B, nr) bool
    rank < nvalid)``.
    """
    bsz = cnt0.shape[0]
    cum = jnp.cumsum(cnt0, axis=1)  # inclusive, (B, NSEG)
    ch = min(nr, max(1024, (1 << 27) // max(1, bsz * NSEG)))
    nch = -(-nr // ch)
    r = jnp.arange(nch * ch, dtype=jnp.int32).reshape(nch, ch)

    def chunk(_, rc):
        ind = cum[:, None, :] <= rc[None, :, None]  # (B, ch, NSEG)
        s_of_r = jnp.sum(ind.astype(jnp.int32), axis=2)
        excl = jnp.sum(jnp.where(ind, cnt0[:, None, :], 0), axis=2)
        return None, (s_of_r, excl)

    _, (s_of_r, excl) = jax.lax.scan(chunk, None, r)
    s_of_r = jnp.moveaxis(s_of_r, 0, 1).reshape(bsz, nch * ch)[:, :nr]
    excl = jnp.moveaxis(excl, 0, 1).reshape(bsz, nch * ch)[:, :nr]
    rr = jnp.arange(nr, dtype=jnp.int32)[None, :]
    slot = jnp.clip(s_of_r, 0, NSEG - 1) * MAX_REC + (rr - excl)
    ok = rr < cum[:, -1:]
    return jnp.where(ok, jnp.clip(slot, 0, nr - 1), 0), ok


def _hdr_plane(f):
    """(B, HDR_ROWS_PAD, 128) bf16 header plane at 32-byte pitch, in
    RANK space (valid records compacted to the front).

    Rank-compaction keeps consecutive records' header cells adjacent,
    so a 1024-byte output tile's header reads span <= 129 plane rows
    (<= 512 records x 32 B pitch) — the wire-format bound that lets the
    emit kernel use one narrow header window per tile. Compaction is a
    3-operand sort of the 18K record slots by (valid ? slot : BIG)
    (~tens of us; scatter would cost 400+).

    Record slot cells hold [literal header (lh bytes) | copy bytes
    (csize bytes)]; the cell at rank nvalid holds the tail literal
    header. Everything else is vector math over (B, NREC2, 32)."""
    bsz = f["valid"].shape[0]
    nr = f["nr"]
    v = f["valid"]
    # Rank compaction: sort ONLY the raw record triple (pos, off, ln —
    # two packed operands) and recompute every derived field in rank
    # space with cumsum/cummax + elementwise math. The old formulation
    # sorted 5 operands (~315 us/block, 86% of the emission plan); sort
    # cost is ~linear in operand volume (R5_NOTES), so 3 operands saves
    # ~40%. A gather-based compaction (counts-based permutation, exact:
    # tools/rank_perm_check.py) measured WORSE — native 18K-element
    # gathers cost ~140 us/block each on this chip (RANK_AB.json) — so
    # the sort stays the permutation engine.
    slot = jnp.broadcast_to(
        jnp.arange(nr, dtype=jnp.int32)[None, :], (bsz, nr)
    )
    key = jnp.where(v, slot, jnp.int32(nr + 1))
    packed = jnp.where(
        v,
        f["pos"].astype(jnp.uint32)
        | (f["off"].astype(jnp.uint32) << np.uint32(16)),
        np.uint32(0),
    )
    lnv = jnp.where(v, f["ln"], 0)
    _, packed_r, ln_r = jax.lax.sort(
        (key, packed, lnv), dimension=1, num_keys=1
    )
    nvalid_r = jnp.sum(v.astype(jnp.int32), axis=1, keepdims=True)
    vr = jnp.arange(nr, dtype=jnp.int32)[None, :] < nvalid_r
    pos_r = jnp.where(vr, (packed_r & np.uint32(0xFFFF)).astype(jnp.int32), 0)
    off_r = jnp.where(vr, (packed_r >> np.uint32(16)).astype(jnp.int32), 0)
    ln_r = jnp.where(vr, ln_r, 0)

    # derived fields, rank space (same math as _record_fields over the
    # same records in the same order, so values match the old sorted
    # slot-space fields exactly on every valid rank)
    end_r = jnp.where(vr, pos_r + ln_r, 0)
    prev_end_r = _exclusive_cummax(end_r)
    lit_len_r = jnp.where(vr, pos_r - prev_end_r, 0)
    llm1_r = lit_len_r - 1
    lh_r = jnp.where(
        lit_len_r == 0, 0,
        jnp.where(llm1_r <= 59, 1, jnp.where(llm1_r < 256, 2, 3)),
    )
    n64_r = jnp.where(ln_r >= 68, (ln_r - 68) // 64 + 1, 0)
    rem1_r = ln_r - 64 * n64_r
    peel60_r = (rem1_r > 64).astype(jnp.int32)
    rem_r = rem1_r - 60 * peel60_r
    use_c1_r = (rem_r <= 11) & (off_r <= 2047)
    csize_r = 3 * n64_r + 3 * peel60_r + jnp.where(use_c1_r, 2, 3)
    rsize_r = jnp.where(vr, lh_r + lit_len_r + csize_r, 0)
    starts_r = jnp.cumsum(rsize_r, axis=1) - rsize_r

    p1s = (
        off_r
        | (rem_r << 16)
        | (n64_r << 23)
        | (peel60_r << 27)
        | (use_c1_r.astype(jnp.int32) << 28)
    )
    p2s = lit_len_r | (lh_r << 17)
    f["rank_starts"] = starts_r
    f["rank_pos"] = pos_r
    f["rank_litlen"] = lit_len_r
    f["rank_lh"] = lh_r
    return _hdr_plane_tail(f, p1s, p2s)


def _hdr_plane_tail(f, p1s, p2s):
    """Cell math shared by the compaction formulations (tools/rank_ab)."""
    bsz = f["valid"].shape[0]
    nr = f["nr"]
    v = f["valid"]

    def pad2(x):
        ext = jnp.zeros((bsz, NREC2 - nr), jnp.int32)
        return jnp.concatenate([x.astype(jnp.int32), ext], axis=1)[:, :, None]

    p1s = pad2(p1s)
    p2s = pad2(p2s)
    off = p1s & 0xFFFF
    rem = (p1s >> 16) & 0x7F
    n64 = (p1s >> 23) & 0xF
    p60 = (p1s >> 27) & 1
    uc1 = (p1s >> 28) & 1
    lit_len = p2s & 0x1FFFF
    lh = p2s >> 17

    # tail cell at rank nvalid: a pure literal header
    nvalid = jnp.sum(v.astype(jnp.int32), axis=1)
    six = jnp.arange(NREC2, dtype=jnp.int32)[None, :, None]
    is_tail = six == nvalid[:, None, None]
    lit_len = jnp.where(is_tail, f["tl"][:, None, None], lit_len)
    lh = jnp.where(is_tail, f["th"][:, None, None], lh)
    n64 = jnp.where(is_tail, 0, n64)
    p60 = jnp.where(is_tail, 0, p60)
    rem = jnp.where(is_tail, 0, rem)
    uc1 = jnp.where(is_tail, 0, uc1)

    t = jnp.arange(HDR_PITCH, dtype=jnp.int32)[None, None, :]
    llm1 = lit_len - 1
    lit_h0 = jnp.where(llm1 <= 59, llm1 << 2, jnp.where(lh == 2, 60 << 2, 61 << 2))
    lit_b = jnp.where(
        t == 0, lit_h0, jnp.where(t == 1, llm1 & 0xFF, (llm1 >> 8) & 0xFF)
    )
    u = t - lh
    j3 = u % 3
    in64 = u < 3 * n64
    in60 = ~in64 & (u < 3 * (n64 + p60))
    t_rel = u - 3 * (n64 + p60)
    sub_len = jnp.where(in64, 64, jnp.where(in60, 60, rem))
    copy_b = jnp.where(
        in64 | in60,
        jnp.where(j3 == 0, ((sub_len - 1) << 2) | 2,
                  jnp.where(j3 == 1, off & 0xFF, off >> 8)),
        jnp.where(
            uc1 != 0,
            jnp.where(t_rel == 0, ((off >> 8) << 5) | ((rem - 4) << 2) | 1,
                      off & 0xFF),
            jnp.where(t_rel == 0, ((rem - 1) << 2) | 2,
                      jnp.where(t_rel == 1, off & 0xFF, off >> 8)),
        ),
    )
    cell = jnp.where(t < lh, lit_b, copy_b) & 0xFF
    rows = -(-HDR_ROWS // 8) * 8
    plane = cell.reshape(bsz, NREC2 * HDR_PITCH // LANES, LANES)
    pad = rows - plane.shape[1]
    if pad:
        plane = jnp.concatenate(
            [plane, jnp.zeros((bsz, pad, LANES), jnp.int32)], axis=1
        )
    return plane.astype(jnp.bfloat16)


def _breakpoints(f):
    """Flattened sorted (bp, delta) step plan for shift(d), rank space.

    Built from the rank-compacted record fields (_hdr_plane's sort must
    run first): per rank r three steps — bp1 = start (shift -> header
    cell), bp2 = start + lh (shift -> literal source), bp3 = start +
    lh + lit_len (shift -> copy header bytes) — then the tail literal's
    two steps at rank nvalid, then sentinel pads past OUT_W (their
    deltas never apply: no output position reaches the sentinel).
    Deltas telescope from the previous step's shift value, so the
    windowed step sum needs no ordering fixups."""
    bsz = f["valid"].shape[0]
    nr = f["nr"]
    nvalid = jnp.sum(f["valid"].astype(jnp.int32), axis=1, keepdims=True)
    rankix = jnp.arange(nr, dtype=jnp.int32)[None, :]
    vr = rankix < nvalid
    starts = f["rank_starts"]
    pos = f["rank_pos"]
    litlen = jnp.where(vr, f["rank_litlen"], 0)
    lh = jnp.where(vr, f["rank_lh"], 0)
    hpos = HDR_BASE + rankix * HDR_PITCH

    s1 = hpos - starts
    s2 = (pos - litlen) - starts - lh
    s3 = hpos - starts - litlen
    bp1 = starts
    bp2 = starts + lh
    bp3 = bp2 + litlen

    # tail literal at rank nvalid; pads follow at the sentinel
    bt = f["body_total"][:, None]
    tpos = HDR_BASE + nvalid * HDR_PITCH
    is_tail = rankix == nvalid
    big = jnp.int32(OUT_W + 1)
    bp1 = jnp.where(is_tail, bt, jnp.where(vr, bp1, big))
    bp2 = jnp.where(is_tail, bt + f["th"][:, None], jnp.where(vr, bp2, big))
    bp3 = jnp.where(vr, bp3, big)
    s1 = jnp.where(is_tail, tpos - bt, jnp.where(vr, s1, 0))
    s2 = jnp.where(
        is_tail, f["total_end"][:, None] - bt - f["th"][:, None],
        jnp.where(vr, s2, 0),
    )
    s3 = jnp.where(vr, s3, jnp.where(is_tail, s2, 0))

    bp = jnp.stack([bp1, bp2, bp3], axis=2).reshape(bsz, 3 * nr)
    sv = jnp.stack([s1, s2, s3], axis=2).reshape(bsz, 3 * nr)
    padn = NBP_PAD - bp.shape[1]
    bp = jnp.concatenate([bp, jnp.full((bsz, padn), big, jnp.int32)], axis=1)
    sv = jnp.concatenate([sv, jnp.zeros((bsz, padn), jnp.int32)], axis=1)
    prev = jnp.concatenate([jnp.zeros((bsz, 1), jnp.int32), sv[:, :-1]], axis=1)
    dlt = sv - prev

    # per-group window rows + prefix base
    cum = jnp.cumsum(dlt, axis=1)
    # Count-below at the N_GROUPS+1 group boundaries (all multiples of
    # 1024), chunked over the breakpoint axis so the compare
    # intermediate stays bounded (~2^27 elements) instead of relying on
    # XLA to fuse a (bsz, N_GROUPS, NBP_PAD) broadcast at large
    # blocks_per_launch. cnt[:, g] == #(bp < 1024*g); the old per-
    # threshold sums are its slices.
    bounds = (jnp.arange(N_GROUPS + 1, dtype=jnp.int32) * 1024)[None, None, :]
    ch = max(512, (1 << 27) // max(1, bsz * (N_GROUPS + 1)))
    nch = -(-bp.shape[1] // ch)
    bp_pad = jnp.concatenate(
        [bp, jnp.full((bsz, nch * ch - bp.shape[1]), big, jnp.int32)], axis=1
    ).reshape(bsz, nch, ch)

    def _count_chunk(acc, chunk):
        return acc + jnp.sum(
            (chunk[:, :, None] < bounds).astype(jnp.int32), axis=1
        ), None

    cnt_below, _ = jax.lax.scan(
        _count_chunk,
        jnp.zeros((bsz, N_GROUPS + 1), jnp.int32),
        jnp.swapaxes(bp_pad, 0, 1),
    )
    below = cnt_below[:, :N_GROUPS]
    lo_row = below >> 7  # window starts at a row boundary
    base = jnp.take_along_axis(
        jnp.concatenate([jnp.zeros((bsz, 1), jnp.int32), cum], axis=1),
        lo_row * LANES, axis=1,
    )
    below_end = cnt_below[:, 1:]  # #(bp < 1024*(g+1))
    rows_g = jnp.clip(
        (below_end - lo_row * LANES + LANES - 1) >> 7, 0, BP_WIN_ROWS
    )
    over_g = below_end - lo_row * LANES > BP_WIN_ROWS * LANES
    overflow = jnp.max(
        over_g[:, :N_GROUPS_REAL].astype(jnp.int32), axis=1
    )
    return bp, dlt, lo_row, base, rows_g, overflow


def _v2_permute(x, d_pad: int):
    """jnp version of pallas.decode.flat_v2_permute (device-side)."""
    b = x.shape[0]
    g = d_pad // 16384
    return x.reshape(b, g, 16, 8, LANES).transpose(0, 1, 4, 2, 3).reshape(
        b, d_pad
    )


def records_to_bytes_fast(blocks, lengths, rec0, rec1, cnt,
                          interpret: bool = False):
    """Fast emission: breakpoint plan + Pallas shift/gather kernels.

    Bit-exact with :func:`records_to_bytes` (pinned by tests); returns
    ``(out (B, OUT_W) uint8, out_len, overflow)`` where ``overflow``
    additionally flags blocks whose breakpoint density exceeded the
    per-group window (crafted input; route those to the slow path)."""
    from .pallas.encode_flat import (
        OUT_ROWS_PAD, emit_bytes_pallas, shift_idx_pallas,
    )

    bsz = blocks.shape[0]
    f = _record_fields(lengths, rec0, rec1, cnt)
    plane = _hdr_plane(f)
    bp, dlt, lo_row, base, rows_g, ovf_bp = _breakpoints(f)
    bp_rows = bp.reshape(bsz, NBP_PAD // LANES, LANES)
    dlt_rows = dlt.reshape(bsz, NBP_PAD // LANES, LANES)
    idx = shift_idx_pallas(
        lo_row, base, rows_g, f["out_len"], bp_rows, dlt_rows,
        interpret=interpret,
    )

    # per-tile header window base (stack rows; content needs none: its
    # window is the whole 512-row block)
    rowa = idx >> 7
    d_pos = jnp.arange(OUT_ROWS_PAD * LANES, dtype=jnp.int32).reshape(
        1, OUT_ROWS_PAD, LANES
    )
    live = d_pos < f["out_len"][:, None, None]
    hrow = jnp.where(
        (idx >= HDR_BASE) & live, rowa, jnp.int32(1 << 20)
    )
    hmin = jnp.min(hrow.reshape(bsz, OUT_ROWS_PAD // 8, 8 * LANES), axis=2)
    stack_rows = 512 + plane.shape[1]
    hdr_w = 256
    # Shipped as an 8-row-group index: Mosaic must statically prove the
    # dynamic window start is sublane-aligned, so the kernel multiplies
    # by 8 itself. The window has >= 120 rows of slack for the align-down.
    hbase = jnp.clip((hmin >> 3) << 3, 512, stack_rows - hdr_w) >> 3

    stack = jnp.concatenate(
        [blocks.reshape(bsz, 512, LANES).astype(jnp.bfloat16), plane], axis=1
    )
    idx_perm = _v2_permute(
        idx.reshape(bsz, OUT_ROWS_PAD * LANES), OUT_ROWS_PAD * LANES
    ).reshape(bsz, OUT_ROWS_PAD, LANES)
    out = emit_bytes_pallas(
        hbase, f["out_len"], stack, idx_perm, hdr_w=hdr_w,
        interpret=interpret,
    )
    return out[:, :OUT_W], f["out_len"], ovf_bp


@partial(jax.jit, static_argnames=("interpret",))
def _compress_blocks_flat_split(blocks, lengths, interpret):
    """Split-pipeline variant (separate shift + gather emission
    launches). The production profile is ``_compress_blocks_flat_fused``
    below; this one is kept for A/B measurement tooling."""
    from .pallas.encode_flat import _parse_blocks_pallas

    n = lengths.astype(jnp.int32)
    jw, u32seg, planes = prepass(blocks, n)
    rec0, rec1, cnt = _parse_blocks_pallas(n, jw, u32seg, planes, interpret)
    out, out_len, ovf_bp = records_to_bytes_fast(
        blocks, n, rec0, rec1, cnt, interpret=interpret
    )
    overflow = jnp.maximum(jnp.max(cnt[:, :, 1], axis=1), ovf_bp)
    return out, out_len, overflow


def compress_blocks_flat_fast(blocks, lengths, interpret: bool | None = None):
    """Fast-emission flat compress; same contract as compress_blocks_flat.

    Routes through the FUSED emission kernel (breakpoints -> bytes in
    one launch). The overflow flag is defensively wired but unreachable
    on any input: copies are >= 4 bytes apart so a 512-byte segment
    holds at most 128 records (< MAX_REC = 144), and the breakpoint
    window is sized to the wire-format worst case (BP_WIN_ROWS).
    """
    import jax as _jax

    if interpret is None:
        interpret = _jax.default_backend() != "tpu"
    return _compress_blocks_flat_fused(blocks, lengths, bool(interpret))


def compress_blocks_flat_host(blocks, lengths):
    """Host-facing wrapper: (out, out_len) with automatic fallback.

    Routes any overflow-flagged block (unreachable in practice, see
    above) through the XLA fast profile so callers always get valid
    streams."""
    out, out_len, ovf = compress_blocks_flat_fast(
        jnp.asarray(blocks), jnp.asarray(lengths)
    )
    out = np.asarray(out)
    out_len = np.asarray(out_len)
    ovf = np.asarray(ovf)
    if ovf.any():  # pragma: no cover - defensive
        from .encode_fast import compress_blocks_fast_host

        fout, flen = compress_blocks_fast_host(
            np.asarray(blocks), np.asarray(lengths)
        )
        bad = ovf != 0
        out = np.array(out)
        out_len = np.array(out_len)
        out[bad, : fout.shape[1]] = fout[bad]
        out_len[bad] = flen[bad]
    return out, out_len


def _fused_plan(blocks, lengths, rec0, rec1, cnt):
    """Emission plan for the fused kernel: all per-tile window metadata
    plus the breakpoint rows and the [content | header] stack. Shared
    by :func:`records_to_bytes_fused` and the A/B measurement tooling
    (tools/fused_emit_ab.py). A slot-space/rank4 variant that deleted
    the 5-operand rank-compaction sort measured a wash on chip (the
    replacement 2-operand sort runs over the 3x-wider breakpoint axis;
    R5_NOTES) and was reverted — this is the rank-space production
    plan."""
    bsz = blocks.shape[0]
    f = _record_fields(lengths, rec0, rec1, cnt)
    plane = _hdr_plane(f)
    bp, dlt, lo_row, base, rows_g, ovf_bp = _breakpoints(f)
    bp_rows = bp.reshape(bsz, NBP_PAD // LANES, LANES)
    dlt_rows = dlt.reshape(bsz, NBP_PAD // LANES, LANES)

    # closed-form per-tile header window base: the record covering the
    # tile's first output byte has rank (#valid records with start <=
    # d0) - 1; all header reads in the tile sit within <= 513 ranks
    # (<= 129 plane rows) of its cell
    nvalid = jnp.sum(f["valid"].astype(jnp.int32), axis=1)
    d0 = (jnp.arange(N_GROUPS, dtype=jnp.int32) * 1024)[None, :, None]
    d0e = d0 + 1024
    cnt_le = jnp.sum(
        (f["valid"][:, None, :]
         & (f["starts"][:, None, :] < d0)).astype(jnp.int32),
        axis=2,
    )
    cnt_le_end = jnp.sum(
        (f["valid"][:, None, :]
         & (f["starts"][:, None, :] < d0e)).astype(jnp.int32),
        axis=2,
    )
    rank0 = jnp.clip(cnt_le - 1, 0, nvalid[:, None])
    row_first = 512 + ((rank0 * HDR_PITCH) >> 7)
    stack_rows = 512 + plane.shape[1]
    hdr_w = 256
    hb8 = jnp.clip(row_first >> 3, 64, (stack_rows - hdr_w) >> 3)

    # per-tile CONTENT window: conservative source-span bounds from the
    # covering records (literal content sources at its original block
    # position, so a tile's sources sit between the first covering
    # record's literal start and the last covering record's position)
    # plus the tail literal's range; tiles whose bound fits 256 rows
    # take the narrow bucket (~95% on the corpus).
    def g80(arr, ranks):
        return jnp.take_along_axis(arr, ranks, axis=1)

    rank1 = jnp.clip(cnt_le_end - 1, 0, jnp.maximum(nvalid[:, None] - 1, 0))
    rank0c = jnp.clip(rank0, 0, jnp.maximum(nvalid[:, None] - 1, 0))
    rec_lo = g80(f["rank_pos"] - f["rank_litlen"], rank0c)
    rec_hi = g80(f["rank_pos"], rank1)
    has_rec = nvalid[:, None] > 0
    big = jnp.int32(1 << 20)
    rec_lo = jnp.where(has_rec, rec_lo, big)
    rec_hi = jnp.where(has_rec, rec_hi, -1)
    bt = f["body_total"][:, None]
    th = f["th"][:, None]
    te = f["total_end"][:, None]
    n_ = f["n"][:, None]
    tile_s = d0[:, :, 0]
    tile_e = jnp.minimum(d0e[:, :, 0], f["out_len"][:, None])
    tail_touch = tile_e > bt
    tail_lo = jnp.where(tail_touch, te + jnp.maximum(tile_s - bt - th, 0), big)
    tail_hi = jnp.where(tail_touch, jnp.minimum(n_, te + (tile_e - bt - th)), -1)
    cmin = jnp.clip(jnp.minimum(rec_lo, tail_lo), 0, S - 1)
    cmax = jnp.clip(jnp.maximum(rec_hi, tail_hi), 0, S - 1)
    cmin_row = (cmin >> 7) & ~7
    cmax_row = cmax >> 7
    narrow_ok = (cmax_row - cmin_row) < 256
    cb8 = jnp.where(narrow_ok, jnp.clip(cmin_row >> 3, 0, (512 - 256) >> 3), 0)
    cbk = jnp.where(narrow_ok, 0, 1).astype(jnp.int32)

    stack = jnp.concatenate(
        [blocks.reshape(bsz, 512, LANES).astype(jnp.bfloat16), plane], axis=1
    )
    return (lo_row, base, rows_g, hb8, cb8, cbk, f["out_len"], bp_rows,
            dlt_rows, stack, hdr_w, ovf_bp)


def records_to_bytes_fused(blocks, lengths, rec0, rec1, cnt,
                           interpret: bool = False):
    """Fused fast emission: breakpoints -> bytes in one Pallas kernel.

    Bit-exact with :func:`records_to_bytes` (pinned by tests). Saves
    the idx HBM round-trip, the v2 permute, and a kernel launch vs
    :func:`records_to_bytes_fast`; the per-tile header window base is
    closed-form from valid-record counts (the covering record's rank),
    so no idx-dependent reduce is needed."""
    from .pallas.encode_flat import fused_emit_pallas

    (lo_row, base, rows_g, hb8, cb8, cbk, out_len, bp_rows, dlt_rows,
     stack, hdr_w, ovf_bp) = _fused_plan(blocks, lengths, rec0, rec1, cnt)
    out = fused_emit_pallas(
        lo_row, base, rows_g, hb8, cb8, cbk, out_len, bp_rows,
        dlt_rows, stack, hdr_w=hdr_w, interpret=interpret,
    )
    return out[:, :OUT_W], out_len, ovf_bp


@partial(jax.jit, static_argnames=("interpret",))
def _compress_blocks_flat_fused(blocks, lengths, interpret):
    from .pallas.encode_flat import _parse_blocks_pallas

    n = lengths.astype(jnp.int32)
    jw, u32seg, planes = prepass(blocks, n)
    rec0, rec1, cnt = _parse_blocks_pallas(n, jw, u32seg, planes, interpret)
    out, out_len, ovf_bp = records_to_bytes_fused(
        blocks, n, rec0, rec1, cnt, interpret=interpret
    )
    overflow = jnp.maximum(jnp.max(cnt[:, :, 1], axis=1), ovf_bp)
    return out, out_len, overflow
