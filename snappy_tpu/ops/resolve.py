"""Device-side copy-chain resolution from validated op records.

The flat-gather decode (``ops/pallas/decode.py``) needs a per-byte
literal-origin index: ``out[d] = src[idx[d]]``. Through round 4 that
index came from the *host* C++ flatten pass
(``native.flatten_idx_batch``), an O(decoded bytes) sequential walk at
~0.3 GB/s/core — the measured bottleneck of the production decode
(FLATTEN_SCALE_r04.json: a 4-core host feeds <1 chip).

This module moves the chain resolution **onto the device**. The host
contributes only the O(records) validated op scan
(``native.scan_records_batch``, ~72 us/block/core vs the flatten's
~157): one packed (len, payload) int32 pair per op, ~100x smaller than
the byte stream. Everything per-byte happens on the TPU:

1. ``records_to_pointers`` (XLA): records -> per-byte first-hop
   pointer plane A0. No per-byte gathers: the covering record's fields
   broadcast to bytes via two scatter+running-max passes whose packed
   keys are monotone in the (strictly increasing) record starts. A
   byte's first hop is then elementwise arithmetic:
   literal -> FLAG | (content + j)   (resolved: absolute src index)
   copy    -> start - off + (j mod off)   (an earlier output position;
              ``j mod off`` handles overlapping copies, whose period is
              the offset — mirrors /root/reference/src/decompress.rs:281-326)
2. Chain resolution: pointer jumping until every byte carries FLAG.
   The corpus measures chains to depth 1108 (CHAIN_DEPTH_r05.json), so
   per-byte Jacobi doubling needs <= ceil(log2(d_pad)) rounds; the
   Pallas kernel (``pallas/resolve.py``) instead walks tiles
   left-to-right **in place**, which resolves every cross-tile pointer
   against already-final territory in one windowed MXU gather and only
   iterates on intra-tile chains (cheap 8-row windows).
   ``resolve_reference`` here is the slow XLA oracle for tests.
3. ``idx_to_v2_inputs`` (XLA): resolved absolute indices -> the v2
   flat kernel's (tile_meta, permuted uint16 idx) contract, replicating
   the C++ flatten's window/bucket selection bit-for-bit
   (core.cpp stpu_flatten_idx tail), then the existing
   ``decode_flat_pallas_v2`` gather emits bytes.

Validation contract: the host record scan already mirrors device
validation (same checks, order, and error codes as the replay kernel),
so this route reproduces ``decode_batch``'s (bytes, err) behavior
exactly — records cover the valid prefix only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

#: Resolution flag: values >= FLAG are final absolute src indices
#: (biased by FLAG). Source indices fit 17 bits (src rows <= 76800
#: bytes < 2^17), so flagged values stay < 2^18 — exact in f32/bf16
#: matmul routing on the MXU.
FLAG = 1 << 17

_LANES = 128


@partial(jax.jit, static_argnames=("d_pad",))
def records_to_pointers(recs, nops, declens, d_pad: int):
    """Op records -> first-hop pointer plane + resolve-window metadata.

    ``recs``: (B, CAP, 2) int32 from ``native.scan_records_batch``
    (word0 = (1<<30)|len for literals / len for copies; word1 = content
    index / offset). Returns ``(A0 (B, d_pad) int32, rmeta (B,
    d_pad//1024, 2) int32)`` where ``A0[d]`` is FLAG|src_idx for
    resolved bytes or an earlier output position, and ``rmeta`` holds
    each 1024-byte tile's (window base row, bucket) for the Pallas
    resolve kernel's first-gather window over the A plane.
    """
    assert d_pad <= 1 << 16, (
        "resolve route packs positions in 16 bits (FLAG at 2^17); "
        f"d_pad={d_pad} unsupported — route larger outputs via the "
        "host flatten"
    )
    B, CAP, _ = recs.shape
    w0 = recs[:, :, 0]
    w1 = recs[:, :, 1]
    rid = jnp.arange(CAP, dtype=jnp.int32)
    valid = rid[None, :] < nops[:, None].astype(jnp.int32)
    islit = jnp.where(valid, (w0 >> 30) & 1, 0)
    ln = jnp.where(valid, w0 & 0x3FFFFFFF, 0)
    starts = jnp.cumsum(ln, axis=1) - ln  # exclusive prefix

    # Broadcast record fields to bytes: scatter packed words at each
    # record's dst start, then a running max. Keys are monotone because
    # starts strictly increase (every op produces >= 1 byte), so the
    # running max at byte d holds the covering record's word.
    payload = (islit << 17) | (w1 & 0x1FFFF)
    pos = jnp.where(valid & (ln > 0), starts, jnp.int32(d_pad))
    plo = (starts << 15) | (payload & 0x7FFF)  # starts<=65535 -> <2^31
    phi = (starts << 3) | (payload >> 15)
    bix = jnp.arange(B, dtype=jnp.int32)[:, None]
    zlo = (
        jnp.full((B, d_pad), -1, jnp.int32)
        .at[bix, pos]
        .max(plo, mode="drop")
    )
    zhi = (
        jnp.full((B, d_pad), -1, jnp.int32)
        .at[bix, pos]
        .max(phi, mode="drop")
    )
    zlo = jax.lax.cummax(zlo, axis=1)
    zhi = jax.lax.cummax(zhi, axis=1)

    d = jnp.arange(d_pad, dtype=jnp.int32)[None, :]
    start_d = zlo >> 15
    pay = ((zhi & 0x7) << 15) | (zlo & 0x7FFF)
    islit_d = pay >> 17
    w1_d = pay & 0x1FFFF
    j = d - start_d
    off = jnp.maximum(w1_d, 1)  # avoid /0 on literal rows
    jj = jnp.where(j < off, j, j % off)
    a_lit = FLAG + w1_d + j
    a_copy = start_d - off + jj
    live = d < declens[:, None].astype(jnp.int32)
    a0 = jnp.where(live, jnp.where(islit_d == 1, a_lit, a_copy), FLAG)

    # Per-tile resolve windows over the A plane: the first gather for
    # tile t reads positions in [min unresolved pointer, tile end).
    # Buckets {128, 256, 512} rows; 512 rows = the whole 64 KiB plane,
    # so a window always fits. Bases are 8-row aligned (Mosaic dynamic
    # row offsets must be provably 8-aligned).
    nt = d_pad // 1024
    av = a0.reshape(B, nt, 1024)
    unres = av < FLAG
    big = jnp.int32(d_pad)
    mn = jnp.min(jnp.where(unres, av, big), axis=2)
    has_un = jnp.any(unres, axis=2)
    mn = jnp.where(has_un, mn, (jnp.arange(nt, dtype=jnp.int32) * 1024)[None, :])
    # 16-row-aligned bases: the resolve kernel's digit-plane window
    # load is provably aligned at 16 (bf16-tiling granularity).
    min_row = (mn >> 7) & ~15
    tile_end_row = (jnp.arange(nt, dtype=jnp.int32)[None, :] + 1) * 8
    d_rows = d_pad // _LANES
    bucket = jnp.full((B, nt), 2, jnp.int32)
    base = jnp.zeros((B, nt), jnp.int32)
    for bi, w in ((1, 256), (0, 128)):
        cand = jnp.maximum(0, jnp.minimum(min_row, d_rows - w)) & ~15
        ok = tile_end_row - cand <= w
        bucket = jnp.where(ok, bi, bucket)
        base = jnp.where(ok, cand, base)
    wide_cand = jnp.maximum(0, jnp.minimum(min_row, d_rows - 512)) & ~15
    base = jnp.where(bucket == 2, wide_cand, base)
    rmeta = jnp.stack([base, bucket], axis=2)
    return a0, rmeta


#: Record-window geometry for the fused first-hop kernel: a 1024-byte
#: output tile's covering records span <= 1 (straddler) + 1024 (starts
#: within the tile) + 127 (window alignment slack) = 1152 slots — 9
#: rows of the starts plane, 72 rows of the 16-records-per-row pack.
_WIN_ST_ROWS = 9
_WIN_PK_ROWS = 72


@partial(jax.jit, static_argnames=("d_pad",))
def records_to_kernel_inputs(recs, nops, declens, d_pad: int):
    """Record-level prep for the FUSED first-hop resolve kernel.

    Unlike :func:`records_to_pointers` (whose per-byte scatter/cummax
    measures 296 us/block on chip — RESOLVE_BENCH_r05), everything here
    stays at record scale; the kernel builds each tile's first-hop
    pointers itself from windowed record planes.

    Returns ``(st_pln (B, CAP//128 + pad, 128) f32 — record starts,
    sentinel-padded; rec_pack (B, CAP//16 + pad, 128) f32 — 16 records
    per row at lanes (k%16)*8 + {0: start, 1: payload}; wlo (B, nt)
    int32 — 128-aligned first window record; nwin (B, nt) int32 —
    window rows of st_pln; rmeta (B, nt, 2) int32 — the round-gather
    window (base row, bucket) over the A plane)``.
    """
    assert d_pad <= 1 << 16
    B, CAP, _ = recs.shape
    w0 = recs[:, :, 0]
    w1 = recs[:, :, 1]
    rid = jnp.arange(CAP, dtype=jnp.int32)
    valid = rid[None, :] < nops[:, None].astype(jnp.int32)
    islit = jnp.where(valid, (w0 >> 30) & 1, 0)
    ln = jnp.where(valid, w0 & 0x3FFFFFFF, 0)
    starts = jnp.cumsum(ln, axis=1) - ln
    payload = (islit << 17) | (w1 & 0x1FFFF)
    # pads carry start = decoded-total (== declen for valid streams):
    # they never count as <= d for live bytes and never get selected.
    startsx = jnp.where(valid, starts, declens[:, None].astype(jnp.int32))

    stf = startsx.astype(jnp.float32)
    st_pln = stf.reshape(B, CAP // _LANES, _LANES)
    st_pln = jnp.concatenate(
        [st_pln, jnp.full((B, _WIN_ST_ROWS, _LANES), 1e9, jnp.float32)],
        axis=1,
    )
    cell = jnp.stack(
        [stf, payload.astype(jnp.float32)]
        + [jnp.zeros((B, CAP), jnp.float32)] * 6,
        axis=2,
    )  # (B, CAP, 8)
    rec_pack = cell.reshape(B, CAP // 16, _LANES)
    rec_pack = jnp.concatenate(
        [rec_pack, jnp.zeros((B, _WIN_PK_ROWS, _LANES), jnp.float32)],
        axis=1,
    )

    # Per-tile window + round-gather metadata, all at record scale.
    nt = d_pad // 1024
    t_start = (jnp.arange(nt, dtype=jnp.int32) * 1024)[None, :]
    t_end = t_start + 1024
    # chunked count/min over the record axis (bounded intermediates)
    ch = max(512, (1 << 27) // max(1, B * nt))
    nch = -(-CAP // ch)
    pad_n = nch * ch - CAP
    stp = jnp.concatenate(
        [startsx, jnp.full((B, pad_n), 1 << 30, jnp.int32)], axis=1
    ).reshape(B, nch, ch)
    # per-record min first-hop pointer (copies point at start - off)
    vmin_rec = jnp.where(
        valid & (islit == 0), starts - (w1 & 0x1FFFF), jnp.int32(1 << 30)
    )
    vmp = jnp.concatenate(
        [vmin_rec, jnp.full((B, pad_n), 1 << 30, jnp.int32)], axis=1
    ).reshape(B, nch, ch)

    def chunk(acc, xs):
        c0, c1, mn_in = acc
        st_c, vm_c = xs
        le0 = st_c[:, None, :] <= t_start[:, :, None]
        lt1 = st_c[:, None, :] < t_end[:, :, None]
        in_tile = lt1 & ~le0
        c0 = c0 + jnp.sum(le0.astype(jnp.int32), axis=2)
        c1 = c1 + jnp.sum(lt1.astype(jnp.int32), axis=2)
        mn_in = jnp.minimum(
            mn_in,
            jnp.min(
                jnp.where(in_tile, vm_c[:, None, :], jnp.int32(1 << 30)),
                axis=2,
            ),
        )
        return (c0, c1, mn_in), None

    (cnt0, cnt1, mn_in), _ = jax.lax.scan(
        chunk,
        (
            jnp.zeros((B, nt), jnp.int32),
            jnp.zeros((B, nt), jnp.int32),
            jnp.full((B, nt), 1 << 30, jnp.int32),
        ),
        (jnp.swapaxes(stp, 0, 1), jnp.swapaxes(vmp, 0, 1)),
    )
    wlo = jnp.clip(cnt0 - 1, 0, CAP - 1) & ~127
    nwin = jnp.clip(-(-(cnt1 - wlo) // _LANES), 1, _WIN_ST_ROWS)

    # straddler record's own pointer bound participates in the tile min
    cov = jnp.clip(cnt0 - 1, 0, CAP - 1)
    vm_cov = jnp.take_along_axis(vmin_rec, cov, axis=1)
    vm_cov = jnp.where(cnt0 > 0, vm_cov, jnp.int32(1 << 30))
    mn = jnp.minimum(mn_in, vm_cov)
    has_un = mn < (1 << 30)
    mn = jnp.clip(mn, 0, d_pad - 1)
    mn = jnp.where(has_un, mn, t_start)

    # round-gather windows over the A plane (same rules as
    # records_to_pointers: 16-aligned bases, buckets {128, 256, 512})
    min_row = (mn >> 7) & ~15
    tile_end_row = (jnp.arange(nt, dtype=jnp.int32)[None, :] + 1) * 8
    d_rows = d_pad // _LANES
    bucket = jnp.full((B, nt), 2, jnp.int32)
    base = jnp.zeros((B, nt), jnp.int32)
    for bi, w in ((1, 256), (0, 128)):
        cand = jnp.maximum(0, jnp.minimum(min_row, d_rows - w)) & ~15
        ok = tile_end_row - cand <= w
        bucket = jnp.where(ok, bi, bucket)
        base = jnp.where(ok, cand, base)
    wide_cand = jnp.maximum(0, jnp.minimum(min_row, d_rows - 512)) & ~15
    base = jnp.where(bucket == 2, wide_cand, base)
    rmeta = jnp.stack([base, bucket], axis=2)
    return st_pln, rec_pack, wlo, nwin, rmeta


def resolve_reference(a0, max_rounds: int | None = None):
    """Slow XLA pointer-doubling oracle (tests + no-Pallas fallback).

    Jacobi doubling: each round replaces every unresolved pointer with
    its target's current value. Converges in ceil(log2(max chain
    depth)) rounds; per-byte XLA gathers make it slow on TPU — the
    production path is the Pallas kernel.
    """
    d_pad = a0.shape[1]
    rounds = max_rounds or max(1, (d_pad - 1).bit_length())

    def body(st):
        a, _, r = st
        tgt = jnp.clip(a, 0, d_pad - 1)
        g = jnp.take_along_axis(a, tgt, axis=1)
        a2 = jnp.where(a >= FLAG, a, g)
        return a2, jnp.all(a2 >= FLAG), r + 1

    def cond(st):
        _, done, r = st
        return (~done) & (r < rounds)

    a, _, _ = jax.lax.while_loop(
        cond, body, (a0, jnp.bool_(False), jnp.int32(0))
    )
    return a


@partial(jax.jit, static_argnames=("d_pad", "s_rows"))
def idx_to_v2_inputs(a_resolved, declens, d_pad: int, s_rows: int):
    """Resolved A plane -> the v2 flat kernel's gather inputs.

    Replicates the C++ flatten's per-tile window selection
    (``stpu_flatten_idx`` tail in core.cpp): min/max of the tile's
    absolute indices, buckets {128, 256, 512} clamped to ``s_rows``,
    8-aligned bases, fallback flag when the spread exceeds the widest
    window (only possible when s_rows > 512). Returns ``(idx_phys
    (B, d_pad) uint16 in flat_v2_permute layout, tile_meta (B,
    d_pad//1024, 2) int32, fallback (B,) int32)``.
    """
    B = a_resolved.shape[0]
    nt = d_pad // 1024
    idx_abs = a_resolved - FLAG
    d = jnp.arange(d_pad, dtype=jnp.int32)[None, :]
    live = d < declens[:, None].astype(jnp.int32)
    iv = jnp.where(live, idx_abs, 0).reshape(B, nt, 1024)
    lv = live.reshape(B, nt, 1024)
    big = jnp.int32(1 << 30)
    mn = jnp.min(jnp.where(lv, iv, big), axis=2)
    mx = jnp.max(jnp.where(lv, iv, 0), axis=2)
    any_live = jnp.any(lv, axis=2)
    mn = jnp.where(any_live, mn, 0)
    min_row = mn // 128
    bucket = jnp.full((B, nt), -1, jnp.int32)
    base = jnp.zeros((B, nt), jnp.int32)
    for w in (512, 256, 128):  # narrowest-fitting wins (iterate wide->narrow)
        wcap = min(w, s_rows)
        cand = jnp.maximum(0, jnp.minimum(min_row, s_rows - wcap)) & ~7
        ok = mx - cand * 128 < w * 128
        wi = {128: 0, 256: 1, 512: 2}[w]
        bucket = jnp.where(ok, wi, bucket)
        base = jnp.where(ok, cand, base)
    fallback = jnp.max((bucket < 0).astype(jnp.int32), axis=1)
    bucket = jnp.where(bucket < 0, 2, bucket)
    tile_meta = jnp.stack([base, bucket], axis=2)

    rel = jnp.where(
        lv, iv - base[:, :, None] * 128, 0
    ).reshape(B, d_pad).astype(jnp.uint16)
    # flat_v2_permute, device-side.
    g = d_pad // 16384
    idx_phys = (
        rel.reshape(B, g, 16, 8, _LANES)
        .transpose(0, 1, 4, 2, 3)
        .reshape(B, d_pad)
    )
    return idx_phys, tile_meta, fallback


def decode_resolve_batch(
    srcs, recs, nops, declens, d_pad: int, interpret: bool | None = None,
    use_pallas: bool = True, use_fused: bool = True,
):
    """Full device decode from op records: resolve + flat gather.

    ``srcs``: (B, S) uint8 zero-padded compressed bodies (S % 128 ==
    0); ``recs``/``nops`` from ``native.scan_records_batch`` (the only
    host pass — O(records)). Returns ``(out (B, d_pad) uint8,
    fallback (B,) int32)``: rows with fallback != 0 have a source
    spread exceeding the widest gather window (possible only when
    s_rows > 512, i.e. bodies over 64 KiB — same constraint as the
    host flatten) and must be re-routed by the caller; their bytes are
    not valid. Rows whose records overflowed the scan cap must be
    routed away by the caller before calling (nops > cap).
    """
    from .pallas.decode import decode_flat_pallas_v2

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if use_pallas and use_fused:
        # Fused first-hop path: no per-byte XLA work at all — the
        # kernel builds each tile's pointers from windowed record
        # planes (kills the 296 us/block scatter, RESOLVE_BENCH_r05).
        from .pallas.resolve import resolve_fh_pallas

        st_pln, rec_pack, wlo, nwin, rmeta = records_to_kernel_inputs(
            jnp.asarray(recs), jnp.asarray(nops), jnp.asarray(declens),
            d_pad,
        )
        a = resolve_fh_pallas(
            st_pln, rec_pack, wlo, nwin, rmeta,
            jnp.asarray(declens), d_pad, interpret=interpret,
        )
    else:
        a0, rmeta = records_to_pointers(
            jnp.asarray(recs), jnp.asarray(nops), jnp.asarray(declens),
            d_pad,
        )
        if use_pallas:
            from .pallas.resolve import resolve_pallas

            a = resolve_pallas(a0, rmeta, interpret=interpret)
        else:
            a = resolve_reference(a0)
    s_rows = srcs.shape[1] // _LANES
    idx_phys, tile_meta, fallback = idx_to_v2_inputs(
        a, jnp.asarray(declens), d_pad, s_rows
    )
    # Defensive: a row with pointers still unresolved after the
    # kernel's round budget (cross-tile lag on adversarially deep
    # chains) must not ship garbage — flag it for the caller's
    # host-flatten fallback.
    fallback = fallback | jnp.any(a < FLAG, axis=1).astype(fallback.dtype)
    out = decode_flat_pallas_v2(
        jnp.asarray(srcs), idx_phys, tile_meta, jnp.asarray(declens),
        d_pad, interpret=interpret,
    )
    return out, fallback
