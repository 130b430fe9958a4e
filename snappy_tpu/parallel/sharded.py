"""shard_map'd codec entry points over a 1-D block mesh.

Each device runs the identical batched kernel on its slice of the block
axis; per-block output lengths are the only cross-device data (gathered
for ordered stream assembly). Offsets for the final stream come from a
prefix sum of those lengths — the parallel replacement for the
sequential append loop in the reference's writer
(``src/write.rs:171-190``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.decode import decode_batch
from ..ops.encode import compress_blocks
from ..ops.frame import encode_frame_chunks
from .mesh import BLOCK_AXIS


def _mesh_interp(mesh) -> bool:
    """interpret flag for Pallas kernels running under ``mesh``.

    Gate on the MESH devices' platform, not ``jax.default_backend()``:
    when a TPU backend is registered but the mesh is the forced-host
    CPU one (the driver's ``dryrun_multichip`` configuration and the
    virtual-device test matrix), the default backend says "tpu" while
    the kernels actually execute on CPU — compiled Mosaic would fail
    with "Only interpret mode is supported on CPU backend"."""
    dev = next(iter(mesh.devices.flat))
    return dev.platform != "tpu"


def pad_batch(arrs: np.ndarray, lengths: np.ndarray, multiple: int):
    """Pad the batch axis to a multiple of the mesh size (zero rows)."""
    b = arrs.shape[0]
    pb = -(-b // multiple) * multiple
    if pb != b:
        arrs = np.concatenate(
            [arrs, np.zeros((pb - b,) + arrs.shape[1:], arrs.dtype)], axis=0
        )
        lengths = np.concatenate([lengths, np.zeros(pb - b, lengths.dtype)])
    return arrs, lengths, b


def sharded_compress_blocks(mesh, blocks, lengths, fast: bool = False):
    """Raw-compress ``(B, 65536)`` blocks sharded over ``mesh``.

    Returns ``(out (B, OUT_W) u8, out_len (B,))`` with the same sharding;
    no collectives are inserted (verifiable: the per-lane codec touches
    only its own rows). ``fast=True`` opts into the parallel-parse
    profile (valid Snappy, not byte-identical to the reference).
    """
    if fast:
        from ..ops.encode_fast import compress_blocks_fast as codec
    else:
        codec = compress_blocks
    fn = shard_map(
        codec,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)(blocks, lengths)


def sharded_compress_blocks_flat(mesh, blocks, lengths):
    """Flat-encoder compress sharded over ``mesh`` (the round-4 TPU fast
    profile: lockstep segment parse + gather emission). Same contract
    as :func:`sharded_compress_blocks` plus the per-block overflow flag
    (defensively wired; unreachable on any input — see
    ``ops.encode_flat.compress_blocks_flat_fast``). Zero collectives:
    every stage is per-block."""
    from ..ops.encode_flat import _compress_blocks_flat_fused

    interp = _mesh_interp(mesh)
    fn = shard_map(
        lambda b, l: _compress_blocks_flat_fused(b, l, interp),
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)(blocks, lengths)


def sharded_decode_streams(mesh, srcs, src_lens, declens, d_pad: int):
    """Decode ``(B, S)`` independent op streams sharded over ``mesh``."""
    fn = shard_map(
        lambda s, n, d: decode_batch(s, n, d, d_pad),
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn, static_argnums=())(srcs, src_lens, declens)


def sharded_decode_streams_hosted(mesh, srcs, src_lens, declens, opbits, d_pad: int):
    """Hybrid sharded decode: host op-start bitmaps shard with their rows.

    Same contract as :func:`sharded_decode_streams`; the per-row bitmap
    (``native.scan_ops``) lets every device skip the discovery phase.
    """
    from ..ops.decode import decode_batch_hosted

    fn = shard_map(
        lambda s, n, d, m: decode_batch_hosted(s, n, d, m, d_pad),
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS, None)),
        out_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn, static_argnums=())(srcs, src_lens, declens, opbits)


def sharded_decode_flat_host(mesh, srcs, src_lens, declens, d_pad: int):
    """Host-flatten + sharded flat gather in one call.

    Runs ``native.flatten_idx_batch`` (all host cores) and dispatches
    :func:`sharded_decode_streams_flat` — the production route's
    sharded entry (VERDICT r4 #3). Returns ``(dst (B, d_pad) u8,
    err (B,) i32, fallback (B,) i64)``; rows with fallback set were NOT
    decoded (source spread beyond the widest window — route them to the
    replay path).
    """
    from .. import native

    idx_rel, tmeta, fallb, errs, _dt = native.flatten_idx_batch(
        np.asarray(srcs), np.asarray(src_lens, np.uint64),
        np.asarray(declens, np.uint64), d_pad, layout=1,
    )
    dst = sharded_decode_streams_flat(
        mesh, jnp.asarray(srcs), jnp.asarray(idx_rel), jnp.asarray(tmeta),
        jnp.asarray(np.asarray(declens, np.int32)), d_pad,
    )
    return dst, errs, fallb


def sharded_decode_resolve(mesh, srcs, recs, nops, declens, d_pad: int):
    """Device chain-resolution decode sharded over ``mesh``.

    The round-5 route (``ops/resolve.py``): host contributes only the
    O(records) op scan; every per-byte step — pointer construction,
    chain resolution, flat gather — runs per-device on its own rows.
    Zero collectives. Returns ``(dst (B, d_pad) u8, fallback (B,))``.
    """
    from ..ops.resolve import decode_resolve_batch

    interp = _mesh_interp(mesh)
    fn = shard_map(
        lambda s, r, no, d: decode_resolve_batch(
            s, r, no, d, d_pad, interpret=interp
        ),
        mesh=mesh,
        in_specs=(
            P(BLOCK_AXIS, None),
            P(BLOCK_AXIS, None, None),
            P(BLOCK_AXIS),
            P(BLOCK_AXIS),
        ),
        out_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)(
        jnp.asarray(srcs), jnp.asarray(recs), jnp.asarray(nops),
        jnp.asarray(np.asarray(declens, np.int64)),
    )


def sharded_decode_streams_pallas(mesh, srcs, src_lens, declens, d_pad: int):
    """Pallas-replay decode sharded over ``mesh``.

    The TPU production route (``BENCH_PALLAS_VS_XLA.json``) under
    ``shard_map``: each device runs the VMEM/SMEM-resident kernel on its
    own rows; like every codec entry point here, zero collectives.
    Returns ``(dst (B, d_pad) u8, err (B,))``.
    """
    from ..ops.pallas.decode import decode_batch_pallas

    interp = _mesh_interp(mesh)
    fn = shard_map(
        lambda s, n, d: decode_batch_pallas(s, n, d, d_pad, interpret=interp),
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)(srcs, src_lens, declens)


def sharded_decode_streams_flat(mesh, srcs, idx_phys, tile_meta, declens, d_pad: int):
    """Flat-gather v2 decode sharded over ``mesh``.

    The TPU production route (DEVICE_TIME.json, round 3): the host
    flattens copy chains to per-byte indices
    (``native.flatten_idx_batch(..., layout=1)``) and each device runs
    the windowed-MXU-gather kernel on its own rows — idx and tile meta
    shard with their blocks, zero collectives. Error codes come from
    the host flatten (lockstep with device validation), so this returns
    only ``dst (B, d_pad) u8``. Requires ``d_pad % 16384 == 0``.
    """
    from ..ops.pallas.decode import decode_flat_pallas_v2

    interp = _mesh_interp(mesh)
    fn = shard_map(
        lambda s, i, m, d: decode_flat_pallas_v2(
            s, i, m, d, d_pad, interpret=interp),
        mesh=mesh,
        in_specs=(
            P(BLOCK_AXIS, None),
            P(BLOCK_AXIS, None),
            P(BLOCK_AXIS, None, None),
            P(BLOCK_AXIS),
        ),
        out_specs=P(BLOCK_AXIS, None),
        check_vma=False,
    )
    return jax.jit(fn)(srcs, idx_phys, tile_meta, declens)


def sharded_encode_frame_chunks(mesh, chunks, lengths):
    """Frame-encode chunks sharded over ``mesh``; returns wire rows.

    The ordered "all-gather" of compressed chunks is implicit: outputs
    keep the batch order, and fetching the (sharded) result rows is the
    gather. Offsets for writing shard-local segments come from the
    ``row_len`` vector.
    """
    fn = shard_map(
        encode_frame_chunks,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)(chunks, lengths)


def stream_offsets(row_lens):
    """Exclusive prefix sum of per-row lengths -> output byte offsets.

    This tiny collective-free reduction is the only coordination the
    format requires between shards (SURVEY.md §5, distributed backend).
    """
    row_lens = jnp.asarray(row_lens)
    ends = jnp.cumsum(row_lens)
    return ends - row_lens, ends[-1]
