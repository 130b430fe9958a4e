"""Multi-host scale-out: jax.distributed wiring + segmented assembly.

Snappy's data path needs no cross-host communication (SURVEY.md §5):
blocks are independent, so multi-host is pure data parallelism over a
global mesh. The only coordination is stream assembly — every host must
learn the compressed length of every block to know its own output file
offsets. That is one all-gather of a tiny int32 vector over DCN per
launch; payload bytes never leave the host that produced them.

Usage (one process per host, e.g. under SLURM/GKE):

    from snappy_tpu.parallel import multihost
    multihost.initialize()                    # jax.distributed handshake
    mesh = multihost.global_mesh()
    seg = multihost.compress_segments(mesh, my_blocks, my_lengths)
    # seg.offsets[i] is the absolute file offset of this host's row i;
    # each host pwrite()s its rows into the shared output in parallel.

Single-host processes degrade gracefully (initialize() is a no-op).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .mesh import BLOCK_AXIS, make_mesh


def _cluster_env_detected() -> bool:
    """True when env markers indicate a multi-process cluster launch.

    Mirrors the environments jax.distributed.initialize() can
    auto-configure: SLURM, Open MPI (mpirun), Cloud TPU pods, and GKE
    TPU podslices. Single-process variants (1 task) don't count — the
    handshake would be pointless and initialize(None-args) can hang
    waiting for peers that don't exist.
    """
    import os

    def _int(name):
        try:
            return int(os.environ.get(name, ""))
        except ValueError:
            return None

    ntasks = _int("SLURM_NTASKS") or _int("SLURM_NPROCS")
    if os.environ.get("SLURM_JOB_ID") and ntasks and ntasks > 1:
        return True
    world = _int("OMPI_COMM_WORLD_SIZE")
    if world and world > 1:
        return True
    # Cloud TPU pod / GKE podslice: worker hostnames list with >1 entry.
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    if os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    return False


def initialize(**kwargs) -> None:
    """Initialize jax.distributed when running multi-process.

    No-op for single-process runs so the same entry point serves both.
    Explicit kwargs (``coordinator_address``/``num_processes``/
    ``process_id``) or env (``JAX_COORDINATOR_ADDRESS`` plus optional
    ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``) configure the handshake.

    Must run before anything touches a JAX backend: querying
    ``jax.process_count()`` (or any device API) first would initialize
    the local runtime and make a later distributed handshake fail.
    This helper therefore only consults ``jax.distributed`` state —
    never the backend — and it does NOT swallow handshake errors: a
    configured multi-process run that cannot connect raises instead of
    silently degrading every process to single-process mode.
    """
    import os

    import jax

    if jax.distributed.is_initialized():
        return  # idempotent: a prior initialize() (ours or the app's) wins
    env_addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not kwargs and not env_addr:
        # No explicit configuration. JAX's own no-arg initialize()
        # auto-detects Cloud TPU pod / SLURM / Open MPI / GKE cluster
        # environments — returning here on such a machine would
        # silently degrade a real multi-process run to uncoordinated
        # single-process mode. Attempt the auto-detected handshake
        # when a multi-process cluster environment is detectable, and
        # stay a no-op otherwise (plain single-process runs).
        if _cluster_env_detected():
            jax.distributed.initialize()
        return
    if env_addr and "coordinator_address" not in kwargs:
        kwargs.setdefault("coordinator_address", env_addr)
        n = os.environ.get("JAX_NUM_PROCESSES")
        p = os.environ.get("JAX_PROCESS_ID")
        if n is not None:
            kwargs.setdefault("num_processes", int(n))
        if p is not None:
            kwargs.setdefault("process_id", int(p))
    jax.distributed.initialize(**kwargs)


def global_mesh():
    """1-D block mesh over every device of every host."""
    import jax

    return make_mesh(jax.devices())


@dataclass(frozen=True)
class Segments:
    """This host's compressed rows + absolute output offsets."""

    rows: np.ndarray  # (local_B, OUT_W) uint8
    row_lens: np.ndarray  # (local_B,) int32
    offsets: np.ndarray  # (local_B,) int64 — absolute stream offsets
    total: int  # total stream length across all hosts


def compress_segments(mesh, blocks, lengths, fast: bool = False) -> Segments:
    """Compress this host's blocks; compute global stream offsets.

    ``blocks``/``lengths`` are this process's local shard (global batch =
    concatenation over process index). The returned offsets account for
    every host's rows in global block order: the single all-gather of
    per-block lengths is the entire distributed protocol.

    Exact (reference-byte-identical) by default, like every other entry
    point; ``fast=True`` opts into the parallel-parse profile (valid
    Snappy, size <= the reference's on real data, not byte-identical).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .sharded import sharded_compress_blocks

    if fast:
        from ..ops.encode_fast import compress_blocks_fast as codec
    else:
        from ..ops.encode import compress_blocks as codec

    nproc = jax.process_count()
    if nproc == 1:
        out, out_len = jax.jit(codec)(jnp.asarray(blocks), jnp.asarray(lengths))
        out_len = np.asarray(out_len)
        lens_all = out_len
        my_start = 0
    else:
        # Global array from per-host shards; shard_map runs the codec on
        # local devices; lengths become globally addressable after one
        # all-gather (performed implicitly by fetching the global array).
        gb = blocks.shape[0] * nproc
        sharding = NamedSharding(mesh, P(BLOCK_AXIS, None))
        garr = jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(blocks), (gb,) + blocks.shape[1:]
        )
        glens = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(BLOCK_AXIS)), np.ascontiguousarray(lengths), (gb,)
        )
        from jax.experimental import multihost_utils

        gout, gout_len = sharded_compress_blocks(mesh, garr, glens, fast=fast)
        lens_all = np.asarray(multihost_utils.process_allgather(gout_len, tiled=True))
        my_start = jax.process_index() * blocks.shape[0]
        out_len = lens_all[my_start : my_start + blocks.shape[0]]
        # Assemble this host's rows from its addressable shards (global
        # arrays cannot be fetched whole across hosts — by design: the
        # payload bytes never leave the host that produced them).
        shards = sorted(gout.addressable_shards, key=lambda sh: sh.index[0].start)
        out = np.concatenate([np.asarray(sh.data) for sh in shards], axis=0)

    ends = np.cumsum(lens_all.astype(np.int64))
    offsets_all = ends - lens_all
    rows = np.asarray(
        out if isinstance(out, np.ndarray) else jax.device_get(out)
    )[: blocks.shape[0]]
    return Segments(
        rows=rows,
        row_lens=np.asarray(out_len, np.int32),
        offsets=offsets_all[my_start : my_start + blocks.shape[0]],
        total=int(ends[-1]),
    )


def decode_segments(mesh, bodies, src_lens, declens, d_pad: int = 65536):
    """Decode this host's shard of raw op streams over the global mesh.

    ``bodies``: ``(local_B, S)`` uint8 zero-padded per-block op streams
    (no varint headers) — e.g. the rows a :func:`compress_segments` peer
    produced, or a stream split at known block boundaries. Returns
    ``(dst (local_B, d_pad) uint8, errs (local_B,) int32)``. Payload
    bytes never cross hosts; like compression, decode needs zero
    data-path collectives. Uses the hybrid host-scan path when the
    native runtime is present.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.decode import decode_batch, decode_batch_hosted
    from .sharded import sharded_decode_streams, sharded_decode_streams_hosted

    bodies = np.ascontiguousarray(bodies, dtype=np.uint8)
    src_lens = np.asarray(src_lens, np.int32)
    declens = np.asarray(declens, np.int32)
    bits = None
    try:
        from .. import native

        if native.available():
            bits = np.zeros((bodies.shape[0], bodies.shape[1] // 8), np.uint8)
            if bodies.shape[1] % 8 == 0:
                # One chunk-parallel C++ call over the strided rows.
                native.scan_ops_batch(bodies, np.asarray(src_lens, np.uint64), bits)
            else:
                for i in range(bodies.shape[0]):
                    native.scan_ops(bodies[i, : src_lens[i]].tobytes(), bits[i])
    except Exception:
        bits = None

    nproc = jax.process_count()
    if nproc == 1:
        args = (jnp.asarray(bodies), jnp.asarray(src_lens), jnp.asarray(declens))
        if bits is not None:
            dst, errs, _ = decode_batch_hosted(*args, jnp.asarray(bits), d_pad)
        else:
            dst, errs, _ = decode_batch(*args, d_pad)
        return np.asarray(dst), np.asarray(errs)

    gb = bodies.shape[0] * nproc
    row_sh = NamedSharding(mesh, P(BLOCK_AXIS, None))
    vec_sh = NamedSharding(mesh, P(BLOCK_AXIS))
    gbodies = jax.make_array_from_process_local_data(
        row_sh, bodies, (gb, bodies.shape[1])
    )
    glens = jax.make_array_from_process_local_data(vec_sh, src_lens, (gb,))
    gdecl = jax.make_array_from_process_local_data(vec_sh, declens, (gb,))
    if bits is not None:
        gbits = jax.make_array_from_process_local_data(
            row_sh, bits, (gb, bits.shape[1])
        )
        gdst, gerrs, _ = sharded_decode_streams_hosted(
            mesh, gbodies, glens, gdecl, gbits, d_pad
        )
    else:
        gdst, gerrs, _ = sharded_decode_streams(mesh, gbodies, glens, gdecl, d_pad)
    shards = sorted(gdst.addressable_shards, key=lambda sh: sh.index[0].start)
    dst = np.concatenate([np.asarray(sh.data) for sh in shards], axis=0)
    eshards = sorted(gerrs.addressable_shards, key=lambda sh: sh.index[0].start)
    errs = np.concatenate([np.asarray(sh.data) for sh in eshards], axis=0)
    return dst[: bodies.shape[0]], errs[: bodies.shape[0]]
