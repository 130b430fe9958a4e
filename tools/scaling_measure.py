#!/usr/bin/env python
"""Measured 1→2 "host" scaling of the distributed compression path.

The baseline asks for ≥80% scaling efficiency from 1 to 2 hosts
(BASELINE.md). Real multi-host TPU hardware isn't reachable from this
box, so this harness produces the closest measurable stand-in, with
the honest caveats recorded in the output:

- each "host" is a process pinned to its own CPU set (2 cores each,
  ``sched_setaffinity``) with 4 virtual XLA:CPU devices;
- weak scaling: per-host work is fixed (B blocks of 64 KiB each), so
  efficiency = t(1 proc) / t(2 procs) for the same per-host load;
- stages timed separately across a distributed barrier: device encode,
  per-block length all-gather (the ONLY cross-host communication in
  the protocol), and segment pwrite into the shared output file;
- the all-gather payload is counted exactly (one int32 per global
  block) so the v5e DCN derivation is arithmetic, not guesswork.

Writes ``SCALING_r04.json``. The derivation paragraph lives in
``R4_NOTES.md``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BLOCKS_PER_HOST = 8
ROUNDS = 3


def worker(pid: int, nprocs: int, port: int, outdir: str) -> None:
    # Pin this "host" to its own CPU set before JAX spins up its pools.
    ncpu = os.cpu_count() or 4
    half = max(1, ncpu // 2)
    cpus = set(range(0, half)) if pid == 0 else set(range(half, ncpu))
    os.sched_setaffinity(0, cpus)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from snappy_tpu.ops.packing import blocks_of
    from snappy_tpu.parallel import multihost

    if nprocs > 1:
        multihost.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=pid,
        )
        from jax.experimental import multihost_utils

        def barrier(tag):
            multihost_utils.sync_global_devices(tag)
    else:
        def barrier(tag):
            pass

    with open(os.path.join(REPO, "data", "lcet10.txt"), "rb") as f:
        data = f.read()
    with open(os.path.join(REPO, "data", "plrabn12.txt"), "rb") as f:
        data = (data + f.read())
    data = (data * 4)[: nprocs * BLOCKS_PER_HOST * 65536]
    blocks, lens = blocks_of(data)
    local = slice(pid * BLOCKS_PER_HOST, (pid + 1) * BLOCKS_PER_HOST)
    mesh = multihost.global_mesh()

    # Warm-up round compiles everything (excluded from timing).
    seg = multihost.compress_segments(mesh, blocks[local], lens[local], fast=False)

    # Instrumented rounds: same steps as compress_segments, split at
    # stage boundaries with a global barrier between them so per-stage
    # walls are comparable across processes.
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from snappy_tpu.parallel.mesh import BLOCK_AXIS
    from snappy_tpu.parallel.sharded import sharded_compress_blocks
    from snappy_tpu.ops.encode import compress_blocks

    path = os.path.join(outdir, "stream.bin")
    stats = {"encode_s": [], "allgather_s": [], "write_s": []}
    dcn_bytes = 4 * blocks.shape[0]  # one int32 length per global block
    for _ in range(ROUNDS):
        barrier("round-start")
        if nprocs == 1:
            t0 = time.perf_counter()
            out, out_len = jax.jit(compress_blocks)(
                jnp.asarray(blocks[local]), jnp.asarray(lens[local])
            )
            jax.block_until_ready(out)
            t1 = time.perf_counter()
            lens_all = np.asarray(out_len)
            rows = np.asarray(out)
            my_lens = lens_all
            t2 = time.perf_counter()
        else:
            gb = blocks.shape[0]
            sharding = NamedSharding(mesh, P(BLOCK_AXIS, None))
            garr = jax.make_array_from_process_local_data(
                sharding, np.ascontiguousarray(blocks[local]),
                (gb,) + blocks.shape[1:],
            )
            glens = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P(BLOCK_AXIS)),
                np.ascontiguousarray(lens[local]), (gb,),
            )
            t0 = time.perf_counter()
            gout, gout_len = sharded_compress_blocks(mesh, garr, glens)
            jax.block_until_ready([sh.data for sh in gout.addressable_shards])
            t1 = time.perf_counter()
            from jax.experimental import multihost_utils

            lens_all = np.asarray(
                multihost_utils.process_allgather(gout_len, tiled=True)
            )
            t2 = time.perf_counter()
            shards = sorted(
                gout.addressable_shards, key=lambda sh: sh.index[0].start
            )
            rows = np.concatenate([np.asarray(sh.data) for sh in shards], axis=0)
            my_lens = lens_all[pid * BLOCKS_PER_HOST:(pid + 1) * BLOCKS_PER_HOST]
        ends = np.cumsum(lens_all.astype(np.int64))
        offsets = (ends - lens_all)[pid * BLOCKS_PER_HOST:(pid + 1) * BLOCKS_PER_HOST]
        t3 = time.perf_counter()
        with open(path, "r+b") as f:
            for i in range(BLOCKS_PER_HOST):
                f.seek(int(offsets[i]))
                f.write(rows[i, : int(my_lens[i])].tobytes())
            f.flush()
            os.fsync(f.fileno())
        t4 = time.perf_counter()
        barrier("round-end")
        stats["encode_s"].append(t1 - t0)
        stats["allgather_s"].append(t2 - t1)
        stats["write_s"].append(t4 - t3)

    result = {
        "pid": pid,
        "nprocs": nprocs,
        "cpus": sorted(cpus),
        "blocks_per_host": BLOCKS_PER_HOST,
        "bytes_per_host": BLOCKS_PER_HOST * 65536,
        "dcn_payload_bytes": dcn_bytes,
        "encode_s": min(stats["encode_s"]),
        "allgather_s": min(stats["allgather_s"]),
        "write_s": min(stats["write_s"]),
        "total_s": min(
            a + b + c
            for a, b, c in zip(
                stats["encode_s"], stats["allgather_s"], stats["write_s"]
            )
        ),
    }
    with open(os.path.join(outdir, f"stats_{nprocs}_{pid}.json"), "w") as f:
        json.dump(result, f)


def run_config(nprocs: int, outdir: str, port: int) -> list[dict]:
    with open(os.path.join(outdir, "stream.bin"), "wb") as f:
        f.truncate(32 * 1024 * 1024)
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(pid), str(nprocs),
             str(port), outdir],
            env={**os.environ, "PYTHONPATH": REPO},
        )
        for pid in range(nprocs)
    ]
    for p in procs:
        rc = p.wait(timeout=600)
        if rc != 0:
            raise RuntimeError(f"worker failed rc={rc}")
    out = []
    for pid in range(nprocs):
        with open(os.path.join(outdir, f"stats_{nprocs}_{pid}.json")) as f:
            out.append(json.load(f))
    return out


def main() -> int:
    with tempfile.TemporaryDirectory() as outdir:
        one = run_config(1, outdir, 29611)[0]
        two = run_config(2, outdir, 29613)
    # Weak scaling: same per-host load; efficiency is the slowdown of
    # the slowest host vs the single-host wall.
    t2 = max(w["total_s"] for w in two)
    eff = one["total_s"] / t2
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "mode": "weak-scaling, per-host load fixed",
        "one_proc": one,
        "two_proc": two,
        "efficiency_1_to_2": round(eff, 4),
        "dcn_payload_bytes_2proc": two[0]["dcn_payload_bytes"],
        "note": (
            "each 'host' = one process pinned to its own CPU set with 4 "
            "virtual XLA:CPU devices; encode/allgather/write timed across "
            "distributed barriers, min over rounds after a warm-up; the "
            "only cross-host payload is the per-block int32 length vector "
            "(dcn_payload_bytes). Virtual hosts share one memory bus — "
            "real v5e hosts are more independent, not less."
        ),
    }
    with open(os.path.join(REPO, "SCALING_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        sys.path.insert(0, REPO)
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
    else:
        sys.path.insert(0, REPO)
        raise SystemExit(main())
