#!/usr/bin/env python
"""Two-process jax.distributed demo of the multi-host compression path.

Simulates a 2-host deployment on one machine: each process owns 4
virtual CPU devices and a local shard of blocks; the global mesh spans
all 8; `parallel.multihost.compress_segments` computes every host's
absolute output offsets from the one per-block length all-gather; each
process writes its own rows into the shared output file at those
offsets; process 0 verifies the assembled stream byte-for-byte against
the reference encoder.

Run:  python tools/multiprocess_demo.py
(spawns its two workers itself; exits 0 on byte-exact success).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(pid: int, nprocs: int, port: int, outdir: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("GLOO_SOCKET_IFNAME", "lo")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from snappy_tpu.format.varint import write_varu64
    from snappy_tpu.ops.packing import blocks_of
    from snappy_tpu.parallel import multihost

    # The library helper performs the jax.distributed handshake (it must
    # run before any backend query; see multihost.initialize docstring).
    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs

    with open(os.path.join(REPO, "data", "lcet10.txt"), "rb") as f:
        data = f.read()
    with open(os.path.join(REPO, "data", "plrabn12.txt"), "rb") as f:
        data = (data + f.read())[: 8 * 65536]  # exactly 8 blocks, 4 per "host"
    blocks, lens = blocks_of(data)
    local = slice(pid * 4, (pid + 1) * 4)
    mesh = multihost.global_mesh()
    assert len(jax.devices()) == 8, jax.devices()

    print(f"[worker {pid}] devices={len(jax.devices())} compiling...",
          file=sys.stderr, flush=True)
    seg = multihost.compress_segments(mesh, blocks[local], lens[local], fast=False)
    print(f"[worker {pid}] segments ready", file=sys.stderr, flush=True)

    # Each "host" pwrites its rows at its absolute offsets.
    path = os.path.join(outdir, "stream.bin")
    with open(path, "r+b") as f:
        for i in range(seg.rows.shape[0]):
            f.seek(int(seg.offsets[i]))
            f.write(seg.rows[i, : seg.row_lens[i]].tobytes())

    # Decode leg: the same mesh decodes each host's shard of the
    # compressed rows back to the original blocks (hybrid host-scan
    # path when the native runtime is present; zero collectives).
    print(f"[worker {pid}] decoding shard...", file=sys.stderr, flush=True)
    dst, errs = multihost.decode_segments(
        mesh, seg.rows, seg.row_lens, lens[local], d_pad=65536
    )
    assert int(errs.max()) == 0, f"[worker {pid}] decode flagged errors"
    for i in range(dst.shape[0]):
        want = blocks[local][i, : lens[local][i]]
        assert np.array_equal(dst[i, : lens[local][i]], want), (
            f"[worker {pid}] decode mismatch in local block {i}"
        )
    print(f"[worker {pid}] decode shard byte-exact", file=sys.stderr, flush=True)

    if pid == 0:
        with open(os.path.join(outdir, "meta"), "w") as f:
            f.write(f"{seg.total} {len(data)}")


def main() -> int:
    port = 29517
    with tempfile.TemporaryDirectory() as outdir:
        # Preallocate the shared output (worst case).
        with open(os.path.join(outdir, "stream.bin"), "wb") as f:
            f.truncate(16 * 1024 * 1024)
        procs = [
            subprocess.Popen(
                [sys.executable, __file__, "--worker", str(pid), "2", str(port), outdir],
                env={**os.environ, "PYTHONPATH": REPO},
            )
            for pid in range(2)
        ]
        for p in procs:
            if p.wait(timeout=300) != 0:
                print("worker failed", file=sys.stderr)
                return 1
        with open(os.path.join(outdir, "meta")) as f:
            total, n = map(int, f.read().split())
        with open(os.path.join(outdir, "stream.bin"), "rb") as f:
            stream = f.read(total)

    sys.path.insert(0, REPO)
    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import write_varu64

    with open(os.path.join(REPO, "data", "lcet10.txt"), "rb") as f:
        data = f.read()
    with open(os.path.join(REPO, "data", "plrabn12.txt"), "rb") as f:
        data = (data + f.read())[:n]
    want = ref.compress(data)
    got = write_varu64(n) + stream
    assert got == want, "multi-process assembled stream differs from reference"
    print("2-process distributed compression: byte-exact OK "
          f"({n} bytes -> {len(got)})")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
    else:
        raise SystemExit(main())
