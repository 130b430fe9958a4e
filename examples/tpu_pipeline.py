#!/usr/bin/env python
"""TPU-native data pipeline: compressed storage -> device decode -> model step.

The showcase the reference has no counterpart for: Snappy frame files
feed an accelerator training loop with decompression running as a
batched device computation over a mesh, not as a host preprocessing
stage. Flow per shard:

1. read one frame-compressed shard (bytes, e.g. from blob storage);
2. walk its chunk headers on the host (a few bytes per 64 KiB chunk)
   and batch-decode every compressed chunk in ONE sharded device launch
   (hybrid profile: host op-start bitmaps + device parse/validate/
   resolve — see snappy_tpu/ops/decode.py);
3. the decoded blocks are already device arrays sharded over the mesh —
   feed them straight into a jitted, sharded train step (here: a toy
   byte-embedding model) without ever bouncing through host memory.

Run on any JAX backend; uses every visible device:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        SNAPPY_TPU_FORCE_CPU=1 python examples/tpu_pipeline.py
"""

import os

import numpy as np


def split_frame(wire: bytes):
    """Walk a frame stream -> list of (kind, declen, body) per data chunk.

    kind: 0 = compressed (body is the raw op stream, varint stripped),
    1 = uncompressed (body is the literal bytes). Mirrors the chunk
    taxonomy of the reference reader (``src/read.rs:137-236``); this
    demo walk assumes a well-formed stream (the library API
    ``ops.api.decompress_frame`` has the full error semantics).
    """
    from snappy_tpu.format.constants import (
        CHUNK_TYPE_COMPRESSED,
        CHUNK_TYPE_STREAM,
        CHUNK_TYPE_UNCOMPRESSED,
    )
    from snappy_tpu.format.varint import read_varu64

    chunks, pos = [], 0
    while pos < len(wire):
        ty = wire[pos]
        length = int.from_bytes(wire[pos + 1 : pos + 4], "little")
        payload = wire[pos + 4 : pos + 4 + length]
        pos += 4 + length
        if ty == CHUNK_TYPE_STREAM:
            continue
        # Skip the masked CRC32C (verified on device by the library
        # path; elided in this demo walk).
        body = payload[4:]
        if ty == CHUNK_TYPE_UNCOMPRESSED:
            chunks.append((1, len(body), body))
        elif ty == CHUNK_TYPE_COMPRESSED:
            declen, hdr = read_varu64(body)
            chunks.append((0, declen, body[hdr:]))
    return chunks


def main() -> None:
    import jax

    if os.environ.get("SNAPPY_TPU_FORCE_CPU"):
        # The container's sitecustomize pins jax to the TPU tunnel;
        # the config update (not JAX_PLATFORMS) is what overrides it.
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from snappy_tpu import native
    from snappy_tpu.ops.packing import batch_streams, pad_to_bucket
    from snappy_tpu.parallel.sharded import (
        sharded_decode_streams_flat,
        sharded_decode_streams_hosted,
    )

    # On real TPU chips the flat-gather v2 kernel is the fastest decode
    # (BENCH_TPU_r03.json: 1.08 GB/s/chip device-resident); CPU meshes
    # use the hybrid XLA route (the Pallas interpreter would dominate
    # the demo's runtime).
    on_tpu = jax.default_backend() == "tpu"

    devices = np.array(jax.devices())
    ndev = len(devices)
    mesh = Mesh(devices, ("blocks",))
    print(f"mesh: {ndev} x {devices[0].platform}")

    # --- Storage side: shards of training text, frame-compressed. -----
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "data", "alice29.txt"), "rb") as f:
        text = f.read()
    shard_bytes = int(os.environ.get("PIPELINE_SHARD_BYTES", 512 * 1024))
    shards = []
    for i in range(2):
        plain = (text[i * 251 :] + text) * (shard_bytes // len(text) + 1)
        shards.append((native.frame_compress(plain[:shard_bytes]), plain[:shard_bytes]))
    ratio = sum(len(c) for c, _ in shards) / sum(len(p) for _, p in shards)
    print(f"shards: {len(shards)} x {shard_bytes} B, wire ratio {ratio:.2f}")

    # --- Model side: toy byte-embedding regression, sharded on blocks.
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.standard_normal((256, 16)) * 0.01, jnp.float32)

    def loss_fn(p, tokens, mask):
        h = jnp.mean(p[tokens.astype(jnp.int32)], axis=-1)
        return jnp.sum(h * h * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    @jax.jit
    def train_step(params, tokens, nbytes):
        # tokens: (B, 65536) uint8 sharded over the mesh; padding past
        # each block's length is zero (the codec's zero-pad contract).
        mask = (
            jnp.arange(tokens.shape[1], dtype=jnp.int32)[None, :]
            < nbytes[:, None]
        ).astype(jnp.float32)
        loss, grad = jax.value_and_grad(loss_fn)(params, tokens, mask)
        return params - 0.1 * grad, loss

    row_sharding = NamedSharding(mesh, P("blocks", None))
    vec_sharding = NamedSharding(mesh, P("blocks"))

    for step_no, (wire, plain) in enumerate(shards):
        chunks = split_frame(wire)
        # Text shards compress; any uncompressed chunks (incompressible
        # data) would already be plaintext and skip the device decode.
        bodies = [(b, d) for k, d, b in chunks if k == 0]
        assert len(bodies) == len(chunks), "demo expects compressible data"
        width = pad_to_bucket(max(len(b) for b, _ in bodies))
        srcs, lens = batch_streams([b for b, _ in bodies], width)
        declens = np.array([d for _, d in bodies], np.int32)

        # Host half of the decode: on TPU the flattener resolves copy
        # chains to per-byte indices (one chunk-parallel C++ call); on
        # CPU the hybrid route's op-start bitmaps play the same role.
        bits = np.zeros((len(bodies), width // 8), np.uint8)
        if on_tpu:
            idxp, tmeta, fallb, herrs, _dt = native.flatten_idx_batch(
                srcs, lens.astype(np.uint64), declens.astype(np.uint64),
                65536, layout=1,
            )
            assert not fallb.any() and int(herrs.max(initial=0)) == 0
        else:
            native.scan_ops_batch(srcs, lens.astype(np.uint64), bits)

        # Pad the batch axis to the mesh size and ship each array with
        # its block-axis sharding (rows land on their own devices).
        pb = -(-len(bodies) // ndev) * ndev

        def _pad(a):
            return np.pad(a, [(0, pb - a.shape[0])] + [(0, 0)] * (a.ndim - 1))

        if on_tpu:
            idxp_d = jax.device_put(_pad(idxp), row_sharding)
            tmeta_d = jax.device_put(
                _pad(tmeta), NamedSharding(mesh, P("blocks", None, None))
            )
        srcs, lens, declens, bits = (
            jax.device_put(_pad(srcs), row_sharding),
            jax.device_put(_pad(lens), vec_sharding),
            jax.device_put(_pad(declens), vec_sharding),
            jax.device_put(_pad(bits), row_sharding),
        )
        if on_tpu:
            out = sharded_decode_streams_flat(
                mesh, srcs, idxp_d, tmeta_d, declens, d_pad=65536
            )
            errc = np.zeros(len(bodies), np.int32)  # host flatten validated
            out_len = declens
        else:
            out, errc, out_len = sharded_decode_streams_hosted(
                mesh, srcs, lens, declens, bits, d_pad=65536
            )
        if np.any(np.asarray(errc)[: len(bodies)] != 0):
            raise SystemExit("corrupt shard")

        # `out` is (B, 65536) u8, still sharded over the mesh — the
        # train step consumes it without a host round-trip.
        params, loss = train_step(params, out, out_len)
        print(f"step {step_no}: loss {float(loss):.6f}")

        # Demo-only verification (a real loop would skip this fetch).
        got = b"".join(
            np.asarray(out[i, : int(out_len[i])]).tobytes()
            for i in range(len(bodies))
        )
        assert got == plain, "decoded bytes != stored bytes"

    print("pipeline ok")


if __name__ == "__main__":
    main()
