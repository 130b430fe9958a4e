"""Batched device (JAX/XLA/Pallas) codec ops.

This package is the TPU compute path: fixed-shape batch codecs over
``uint8`` arrays, jit/vmap/shard_map friendly. The host API in
``snappy_tpu.raw`` / ``snappy_tpu.read`` / ``snappy_tpu.write`` routes
large inputs here; ``snappy_tpu.parallel`` shards the batch axis over a
device mesh.

Public surface:

- :func:`decode_batch` — batched parallel raw decompression;
- :func:`decode_batch_hosted` — the hybrid variant (host op-start
  bitmaps from :func:`snappy_tpu.native.scan_ops`; the production path);
- :func:`compress_blocks` — bit-exact batched compression;
- :func:`compress_blocks_fast` — the fast-profile parallel compressor;
- :func:`crc32c_blocks` / :func:`crc32c_masked_blocks` — MXU CRC32C;
- :func:`encode_frame_chunks` — fused frame-chunk pipeline;
- :mod:`snappy_tpu.ops.api` — host-facing bytes-in/bytes-out wrappers;
- :mod:`snappy_tpu.ops.packing` — batch marshalling helpers;
- :mod:`snappy_tpu.ops.pallas` — manually-selected Pallas kernel twins.
"""

from . import api, packing  # noqa: F401
from .crc32c import crc32c_blocks, crc32c_masked_blocks  # noqa: F401
from .decode import decode_batch, decode_batch_hosted  # noqa: F401
from .encode import compress_blocks  # noqa: F401
from .encode_fast import compress_blocks_fast  # noqa: F401
from .frame import encode_frame_chunks  # noqa: F401
