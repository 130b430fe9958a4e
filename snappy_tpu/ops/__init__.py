"""Batched device (JAX/XLA/Pallas) codec ops.

This package is the TPU compute path: fixed-shape batch codecs over
``uint8`` arrays, jit/vmap/shard_map friendly. The host API in
``snappy_tpu.raw`` / ``snappy_tpu.read`` / ``snappy_tpu.write`` routes
large inputs here; ``snappy_tpu.parallel`` shards the batch axis over a
device mesh.
"""

from . import packing  # noqa: F401
from .crc32c import crc32c_blocks, crc32c_masked_blocks  # noqa: F401
