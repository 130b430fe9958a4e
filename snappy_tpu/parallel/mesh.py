"""Device mesh helpers and the execution-tuning config.

Execution knobs only — nothing here may affect output bytes (the format
constants are frozen in ``snappy_tpu.format.constants``; the reference's
analogous split is compile-time constants vs. nothing, SURVEY.md §5
config section).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
from jax.sharding import Mesh

#: The single mesh axis: independent blocks/chunks. Data-parallel only —
#: Snappy has no tensor/pipeline dimension to shard.
BLOCK_AXIS = "blocks"


def make_mesh(devices=None, axis: str = BLOCK_AXIS) -> Mesh:
    """1-D mesh over ``devices`` (default: all local devices)."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis,))


def auto_mesh() -> Mesh:
    return make_mesh()


@dataclass(frozen=True)
class ParallelConfig:
    """Host-side batching policy for the device codec paths."""

    #: Blocks per device per launch (trades HBM footprint vs. launch count).
    blocks_per_device: int = 64
    #: Streams below this stay on the host fast path (launch-latency bound;
    #: the reference's analogous cutoff is the small-block literal bailout,
    #: src/compress.rs:139-146).
    min_device_bytes: int = 1 << 18
