"""Multi-chip scale-out: mesh construction + shard_map'd batch codecs.

Snappy's unit of parallelism is the independent 64 KiB block / frame
chunk (SURVEY.md §2 checklist): no shared dictionary, no cross-block
offsets, so the data path needs **zero** collectives — sharding the
block axis over a 1-D mesh is the whole story, and the only cross-device
information ever exchanged is the per-block compressed length vector
used for ordered stream assembly (an all-gather of a few KB).
"""

from .mesh import ParallelConfig, auto_mesh, make_mesh  # noqa: F401
from .sharded import (  # noqa: F401
    sharded_compress_blocks,
    sharded_decode_streams,
    sharded_encode_frame_chunks,
)
