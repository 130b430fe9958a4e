"""Pallas TPU kernels for the hot codec ops.

Each kernel has an XLA-composed twin in ``snappy_tpu.ops`` (the
functional reference); these versions control memory placement
explicitly — VMEM-resident state, DMA-pipelined constants — where the
XLA twin round-trips HBM between passes. The kernels are manually
selected twins: callers opt in explicitly (e.g.
``ops.pallas.crc32c.crc32c_blocks_pallas``); the ``ops`` entry points
do not auto-route here.
"""
