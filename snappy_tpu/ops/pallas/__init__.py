"""Pallas TPU kernels for the hot codec ops.

Each kernel has an XLA-composed twin in ``snappy_tpu.ops`` (the
functional reference); these versions control memory placement
explicitly — VMEM-resident state, DMA-pipelined constants — where the
XLA twin round-trips HBM between passes. Selection is automatic with a
safe fallback: callers use the ``ops`` entry points, which route here
when the Pallas path is available for the shape/backend.
"""
