"""Pallas TPU kernels for the hot codec ops.

Each kernel has an XLA-composed twin in ``snappy_tpu.ops`` (the
functional reference); these versions control memory placement
explicitly — VMEM-resident payloads, SMEM-staged scalar state — where
the XLA twin round-trips HBM between passes. All three lower and run
byte-correct on real TPU hardware (``BENCH_TPU_VALIDATE.json``).

Routing: on a real TPU backend the decode replay and the exact encoder
ARE the production routes (``ops.api.decompress_streams`` /
``ops.api.compress(profile='exact')`` dispatch here — measured 2.2–8.7x
and 5.9x over the XLA formulations, ``BENCH_PALLAS_VS_XLA.json``), with
``SNAPPY_TPU_PALLAS_DECODE`` / ``SNAPPY_TPU_PALLAS_ENCODE`` =1/0 as the
overrides. The CRC kernel remains a manually-selected twin (the MXU
matmul formulation in ``ops.crc32c`` is faster); on non-TPU backends
every kernel is opt-in only (interpret mode).
"""
