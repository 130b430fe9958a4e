"""Pallas TPU kernel: CRC32C as a K-tiled int8 MXU contraction.

**Status: toolchain canary, not a production path.** This was the
project's first Pallas kernel (SURVEY.md §7.2: validate the toolchain
and u8<->u32 packing idioms) and it stays exactly that: every
production device CRC routes through ``ops.crc32c.crc32c_masked_blocks``
(the XLA-MXU formulation, 21.6 GB/s on-chip vs ~0.9 here —
BENCH_TPU_r04.json), and the host frame path uses the hardware-CRC C++
engine. Callers: ``tests/test_pallas.py`` (interpret-mode bit-exactness)
and ``tools/tpu_validate.py`` (lowering canary). Do not wire it into
``ops/frame.py`` or ``ops/api.py``.

Same mathematics as ``ops/crc32c.py`` (CRC linearity over GF(2):
``crc_bits = parity(bits @ W)``), but with explicit on-chip staging: the
16 MiB positional contribution matrix ``W`` streams through VMEM one
K-tile per grid step (Mosaic double-buffers the DMA automatically),
block bytes expand to bits in-register per tile, and ``int32`` partial
counts accumulate in the output block across the K axis — HBM traffic
is one read of the blocks + one read of ``W`` per batch tile, with no
``(B, S*8)`` bit materialization like the XLA twin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..crc32c import _apply_gathered, _contribution_matrix, _unshift_tables

#: Batch rows per program.
_BT = 8
#: Block bytes consumed per K grid step (KT*8 bit-columns of W).
_KT = 2048


def _kernel(blocks_ref, w_ref, counts_ref):
    """Grid (batch_tile, k): accumulate one K-tile of counts."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        counts_ref[:, :] = jnp.zeros((_BT, 32), jnp.int32)

    chunk = blocks_ref[:, :].astype(jnp.int32)  # (BT, KT)
    # Bit-plane layout: bits[b, j*KT + k] = bit j of byte k (a lane-dim
    # concat Mosaic can lower; W is permuted to match on the host).
    # Shifts run in int32: Mosaic's sub-word shift support is limited.
    bits = jnp.concatenate(
        [((chunk >> j) & 1).astype(jnp.int8) for j in range(8)], axis=1
    )
    counts_ref[:, :] += jax.lax.dot_general(
        bits,
        w_ref[:, :],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@functools.partial(jax.jit, static_argnames=())
def crc32c_blocks_pallas(blocks, lengths):
    """Unmasked CRC32C per row; Pallas twin of ``ops.crc32c.crc32c_blocks``.

    ``blocks``: ``(B, S)`` uint8 zero-padded, S a power of two multiple
    of ``_KT``; ``B`` a multiple of 8. Returns ``(B,)`` uint32.
    """
    b, s = blocks.shape
    if s % _KT or b % _BT:
        raise ValueError(f"shape {(b, s)} not tiled by ({_BT}, {_KT})")
    w, r0 = _contribution_matrix(s)
    # Permute W rows to the kernel's bit-plane layout: within each
    # KT-byte tile, row order becomes (bit j, byte k).
    w = (
        np.ascontiguousarray(
            w.reshape(s // _KT, _KT, 8, 32).transpose(0, 2, 1, 3)
        ).reshape(s * 8, 32)
    )

    counts = pl.pallas_call(
        _kernel,
        grid=(b // _BT, s // _KT),
        in_specs=[
            pl.BlockSpec((_BT, _KT), lambda i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_KT * 8, 32), lambda i, k: (k, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((_BT, 32), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 32), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * 8 * 32, bytes_accessed=b * s + s * 8 * 32, transcendentals=0
        ),
    )(blocks, jnp.asarray(w))

    reg_bits = (counts & 1).astype(jnp.uint32) << np.uint32(np.arange(32))
    reg = jax.lax.reduce(
        reg_bits, np.uint32(0), jax.lax.bitwise_xor, (1,)
    ) ^ np.uint32(r0)
    c = reg ^ np.uint32(0xFFFFFFFF)

    ff = np.uint32(0xFFFFFFFF)
    z = (np.int32(s) - lengths).astype(jnp.int32)
    t1, t2 = _unshift_tables(s)
    r = c ^ ff
    r = _apply_gathered(t1, z & 0xFF, r)
    r = _apply_gathered(t2, z >> 8, r)
    return r ^ ff
