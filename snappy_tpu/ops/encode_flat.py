"""XLA side of the flat device encoder: prepass, record math, emission.

Pipeline per 64 KiB block (design + measured costs in R4_NOTES.md):

1. **Prepass** (this module, pure vector XLA): u32 grams; exact
   nearest-previous-occurrence via two 2-key sorts (the XLA scatter the
   old `_prev_occurrence` used measures 400 us/block on TPU — two sorts
   measure 129 us, ENCODE_FLAT_PROBE.json); candidate set with the
   isolated-copy rule on the chain-consistency length estimate; packed
   per-position jump words in segment layout.
2. **Parse** (``pallas/encode_flat.py``): 128 lockstep segment walks
   per block -> copy records.
3. **Emission**: record-size algebra here (closed-form reference
   68/64/60 copy splitting, literal headers with cross-segment run
   merging), byte materialization through windowed one-hot gather
   kernels (decode-v2 machinery).

Reference behavior matched: greedy parse of ``src/compress.rs:195-317``
(same valid-Snappy output contract, compressed size <= the reference's
on every corpus file per GREEDY2_PROTO.json), emission byte rules of
``src/compress.rs:323-357`` (copy splitting) and ``:432-474`` (literal
headers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import MIN_NON_LITERAL_BLOCK_SIZE
from .encode import S
from .pallas.encode_flat import JW_CAND, LANES, MAX_REC, SEG

NSEG = S // SEG  # 128


def _u32_grams(blocks):
    b = blocks.astype(jnp.uint32)
    z = jnp.zeros((b.shape[0], 8), jnp.uint32)
    bp = jnp.concatenate([b, z], axis=1)
    return (
        bp[:, :S]
        | (bp[:, 1 : S + 1] << np.uint32(8))
        | (bp[:, 2 : S + 2] << np.uint32(16))
        | (bp[:, 3 : S + 3] << np.uint32(24))
    )


def _prev_two_sorts(u32, n):
    """Nearest previous same-u32 position (-1 if none), scatter-free.

    Sort (key, position) 2-key; the previous same-key neighbor in
    sorted order is the candidate; a second sort keyed by position
    applies the inverse permutation (129 us/block at B=64 on chip vs
    452 us for the scatter formulation, ENCODE_FLAT_PROBE/SORT_COST)."""
    bsz = u32.shape[0]
    p = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = p <= (n[:, None] - 4)
    key = jnp.where(valid, u32, np.uint32(0xFFFFFFFF))
    idx = jnp.broadcast_to(p, (bsz, S)).astype(jnp.int32)
    skey, sidx = jax.lax.sort((key, idx), dimension=1, num_keys=2)
    same = jnp.concatenate(
        [jnp.zeros((bsz, 1), bool), skey[:, 1:] == skey[:, :-1]], axis=1
    )
    cand = jnp.concatenate(
        [jnp.full((bsz, 1), -1, jnp.int32), sidx[:, :-1]], axis=1
    )
    cand = jnp.where(same, cand, -1)
    _, prev = jax.lax.sort((sidx, cand), dimension=1, num_keys=1)
    return jnp.where(valid, prev, -1)


def _seg_layout(x):
    """(B, S) position-major -> (B, 128, SEG): row = segment (sublane
    orientation; Mosaic has lane broadcasts but not sublane ones)."""
    b = x.shape[0]
    return x.reshape(b, NSEG, SEG)


def prepass(blocks, lengths):
    """Vector prepass: returns kernel inputs (jw, u32seg, planes).

    ``jw``/``u32seg``: ``(B, 128, SEG)`` int32 segment layout.
    ``planes``: ``(B, 4*512, 128)`` bf16 — four byte-shifted copies of
    the block in absolute (row = pos>>7) layout for the extension
    gather (bytes are bf16-exact).
    """
    bsz = blocks.shape[0]
    n = lengths.astype(jnp.int32)
    p = jnp.arange(S, dtype=jnp.int32)[None, :]
    u32 = _u32_grams(blocks)
    prev = _prev_two_sorts(u32, n)

    usable = n[:, None] >= MIN_NON_LITERAL_BLOCK_SIZE
    cand = (prev >= 0) & usable
    off = jnp.where(cand, p - prev, 0)

    # chain-consistency estimate (a guaranteed lower length bound)
    nxt_prev = jnp.concatenate(
        [prev[:, 1:], jnp.full((bsz, 1), -1, jnp.int32)], axis=1
    )
    nxt_cand = jnp.concatenate([cand[:, 1:], jnp.zeros((bsz, 1), bool)], axis=1)
    c = cand & nxt_cand & (nxt_prev == prev + 1)
    z = jnp.where(c, jnp.int32(S), p)
    nxt0 = jax.lax.cummin(z[:, ::-1], axis=1)[:, ::-1]
    lhat = jnp.where(cand, 4 + (nxt0 - p), 0)
    lhat = jnp.minimum(lhat, jnp.maximum(n[:, None] - p, 0))

    # isolated-copy skip on the estimate (the fast profile's cost-model
    # rule; fixes fireworks.jpeg, GREEDY2_PROTO.json)
    lp4 = jnp.concatenate([lhat[:, 4:], jnp.zeros((bsz, 4), jnp.int32)], axis=1)
    iso = (lhat == 4) & (off > 2047) & (lp4 < 4)
    cand = cand & ~iso

    # segment-boundary exclusion: a copy needs >= 4 bytes before the
    # forced boundary
    seg_end = jnp.minimum((p // SEG + 1) * SEG, n[:, None])
    cand = cand & (seg_end - p >= 4)
    off = jnp.where(cand, off, 0)
    lhatc = jnp.where(cand, jnp.minimum(lhat, seg_end - p), 0)

    # skip hops over the final candidate set, segment-relative
    zc = jnp.where(cand, p, jnp.int32(S))
    nxtc = jax.lax.cummin(zc[:, ::-1], axis=1)[:, ::-1]
    seg_base = (p // SEG) * SEG
    rel = jnp.clip(nxtc - seg_base, 0, SEG)

    jw = jnp.where(cand, off | (lhatc << 16) | JW_CAND, rel)

    planes = []
    zpad = jnp.zeros((bsz, 4), blocks.dtype)
    wide = jnp.concatenate([blocks, zpad], axis=1)
    for k in range(4):
        planes.append(wide[:, k : k + S].reshape(bsz, 512, 128))
    planes = jnp.concatenate(planes, axis=1).astype(jnp.bfloat16)

    return _seg_layout(jw), _seg_layout(u32.astype(jnp.int32)), planes
