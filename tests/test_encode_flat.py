"""The flat device encoder (ops/encode_flat.py + pallas/encode_flat.py).

Interpret-mode on the CPU backend: the lockstep parse + vectorized
emission must produce valid Snappy that round-trips bit-exactly and
stays at-or-under the host fast profile's size class. The full-corpus
size contract (<= reference per file) is pinned on real hardware by
tools/encode_flat_check.py (FAILURES: 0, OVER: [] — see R4_NOTES.md).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from snappy_tpu.format import reference as ref
from snappy_tpu.format.varint import write_varu64
from snappy_tpu.ops.encode_flat import compress_blocks_flat
from snappy_tpu.ops.packing import blocks_of


def _roundtrip(blocks, lens):
    out, out_len, ovf = compress_blocks_flat(
        jnp.asarray(blocks), jnp.asarray(lens)
    )
    out, out_len, ovf = np.asarray(out), np.asarray(out_len), np.asarray(ovf)
    assert not ovf.any()
    for i in range(blocks.shape[0]):
        n = int(lens[i])
        body = out[i, : out_len[i]].tobytes()
        got = ref.decompress(write_varu64(n) + body) if n else b""
        assert got == blocks[i, :n].tobytes(), f"row {i}"
    return out, out_len


def test_flat_encoder_roundtrips_mixed_content():
    rng = np.random.default_rng(11)
    texts = [
        (b"the quick brown fox jumps over the lazy dog. " * 200)[:8192],
        bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),  # incompressible
        b"ab" * 4096,  # overlap-heavy
        bytes(rng.integers(0, 4, 6000, dtype=np.uint8)),  # low entropy
        b"z" * 8192,  # long run (copy splitting, 68/64/60 rule)
        b"x" * 100,
    ]
    width = 65536
    blocks = np.zeros((len(texts), width), np.uint8)
    lens = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        blocks[i, : len(t)] = np.frombuffer(t, np.uint8)
        lens[i] = len(t)
    _roundtrip(blocks, lens)


def test_flat_encoder_edges():
    blocks = np.zeros((4, 65536), np.uint8)
    lens = np.array([0, 1, 10, 15], np.int64)  # all below MIN_NON_LITERAL
    blocks[1, 0] = 7
    blocks[2, :10] = np.arange(10)
    blocks[3, :15] = 3
    out, out_len = _roundtrip(blocks, lens)
    # tiny blocks are a single literal: header + content
    assert out_len[0] == 0
    assert out_len[1] == 2 and out[1, 0] == 0  # (len-1)<<2 literal tag
    assert out_len[3] == 16


def test_flat_encoder_size_vs_host_fast_profile():
    """On compressible text the flat profile must land in the same size
    class as the host fast profile (within 5%) and round-trip."""
    from snappy_tpu.ops.encode_fast import compress_blocks_fast_host

    data = open("data/asyoulik.txt", "rb").read()[:65536]
    blocks, lens = blocks_of(data)
    out, out_len = _roundtrip(blocks, lens)
    fout, flen = compress_blocks_fast_host(blocks, lens)
    assert int(out_len.sum()) <= int(flen.sum()) * 1.05


def test_flat_encoder_full_64k_block_from_corpus():
    data = open("data/geo.protodata", "rb").read()
    blocks, lens = blocks_of(data)
    _roundtrip(blocks[:1], lens[:1])


def test_flat_profile_routing_via_api(monkeypatch):
    """Config.flat_encode=True routes compress(profile='fast') through
    the flat device encoder; the stream stays oracle-decodable."""
    from snappy_tpu import configure
    from snappy_tpu.ops import api

    data = (b"flat profile routing " * 400)[:8000]
    with configure(flat_encode=True):
        comp = api.compress(data, profile="fast")
    assert ref.decompress(comp) == data


def test_flat_host_wrapper_contract():
    from snappy_tpu.ops.encode_flat import OUT_W, compress_blocks_flat_host

    data = open("data/alice29.txt", "rb").read()[:65536]
    blocks, lens = blocks_of(data)
    out, out_len = compress_blocks_flat_host(blocks, lens)
    assert out.shape == (1, OUT_W) and out.dtype == np.uint8
    body = out[0, : out_len[0]].tobytes()
    assert ref.decompress(write_varu64(len(data)) + body) == data


def test_flat_encoder_size_contract_vs_reference():
    """Per-file size contract (one block per class here; the full-corpus
    contract is pinned on-chip by tools/encode_flat_check.py): flat
    output must not exceed the reference encoder's bytes."""
    from snappy_tpu import raw

    enc_ref = raw.Encoder(engine="native")
    for name in ("alice29.txt", "fireworks.jpeg"):
        data = open(f"data/{name}", "rb").read()[:65536]
        blocks, lens = blocks_of(data)
        out, out_len = _roundtrip(blocks, lens)
        ref_len = len(enc_ref.compress_vec(data)) - len(
            write_varu64(len(data))
        )
        assert int(out_len[0]) <= ref_len, name


def test_rank_perm_matches_sort_compaction():
    """The counts-based rank permutation (ops/encode_flat._rank_perm)
    must equal the sort-based compaction on arbitrary per-segment count
    patterns — including empty segments, full segments, and all-empty
    blocks (RANK_AB.json records why the sort remains the production
    engine; the permutation itself is the exactness contract here)."""
    import jax
    import jax.numpy as jnp

    from snappy_tpu.ops.encode_flat import NSEG, _rank_perm
    from snappy_tpu.ops.pallas.encode_flat import MAX_REC

    nr = NSEG * MAX_REC
    rng = np.random.default_rng(11)
    cnts = np.stack(
        [
            rng.integers(0, MAX_REC + 1, NSEG),   # general
            np.zeros(NSEG, np.int64),             # all-empty
            np.full(NSEG, MAX_REC, np.int64),     # all-full
            np.r_[np.zeros(64, np.int64), rng.integers(0, 3, 64)],  # sparse
        ]
    ).astype(np.int32)
    B = cnts.shape[0]

    kix = np.arange(MAX_REC)[None, None, :]
    valid = (kix < cnts[:, :, None]).reshape(B, nr)
    slot = np.broadcast_to(np.arange(nr, dtype=np.int32)[None, :], (B, nr))
    key = np.where(valid, slot, nr + 1)
    payload = rng.integers(0, 1 << 30, (B, nr)).astype(np.int32)
    _, want = jax.lax.sort(
        (jnp.asarray(key), jnp.asarray(payload)), dimension=1, num_keys=1
    )

    slot_r, ok = _rank_perm(jnp.asarray(cnts), nr)
    got = jnp.where(ok, jnp.take_along_axis(jnp.asarray(payload), slot_r, axis=1), 0)
    nvalid = valid.sum(axis=1)
    ok_np = np.asarray(ok)
    assert (ok_np.sum(axis=1) == nvalid).all()
    w = np.asarray(want)
    g = np.asarray(got)
    for i in range(B):
        assert (w[i, : nvalid[i]] == g[i, : nvalid[i]]).all(), i
