"""Batched host raw codec (`stpu_{compress,decompress}_batch`) — identity,
error isolation/ordering, thread equivalence.

The host mirror of the device batch API: the reference crate has no
batch entry point (one stream at a time, ``src/raw.rs``); these calls
are wire-compatible by construction (each row goes through the same
single-stream core) and chunk-parallel across cores.
"""

import os

import numpy as np
import pytest

import snappy_tpu.error as err
from snappy_tpu import native, raw

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable"
)

DATA_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "data")


def _blocks():
    out = []
    for name in ("html", "alice29.txt", "paper-100k.pdf", "geo.protodata"):
        with open(os.path.join(DATA_DIR, name), "rb") as f:
            d = f.read()
        out.extend(d[o : o + 65536] for o in range(0, len(d), 65536))
    return out


@pytest.fixture(scope="module")
def corpus_pairs():
    blocks = _blocks()
    enc = raw.Encoder(engine="native")
    return blocks, [enc.compress_vec(b) for b in blocks]


def test_batch_identity_vs_per_row(corpus_pairs):
    blocks, comp = corpus_pairs
    assert native.compress_batch(blocks) == comp
    assert native.decompress_batch(comp) == blocks


def test_batch_threads_equivalent(corpus_pairs):
    blocks, comp = corpus_pairs
    for threads in (1, 2, 0):
        assert native.compress_batch(blocks, threads=threads) == comp
        assert native.decompress_batch(comp, threads=threads) == blocks


def test_batch_empty_list():
    assert native.compress_batch([]) == []
    assert native.decompress_batch([]) == []


def test_decompress_error_isolation_and_order(corpus_pairs):
    """First failing row in input order raises, with the exact exception
    a row-by-row loop would produce — later rows don't mask earlier ones."""
    _, comp = corpus_pairs
    probe = [comp[0], comp[1][: len(comp[1]) // 2], comp[2], b"\xff" * 9]
    seq_exc = None
    dec = raw.Decoder(engine="reference")
    for b in probe:
        try:
            dec.decompress_vec(b)
        except err.SnappyError as e:
            seq_exc = e
            break
    with pytest.raises(type(seq_exc)) as ei:
        native.decompress_batch(probe)
    assert ei.value == seq_exc


def test_decompress_error_order_header_after_body(corpus_pairs):
    """A later row's header error must not preempt an earlier row's body
    error (the batch pre-pass parses all headers up front)."""
    _, comp = corpus_pairs
    bad_body = comp[0][:-3]  # truncated: body error
    probe = [bad_body, b"\xff" * 9]
    dec = raw.Decoder(engine="reference")
    try:
        dec.decompress_vec(bad_body)
        pytest.skip("truncation happened to stay valid")
    except err.SnappyError as e:
        expect = e
    with pytest.raises(type(expect)) as ei:
        native.decompress_batch(probe)
    assert ei.value == expect


def test_crafted_huge_declen_does_not_inflate_batch(corpus_pairs):
    """A few-byte stream declaring ~4 GiB must not size the whole batch's
    output stride; it is re-decoded row-sequentially with the reference's
    exact error (same guard as the device path, ops/api.py)."""
    _, comp = corpus_pairs
    crafted = b"\xff\xff\xff\xff\x0f" + b"\x00a"
    try:
        raw.Decoder(engine="reference").decompress_vec(crafted)
        expect = None
    except err.SnappyError as e:
        expect = e
    assert expect is not None
    with pytest.raises(type(expect)) as ei:
        native.decompress_batch([comp[0], crafted])
    assert ei.value == expect


def test_compress_batch_error_first_in_order():
    too_big = None
    try:
        native.compress_batch([b"ok"], threads=1)
    except err.SnappyError:  # pragma: no cover - sanity
        pytest.fail("valid row raised")
    # Empty input is valid for compression (header-only stream); check a
    # valid empty row round-trips inside a batch.
    out = native.compress_batch([b"", b"abc"])
    assert raw.Decoder().decompress_vec(out[0]) == b""
    assert raw.Decoder().decompress_vec(out[1]) == b"abc"
    assert too_big is None


def test_scan_ops_batch_matches_per_row(corpus_pairs):
    _, comp = corpus_pairs
    bodies = [c[2:] for c in comp[:8]]
    width = max(len(b) for b in bodies)
    width += (-width) % 8
    n = len(bodies)
    srcs = np.zeros((n, width), np.uint8)
    lens = np.empty(n, np.uint64)
    for i, b in enumerate(bodies):
        srcs[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    bits = np.zeros((n, width // 8), np.uint8)
    native.scan_ops_batch(srcs, lens, bits, threads=2)
    for i, b in enumerate(bodies):
        expect = native.scan_ops(b, np.zeros(width // 8, np.uint8))
        assert np.array_equal(bits[i], expect), f"row {i}"


def test_threads_env_knob(monkeypatch, corpus_pairs):
    """SNAPPY_TPU_THREADS caps the default pool without changing bytes."""
    blocks, comp = corpus_pairs
    monkeypatch.setenv("SNAPPY_TPU_THREADS", "1")
    assert native._threads(0) == 1
    assert native.decompress_batch(comp) == blocks
    assert native.frame_decompress(native.frame_compress(blocks[0])) == blocks[0]
    monkeypatch.setenv("SNAPPY_TPU_THREADS", "not-a-number")
    assert native._threads(0) == 0
