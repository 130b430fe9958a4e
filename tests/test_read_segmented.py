"""Segmented FrameDecoder fill (native engine) — parity with the
chunk-at-a-time walk under every boundary condition.

The native-engine ``FrameDecoder`` decodes bounded wire segments
chunk-parallel in C++ (``read.py:_fill_segment``); these tests pin that
its observable behavior — bytes delivered, error type/position, and
post-error resume — is identical to the sequential reader the reference
specifies (``src/read.rs:105-238``).
"""

import io
import os
import random

import pytest

import snappy_tpu.error as err
from snappy_tpu import native
from snappy_tpu.read import FrameDecoder

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable"
)

DATA_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "data")


def _corpus(name):
    with open(os.path.join(DATA_DIR, name), "rb") as f:
        return f.read()


def _drain(stream, engine, read_size=65536, max_reads=10_000):
    """(bytes, [(position, exc_type, exc_str), ...]) — reads past errors."""
    out = bytearray()
    errors = []
    dec = FrameDecoder(io.BytesIO(stream), engine=engine)
    for _ in range(max_reads):
        try:
            c = dec.read(read_size)
            if not c:
                break
            out += c
        except (err.SnappyError, EOFError) as e:
            errors.append((len(out), type(e).__name__, str(e)))
    return bytes(out), errors


def _assert_parity(stream, read_size=65536):
    got = _drain(stream, "native", read_size)
    want = _drain(stream, "reference", read_size)
    assert got == want


class _Dribble:
    """Reader that delivers at most ``step`` bytes per read (interactive
    pipe): the segmented fill must fall through to sequential behavior
    instead of blocking for a full segment."""

    def __init__(self, data, step):
        self._b = io.BytesIO(data)
        self._step = step

    def read(self, n=-1):
        if n is None or n < 0:
            return self._b.read(self._step)
        return self._b.read(min(n, self._step))


def test_multi_segment_identity():
    data = (_corpus("html") + _corpus("urls.10K")) * 40  # > one 8 MiB segment
    frame = native.frame_compress(data)
    dec = FrameDecoder(io.BytesIO(frame), engine="native")
    out = bytearray()
    while True:
        c = dec.read(1 << 20)
        if not c:
            break
        out += c
    assert bytes(out) == data


def test_hyper_compressible_scratch_bounded():
    """A zeros stream expands ~44x from wire bytes; the declared-output
    scan cap must bound the decode scratch, not the wire budget."""
    data = b"\x00" * (48 << 20)
    frame = native.frame_compress(data)
    dec = FrameDecoder(io.BytesIO(frame), engine="native")
    n = 0
    while True:
        c = dec.read(1 << 20)
        if not c:
            break
        n += len(c)
    assert n == len(data)
    assert dec._seg_scratch.shape[0] <= FrameDecoder._SEGMENT_OUT + (1 << 16)


def test_mutation_parity_with_resume():
    rng = random.Random(1234)
    small = native.frame_compress(_corpus("html"))
    for _ in range(150):
        buf = bytearray(small)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        _assert_parity(bytes(buf))


def test_truncation_parity():
    small = native.frame_compress(_corpus("alice29.txt"))
    for cut in (0, 3, 5, 9, 10, 11, 13, 17, 100, len(small) // 2, len(small) - 1):
        _assert_parity(small[:cut])


def test_structural_streams_parity():
    small = native.frame_compress(_corpus("html"))
    ident = small[:10]
    for stream in (
        small + small,                                   # concatenation
        ident + b"\xfe\x06\x00\x00padded" + small[10:],  # padding chunk
        ident + b"\x90\x03\x00\x00abc" + small[10:],     # skippable chunk
        ident,                                           # ident only
        ident + b"\xfe\x05\x00\x00abcde",                # ident+padding only
        b"\x42" + small[1:],                             # ident corrupted
        small[10:],                                      # ident missing
    ):
        _assert_parity(stream)


def test_dribbling_pipe_parity():
    """Byte-trickling source: must decode correctly without waiting for a
    full segment, at several delivery granularities."""
    data = _corpus("geo.protodata")
    frame = native.frame_compress(data)
    for step in (1 << 12, 1 << 16, 1 << 20):
        out = bytearray()
        dec = FrameDecoder(_Dribble(frame, step), engine="native")
        while True:
            c = dec.read(1 << 16)
            if not c:
                break
            out += c
        assert bytes(out) == data, step


class _OneBurstThenHang:
    """Delivers everything in one short read, then would block forever
    (simulated by failing the test): data available on a live pipe must
    be delivered without waiting for a full 8 MiB segment."""

    def __init__(self, data):
        self._data = data
        self._given = False

    def read(self, n=-1):
        if self._given:
            pytest.fail("reader blocked for more wire despite decodable data")
        self._given = True
        return self._data


def test_live_pipe_burst_delivered_promptly():
    data = _corpus("geo.protodata")
    frame = native.frame_compress(data)
    dec = FrameDecoder(_OneBurstThenHang(frame), engine="native")
    # The whole burst (well under a segment) must decode on this read.
    out = dec.read(len(data))
    assert out == data[: len(out)] and len(out) > 0


def test_buffered_bad_header_raises_without_blocking():
    """A decidable-bad chunk header that arrived in the same burst as
    good chunks must surface right after the good data — not after
    another (potentially forever-blocking) read of the source."""
    data = _corpus("geo.protodata")
    frame = bytearray(native.frame_compress(data))
    frame += b"\x00\xff\xff\xff"  # oversized length field, no payload
    dec = FrameDecoder(_OneBurstThenHang(bytes(frame)), engine="native")
    out = bytearray()
    with pytest.raises(err.UnsupportedChunkLength):
        while True:
            c = dec.read(1 << 20)
            if not c:
                break
            out += c
    assert bytes(out) == data  # full good prefix delivered first


def test_oversized_length_header_parity():
    """A length field above MAX_COMPRESS_BLOCK_SIZE must raise without
    waiting for its (absent) payload."""
    small = native.frame_compress(_corpus("html"))
    bad = bytearray(small)
    # First data chunk starts at offset 10; set its 24-bit length to max.
    bad[11:14] = b"\xff\xff\xff"
    _assert_parity(bytes(bad))


def test_huge_declared_declen_parity():
    """A compressed chunk declaring a huge output must not inflate the
    decode scratch; sequential raises UnsupportedChunkLength."""
    ident = native.frame_compress(_corpus("html"))[:10]
    # Compressed chunk: crc 4 bytes + 5-byte varint declaring ~4 GiB.
    payload = b"\x00\x00\x00\x00" + b"\xff\xff\xff\xff\x0f" + b"\x00a"
    chunk = bytes([0x00, len(payload) & 0xFF, (len(payload) >> 8) & 0xFF, 0]) + payload
    _assert_parity(ident + chunk)


def test_segment_boundary_read_sizes():
    data = _corpus("paper-100k.pdf") * 100  # ~10 MB, crosses a segment
    frame = native.frame_compress(data)
    for rs in (333, 65536, 1 << 22):
        out = bytearray()
        dec = FrameDecoder(io.BytesIO(frame), engine="native")
        while True:
            c = dec.read(rs)
            if not c:
                break
            out += c
        assert bytes(out) == data, rs


def test_single_byte_reads():
    data = _corpus("html")[:20000]
    frame = native.frame_compress(data)
    dec = FrameDecoder(io.BytesIO(frame), engine="native")
    out = bytearray()
    while True:
        c = dec.read(1)
        if not c:
            break
        out += c
    assert bytes(out) == data
