"""Frame-format tests: streaming encoders/decoders, chunk semantics, CRCs.

Covers reference ``test/tests.rs`` frame round-trips plus the chunk-type
rules of ``src/read.rs:137-236`` (reserved ranges, padding, repeated stream
identifiers, checksum failures, truncation).
"""

import io

import pytest

from conftest import CORPUS_FILES, load_corpus
from snappy_tpu import error as err
from snappy_tpu.format.constants import (
    CHUNK_TYPE_PADDING,
    MAX_BLOCK_SIZE,
    STREAM_IDENTIFIER,
)
from snappy_tpu.read import FrameDecoder
from snappy_tpu.read import FrameEncoder as ReadFrameEncoder
from snappy_tpu.write import FrameEncoder as WriteFrameEncoder


def write_frame_press(data: bytes) -> bytes:
    buf = io.BytesIO()
    enc = WriteFrameEncoder(buf)
    enc.write(data)
    inner = enc.into_inner()
    return inner.getvalue()


def read_frame_press(data: bytes) -> bytes:
    return ReadFrameEncoder(io.BytesIO(data)).read()


def read_frame_depress(data: bytes) -> bytes:
    return FrameDecoder(io.BytesIO(data)).read()


@pytest.mark.parametrize("name", CORPUS_FILES)
def test_roundtrip_frame(name):
    data = load_corpus(name)
    assert read_frame_depress(write_frame_press(data)) == data


@pytest.mark.parametrize("name", CORPUS_FILES)
def test_read_and_write_frame_encoder_match(name):
    data = load_corpus(name)
    assert read_frame_press(data) == write_frame_press(data)


def test_frame_empty_write():
    assert write_frame_press(b"") == b""
    assert read_frame_depress(b"") == b""


def test_frame_one_byte():
    data = b"\x00"
    assert read_frame_depress(write_frame_press(data)) == data


def test_incompressible_uses_uncompressed_chunk():
    data = load_corpus("fireworks.jpeg")[:1000]
    framed = write_frame_press(data)
    # chunk type right after the stream identifier
    assert framed[len(STREAM_IDENTIFIER)] == 0x01
    assert read_frame_depress(framed) == data


def test_compressible_uses_compressed_chunk():
    data = b"abcd" * 1000
    framed = write_frame_press(data)
    assert framed[len(STREAM_IDENTIFIER)] == 0x00
    assert read_frame_depress(framed) == data


def test_concatenated_streams():
    a = write_frame_press(b"hello ")
    b = write_frame_press(b"world")
    assert read_frame_depress(a + b) == b"hello world"


def test_padding_and_skippable_chunks():
    framed = bytearray(write_frame_press(b"data!"))
    ident_end = len(STREAM_IDENTIFIER)
    padding = bytes([CHUNK_TYPE_PADDING, 3, 0, 0]) + b"\x00\x00\x00"
    skippable = bytes([0x80, 2, 0, 0]) + b"xy"
    injected = bytes(framed[:ident_end]) + padding + skippable + bytes(framed[ident_end:])
    assert read_frame_depress(injected) == b"data!"


def test_reserved_unskippable_chunk_errors():
    framed = write_frame_press(b"data!")
    injected = framed[: len(STREAM_IDENTIFIER)] + bytes([0x02, 1, 0, 0, 0]) + framed[len(STREAM_IDENTIFIER):]
    with pytest.raises(err.UnsupportedChunkType) as ei:
        read_frame_depress(injected)
    assert ei.value == err.UnsupportedChunkType(byte=0x02)


def test_missing_stream_header_errors():
    with pytest.raises(err.StreamHeader) as ei:
        read_frame_depress(b"\x01\x05\x00\x00xxxxx")
    assert ei.value == err.StreamHeader(byte=1)


def test_stream_header_mismatch():
    bad = b"\xFF\x06\x00\x00sNaPpX" + b""
    with pytest.raises(err.StreamHeaderMismatch) as ei:
        read_frame_depress(bad)
    assert ei.value.bytes == b"sNaPpX"


def test_stream_header_bad_length():
    bad = b"\xFF\x07\x00\x00sNaPpY!"
    with pytest.raises(err.UnsupportedChunkLength) as ei:
        read_frame_depress(bad)
    assert ei.value == err.UnsupportedChunkLength(len=7, header=True)


def test_bad_checksum_detected():
    framed = bytearray(write_frame_press(b"checksum me please" * 10))
    # Corrupt the CRC field of the first data chunk (bytes 4..8 after header).
    pos = len(STREAM_IDENTIFIER) + 4
    framed[pos] ^= 0xFF
    with pytest.raises(err.Checksum):
        read_frame_depress(bytes(framed))


def test_short_input_truncated_stream():
    # Reference regression for issue #42: 3 bytes is not even a header.
    with pytest.raises(EOFError):
        read_frame_depress(b"123")


def test_truncated_chunk_payload():
    framed = write_frame_press(b"hello world")
    with pytest.raises(EOFError):
        read_frame_depress(framed[:-3])


def test_read_frame_encoder_big_and_little_buffers():
    data = load_corpus("html")
    big = ReadFrameEncoder(io.BytesIO(data))
    big_out = big.read()
    little = ReadFrameEncoder(io.BytesIO(data))
    little_out = bytearray()
    while True:
        chunk = little.read(5)
        if not chunk:
            break
        little_out += chunk
    assert big_out == bytes(little_out)


def test_write_encoder_partial_source_reads():
    class TrickleReader(io.RawIOBase):
        """Returns at most 7 bytes per read."""

        def __init__(self, data):
            self.data = data
            self.pos = 0

        def read(self, n=-1):
            if self.pos >= len(self.data):
                return b""
            out = self.data[self.pos : self.pos + min(7, n if n > 0 else 7)]
            self.pos += len(out)
            return out

    data = b"trickle" * 100
    out = ReadFrameEncoder(TrickleReader(data)).read()
    assert read_frame_depress(out) == data


def test_write_encoder_multiblock():
    data = load_corpus("html_x_4")  # > 6 blocks
    framed = write_frame_press(data)
    assert read_frame_depress(framed) == data
    # There must be ceil(len/65536) data chunks.
    n_chunks = 0
    pos = 0
    while pos < len(framed):
        ty = framed[pos]
        ln = framed[pos + 1] | (framed[pos + 2] << 8) | (framed[pos + 3] << 16)
        if ty in (0x00, 0x01):
            n_chunks += 1
        pos += 4 + ln
    assert n_chunks == -(-len(data) // MAX_BLOCK_SIZE)


def test_write_encoder_large_single_write_matches_chunked_writes():
    data = load_corpus("html_x_4")
    one = write_frame_press(data)
    buf = io.BytesIO()
    enc = WriteFrameEncoder(buf)
    for i in range(0, len(data), MAX_BLOCK_SIZE):
        enc.write(data[i : i + MAX_BLOCK_SIZE])
    enc.into_inner()
    assert buf.getvalue() == one


def test_into_inner_error_recovery():
    class FailingWriter:
        def __init__(self):
            self.fail = False

        def write(self, b):
            if self.fail:
                raise OSError("disk full")
            return len(b)

        def flush(self):
            pass

    w = FailingWriter()
    enc = WriteFrameEncoder(w)
    enc.write(b"some data")
    w.fail = True
    with pytest.raises(err.IntoInnerError) as ei:
        enc.into_inner()
    recovered = ei.value.into_inner()
    assert recovered is enc
    assert isinstance(ei.value.error(), OSError)


def test_flush_on_close():
    buf = io.BytesIO()
    enc = WriteFrameEncoder(buf)
    enc.write(b"close flushes")
    enc.close()
    assert read_frame_depress(buf.getvalue()) == b"close flushes"


@pytest.mark.parametrize("name", ["baddata1.snappy", "baddata2.snappy", "baddata3.snappy"])
def test_baddata_rejected(name):
    # Corrupt frame streams inherited from golang/snappy must error (any
    # SnappyError or truncation), never crash or return wrong data.
    data = load_corpus(name)
    with pytest.raises((err.SnappyError, EOFError)):
        read_frame_depress(data)


def test_native_frame_codec_parity():
    """Multithreaded native frame codec: byte-identity + error parity."""
    import io

    import pytest as _pytest

    from conftest import load_corpus
    from snappy_tpu import native
    from snappy_tpu import read as rmod
    from snappy_tpu import write as wmod

    if not native.available():
        _pytest.skip("no native toolchain")
    data = load_corpus("lcet10.txt") + load_corpus("geo.protodata")
    buf = io.BytesIO()
    enc = wmod.FrameEncoder(buf, engine="reference")
    enc.write(data)
    enc.flush()
    want = buf.getvalue()
    assert native.frame_compress(data) == want
    assert native.frame_decompress(want) == data
    assert native.frame_compress(b"") == b""
    assert native.frame_decompress(b"") == b""

    def outcome(f):
        try:
            return ("ok", f())
        except BaseException as e:  # noqa: BLE001
            return (type(e).__name__, getattr(e, "_values", lambda: str(e))())

    for mutate in (
        lambda s: s[:14] + bytes([s[14] ^ 0xFF]) + s[15:],
        lambda s: s[:-3],
        lambda s: b"x" + s,
        lambda s: s + b"\x05\x01\x00\x00x",
        lambda s: s[:11] + bytes([s[11] ^ 0x40]) + s[12:],
        lambda s: s[:1] + bytes([s[1] ^ 1]) + s[2:],
    ):
        ms = mutate(want)
        a = outcome(lambda: native.frame_decompress(ms))
        b = outcome(lambda: rmod.FrameDecoder(io.BytesIO(ms)).read())
        assert a == b, f"native={a!r} python={b!r}"


def test_frame_writer_native_batched_path():
    """write.FrameEncoder(engine='native') large writes use the native
    multithreaded framing; bytes identical to the chunked host path."""
    import io

    from conftest import load_corpus
    from snappy_tpu import native
    from snappy_tpu import write as wmod

    if not native.available():
        import pytest as _pytest

        _pytest.skip("no native toolchain")
    data = load_corpus("plrabn12.txt")
    a, b = io.BytesIO(), io.BytesIO()
    for buf, eng in ((a, "reference"), (b, "native")):
        enc = wmod.FrameEncoder(buf, engine=eng)
        enc.write(data)  # large single write -> bypass + batched path
        enc.flush()
    assert a.getvalue() == b.getvalue()


def test_reprs_redact_buffers():
    # The adapters' reprs deliberately redact their internal buffers,
    # mirroring the reference's hand-written Debug impls
    # (src/read.rs:241-254, src/write.rs:195-213).
    import io

    from snappy_tpu import read as rmod, write as wmod

    data = b"hello hello hello hello"
    buf = io.BytesIO()
    w = wmod.FrameEncoder(buf)
    w.write(data)
    assert "src=[...]" in repr(w) and data.hex() not in repr(w)
    w.flush()
    d = rmod.FrameDecoder(io.BytesIO(buf.getvalue()))
    d.read(4)
    assert "dst=[...]" in repr(d)
    e = rmod.FrameEncoder(io.BytesIO(data))
    e.read(4)
    assert "dst=[...]" in repr(e)


def test_read_frame_encoder_readinto_zero_copy_path():
    """Caller buffers >= one max frame take the direct-fill path
    (reference zero-copy, src/read.rs:33-35, 350-354): bytes identical
    to the buffered read() path, one whole frame per call."""
    import io

    from snappy_tpu.read import (
        MAX_READ_FRAME_ENCODER_BLOCK_SIZE,
        FrameEncoder as ReadFrameEncoder,
    )

    data = load_corpus("alice29.txt")[:200000]
    want = ReadFrameEncoder(io.BytesIO(data)).read()

    enc = ReadFrameEncoder(io.BytesIO(data))
    buf = bytearray(MAX_READ_FRAME_ENCODER_BLOCK_SIZE)
    out = bytearray()
    while True:
        n = enc.readinto(buf)
        if n == 0:
            break
        out += buf[:n]
    assert bytes(out) == want

    # mixed small/large calls agree too (drain-then-direct transitions)
    enc2 = ReadFrameEncoder(io.BytesIO(data))
    out2 = bytearray()
    small = bytearray(1000)
    toggle = False
    while True:
        b = small if toggle else buf
        toggle = not toggle
        n = enc2.readinto(b)
        if n == 0:
            break
        out2 += b[:n]
    assert bytes(out2) == want
