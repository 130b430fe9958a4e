"""Batched device frame decoding (`ops.api.decompress_frame`) tests.

Error-semantics parity with the sequential streaming reader is the
contract: same exception type, same field values, earliest-chunk-wins
ordering (reference ``src/read.rs:105-238``).
"""

import io

import numpy as np
import pytest

from conftest import load_corpus

jax = pytest.importorskip("jax")

from snappy_tpu import error as err  # noqa: E402
from snappy_tpu import read as rmod  # noqa: E402
from snappy_tpu import write as wmod  # noqa: E402
from snappy_tpu.ops import api  # noqa: E402


def frame_stream(data: bytes) -> bytes:
    buf = io.BytesIO()
    enc = wmod.FrameEncoder(buf)
    enc.write(data)
    enc.flush()
    return buf.getvalue()


def host_outcome(stream: bytes):
    try:
        return ("ok", rmod.FrameDecoder(io.BytesIO(stream)).read())
    except BaseException as e:  # noqa: BLE001
        return (type(e).__name__, getattr(e, "_values", lambda: str(e))())


def device_outcome(stream: bytes):
    try:
        return ("ok", api.decompress_frame(stream))
    except BaseException as e:  # noqa: BLE001
        return (type(e).__name__, getattr(e, "_values", lambda: str(e))())


@pytest.mark.parametrize("name", ["asyoulik.txt", "fireworks.jpeg"])
def test_decompress_frame_roundtrip(name):
    data = load_corpus(name)
    stream = frame_stream(data)
    assert api.decompress_frame(stream) == data
    # Concatenated streams are legal (recurring stream identifier).
    assert api.decompress_frame(stream + stream) == data + data


def test_decompress_frame_empty_and_ident_only():
    assert api.decompress_frame(b"") == b""
    assert api.decompress_frame(b"\xff\x06\x00\x00sNaPpY") == b""


def test_decompress_frame_pallas_route(monkeypatch):
    """The whole-frame path (fused decode+CRC) under the Pallas route
    (SNAPPY_TPU_PALLAS_DECODE=1): bytes and checksum verification agree
    with the default route, including a corrupted-checksum rejection."""
    import snappy_tpu.error as err

    data = load_corpus("asyoulik.txt")[: 2 * 65536 + 777]
    stream = frame_stream(data)
    monkeypatch.setenv("SNAPPY_TPU_PALLAS_DECODE", "1")
    assert api.decompress_frame(stream) == data
    bad = bytearray(stream)
    bad[15] ^= 0x40  # flip a CRC bit of the first data chunk
    with pytest.raises(err.SnappyError):
        api.decompress_frame(bytes(bad))


def test_frame_decoder_device_engine_slurp():
    data = load_corpus("html")
    dec = rmod.FrameDecoder(io.BytesIO(frame_stream(data)), engine="device")
    assert dec.read() == data


@pytest.mark.parametrize(
    "mutate",
    [
        lambda s: s[:1] + bytes([s[1] ^ 1]) + s[2:],  # stream ident length
        lambda s: s[:14] + bytes([s[14] ^ 0xFF]) + s[15:],  # payload byte
        lambda s: s[:11] + bytes([s[11] ^ 0x40]) + s[12:],  # CRC byte
        lambda s: s[:-3],  # truncated final chunk
        lambda s: s + b"\x05\x01\x00\x00x",  # reserved-unskippable trailer
        lambda s: s + b"\xfe\x02\x00\x00xy",  # trailing padding chunk (ok)
        lambda s: b"garbage" + s,  # missing stream header
    ],
    ids=[
        "ident-len",
        "payload-flip",
        "crc-flip",
        "truncated",
        "reserved-unskippable",
        "trailing-padding",
        "leading-garbage",
    ],
)
def test_decompress_frame_error_parity(mutate):
    stream = mutate(frame_stream(load_corpus("asyoulik.txt")[:100000]))
    h = host_outcome(stream)
    d = device_outcome(stream)
    assert h == d, f"host={h!r} device={d!r}"


@pytest.mark.parametrize("name", ["baddata1.snappy", "baddata2.snappy", "baddata3.snappy"])
def test_decompress_frame_baddata_parity(name):
    raw = load_corpus(name)
    assert host_outcome(raw) == device_outcome(raw)
