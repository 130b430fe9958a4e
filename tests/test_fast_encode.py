"""Fast-profile (parallel parse) encoder tests.

Contract (BASELINE.json): output must round-trip bit-exactly through any
conforming decoder, and compressed size must be <= the reference
encoder's on the bundled corpus. Bit-identity is *not* promised — that
is the exact profile's contract (tests/test_ops.py).
"""

import io

import numpy as np
import pytest

from conftest import load_corpus

jax = pytest.importorskip("jax")

from snappy_tpu.format import reference as ref  # noqa: E402
from snappy_tpu.format.varint import write_varu64  # noqa: E402
from snappy_tpu.ops import api  # noqa: E402
from snappy_tpu.ops.encode_fast import compress_blocks_fast_host  # noqa: E402
from snappy_tpu.ops.packing import blocks_of  # noqa: E402


def fast_compress(data: bytes) -> bytes:
    return api.compress(data, profile="fast")


@pytest.mark.parametrize("name", ["html", "alice29.txt", "geo.protodata", "fireworks.jpeg"])
def test_fast_roundtrip_and_size(name):
    data = load_corpus(name)
    fc = fast_compress(data)
    assert ref.decompress(fc) == data
    assert len(fc) <= len(ref.compress(data))


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"0123456789abcdef",
        b"0123456789abcdefg",
        b"a" * 70000,  # cross-block RLE
        b"ab" * 40000,
        bytes(65536 + 3),
        (b"hello world! " * 6000)[:70001],
    ],
    ids=["empty", "one", "b16", "b17", "rle-a", "rle-ab", "zeros", "period13"],
)
def test_fast_edge_roundtrip(data):
    fc = fast_compress(data)
    assert ref.decompress(fc) == data
    assert len(fc) <= len(ref.compress(data))


def test_fast_random_quickcheck():
    rng = np.random.default_rng(7)
    for _ in range(8):
        n = int(rng.integers(1, 4000))
        seg = rng.integers(0, 256, max(n // 5, 1), dtype=np.uint8).tobytes()
        data = (seg * 6)[:n]
        fc = fast_compress(data)
        assert ref.decompress(fc) == data


def test_device_engines_via_public_api():
    from snappy_tpu import raw

    data = load_corpus("html")
    exact = raw.Encoder(engine="device").compress_vec(data)
    assert exact == ref.compress(data)  # bit-identical contract
    fast = raw.Encoder(engine="device-fast").compress_vec(data)
    assert raw.Decoder(engine="device").decompress_vec(fast) == data
    assert len(fast) <= len(exact)


def test_frame_writer_device_engine_batched(tmp_path):
    from snappy_tpu import read as rmod
    from snappy_tpu import write as wmod

    data = load_corpus("asyoulik.txt")
    # Exact device framing must match the host writer byte-for-byte.
    host_buf, dev_buf = io.BytesIO(), io.BytesIO()
    for buf, eng in ((host_buf, "auto"), (dev_buf, "device")):
        enc = wmod.FrameEncoder(buf, engine=eng)
        enc.write(data)
        enc.flush()
    assert dev_buf.getvalue() == host_buf.getvalue()

    # Fast device framing: different bytes, same decoded content.
    fast_buf = io.BytesIO()
    enc = wmod.FrameEncoder(fast_buf, engine="device-fast")
    enc.write(data)
    enc.flush()
    assert rmod.FrameDecoder(io.BytesIO(fast_buf.getvalue())).read() == data
    assert len(fast_buf.getvalue()) <= len(host_buf.getvalue())
