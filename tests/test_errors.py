"""Corrupt-input tests: exact error values for malformed streams.

Port of the ``testerrored!`` cases in reference ``test/tests.rs:345-465``.
Every engine must produce the identical error value (variant + fields).
"""

import pytest

from snappy_tpu import error as err
from snappy_tpu import raw


def engines():
    from snappy_tpu import native

    names = ["reference"]
    if native.available():
        names.append("native")
    try:
        import jax  # noqa: F401

        # The device engine must re-raise the identical sequential error
        # for every flagged stream (host re-run of the oracle).
        names.append("device")
    except Exception:
        pass
    return names


def assert_errored(data: bytes, expected, bad_header: bool = False):
    for engine in engines():
        if bad_header:
            with pytest.raises(err.SnappyError) as ei:
                raw.decompress_len(data)
            assert ei.value == expected, f"decompress_len[{engine}]: {ei.value!r}"
            buf = bytearray(1024)
        else:
            buf = bytearray(raw.decompress_len(data))
        with pytest.raises(err.SnappyError) as ei:
            raw.Decoder(engine=engine).decompress(data, buf)
        assert ei.value == expected, f"decompress[{engine}]: {ei.value!r}"


def test_err_empty():
    assert_errored(b"", err.Empty())


def test_err_header_mismatch():
    assert_errored(b"\x05\x00a", err.HeaderMismatch(expected_len=5, got_len=1))


def test_err_varint1():
    assert_errored(b"\xFF", err.Header(), bad_header=True)


def test_err_varint2():
    assert_errored(
        b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff\x00",
        err.Header(),
        bad_header=True,
    )


def test_err_varint3():
    assert_errored(
        b"\x80\x80\x80\x80\x10",
        err.TooBig(given=4294967296, max=4294967295),
        bad_header=True,
    )


def test_err_lit():
    # Literal of length 1 consumes 'h'; 'i' is a copy1 missing its offset.
    assert_errored(b"\x02\x00hi", err.CopyRead(len=1, src_len=0))


def test_err_lit_big1():
    assert_errored(b"\x02\xechi", err.Literal(len=60, src_len=2, dst_len=2))


def test_err_lit_big2a():
    assert_errored(b"\x02\xf0hi", err.Literal(len=4, src_len=2, dst_len=2))


def test_err_lit_big2b():
    assert_errored(
        b"\x02\xf0hi\x00\x00\x00",
        err.Literal(len=105, src_len=4, dst_len=2),
    )


def test_err_copy1():
    assert_errored(b"\x02\x00a\x01", err.CopyRead(len=1, src_len=0))


def test_err_copy2a():
    assert_errored(b"\x11\x00a\x3e", err.CopyRead(len=2, src_len=0))


def test_err_copy2b():
    assert_errored(b"\x11\x00a\x3e\x01", err.CopyRead(len=2, src_len=1))


def test_err_copy3a():
    assert_errored(b"\x11\x00a\x3f", err.CopyRead(len=4, src_len=0))


def test_err_copy3b():
    assert_errored(b"\x11\x00a\x3f\x00", err.CopyRead(len=4, src_len=1))


def test_err_copy3c():
    assert_errored(b"\x11\x00a\x3f\x00\x00", err.CopyRead(len=4, src_len=2))


def test_err_copy3d():
    assert_errored(b"\x11\x00a\x3f\x00\x00\x00", err.CopyRead(len=4, src_len=3))


def test_err_copy_offset_zero():
    assert_errored(b"\x11\x00a\x01\x00", err.Offset(offset=0, dst_pos=1))


def test_err_copy_offset_big():
    assert_errored(b"\x11\x00a\x01\xFF", err.Offset(offset=255, dst_pos=1))


def test_err_copy_len_big():
    assert_errored(b"\x05\x00a\x1d\x01", err.CopyWrite(len=11, dst_len=4))


def test_error_equality_and_display():
    e1 = err.Literal(len=1, src_len=2, dst_len=3)
    e2 = err.Literal(len=1, src_len=2, dst_len=3)
    e3 = err.Literal(len=9, src_len=2, dst_len=3)
    assert e1 == e2 and e1 != e3 and e1 != err.Empty()
    assert "literal read of length 1" in str(e1)
    assert "corrupt input (empty)" in str(err.Empty())


def test_compress_too_big_rejected():
    # Can't allocate 4 GiB in tests; exercise the size-validation branch via
    # the reference functions directly.
    from snappy_tpu.format.constants import MAX_INPUT_SIZE, max_compress_len

    assert max_compress_len(MAX_INPUT_SIZE + 1) == 0


def test_frame_declen_too_big_precedence():
    # A compressed frame chunk whose varint declen exceeds MAX_INPUT_SIZE
    # raises TooBig (decompress_len's check) on every engine — before the
    # MAX_BLOCK_SIZE chunk-length comparison (reference src/read.rs:210-218).
    import io

    from snappy_tpu import read as rmod
    from snappy_tpu.format.constants import STREAM_BODY
    from snappy_tpu.format.varint import write_varu64

    body = write_varu64((1 << 32) + 5) + b"\x00" * 4
    payload = b"\x00\x00\x00\x00" + body
    chunk = bytes([0x00]) + len(payload).to_bytes(3, "little") + payload
    data = b"\xff\x06\x00\x00" + STREAM_BODY + chunk
    expected = err.TooBig(given=(1 << 32) + 5, max=(1 << 32) - 1)
    for engine in ("reference", "native", "device"):
        with pytest.raises(err.TooBig) as ei:
            rmod.FrameDecoder(io.BytesIO(data), engine=engine).read()
        assert ei.value == expected


def test_huge_declared_declen_is_bounded():
    # A few-byte raw stream declaring a near-MAX declen must not size
    # device scratch from the attacker-controlled value; the device path
    # routes it to the sequential host engine, which raises the exact
    # reference error without multi-GiB allocation amplification.
    from snappy_tpu.format.varint import write_varu64
    from snappy_tpu.ops import api as device_api

    crafted = write_varu64((1 << 27) + 3) + b"\x00\x61\x61"
    with pytest.raises(err.SnappyError) as dev_err:
        device_api.decompress(crafted)
    with pytest.raises(err.SnappyError) as ref_err:
        raw.Decoder(engine="reference").decompress_vec(crafted)
    assert dev_err.value == ref_err.value


def test_engine_env_var(monkeypatch):
    from snappy_tpu import engine as eng

    monkeypatch.setenv("SNAPPY_TPU_ENGINE", "reference")
    assert eng.get_engine().name == "reference"
    assert eng.get_engine("auto").name == "reference"
    # Explicit non-auto argument wins over the env knob.
    monkeypatch.setenv("SNAPPY_TPU_ENGINE", "native")
    assert eng.get_engine("reference").name == "reference"


def test_engine_env_device_no_recursion(monkeypatch):
    # With SNAPPY_TPU_ENGINE=device, the device path's host fallbacks
    # must resolve to a real host engine, not recurse back into the
    # device engine (regression: review r2).
    from snappy_tpu.format.varint import write_varu64
    from snappy_tpu.ops import api as device_api

    monkeypatch.setenv("SNAPPY_TPU_ENGINE", "device")
    crafted = write_varu64((1 << 27) + 3) + b"\x00\x61\x61"
    with pytest.raises(err.SnappyError):
        device_api.decompress(crafted)


def test_into_buffer_readonly_raises():
    # Read-only output buffers must raise, not be mutated through the
    # native fast path (regression: review r2).
    data = b"hello world, hello world, hello world"
    comp = raw.Encoder().compress_vec(data)
    out = bytes(raw.max_compress_len(len(data)))
    with pytest.raises(TypeError):
        raw.Encoder(engine="native").compress(data, out)
    dout = bytes(len(data))
    with pytest.raises(TypeError):
        raw.Decoder(engine="native").decompress(comp, dout)
