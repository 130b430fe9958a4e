"""Differential tests against the system C++ libsnappy.

The independent oracle the reference suite leans on: an FFI binding to
Google's C++ snappy (reference ``snappy-cpp/src/lib.rs:13-64``), exercised
corpus-wide in both directions (``test/tests.rs:90-160``) and with 10,000
random quickcheck cases each way (``test/tests.rs:547-573``).  These tests
skip cleanly when ``libsnappy`` is not installed.
"""

import numpy as np
import pytest

from conftest import CORPUS_FILES, load_corpus
from snappy_tpu import raw
from snappy_tpu.utils import cpp_oracle as cpp

pytestmark = pytest.mark.skipif(
    not cpp.available(), reason="system libsnappy not available"
)


def press(data: bytes, engine="auto") -> bytes:
    return raw.Encoder(engine=engine).compress_vec(data)


def depress(data: bytes, engine="auto") -> bytes:
    return raw.Decoder(engine=engine).decompress_vec(data)


ALL_INPUT_NAMES = CORPUS_FILES + ["Mark.Twain-Tom.Sawyer.txt"]


@pytest.mark.parametrize("name", ALL_INPUT_NAMES)
def test_cpp_decompresses_ours(name):
    # reference test/tests.rs:90-122 (cpp_decompresses_rust)
    data = load_corpus(name)
    assert cpp.decompress(press(data)) == data


@pytest.mark.parametrize("name", ALL_INPUT_NAMES)
def test_ours_decompresses_cpp(name):
    # reference test/tests.rs:124-160 (rust_decompresses_cpp)
    data = load_corpus(name)
    comp = cpp.compress(data)
    assert depress(comp) == data
    assert raw.decompress_len(comp) == len(data)


@pytest.mark.parametrize("name", ALL_INPUT_NAMES)
def test_compressed_bytes_identical_to_cpp(name):
    # Stronger than the reference's interop tests: the reference crate
    # documents byte-for-byte identical output with C++ snappy
    # (README.md:87-90); we assert it directly against libsnappy 1.1.x.
    data = load_corpus(name)
    assert press(data) == cpp.compress(data)


@pytest.mark.parametrize("engine", ["reference"])
def test_cpp_interop_reference_engine(engine):
    # The NumPy oracle itself against C++, on a truncated corpus slice
    # (the oracle is slow; full files are covered by the native engine).
    # The final block is >= 16 KiB so the libsnappy-1.1.9 small-block
    # divergence (see test_small_block_hash_divergence_is_interoperable)
    # doesn't apply.
    data = load_corpus("urls.10K")[: 65536 + 20000]
    comp = press(data, engine=engine)
    assert comp == cpp.compress(data)
    assert cpp.decompress(comp) == data
    assert depress(cpp.compress(data), engine=engine) == data


def test_small_block_hash_divergence_is_interoperable():
    # For blocks in roughly [500, 16384) bytes, libsnappy 1.1.9 emits
    # different (equally valid) bytes than snap-1.1.1/libsnappy-1.1.8: the
    # 1.1.9 compressor changed its small-hash-table strategy upstream.  Our
    # contract is the crate's output (anchored by the golden artifact test),
    # so we assert interop, not identity, in that range — and identity
    # outside it.
    data = load_corpus("urls.10K")
    for n in (100, 200):
        assert press(data[:n]) == cpp.compress(data[:n])
    for n in (256, 4096, 8192):
        blk = data[65536 : 65536 + n]
        ours, theirs = press(blk), cpp.compress(blk)
        assert cpp.decompress(ours) == blk
        assert depress(theirs) == blk
    for n in (16384, 30000):
        blk = data[65536 : 65536 + n]
        assert press(blk) == cpp.compress(blk)


def test_qc_cpp_decompresses_ours():
    # 10,000 random cases, reference test/tests.rs:547-559.
    rng = np.random.default_rng(20260817)
    for i in range(10_000):
        n = int(rng.integers(0, 600))
        alphabet = 256 if (i & 1) else 8
        data = rng.integers(0, alphabet, n, dtype=np.uint8).tobytes()
        comp = press(data)
        assert cpp.decompress(comp) == data, f"case {i}"


def test_qc_ours_decompresses_cpp():
    # 10,000 random cases, reference test/tests.rs:561-573.
    rng = np.random.default_rng(777)
    for i in range(10_000):
        n = int(rng.integers(0, 600))
        alphabet = 256 if (i & 1) else 8
        data = rng.integers(0, alphabet, n, dtype=np.uint8).tobytes()
        comp = cpp.compress(data)
        assert depress(comp) == data, f"case {i}"


def test_cpp_decompresses_device_fast_profile():
    # The fast profile emits different (valid) bytes; the C++ library is an
    # independent validity judge for them.
    from snappy_tpu.ops import api as device_api

    for name in ("html", "geo.protodata"):
        data = load_corpus(name)[: 3 * 65536]
        comp = device_api.compress(data, profile="fast")
        assert cpp.decompress(comp) == data


def test_cpp_decompresses_device_exact_profile():
    from snappy_tpu.ops import api as device_api

    data = load_corpus("alice29.txt")[: 2 * 65536]
    comp = device_api.compress(data)
    assert comp == cpp.compress(data)
    assert cpp.decompress(comp) == data


def test_device_decompresses_cpp():
    from snappy_tpu.ops import api as device_api

    data = load_corpus("geo.protodata")
    assert device_api.decompress(cpp.compress(data)) == data
