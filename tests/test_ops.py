"""Device (JAX) codec tests, run on the CPU backend.

Differential strategy mirrors the reference suite (SURVEY.md §4): the
NumPy format oracle plays the role rust-snappy's C++ oracle plays; the
golden ``.rawsnappy`` pair anchors bit-exactness without any external
dependency (reference ``test/tests.rs:200-205``).
"""

import numpy as np
import pytest

from conftest import load_corpus

jax = pytest.importorskip("jax")

from snappy_tpu import error as err  # noqa: E402
from snappy_tpu.format import reference as ref  # noqa: E402
from snappy_tpu.format.crc32c import crc32c, crc32c_masked  # noqa: E402
from snappy_tpu.format.varint import read_varu64  # noqa: E402
from snappy_tpu.ops import api, packing  # noqa: E402
from snappy_tpu.ops.crc32c import crc32c_blocks, crc32c_masked_blocks  # noqa: E402
from snappy_tpu.ops.decode import (  # noqa: E402
    E_COPYREAD,
    E_HEADER_MISMATCH,
    E_LITERAL,
    E_OFFSET,
    OK,
    decode_batch,
)

# A small but representative corpus slice keeps CI fast; the full-corpus
# sweep runs in bench/verify.
CORPUS_SLICE = ["html", "alice29.txt", "geo.protodata"]


# ---------------------------------------------------------------------------
# CRC32C
# ---------------------------------------------------------------------------


def test_crc32c_device_matches_host_oracle():
    rng = np.random.default_rng(0)
    S = 1024
    lens = [0, 1, 3, 4, 5, 63, 64, 100, 1023, 1024]
    rows = np.zeros((len(lens), S), np.uint8)
    for i, n in enumerate(lens):
        rows[i, :n] = rng.integers(0, 256, n, dtype=np.uint8)
    got = np.asarray(jax.jit(crc32c_blocks)(rows, np.array(lens, np.int32)))
    want = np.array([crc32c(rows[i, :n].tobytes()) for i, n in enumerate(lens)], np.uint32)
    np.testing.assert_array_equal(got, want)
    gotm = np.asarray(jax.jit(crc32c_masked_blocks)(rows, np.array(lens, np.int32)))
    wantm = np.array(
        [crc32c_masked(rows[i, :n].tobytes()) for i, n in enumerate(lens)], np.uint32
    )
    np.testing.assert_array_equal(gotm, wantm)


def test_crc32c_device_corpus():
    data = load_corpus("html")[:65536]
    row = np.zeros((1, 65536), np.uint8)
    row[0, : len(data)] = np.frombuffer(data, np.uint8)
    got = int(np.asarray(crc32c_blocks(row, np.array([len(data)], np.int32)))[0])
    assert got == crc32c(data)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _device_decompress_err(comp: bytes) -> int:
    declen, h = read_varu64(comp)
    body = comp[h:]
    s = packing.pad_to_bucket(max(len(body), 1), 256)
    d = packing.pad_to_bucket(max(declen, 1), 256)
    srcs, lens = packing.batch_streams([body], s)
    _, e, _ = decode_batch(srcs, lens, np.array([declen], np.int32), d)
    return int(np.asarray(e)[0])


@pytest.mark.parametrize("name", CORPUS_SLICE)
def test_decode_device_roundtrip(name):
    data = load_corpus(name)
    comp = ref.compress(data)
    assert api.decompress(comp) == data


def test_decode_device_golden(golden_text, golden_rawsnappy):
    assert api.decompress(golden_rawsnappy) == golden_text


@pytest.mark.parametrize(
    "data",
    [b"", b"a", b"ab" * 40000, bytes(70000), b"abcabc" * 12000],
    ids=["empty", "one", "ab-rle", "zeros", "abc-rle"],
)
def test_decode_device_edge_patterns(data):
    assert api.decompress(ref.compress(data)) == data


@pytest.mark.parametrize(
    "comp,code",
    [
        (b"\x05\x54hello", E_LITERAL),  # literal claims more than src has
        (b"\x05\xfc\xff\xff\xff\xff", E_LITERAL),  # 2^32-length literal
        (b"\x05\xf4", E_LITERAL),  # truncated long-length read
        (b"\x04\x0d\x01\x42\x3f", E_OFFSET),  # copy offset > dst pos
        (b"\x02\x00abc", E_COPYREAD),  # truncated copy2 trailer
        (b"\x05\x04abcd\x09\x00", E_COPYREAD),  # truncated copy4 trailer
        (b"\x03\x00ab", E_COPYREAD),
        (b"\x03\x04ab", E_HEADER_MISMATCH),  # promises 3, gives 2
    ],
)
def test_decode_device_error_codes(comp, code):
    assert _device_decompress_err(comp) == code


def test_decompress_exact_error_objects():
    # The API re-raises the reference's exact exception on flagged input.
    with pytest.raises(err.Literal) as ei:
        api.decompress(b"\x05\x54hello")
    assert ei.value == err.Literal(len=22, src_len=5, dst_len=5)
    with pytest.raises(err.Offset) as ei:
        api.decompress(b"\x04\x0d\x01\x42\x3f")
    assert ei.value == err.Offset(offset=1, dst_pos=0)
    with pytest.raises(err.Empty):
        api.decompress(b"")


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", CORPUS_SLICE)
def test_encode_device_bit_exact(name):
    data = load_corpus(name)
    assert api.compress(data) == ref.compress(data)


def test_encode_device_golden(golden_text, golden_rawsnappy):
    assert api.compress(golden_text) == golden_rawsnappy


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"0123456789abcdef",  # 16 bytes: below MIN_NON_LITERAL_BLOCK_SIZE
        b"0123456789abcdefg",  # 17 bytes: the automaton path
        b"a" * 1000,
        b"hello world, hello world, hello hello",
        bytes(range(256)) * 300,  # multi-block, periodic
    ],
    ids=["empty", "one", "b16", "b17", "rle", "hello", "periodic"],
)
def test_encode_device_edge_bit_exact(data):
    assert api.compress(data) == ref.compress(data)


def test_encode_device_multiblock_boundary():
    # > 64 KiB: per-block table reset must match the reference exactly.
    data = (load_corpus("alice29.txt") * 2)[: 65536 + 12345]
    assert api.compress(data) == ref.compress(data)


def test_encode_quickcheck_random():
    rng = np.random.default_rng(42)
    for _ in range(10):
        n = int(rng.integers(0, 5000))
        # Mix of compressible and random segments.
        seg = rng.integers(0, 256, max(n // 7, 1), dtype=np.uint8).tobytes()
        data = (seg * 8)[:n]
        assert api.compress(data) == ref.compress(data)
        assert api.decompress(api.compress(data)) == data


def test_decode_device_copy4_tags():
    """copy4 ops are never emitted by conforming encoders but must
    decode (reference src/decompress.rs:233-343, tag 0b11). Handcraft a
    stream using them and compare all decoders byte-for-byte."""
    # 8 literal bytes, then a copy4 (len 6, offset 8), then copy4 len 30
    # offset 3 (overlapping RLE chain through a copy4).
    lit = bytes([7 << 2]) + b"abcdefgh"
    c1 = bytes([(6 - 1) << 2 | 0b11]) + (8).to_bytes(4, "little")
    c2 = bytes([(30 - 1) << 2 | 0b11]) + (3).to_bytes(4, "little")
    body = lit + c1 + c2
    declen = 8 + 6 + 30
    from snappy_tpu.format.varint import write_varu64

    stream = write_varu64(declen) + body
    want = ref.decompress(stream)
    assert api.decompress(stream) == want
    from snappy_tpu import raw

    assert raw.Decoder(engine="native").decompress_vec(stream) == want

    # Same for 3/4-byte literal length headers (tags 62/63) — also
    # never emitted, also mandatory (src/decompress.rs:160-228).
    payload = bytes(range(256)) + b"xyz"
    for tag, nb in ((62, 3), (63, 4)):
        body = bytes([tag << 2]) + (len(payload) - 1).to_bytes(nb, "little") + payload
        stream = write_varu64(len(payload)) + body
        want = ref.decompress(stream)
        assert api.decompress(stream) == want
        assert raw.Decoder(engine="native").decompress_vec(stream) == want


def test_hosted_decode_matches_pure_device():
    # Hybrid split (host op-scan + device resolve) must be bit-identical
    # to the all-device formulation, including error codes, on valid,
    # corrupt, and random streams.
    import jax.numpy as jnp

    from snappy_tpu import native
    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import read_varu64
    from snappy_tpu.ops.decode import decode_batch, decode_batch_hosted

    if not native.available():
        pytest.skip("native runtime unavailable")

    rng = np.random.default_rng(31)
    bodies, declens = [], []
    datas = [
        load_corpus("geo.protodata")[:65536],
        load_corpus("html")[:30000],
        b"a" * 2000,
        bytes(rng.integers(0, 256, 700, dtype=np.uint8)),
    ]
    for data in datas:
        c = ref.compress(data)
        _, h = read_varu64(c)
        bodies.append(c[h:])
        declens.append(len(data))
    # Corrupt vectors: same bodies with flipped bytes + classic errors.
    bad = bytearray(bodies[1])
    bad[5] ^= 0xFF
    bodies.append(bytes(bad)); declens.append(declens[1])
    bodies.append(b"\x00a\x1d\x01"); declens.append(5)
    bodies.append(b"\xf0" + b"a" * 10); declens.append(4)
    for _ in range(10):
        n = int(rng.integers(1, 400))
        bodies.append(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        declens.append(int(rng.integers(0, 500)))

    S = -(-max(len(b) for b in bodies) // 1024) * 1024
    srcs = np.zeros((len(bodies), S), np.uint8)
    slens = np.zeros(len(bodies), np.int32)
    bits = np.zeros((len(bodies), S // 8), np.uint8)
    for i, b in enumerate(bodies):
        srcs[i, : len(b)] = np.frombuffer(b, np.uint8)
        slens[i] = len(b)
        native.scan_ops(b, bits[i])
    d_pad = 65536
    args = (jnp.asarray(srcs), jnp.asarray(slens), jnp.asarray(np.asarray(declens, np.int32)))
    pure = decode_batch(*args, d_pad)
    host = decode_batch_hosted(*args, jnp.asarray(bits), d_pad)
    np.testing.assert_array_equal(np.asarray(pure[0]), np.asarray(host[0]))
    np.testing.assert_array_equal(np.asarray(pure[1]), np.asarray(host[1]))
    np.testing.assert_array_equal(np.asarray(pure[2]), np.asarray(host[2]))


def test_native_scan_ops_matches_device_orbit():
    # The host tag walk must mark exactly the orbit the device discovers.
    import jax
    import jax.numpy as jnp

    from snappy_tpu import native
    from snappy_tpu.ops.decode import _discover_ops, _parse_positions

    if not native.available():
        pytest.skip("native runtime unavailable")

    rng = np.random.default_rng(77)
    for trial in range(12):
        n = int(rng.integers(1, 600))
        body = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        S = 1024
        src = np.zeros(S, np.uint8)
        src[:n] = np.frombuffer(body, np.uint8)
        fields = jax.jit(_parse_positions)(jnp.asarray(src), jnp.int32(n))
        mask, _, _ = jax.jit(_discover_ops)(
            fields["consumed"], fields["produced"], jnp.int32(n)
        )
        bits = native.scan_ops(body, np.zeros(S // 8, np.uint8))
        host_mask = np.unpackbits(bits, bitorder="little")[:S].astype(bool)
        np.testing.assert_array_equal(np.asarray(mask), host_mask, err_msg=f"trial {trial}")


def test_debug_sanitizer_mode(monkeypatch):
    # SNAPPY_TPU_DEBUG=1 cross-checks every device decode against the
    # oracle (the debug_assert analog for the device path); valid and
    # corrupt streams must both pass the cross-check cleanly.
    from snappy_tpu import error as err
    from snappy_tpu.ops import api as device_api

    monkeypatch.setenv("SNAPPY_TPU_DEBUG", "1")
    data = load_corpus("html")[:50000]
    from snappy_tpu.format import reference as ref

    comp = ref.compress(data)
    assert device_api.decompress(comp) == data
    bad = bytearray(comp)
    bad[30] ^= 0xFF
    with pytest.raises(err.SnappyError):
        device_api.decompress(bytes(bad))
