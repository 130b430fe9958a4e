"""Format-core tests: constants, varints, tables, CRC32C.

Coverage model: reference ``test/tests.rs`` plus CRC32C known-answer
vectors (the reference trusts its build.rs tables; we verify against the
published CRC32C check values).
"""

import numpy as np
import pytest

from snappy_tpu.format import constants as C
from snappy_tpu.format import crc32c as crc
from snappy_tpu.format import tables, varint


def test_max_compress_len():
    assert C.max_compress_len(0) == 32
    assert C.max_compress_len(65536) == 76490
    assert C.max_compress_len(C.MAX_INPUT_SIZE + 1) == 0
    # Bound itself must not exceed MAX_INPUT_SIZE.
    assert C.max_compress_len(C.MAX_INPUT_SIZE) == 0


@pytest.mark.parametrize(
    "n",
    [0, 1, 127, 128, 300, 16384, 65535, 65536, 2**21, 2**32 - 1, 2**63, 2**64 - 1],
)
def test_varint_roundtrip(n):
    enc = varint.write_varu64(n)
    val, ln = varint.read_varu64(enc)
    assert (val, ln) == (n, len(enc))
    # Trailing bytes are ignored.
    val, ln = varint.read_varu64(enc + b"\xAB\xCD")
    assert (val, ln) == (n, len(enc))


def test_varint_truncated_and_overflow():
    assert varint.read_varu64(b"") == (0, 0)
    assert varint.read_varu64(b"\xFF") == (0, 0)  # continuation then EOF
    # 10 continuation bytes then terminator: shift reaches 70 -> overflow.
    assert varint.read_varu64(b"\xff" * 10 + b"\x00") == (0, 0)
    # 2^32 encodes fine (TooBig is the codec's job, not the varint's).
    assert varint.read_varu64(b"\x80\x80\x80\x80\x10") == (2**32, 5)


def test_tag_lookup_table_entries():
    t = tables.tag_lookup_table()
    assert t.shape == (256,)
    # Literal with length 1 (tag 0b000000_00).
    assert t[0b000000_00] == 1
    # Literal with length 60 (stored directly).
    assert t[59 << 2] == 60
    # Long literals store the trailer byte count in bits 11+.
    assert t[60 << 2] == 1 << 11
    assert t[63 << 2] == 4 << 11
    # Copy1: tag 0b000_000_01 -> len 4, 1 tag byte.
    assert t[0b000_000_01] == (1 << 11) | 4
    # Copy1 with offset-high bits 0b111 and len field 0b111 -> len 11.
    assert t[0b111_111_01] == (1 << 11) | (0b111 << 8) | 11
    # Copy2: tag (len-1)<<2|2.
    assert t[(63 << 2) | 2] == (2 << 11) | 64
    # Copy4.
    assert t[(0 << 2) | 3] == (4 << 11) | 1


def test_crc32c_known_answers():
    # Published CRC32C check values.
    assert crc.crc32c(b"") == 0
    assert crc.crc32c(b"123456789") == 0xE3069283
    assert crc.crc32c(b"a") == 0xC1D04330
    assert crc.crc32c(bytes(32)) == 0x8A9136AA
    assert crc.crc32c(bytes([0xFF] * 32)) == 0x62A8AB43


def test_crc_masking_roundtrip():
    for v in [0, 1, 0xDEADBEEF, 0xFFFFFFFF, 0xE3069283]:
        assert C.unmask_crc(C.mask_crc(v)) == v


def test_crc32c_matches_native_if_available():
    from snappy_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(0)
    for n in [0, 1, 7, 15, 16, 17, 255, 4096, 65536]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.crc32c(data) == crc.crc32c(data)
        assert native.crc32c_masked(data) == crc.crc32c_masked(data)
