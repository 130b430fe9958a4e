"""Pallas kernel tests (interpreter mode on CPU; compiled on TPU).

The interpret pass is the correctness gate for the kernels in
``snappy_tpu.ops.pallas`` (the reference's analogous practice is keeping
debug assertions in its unsafe cores, SURVEY.md §5 race-detection
mapping).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from snappy_tpu.format.crc32c import crc32c  # noqa: E402


def test_pallas_crc32c_interpret_matches_oracle():
    from jax.experimental.pallas import tpu as pltpu

    from snappy_tpu.ops.pallas.crc32c import crc32c_blocks_pallas

    rng = np.random.default_rng(3)
    b, s = 8, 4096
    rows = np.zeros((b, s), np.uint8)
    lens = np.zeros(b, np.int32)
    for i in range(b):
        n = int(rng.integers(0, s + 1))
        rows[i, :n] = rng.integers(0, 256, n, dtype=np.uint8)
        lens[i] = n
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(crc32c_blocks_pallas(rows, lens))
    want = np.array([crc32c(rows[i, : lens[i]].tobytes()) for i in range(b)], np.uint32)
    np.testing.assert_array_equal(got, want)


def _prep_streams(datas, engine_compress):
    from snappy_tpu.format.varint import read_varu64

    comps = []
    for data in datas:
        c = engine_compress(data)
        _, h = read_varu64(c)
        comps.append(c[h:])
    s_pad = -(-max(len(c) for c in comps) // 128) * 128
    srcs = np.zeros((len(comps), max(s_pad, 128)), np.uint8)
    slens = np.zeros(len(comps), np.int32)
    for i, c in enumerate(comps):
        srcs[i, : len(c)] = np.frombuffer(c, np.uint8)
        slens[i] = len(c)
    declens = np.array([len(d) for d in datas], np.int32)
    return srcs, slens, declens


@pytest.mark.parametrize("fastpath", [False, True, "compose"])
def test_pallas_decode_interpret_bit_exact(fastpath):
    import jax.numpy as jnp

    from snappy_tpu.format import reference as ref
    from snappy_tpu.ops.pallas.decode import decode_batch_pallas

    rng = np.random.default_rng(11)
    datas = [
        b"hello world hello world hello world!",
        bytes(rng.integers(0, 4, 3000, dtype=np.uint8)),  # copy-heavy
        b"a" * 500,  # RLE: offset-1 overlapping copies
        open("data/html", "rb").read()[:4096],
        bytes(rng.integers(0, 256, 1500, dtype=np.uint8)),  # literal-heavy
        b"x",
    ]
    srcs, slens, declens = _prep_streams(datas, ref.compress)
    d_pad = -(-int(declens.max()) // 128) * 128
    dst, errs = decode_batch_pallas(
        jnp.asarray(srcs), jnp.asarray(slens), jnp.asarray(declens), d_pad,
        fastpath=fastpath,
    )
    dst, errs = np.asarray(dst), np.asarray(errs)
    for i, data in enumerate(datas):
        assert errs[i] == 0
        assert dst[i, : len(data)].tobytes() == data
        # Zero-pad contract past declen.
        assert not dst[i, len(data):].any()


@pytest.mark.parametrize("fastpath", [False, True, "compose"])
def test_pallas_decode_interpret_error_parity(fastpath):
    import jax.numpy as jnp

    from snappy_tpu.ops.decode import decode_batch
    from snappy_tpu.ops.pallas.decode import decode_batch_pallas

    # Bodies (varint stripped) of corrupt vectors from the reference's
    # testerrored! suite; codes must match the XLA decoder exactly.
    bodies = [
        (b"\x00a\x1d\x01", 5),  # CopyWrite
        (b"\x00a\x3f\x00", 17),  # CopyRead
        (b"\x00a\x01\x00", 17),  # Offset zero
        (b"\x00a\x01\xFF", 17),  # Offset too big
        (b"\x61", 3),  # literal overrun
        (b"\xff\xff\xff\xff", 4),  # copy4 truncated
        (b"\xf0" + b"a" * 10, 4),  # long literal, declen short
        (b"\x00a", 4),  # ends early -> header mismatch
    ]
    srcs = np.zeros((len(bodies), 128), np.uint8)
    slens = np.zeros(len(bodies), np.int32)
    declens = np.zeros(len(bodies), np.int32)
    for i, (b_, dl) in enumerate(bodies):
        srcs[i, : len(b_)] = np.frombuffer(b_, np.uint8)
        slens[i] = len(b_)
        declens[i] = dl
    args = (jnp.asarray(srcs), jnp.asarray(slens), jnp.asarray(declens), 128)
    _, perrs = decode_batch_pallas(*args, fastpath=fastpath)
    _, xerrs, _ = decode_batch(*args)
    np.testing.assert_array_equal(np.asarray(perrs), np.asarray(xerrs))
    assert np.asarray(perrs).min() > 0  # every vector errors


@pytest.mark.parametrize("fastpath", [False, True, "compose"])
def test_pallas_decode_interpret_quickcheck(fastpath):
    import jax.numpy as jnp

    from snappy_tpu.format import reference as ref
    from snappy_tpu.ops.pallas.decode import decode_batch_pallas

    rng = np.random.default_rng(21)
    datas = []
    for _ in range(6):
        n = int(rng.integers(1, 800))
        alphabet = int(rng.choice([2, 8, 256]))
        datas.append(rng.integers(0, alphabet, n, dtype=np.uint8).tobytes())
    srcs, slens, declens = _prep_streams(datas, ref.compress)
    d_pad = -(-int(declens.max()) // 128) * 128
    dst, errs = decode_batch_pallas(
        jnp.asarray(srcs), jnp.asarray(slens), jnp.asarray(declens), d_pad,
        fastpath=fastpath,
    )
    dst, errs = np.asarray(dst), np.asarray(errs)
    for i, data in enumerate(datas):
        assert errs[i] == 0
        assert dst[i, : len(data)].tobytes() == data


@pytest.mark.parametrize("fastpath", [False, True, "compose"])
def test_pallas_decode_overlap_boundaries(fastpath):
    """Crafted copies at offsets straddling the 128-lane window.

    Targets the period-doubling overlap mover (the kernel's replacement
    for scalar VMEM stores, which real Mosaic rejects): every (offset,
    length) pair crosses a different boundary of the vector window
    arithmetic — offset 1 RLE chains, offsets just under/at/over 128,
    and lengths that end mid-window, exactly at a window, and many
    windows deep.
    """
    import jax.numpy as jnp

    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import write_varu64
    from snappy_tpu.ops.pallas.decode import decode_batch_pallas

    def lit(data: bytes) -> bytes:
        if len(data) <= 60:
            return bytes([(len(data) - 1) << 2]) + data
        assert len(data) <= 256
        return bytes([60 << 2, len(data) - 1]) + data

    def copy2(offset: int, length: int) -> bytes:
        assert 1 <= length <= 64
        return bytes([((length - 1) << 2) | 2, offset & 0xFF, offset >> 8])

    rng = np.random.default_rng(31)
    bodies, datas = [], []
    for off in [1, 2, 3, 96, 127, 128, 129, 255, 256]:
        for total in [1, 64, 127, 128, 129, 300, 1000]:
            seed = rng.integers(0, 256, off, np.uint8).tobytes()
            body = lit(seed)
            rem = total
            while rem > 0:
                k = min(rem, 64)
                body += copy2(off, k)
                rem -= k
            bodies.append(body)
            # Oracle expansion is the expected plaintext.
            datas.append(ref.decompress(write_varu64(off + total) + body))

    s_pad = -(-max(len(b) for b in bodies) // 128) * 128
    srcs = np.zeros((len(bodies), max(s_pad, 128)), np.uint8)
    slens = np.zeros(len(bodies), np.int32)
    for i, b_ in enumerate(bodies):
        srcs[i, : len(b_)] = np.frombuffer(b_, np.uint8)
        slens[i] = len(b_)
    declens = np.array([len(d) for d in datas], np.int32)
    d_pad = -(-int(declens.max()) // 128) * 128
    dst, errs = decode_batch_pallas(
        jnp.asarray(srcs), jnp.asarray(slens), jnp.asarray(declens), d_pad,
        fastpath=fastpath,
    )
    dst, errs = np.asarray(dst), np.asarray(errs)
    for i, data in enumerate(datas):
        assert errs[i] == 0, f"case {i}: err {errs[i]}"
        assert dst[i, : len(data)].tobytes() == data, f"case {i}"
        assert not dst[i, len(data):].any()


def test_pallas_decode_route_env(monkeypatch):
    """SNAPPY_TPU_PALLAS_DECODE=1 routes decompress_streams through the
    replay kernel with identical bytes, error codes, and checksums."""
    monkeypatch.setenv("SNAPPY_TPU_PALLAS_FLAT", "0")  # pin the replay route
    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import read_varu64
    from snappy_tpu.ops import api

    datas = [
        open("data/html", "rb").read()[:3000],
        b"ab" * 700,
        bytes(1200),
    ]
    bodies, declens = [], []
    for d in datas:
        c = ref.compress(d)
        _, h = read_varu64(c)
        bodies.append(c[h:])
        declens.append(len(d))
    bodies.append(b"\x00a\x1d\x01")  # corrupt: CopyWrite
    declens.append(5)

    outs0, errs0, crc0 = api.decompress_streams(bodies, declens, with_crc=True)
    monkeypatch.setenv("SNAPPY_TPU_PALLAS_DECODE", "1")
    outs1, errs1, crc1 = api.decompress_streams(bodies, declens, with_crc=True)
    np.testing.assert_array_equal(errs0, errs1)
    for i in range(len(bodies)):
        if errs0[i] == 0:
            # Bytes/CRC agree on every valid row; error rows' buffers are
            # speculative garbage by contract (callers raise and discard:
            # XLA materializes all ops, the replay stops at the error).
            assert outs0[i] == outs1[i], f"row {i}"
            assert crc0[i] == crc1[i], f"row {i}"
    assert errs1[-1] != 0  # the corrupt row is still flagged


@pytest.mark.parametrize("fastpath", [False, True, "compose"])
def test_pallas_decode_foreign_emitter_ops(fastpath):
    """Valid ops our encoder never emits — 3/4-byte literal length
    headers (tags 62/63) and copy4 (tag 3) — must decode byte-exactly
    (conformance for foreign streams, reference
    ``src/decompress.rs:160-343``)."""
    import jax.numpy as jnp

    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import write_varu64
    from snappy_tpu.ops.pallas.decode import decode_batch_pallas

    rng = np.random.default_rng(41)
    payload = rng.integers(0, 256, 300, np.uint8).tobytes()
    bodies = [
        # tag 62: literal with 3 length bytes.
        bytes([62 << 2]) + (len(payload) - 1).to_bytes(3, "little") + payload,
        # tag 63: literal with 4 length bytes.
        bytes([63 << 2]) + (len(payload) - 1).to_bytes(4, "little") + payload,
        # copy4: 30-byte literal, then a copy with a 4-byte offset.
        bytes([29 << 2]) + payload[:30]
        + bytes([((20 - 1) << 2) | 3]) + (7).to_bytes(4, "little"),
    ]
    declens = [len(payload), len(payload), 50]
    width = -(-max(len(b) for b in bodies) // 128) * 128
    srcs = np.zeros((len(bodies), width), np.uint8)
    slens = np.zeros(len(bodies), np.int32)
    for i, b_ in enumerate(bodies):
        srcs[i, : len(b_)] = np.frombuffer(b_, np.uint8)
        slens[i] = len(b_)
    dst, errs = decode_batch_pallas(
        jnp.asarray(srcs), jnp.asarray(slens),
        jnp.asarray(np.asarray(declens, np.int32)), 512,
        fastpath=fastpath,
    )
    dst, errs = np.asarray(dst), np.asarray(errs)
    for i, (body, dl) in enumerate(zip(bodies, declens)):
        want = ref.decompress(write_varu64(dl) + body)
        assert errs[i] == 0, f"case {i}: err {errs[i]}"
        assert dst[i, :dl].tobytes() == want, f"case {i}"


def test_pallas_encode_route_env(monkeypatch):
    """SNAPPY_TPU_PALLAS_ENCODE=1 routes the exact device compress
    through the Pallas automaton with byte-identical output."""
    from snappy_tpu.ops import api

    data = open("data/html", "rb").read()[:3000]
    want = api.compress(data, profile="exact")
    monkeypatch.setenv("SNAPPY_TPU_PALLAS_ENCODE", "1")
    assert api.compress(data, profile="exact") == want


def test_pallas_encode_interpret_bit_exact():
    import jax.numpy as jnp

    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import read_varu64
    from snappy_tpu.ops.pallas.encode import compress_blocks_pallas

    def oracle_block(data):
        c = ref.compress(data)
        _, h = read_varu64(c)
        return c[h:]

    rng = np.random.default_rng(3)
    datas = [
        b"hello world hello world hello world!",
        bytes(rng.integers(0, 4, 3000, dtype=np.uint8)),  # copy-heavy
        b"a" * 500,  # RLE
        open("data/html", "rb").read()[:4096],
        bytes(rng.integers(0, 256, 1200, dtype=np.uint8)),  # incompressible
        b"xy",  # < MIN_NON_LITERAL_BLOCK_SIZE: literal-only path
        b"q" * 16,  # boundary: 16 < 17
        b"q" * 17,  # boundary: smallest automaton input
        b"",
    ]
    S = 4096
    rows = np.zeros((len(datas), S), np.uint8)
    lens = np.zeros(len(datas), np.int32)
    for i, d in enumerate(datas):
        rows[i, : len(d)] = np.frombuffer(d, np.uint8)
        lens[i] = len(d)
    out, out_len = compress_blocks_pallas(jnp.asarray(rows), jnp.asarray(lens))
    out, out_len = np.asarray(out), np.asarray(out_len)
    for i, d in enumerate(datas):
        want = oracle_block(d) if d else b""
        assert out[i, : out_len[i]].tobytes() == want, f"case {i}"


def test_pallas_encode_interpret_quickcheck():
    import jax.numpy as jnp

    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import read_varu64
    from snappy_tpu.ops.pallas.encode import compress_blocks_pallas

    rng = np.random.default_rng(41)
    datas = []
    for _ in range(6):
        n = int(rng.integers(1, 900))
        alphabet = int(rng.choice([2, 8, 64, 256]))
        seg = rng.integers(0, alphabet, max(n // 3, 1), dtype=np.uint8)
        datas.append(np.tile(seg, 4)[:n].tobytes())
    S = 1024
    rows = np.zeros((len(datas), S), np.uint8)
    lens = np.zeros(len(datas), np.int32)
    for i, d in enumerate(datas):
        rows[i, : len(d)] = np.frombuffer(d, np.uint8)
        lens[i] = len(d)
    out, out_len = compress_blocks_pallas(jnp.asarray(rows), jnp.asarray(lens))
    out, out_len = np.asarray(out), np.asarray(out_len)
    for i, d in enumerate(datas):
        c = ref.compress(d)
        _, h = read_varu64(c)
        assert out[i, : out_len[i]].tobytes() == c[h:], f"case {i}"


@pytest.mark.parametrize("compose", [False, True])
def test_pallas_records_kernel_bit_exact(compose):
    """Record-replay kernel: host-validated records replay byte-exactly
    (reference decode loop semantics, ``src/decompress.rs:130-343``,
    with parsing/validation hoisted to the host scan)."""
    import jax.numpy as jnp

    from snappy_tpu import native
    from snappy_tpu.format import reference as ref
    from snappy_tpu.ops.pallas.decode import decode_records_pallas

    if not native.available():
        pytest.skip("native runtime unavailable")

    rng = np.random.default_rng(61)
    datas = [
        open("data/html", "rb").read()[:4096],
        b"a" * 700,  # RLE: offset-1 overlapping copies
        bytes(rng.integers(0, 256, 900, dtype=np.uint8)),  # literal-heavy
        bytes(rng.integers(0, 4, 1500, dtype=np.uint8)),  # copy-heavy
        b"z",
    ]
    srcs, slens, declens = _prep_streams(datas, ref.compress)
    recs, nops, errs, _ = native.scan_records_batch(
        srcs, slens.astype(np.uint64), declens.astype(np.uint64), 2048
    )
    assert (errs == 0).all() and int(nops.max()) <= 2048
    r_pad = max(512, -(-int(nops.max()) // 512) * 512)
    d_pad = -(-int(declens.max()) // 128) * 128
    dst = decode_records_pallas(
        jnp.asarray(srcs),
        jnp.asarray(np.ascontiguousarray(recs[:, :r_pad])),
        jnp.asarray(nops.astype(np.int32)),
        jnp.asarray(declens),
        d_pad,
        compose=compose,
    )
    dst = np.asarray(dst)
    for i, data in enumerate(datas):
        assert dst[i, : len(data)].tobytes() == data, f"row {i}"
        assert not dst[i, len(data):].any(), f"row {i} pad"


def test_native_scan_records_error_parity():
    """The host record scan is a lockstep mirror of device validation:
    exact device error codes on the corrupt-vector suite."""
    import jax.numpy as jnp

    from snappy_tpu import native
    from snappy_tpu.ops.decode import decode_batch

    if not native.available():
        pytest.skip("native runtime unavailable")

    bodies = [
        (b"\x00a\x1d\x01", 5),  # CopyWrite
        (b"\x00a\x3f\x00", 17),  # CopyRead
        (b"\x00a\x01\x00", 17),  # Offset zero
        (b"\x00a\x01\xFF", 17),  # Offset too big
        (b"\x61", 3),  # truncated copy1
        (b"\xff\xff\xff\xff", 4),  # copy4 truncated
        (b"\xf0" + b"a" * 10, 4),  # long literal, declen short
        (b"\x00a", 4),  # ends early -> header mismatch
        (b"\x00a\x00b", 2),  # valid two literals
    ]
    srcs = np.zeros((len(bodies), 128), np.uint8)
    slens = np.zeros(len(bodies), np.uint64)
    declens = np.zeros(len(bodies), np.uint64)
    for i, (b_, dl) in enumerate(bodies):
        srcs[i, : len(b_)] = np.frombuffer(b_, np.uint8)
        slens[i] = len(b_)
        declens[i] = dl
    _, _, herrs, _ = native.scan_records_batch(srcs, slens, declens, 64)
    _, xerrs, _ = decode_batch(
        jnp.asarray(srcs),
        jnp.asarray(slens.astype(np.int32)),
        jnp.asarray(declens.astype(np.int32)),
        128,
    )
    np.testing.assert_array_equal(herrs, np.asarray(xerrs))


def test_native_scan_records_overflow_flagged():
    """nops > cap flags overflow (records truncated, caller falls back)."""
    from snappy_tpu import native

    if not native.available():
        pytest.skip("native runtime unavailable")

    # 10 one-byte literals: 10 ops, cap 4 -> overflow reported, not lost.
    body = b"\x00a" * 10
    srcs = np.zeros((1, 128), np.uint8)
    srcs[0, : len(body)] = np.frombuffer(body, np.uint8)
    recs, nops, errs, dts = native.scan_records_batch(
        srcs, np.array([len(body)], np.uint64), np.array([10], np.uint64), 4
    )
    assert int(nops[0]) == 10 and int(errs[0]) == 0 and int(dts[0]) == 10
    # Only the first cap records were written.
    assert (recs[0, :4, 0] == (1 << 30) | 1).all()


def test_pallas_records_route_env(monkeypatch):
    """SNAPPY_TPU_PALLAS_RECORDS=1 routes decompress_streams through the
    record-replay kernel with identical bytes, error codes, checksums."""
    from snappy_tpu import native
    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import read_varu64
    from snappy_tpu.ops import api

    if not native.available():
        pytest.skip("native runtime unavailable")

    datas = [
        open("data/html", "rb").read()[:3000],
        b"ab" * 700,
        bytes(1200),
    ]
    bodies, declens = [], []
    for d in datas:
        c = ref.compress(d)
        _, h = read_varu64(c)
        bodies.append(c[h:])
        declens.append(len(d))
    bodies.append(b"\x00a\x1d\x01")  # corrupt: CopyWrite
    declens.append(5)

    outs0, errs0, crc0 = api.decompress_streams(bodies, declens, with_crc=True)
    monkeypatch.setenv("SNAPPY_TPU_PALLAS_DECODE", "1")
    monkeypatch.setenv("SNAPPY_TPU_PALLAS_RECORDS", "1")
    outs1, errs1, crc1 = api.decompress_streams(bodies, declens, with_crc=True)
    np.testing.assert_array_equal(errs0, errs1)
    for i in range(len(bodies)):
        if errs0[i] == 0:
            assert outs0[i] == outs1[i], f"row {i}"
            assert crc0[i] == crc1[i], f"row {i}"
    assert errs1[-1] != 0  # the corrupt row is still flagged


def test_pallas_flat_route_env(monkeypatch):
    """The flat-gather route (the Pallas default when the native runtime
    is present) matches the baseline decode: bytes, error codes,
    checksums; flatten-side errors are in lockstep with device codes."""
    from snappy_tpu import native
    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import read_varu64
    from snappy_tpu.ops import api

    if not native.available():
        pytest.skip("native runtime unavailable")

    datas = [
        open("data/html", "rb").read()[:3000],
        open("data/kppkn.gtb", "rb").read()[:5000],
        open("data/fireworks.jpeg", "rb").read()[:2000],  # incompressible
        b"ab" * 700,
        bytes(1200),
    ]
    bodies, declens = [], []
    for d in datas:
        c = ref.compress(d)
        _, h = read_varu64(c)
        bodies.append(c[h:])
        declens.append(len(d))
    bodies.append(b"\x00a\x1d\x01")  # corrupt: CopyWrite
    declens.append(5)
    bodies.append(b"\x08abc")  # corrupt: truncated literal
    declens.append(9)

    outs0, errs0, crc0 = api.decompress_streams(bodies, declens, with_crc=True)
    monkeypatch.setenv("SNAPPY_TPU_PALLAS_DECODE", "1")  # flat default-on
    outs1, errs1, crc1 = api.decompress_streams(bodies, declens, with_crc=True)
    np.testing.assert_array_equal(errs0, errs1)
    for i in range(len(datas)):
        assert errs1[i] == 0
        assert outs0[i] == outs1[i], f"row {i}"
        assert crc0[i] == crc1[i], f"row {i}"
    assert errs1[-2] != 0 and errs1[-1] != 0


def test_pallas_flat_fallback_row(monkeypatch):
    """A tile whose literal sources span more than the wide (64 KiB)
    window flags ``fallbacks`` in the host flatten, and the route falls
    back to the replay kernel with identical bytes.

    Construction: ~66 KiB of literal content up front, then at output
    position 64 KiB a max-offset copy (reaching bytes produced by the
    very first literal, stream position ~6) interleaved with a fresh
    literal (stream position ~66 KiB) inside the same 1024-byte output
    tile — source spread ~66 KiB > the 512-row window."""
    from snappy_tpu import native
    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import write_varu64
    from snappy_tpu.ops import api, packing

    if not native.available():
        pytest.skip("native runtime unavailable")

    rng = np.random.default_rng(11)
    lit1 = rng.integers(0, 256, 1024, dtype=np.uint8).tobytes()
    lit2 = rng.integers(0, 256, 64512, dtype=np.uint8).tobytes()
    lit3 = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()

    def literal(b: bytes) -> bytes:
        n = len(b) - 1
        assert n >= 60
        if n < 256:
            return bytes([60 << 2, n]) + b
        return bytes([61 << 2, n & 255, n >> 8]) + b

    # copy2: tag=2, length 64 (len-1=63 in the high 6 bits), offset 65535
    copy2 = bytes([(63 << 2) | 2, 0xFF, 0xFF])
    body = literal(lit1) + literal(lit2) + copy2 + literal(lit3)
    declen = 1024 + 64512 + 64 + 64
    stream = write_varu64(declen) + body
    want = ref.decompress(stream)

    width = packing.pad_to_bucket(len(body), 128)
    srcs = np.zeros((1, width), np.uint8)
    srcs[0, : len(body)] = np.frombuffer(body, np.uint8)
    d_pad = packing.pad_to_bucket(declen, 1024)
    _idx, _meta, fallb, errs, _dt = native.flatten_idx_batch(
        srcs, np.array([len(body)], np.uint64), np.array([declen], np.uint64), d_pad
    )
    assert int(errs[0]) == 0
    assert int(fallb[0]) != 0  # the crafted tile overflows the window

    monkeypatch.setenv("SNAPPY_TPU_PALLAS_DECODE", "1")
    outs, rerrs, _ = api.decompress_streams([body], [declen])
    assert int(rerrs[0]) == 0
    assert outs[0] == want


def test_pallas_flat_v2_kernel_bit_exact():
    """The v2 flat kernel (transposed idx layout + MXU-transpose output)
    decodes 64 KiB-padded blocks byte-for-byte with the zero-pad
    contract; indices come from the C++ flattener's layout=1 mode."""
    import jax.numpy as jnp

    from snappy_tpu import native
    from snappy_tpu.format import reference as ref
    from snappy_tpu.ops.pallas.decode import decode_flat_pallas_v2

    if not native.available():
        pytest.skip("native runtime unavailable")

    rng = np.random.default_rng(17)
    datas = [
        open("data/html", "rb").read()[:65536],
        open("data/plrabn12.txt", "rb").read()[:65536],
        open("data/fireworks.jpeg", "rb").read()[:40000],  # incompressible
        b"ab" * 20000,  # overlap-copy heavy
        bytes(rng.integers(0, 4, 50000, dtype=np.uint8)),  # low entropy
        bytes(65536),
    ]
    srcs, slens, declens = _prep_streams(datas, ref.compress)
    width = -(-srcs.shape[1] // 1024) * 1024
    srcs = np.ascontiguousarray(
        np.pad(srcs, ((0, 0), (0, width - srcs.shape[1])))
    )
    d_pad = 65536
    idxp, tmeta, fallb, herrs, _dt = native.flatten_idx_batch(
        srcs, slens.astype(np.uint64), declens.astype(np.uint64),
        d_pad, layout=1,
    )
    assert not fallb.any() and not herrs.any()
    dst = np.asarray(
        decode_flat_pallas_v2(
            jnp.asarray(srcs), jnp.asarray(idxp), jnp.asarray(tmeta),
            jnp.asarray(declens), d_pad,
        )
    )
    for i, data in enumerate(datas):
        assert dst[i, : len(data)].tobytes() == data, f"row {i}"
        assert not dst[i, len(data):].any(), f"row {i} zero-pad"


def test_pallas_flat_v2_route_via_api(monkeypatch):
    """decompress_streams routes 16-tile-aligned widths through the v2
    kernel (d_pad % 16384 == 0): bytes, error codes, and checksums match
    the baseline decode."""
    from snappy_tpu import native
    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import read_varu64
    from snappy_tpu.ops import api

    if not native.available():
        pytest.skip("native runtime unavailable")

    datas = [
        open("data/lcet10.txt", "rb").read()[:65536],
        open("data/geo.protodata", "rb").read()[:65536],
        b"xyz" * 21845 + b"x",  # 65536 bytes
    ]
    bodies, declens = [], []
    for d in datas:
        c = ref.compress(d)
        _, h = read_varu64(c)
        bodies.append(c[h:])
        declens.append(len(d))
    bodies.append(b"\x00a\x1d\x01")  # corrupt: CopyWrite
    declens.append(65536)  # same width bucket as the valid rows

    outs0, errs0, crc0 = api.decompress_streams(bodies, declens, with_crc=True)
    monkeypatch.setenv("SNAPPY_TPU_PALLAS_DECODE", "1")  # flat default-on
    outs1, errs1, crc1 = api.decompress_streams(bodies, declens, with_crc=True)
    np.testing.assert_array_equal(errs0, errs1)
    for i in range(len(datas)):
        assert errs1[i] == 0
        assert outs0[i] == outs1[i], f"row {i}"
        assert crc0[i] == crc1[i], f"row {i}"
    assert errs1[-1] != 0


def test_pallas_routes_cap_vmem_width(monkeypatch):
    """Streams whose padded output exceeds the Pallas VMEM budget route
    through the XLA formulations instead of a Mosaic scratch-OOM: a
    2 MiB raw stream decodes correctly with the Pallas routes enabled
    (on real TPU this measured a 'ran out of memory in memory space
    vmem' compile failure before the cap)."""
    from snappy_tpu import native
    from snappy_tpu.format.varint import read_varu64
    from snappy_tpu.ops import api

    if not native.available():
        pytest.skip("native runtime unavailable")
    data = (open("data/lcet10.txt", "rb").read() * 6)[: 2 * 1024 * 1024]
    comp = native.compress(data)
    _, h = read_varu64(comp)
    monkeypatch.setenv("SNAPPY_TPU_PALLAS_DECODE", "1")
    outs, errs, _ = api.decompress_streams([comp[h:]], [len(data)])
    assert int(errs[0]) == 0
    assert outs[0] == data


@pytest.mark.parametrize("variant", ["v3", "v4"])
def test_pallas_flat_v3_v4_kernel_bit_exact(variant):
    """The measured-alternative flat kernels (v3 zero-branch per-width
    passes, v4 group-level switch) stay byte-exact with the v2
    production kernel's contract — including partial-tail declens (not
    a multiple of the 16 KiB group) and a narrow s_rows batch — so the
    A/B tooling compares equals (ADVICE r3: exactness was previously
    pinned only by one-off tool runs)."""
    import jax.numpy as jnp

    from snappy_tpu import native
    from snappy_tpu.format import reference as ref
    from snappy_tpu.ops.pallas.decode import (
        decode_flat_pallas_v3,
        decode_flat_pallas_v4,
        group_buckets,
    )

    if not native.available():
        pytest.skip("native runtime unavailable")

    rng = np.random.default_rng(23)
    datas = [
        open("data/html", "rb").read()[:65536],
        open("data/geo.protodata", "rb").read()[:50000],  # partial tail
        b"ab" * 20000,  # overlap-copy heavy, partial tail
        bytes(rng.integers(0, 4, 65536, dtype=np.uint8)),
        open("data/fireworks.jpeg", "rb").read()[:30000],  # incompressible
    ]
    srcs, slens, declens = _prep_streams(datas, ref.compress)
    width = -(-srcs.shape[1] // 1024) * 1024
    srcs = np.ascontiguousarray(np.pad(srcs, ((0, 0), (0, width - srcs.shape[1]))))
    d_pad = 65536
    idxp, tmeta, fallb, herrs, _dt = native.flatten_idx_batch(
        srcs, slens.astype(np.uint64), declens.astype(np.uint64), d_pad, layout=1
    )
    assert not fallb.any() and not herrs.any()
    gb = group_buckets(tmeta.reshape(len(datas), d_pad // 1024, 2), declens, d_pad)
    fn = decode_flat_pallas_v3 if variant == "v3" else decode_flat_pallas_v4
    dst = np.asarray(
        fn(
            jnp.asarray(srcs), jnp.asarray(idxp), jnp.asarray(tmeta),
            jnp.asarray(gb), jnp.asarray(declens), d_pad,
        )
    )
    for i, data in enumerate(datas):
        assert dst[i, : len(data)].tobytes() == data, f"{variant} row {i}"
        assert not dst[i, len(data):].any(), f"{variant} row {i} zero-pad"


@pytest.mark.parametrize("variant", ["v3", "v4"])
def test_pallas_flat_v3_v4_narrow_srows(variant):
    """s_rows < 512: the per-width window clamps (w = min(nominal,
    s_rows) rounded to 128) must still produce exact bytes."""
    import jax.numpy as jnp

    from snappy_tpu import native
    from snappy_tpu.format import reference as ref
    from snappy_tpu.ops.pallas.decode import (
        decode_flat_pallas_v3,
        decode_flat_pallas_v4,
        group_buckets,
    )

    if not native.available():
        pytest.skip("native runtime unavailable")

    # Highly compressible rows: wide declen (>= one 16 KiB group) with a
    # tiny compressed body, so s_rows stays well under the nominal 512.
    datas = [b"z" * 30000, (b"pattern!" * 4000)[:32000]]
    srcs, slens, declens = _prep_streams(datas, ref.compress)
    width = -(-srcs.shape[1] // 1024) * 1024
    srcs = np.ascontiguousarray(np.pad(srcs, ((0, 0), (0, width - srcs.shape[1]))))
    assert srcs.shape[1] // 128 < 512
    d_pad = 32768
    idxp, tmeta, fallb, herrs, _dt = native.flatten_idx_batch(
        srcs, slens.astype(np.uint64), declens.astype(np.uint64), d_pad, layout=1
    )
    assert not fallb.any() and not herrs.any()
    gb = group_buckets(tmeta.reshape(len(datas), d_pad // 1024, 2), declens, d_pad)
    fn = decode_flat_pallas_v3 if variant == "v3" else decode_flat_pallas_v4
    dst = np.asarray(
        fn(
            jnp.asarray(srcs), jnp.asarray(idxp), jnp.asarray(tmeta),
            jnp.asarray(gb), jnp.asarray(declens), d_pad,
        )
    )
    for i, data in enumerate(datas):
        assert dst[i, : len(data)].tobytes() == data, f"{variant} row {i}"
        assert not dst[i, len(data):].any(), f"{variant} row {i} zero-pad"
