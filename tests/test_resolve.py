"""Device chain-resolution route (ops/resolve.py + pallas/resolve.py).

Interpret-mode (CPU) bit-exactness against the host flatten oracle and
the native decoder, plus API routing. The on-chip twin of these checks
runs in tools/resolve_bench.py (RESOLVE_BENCH_r05.json: bad rows = 0
on the 392-block corpus batch).
"""

import numpy as np
import pytest

import snappy_tpu.config as C
from snappy_tpu import native
from snappy_tpu.format.varint import write_varu64

jnp = pytest.importorskip("jax.numpy")

D_PAD = 1 << 16
REC_CAP = 1 << 14


def _bodies(cases):
    bodies = []
    for c in cases:
        comp = native.compress(c)
        p = 0
        while comp[p] & 0x80:
            p += 1
        bodies.append(comp[p + 1 :])
    n = len(bodies)
    stride = -(-max(len(b) for b in bodies) // 128) * 128
    srcs = np.zeros((n, stride), np.uint8)
    for i, b in enumerate(bodies):
        srcs[i, : len(b)] = np.frombuffer(b, np.uint8)
    lens = np.array([len(b) for b in bodies], np.uint64)
    decl = np.array([len(c) for c in cases], np.uint64)
    return srcs, lens, decl


def _scan(srcs, lens, decl):
    recs, nops, errs, dt = native.scan_records_batch(
        srcs, lens, decl, REC_CAP, threads=2
    )
    assert int(errs.sum()) == 0
    return recs, nops


CASES = None


def _cases():
    global CASES
    if CASES is None:
        rng = np.random.default_rng(11)
        CASES = [
            open("data/html", "rb").read()[:65536],
            open("data/kppkn.gtb", "rb").read()[:65536],  # deepest chains
            bytes(65536),  # off=1 RLE chains
            bytes([1, 2, 3]) * 21845,  # periodic overlap
            rng.integers(0, 4, 65536, dtype=np.uint8).tobytes(),
            rng.integers(0, 256, 777, dtype=np.uint8).tobytes(),
            b"x",
        ]
    return CASES


def test_pointer_plane_matches_host_flatten():
    """records_to_pointers + reference doubling == C++ flatten idx."""
    from snappy_tpu.ops import resolve as R

    srcs, lens, decl = _bodies(_cases())
    recs, nops = _scan(srcs, lens, decl)
    a0, rmeta = R.records_to_pointers(
        jnp.asarray(recs), jnp.asarray(nops),
        jnp.asarray(decl.astype(np.int64)), D_PAD)
    a = np.asarray(R.resolve_reference(a0))
    assert (a >= R.FLAG).all()
    idx_rel, tmeta, fbk, errs, dts = native.flatten_idx_batch(
        srcs, lens, decl, D_PAD, threads=2, layout=0)
    base = (np.asarray(tmeta).reshape(len(lens), -1, 2)[:, :, 0]
            .astype(np.int64) * 128).repeat(1024, axis=1)
    truth = idx_rel.astype(np.int64) + base
    for i in range(len(lens)):
        d = int(decl[i])
        assert (a[i, :d] - R.FLAG == truth[i, :d]).all(), i


def test_pallas_resolve_interpret_bit_exact():
    """The kernel (interpret) reproduces the reference doubling."""
    from snappy_tpu.ops import resolve as R
    from snappy_tpu.ops.pallas.resolve import resolve_pallas

    srcs, lens, decl = _bodies(_cases())
    recs, nops = _scan(srcs, lens, decl)
    a0, rmeta = R.records_to_pointers(
        jnp.asarray(recs), jnp.asarray(nops),
        jnp.asarray(decl.astype(np.int64)), D_PAD)
    want = np.asarray(R.resolve_reference(a0))
    got = np.asarray(resolve_pallas(a0, rmeta, interpret=True))
    assert (got == want).all()


def test_decode_resolve_batch_bytes():
    """Full route: records -> resolve -> v2 gather == original bytes."""
    from snappy_tpu.ops import resolve as R

    cases = _cases()
    srcs, lens, decl = _bodies(cases)
    recs, nops = _scan(srcs, lens, decl)
    out, fb = R.decode_resolve_batch(
        srcs, recs, nops, decl.astype(np.int64), D_PAD,
        interpret=True, use_pallas=True)
    out = np.asarray(out)
    fb = np.asarray(fb)
    for i, c in enumerate(cases):
        assert not fb[i], i
        assert out[i, : len(c)].tobytes() == c, i
        assert (out[i, len(c):] == 0).all(), i


def test_oversized_body_flags_fallback():
    """Incompressible 64 KiB (body > 64 KiB, s_rows > 512) must flag."""
    from snappy_tpu.ops import resolve as R

    rng = np.random.default_rng(5)
    c = rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
    srcs, lens, decl = _bodies([c])
    assert srcs.shape[1] > 512 * 128
    recs, nops = _scan(srcs, lens, decl)
    out, fb = R.decode_resolve_batch(
        srcs, recs, nops, decl.astype(np.int64), D_PAD,
        interpret=True, use_pallas=False)
    assert int(np.asarray(fb)[0]) == 1


def test_api_routes_resolve():
    """decompress_streams honors Config.pallas_resolve (interpret)."""
    from snappy_tpu.ops import api

    data = open("data/alice29.txt", "rb").read()
    blocks = [data[i : i + 65536] for i in range(0, len(data), 65536)]
    bodies = []
    for b in blocks:
        comp = native.compress(b)
        p = 0
        while comp[p] & 0x80:
            p += 1
        bodies.append(comp[p + 1 :])
    with C.configure(pallas_decode=True, pallas_resolve=True):
        outs, errs, crcs = api.decompress_streams(
            bodies, [len(b) for b in blocks])
    assert int(errs.sum()) == 0
    assert all(o == b for o, b in zip(outs, blocks))


def test_api_resolve_large_stream_falls_back():
    """Raw streams past 64 KiB decode correctly (flat-route fallback)."""
    from snappy_tpu import raw
    from snappy_tpu.ops import api

    data = open("data/html", "rb").read()  # 102400 B single stream
    comp = raw.Encoder().compress_vec(data)
    with C.configure(pallas_decode=True, pallas_resolve=True):
        assert api.decompress(comp) == data


def test_error_streams_parity():
    """Truncated/corrupt streams raise identical errors on the route."""
    from snappy_tpu import raw
    from snappy_tpu.ops import api

    data = open("data/asyoulik.txt", "rb").read()[:65536]
    comp = bytearray(raw.Encoder().compress_vec(data))
    comp = bytes(comp[:200])  # truncate mid-stream

    def err_of(fn):
        try:
            fn()
            return None
        except Exception as e:  # noqa: BLE001
            return e

    host = err_of(lambda: native.decompress(comp))
    with C.configure(pallas_decode=True, pallas_resolve=True):
        dev = err_of(lambda: api.decompress(comp))
    assert type(host) is type(dev)
    assert str(host) == str(dev)


def test_fused_first_hop_matches_scatter_path():
    """The fused kernel (records_to_kernel_inputs + resolve_fh_pallas)
    and the scatter path (records_to_pointers + resolve_pallas) must
    produce identical resolved planes."""
    from snappy_tpu.ops import resolve as R
    from snappy_tpu.ops.pallas.resolve import resolve_fh_pallas, resolve_pallas

    srcs, lens, decl = _bodies(_cases())
    recs, nops = _scan(srcs, lens, decl)
    decl64 = jnp.asarray(decl.astype(np.int64))
    a0, rmeta = R.records_to_pointers(
        jnp.asarray(recs), jnp.asarray(nops), decl64, D_PAD)
    want = np.asarray(resolve_pallas(a0, rmeta, interpret=True))
    st, pk, wlo, nwin, rm2 = R.records_to_kernel_inputs(
        jnp.asarray(recs), jnp.asarray(nops), decl64, D_PAD)
    got = np.asarray(resolve_fh_pallas(
        st, pk, wlo, nwin, rm2, decl64, D_PAD, interpret=True))
    # pad bytes past declen are FLAG-filled on the fused path and may
    # hold arbitrary >=FLAG values on the scatter path; compare live.
    for i in range(len(lens)):
        d = int(decl[i])
        assert (got[i, :d] == want[i, :d]).all(), i
        assert (got[i] >= R.FLAG).all(), i
