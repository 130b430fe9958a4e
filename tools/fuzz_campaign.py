#!/usr/bin/env python
"""Offline randomized differential campaign (not part of the suite).

Three legs, each far past the in-suite scale:

1. round-trip + libsnappy differential on random inputs
   (native engine; byte-identity vs C++ where block sizes allow);
2. mutation fuzzing of compressed streams: native decoder vs the NumPy
   oracle must agree on accept/reject AND on bytes when accepting;
3. batched device decode (forced CPU) vs the oracle on random and
   mutated streams, through decompress_streams (hybrid path).

Prints a one-line JSON summary; exits nonzero on any divergence.
Run: python tools/fuzz_campaign.py [n_cases_leg1] [n_cases_leg2] [n_leg3]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402

# FUZZ_SEED_OFFSET shifts every leg's RNG seed so repeated campaigns
# explore fresh case space instead of replaying the last run.
SEED_OFFSET = int(os.environ.get("FUZZ_SEED_OFFSET", "0"))


def gen_input(rng) -> bytes:
    n = int(rng.integers(0, 12_000))
    kind = int(rng.integers(0, 4))
    if kind == 0:
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == 1:
        return rng.integers(0, 4, n, dtype=np.uint8).tobytes()
    if kind == 2:
        seg = rng.integers(0, 256, max(n // 8, 1), dtype=np.uint8).tobytes()
        return (seg * 9)[:n]
    return bytes(n)  # all zeros: deep RLE chains


def _ops_of(stream: bytes):
    """Parse a raw Snappy stream into (kind, dst, len[, off]) ops."""
    p = 0
    while stream[p] & 0x80:
        p += 1
    p += 1
    out = []
    d = 0
    while p < len(stream):
        tag = stream[p]
        kind = tag & 3
        lm = tag >> 2
        if kind == 0:
            if lm >= 60:
                bc = lm - 59
                ln = int.from_bytes(stream[p + 1 : p + 1 + bc], "little") + 1
                p += 1 + bc
            else:
                ln = lm + 1
                p += 1
            out.append(("lit", d, ln))
            p += ln
            d += ln
        else:
            if kind == 1:
                ln = 4 + (lm & 7)
                off = ((tag >> 5) << 8) | stream[p + 1]
                p += 2
            elif kind == 2:
                ln = lm + 1
                off = int.from_bytes(stream[p + 1 : p + 3], "little")
                p += 3
            else:
                ln = lm + 1
                off = int.from_bytes(stream[p + 1 : p + 5], "little")
                p += 5
            out.append(("copy", d, ln, off))
            d += ln
    return out


def _divergence_class(ours: bytes, theirs: bytes) -> str:
    """First-differing-op class vs libsnappy (see PARITY.md: every
    observed class is a match-*discovery* difference from the 1.1.9
    compressor rewrite, never an encoding-rule difference)."""
    for x, y in zip(_ops_of(ours), _ops_of(theirs)):
        if x == y:
            continue
        if x[0] == "lit" and y[0] == "lit":
            return ("cpp-match-starts-earlier" if x[2] > y[2]
                    else "ours-match-starts-earlier")
        if x[0] == "lit" and y[0] == "copy":
            return "cpp-copy-where-ours-literal"
        if x[0] == "copy" and y[0] == "lit":
            return "ours-copy-where-cpp-literal"
        if x[0] == "copy" and y[0] == "copy":
            if x[1] == y[1] and x[2] != y[2]:
                return "different-match-len-same-pos"
            if x[1] == y[1] and x[3] != y[3]:
                return "different-offset-same-pos"
            return "copy-vs-copy-other"
        return f"other:{x[0]}-vs-{y[0]}"
    return "prefix-equal-length-differs"


def leg1(n_cases: int) -> dict:
    from collections import Counter

    from snappy_tpu import raw
    from snappy_tpu.utils import cpp_oracle as cpp

    rng = np.random.default_rng(0xF00D + SEED_OFFSET)
    enc = raw.Encoder(engine="native")
    dec = raw.Decoder(engine="native")
    cpp_ok = cpp.available()
    ident = 0
    classes = Counter()
    for i in range(n_cases):
        data = gen_input(rng)
        comp = enc.compress_vec(data)
        assert dec.decompress_vec(comp) == data, f"leg1 roundtrip case {i}"
        if cpp_ok:
            assert cpp.decompress(comp) == data, f"leg1 cpp-decodes-ours case {i}"
            theirs = cpp.compress(data)
            assert dec.decompress_vec(theirs) == data, f"leg1 ours-decodes-cpp case {i}"
            if comp == theirs:
                ident += 1
            else:
                classes[_divergence_class(comp, theirs)] += 1
    return {
        "leg1_cases": n_cases,
        "leg1_byte_identical": ident,
        "leg1_divergence_classes": dict(classes),
        "leg1_divergence_note": (
            "non-identical cases are libsnappy-1.1.9 match-discovery "
            "drift vs the reference's 1.1.8 contract — see PARITY.md"
        ),
        "cpp": cpp_ok,
    }


def leg2(n_cases: int) -> dict:
    from snappy_tpu import error as err
    from snappy_tpu import raw
    from snappy_tpu.format import reference as ref

    rng = np.random.default_rng(0xBEEF + SEED_OFFSET)
    enc = raw.Encoder(engine="native")
    dec = raw.Decoder(engine="native")
    rejects = 0
    for i in range(n_cases):
        data = gen_input(rng)
        comp = bytearray(enc.compress_vec(data))
        nmut = int(rng.integers(1, 4))
        for _ in range(nmut):
            if len(comp) == 0:
                break
            comp[int(rng.integers(0, len(comp)))] ^= int(rng.integers(1, 256))
        comp = bytes(comp)
        try:
            got_n = dec.decompress_vec(comp)
            n_err = None
        except err.SnappyError as e:
            got_n, n_err = None, e
        try:
            got_r = ref.decompress(comp)
            r_err = None
        except err.SnappyError as e:
            got_r, r_err = None, e
        if (n_err is None) != (r_err is None):
            raise AssertionError(
                f"leg2 case {i}: native {n_err!r} vs oracle {r_err!r}"
            )
        if n_err is None:
            assert got_n == got_r, f"leg2 case {i}: byte divergence"
        else:
            assert n_err == r_err, f"leg2 case {i}: {n_err!r} != {r_err!r}"
            rejects += 1
    return {"leg2_cases": n_cases, "leg2_rejected": rejects}


def leg3(n_cases: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from snappy_tpu import error as err
    from snappy_tpu import raw
    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import read_varu64, write_varu64
    from snappy_tpu.ops.api import OK, decompress_streams

    rng = np.random.default_rng(0xCAFE + SEED_OFFSET)
    enc = raw.Encoder(engine="native")
    bodies, declens = [], []
    for i in range(n_cases):
        data = gen_input(rng)[:8000]
        comp = enc.compress_vec(data)
        _, h = read_varu64(comp)
        body = bytearray(comp[h:])
        if i % 3 == 0 and len(body) > 2:
            body[int(rng.integers(0, len(body)))] ^= int(rng.integers(1, 256))
        bodies.append(bytes(body))
        declens.append(len(data))
    outs, errs, _ = decompress_streams(bodies, declens)
    flagged = 0
    for i in range(n_cases):
        stream = write_varu64(declens[i]) + bodies[i]
        try:
            want = ref.decompress(stream)
            assert int(errs[i]) == OK, f"leg3 case {i}: device flagged a valid stream"
            assert outs[i] == want, f"leg3 case {i}: byte divergence"
        except err.SnappyError:
            assert int(errs[i]) != OK, f"leg3 case {i}: device accepted a bad stream"
            flagged += 1
    return {"leg3_cases": n_cases, "leg3_flagged": flagged}


def leg4(n_blocks: int) -> dict:
    """Fast-profile encoder: random blocks, oracle-validated output."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import write_varu64
    from snappy_tpu.ops.encode_fast import compress_blocks_fast

    rng = np.random.default_rng(0xFA57 + SEED_OFFSET)
    b, s = 64, 65536
    done = 0
    while done < n_blocks:
        take = min(b, n_blocks - done)
        rows = np.zeros((b, s), np.uint8)
        lens = np.zeros(b, np.int32)
        for i in range(take):
            data = gen_input(rng)[: s]
            rows[i, : len(data)] = np.frombuffer(data, np.uint8)
            lens[i] = len(data)
        out, out_len = compress_blocks_fast(jnp.asarray(rows), jnp.asarray(lens))
        out, out_len = np.asarray(out), np.asarray(out_len)
        for i in range(take):
            body = out[i, : out_len[i]].tobytes()
            got = ref.decompress(write_varu64(int(lens[i])) + body)
            assert got == rows[i, : lens[i]].tobytes(), f"leg4 block {done + i}"
        done += take
    return {"leg4_blocks": n_blocks}


def leg5(n_cases: int) -> dict:
    """Frame streams: three-engine output/error-value agreement."""
    import io

    from snappy_tpu import error as err
    from snappy_tpu import read as rmod
    from snappy_tpu import write as wmod
    from snappy_tpu.ops.api import decompress_frame

    rng = np.random.default_rng(0xFA3E + SEED_OFFSET)
    rejects = 0
    for i in range(n_cases):
        data = gen_input(rng)
        buf = io.BytesIO()
        w = wmod.FrameEncoder(buf)
        w.write(data)
        w.flush()
        stream = bytearray(buf.getvalue())
        if i % 2 == 0 and len(stream) > 10:
            for _ in range(int(rng.integers(1, 3))):
                stream[int(rng.integers(0, len(stream)))] ^= int(rng.integers(1, 256))
        stream = bytes(stream)
        results = []
        for run in (
            lambda: rmod.FrameDecoder(io.BytesIO(stream), engine="reference").read(),
            lambda: rmod.FrameDecoder(io.BytesIO(stream), engine="native").read(),
            lambda: decompress_frame(stream),
        ):
            try:
                results.append(("ok", run()))
            except (err.SnappyError, EOFError) as e:
                results.append(("err", e))
        kinds = {k for k, _ in results}
        assert len(kinds) == 1, f"leg5 case {i}: accept/reject split {results!r}"
        if results[0][0] == "ok":
            assert results[0][1] == results[1][1] == results[2][1], f"leg5 case {i}"
        else:
            e0, e1, e2 = (r[1] for r in results)
            same01 = (type(e0) is type(e1)) and (
                not isinstance(e0, err.SnappyError) or e0 == e1
            )
            same02 = (type(e0) is type(e2)) and (
                not isinstance(e0, err.SnappyError) or e0 == e2
            )
            assert same01 and same02, f"leg5 case {i}: {e0!r} vs {e1!r} vs {e2!r}"
            rejects += 1
    return {"leg5_cases": n_cases, "leg5_rejected": rejects}


def leg6(n_cases: int) -> dict:
    """Segmented streaming reader vs the sequential reference walk:
    random frame streams (multi-chunk, concatenated, padded, mutated),
    consumed through chunked reads; delivered bytes, error values, error
    positions, AND post-error resume must agree."""
    import io

    from snappy_tpu import error as err
    from snappy_tpu import native
    from snappy_tpu import read as rmod

    rng = np.random.default_rng(0x5E6 + SEED_OFFSET)
    rejects = 0
    for i in range(n_cases):
        parts = [gen_input(rng) for _ in range(int(rng.integers(1, 4)))]
        stream = bytearray()
        for p in parts:
            stream += native.frame_compress(p * int(rng.integers(1, 30)))
        if int(rng.integers(0, 3)) == 0 and len(stream) > 14:
            stream[10:10] = b"\xfe\x03\x00\x00pad"  # padding chunk
        if i % 2 == 0 and len(stream) > 10:
            for _ in range(int(rng.integers(1, 4))):
                stream[int(rng.integers(0, len(stream)))] ^= int(rng.integers(1, 256))
        if int(rng.integers(0, 4)) == 0:
            stream = stream[: int(rng.integers(0, len(stream) + 1))]  # truncate
        stream = bytes(stream)
        rs = int(rng.choice([1 << 12, 1 << 16, 1 << 20]))
        results = []
        for eng in ("native", "reference"):
            out = bytearray()
            errors = []
            dec = rmod.FrameDecoder(io.BytesIO(stream), engine=eng)
            for _ in range(4000):
                try:
                    c = dec.read(rs)
                    if not c:
                        break
                    out += c
                except (err.SnappyError, EOFError) as e:
                    errors.append((len(out), type(e).__name__, str(e)))
            results.append((bytes(out), errors))
        assert results[0] == results[1], (
            f"leg6 case {i}: {results[0][1]!r} vs {results[1][1]!r}"
        )
        if results[0][1]:
            rejects += 1
    return {"leg6_cases": n_cases, "leg6_with_errors": rejects}


def leg7(n_cases: int) -> dict:
    """Host batch codec vs per-row calls: identity on valid batches and
    first-failing-row error equality on batches with corrupt rows."""
    from snappy_tpu import error as err
    from snappy_tpu import native, raw

    rng = np.random.default_rng(0xBA7C + SEED_OFFSET)
    enc = raw.Encoder(engine="native")
    dec = raw.Decoder(engine="native")
    with_errors = 0
    for i in range(n_cases):
        rows = [gen_input(rng) for _ in range(int(rng.integers(1, 24)))]
        comp = [enc.compress_vec(r) for r in rows]
        assert native.compress_batch(rows, threads=2) == comp, f"leg7 case {i} z"
        if i % 2 == 1:
            j = int(rng.integers(0, len(comp)))
            mutated = bytearray(comp[j])
            if mutated:
                mutated[int(rng.integers(0, len(mutated)))] ^= int(rng.integers(1, 256))
            comp[j] = bytes(mutated)
        seq_exc = None
        seq_out = []
        for c in comp:
            try:
                seq_out.append(dec.decompress_vec(c))
            except err.SnappyError as e:
                seq_exc = e
                break
        try:
            got = native.decompress_batch(comp, threads=2)
            assert seq_exc is None, f"leg7 case {i}: batch accepted, seq raised {seq_exc!r}"
            assert got == seq_out, f"leg7 case {i}: byte divergence"
        except err.SnappyError as e:
            assert seq_exc is not None, f"leg7 case {i}: batch raised {e!r}, seq accepted"
            assert type(e) is type(seq_exc) and e == seq_exc, (
                f"leg7 case {i}: {e!r} vs {seq_exc!r}"
            )
            with_errors += 1
    return {"leg7_cases": n_cases, "leg7_with_errors": with_errors}


def leg8(n_cases: int) -> dict:
    """Pallas decode route (interpret mode): decompress_streams with
    SNAPPY_TPU_PALLAS_DECODE=1 vs the oracle — the TPU production
    route's accept/reject and byte agreement on valid + mutated
    streams (small inputs: the interpreter replays op by op)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from snappy_tpu import error as err
    from snappy_tpu import raw
    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import read_varu64, write_varu64
    from snappy_tpu.ops.api import OK, decompress_streams

    rng = np.random.default_rng(0x9A77A5 + SEED_OFFSET)
    enc = raw.Encoder(engine="native")
    bodies, declens = [], []
    for i in range(n_cases):
        data = gen_input(rng)[:2000]
        comp = enc.compress_vec(data)
        _, h = read_varu64(comp)
        body = bytearray(comp[h:])
        if i % 3 == 0 and len(body) > 2:
            body[int(rng.integers(0, len(body)))] ^= int(rng.integers(1, 256))
        bodies.append(bytes(body))
        declens.append(len(data))
    os.environ["SNAPPY_TPU_PALLAS_DECODE"] = "1"
    try:
        outs, errs, _ = decompress_streams(bodies, declens)
    finally:
        del os.environ["SNAPPY_TPU_PALLAS_DECODE"]
    flagged = 0
    for i in range(n_cases):
        stream = write_varu64(declens[i]) + bodies[i]
        try:
            want = ref.decompress(stream)
            assert int(errs[i]) == OK, f"leg8 case {i}: pallas flagged a valid stream"
            assert outs[i] == want, f"leg8 case {i}: byte divergence"
        except err.SnappyError:
            assert int(errs[i]) != OK, f"leg8 case {i}: pallas accepted a bad stream"
            flagged += 1
    return {"leg8_cases": n_cases, "leg8_flagged": flagged}


def leg9(n_cases: int) -> dict:
    """Record-replay decode route (interpret mode): decompress_streams
    with SNAPPY_TPU_PALLAS_RECORDS=1 vs the oracle — host-scan error
    codes and replayed bytes on valid + mutated streams."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from snappy_tpu import error as err
    from snappy_tpu import raw
    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import read_varu64, write_varu64
    from snappy_tpu.ops.api import OK, decompress_streams

    rng = np.random.default_rng(0x9EC02D5 + SEED_OFFSET)
    enc = raw.Encoder(engine="native")
    bodies, declens = [], []
    for i in range(n_cases):
        data = gen_input(rng)[:2000]
        comp = enc.compress_vec(data)
        _, h = read_varu64(comp)
        body = bytearray(comp[h:])
        if i % 3 == 0 and len(body) > 2:
            body[int(rng.integers(0, len(body)))] ^= int(rng.integers(1, 256))
        bodies.append(bytes(body))
        declens.append(len(data))
    os.environ["SNAPPY_TPU_PALLAS_DECODE"] = "1"
    os.environ["SNAPPY_TPU_PALLAS_RECORDS"] = "1"
    try:
        outs, errs, _ = decompress_streams(bodies, declens)
    finally:
        del os.environ["SNAPPY_TPU_PALLAS_DECODE"]
        del os.environ["SNAPPY_TPU_PALLAS_RECORDS"]
    flagged = 0
    for i in range(n_cases):
        stream = write_varu64(declens[i]) + bodies[i]
        try:
            want = ref.decompress(stream)
            assert int(errs[i]) == OK, f"leg9 case {i}: records flagged a valid stream"
            assert outs[i] == want, f"leg9 case {i}: byte divergence"
        except err.SnappyError:
            assert int(errs[i]) != OK, f"leg9 case {i}: records accepted a bad stream"
            flagged += 1
    return {"leg9_cases": n_cases, "leg9_flagged": flagged}


def leg10(n_cases: int) -> dict:
    """Flat-gather v2 route (interpret mode): 64 KiB-class streams so
    d_pad lands on a 16-tile multiple and decompress_streams takes the
    v2 kernel (the TPU production route) — bytes and accept/reject vs
    the oracle on valid + mutated streams."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from snappy_tpu import error as err
    from snappy_tpu import raw
    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import read_varu64, write_varu64
    from snappy_tpu.ops.api import OK, decompress_streams

    rng = np.random.default_rng(0xF1A7 + SEED_OFFSET)
    enc = raw.Encoder(engine="native")
    bodies, declens = [], []
    for i in range(n_cases):
        # Build ~64 KiB inputs with mixed compressibility.
        parts = []
        while sum(len(p_) for p_ in parts) < 60000:
            parts.append(gen_input(rng))
        data = (b"".join(parts))[:65536 - int(rng.integers(0, 3000))]
        comp = enc.compress_vec(data)
        _, h = read_varu64(comp)
        body = bytearray(comp[h:])
        if i % 3 == 0 and len(body) > 2:
            body[int(rng.integers(0, len(body)))] ^= int(rng.integers(1, 256))
        bodies.append(bytes(body))
        declens.append(len(data))
    os.environ["SNAPPY_TPU_PALLAS_DECODE"] = "1"
    try:
        outs, errs, _ = decompress_streams(bodies, declens)
    finally:
        del os.environ["SNAPPY_TPU_PALLAS_DECODE"]
    flagged = 0
    for i in range(n_cases):
        stream = write_varu64(declens[i]) + bodies[i]
        try:
            want = ref.decompress(stream)
            assert int(errs[i]) == OK, f"leg10 case {i}: flat v2 flagged a valid stream"
            assert outs[i] == want, f"leg10 case {i}: byte divergence"
        except err.SnappyError:
            assert int(errs[i]) != OK, f"leg10 case {i}: flat v2 accepted a bad stream"
            flagged += 1
    return {"leg10_cases": n_cases, "leg10_flagged": flagged}




def leg11(n_blocks: int) -> dict:
    """Flat device encoder (round 4): random blocks through the full
    fast-emission pipeline (interpret mode on CPU), oracle-validated
    output + size sanity vs the XLA fast profile."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import write_varu64
    from snappy_tpu.ops.encode_flat import _compress_blocks_flat_split

    rng = np.random.default_rng(0xF1A7 + SEED_OFFSET)
    b, s = 16, 65536
    done = 0
    while done < n_blocks:
        take = min(b, n_blocks - done)
        rows = np.zeros((b, s), np.uint8)
        lens = np.zeros(b, np.int32)
        for i in range(take):
            data = gen_input(rng)[:s]
            rows[i, : len(data)] = np.frombuffer(data, np.uint8)
            lens[i] = len(data)
        out, out_len, ovf = _compress_blocks_flat_split(
            jnp.asarray(rows), jnp.asarray(lens), True
        )
        out, out_len, ovf = np.asarray(out), np.asarray(out_len), np.asarray(ovf)
        assert not ovf.any(), "leg11 overflow flagged"
        for i in range(take):
            body = out[i, : out_len[i]].tobytes()
            want = rows[i, : lens[i]].tobytes()
            if lens[i] == 0:
                assert out_len[i] == 0
                continue
            got = ref.decompress(write_varu64(int(lens[i])) + body)
            assert got == want, f"leg11 block {done + i}"
        done += take
    return {"leg11_blocks": n_blocks}


def leg12(n_blocks: int) -> dict:
    """Device chain-resolution route (round 5): random 64 KiB blocks
    through the fused first-hop resolve pipeline (interpret on CPU),
    bytes vs the native decoder; fallback-flag accounting."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from snappy_tpu import native
    from snappy_tpu.ops.resolve import decode_resolve_batch

    rng = np.random.default_rng(0x5E50 + SEED_OFFSET)
    bodies, wants = [], []
    while len(bodies) < n_blocks:
        data = gen_input(rng)[: 1 << 16]
        if not data:
            continue
        comp = native.compress(data)
        p = 0
        while comp[p] & 0x80:
            p += 1
        body = comp[p + 1 :]
        if len(body) > 512 * 128:  # route constraint: <= 512 src rows
            continue
        bodies.append(body)
        wants.append(data)
    n = len(bodies)
    stride = -(-max(len(b) for b in bodies) // 128) * 128
    srcs = np.zeros((n, stride), np.uint8)
    for i, b in enumerate(bodies):
        srcs[i, : len(b)] = np.frombuffer(b, np.uint8)
    lens = np.array([len(b) for b in bodies], np.uint64)
    decl = np.array([len(w) for w in wants], np.uint64)
    recs, nops, errs, dt = native.scan_records_batch(
        srcs, lens, decl, 1 << 14, threads=2
    )
    assert int(errs.sum()) == 0
    out, fb = decode_resolve_batch(
        srcs, recs, nops, decl.astype(np.int64), 1 << 16, interpret=True
    )
    out = np.asarray(out)
    fb = np.asarray(fb)
    for i, w in enumerate(wants):
        assert not fb[i], f"leg12 unexpected fallback at {i}"
        assert out[i, : len(w)].tobytes() == w, f"leg12 block {i}"
    return {"leg12_blocks": n}


def main() -> None:
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n3 = int(sys.argv[3]) if len(sys.argv) > 3 else 3_000
    n4 = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    n5 = int(sys.argv[5]) if len(sys.argv) > 5 else 2_000
    n6 = int(sys.argv[6]) if len(sys.argv) > 6 else 2_000
    n7 = int(sys.argv[7]) if len(sys.argv) > 7 else 2_000
    n8 = int(sys.argv[8]) if len(sys.argv) > 8 else 200
    n9 = int(sys.argv[9]) if len(sys.argv) > 9 else 200
    n10 = int(sys.argv[10]) if len(sys.argv) > 10 else 24
    n11 = int(sys.argv[11]) if len(sys.argv) > 11 else 48
    n12 = int(sys.argv[12]) if len(sys.argv) > 12 else 24
    t0 = time.time()
    out = {}
    out.update(leg1(n1))
    print(json.dumps({"progress": "leg1 done", **out}), flush=True)
    out.update(leg2(n2))
    print(json.dumps({"progress": "leg2 done", **out}), flush=True)
    out.update(leg3(n3))
    print(json.dumps({"progress": "leg3 done", **out}), flush=True)
    out.update(leg4(n4))
    print(json.dumps({"progress": "leg4 done", **out}), flush=True)
    out.update(leg5(n5))
    print(json.dumps({"progress": "leg5 done", **out}), flush=True)
    out.update(leg6(n6))
    print(json.dumps({"progress": "leg6 done", **out}), flush=True)
    out.update(leg7(n7))
    print(json.dumps({"progress": "leg7 done", **out}), flush=True)
    out.update(leg8(n8))
    print(json.dumps({"progress": "leg8 done", **out}), flush=True)
    out.update(leg9(n9))
    print(json.dumps({"progress": "leg9 done", **out}), flush=True)
    out.update(leg10(n10))
    print(json.dumps({"progress": "leg10 done", **out}), flush=True)
    out.update(leg11(n11))
    print(json.dumps({"progress": "leg11 done", **out}), flush=True)
    out.update(leg12(n12))
    out["elapsed_s"] = round(time.time() - t0, 1)
    out["ok"] = True
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
