"""Host-facing wrappers over the batched device codecs.

These parse/emit the tiny host-side framing (the varint preamble,
reference ``src/decompress.rs:356-375``) and move bytes to/from fixed
shape device batches. Exact error parity: device kernels reduce validity
flags; on any flagged stream the host re-runs the NumPy reference codec,
which raises the identical exception the sequential loop would have
(same variant, same fields).
"""

from __future__ import annotations

import numpy as np

from .. import error as err
from ..config import get_config
from ..format import reference as ref
from ..format.constants import MAX_INPUT_SIZE
from ..format.varint import read_varu64, write_varu64
from . import packing
from .decode import OK, decode_batch

# Routing caps and batching knobs live in ``snappy_tpu.config.Config``
# (max_device_stream, max_device_output, pallas_max_dpad,
# replay_max_body, blocks_per_launch, decode_rows_per_launch) — one
# documented dataclass instead of scattered module constants; env vars
# are deployment overrides only. The VMEM/SMEM budget derivations
# behind the defaults are documented on the Config fields.


def _host_engine():
    """The sequential host engine (native, else oracle) for fallbacks.

    Deliberately not ``get_engine("auto")``: with SNAPPY_TPU_ENGINE=device
    the auto default resolves back to this module and would recurse.
    """
    from ..engine import _native_engine, _reference_engine

    return _native_engine() or _reference_engine()


def _check_header(data: bytes) -> tuple[int, int]:
    if len(data) == 0:
        raise err.Empty()
    declen, hdr = read_varu64(data)
    if hdr == 0:
        raise err.Header()
    if declen > MAX_INPUT_SIZE:
        raise err.TooBig(given=declen, max=MAX_INPUT_SIZE)
    return declen, hdr


def decompress(data: bytes) -> bytes:
    """Decompress one raw Snappy stream on the device.

    Bit-exact output and exact error parity with the reference decoder.
    Streams past ``Config.max_device_stream`` route to the host engine
    (the whole-stream parallel parse would need multi-GB scratch; real
    bulk data flows through the frame format's independent chunks).
    """
    cfg = get_config()
    declen, hdr = _check_header(data)
    # Scratch-allocation guard: in any valid stream the densest op is
    # copy2/copy4 (>= 3 stream bytes per <= 64 output bytes), so declen
    # can't exceed ~22x the body.  A crafted few-byte stream declaring a
    # huge declen must not get to size device scratch (the parallel parse
    # allocates several int32 arrays of the padded output width); route it
    # to the sequential host engine, which raises the reference's exact
    # error without the amplification.
    if declen > (64 * max(len(data) - hdr, 0)) // 3 + 64:
        return _host_engine().decompress(data)
    if len(data) > cfg.max_device_stream or declen > cfg.max_device_output:
        return _host_engine().decompress(data)
    # Past the Pallas VMEM cap a single stream gains nothing from the
    # batch path (decompress_streams would route it to the host codec
    # anyway, paying the padded-batch packing first) — go direct.
    if declen > cfg.pallas_max_dpad:
        return _host_engine().decompress(data)
    body = data[hdr:]
    outs, errs, _ = decompress_streams([body], [declen])
    if int(errs[0]) != OK:
        ref.decompress(data)  # raises the exact sequential error
        raise err.HeaderMismatch(expected_len=declen, got_len=-1)  # unreachable
    return outs[0]


def _width_bucket(n: int) -> int:
    """Static row width for a body of ``n`` bytes (bounded bucket set)."""
    b = packing.pad_to_bucket(max(n, 1), 1024)
    if 65536 < n <= 81920:
        # Frame-chunk bodies top out at max_compress_len(65536) = 76490;
        # an 81920 row beats the 128 KiB pow2 bucket by 36%.
        b = 81920
    return b


def decompress_streams(
    bodies: list[bytes], declens: list[int], with_crc: bool = False
) -> tuple[list[bytes], np.ndarray, np.ndarray | None]:
    """Batched device decode of raw op streams (no varint headers).

    Returns ``(outputs, err_codes, crcs-or-None)`` in input order. Rows
    are grouped by size bucket so small chunks don't pay the widest
    row's traffic, each group padded to its shared static width (compile
    reuse), and large groups run as multiple bounded launches (decode
    scratch is a few MB per row). ``with_crc=True`` additionally returns
    each output's masked CRC32C, computed in the same launch (the frame
    read path's verification without a second data pass).
    """
    import jax.numpy as jnp

    from .decode import (
        decode_batch_hosted,
        decode_crc_batch,
        decode_crc_batch_hosted,
    )

    if not bodies:
        return [], np.zeros(0, np.int32), (np.zeros(0, np.uint32) if with_crc else None)

    cfg = get_config()
    # Hybrid split by default when the native runtime is present: the
    # host's sequential tag walk marks op starts (0.03% of the work),
    # letting the device skip its pointer-doubling discovery phase —
    # measured ~2.9x faster, bit-identical, same error codes (device-side
    # validation still runs on every op). Config.pure_device forces
    # the all-device formulation.
    scan = None
    if not cfg.pure_device:
        try:
            from .. import native

            if native.available():
                scan = native.scan_ops
        except Exception:
            scan = None
    # Pallas replay route — the default on a real TPU backend: the
    # VMEM/SMEM-resident kernel measured 2.2x (8 blocks) to 5.3x (392
    # blocks) faster than the XLA formulation on the development chip
    # (BENCH_PALLAS_VS_XLA.json) — the whole block stays on-core,
    # sidestepping the HBM wall that binds the XLA decode's intermediate
    # arrays. Bytes, error codes, and fused checksums are identical by
    # test. Config.pallas_decode=True/False forces it on (any backend —
    # interpret mode off-TPU) or off; Config.pure_device keeps meaning
    # "the all-XLA formulation" and also disables it.
    if cfg.pallas_decode is not None:
        use_pallas = cfg.pallas_decode
    else:
        try:
            import jax

            from .pallas.decode import _PALLAS

            use_pallas = (
                _PALLAS
                and jax.default_backend() == "tpu"
                and not cfg.pure_device
            )
        except Exception:
            use_pallas = False
    # Record-replay route (opt-in until A/B-verified on a healthy
    # chip): the host scan validates every op and packs it into an
    # 8-byte record, so the replay kernel's per-op scalar work drops to
    # two SMEM reads + one vector move — the measured corpus op mix
    # (7.35 output bytes/op, 99.5% single-window ops) makes that scalar
    # walk the per-chip throughput ceiling. Error codes come from the
    # host scan (a lockstep mirror of device validation — exact parity
    # by test); rows whose record count overflows the cap fall back to
    # the self-contained kernel.
    use_records = use_pallas and scan is not None and cfg.pallas_records
    # Flat-gather route — the default Pallas decode when the native
    # runtime is present: the host flattens every copy chain to per-byte
    # literal-source indices (stpu_flatten_idx, validation in lockstep
    # with the device codes), and the kernel runs one windowed MXU
    # gather per 8-row tile — no sequential op walk on device at all.
    # Measured on-chip 22.5x the replay kernel, bit-identical
    # (DEVICE_TIME.json; a9f1bd0). Rows whose tile source spread
    # exceeds the wide window (only possible past 64 KiB outputs) fall
    # back to the replay kernel. Config.pallas_flat=False disables;
    # Config.pallas_records=True (explicit opt-in) takes precedence.
    use_flat = (
        use_pallas and not use_records and scan is not None and cfg.pallas_flat
    )
    # Device chain-resolution route (opt-in, Config.pallas_resolve):
    # the host contributes only the O(records) op scan; the TPU builds
    # the literal-origin index itself (ops/resolve.py) and then runs
    # the same flat v2 gather. Per-chip rate is below the host-flatten
    # flat route, but host cost drops ~10x — the right trade when host
    # cores are scarce relative to chips (RESOLVE_BENCH_r05.json).
    # Rows the route can't serve (record-cap overflow, source spread
    # past the wide window, or a chain deeper than the kernel's round
    # budget) fall through to the flat route below.
    use_resolve = (
        use_pallas
        and not use_records
        and scan is not None
        and cfg.pallas_resolve
    )
    order = sorted(range(len(bodies)), key=lambda i: _width_bucket(len(bodies[i])))
    outs: list[bytes] = [b""] * len(bodies)
    errs = np.zeros(len(bodies), np.int32)
    crcs = np.zeros(len(bodies), np.uint32) if with_crc else None

    start = 0
    while start < len(order):
        bucket = _width_bucket(len(bodies[order[start]]))
        end = start
        while (
            end < len(order)
            and _width_bucket(len(bodies[order[end]])) == bucket
            and end - start < cfg.decode_rows_per_launch
        ):
            end += 1
        idxs = order[start:end]
        group = [bodies[i] for i in idxs]
        gdecl = [declens[i] for i in idxs]
        d_pad = packing.pad_to_bucket(max(max(gdecl), 1), 1024)
        srcs, lens = packing.batch_streams(group, bucket)
        # VMEM-residency cap: outputs wider than the Pallas scratch
        # budget take the HBM-streaming XLA routes (or the host codec
        # below, which skips the device transfer entirely).
        group_pallas_ok = d_pad <= cfg.pallas_max_dpad
        routed = False
        if not group_pallas_ok and scan is not None:
            # Oversized rows (multi-MB raw streams; frame chunks never
            # get here): the multithreaded host codec outruns the XLA
            # device formulations by ~2 orders at these sizes. Error
            # codes come from the host op scan — the same lockstep
            # mirror of device validation the records route uses.
            from .. import native as _nat

            _, _, herrs, _dt = _nat.scan_records_batch(
                srcs, np.asarray(lens, np.uint64),
                np.asarray(gdecl, np.uint64), 512,
            )
            ok_rows = [j for j in range(len(group)) if int(herrs[j]) == 0]
            decoded = _nat.decompress_batch(
                [write_varu64(gdecl[j]) + group[j] for j in ok_rows]
            )
            heng = _host_engine()
            for j, i in enumerate(idxs):
                errs[i] = herrs[j]
            for k, j in enumerate(ok_rows):
                outs[idxs[j]] = decoded[k]
                if with_crc:
                    crcs[idxs[j]] = heng.crc32c_masked(decoded[k])
            if cfg.debug:
                _debug_check_streams(
                    [bodies[i] for i in idxs], [declens[i] for i in idxs],
                    [outs[i] for i in idxs], herrs,
                )
            start = end
            continue
        args = (
            jnp.asarray(srcs),
            jnp.asarray(lens),
            jnp.asarray(np.asarray(gdecl, np.int32)),
        )
        if (
            use_resolve
            and group_pallas_ok
            and d_pad % 16384 == 0
            # The route's pointer packing is 16-bit positions + 17-bit
            # source indices (ops/resolve.py FLAG): 64 KiB outputs and
            # <=512-row bodies only — every frame chunk qualifies;
            # larger raw streams take the flat route below.
            and d_pad <= 65536
            and srcs.shape[1] <= 512 * 128
        ):
            from .. import native
            from .crc32c import crc32c_masked_blocks
            from .resolve import decode_resolve_batch

            rec_cap = min(16384, bucket // 2 + 1)
            rec_cap = -(-rec_cap // 512) * 512
            recs, nops, herrs, _dt = native.scan_records_batch(
                srcs, np.asarray(lens, np.uint64),
                np.asarray(gdecl, np.uint64), rec_cap,
            )
            if int(nops.max(initial=0)) <= rec_cap:
                dst, fb = decode_resolve_batch(
                    srcs, recs, nops, np.asarray(gdecl, np.int64), d_pad
                )
                if not np.asarray(fb).any():
                    gerrs = herrs
                    gcrc = (
                        np.asarray(crc32c_masked_blocks(dst, args[2]))
                        if with_crc
                        else None
                    )
                    routed = True
        if routed:
            pass
        elif use_flat and group_pallas_ok:
            from .. import native
            from .pallas.decode import decode_flat_pallas, decode_flat_pallas_v2

            # v2 (transposed idx layout, no element-major relayouts;
            # measured 1.76x v1 on-chip, DEVICE_TIME.json) needs d_pad in
            # whole 16-tile groups; other widths use the v1 kernel.
            use_v2 = d_pad % 16384 == 0
            idxr, tmeta, fallb, herrs, _dt = native.flatten_idx_batch(
                srcs, np.asarray(lens, np.uint64),
                np.asarray(gdecl, np.uint64), d_pad,
                layout=1 if use_v2 else 0,
            )
            if not fallb.any():
                from .crc32c import crc32c_masked_blocks

                decode_fn = decode_flat_pallas_v2 if use_v2 else decode_flat_pallas
                dst = decode_fn(
                    args[0],
                    jnp.asarray(idxr),  # uint16 on the wire; widened on device
                    jnp.asarray(tmeta),
                    args[2],
                    d_pad,
                )
                gerrs = herrs
                gcrc = (
                    np.asarray(crc32c_masked_blocks(dst, args[2]))
                    if with_crc
                    else None
                )
                routed = True
        if routed:
            pass
        elif use_records and group_pallas_ok:
            from .. import native
            from .pallas.decode import decode_records_pallas

            rec_cap = min(16384, bucket // 2 + 1)
            rec_cap = -(-rec_cap // 512) * 512
            recs, nops, herrs, _dts = native.scan_records_batch(
                srcs, np.asarray(lens, np.uint64),
                np.asarray(gdecl, np.uint64), rec_cap,
            )
            if int(nops.max(initial=0)) <= rec_cap:
                from .crc32c import crc32c_masked_blocks

                r_pad = max(512, -(-int(nops.max(initial=1)) // 512) * 512)
                dst = decode_records_pallas(
                    args[0],
                    jnp.asarray(np.ascontiguousarray(recs[:, :r_pad])),
                    jnp.asarray(nops.astype(np.int32)),
                    args[2],
                    d_pad,
                )
                gerrs = herrs
                gcrc = (
                    np.asarray(crc32c_masked_blocks(dst, args[2]))
                    if with_crc
                    else None
                )
                routed = True
        if routed:
            pass
        elif use_pallas and group_pallas_ok and bucket <= cfg.replay_max_body:
            from .crc32c import crc32c_masked_blocks
            from .pallas.decode import decode_batch_pallas

            dst, gerrs = decode_batch_pallas(*args, d_pad)
            # The kernel zeroes past declen (the CRC pad-retraction's
            # precondition), so the checksum rides the output directly.
            gcrc = np.asarray(crc32c_masked_blocks(dst, args[2])) if with_crc else None
        elif scan is not None:
            bits = np.zeros((len(group), bucket // 8), np.uint8)
            # One C++ call walks every row, chunk-parallel across host
            # cores (no per-row Python dispatch, no thread-pool setup).
            from .. import native

            native.scan_ops_batch(srcs, np.asarray(lens, np.uint64), bits)
            margs = args + (jnp.asarray(bits),)
            if with_crc:
                dst, gerrs, _total, gcrc = decode_crc_batch_hosted(*margs, d_pad)
                gcrc = np.asarray(gcrc)
            else:
                dst, gerrs, _total = decode_batch_hosted(*margs, d_pad)
                gcrc = None
        elif with_crc:
            dst, gerrs, _total, gcrc = decode_crc_batch(*args, d_pad)
            gcrc = np.asarray(gcrc)
        else:
            dst, gerrs, _total = decode_batch(*args, d_pad)
            gcrc = None
        dst = np.asarray(dst)
        gerrs = np.asarray(gerrs)
        for j, i in enumerate(idxs):
            outs[i] = dst[j, : gdecl[j]].tobytes()
            errs[i] = gerrs[j]
            if gcrc is not None:
                crcs[i] = gcrc[j]
        if cfg.debug:
            _debug_check_streams(
                [bodies[i] for i in idxs], [declens[i] for i in idxs],
                [outs[i] for i in idxs], gerrs,
            )
        start = end
    return outs, errs, crcs


def _debug_check_streams(bodies, declens, outs, errcodes) -> None:
    """Sanitizer mode (SNAPPY_TPU_DEBUG=1): cross-check every device
    decode against the NumPy oracle — output bytes and error/no-error
    agreement — and fail loudly on divergence. The analog of the
    reference's debug_assert!-guarded unsafe cores (SURVEY.md §5)."""
    for body, declen, out, code in zip(bodies, declens, outs, errcodes):
        stream = write_varu64(declen) + body
        try:
            want = ref.decompress(stream)
        except err.SnappyError:
            if int(code) == OK:
                raise AssertionError(
                    "SNAPPY_TPU_DEBUG: device decode accepted a stream the "
                    "oracle rejects"
                )
            continue
        if int(code) != OK:
            raise AssertionError(
                "SNAPPY_TPU_DEBUG: device decode flagged a stream the "
                f"oracle accepts (code {int(code)})"
            )
        if out != want:
            raise AssertionError(
                "SNAPPY_TPU_DEBUG: device decode output mismatch vs oracle"
            )


def decompress_frame(data: bytes) -> bytes:
    """Decode a whole frame-format buffer with batched device kernels.

    The host walks the chunk structure (a few bytes per 64 KiB chunk);
    all compressed chunk payloads decode in one device batch and every
    data chunk's masked CRC32C is verified in a second batch. Error
    semantics match the streaming reader (reference
    ``src/read.rs:105-238``) exactly: the walk stops at the first
    structural error, data chunks before it are checked in stream order
    (decode errors precede the chunk's checksum check), and the earliest
    failure wins.
    """
    import jax.numpy as jnp

    from ..format.constants import (
        CHUNK_TYPE_COMPRESSED,
        CHUNK_TYPE_PADDING,
        CHUNK_TYPE_STREAM,
        CHUNK_TYPE_UNCOMPRESSED,
        MAX_BLOCK_SIZE,
        MAX_COMPRESS_BLOCK_SIZE,
        STREAM_BODY,
    )
    pos = 0
    n = len(data)
    read_ident = False
    # (kind 0=compressed/1=uncompressed, body, expected_crc, declen,
    #  known_error or None) in stream order.
    datachunks = []
    pending: Exception | None = None  # first structural error, if any

    def _need(k: int) -> bytes:
        nonlocal pos
        if pos + k > n:
            raise EOFError("snappy: unexpected EOF while reading frame chunk")
        out = data[pos : pos + k]
        pos += k
        return out

    try:
        while pos < n:
            header = _need(4)
            ty = header[0]
            if not read_ident:
                if ty != CHUNK_TYPE_STREAM:
                    raise err.StreamHeader(byte=ty)
                read_ident = True
            length = header[1] | (header[2] << 8) | (header[3] << 16)
            if length > MAX_COMPRESS_BLOCK_SIZE:
                raise err.UnsupportedChunkLength(len=length, header=False)
            if 0x02 <= ty <= 0x7F:
                raise err.UnsupportedChunkType(byte=ty)
            if 0x80 <= ty <= 0xFD or ty == CHUNK_TYPE_PADDING:
                _need(length)
                continue
            if ty == CHUNK_TYPE_STREAM:
                if length != len(STREAM_BODY):
                    raise err.UnsupportedChunkLength(len=length, header=True)
                body = _need(length)
                if body != STREAM_BODY:
                    raise err.StreamHeaderMismatch(bytes=body)
                continue
            if length < 4:
                raise err.UnsupportedChunkLength(len=length, header=False)
            payload = _need(length)
            crc = int.from_bytes(payload[:4], "little")
            body = payload[4:]
            if ty == CHUNK_TYPE_UNCOMPRESSED:
                if len(body) > MAX_BLOCK_SIZE:
                    raise err.UnsupportedChunkLength(len=len(body), header=False)
                datachunks.append((1, body, crc, len(body), None))
            else:
                assert ty == CHUNK_TYPE_COMPRESSED
                # Mirror the sequential reader: decompress_len, the
                # MAX_BLOCK_SIZE bound, then decode (src/read.rs:200-235).
                known = None
                declen = 0
                if len(body) == 0:
                    known = err.Empty()
                else:
                    try:
                        declen, hdr = _check_header(body)
                        body = body[hdr:]
                    except err.SnappyError as e:
                        known = e
                    else:
                        if declen > MAX_BLOCK_SIZE:
                            raise err.UnsupportedChunkLength(
                                len=declen, header=False
                            )
                datachunks.append((0, body, crc, declen, known))
                if known is not None:
                    break  # sequential reader stops at this chunk
    except (err.SnappyError, EOFError) as e:
        pending = e

    comp_idx = [i for i, c in enumerate(datachunks) if c[0] == 0 and c[4] is None]
    # Uncompressed chunks pass through; known-error chunks contribute no
    # bytes (their error is raised before their checksum would be read).
    outputs = [c[1] if c[0] == 1 else b"" for c in datachunks]
    errcodes = np.zeros(len(comp_idx), np.int32)
    got_crc = np.zeros(len(datachunks), np.uint32)
    if comp_idx:
        # Fused decode+CRC: decompressed bytes cross the host boundary
        # exactly once; their checksums ride the same launch.
        outs, errcodes, comp_crc = decompress_streams(
            [datachunks[i][1] for i in comp_idx],
            [datachunks[i][3] for i in comp_idx],
            with_crc=True,
        )
        for j, i in enumerate(comp_idx):
            outputs[i] = outs[j]
            got_crc[i] = comp_crc[j]

    if datachunks:
        # Uncompressed chunks: checksum their (host-resident) payloads
        # with the host engine's hardware CRC.
        heng = _host_engine()
        for i, c in enumerate(datachunks):
            if c[0] == 1:
                got_crc[i] = heng.crc32c_masked(c[1])
        exp_crc = np.array([c[2] for c in datachunks], np.uint32)
        bad_dec = {i: int(e) for i, e in zip(comp_idx, errcodes) if int(e) != OK}
        bad_crc = set(np.nonzero(got_crc != exp_crc)[0].tolist())
        for i, chunk in enumerate(datachunks):
            if chunk[4] is not None:
                raise chunk[4]
            if i in bad_dec:
                ref.decompress(write_varu64(chunk[3]) + chunk[1])
                raise err.HeaderMismatch(expected_len=chunk[3], got_len=-1)
            if i in bad_crc:
                raise err.Checksum(expected=int(exp_crc[i]), got=int(got_crc[i]))

    if pending is not None:
        raise pending
    return b"".join(outputs)


def compress(data: bytes, profile: str = "exact") -> bytes:
    """Compress one raw Snappy stream on the device.

    Blocks are compressed in parallel lanes; the varint preamble and the
    ordered concatenation of per-block op streams happen on the host.

    ``profile='exact'`` replays the reference's greedy automaton —
    byte-identical output. ``profile='fast'`` uses the parallel-parse
    matcher (``ops/encode_fast.py``): valid Snappy, compressed size <=
    the reference's on real data, and orders of magnitude faster on
    device.
    """
    n = len(data)
    from ..format.constants import max_compress_len

    cfg = get_config()
    if max_compress_len(n) == 0:
        raise err.TooBig(given=n, max=MAX_INPUT_SIZE)
    if n == 0:
        return b"\x00"
    if profile == "exact":
        from .encode import compress_blocks_host as codec

        # On a real TPU backend the Pallas automaton replaces the XLA
        # lockstep formulation: same byte-identical greedy replay, but
        # VMEM/SMEM-resident — measured 5.9x faster on the development
        # chip (the XLA automaton is latency-bound; PARITY.md "Known
        # deltas"). Config.pallas_encode=True/False forces it on/off.
        try:
            import jax

            from .pallas.encode import _PALLAS

            use_pallas = (
                cfg.pallas_encode
                if cfg.pallas_encode is not None
                else (_PALLAS and jax.default_backend() == "tpu")
            )
        except Exception:
            use_pallas = False
        if use_pallas:
            from .pallas.encode import compress_blocks_pallas

            def codec(bb, ll):
                import jax.numpy as jnp

                o, olen = compress_blocks_pallas(
                    jnp.asarray(bb), jnp.asarray(np.asarray(ll, np.int32))
                )
                return np.asarray(o), np.asarray(olen)
    elif profile == "fast":
        from .encode_fast import compress_blocks_fast_host as codec

        # Flat device encoder — the TPU-native fast profile (round 4):
        # lockstep segment-parallel parse + windowed-gather emission,
        # size <= the reference's on every corpus file. Auto on a real
        # TPU backend; Config.flat_encode forces it either way.
        try:
            import jax

            from .pallas.encode_flat import _PALLAS as _FLAT_OK

            use_flat = (
                cfg.flat_encode
                if cfg.flat_encode is not None
                else (_FLAT_OK and jax.default_backend() == "tpu")
            )
        except Exception:
            use_flat = False
        if use_flat:
            from .encode_flat import compress_blocks_flat_host as codec
    else:
        raise ValueError(f"unknown profile {profile!r}")

    blocks, lengths = packing.blocks_of(data)
    parts = [write_varu64(n)]
    # Launch in bounded batches: device scratch per block is a few
    # hundred KB, so unbounded batches would exhaust HBM on GB inputs.
    # Row counts pad to power-of-two buckets (zero-length rows emit
    # nothing) so repeated calls reuse compiled executables.
    bpl = cfg.blocks_per_launch
    for start in range(0, blocks.shape[0], bpl):
        bb = blocks[start : start + bpl]
        ll = lengths[start : start + bpl]
        want = bb.shape[0]
        padded = packing.pad_to_bucket(want, 1)
        if padded != want:
            bb = np.concatenate(
                [bb, np.zeros((padded - want, bb.shape[1]), bb.dtype)]
            )
            ll = np.concatenate([ll, np.zeros(padded - want, ll.dtype)])
        outs, outlens = codec(bb, ll)
        for i in range(want):
            parts.append(outs[i, : int(outlens[i])].tobytes())
    return b"".join(parts)
