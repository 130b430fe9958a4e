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
from ..format import reference as ref
from ..format.constants import MAX_INPUT_SIZE
from ..format.varint import read_varu64, write_varu64
from . import packing
from .decode import OK, decode_batch

#: Streams larger than this stay on the host path (device int32 indexing
#: and memory amplification make very large single streams a poor fit).
MAX_DEVICE_STREAM = 1 << 26


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
    """
    import jax.numpy as jnp

    declen, hdr = _check_header(data)
    body = data[hdr:]
    outs, errs = decompress_streams([body], [declen])
    if int(errs[0]) != OK:
        ref.decompress(data)  # raises the exact sequential error
        raise err.HeaderMismatch(expected_len=declen, got_len=-1)  # unreachable
    return outs[0]


def decompress_streams(
    bodies: list[bytes], declens: list[int]
) -> tuple[list[bytes], np.ndarray]:
    """Batched device decode of raw op streams (no varint headers).

    Returns ``(outputs, err_codes)``; outputs are trimmed to their
    declared lengths. Rows are padded to shared power-of-two widths so
    repeated calls reuse compiled executables.
    """
    import jax.numpy as jnp

    if not bodies:
        return [], np.zeros(0, np.int32)
    s_pad = packing.pad_to_bucket(max(max(len(b) for b in bodies), 1), 1024)
    d_pad = packing.pad_to_bucket(max(max(declens), 1), 1024)
    srcs, lens = packing.batch_streams(bodies, s_pad)
    dst, errs, _total = decode_batch(
        jnp.asarray(srcs),
        jnp.asarray(lens),
        jnp.asarray(np.asarray(declens, np.int32)),
        d_pad,
    )
    dst = np.asarray(dst)
    errs = np.asarray(errs)
    outs = [dst[i, : declens[i]].tobytes() for i in range(len(bodies))]
    return outs, errs


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

    if max_compress_len(n) == 0:
        raise err.TooBig(given=n, max=MAX_INPUT_SIZE)
    if n == 0:
        return b"\x00"
    if profile == "exact":
        from .encode import compress_blocks_host as codec
    elif profile == "fast":
        from .encode_fast import compress_blocks_fast_host as codec
    else:
        raise ValueError(f"unknown profile {profile!r}")

    blocks, lengths = packing.blocks_of(data)
    outs, outlens = codec(blocks, lengths)
    parts = [write_varu64(n)]
    for i in range(outs.shape[0]):
        parts.append(outs[i, : int(outlens[i])].tobytes())
    return b"".join(parts)
