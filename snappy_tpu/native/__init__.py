"""ctypes bindings for the native C++ host runtime.

The shared library is built on demand with g++ (no packaging machinery
needed inside the repo); the build is cached next to the source and
invalidated by source mtime. If no compiler is available, callers fall
back to the NumPy reference engine (see ``snappy_tpu.engine``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

from .. import error as err_mod
from ..format.constants import MAX_INPUT_SIZE, max_compress_len

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "core.cpp")
_LIB_PATH = os.path.join(_HERE, "_snappy_core.so")
_EXT_SRC = os.path.join(_HERE, "ext.cpp")
_EXT_PATH = os.path.join(_HERE, "_snappy_ext.so")

_lock = threading.Lock()
_lib = None
_load_failed = False
_ext = None  # CPython extension module, or False once loading failed


class _Error(ctypes.Structure):
    _fields_ = [
        ("code", ctypes.c_int32),
        ("a", ctypes.c_uint64),
        ("b", ctypes.c_uint64),
        ("c", ctypes.c_uint64),
    ]


def _build() -> None:
    base = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-fno-exceptions"]
    tail = [_SRC, "-o", _LIB_PATH + ".tmp"]
    try:
        # Native ISA unlocks hardware CRC32C and wider loads (the role
        # SSE4.2 dispatch plays in reference src/crc32.rs:59-82).
        subprocess.run(base + ["-march=native"] + tail, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        subprocess.run(base + tail, check=True, capture_output=True)
    os.replace(_LIB_PATH + ".tmp", _LIB_PATH)


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if (
                not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:
            _load_failed = True
            return None
        # Destination buffers are typed c_void_p so call sites can pass a
        # raw integer address (``arr.ctypes.data``, ~1 us) instead of a
        # POINTER(c_uint8) built via ``arr.ctypes.data_as`` (~2.3 us);
        # pointer instances still auto-convert, so both forms work.
        u8p = ctypes.c_void_p
        lib.stpu_max_compress_len.restype = ctypes.c_uint64
        lib.stpu_max_compress_len.argtypes = [ctypes.c_uint64]
        lib.stpu_crc32c.restype = ctypes.c_uint32
        lib.stpu_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.stpu_crc32c_masked.restype = ctypes.c_uint32
        lib.stpu_crc32c_masked.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.stpu_compress.restype = ctypes.c_int64
        lib.stpu_compress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            u8p,
            ctypes.c_uint64,
            ctypes.POINTER(_Error),
        ]
        lib.stpu_decompress_len.restype = ctypes.c_int64
        lib.stpu_decompress_len.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.POINTER(_Error),
        ]
        lib.stpu_scan_ops.restype = ctypes.c_int64
        lib.stpu_scan_ops.argtypes = [ctypes.c_char_p, ctypes.c_uint64, u8p]
        lib.stpu_decompress.restype = ctypes.c_int64
        lib.stpu_decompress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            u8p,
            ctypes.c_uint64,
            ctypes.POINTER(_Error),
        ]
        lib.stpu_frame_compress.restype = ctypes.c_int64
        lib.stpu_frame_compress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            u8p,
            ctypes.c_uint64,
            ctypes.c_int,
            ctypes.POINTER(_Error),
        ]
        lib.stpu_frame_decompress_len.restype = ctypes.c_int64
        lib.stpu_frame_decompress_len.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.POINTER(_Error),
        ]
        lib.stpu_frame_decompress.restype = ctypes.c_int64
        lib.stpu_frame_decompress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            u8p,
            ctypes.c_uint64,
            ctypes.c_int,
            ctypes.POINTER(_Error),
        ]
        batch_sig = [
            u8p,               # srcs (strided rows)
            ctypes.c_uint64,   # src_stride
            u8p,               # lens (uint64[n])
            u8p,               # dsts (strided rows)
            ctypes.c_uint64,   # dst_stride
            u8p,               # out_lens (uint64[n])
            u8p,               # errs (uint64[n,4])
            ctypes.c_uint64,   # n
            ctypes.c_int,      # threads
        ]
        lib.stpu_compress_batch.restype = None
        lib.stpu_compress_batch.argtypes = batch_sig
        lib.stpu_decompress_batch.restype = None
        lib.stpu_decompress_batch.argtypes = batch_sig
        lib.stpu_scan_ops_batch.restype = None
        lib.stpu_scan_ops_batch.argtypes = [
            u8p, ctypes.c_uint64, u8p, u8p, ctypes.c_uint64,
            ctypes.c_uint64, ctypes.c_int,
        ]
        lib.stpu_scan_records_batch.restype = None
        lib.stpu_scan_records_batch.argtypes = [
            u8p,               # srcs (strided rows)
            ctypes.c_uint64,   # src_stride
            u8p,               # lens (uint64[n])
            u8p,               # declens (uint64[n])
            u8p,               # recs (int32[n, rec_cap, 2])
            ctypes.c_int64,    # rec_cap
            u8p,               # nops (int64[n])
            u8p,               # errs (int32[n])
            u8p,               # dtotals (int64[n])
            ctypes.c_uint64,   # n
            ctypes.c_int,      # threads
        ]
        lib.stpu_flatten_idx_batch.restype = None
        lib.stpu_flatten_idx_batch.argtypes = [
            u8p,               # srcs (strided rows)
            ctypes.c_uint64,   # src_stride
            u8p,               # lens (uint64[n])
            u8p,               # declens (uint64[n])
            ctypes.c_int64,    # s_rows
            u8p,               # idx_rel (uint16[n, d_pad])
            ctypes.c_uint64,   # d_pad
            u8p,               # tile_meta (int32[n, d_pad/1024, 2])
            u8p,               # fallbacks (int64[n])
            u8p,               # errs (int32[n])
            u8p,               # dtotals (int64[n])
            ctypes.c_uint64,   # n
            ctypes.c_int,      # threads
            ctypes.c_int,      # layout (0 = output order, 1 = v2 blocks)
        ]
        _lib = lib
        return _lib


def _build_ext() -> None:
    import sysconfig

    inc = sysconfig.get_paths()["include"]
    base = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-fno-exceptions",
        f"-I{inc}",
    ]
    tail = [_EXT_SRC, "-o", _EXT_PATH + ".tmp"]
    try:
        subprocess.run(base + ["-march=native"] + tail, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        subprocess.run(base + tail, check=True, capture_output=True)
    os.replace(_EXT_PATH + ".tmp", _EXT_PATH)


def _raise_code(code: int, a: int, b: int, c: int):
    """Error trampoline installed into the C extension: map a stpu_error
    to the exact Python exception (same table as the ctypes ``_raise``)."""
    e = _Error()
    e.code, e.a, e.b, e.c = code, a, b, c
    _raise(e)


def _get_ext():
    """Build/import the CPython extension binding; None when unavailable.

    The extension removes the ~2.5 us/call ctypes marshalling floor
    (BENCH_HOST.md 200-byte row) and releases the GIL around codec work.
    Failures (no compiler, no Python headers) leave the ctypes path in
    charge — same functions, same semantics.
    """
    global _ext
    if _ext is not None:
        return _ext or None
    with _lock:
        if _ext is not None:
            return _ext or None
        try:
            src_mtime = max(os.path.getmtime(_EXT_SRC), os.path.getmtime(_SRC))
            if (
                not os.path.exists(_EXT_PATH)
                or os.path.getmtime(_EXT_PATH) < src_mtime
            ):
                _build_ext()
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "snappy_tpu.native._snappy_ext", _EXT_PATH
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            mod.set_error_handler(_raise_code)
        except Exception:
            _ext = False
            return None
        _ext = mod
        return mod


def available() -> bool:
    return _load() is not None


_E = err_mod


def _raise(e: _Error):
    code = int(e.code)
    if code == 8:  # E_EMPTY
        raise _E.Empty()
    if code == 9:  # E_BUFFER_TOO_SMALL
        raise _E.BufferTooSmall(given=int(e.a), min=int(e.b))
    exc = _E.error_from_code(code, int(e.a), int(e.b), int(e.c))
    if exc is None:
        raise RuntimeError(f"native codec returned unknown error code {code}")
    raise exc  # noqa: B904 - includes EOFError for truncated frames


def _u8ptr(arr) -> "ctypes.POINTER(ctypes.c_uint8)":
    import numpy as np

    assert isinstance(arr, np.ndarray)
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def compress(data: bytes) -> bytes:
    import numpy as np

    lib = _load()
    cap = max_compress_len(len(data))
    if cap == 0:
        raise _E.TooBig(given=len(data), max=MAX_INPUT_SIZE)
    out = np.empty(cap, dtype=np.uint8)
    e = _Error()
    n = lib.stpu_compress(data, len(data), _u8ptr(out), cap, ctypes.byref(e))
    if n < 0:
        _raise(e)
    return out[:n].tobytes()


def compress_into(data: bytes, out) -> int:
    """Compress into the caller's uint8 ndarray; returns bytes written.

    No allocation or copy on the hot path — the buffer-reuse shape the
    reference's criterion harness times (``bench/src/bench.rs:118-131``).
    Size/emptiness validation happens in C++ (same errors, one call).
    """
    ext = _ext
    if ext is None:
        ext = _get_ext()
    if ext:
        return ext.compress_into(data, out)
    lib = _load()
    if max_compress_len(len(data)) == 0:
        raise _E.TooBig(given=len(data), max=MAX_INPUT_SIZE)
    e = _Error()
    n = lib.stpu_compress(data, len(data), out.ctypes.data, out.shape[0], ctypes.byref(e))
    if n < 0:
        _raise(e)
    return n


def decompress_into(data: bytes, out) -> int:
    """Decompress into the caller's uint8 ndarray; returns bytes written.

    All validation (empty input, header parse, TooBig, BufferTooSmall)
    happens inside the single C++ call; the error struct maps back to the
    exact Python exception via :func:`_raise`.
    """
    ext = _ext
    if ext is None:
        ext = _get_ext()
    if ext:
        return ext.decompress_into(data, out)
    lib = _load()
    e = _Error()
    n = lib.stpu_decompress(data, len(data), out.ctypes.data, out.shape[0], ctypes.byref(e))
    if n < 0:
        _raise(e)
    return n


def decompress_len(data: bytes) -> int:
    ext = _ext
    if ext is None:
        ext = _get_ext()
    if ext:
        return ext.decompress_len(data)
    lib = _load()
    e = _Error()
    n = lib.stpu_decompress_len(data, len(data), ctypes.byref(e))
    if n < 0:
        _raise(e)
    return n


def decompress(data: bytes) -> bytes:
    import numpy as np

    lib = _load()
    if len(data) == 0:
        raise _E.Empty()
    declen = decompress_len(data)
    out = np.empty(max(declen, 1), dtype=np.uint8)
    e = _Error()
    n = lib.stpu_decompress(data, len(data), _u8ptr(out), declen, ctypes.byref(e))
    if n < 0:
        _raise(e)
    return out[:n].tobytes()


def scan_ops(body: bytes, bits_out=None) -> "np.ndarray":
    """Bitmap of op-start positions of a raw op stream (no varint header).

    The host half of the hybrid decode: a sequential tag walk identical
    to the device's speculative parse on zero-padded rows. Returns a
    ``(ceil(len/8),)`` uint8 little-endian bitmask (or fills
    ``bits_out``, which may be wider; the tail stays zero).
    """
    import numpy as np

    nbits = (len(body) + 7) // 8
    if bits_out is None:
        bits_out = np.zeros(max(nbits, 1), dtype=np.uint8)
    ext = _ext
    if ext is None:
        ext = _get_ext()
    if ext:
        ext.scan_ops(body, bits_out)
        return bits_out
    lib = _load()
    lib.stpu_scan_ops(body, len(body), _u8ptr(bits_out))
    return bits_out


def _raise_first(errs):
    """Raise the first failing row's exact exception (input order)."""
    import numpy as np

    bad = np.nonzero(errs[:, 0])[0]
    if bad.size:
        row = errs[int(bad[0])]
        e = _Error()
        e.code, e.a, e.b, e.c = int(row[0]), int(row[1]), int(row[2]), int(row[3])
        _raise(e)



def _threads(threads: int) -> int:
    """Resolve a threads argument: 0 means "all" — ``Config.threads``
    (deployment cap for shared machines; env knob SNAPPY_TPU_THREADS)
    when set, else the C++ side uses hardware concurrency."""
    if threads == 0:
        from ..config import get_config

        cap = get_config().threads
        if cap:
            return max(1, cap)
    return threads

def _in_rows(arr, dtype):
    """Validate/normalize a read-only strided-rows argument: the C side
    indexes ``base + i * shape[-1]``, which silently misreads sliced
    (non-contiguous) views, so make those contiguous here."""
    import numpy as np

    if arr.dtype != dtype:
        raise TypeError(f"expected {np.dtype(dtype).name} array, got {arr.dtype}")
    if not arr.flags.c_contiguous:
        arr = np.ascontiguousarray(arr)
    return arr


def _out_rows(arr, dtype):
    """Validate a written-to argument (a copy would discard results)."""
    if arr.dtype != dtype:
        raise TypeError(f"expected {dtype} array, got {arr.dtype}")
    if not arr.flags.c_contiguous:
        raise ValueError("output arrays must be C-contiguous")
    return arr


def compress_batch_into(srcs, lens, dsts, out_lens, errs, threads: int = 0) -> None:
    """Compress ``n`` independent raw streams, chunk-parallel across cores.

    ``srcs``: (n, src_stride) uint8 rows (row i holds ``lens[i]`` input
    bytes); ``dsts``: (n, dst_stride) uint8 with ``dst_stride >=
    max_compress_len(lens.max())``; ``out_lens``: (n,) uint64;
    ``errs``: (n, 4) uint64 per-row [code, a, b, c] (0 = ok). Rows fail
    independently; nothing raises here. The zero-allocation shape the
    aggregate bench times. Host mirror of the device batch API
    (reference has no batch entry point; see core.cpp).
    """
    import numpy as np

    lib = _load()
    threads = _threads(threads)
    srcs = _in_rows(srcs, np.uint8)
    lens = _in_rows(lens, np.uint64)
    dsts = _out_rows(dsts, np.uint8)
    out_lens = _out_rows(out_lens, np.uint64)
    errs = _out_rows(errs, np.uint64)
    lib.stpu_compress_batch(
        srcs.ctypes.data, srcs.shape[1] if srcs.ndim == 2 else srcs.shape[0],
        lens.ctypes.data, dsts.ctypes.data,
        dsts.shape[1] if dsts.ndim == 2 else dsts.shape[0],
        out_lens.ctypes.data, errs.ctypes.data, lens.shape[0], threads,
    )


def decompress_batch_into(srcs, lens, dsts, out_lens, errs, threads: int = 0) -> None:
    """Decompress ``n`` independent raw streams; see compress_batch_into."""
    import numpy as np

    lib = _load()
    threads = _threads(threads)
    srcs = _in_rows(srcs, np.uint8)
    lens = _in_rows(lens, np.uint64)
    dsts = _out_rows(dsts, np.uint8)
    out_lens = _out_rows(out_lens, np.uint64)
    errs = _out_rows(errs, np.uint64)
    lib.stpu_decompress_batch(
        srcs.ctypes.data, srcs.shape[1] if srcs.ndim == 2 else srcs.shape[0],
        lens.ctypes.data, dsts.ctypes.data,
        dsts.shape[1] if dsts.ndim == 2 else dsts.shape[0],
        out_lens.ctypes.data, errs.ctypes.data, lens.shape[0], threads,
    )


def scan_ops_batch(srcs, lens, bits, threads: int = 0) -> None:
    """Op-start bitmaps for ``n`` strided rows, chunk-parallel.

    The batched host half of the hybrid decode: one call replaces the
    per-row :func:`scan_ops` loop (and its dispatch cost) for large
    launches. ``bits``: (n, bits_stride) uint8, zeroed by the caller.
    """
    import numpy as np

    lib = _load()
    threads = _threads(threads)
    srcs = _in_rows(srcs, np.uint8)
    lens = _in_rows(lens, np.uint64)
    bits = _out_rows(bits, np.uint8)
    lib.stpu_scan_ops_batch(
        srcs.ctypes.data, srcs.shape[1], lens.ctypes.data,
        bits.ctypes.data, bits.shape[1], lens.shape[0], threads,
    )


def scan_records_batch(srcs, lens, declens, rec_cap: int, threads: int = 0):
    """Validated op records for ``n`` strided rows, chunk-parallel.

    The host half of the Pallas record-replay decode: walks each row's
    op stream in lockstep with the device decoder's validation and
    packs one ``(word0, word1)`` int32 record per valid op (see
    ``stpu_scan_records`` in ``core.cpp``). Returns
    ``(recs (n, rec_cap, 2) int32, nops (n,) int64, errs (n,) int32,
    dtotals (n,) int64)`` where ``errs`` carries the device error codes
    and ``nops[i] > rec_cap`` flags overflow (records truncated; the
    caller falls back to the self-contained kernel).
    """
    import numpy as np

    lib = _load()
    threads = _threads(threads)
    srcs = _in_rows(srcs, np.uint8)
    lens = _in_rows(lens, np.uint64)
    declens = _in_rows(declens, np.uint64)
    n = lens.shape[0]
    recs = np.zeros((n, rec_cap, 2), np.int32)
    nops = np.zeros(n, np.int64)
    errs = np.zeros(n, np.int32)
    dtotals = np.zeros(n, np.int64)
    lib.stpu_scan_records_batch(
        srcs.ctypes.data, srcs.shape[1], lens.ctypes.data,
        declens.ctypes.data, recs.ctypes.data, rec_cap, nops.ctypes.data,
        errs.ctypes.data, dtotals.ctypes.data, n, threads,
    )
    return recs, nops, errs, dtotals


def flatten_idx_batch(srcs, lens, declens, d_pad: int, threads: int = 0,
                      layout: int = 0):
    """Flatten every copy chain to per-byte literal-source indices.

    The host half of the Pallas flat-gather decode (``stpu_flatten_idx``
    in ``core.cpp``): each output byte gets the index of the compressed-
    stream byte it ultimately copies from, window-relativized per
    1024-byte tile so it fits uint16. Returns ``(idx_rel (n, d_pad)
    uint16, tile_meta (n, d_pad//1024, 2) int32 [base row, bucket
    (0=narrow/128 rows, 1=mid/256, 2=wide/512)],
    fallbacks (n,) int64, errs (n,) int32, dtotals (n,) int64)``;
    ``fallbacks[i] != 0`` flags a tile whose source spread exceeds the
    wide window (possible only for bodies over 64 KiB) — the caller
    routes that row through the replay kernel instead. Error codes are
    the device codes, in lockstep with device validation.

    ``layout=1`` writes ``idx_rel`` in the v2 kernel's transposed block
    layout (see :func:`snappy_tpu.ops.pallas.decode.flat_v2_permute`);
    requires ``d_pad % 16384 == 0``.
    """
    import numpy as np

    lib = _load()
    threads = _threads(threads)
    srcs = _in_rows(srcs, np.uint8)
    lens = _in_rows(lens, np.uint64)
    declens = _in_rows(declens, np.uint64)
    n = lens.shape[0]
    assert d_pad % 1024 == 0 and srcs.shape[1] % 128 == 0
    assert layout == 0 or d_pad % 16384 == 0
    s_rows = srcs.shape[1] // 128
    idx_rel = np.zeros((n, d_pad), np.uint16)
    tile_meta = np.zeros((n, d_pad // 1024, 2), np.int32)
    fallbacks = np.zeros(n, np.int64)
    errs = np.zeros(n, np.int32)
    dtotals = np.zeros(n, np.int64)
    lib.stpu_flatten_idx_batch(
        srcs.ctypes.data, srcs.shape[1], lens.ctypes.data,
        declens.ctypes.data, s_rows, idx_rel.ctypes.data, d_pad,
        tile_meta.ctypes.data, fallbacks.ctypes.data, errs.ctypes.data,
        dtotals.ctypes.data, n, threads, layout,
    )
    return idx_rel, tile_meta, fallbacks, errs, dtotals


def compress_batch(blocks, threads: int = 0) -> list:
    """Compress a list of byte strings in parallel; returns list[bytes].

    Raises the first failing row's exact exception (input order), like
    running :func:`compress` row by row — but chunk-parallel.
    """
    import numpy as np

    if not blocks:
        return []
    # First-failing-row contract: raise for the earliest oversized row,
    # as a row-by-row loop would (not the largest).
    for b in blocks:
        if max_compress_len(len(b)) == 0:
            raise _E.TooBig(given=len(b), max=MAX_INPUT_SIZE)
    max_len = max(len(b) for b in blocks)
    cap = max_compress_len(max_len)
    n = len(blocks)
    srcs = np.zeros((n, max(max_len, 1)), np.uint8)
    lens = np.empty(n, np.uint64)
    for i, b in enumerate(blocks):
        srcs[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    dsts = np.empty((n, cap), np.uint8)
    out_lens = np.empty(n, np.uint64)
    errs = np.zeros((n, 4), np.uint64)
    compress_batch_into(srcs, lens, dsts, out_lens, errs, threads)
    _raise_first(errs)
    return [dsts[i, : int(out_lens[i])].tobytes() for i in range(n)]


def decompress_batch(blocks, threads: int = 0) -> list:
    """Decompress a list of raw streams in parallel; returns list[bytes].

    Raises the first failing row's exact exception (input order)."""
    import numpy as np

    if not blocks:
        return []
    n = len(blocks)
    # Size the output stride from the parseable headers. In any valid
    # stream declen <= ~22x the body (densest op: 3 stream bytes -> 64
    # output bytes), so a crafted few-byte stream declaring a huge
    # declen must not inflate the whole batch's stride (n rows of it!);
    # such rows are re-decoded sequentially below, which allocates only
    # that one row's declen — exactly what the reference does. Rows
    # whose header fails to parse keep declen 0 here and get their
    # exact error from the C++ row call.
    d_cap = 1
    seq = [False] * n
    for i, b in enumerate(blocks):
        try:
            dl = decompress_len(b)
        except _E.SnappyError:
            continue
        if dl > (64 * len(b)) // 3 + 64:
            seq[i] = True
        else:
            d_cap = max(d_cap, dl)
    max_src = max(len(b) for b in blocks)
    srcs = np.zeros((n, max(max_src, 1)), np.uint8)
    lens = np.empty(n, np.uint64)
    for i, b in enumerate(blocks):
        srcs[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    dsts = np.empty((n, d_cap), np.uint8)
    out_lens = np.empty(n, np.uint64)
    errs = np.zeros((n, 4), np.uint64)
    decompress_batch_into(srcs, lens, dsts, out_lens, errs, threads)
    # Input-order walk: the first failing row raises, exactly as a
    # row-by-row decompress loop would.
    outs = []
    for i, b in enumerate(blocks):
        if seq[i]:
            outs.append(decompress(b))
            continue
        if errs[i, 0]:
            e = _Error()
            e.code, e.a, e.b, e.c = (
                int(errs[i, 0]), int(errs[i, 1]), int(errs[i, 2]), int(errs[i, 3])
            )
            _raise(e)
        outs.append(dsts[i, : int(out_lens[i])].tobytes())
    return outs


def frame_compress(data: bytes, threads: int = 0) -> bytes:
    """Frame-encode ``data`` (multithreaded over 64 KiB chunks).

    Emits the stream identifier + one chunk per 64 KiB, byte-identical
    to ``write.FrameEncoder``. Empty input emits an empty stream.
    """
    import numpy as np

    lib = _load()
    threads = _threads(threads)
    nchunks = max(0, -(-len(data) // 65536))
    cap = 10 + nchunks * (8 + 76490)
    out = np.empty(max(cap, 1), dtype=np.uint8)
    e = _Error()
    m = lib.stpu_frame_compress(data, len(data), _u8ptr(out), cap, threads, ctypes.byref(e))
    if m < 0:
        _raise(e)
    return out[:m].tobytes()


def frame_decompress_len(data, n: int | None = None) -> int:
    """Total decompressed size of a whole frame stream (walk only).

    Accepts bytes or a ctypes char-array view (see frame_decompress_into).
    """
    lib = _load()
    e = _Error()
    total = lib.stpu_frame_decompress_len(
        data, len(data) if n is None else n, ctypes.byref(e)
    )
    if total < 0:
        _raise(e)
    return int(total)


def frame_decompress_into(data, out, threads: int = 0, n: int | None = None) -> int:
    """Decode a whole frame stream into the caller's uint8 ndarray.

    Returns bytes written. ``data`` may be bytes or a ctypes char-array
    view (e.g. ``(ctypes.c_char * n).from_buffer(wire)``) for zero-copy
    decoding straight out of a mutable accumulation buffer; pass ``n``
    to bound the walk when the view is longer than the stream. The
    zero-allocation shape for streaming consumers that reuse a scratch
    buffer across segments (fresh multi-MB allocations page-fault on
    every fill otherwise).
    """
    lib = _load()
    threads = _threads(threads)
    e = _Error()
    m = lib.stpu_frame_decompress(
        data, len(data) if n is None else n, out.ctypes.data, out.shape[0],
        threads, ctypes.byref(e),
    )
    if m < 0:
        _raise(e)
    return int(m)


def frame_decompress(data: bytes, threads: int = 0) -> bytes:
    """Decode a whole frame stream (multithreaded over chunks).

    Streaming-reader error semantics: first failing chunk in stream
    order wins; decode errors precede that chunk's checksum check.
    """
    import numpy as np

    lib = _load()
    threads = _threads(threads)
    e = _Error()
    total = lib.stpu_frame_decompress_len(data, len(data), ctypes.byref(e))
    if total < 0:
        _raise(e)
    out = np.empty(max(int(total), 1), dtype=np.uint8)
    m = lib.stpu_frame_decompress(
        data, len(data), _u8ptr(out), total, threads, ctypes.byref(e)
    )
    if m < 0:
        _raise(e)
    return out[:m].tobytes()


def crc32c(data: bytes) -> int:
    ext = _ext
    if ext is None:
        ext = _get_ext()
    if ext:
        return ext.crc32c(data)
    return int(_load().stpu_crc32c(data, len(data)))


def crc32c_masked(data: bytes) -> int:
    ext = _ext
    if ext is None:
        ext = _get_ext()
    if ext:
        return ext.crc32c_masked(data)
    return int(_load().stpu_crc32c_masked(data, len(data)))
