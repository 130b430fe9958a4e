"""Execution-engine selection for the host runtime.

The format is frozen (``snappy_tpu.format``); *engines* are interchangeable
executors of it:

- ``reference``: NumPy/Python oracle (always available, slow);
- ``native``: C++ runtime via ctypes (host fast path for streaming IO /
  the CLI / small inputs dominated by device launch overhead);
- ``device``: batched JAX/XLA/Pallas path on TPU (the throughput path),
  exposed separately via ``snappy_tpu.ops`` and used by the raw API for
  large inputs.

Mirrors the role of the reference's cached CPU-feature dispatch
(``src/crc32.rs:12-29``): probe once, then call through a resolved vtable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional


@dataclass(frozen=True)
class HostEngine:
    name: str
    compress: Callable[[bytes], bytes]
    decompress: Callable[[bytes], bytes]
    decompress_len: Callable[[bytes], int]
    crc32c_masked: Callable[[bytes], int]


_ENGINES: dict[str, HostEngine] = {}


def _reference_engine() -> HostEngine:
    from .format import crc32c as crc_ref
    from .format import reference as ref

    return HostEngine(
        name="reference",
        compress=ref.compress,
        decompress=ref.decompress,
        decompress_len=ref.decompress_len,
        crc32c_masked=crc_ref.crc32c_masked,
    )


def _native_engine() -> Optional[HostEngine]:
    try:
        from . import native
    except Exception:
        return None
    if not native.available():
        return None
    return HostEngine(
        name="native",
        compress=native.compress,
        decompress=native.decompress,
        decompress_len=native.decompress_len,
        crc32c_masked=native.crc32c_masked,
    )


def _device_engine(profile: str) -> HostEngine:
    # Device codecs run batched on the accelerator; the per-call scalar
    # helpers (decompress_len, host-side CRC) stay on the host fast path.
    from .ops import api as device_api

    host = _native_engine() or _reference_engine()
    if profile == "fast":
        compress = lambda data: device_api.compress(data, profile="fast")  # noqa: E731
    else:
        # Exact-profile raw compression routes to the host automaton: the
        # bytes are identical either way, and the device lockstep replay
        # is latency-bound (~21k dependent iterations per launch for the
        # corpus; see PARITY.md "device exact encoder"), so it's a poor
        # default for a host-facing call. The on-device exact codec stays
        # available for device-resident pipelines via
        # ``ops.api.compress(profile='exact')`` / ``ops.encode``.
        compress = host.compress
    return HostEngine(
        name=f"device-{profile}" if profile != "exact" else "device",
        compress=compress,
        decompress=device_api.decompress,
        decompress_len=host.decompress_len,
        crc32c_masked=host.crc32c_masked,
    )


def get_engine(name: str = "auto") -> HostEngine:
    """Resolve an engine by name.

    'auto', 'native', 'reference', and 'device' are interchangeable:
    output bytes are bit-identical to the reference for all of them.
    'device-fast' opts into the parallel-parse compressor — still valid
    Snappy, compressed size <= the reference's on real data, but not
    byte-identical.
    """
    if not name or name == "auto":
        # The configured default engine (Config.engine; env knob
        # SNAPPY_TPU_ENGINE overrides); an explicit non-auto argument
        # always wins over it.
        from .config import get_config

        name = get_config().engine or "auto"
    if name in _ENGINES:
        return _ENGINES[name]
    if name == "reference":
        eng = _reference_engine()
    elif name == "native":
        eng = _native_engine()
        if eng is None:
            raise RuntimeError("native engine unavailable (build failed?)")
    elif name == "auto":
        eng = _native_engine() or _reference_engine()
    elif name == "device":
        eng = _device_engine("exact")
    elif name == "device-fast":
        eng = _device_engine("fast")
    else:
        raise ValueError(f"unknown engine {name!r}")
    _ENGINES[name] = eng
    return eng
