"""Central runtime configuration — "constants + one small config".

The reference keeps its tunables as frozen constants plus one small
config surface (SURVEY.md §5); this module is that surface for the TPU
build. Every routing knob and batching/memory cap lives in one frozen
:class:`Config` dataclass. Precedence, highest first:

1. ``SNAPPY_TPU_*`` environment variables (deployment overrides only);
2. programmatic configuration via :func:`set_config` / :func:`configure`;
3. the dataclass defaults below.

Library code reads :func:`get_config` at each decision point, so both
override layers take effect immediately (no import-order traps).

Example::

    import snappy_tpu
    from snappy_tpu.config import configure

    with configure(pallas_decode=False):     # pin the XLA decode route
        snappy_tpu.decompress(buf)
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from dataclasses import dataclass, fields, replace

__all__ = ["Config", "get_config", "set_config", "configure"]


@dataclass(frozen=True)
class Config:
    """Every runtime knob of the TPU build, in one place.

    Route selectors (tri-state ``None`` means "auto"):

    - ``engine``: default host-API engine — ``auto`` (native C++ with
      NumPy-oracle fallback), ``native``, ``reference``, ``device``,
      ``device-fast``.
    - ``pallas_decode``: use the Pallas decode kernels; auto = on iff
      the backend is a real TPU (interpret mode is test-only).
    - ``pallas_flat``: within Pallas decode, prefer the flat-gather
      route (host copy-chain flatten + MXU gather) — the production
      route; off falls back to the self-contained replay kernel.
    - ``pallas_records``: opt into the record-replay route instead
      (host scan packs 8-byte op records; device replays them).
    - ``pallas_resolve``: opt into the device chain-resolution route:
      the host contributes only the O(records) op scan and the TPU
      builds the literal-origin index itself (``ops/resolve.py``).
      Lower per-chip rate than the flat route, but host cost drops
      ~10x — the right trade when host cores are scarce relative to
      chips (RESOLVE_BENCH_r05.json: a 4-core host feeds 25 chips on
      this route vs <2 on the host-flatten route).
    - ``pallas_encode``: exact compress via the Pallas greedy automaton
      (auto = on iff real TPU); off = XLA lockstep formulation.
    - ``flat_encode``: fast-profile compress via the flat device
      encoder (lockstep segment parse + gather emission, auto = on iff
      real TPU); off = the XLA orbit fast profile.
    - ``pallas_fastpath``: replay-kernel move machinery — ``"0"`` bulk
      loops, ``"1"`` single-window fast path, ``"compose"``
      compose-in-register (all byte-exact; perf A/B knob).
    - ``pallas_compose``: records-kernel compose-in-register machinery.
    - ``pure_device``: force the all-device XLA formulation (no host
      scan assist) — a measurement/debug mode.
    - ``debug``: sanitizer mode — cross-check every device decode
      against the NumPy oracle and fail loudly on divergence.

    Host-side execution:

    - ``threads``: host C++ codec thread cap; 0 = hardware concurrency.

    Batching and memory caps (the VMEM/SMEM/HBM budget lines; see
    ``ops/api.py`` for the derivations):

    - ``blocks_per_launch``: blocks per batched-compress launch.
    - ``decode_rows_per_launch``: rows per batched-decode launch.
    - ``max_device_stream``: single streams past this decode on host.
    - ``max_device_output``: declared outputs past this decode on host.
    - ``pallas_max_dpad``: padded output per Pallas launch group
      (scoped VMEM is ~16 MiB; flat v2 needs ~10x d_pad of scratch).
    - ``replay_max_body``: compressed body cap for the replay kernel
      (stages the body as int32 in ~1 MiB SMEM).
    """

    engine: str = "auto"
    pallas_decode: bool | None = None
    pallas_flat: bool = True
    flat_encode: bool | None = None
    pallas_records: bool = False
    pallas_resolve: bool = False
    pallas_encode: bool | None = None
    pallas_fastpath: str = "0"
    pallas_compose: bool = False
    pure_device: bool = False
    debug: bool = False
    threads: int = 0
    blocks_per_launch: int = 2048
    decode_rows_per_launch: int = 512
    max_device_stream: int = 1 << 26
    max_device_output: int = 1 << 27
    pallas_max_dpad: int = 1 << 20
    replay_max_body: int = 1 << 17


def _onoff(v: str) -> bool:
    """'' and '0' are off; anything else is on (matches the historical
    knob semantics, where setting the variable at all usually meant on)."""
    return v not in ("", "0")


def _truthy(v: str) -> bool:
    return bool(v)


def _int_or_none(v: str):
    try:
        return int(v)
    except ValueError:
        return None  # ignore malformed values, keep the base setting


def _fastpath(v: str) -> str:
    return "compose" if v == "compose" else ("1" if v == "1" else "0")


#: env var -> (Config field, parser). A parser returning None leaves the
#: base value in place.
_ENV_KNOBS = {
    "SNAPPY_TPU_ENGINE": ("engine", lambda v: v or None),
    "SNAPPY_TPU_PALLAS_DECODE": ("pallas_decode", _onoff),
    "SNAPPY_TPU_PALLAS_FLAT": ("pallas_flat", _onoff),
    "SNAPPY_TPU_PALLAS_RECORDS": ("pallas_records", lambda v: v == "1"),
    "SNAPPY_TPU_PALLAS_RESOLVE": ("pallas_resolve", lambda v: v == "1"),
    "SNAPPY_TPU_PALLAS_ENCODE": ("pallas_encode", _onoff),
    "SNAPPY_TPU_FLAT_ENCODE": ("flat_encode", _onoff),
    "SNAPPY_TPU_PALLAS_FASTPATH": ("pallas_fastpath", _fastpath),
    "SNAPPY_TPU_PALLAS_COMPOSE": ("pallas_compose", lambda v: v == "1"),
    "SNAPPY_TPU_PURE_DEVICE": ("pure_device", _truthy),
    "SNAPPY_TPU_DEBUG": ("debug", _truthy),
    "SNAPPY_TPU_THREADS": ("threads", _int_or_none),
}

# Process-wide default (set_config) with a ContextVar overlay
# (configure) so temporary overrides are thread- and async-safe:
# concurrent contexts each see their own stack of overrides and cannot
# clobber one another when context managers unwind out of order.
_base_default = Config()
_base_var: contextvars.ContextVar[Config | None] = contextvars.ContextVar(
    "snappy_tpu_config_base", default=None
)


def _current_base() -> Config:
    ctx = _base_var.get()
    return ctx if ctx is not None else _base_default


def get_config() -> Config:
    """The effective configuration: env overrides applied to the base."""
    cfg = _current_base()
    updates = {}
    for var, (field, parse) in _ENV_KNOBS.items():
        raw = os.environ.get(var)
        if raw is None:
            continue
        val = parse(raw)
        if val is not None:
            updates[field] = val
    return replace(cfg, **updates) if updates else cfg


def set_config(cfg: Config | None = None, **overrides) -> Config:
    """Set the base configuration (process-wide, below env overrides).

    Pass a full :class:`Config`, or field overrides applied to the
    current base. Returns the new base.
    """
    global _base_default
    if cfg is not None and overrides:
        raise TypeError("pass a Config or field overrides, not both")
    _base_default = cfg if cfg is not None else replace(_base_default, **overrides)
    return _base_default


@contextlib.contextmanager
def configure(**overrides):
    """Temporarily override base configuration fields (context manager).

    Re-entrant and safe under threads/async: overrides live in a
    ContextVar, so concurrent callers see their own values and
    out-of-order unwinds restore exactly the state each caller saw.
    """
    names = {f.name for f in fields(Config)}
    unknown = set(overrides) - names
    if unknown:
        raise TypeError(f"unknown config fields: {sorted(unknown)}")
    new = replace(_current_base(), **overrides)
    token = _base_var.set(new)
    try:
        yield new
    finally:
        _base_var.reset(token)
