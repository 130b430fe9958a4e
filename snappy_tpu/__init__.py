"""snappy_tpu: a TPU-native Snappy compression framework.

A from-scratch reimplementation of the capabilities of
BurntSushi/rust-snappy (the ``snap`` crate), designed TPU-first:

- the raw block codec is a batch codec over fixed-shape byte arrays,
  executed by JAX/XLA (and Pallas kernels) on TPU, sharded over device
  meshes with ``shard_map``;
- the streaming runtime (frame format, file adapters, CLI) runs on the
  host, with a native C++ fast path;
- the NumPy reference codec in ``snappy_tpu.format`` is the executable
  spec and differential oracle.

Public surface mirrors the reference crate: ``raw``, ``read``, ``write``
modules plus the error taxonomy.
"""

from . import error
from .config import Config, configure, get_config, set_config
from .error import SnappyError

__version__ = "0.4.0"

__all__ = [
    "error",
    "SnappyError",
    "raw",
    "read",
    "write",
    "Config",
    "configure",
    "get_config",
    "set_config",
    "__version__",
]


def __getattr__(name):
    # Lazy imports keep `import snappy_tpu` cheap (no JAX import) for
    # format-only users.
    if name in ("raw", "read", "write", "frame", "format", "ops", "parallel"):
        import importlib

        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
