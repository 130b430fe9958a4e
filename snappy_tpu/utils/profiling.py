"""Profiling helpers: wall-clock timing + jax.profiler traces.

The reference's profiling story is criterion + release-with-debug
symbols (SURVEY.md §5). The TPU equivalents are steady-state wall-clock
timing around ``block_until_ready`` (what ``bench.py`` does) and XLA/TPU
traces viewable in TensorBoard/Perfetto, wrapped here.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class Timer:
    """Accumulates named wall-clock spans; ``report()`` pretty-prints."""

    spans: dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        width = max((len(k) for k in self.spans), default=0)
        return "\n".join(f"{k:<{width}} {v * 1e3:9.2f} ms" for k, v in self.spans.items())


@contextlib.contextmanager
def timed(label: str, nbytes: int | None = None, out=None):
    """Time a block; prints GB/s when ``nbytes`` is given."""
    import sys

    out = out or sys.stderr
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if nbytes is not None and dt > 0:
        print(f"{label}: {dt * 1e3:.2f} ms  {nbytes / dt / 1e9:.2f} GB/s", file=out)
    else:
        print(f"{label}: {dt * 1e3:.2f} ms", file=out)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (open with TensorBoard/Perfetto).

    Wrap exactly the steady-state region being studied; include a
    ``block_until_ready`` on the last output inside the context so the
    trace covers the real device work.
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
