"""Cross-cutting utilities (profiling, instrumentation).

Kept outside the codec path: the library itself stays pure (values and
exceptions only), matching the reference's observability stance
(SURVEY.md §5 — stats belong to the CLI/bench layer).
"""

from .profiling import device_trace, timed  # noqa: F401
