"""Command-line tools (``szip``-compatible)."""

from .szip import main  # noqa: F401
