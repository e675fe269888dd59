"""Shared utilities."""

from .profiling import annotate, maybe_trace
from .rng import as_key, is_key

__all__ = ["annotate", "as_key", "is_key", "maybe_trace"]
