"""Shared utilities."""

from .rng import as_key, is_key

__all__ = ["as_key", "is_key"]
