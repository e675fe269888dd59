"""Shared numerical kernels: truncated SVD, grid interpolation, theta functions."""

from . import interp, linalg, theta

__all__ = ["interp", "linalg", "theta"]
