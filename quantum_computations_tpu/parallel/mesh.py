"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def qubit_mesh(n_axes: int | None = None, devices=None) -> Mesh:
    """Mesh of shape (2,)*k with axis names 'q0'..'q{k-1}' — one binary mesh
    axis per sharded qubit of the DV state vector.

    Uses all available devices by default (device count must be a power of 2).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_axes is None:
        n_axes = int(np.log2(len(devices)))
    n = 2**n_axes
    if n > len(devices):
        raise ValueError(f"Need {n} devices for {n_axes} sharded qubit axes, have {len(devices)}.")
    arr = np.array(devices[:n]).reshape((2,) * n_axes)
    return Mesh(arr, tuple(f"q{i}" for i in range(n_axes)))


def data_mesh(devices=None, name: str = "data") -> Mesh:
    """1-D mesh over all devices for batched trajectory sweeps."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (name,))
