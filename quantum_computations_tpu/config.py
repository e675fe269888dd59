"""Global numerical configuration.

The reference runs float64/complex128 NumPy on CPU. TPUs have no native f64,
so the framework defaults to complex64 on TPU and complex128 on CPU (useful
for parity tests). Everything reads the dtype through these helpers so a test
can flip precision globally.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

# Default matmul precision for numerically sensitive contractions.
PRECISION = jax.lax.Precision.HIGHEST


def _default_x64() -> bool:
    if os.environ.get("QCT_X64"):
        return os.environ["QCT_X64"] not in ("0", "false", "False")
    return jax.default_backend() == "cpu" and jax.config.read("jax_enable_x64")


def real_dtype() -> jnp.dtype:
    return jnp.float64 if _default_x64() else jnp.float32


def complex_dtype() -> jnp.dtype:
    return jnp.complex128 if _default_x64() else jnp.complex64


@dataclasses.dataclass(frozen=True)
class SVDOptions:
    """Truncation options for :func:`quantum_computations_tpu.ops.linalg.tensor_svd`.

    Mirrors the svd-options cascade of the reference
    (``simulators/cv_simulator/simulator.py:59-62``): a simulator-wide options
    object is merged into each gate unless the gate overrides a field.

    max_bond_dim: hard cap on kept singular values (static shape cap).
    abs_err / rel_err: allowed truncation error; the kept rank is the smallest
        r such that the sum of dropped singular values is below
        ``max(abs_err, sum(s) * rel_err)`` — reference rule at
        ``simulators/cv_simulator/mps.py:87-89``.
    """

    max_bond_dim: int | None = None
    abs_err: float = 0.0
    rel_err: float = 1e-12
    # SVD algorithm: "auto" follows the reference trigger (randomized when
    # max_bond_dim*10 < full_rank); "full" always uses the exact
    # (eigh-based on TPU) decomposition — fewer, larger kernels, which wins
    # on launch-latency-bound accelerator paths; "randomized" forces Halko.
    svd_method: str = "auto"

    def merged_into(self, other: "SVDOptions | None") -> "SVDOptions":
        """Fields explicitly set on `other` win; unset fields fall back to self."""
        if other is None:
            return self
        updates = {
            f.name: getattr(other, f.name)
            for f in dataclasses.fields(other)
            if getattr(other, f.name) != f.default
        }
        return dataclasses.replace(self, **updates)
