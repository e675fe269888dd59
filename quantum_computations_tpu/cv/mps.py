"""Matrix-product state over discretized position wavefunctions.

Parity with reference ``simulators/cv_simulator/mps.py`` (container semantics
:102-161, ``contract`` :163-164, ``norm`` :166-170, ``partial_density_mps``
:176-190). Bond dimensions may be zero-padded (see :mod:`..ops.linalg`); all
contractions are padding-transparent.

Deliberate deviation: ``MPS.fidelity`` implements the actual overlap
|<a|b>|^2 — the reference version (mps.py:192-201) contracts ``a`` against
itself and never uses ``b``'s tensors (latent bug, unused by any pipeline).
"""

from __future__ import annotations

from functools import reduce

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PRECISION, complex_dtype
from ..ops.linalg import tensor_svd  # re-export for API parity

__all__ = ["MPS", "tensor_svd"]


def _env_step(res, t):
    """res_{ab} t_{aci} conj(t)_{bcj} -> res_{ij} (transfer-matrix sweep)."""
    return jnp.einsum("ab,aci,bcj->ij", res, t, jnp.conj(t), precision=PRECISION)


class MPS:
    """Chain of rank-3 tensors (bond_left, len(domain), bond_right).

    The tensor list is host-side Python structure (fine under jit tracing);
    the tensors themselves are jax arrays.
    """

    def __init__(self, domain, tensors):
        self.tensors = [
            t.reshape(1, -1, 1) if t.ndim == 1 else t for t in map(jnp.asarray, tensors)
        ]
        self.domain = np.asarray(domain)
        self.diff = abs(self.domain[-1] - self.domain[0]) / (len(self.domain) - 1)
        self.validate()

    # -- list protocol ------------------------------------------------------
    def __getitem__(self, index):
        return self.tensors[index]

    def __setitem__(self, index, value):
        self.tensors[index] = value

    def __len__(self):
        return len(self.tensors)

    def __iter__(self):
        return iter(self.tensors)

    def copy(self) -> "MPS":
        return MPS(self.domain.copy(), list(self.tensors))

    def shape(self):
        return tuple(t.shape for t in self.tensors)

    # -- validation ---------------------------------------------------------
    def validate(self):
        if self.domain.ndim != 1:
            raise TypeError("Domain must be a 1D array.")
        if not np.allclose(np.diff(self.domain, 2), 0, atol=np.finfo(self.domain.dtype).eps**0.5):
            raise ValueError("Domain is not an arithmetic progression.")
        if len(self.tensors) == 0:
            return
        for idx, tensor in enumerate(self.tensors):
            if tensor.ndim != 3:
                raise ValueError(f"Tensor at index {idx} does not have exactly three axes.")
            if tensor.shape[1] != len(self.domain):
                raise ValueError(f"Tensor at index {idx} does not have the right physical dimension.")
        if self.tensors[0].shape[0] != 1:
            raise ValueError("Left-most tensor does not have a trivial left edge")
        if self.tensors[-1].shape[2] != 1:
            raise ValueError("Right-most tensor does not have a trivial right edge")
        for idx, (t1, t2) in enumerate(zip(self.tensors, self.tensors[1:])):
            if t1.shape[2] != t2.shape[0]:
                raise ValueError(
                    f"Tensors at indices {idx} and {idx+1} do not have compatible bond dimensions."
                )

    # -- contractions -------------------------------------------------------
    def contract(self) -> jax.Array:
        """Full dense wavefunction (use only for tiny chains)."""
        res = reduce(
            lambda t1, t2: jnp.tensordot(t1, t2, axes=1, precision=PRECISION), self.tensors
        )
        return jnp.squeeze(res)

    def norm(self) -> jax.Array:
        res = reduce(_env_step, self.tensors, jnp.ones((1, 1), dtype=complex_dtype()))
        res = res[0, 0] * self.diff ** len(self.tensors)
        return jnp.sqrt(res.real)

    def partial_density_mps(self, axis: int) -> jax.Array:
        """Single-mode reduced density matrix (grid-sampled, d x d)."""
        if axis < 0 or axis >= len(self.tensors):
            raise IndexError(f"axis={axis} out of bounds")
        one = jnp.ones((1, 1), dtype=complex_dtype())
        left = reduce(_env_step, self.tensors[:axis], one)
        right = reduce(
            lambda res, t: jnp.einsum("ica,jcb,ab->ij", t, jnp.conj(t), res, precision=PRECISION),
            self.tensors[axis + 1 :][::-1],
            one,
        )
        t = self.tensors[axis]
        result = jnp.einsum("ab,aic,bjd,cd->ij", left, t, jnp.conj(t), right, precision=PRECISION)
        return result * self.diff ** (len(self.tensors) - 1)

    def density_mps(self) -> list[jax.Array]:
        """Density-operator MPS: per-site tensors with two physical axes,
        D_k = t_k (x) conj(t_k) reshaped to (l^2, d, d, r^2). (The reference
        declares this NotImplemented, mps.py:172-174.)"""
        out = []
        for t in self.tensors:
            l, d, r = t.shape
            D = jnp.einsum("aib,cjd->acijbd", t, jnp.conj(t))
            out.append(D.reshape(l * l, d, d, r * r))
        return out

    @staticmethod
    def fidelity(a: "MPS", b: "MPS") -> jax.Array:
        """|<a|b>|^2 with the grid measure (corrected semantics; see module doc)."""
        res = reduce(
            lambda r, ts: jnp.einsum("ab,aci,bcj->ij", r, ts[0], jnp.conj(ts[1]), precision=PRECISION),
            zip(a.tensors, b.tensors),
            jnp.ones((1, 1), dtype=complex_dtype()),
        )
        return jnp.abs(res[0, 0] * a.diff ** len(a)) ** 2
