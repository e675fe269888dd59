"""CV gates on the grid-MPS.

Parity with reference ``simulators/cv_simulator/gates.py``; the numerical
redesigns are:

- BS / CX 2-D interpolation: one vectorised bilinear gather over the whole
  (a, d, d, b) tensor (:func:`..ops.interp.warp_2d`) instead of the
  reference's Python loop of ``scipy.RegularGridInterpolator`` calls per bond
  pair (reference gates.py:79-80, :188-189).
- Truncated SVDs produce statically-shaped, zero-masked bonds
  (:func:`..ops.linalg.tensor_svd`), so gate application is jittable.
- Stochastic measurements sample with an explicit jax PRNG key.

Deliberate deviations (documented):
- ``CX`` honours its gain ``s``; the reference ignores it (gates.py:178-184
  always displaces with unit gain). Default ``s=1.0`` matches the reference.
- ``Mq`` on a single-mode MPS returns a MeasurementResult (the reference
  returns a bare float that the simulator then fails to record,
  gates.py:104-105).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SVDOptions, complex_dtype
from ..ops import interp
from ..ops.linalg import tensor_svd, trim_split
from .gate_abc import Gate, Measurement, MeasurementResult, SingleModeGate, TwoModeGate, REPR_DIGITS
from .mps import MPS
from .states import State

logger = logging.getLogger(__name__)

__all__ = [
    "Insert", "SWAP", "BS", "Mq", "Mp", "Homodyne", "CZ", "CX", "F", "X", "Z",
    "D", "P", "S", "Phase", "Gate", "Measurement", "MeasurementResult",
    "SingleModeGate", "TwoModeGate",
]


def _opts(gate: Gate, svd_options: SVDOptions | None) -> SVDOptions:
    return gate.effective_svd_options(svd_options)


def _split(tensor, left, right, opts: SVDOptions, key):
    m1, m2, rank = tensor_svd(
        tensor, left, right,
        max_bond_dim=opts.max_bond_dim, abs_err=opts.abs_err, rel_err=opts.rel_err,
        key=key, svd_method=opts.svd_method,
    )
    return trim_split(m1, m2, rank)


# Above this many elements of the contracted (a, d, d, b) tensor, two-mode
# gates stream the contraction+transform+SVD instead of materialising the
# matrix (ops/streamed.py) — the matrix alone would be tens of GB at
# production bond dimensions. The streamed block transform is gather-free
# (FFT shears / phases / transposes), so it is TPU-safe; 1<<28 elements
# (2 GB complex64 materialised) is a comfortable single-chip default.
# QCT_WARP selects the materialised transform backend for BS/CX:
# "fft" (default: spectrally exact, gather-free) or "gather" (legacy
# bilinear, matches scipy RegularGridInterpolator semantics bit-for-bit).
import os as _os
_STREAM_THRESHOLD = int(_os.environ.get("QCT_STREAM_THRESHOLD", 1 << 28))
_WARP_BACKEND = _os.environ.get("QCT_WARP", "fft")
# On accelerator backends the materialised split's complex SVD runs through a
# realified-Gram device eigh whose f32 accuracy degrades on large degenerate
# spectra (measured: fabricated slowly-decaying tails on rank-2 splice
# matrices at n=1000 on the tunnelled TPU). Above this matrix side, concrete
# two-mode splits use the host-driven streamed path instead, whose small-Gram
# eigendecomposition runs on the host.
_EIGH_SAFE_SIDE = int(_os.environ.get("QCT_EIGH_SAFE_SIDE", 512))


def _use_streamed(a: int, d: int, b: int, concrete: bool, opts) -> bool:
    if opts.max_bond_dim is None:
        return False
    if a * d * d * b > _STREAM_THRESHOLD:
        return True
    return (concrete and jax.default_backend() != "cpu"
            and min(a * d, d * b) > _EIGH_SAFE_SIDE)


def _pair_transform_split(mps, left_index, right_index, warp_params, opts, key):
    """Contract neighbours, apply the two-mode grid transform, SVD-split —
    choosing the materialised or streamed implementation by size.

    ``warp_params`` is an :func:`..ops.interp.affine_warp` descriptor; for
    ("swap",) the transform exchanges the modes, so the split below is the
    SWAP contract-and-resplit of reference gates.py:48-55.
    """
    t1, t2 = mps[left_index], mps[right_index]
    a, d, _ = t1.shape
    b = t2.shape[-1]
    qs = jnp.asarray(mps.domain)
    concrete = not any(isinstance(x, jax.core.Tracer) for x in (t1, t2))
    if _use_streamed(a, d, b, concrete, opts):
        from ..ops.streamed import effective_power_iters, streamed_pair_svd

        cap = min(opts.max_bond_dim, a * d, d * b)
        # reference power-iteration heuristic (mps.py:29); saturated bonds
        # (eagerly trimmed shapes at max_bond_dim) get the full-strength
        # sketch under the "auto" q policy
        sat = max(a, b, t1.shape[-1]) >= opts.max_bond_dim
        q = effective_power_iters(
            7 if cap + 10 < 0.1 * min(a * d, d * b) else 4, saturated=sat)
        m1, m2, rank = streamed_pair_svd(
            t1, t2, qs, warp_params,
            max_bond_dim=opts.max_bond_dim, abs_err=opts.abs_err,
            rel_err=opts.rel_err, key=key, power_iters=q,
        )
        m1, m2 = trim_split(m1, m2, rank)
    else:
        res = jnp.tensordot(t1, t2, axes=(2, 0))
        if _WARP_BACKEND == "gather" and warp_params[0] in ("rot", "shear"):
            if warp_params[0] == "rot":
                x_src, y_src = interp.rotation_maps(qs, warp_params[1])
            else:
                x_src, y_src = interp.shear_maps(qs, warp_params[1], warp_params[2])
            res = interp.warp_2d(qs, res, x_src, y_src)
        else:
            res = interp.affine_warp(qs, res, warp_params)
        m1, m2 = _split(res, (0, 1), (2, 3), opts, key)
    mps[left_index], mps[right_index] = m1, m2


class Insert(SingleModeGate):
    """Insert a fresh CV mode at `index` (reference gates.py:13-45)."""

    def __init__(self, index: int, state: State, *, gkp_epsilon=None, **kwargs):
        if kwargs.pop("dagger", None):
            logger.info(type(self).__name__ + " gates ignore adjoint/dagger.")
        super().__init__(index, arg=state, **kwargs)
        self.gkp_epsilon = gkp_epsilon

    def apply(self, mps: MPS, *, key=None, svd_options=None, **_):
        state = self.arg.eval(jnp.asarray(mps.domain), self.gkp_epsilon)
        if self.index < 0 or self.index > len(mps):
            raise IndexError(
                f"Cannot insert mode at index {self.index} for MPS of length {len(mps)}"
            )
        if self.index == 0:
            mps.tensors.insert(0, state.reshape(1, -1, 1))
            return
        if self.index == len(mps):
            mps.tensors.append(state.reshape(1, -1, 1))
            return
        tensor = jnp.einsum("i,ajb->aijb", state, mps[self.index])
        m1, m2 = _split(tensor, (0, 1), (2, 3), _opts(self, svd_options), key)
        mps[self.index] = m2
        mps.tensors.insert(self.index, m1)


class SWAP(TwoModeGate):
    """Swap two neighbouring modes (contract + re-split; reference gates.py:48-55)."""

    def apply(self, mps: MPS, *, key=None, svd_options=None, **_):
        _pair_transform_split(mps, self.left_index, self.right_index,
                              ("swap",), _opts(self, svd_options), key)


class BS(TwoModeGate):
    """Beam splitter: 2-D coordinate rotation of the joint wavefunction."""

    def __init__(self, index1, index2, angle: float = jnp.pi / 4, **kwargs):
        super().__init__(index1, index2, arg=angle, **kwargs)

    def __repr__(self):
        angle = round(self.arg / float(jnp.pi), REPR_DIGITS)
        return type(self).__name__ + f"({angle} * π)" + f"_{self.index1},{self.index2}"

    def apply(self, mps: MPS, *, key=None, svd_options=None, **_):
        angle = self.arg * (-1) ** (self.index1 > self.index2) * (-1) ** self.dagger
        _pair_transform_split(mps, self.left_index, self.right_index,
                              ("rot", angle), _opts(self, svd_options), key)


class Mq(Measurement):
    """Homodyne measurement along the q axis (reference gates.py:87-117)."""

    def apply(self, mps: MPS, *, key=None, **_):
        qs = jnp.asarray(mps.domain)
        dq = mps.diff
        rho = mps.partial_density_mps(self.index)
        distribution = jnp.clip(jnp.diagonal(rho).real, 0.0, None) * dq
        if self.result is None:
            if key is None:
                raise ValueError("Stochastic homodyne requires a PRNG key.")
            s_index = jax.random.categorical(key, jnp.log(distribution))
        else:
            s_index = jnp.argmin(jnp.abs(qs - self.result))
        s = qs[s_index]
        p = distribution[s_index] / dq

        if len(mps) == 1:
            # Last remaining mode: record the sample, leave the chain as-is
            # (reference early-escape, gates.py:104-105).
            return MeasurementResult(s, p)

        mode = jax.lax.dynamic_index_in_dim(mps[self.index], s_index, axis=1, keepdims=False)
        # Underflow guard: in float32 a sampled bin's density can denormalise
        # to 0, and 0/0 would poison the whole trajectory with NaNs.
        p_safe = jnp.maximum(p, jnp.finfo(mps[self.index].real.dtype).tiny)
        mode = mode / jnp.sqrt(p_safe)
        # Contract into whichever neighbour keeps the smaller intermediate
        # (shape-based and static; reference gates.py:110-113).
        if int(np.argmax(mode.shape)) == 0 and self.index != 0:
            mps[self.index - 1] = jnp.tensordot(mps[self.index - 1], mode, axes=(2, 0))
        else:
            mps[self.index + 1] = jnp.tensordot(mode, mps[self.index + 1], axes=(1, 0))
        mps.tensors.pop(self.index)
        return MeasurementResult(s, p)


class Mp(Mq):
    """Homodyne along the p axis: inverse Fourier then Mq."""

    def apply(self, mps: MPS, **kwargs):
        qs = jnp.asarray(mps.domain)
        mps[self.index] = interp.fourier(qs, mps[self.index], axis=1, inv=True)
        return super().apply(mps, **kwargs)


class Homodyne(Mq):
    """Homodyne along the q axis rotated by `angle` radians."""

    def __init__(self, index, angle, result=None, **kwargs):
        super().__init__(index, result, arg=angle, **kwargs)

    def __repr__(self):
        try:
            angle = round(float(self.arg) / float(jnp.pi), REPR_DIGITS)
        except TypeError:
            angle = "traced"
        res = f" = {round(self.result, REPR_DIGITS)}" if isinstance(self.result, float) else ""
        return type(self).__name__ + f"({angle} * π)" + f"_{self.index}" + res

    def apply(self, mps: MPS, **kwargs):
        angle = self.arg
        static_angle = not isinstance(angle, jax.core.Tracer)
        if static_angle and bool(jnp.isclose(jnp.sin(angle), 0)):
            result = super().apply(mps, **kwargs)
            result.result = result.result * jnp.round(jnp.cos(angle))
            return result
        qs = jnp.asarray(mps.domain)
        mps[self.index] = interp.rotation(qs, mps[self.index], -angle, axis=1)
        return super().apply(mps, **kwargs)


class CZ(TwoModeGate):
    """Controlled p-displacement with gain `s` (elementwise phase)."""

    def __init__(self, index1, index2, s: float = 1.0, **kwargs):
        super().__init__(index1, index2, arg=s, **kwargs)

    def apply(self, mps: MPS, *, key=None, svd_options=None, **_):
        s = (-1) ** self.dagger * self.arg
        _pair_transform_split(mps, self.left_index, self.right_index,
                              ("cz", s), _opts(self, svd_options), key)


class CX(TwoModeGate):
    """Controlled q-displacement with gain `s`."""

    def __init__(self, control, target, s: float = 1.0, **kwargs):
        super().__init__(control, target, arg=s, **kwargs)

    def __repr__(self):
        return Gate.__repr__(self) + f"_{self.index1},{self.index2}"

    def apply(self, mps: MPS, *, key=None, svd_options=None, **_):
        gain = self.arg * (-1) ** self.dagger
        _pair_transform_split(mps, self.left_index, self.right_index,
                              ("shear", gain, self.index1 < self.index2),
                              _opts(self, svd_options), key)


class F(SingleModeGate):
    """Fourier gate."""

    def apply(self, mps: MPS, **_):
        qs = jnp.asarray(mps.domain)
        mps[self.index] = interp.fourier(qs, mps[self.index], axis=1, inv=self.dagger)


class X(SingleModeGate):
    """q-axis displacement by `s` (Whittaker–Shannon sinc interpolation)."""

    def __init__(self, index, s: float = 1.0, **kwargs):
        super().__init__(index, arg=s, **kwargs)

    def apply(self, mps: MPS, **_):
        qs = jnp.asarray(mps.domain)
        new_qs = qs - (-1) ** self.dagger * self.arg
        mps[self.index] = interp.whittaker_shannon(qs, mps[self.index], new_qs, axis=1)


class Z(SingleModeGate):
    """p-axis displacement by `s` (linear phase)."""

    def __init__(self, index, s: float = 1.0, **kwargs):
        super().__init__(index, arg=s, **kwargs)

    def apply(self, mps: MPS, **_):
        qs = jnp.asarray(mps.domain)
        phase = jnp.exp((-1) ** self.dagger * 1j * self.arg * qs).astype(complex_dtype())
        mps[self.index] = mps[self.index] * phase[None, :, None]


class D(SingleModeGate):
    """Quadrature displacement by s = [s_q, s_p]."""

    def __init__(self, index, s, **kwargs):
        if len(s) != 2:
            raise ValueError("s must have exactly 2 elements.")
        super().__init__(index, arg=s, **kwargs)

    def apply(self, mps: MPS, **kwargs):
        X(self.index, (-1) ** self.dagger * self.arg[0]).apply(mps, **kwargs)
        Z(self.index, (-1) ** self.dagger * self.arg[1]).apply(mps, **kwargs)


class P(SingleModeGate):
    """Quadratic phase gate with gain `s`."""

    def __init__(self, index, s: float = 1.0, **kwargs):
        super().__init__(index, arg=s, **kwargs)

    def apply(self, mps: MPS, **_):
        qs = jnp.asarray(mps.domain)
        phase = jnp.exp((-1) ** self.dagger * 0.5j * self.arg * qs**2).astype(complex_dtype())
        mps[self.index] = mps[self.index] * phase[None, :, None]


def _scale_mode(qs, tensor, a, axis: int = 1):
    """(Σ_a ψ)(q) = √a · ψ(a·q) — the unitary 1-D dilation, norm-preserving.

    Always evaluates on the STRETCH side so the sinc interpolation never
    samples outside the grid and never increases bandwidth: for a ≤ 1 the
    direct sample at a·qs is a stretch; for a > 1 the identity
    Σ_a = F⁻¹ Σ_{1/a} F moves the stretch into the Fourier domain.
    """
    a = float(a)
    if a == 1.0:
        return tensor
    if a > 1.0:
        tensor = interp.fourier(qs, tensor, axis=axis)
        tensor = _scale_mode(qs, tensor, 1.0 / a, axis=axis)
        return interp.fourier(qs, tensor, axis=axis, inv=True)
    out = interp.whittaker_shannon(qs, tensor, a * qs, axis=axis)
    return out * jnp.sqrt(jnp.asarray(a, out.real.dtype))


class S(SingleModeGate):
    """Squeezing gate: squeezes the `angle`-rotated quadrature by e^{-r}.

    A capability upgrade over the reference, which declares this gate but
    raises NotImplementedError (reference gates.py:249-258). Semantics:
    ``S(i, r, 0)`` maps ψ(q) → e^{r/2} ψ(e^{r} q) (the q variance shrinks by
    e^{-2r}); for general ``angle`` the squeezed axis is rotated, i.e.
    S(r, φ) = R(φ) · S(r, 0) · R(-φ) with R the :class:`Phase` rotation.
    The dilation is evaluated on its stretch side (direct for compression of
    the argument, via the Fourier domain otherwise), so accuracy holds while
    the squeezed state remains inside the grid's q- and p-windows. ``r`` and
    ``angle`` must be static (Python) scalars.
    """

    def __init__(self, index, r: float, angle: float = 0.0, **kwargs):
        super().__init__(index, arg=float(r), **kwargs)
        self.angle = float(angle)

    def __repr__(self):
        return (type(self).__name__
                + f"({round(self.arg, REPR_DIGITS)}, {round(self.angle, REPR_DIGITS)})"
                + f"_{self.index}")

    def apply(self, mps: MPS, **_):
        qs = jnp.asarray(mps.domain)
        r = (-1) ** self.dagger * self.arg
        tensor = mps[self.index]
        if self.angle:
            tensor = _phase_rotate(qs, tensor, -self.angle)
        tensor = _scale_mode(qs, tensor, float(np.exp(r)), axis=1)
        if self.angle:
            tensor = _phase_rotate(qs, tensor, self.angle)
        mps[self.index] = tensor


def _phase_rotate(qs, tensor, theta, axis: int = 1):
    """Phase-space rotation by `theta` with exact sin(θ)=0 fast paths."""
    c, s = np.cos(theta), np.sin(theta)
    if abs(s) < 1e-12:
        # θ ≡ 0 (identity) or θ ≡ π (parity: ψ(q) → ψ(-q); F² with our CFT
        # convention, exact on the symmetric grid).
        return tensor if c > 0 else jnp.flip(tensor, axis=axis)
    return interp.rotation(qs, tensor, theta, axis=axis)


class Phase(SingleModeGate):
    """Single-mode phase-space rotation by `angle` (fractional Fourier).

    A capability upgrade over the reference, which declares this gate but
    raises NotImplementedError (reference gates.py:261-269). ``Phase(i, π/2)``
    coincides with the Fourier gate :class:`F`; sin(angle)=0 points use the
    exact identity/parity fast paths. ``angle`` must be a static scalar.
    """

    def __init__(self, index, angle: float, **kwargs):
        super().__init__(index, arg=float(angle), **kwargs)

    def __repr__(self):
        angle = round(self.arg / float(jnp.pi), REPR_DIGITS)
        return type(self).__name__ + f"({angle} * π)" + f"_{self.index}"

    def apply(self, mps: MPS, **_):
        qs = jnp.asarray(mps.domain)
        theta = (-1) ** self.dagger * self.arg
        mps[self.index] = _phase_rotate(qs, mps[self.index], theta, axis=1)
