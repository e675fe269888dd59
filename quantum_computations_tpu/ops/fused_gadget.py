"""Fused single-mode MB gadget: Bell splice + BS + both homodynes, SVD-free.

The Walshe teleportation gadget (reference ``gkp_simulator/gates.py:89-127``)
inserts a Bell pair, beam-splits the input with the first Bell mode and then
homodynes BOTH beamsplitter operands immediately. The conventional execution
(reference and this repo's unfused path) materialises/splits the post-BS pair
with truncated SVDs — at production sizes three streamed CZ-split SVDs, each
a host-driven subspace iteration (``ops/streamed.py``), dominating trajectory
time (round-3 attribution: ~73% in BS splits + Gram fetches).

This module removes the SVDs entirely by evaluating the two measurements
directly on the *virtual* post-BS pair:

1. **Product structure.** The exact Bell splice (``gkp/bell.py``) makes the
   ancilla tensor a product: ``bell1[k, x, (k2, s)] = b1[x, s] delta(k, k2)``,
   so the BS pair tensor is an outer product ``T[a, i, j, (k2, s)] =
   t1[a, i, k2] * b1[j, s]`` — no bond contraction at all. The right
   environment of the pair is the Kronecker ``E (x) Gb2`` (rest-of-chain env
   times the 2x2 Bell Gram).

2. **Line evaluation instead of a 2-D warp.** The BS is a point rotation of
   the (q1, q2) plane: the post-BS tensor row ``i`` is the pre-BS pair
   evaluated along the rotated line ``(c q_i + s q_j, -s q_i + c q_j)``
   (exactly what ``ops/interp.rotation_maps``/``rotate_fft`` resample). For an
   outer product this is a product of two 1-D band-limited evaluations.

3. **Factorised probability.** Dressing the factors with Hermitian PSD square
   roots of the environments (Newton-Schulz, no eigh) orthonormalises the
   bond sums, so the first homodyne's position distribution is

       p1(i) ~ sum_j G(c q_i + s q_j) * H(-s q_i + c q_j),

   with ``G(x) = sum_lines |t1_dressed(x)|^2`` and ``H`` its Bell analogue —
   two 1-D functions band-limited to twice the state bandwidth. G and H are
   tabulated ONCE on half-spacing zero-padded stretched grids and every
   rotated line is then a Fourier shift + strided slice: the whole
   distribution costs a couple of (2d x d) matmuls and FFTs instead of a
   streamed randomized SVD.

4. **Collapse by slicing.** Conditioning on the sampled grid index is a
   single Fourier-shifted line evaluation of the raw factors; the second
   homodyne then acts on the materialised (a, d, 2k) conditional mode with
   the standard rotation kernel, and the final collapsed (a, 2k) matrix
   contracts EXACTLY with the structured second Bell tensor back to shape
   (a, d, k) — the gadget is shape-preserving, needs no re-truncation, and
   (unlike the reference path) is exact: no weight is discarded at all.

Homodyne semantics (sampling measure, collapse normalisation, underflow
guards) mirror ``cv/gates.py:Mq`` / reference ``cv_simulator/gates.py:87-117``.
A homodyne at angle ``a1`` on the first operand commutes through the BS as
``R1(-a1) BS = R2(+a1) BS [R1(-a1) (x) R2(-a1)]`` (a beamsplitter commutes
with equal phase-space rotations on both arms), so the pre-rotations act on
the cheap factor tensors and the trailing ``R2(+a1)`` folds into the second
homodyne's rotation (net angle ``a1 - a2``); for the first measurement it
drops out exactly (phase-space rotations preserve the position-integral
measure).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..config import PRECISION, complex_dtype
from .interp import rotation
from .linalg import _ns_inv_sqrt

__all__ = ["fused_single_gadget", "fused_pair_measure2"]

# Gram-factorised correlation evaluation of the fused pair-measure's first
# distribution (the d x (d chi^3) einsum pass) — see _gram_corr_p1. Applies
# to the a1==0 and order-swapped paths at bs_angle=pi/4 on a symmetric grid
# (the production gadget); other configurations fall back to the loop.
# Default ON since the round-4 on-chip A/B (exact to FFT roundoff — CPU
# parity pinned in tests/test_fused_gadget.py; production RB workload
# 0.3269 -> 0.4059 traj/s, benchmarks/logs/bench-gram.log).
_PAIR_GRAM_DEFAULT = os.environ.get("QCT_FUSED_PAIR_GRAM", "1") == "1"

# MXU precision of the fused pair-measure's FIRST-DISTRIBUTION einsums (the
# per-row xak,xkc->xac passes — the dominant d^2 chi^3 term of the a1zero/
# swapped/exact loops). p1 only feeds outcome SAMPLING and the collapse
# normalisation p1v, never the collapsed state itself, so bf16x3 ("high",
# ~1e-6 relative on these contraction depths, ~2x the MXU rate of the
# 6-pass "highest") is a candidate default pending the on-chip A/B; the
# collapse/second-measurement contractions always stay at config.PRECISION.
_P1_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}[os.environ.get("QCT_FUSED_P1_PREC", "highest").lower()]

# MXU precision of the DISTRIBUTION-ONLY line tabulations — the (M x d) @
# (d x chi^2) stretched-grid matmuls that feed the first-homodyne
# distribution (fused_single's G/H tabulation, fused_pair's f1e/f2e tabs and
# _gram_corr_p1's U1/U2). Like _P1_PRECISION these only steer outcome
# SAMPLING and the scalar collapse normalisation, never the collapsed state
# tensor itself (the collapse re-tabulates the RAW lines at config.PRECISION),
# so a relative distribution error ~1e-6 ("high", bf16x3, half the MXU
# passes of "highest") is physically invisible next to the rel_err=1e-2
# truncation. Default follows the on-chip A/B (queue 30).
_TAB_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}[os.environ.get("QCT_FUSED_TAB_PREC", "highest").lower()]

# Rewrite the exact-kernel pair path (both homodyne angles nonzero) into the
# Gram-eligible a1==0 path by the BS/rotation commute identity: a beamsplitter
# commutes with equal phase-space rotations on both arms, so homodyning the
# first BS output at angle a1 equals pre-rotating BOTH factor tensors by -a1,
# measuring position first, and measuring the second mode at net angle
# a2 - a1 (the commuted trailing R2(+a1) folds into the second homodyne).
# The two forms are both discretisations of the same continuum measurement;
# they differ by the commutator of the discretised frFT kernel with the
# band-limited line interpolation (adjudicated vs the eager exact-SVD ground
# truth by benchmarks/prerot_accuracy.py — approved,
# benchmarks/prerot_accuracy_results.jsonl). Default ON since the round-4
# on-chip speed A/B: production RB workload 0.4059 -> 0.6451 traj/s (89.8x
# the CPU eager baseline, benchmarks/logs/bench-prerot.log); a production
# parity anchor cell (10 dB depth-8, rb_prerot_anchor.dat) runs in queue 26.
# QCT_FUSED_EXACT_PREROT=0 restores the exact-kernel loop path.
_PAIR_PREROT_DEFAULT = os.environ.get("QCT_FUSED_EXACT_PREROT", "1") == "1"

# The prerot rewrite leaves a residual second homodyne at a2 - a1, applied by
# interp.rotation — singular where sin(theta) = 0. Residuals snapped to zero
# (|a2 - a1| < 1e-12) skip the rotation entirely and are safe; anything else
# with |sin(a2 - a1)| below this threshold (tiny-but-nonzero, or near +-pi)
# falls back to the exact-kernel path, which handles those angles fine.
_PREROT_SIN_MIN = 1e-6


def _prerot_applies(a1: float, a2) -> bool:
    """True when fused_pair_measure2 reroutes (a1, a2) via the prerot
    commute identity (given prerot enabled). a2 may be traced."""
    import math
    if float(a1) == 0.0:
        return False
    if isinstance(a2, jax.core.Tracer):
        return True  # residual angle unknown at trace time; prerot applies
    a2 = float(a2)
    if abs(a2) < 1e-12:
        return False  # order-swapped fast path
    resid = a2 - float(a1)
    return abs(resid) < 1e-12 or abs(math.sin(resid)) >= _PREROT_SIN_MIN


def pair_measure_path(a1: float, a2, prerot: bool | None = None) -> str:
    """Static dispatch of fused_pair_measure2 for (a1, a2): one of
    'swapped', 'a1zero', 'prerot', 'exact'. Single source of truth for
    profiling span labels (gkp/batched.py) — keep in sync with the
    executor's own dispatch below."""
    if prerot is None:
        prerot = _PAIR_PREROT_DEFAULT
    is_tracer = isinstance(a2, jax.core.Tracer)
    if float(a1) == 0.0:
        return "a1zero"
    if not is_tracer and abs(float(a2)) < 1e-12:
        return "swapped"
    if prerot and _prerot_applies(a1, a2):
        return "prerot"
    return "exact"


def _psd_sqrt(G: jax.Array) -> jax.Array:
    """Hermitian PSD square root via the matmul-only Newton-Schulz inverse
    sqrt (no eigh — the TPU backend lowers no complex eigh and a realified
    device eigh costs ~500 s of remote compile per shape)."""
    if G.shape[0] == 1:
        return jnp.sqrt(jnp.clip(G.real, 0.0, None)).astype(G.dtype)
    return jnp.matmul(G, _ns_inv_sqrt(G), precision=PRECISION)


def _left_env(tensors) -> jax.Array:
    """Transfer-matrix left environment (cv/mps.py partial_density_mps)."""
    res = jnp.ones((1, 1), dtype=complex_dtype())
    for t in tensors:
        res = jnp.einsum("ab,aci,bcj->ij", res, t, jnp.conj(t), precision=PRECISION)
    return res


def _right_env(tensors) -> jax.Array:
    res = jnp.ones((1, 1), dtype=complex_dtype())
    for t in reversed(tensors):
        res = jnp.einsum("ica,jcb,ab->ij", t, jnp.conj(t), res, precision=PRECISION)
    return res


def _stretch_sample_matrix(qs: np.ndarray, stretch: float, refine: int, pad: int):
    """Sinc-sampling matrix onto a zero-padded stretched grid.

    Rows are the padded grid points ``xi_m = stretch*q0 + (m - refine*pad)*h``
    with ``h = stretch*dq/refine``; the core points ``xi = stretch*q_j`` sit at
    ``m = refine*(pad + j)``. Points outside the original domain are zeroed
    (gather zero-fill semantics) so Fourier shifts wrap only zeros/tails.
    ``M = refine*(d + 2 pad)`` keeps the FFT length even/smooth (the minimal
    ``M - refine + 1`` is odd and often prime — pathological for the TPU FFT).
    Returns (S (M, d) float, M, h).
    """
    d = int(qs.shape[0])
    dq = float((qs[-1] - qs[0]) / (d - 1))
    h = stretch * dq / refine
    M = refine * (d + 2 * pad)
    xi = stretch * float(qs[0]) + (np.arange(M) - refine * pad) * h
    S = np.sinc((xi[:, None] - np.asarray(qs)[None, :]) / dq)
    inside = (xi >= float(qs[0]) - 1e-9) & (xi <= float(qs[-1]) + 1e-9)
    S = S * inside[:, None]
    return S, M, h


def _core_slice(x: jax.Array, refine: int, pad: int, d: int) -> jax.Array:
    """Strided slice of the padded-grid axis (-1) back to the d core points."""
    start = refine * pad
    return jax.lax.slice_in_dim(x, start, start + refine * (d - 1) + 1,
                                stride=refine, axis=x.ndim - 1)


def _shift_eval(lines_f: jax.Array, freqs: jax.Array, deltas: jax.Array) -> jax.Array:
    """Evaluate FFT'd padded lines shifted by ``deltas``: returns
    ``(..., n_delta, M)`` with entry ``line(x + delta)`` on the padded grid."""
    phase = jnp.exp(2j * jnp.pi * freqs[None, :] * deltas[:, None]).astype(lines_f.dtype)
    return jnp.fft.ifft(lines_f[..., None, :] * phase, axis=-1)


def fused_single_gadget(tensors, idx: int, qs, bell, a1, a2, key, *,
                        bs_angle: float = np.pi / 4, force=None,
                        line_chunk: int = 1024, diagnostics: bool = False,
                        _stage: str | None = None):
    """Execute one single-mode MB gadget without any SVD.

    tensors: list of (l, d, r) chain tensors; ``tensors[idx]`` is the input
    mode. bell: (d, 2) Bell column vectors (the ``(d, 2)`` matrix of
    ``gkp/bell.py:GKPBellState.eval``; the second Bell tensor is its
    transpose). a1: STATIC first homodyne angle; a2: second homodyne angle
    (may be traced / per-trajectory). force: optional concrete (i, j) grid
    indices for post-selection (testing). Returns
    ``(new_tensors, m1, m2[, diag])`` with ``new_tensors[idx]`` the teleported
    output of the SAME shape as the input mode.
    """
    t1 = tensors[idx]
    a, d, k = t1.shape
    L0 = len(tensors)
    # The grid must be concrete (it defines static sampling matrices); chain
    # tensors, angles and the Bell vectors may be traced.
    qs_np = np.asarray(qs)
    qs = jnp.asarray(qs_np)
    dq = float((qs_np[-1] - qs_np[0]) / (d - 1))
    cth, sth = float(np.cos(bs_angle)), float(np.sin(bs_angle))
    cdt = t1.dtype
    tiny = jnp.finfo(t1.real.dtype).tiny
    a1 = float(a1)
    k1, k2 = jax.random.split(key)

    b1 = bell.astype(cdt)
    if a1 != 0.0:
        t1 = rotation(qs, t1, -a1, axis=1)
        b1 = rotation(qs, b1, -a1, axis=0)

    # Environments + Hermitian PSD square roots (matmul-only).
    S_L = _psd_sqrt(_left_env(tensors[:idx]))            # (a, a)
    S_E = _psd_sqrt(_right_env(tensors[idx + 1:]))       # (k, k)
    Gb2 = jnp.einsum("ys,yt->st", bell, jnp.conj(bell), precision=PRECISION)
    S_G = _psd_sqrt(Gb2)                                 # (2, 2)

    # Dressed line families: G from the input factor, H from the Bell factor.
    t1e = jnp.einsum("pa,aik,kg->ipg", jnp.conj(S_L), t1, S_E,
                     precision=PRECISION).reshape(d, a * k)
    b1d = jnp.matmul(b1, S_G, precision=PRECISION)       # (d, 2)

    # Padding must absorb the largest Fourier shift (|c q_i| on the
    # s-stretched grid and vice versa) so wraps touch only zeros/tails.
    pad = int(np.ceil(max(cth / sth, sth / cth) * (d - 1) / 2)) + 1
    S2G, MG, hG = _stretch_sample_matrix(qs_np, sth, 2, pad)
    S2H, MH, hH = _stretch_sample_matrix(qs_np, cth, 2, pad)
    S2G = jnp.asarray(S2G, dtype=t1.real.dtype)
    S2H = jnp.asarray(S2H, dtype=t1.real.dtype)

    # G(x) = sum over dressed lines of |line(x)|^2, tabulated on the fine
    # (half-spacing) padded grid — |f|^2 has twice f's bandwidth, so the
    # half-spacing samples represent it exactly.
    n_lines = a * k
    chunk = min(line_chunk, n_lines)
    n_chunks = -(-n_lines // chunk)
    if n_chunks * chunk != n_lines:  # pad the line axis to a whole number of chunks
        t1e = jnp.pad(t1e, ((0, 0), (0, n_chunks * chunk - n_lines)))

    def g_body(i, acc):
        lines = jax.lax.dynamic_slice_in_dim(t1e, i * chunk, chunk, axis=1)
        u = jnp.matmul(S2G, lines, precision=_TAB_PRECISION)
        return acc + jnp.sum(jnp.abs(u) ** 2, axis=1)

    G = jax.lax.fori_loop(0, n_chunks, g_body, jnp.zeros((MG,), t1.real.dtype))
    H = jnp.sum(jnp.abs(jnp.matmul(S2H, b1d, precision=_TAB_PRECISION)) ** 2,
                axis=1)
    if _stage == "tab":  # profiling cut: everything through the G/H tabulation
        return G, H

    # p1(i) = dq^(L-1) * sum_j G(c q_i + s q_j) H(-s q_i + c q_j):
    # Fourier-shift G by c*q_i (resp. H by -s*q_i) and read the strided core.
    Gf = jnp.fft.fft(G.astype(cdt))
    Hf = jnp.fft.fft(H.astype(cdt))
    freqsG = jnp.fft.fftfreq(MG, d=hG).astype(t1.real.dtype)
    freqsH = jnp.fft.fftfreq(MH, d=hH).astype(t1.real.dtype)

    ic = next(x for x in range(min(128, d), 0, -1) if d % x == 0)

    def p1_body(t, acc):
        qi = jax.lax.dynamic_slice_in_dim(qs, t * ic, ic)
        Grow = _core_slice(_shift_eval(Gf, freqsG, cth * qi).real, 2, pad, d)
        Hrow = _core_slice(_shift_eval(Hf, freqsH, -sth * qi).real, 2, pad, d)
        vals = jnp.sum(Grow * Hrow, axis=-1)
        return jax.lax.dynamic_update_slice_in_dim(acc, vals, t * ic, axis=0)

    p1_raw = jax.lax.fori_loop(0, d // ic, p1_body, jnp.zeros((d,), t1.real.dtype))
    if _stage == "p1":  # profiling cut: through the first-homodyne distribution
        return p1_raw
    rho1 = jnp.clip(p1_raw, 0.0, None) * dq ** (L0 + 1)
    dist1 = rho1 * dq
    if force is not None:
        i_star = jnp.asarray(force[0])
    else:
        i_star = jax.random.categorical(k1, jnp.log(dist1))
    m1 = qs[i_star]
    p1v = rho1[i_star]

    # Collapse: raw (undressed) line evaluation at the sampled row.
    S1G, M1G, h1G = _stretch_sample_matrix(qs_np, sth, 1, pad)
    S1H, M1H, h1H = _stretch_sample_matrix(qs_np, cth, 1, pad)
    S1G = jnp.asarray(S1G, dtype=t1.real.dtype)
    S1H = jnp.asarray(S1H, dtype=t1.real.dtype)
    f1G = jnp.fft.fftfreq(M1G, d=h1G).astype(t1.real.dtype)
    f1H = jnp.fft.fftfreq(M1H, d=h1H).astype(t1.real.dtype)
    delta1 = (cth * m1)[None]
    deltaH = (-sth * m1)[None]

    t1_lines = jnp.permute_dims(t1, (1, 0, 2)).reshape(d, a * k)
    u_r = jnp.matmul(S1G, t1_lines, precision=PRECISION)          # (M1G, a k)
    u_f = jnp.fft.fft(u_r, axis=0)
    shifted = jnp.fft.ifft(
        u_f * jnp.exp(2j * jnp.pi * f1G * delta1[0]).astype(cdt)[:, None], axis=0)
    B1 = jax.lax.slice_in_dim(shifted, pad, pad + d, axis=0)      # (d, a k)
    B1 = jnp.permute_dims(B1.reshape(d, a, k), (1, 0, 2))         # (a, d, k)

    ub = jnp.matmul(S1H, b1, precision=PRECISION)                 # (M1H, 2)
    ub_f = jnp.fft.fft(ub, axis=0)
    ub_s = jnp.fft.ifft(
        ub_f * jnp.exp(2j * jnp.pi * f1H * deltaH[0]).astype(cdt)[:, None], axis=0)
    brow = jax.lax.slice_in_dim(ub_s, pad, pad + d, axis=0)       # (d, 2)

    p1_safe = jnp.maximum(p1v, tiny)
    B = (B1[:, :, :, None] * brow[None, :, None, :]) / jnp.sqrt(p1_safe).astype(cdt)
    B = B.reshape(a, d, 2 * k)  # composite right bond (k major, s minor)
    if _stage == "collapse":  # profiling cut: through the conditional tensor
        return B

    # Second homodyne: the commuted trailing R2(+a1) and the measurement
    # pre-rotation R2(-a2) compose to a single net rotation by (a1 - a2).
    theta2 = a1 - a2
    static2 = not isinstance(a2, jax.core.Tracer)
    if not (static2 and abs(float(a1) - float(a2)) < 1e-12):
        B = rotation(qs, B, theta2, axis=1)

    Bd = jnp.einsum("pa,ajc->pjc", jnp.conj(S_L), B, precision=PRECISION)
    Bd = jnp.einsum("pjks,kg,st->pjgt", Bd.reshape(-1, d, k, 2), S_E, S_G,
                    precision=PRECISION)
    rho2 = jnp.clip(jnp.sum(jnp.abs(Bd) ** 2, axis=(0, 2, 3)), 0.0, None) * dq ** L0
    dist2 = rho2 * dq
    if force is not None:
        j_star = jnp.asarray(force[1])
    else:
        j_star = jax.random.categorical(k2, jnp.log(dist2))
    m2 = qs[j_star]
    p2v = rho2[j_star]

    M = jax.lax.dynamic_index_in_dim(B, j_star, axis=1, keepdims=False)
    M = M / jnp.sqrt(jnp.maximum(p2v, tiny)).astype(cdt)
    # Exact contraction with the structured second Bell tensor:
    # out[a, x, k] = sum_s M[a, (k, s)] bell[x, s].
    out = jnp.einsum("aks,xs->axk", M.reshape(a, k, 2), bell.astype(cdt),
                     precision=PRECISION)

    new_tensors = list(tensors)
    new_tensors[idx] = out
    if diagnostics:
        return new_tensors, m1, m2, {"rho1": rho1, "rho2": rho2,
                                     "p1": p1v, "p2": p2v,
                                     "i": i_star, "j": j_star}
    return new_tensors, m1, m2


def _gram_corr_p1(lines1e, lines2e, qs_np, pad: int, a: int, k: int, c: int,
                  *, swapped: bool, rdt) -> jax.Array:
    """First-homodyne distribution of the fused pair-measure as a lattice
    correlation of two Gram tabulations (bs_angle=pi/4, symmetric grid).

    For the BS point rotation at 45 deg the post-BS pair amplitude on grid
    row ``i`` is ``C_ij[a,c] = sum_k f1e[ak](s(q_i+q_j)) f2e[kc](s(q_j-q_i))``
    (s = 1/sqrt(2); order-swapped path: second argument ``s(q_i-q_j)``), and

        sum_ac |C_ij|^2 = sum_kk' G1[kk'](u_ij) G2[kk'](v_ij),
        G1[kk'](u) = sum_a f1e[ak](u) conj(f1e[ak'](u)),
        G2[kk'](v) = sum_c f2e[kc](v) conj(f2e[k'c](v)),

    so the chi-sized open axes contract BEFORE the (i, j) grid double loop.
    Both Gram arguments live on the half-spacing (refine=2) s-stretched
    lattice: in fine-index coordinates ``n`` (``xi_n = s(q0+(n-2 pad) dq/2)``)
    row ``i`` needs ``G1[2 pad + 2(i+j) - (d-1)]`` against
    ``G2[2 pad + 2(j-i) + (d-1)]`` — indices of ONE parity class
    ``rho = (d-1) mod 2``. On the parity subsequence (``n = 2m + rho``) the
    j-sum is a cross-correlation at lag ``2i - (d-1)`` (swapped: a convolution
    read at ``2(pad+i) - rho``), so the whole distribution is two tabulation
    matmuls + per-point k x k Grams + one zero-padded FFT correlation —
    O(d^2 chi^2) MXU work instead of the loop's O(d^2 chi^3) einsums. |f|^2
    doubles the bandwidth, so the half-spacing tabulation is exact.
    """
    d = int(qs_np.shape[0])
    sth = float(np.cos(np.pi / 4))
    rho = (d - 1) % 2
    S2, M2, _ = _stretch_sample_matrix(qs_np, sth, 2, pad)
    Sf = jnp.asarray(S2[rho::2], dtype=rdt)          # (M_eff, d) parity rows
    m_eff = Sf.shape[0]
    n_fft = 1 << int(2 * m_eff - 1).bit_length()

    U1 = jnp.matmul(Sf, lines1e, precision=_TAB_PRECISION).reshape(m_eff, a, k)
    U2 = jnp.matmul(Sf, lines2e, precision=_TAB_PRECISION).reshape(m_eff, k, c)

    # Chunk the k' (l) axis: the executors are vmapped over the trajectory
    # batch, so full (n_fft, k, k) spectra would hold several batched
    # multi-GB tensors live at once; accumulating the scalar spectrum per
    # l-chunk keeps the live set to the two tabulations plus one chunk.
    lc = k if k <= 16 else 8
    n_chunks = -(-k // lc)
    if n_chunks * lc != k:
        U1l = jnp.pad(U1, ((0, 0), (0, 0), (0, n_chunks * lc - k)))
        U2l = jnp.pad(U2, ((0, 0), (0, n_chunks * lc - k), (0, 0)))
    else:
        U1l, U2l = U1, U2

    def chunk_body(i, spec):
        u1c = jax.lax.dynamic_slice_in_dim(U1l, i * lc, lc, axis=2)
        u2c = jax.lax.dynamic_slice_in_dim(U2l, i * lc, lc, axis=1)
        G1c = jnp.einsum("mak,mal->mkl", U1, jnp.conj(u1c), precision=PRECISION)
        G2c = jnp.einsum("mkc,mlc->mkl", U2, jnp.conj(u2c), precision=PRECISION)
        F1c = jnp.fft.fft(G1c, n=n_fft, axis=0)
        F2c = jnp.fft.fft(G2c, n=n_fft, axis=0)
        if not swapped:
            # correlation C[tau] = sum_m g[m+tau] h[m]:
            # spectrum g_hat(w) h_hat(-w)
            F2c = jnp.roll(jnp.flip(F2c, axis=0), 1, axis=0)
        return spec + jnp.einsum("wkl,wkl->w", F1c, F2c, precision=PRECISION)

    spec = jax.lax.fori_loop(0, n_chunks, chunk_body,
                             jnp.zeros((n_fft,), U1.dtype))
    if swapped:
        # sum_j g[..i+j..] h[..i-j..] with indices moving oppositely:
        # a convolution, read at position 2(pad+i) - rho.
        idx = (2 * (pad + np.arange(d)) - rho) % n_fft
    else:
        idx = (2 * np.arange(d) - (d - 1)) % n_fft
    C = jnp.fft.ifft(spec)
    return jnp.take(C.real, jnp.asarray(idx)).astype(rdt)


def _rotation_kernel_row(qs, theta: float, q_m):
    """One row of the ops/interp.rotation kernel at (possibly traced) output
    coordinate ``q_m``, including the dq measure: applying it along an axis
    equals slicing ``rotation(qs, ., theta, axis)`` at the grid point q_m."""
    d = qs.shape[0]
    dq = (qs[-1] - qs[0]) / (d - 1)
    theta = jnp.asarray(theta)
    exponent = jnp.cos(theta) * (qs ** 2 + q_m ** 2) / 2.0 - q_m * qs
    row = (2 * jnp.pi * jnp.abs(jnp.sin(theta))) ** -0.5 * jnp.exp(
        exponent / (1j * jnp.sin(theta)))
    return row * dq


def fused_pair_measure2(tensors, m: int, qs, a1, a2, key, *,
                        bs_angle: float = np.pi / 4, force=None,
                        gram: bool | None = None,
                        prerot: bool | None = None,
                        diagnostics: bool = False,
                        _stage: str | None = None,
                        p1_precision=None):
    """BS(m, m+1) followed by homodynes on BOTH pair modes, SVD-free.

    The generic companion of :func:`fused_single_gadget` for the macronode
    two-mode gadget (reference ``gkp_simulator/gates.py:130-200``): its third
    and fourth beamsplitters are each followed immediately by homodynes on
    both operand modes, so the post-BS pair never needs an SVD split either —
    but here the operands are generic SVD factors sharing a contracted bond
    ``k``, so the distribution does not factorise into 1-D tabulations.
    Instead the virtual post-BS pair is evaluated line by line (Fourier shift
    + core slice of padded stretched tabulations of the factor lines) and
    contracted per grid column — no streamed subspace iteration, no Gram
    fetch, no truncation loss.

    Three exact paths, chosen by the STATIC first homodyne angle ``a1``:

    - ``a1 == 0`` (CZ/PP first pair, SWAP second pair): scan the measured
      mode's rows directly,
      ``p1(i) ~ sum_j ||W1[:, i, j, :] @ W2[:, i, j, :]||_F^2``.
    - ``a1 != 0, a2 == 0`` (SWAP first pair): the two homodynes commute, so
      the ORDER is swapped — the unrotated second mode is scanned first (a
      pure line-evaluation pass), and the rotation by ``-a1`` is applied
      exactly to the materialised conditional tensor before the other
      measurement. No per-row kernel work at all.
    - both angles nonzero (CZ/PP second pair): scanning rotated quadratures
      would require pre-rotating the factor tensors, which aliases badly for
      chirped (entangled) factors; instead the TRUE fractional-Fourier
      kernel is applied along the virtual x-lines per grid column y —
      mathematically identical to the conventional rotate-then-measure
      sequence.

    The collapse conditions on the sampled row, measures the second mode on
    the materialised (a, d, c) conditional tensor (kernel rotation by
    ``-a2``, which may be traced), and absorbs the final (a, c) matrix into a
    neighbour by the ``Mq`` smaller-intermediate rule. Returns
    ``(new_tensors, m1, m2[, diag])`` with the pair removed.
    """
    t1, t2 = tensors[m], tensors[m + 1]
    a, d, k = t1.shape
    c = t2.shape[-1]
    L0 = len(tensors)
    qs_np = np.asarray(qs)
    qs = jnp.asarray(qs_np)
    dq = float((qs_np[-1] - qs_np[0]) / (d - 1))
    cth, sth = float(np.cos(bs_angle)), float(np.sin(bs_angle))
    cdt = t1.dtype
    rdt = t1.real.dtype
    tiny = jnp.finfo(rdt).tiny
    a1 = float(a1)
    if p1_precision is None:
        p1_precision = _P1_PRECISION
    if prerot is None:
        prerot = _PAIR_PREROT_DEFAULT
    _static2 = not isinstance(a2, jax.core.Tracer)
    if (prerot and a1 != 0.0
            and not (_static2 and abs(float(a2)) < 1e-12)
            and _prerot_applies(a1, a2)):
        # Both angles nonzero (the exact-kernel configuration): commute the
        # first homodyne's rotation through the BS so the measure runs on the
        # Gram-eligible a1 == 0 path. See _PAIR_PREROT_DEFAULT.
        if not np.allclose(qs_np + qs_np[::-1], 0.0, atol=1e-9):
            raise ValueError("fused pair measure with a1 != 0 needs a "
                             "symmetric grid")
        t1 = rotation(qs, t1, -a1, axis=1)
        t2 = rotation(qs, t2, -a1, axis=1)
        a2 = (float(a2) - a1) if _static2 else (a2 - a1)
        a1 = 0.0
    k1, k2 = jax.random.split(key)

    S_L = _psd_sqrt(_left_env(tensors[:m]))              # (a, a)
    S_R = _psd_sqrt(_right_env(tensors[m + 2:]))         # (c, c)
    t1e = jnp.einsum("pa,aik->pik", jnp.conj(S_L), t1, precision=PRECISION)
    t2e = jnp.einsum("kic,cg->kig", t2, S_R, precision=PRECISION)

    pad = int(np.ceil(max(cth / sth, sth / cth) * (d - 1) / 2)) + 1

    def _make_tab(stretch):
        S, M, h = _stretch_sample_matrix(qs_np, stretch, 1, pad)
        S = jnp.asarray(S, dtype=rdt)
        freqs = jnp.fft.fftfreq(M, d=h).astype(rdt)
        return S, freqs

    def _tab(lines_d_first, S, precision=PRECISION):
        """(d, n) lines -> FFT'd padded stretched tabulation (M, n).

        Distribution-only tabulations pass _TAB_PRECISION; the collapse
        re-tabulates the raw lines at full config.PRECISION."""
        return jnp.fft.fft(jnp.matmul(S, lines_d_first, precision=precision),
                           axis=0)

    def _row(f_tab, freqs, delta, shape, flip=False):
        ph = jnp.exp(2j * jnp.pi * freqs * delta).astype(cdt)
        w = jnp.fft.ifft(f_tab * ph[:, None], axis=0)
        w = jax.lax.slice_in_dim(w, pad, pad + d, axis=0)
        if flip:
            # f(-|s| q_x + delta) on a symmetric grid = reversed core slice
            w = jnp.flip(w, axis=0)
        return w.reshape((d,) + shape)

    lines1 = jnp.permute_dims(t1, (1, 0, 2)).reshape(d, a * k)
    lines2 = jnp.permute_dims(t2, (1, 0, 2)).reshape(d, k * c)
    lines1e = jnp.permute_dims(t1e, (1, 0, 2)).reshape(d, a * k)
    lines2e = jnp.permute_dims(t2e, (1, 0, 2)).reshape(d, k * c)

    static2 = not isinstance(a2, jax.core.Tracer)
    swapped = a1 != 0.0 and static2 and abs(float(a2)) < 1e-12
    if swapped or a1 != 0.0:
        if not np.allclose(qs_np + qs_np[::-1], 0.0, atol=1e-9):
            raise ValueError("fused pair measure with a1 != 0 needs a "
                             "symmetric grid")

    if gram is None:
        gram = _PAIR_GRAM_DEFAULT
    use_gram = (gram and abs(cth - sth) < 1e-12
                and np.allclose(qs_np + qs_np[::-1], 0.0, atol=1e-9))

    if swapped:
        # -- order-swapped fast path: scan the unrotated SECOND mode --------
        SC, freqsC = _make_tab(cth)   # t1 lines as functions of x (stretch c)
        SSn, freqsS = _make_tab(sth)  # t2 lines as functions of x (stretch -s)
        if use_gram:
            p1_raw = _gram_corr_p1(lines1e, lines2e, qs_np, pad, a, k, c,
                                   swapped=True, rdt=rdt)
        else:
            f1eC = _tab(lines1e, SC, _TAB_PRECISION)
            f2eS = _tab(lines2e, SSn, _TAB_PRECISION)

            def pj_body(y, acc):
                W1 = _row(f1eC, freqsC, sth * qs[y], (a, k))             # t1e(c q_x + s q_y)
                W2 = _row(f2eS, freqsS, cth * qs[y], (k, c), flip=True)  # t2e(-s q_x + c q_y)
                Ay = jnp.einsum("xak,xkc->xac", W1, W2,
                                precision=p1_precision)
                return acc.at[y].set(jnp.sum(jnp.abs(Ay) ** 2))

            p1_raw = jax.lax.fori_loop(0, d, pj_body, jnp.zeros((d,), rdt))
    elif a1 == 0.0:
        # -- fast path: scan the measured mode's grid rows directly --------
        SG, freqsG = _make_tab(sth)   # t1 lines as functions of j (stretch s)
        SH, freqsH = _make_tab(cth)   # t2 lines as functions of j (stretch c)
        if use_gram:
            p1_raw = _gram_corr_p1(lines1e, lines2e, qs_np, pad, a, k, c,
                                   swapped=False, rdt=rdt)
        else:
            f1e = _tab(lines1e, SG, _TAB_PRECISION)
            f2e = _tab(lines2e, SH, _TAB_PRECISION)

            def p1_body(i, acc):
                W1 = _row(f1e, freqsG, cth * qs[i], (a, k))      # (d_j, a, k)
                W2 = _row(f2e, freqsH, -sth * qs[i], (k, c))     # (d_j, k, c)
                C = jnp.einsum("jak,jkc->jac", W1, W2,
                               precision=p1_precision)
                return acc.at[i].set(jnp.sum(jnp.abs(C) ** 2))

            p1_raw = jax.lax.fori_loop(0, d, p1_body, jnp.zeros((d,), rdt))
    else:
        # -- exact-kernel path: apply the frFT kernel along virtual x-lines
        if not np.allclose(qs_np + qs_np[::-1], 0.0, atol=1e-9):
            raise ValueError("fused pair measure with a1 != 0 needs a "
                             "symmetric grid")
        SC, freqsC = _make_tab(cth)   # t1 lines as functions of x (stretch c)
        SSn, freqsS = _make_tab(sth)  # t2 lines as functions of x (stretch -s, via flip)
        f1eC = _tab(lines1e, SC, _TAB_PRECISION)
        f2eS = _tab(lines2e, SSn, _TAB_PRECISION)

        def p1_body(y, acc):
            W1 = _row(f1eC, freqsC, sth * qs[y], (a, k))            # t1e(c q_x + s q_y)
            W2 = _row(f2eS, freqsS, cth * qs[y], (k, c), flip=True)  # t2e(-s q_x + c q_y)
            Ay = jnp.einsum("xak,xkc->xac", W1, W2,
                            precision=p1_precision)
            phi = rotation(qs, Ay, -a1, axis=0)                      # (d_m, a, c)
            return acc + jnp.sum(jnp.abs(phi) ** 2, axis=(1, 2))

        p1_raw = jax.lax.fori_loop(0, d, p1_body, jnp.zeros((d,), rdt))

    if _stage == "p1":  # profiling cut: through the first distribution
        return p1_raw
    # `force` is ALWAYS (mode-1 grid index, mode-2 grid index); in swapped
    # order the second mode is sampled first.
    rho1 = jnp.clip(p1_raw, 0.0, None) * dq ** (L0 - 1)
    dist1 = rho1 * dq
    if force is not None:
        s1_idx = jnp.asarray(force[1] if swapped else force[0])
    else:
        s1_idx = jax.random.categorical(k1, jnp.log(dist1))
    v1 = qs[s1_idx]
    p1v = rho1[s1_idx]

    # Collapse from the RAW (undressed) factors at the sampled outcome.
    if swapped:
        # one line evaluation at the collapsed column y = v1 -> (a, d_x, c)
        f1rC = _tab(lines1, SC)
        f2rS = _tab(lines2, SSn)
        W1r = _row(f1rC, freqsC, sth * v1, (a, k))
        W2r = _row(f2rS, freqsS, cth * v1, (k, c), flip=True)
        B = jnp.einsum("xak,xkc->axc", W1r, W2r, precision=PRECISION)
    elif a1 == 0.0:
        f1r = _tab(lines1, SG)
        f2r = _tab(lines2, SH)
        W1r = _row(f1r, freqsG, cth * v1, (a, k))
        W2r = _row(f2r, freqsH, -sth * v1, (k, c))
        B = jnp.einsum("jak,jkc->ajc", W1r, W2r, precision=PRECISION)
    else:
        f1rC = _tab(lines1, SC)
        f2rS = _tab(lines2, SSn)
        krow = _rotation_kernel_row(qs, -a1, v1).astype(cdt)         # (d_x,)

        def c_body(y, B):
            W1 = _row(f1rC, freqsC, sth * qs[y], (a, k))
            W2 = _row(f2rS, freqsS, cth * qs[y], (k, c), flip=True)
            Ay = jnp.einsum("xak,xkc->xac", W1, W2, precision=PRECISION)
            by = jnp.einsum("x,xac->ac", krow, Ay, precision=PRECISION)
            return jax.lax.dynamic_update_slice(B, by[:, None, :], (0, y, 0))

        B = jax.lax.fori_loop(0, d, c_body, jnp.zeros((a, d, c), cdt))

    B = B / jnp.sqrt(jnp.maximum(p1v, tiny)).astype(cdt)
    if _stage == "collapse":  # profiling cut: through the conditional tensor
        return B

    # Second measurement: the remaining mode is mode 1 (angle a1) in swapped
    # order, mode 2 (angle a2, possibly traced) otherwise.
    if swapped:
        B = rotation(qs, B, -a1, axis=1)
    elif not (static2 and abs(float(a2)) < 1e-12):
        B = rotation(qs, B, -a2, axis=1)

    Bd = jnp.einsum("pa,ajc,cg->pjg", jnp.conj(S_L), B, S_R, precision=PRECISION)
    rho2 = jnp.clip(jnp.sum(jnp.abs(Bd) ** 2, axis=(0, 2)), 0.0, None) * dq ** (L0 - 2)
    dist2 = rho2 * dq
    if force is not None:
        s2_idx = jnp.asarray(force[0] if swapped else force[1])
    else:
        s2_idx = jax.random.categorical(k2, jnp.log(dist2))
    v2 = qs[s2_idx]
    p2v = rho2[s2_idx]

    M = jax.lax.dynamic_index_in_dim(B, s2_idx, axis=1, keepdims=False)
    M = M / jnp.sqrt(jnp.maximum(p2v, tiny)).astype(cdt)
    m1, m2 = (v2, v1) if swapped else (v1, v2)

    # Absorb into a neighbour (Mq smaller-intermediate rule, cv/gates.py).
    new_tensors = list(tensors)
    del new_tensors[m:m + 2]
    has_left, has_right = m > 0, m + 2 < L0
    if not (has_left or has_right):
        raise ValueError("fused_pair_measure2 cannot remove the whole chain")
    if has_left and (a >= c or not has_right):
        new_tensors[m - 1] = jnp.tensordot(tensors[m - 1], M, axes=(2, 0))
    else:
        new_tensors[m] = jnp.tensordot(M, tensors[m + 2], axes=(1, 0))
    if diagnostics:
        return new_tensors, m1, m2, {"rho1": rho1, "rho2": rho2,
                                     "p1": p1v, "p2": p2v, "swapped": swapped,
                                     "i": s1_idx, "j": s2_idx}
    return new_tensors, m1, m2
