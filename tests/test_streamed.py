"""Streamed pair-SVD vs the materialised warp+SVD path."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from quantum_computations_tpu.ops import interp
from quantum_computations_tpu.ops.linalg import tensor_svd
from quantum_computations_tpu.ops.streamed import streamed_pair_svd

rng = np.random.default_rng(0)


def _pair(a=4, d=64, k=3, b=2):
    t1 = rng.normal(size=(a, d, k)) + 1j * rng.normal(size=(a, d, k))
    t2 = rng.normal(size=(k, d, b)) + 1j * rng.normal(size=(k, d, b))
    return jnp.asarray(t1), jnp.asarray(t2)


def test_streamed_matches_materialised():
    t1, t2 = _pair()
    qs = jnp.linspace(-5, 5, 64)
    x_src, y_src = interp.rotation_maps(qs, 0.7)
    mbd, rel = 8, 1e-3

    m1s, m2s, rank_s = streamed_pair_svd(
        t1, t2, qs, x_src, y_src, max_bond_dim=mbd, abs_err=0.0, rel_err=rel,
        key=jax.random.PRNGKey(0), power_iters=7,
    )
    # materialised reference result
    res = jnp.tensordot(t1, t2, axes=(2, 0))
    res = interp.warp_2d(qs, res, x_src, y_src)
    full = np.einsum("abj,jcd->abcd", *map(np.asarray, (m1s, m2s)))

    # reconstruction error of the streamed split vs the true warped tensor
    # bounded by the dropped singular mass of an exact SVD
    m = np.asarray(res).reshape(4 * 64, 64 * 2)
    s_exact = np.linalg.svd(m, compute_uv=False)
    dropped = s_exact[int(rank_s):].sum()
    err = np.linalg.norm(full.reshape(m.shape) - m, ord="fro")
    assert err <= dropped * 1.5 + 1e-6, (err, dropped)

    # kept singular values match the exact ones closely
    kept = np.sort(np.linalg.norm(
        np.asarray(m1s).reshape(4 * 64, -1), axis=0))[::-1][: int(rank_s)]
    np.testing.assert_allclose(kept**2, s_exact[: int(rank_s)], rtol=1e-2)


@pytest.mark.slow
def test_streamed_in_bs_gate_big_threshold():
    """Force the streamed path through the BS gate by lowering the threshold."""
    import quantum_computations_tpu.cv.gates as cvg
    from quantum_computations_tpu.cv.mps import MPS
    from quantum_computations_tpu.config import SVDOptions

    qs = np.linspace(-8, 8, 80)
    # decaying-spectrum (physical-like) input so truncation is well defined:
    # bond components are increasingly suppressed oscillating gaussians
    g = np.exp(-qs**2 / 2)
    modes = np.stack([g, 0.3 * g * qs, 0.05 * g * (qs**2 - 1)], axis=0)
    t1 = (modes.T[None, :, :] * (1 + 0.1j)).astype(complex)          # (1, 80, 3)
    t2 = (modes[:, :, None] * (1 - 0.05j)).astype(complex)           # (3, 80, 1)

    def run(threshold):
        old = cvg._STREAM_THRESHOLD
        cvg._STREAM_THRESHOLD = threshold
        try:
            mps = MPS(qs, [jnp.asarray(t1), jnp.asarray(t2)])
            cvg.BS(0, 1).apply(mps, key=jax.random.PRNGKey(5),
                               svd_options=SVDOptions(max_bond_dim=6, rel_err=1e-4))
            res = jnp.tensordot(mps[0], mps[1], axes=(2, 0))
            return np.asarray(res)
        finally:
            cvg._STREAM_THRESHOLD = old

    big = run(1 << 40)   # materialised
    small = run(1)       # streamed
    assert np.abs(big - small).max() < 2e-2 * np.abs(big).max()
