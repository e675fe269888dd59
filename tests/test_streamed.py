"""Streamed pair-SVD vs the materialised transform+SVD path."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from quantum_computations_tpu.ops import interp
from quantum_computations_tpu.ops.streamed import streamed_pair_svd

rng = np.random.default_rng(0)


def _pair(a=4, d=64, k=3, b=2):
    t1 = rng.normal(size=(a, d, k)) + 1j * rng.normal(size=(a, d, k))
    t2 = rng.normal(size=(k, d, b)) + 1j * rng.normal(size=(k, d, b))
    return jnp.asarray(t1), jnp.asarray(t2)


@pytest.mark.parametrize("warp_params", [
    ("rot", 0.7), ("shear", 1.0, True), ("cz", 1.0), ("swap",), ("id",),
])
def test_streamed_matches_materialised(warp_params, monkeypatch):
    import quantum_computations_tpu.ops.streamed as st
    # pin the direct single-split driver (the cz decomposition of "rot" makes
    # three sequential truncations — covered by its own physical-state test)
    monkeypatch.setattr(st, "_BS_DECOMP", "rot")
    t1, t2 = _pair()
    qs = jnp.linspace(-5, 5, 64)
    mbd, rel = 8, 1e-3

    m1s, m2s, rank_s = streamed_pair_svd(
        t1, t2, qs, warp_params, max_bond_dim=mbd, abs_err=0.0, rel_err=rel,
        key=jax.random.PRNGKey(0), power_iters=7,
    )
    # materialised reference result through the same transform
    res = jnp.tensordot(t1, t2, axes=(2, 0))
    res = interp.affine_warp(qs, res, warp_params)
    full = np.einsum("abj,jcd->abcd", *map(np.asarray, (m1s, m2s)))

    # reconstruction error of the streamed split vs the true transformed
    # tensor bounded by the dropped singular mass of an exact SVD
    m = np.asarray(res).reshape(4 * 64, 64 * 2)
    s_exact = np.linalg.svd(m, compute_uv=False)
    dropped = s_exact[int(rank_s):].sum()
    err = np.linalg.norm(full.reshape(m.shape) - m, ord="fro")
    assert err <= dropped * 1.5 + 1e-6, (err, dropped)

    # kept singular values match the exact ones closely
    kept = np.sort(np.linalg.norm(
        np.asarray(m1s).reshape(4 * 64, -1), axis=0))[::-1][: int(rank_s)]
    np.testing.assert_allclose(kept**2, s_exact[: int(rank_s)], rtol=1e-2)


def test_fft_warp_matches_gather_warp():
    """The FFT shears agree with the bilinear gather on smooth interior data
    to bilinear's own O(dq^2) accuracy."""
    qs = jnp.linspace(-12, 12, 240)
    X, Y = jnp.meshgrid(qs, qs, indexing="ij")
    f = (jnp.exp(-((X - 1.0) ** 2 + (Y + 0.5) ** 2) / 2)
         * jnp.exp(1j * (0.7 * X - 0.3 * Y)))
    T = f[None, :, :, None]
    sl = slice(20, -20)

    for theta in (np.pi / 4, -0.3):
        xs, ys = interp.rotation_maps(qs, theta)
        ref = interp.warp_2d(qs, T, xs, ys)[0, sl, sl, 0]
        got = interp.rotate_fft(qs, T, theta)[0, sl, sl, 0]
        assert float(jnp.abs(ref - got).max()) < 5e-3

    for gain, cl in ((1.0, True), (1.0, False)):
        xs, ys = interp.shear_maps(qs, gain, cl)
        ref = interp.warp_2d(qs, T, xs, ys)[0, sl, sl, 0]
        got = interp.affine_warp(qs, T, ("shear", gain, cl))[0, sl, sl, 0]
        assert float(jnp.abs(ref - got).max()) < 5e-3


def _physical_pair(qs):
    g = np.exp(-np.asarray(qs) ** 2 / 2)
    modes = np.stack([g, 0.3 * g * qs, 0.05 * g * (qs ** 2 - 1)], axis=0)
    t1 = (modes.T[None, :, :] * (1 + 0.1j)).astype(complex)   # (1, d, 3)
    t2 = (modes[:, :, None] * (1 - 0.05j)).astype(complex)    # (3, d, 1)
    return t1, t2


@pytest.mark.slow
@pytest.mark.parametrize("gate_cls", ["BS", "CX", "CZ", "SWAP"])
def test_streamed_in_two_mode_gates_big_threshold(gate_cls):
    """Force the streamed path through every two-mode gate by lowering the
    threshold; results must match the materialised path."""
    import quantum_computations_tpu.cv.gates as cvg
    from quantum_computations_tpu.cv.mps import MPS
    from quantum_computations_tpu.config import SVDOptions

    qs = np.linspace(-8, 8, 80)
    t1, t2 = _physical_pair(qs)

    def run(threshold):
        old = cvg._STREAM_THRESHOLD
        cvg._STREAM_THRESHOLD = threshold
        try:
            mps = MPS(qs, [jnp.asarray(t1), jnp.asarray(t2)])
            gate = getattr(cvg, gate_cls)(0, 1)
            gate.apply(mps, key=jax.random.PRNGKey(5),
                       svd_options=SVDOptions(max_bond_dim=6, rel_err=1e-4))
            res = jnp.tensordot(mps[0], mps[1], axes=(2, 0))
            return np.asarray(res)
        finally:
            cvg._STREAM_THRESHOLD = old

    big = run(1 << 40)   # materialised
    small = run(1)       # streamed
    assert np.abs(big - small).max() < 2e-2 * np.abs(big).max()


def test_streamed_multi_chunk_both_axes(monkeypatch):
    """Tiny block budget forces chunking along BOTH bond axes."""
    import quantum_computations_tpu.ops.streamed as st
    monkeypatch.setattr(st, "_BLOCK_ELEMENTS", 1 * 64 * 64 * 1)
    t1, t2 = _pair(a=4, d=64, k=3, b=2)
    qs = jnp.linspace(-5, 5, 64)
    # budget of one (1, d, d, 1) block: both bonds must chunk fully
    assert st._pick_chunks(4, 64, 2) == (1, 1)
    m1, m2, rank = st.streamed_pair_svd(
        t1, t2, qs, ("rot", 0.7), max_bond_dim=8, abs_err=0.0, rel_err=1e-3,
        key=jax.random.PRNGKey(0), power_iters=7,
    )
    res = interp.affine_warp(qs, jnp.tensordot(t1, t2, axes=(2, 0)), ("rot", 0.7))
    full = np.einsum("abj,jcd->abcd", np.asarray(m1), np.asarray(m2))
    m = np.asarray(res).reshape(4 * 64, 64 * 2)
    s_exact = np.linalg.svd(m, compute_uv=False)
    dropped = s_exact[int(rank):].sum()
    err = np.linalg.norm(full.reshape(m.shape) - m, ord="fro")
    assert err <= dropped * 1.5 + 1e-6, (err, dropped)


def test_streamed_batched_matches_unbatched():
    """The batched program driver equals per-sample unbatched calls."""
    from quantum_computations_tpu.ops.streamed import streamed_pair_svd_batched

    qs = jnp.linspace(-5, 5, 64)
    B = 3
    t1 = jnp.stack([_pair()[0] for _ in range(B)])
    t2 = jnp.stack([_pair()[1] for _ in range(B)])
    keys = jax.random.split(jax.random.PRNGKey(7), B)

    m1b, m2b, rankb = streamed_pair_svd_batched(
        t1, t2, qs, ("rot", 0.7), max_bond_dim=8, abs_err=0.0, rel_err=1e-3,
        keys=keys, power_iters=7,
    )
    assert m1b.shape[0] == B and rankb.shape == (B,)
    for s in range(B):
        m1, m2, rank = streamed_pair_svd(
            t1[s], t2[s], qs, ("rot", 0.7), max_bond_dim=8, abs_err=0.0,
            rel_err=1e-3, key=keys[s], power_iters=7,
        )
        # same sketch key => identical programs modulo vmap; compare the
        # reconstructed (not gauge-dependent) products
        full_b = np.einsum("abj,jcd->abcd", np.asarray(m1b[s]), np.asarray(m2b[s]))
        full_s = np.einsum("abj,jcd->abcd", np.asarray(m1), np.asarray(m2))
        np.testing.assert_allclose(full_b, full_s, rtol=1e-4, atol=1e-6)
        assert int(rankb[s]) == int(rank)


def test_batched_op_bs_streamed_dispatch(monkeypatch):
    """BatchedGKP._op_bs routes oversize contractions through the streamed
    batched driver and matches the materialised executor."""
    import quantum_computations_tpu.cv.gates as cvg
    from quantum_computations_tpu.config import SVDOptions
    from quantum_computations_tpu.gkp.batched import BatchedGKP

    qs = np.linspace(-8, 8, 80)
    t1, t2 = _physical_pair(qs)
    B = 2
    t1b = jnp.stack([jnp.asarray(t1)] * B)
    t2b = jnp.stack([jnp.asarray(t2)] * B)
    eng = BatchedGKP(qs, 0.1, SVDOptions(max_bond_dim=6, rel_err=1e-4),
                     granularity="op")
    keys = jax.random.split(jax.random.PRNGKey(3), B)

    def run(threshold):
        monkeypatch.setattr(cvg, "_STREAM_THRESHOLD", threshold)
        out = eng._op_bs([t1b, t2b], 0, 1, keys)
        return np.asarray(jnp.einsum("sabj,sjcd->sabcd", out[0], out[1]))

    big = run(1 << 40)   # materialised executor
    small = run(1)       # streamed batched driver
    assert np.abs(big - small).max() < 2e-2 * np.abs(big).max()


def test_rot_via_cz_decomposition_physical():
    """The 3-CZ (Fourier-conjugated shear) BS split agrees with the
    materialised rot warp on smooth physical states."""
    import quantum_computations_tpu.ops.streamed as st

    qs = np.linspace(-8, 8, 80)
    t1, t2 = _physical_pair(qs)
    t1, t2 = jnp.asarray(t1), jnp.asarray(t2)
    qsj = jnp.asarray(qs)

    assert st._BS_DECOMP == "cz"  # the default drives the decomposition
    for warp in (("rot", np.pi / 4), ("shear", 0.8, True), ("shear", 0.8, False)):
        m1, m2, rank = streamed_pair_svd(
            t1, t2, qsj, warp, max_bond_dim=6, abs_err=0.0,
            rel_err=1e-4, key=jax.random.PRNGKey(2), power_iters=7,
        )
        got = np.einsum("abj,jcd->abcd", np.asarray(m1), np.asarray(m2))
        ref = np.asarray(interp.affine_warp(
            qsj, jnp.tensordot(t1, t2, axes=(2, 0)), warp))
        assert np.abs(got - ref).max() < 2e-2 * np.abs(ref).max(), warp


def test_device_eigh_mode_matches_host(monkeypatch):
    """QCT_STREAM_EIGH=device (fused iterate+eigh+assemble program) must
    reproduce the host-eigh driver's split to fp tolerance."""
    import quantum_computations_tpu.ops.streamed as st

    monkeypatch.setattr(st, "_BS_DECOMP", "rot")
    t1, t2 = _pair()
    qs = jnp.linspace(-5, 5, 64)
    kw = dict(max_bond_dim=8, abs_err=0.0, rel_err=1e-3,
              key=jax.random.PRNGKey(3), power_iters=7)

    m1h, m2h, rank_h = streamed_pair_svd(t1, t2, qs, ("rot", 0.7), **kw)
    monkeypatch.setattr(st, "_EIGH_MODE", "device")
    m1d, m2d, rank_d = streamed_pair_svd(t1, t2, qs, ("rot", 0.7), **kw)

    assert int(rank_h) == int(rank_d)
    # factors agree up to per-direction phase; compare the reconstruction
    full_h = np.einsum("abj,jcd->abcd", np.asarray(m1h), np.asarray(m2h))
    full_d = np.einsum("abj,jcd->abcd", np.asarray(m1d), np.asarray(m2d))
    np.testing.assert_allclose(full_d, full_h, atol=1e-8 * np.abs(full_h).max())


def test_device_eigh_mode_batched(monkeypatch):
    import quantum_computations_tpu.ops.streamed as st
    from quantum_computations_tpu.ops.streamed import streamed_pair_svd_batched

    t1, t2 = _pair()
    t1b = jnp.stack([t1, t1 * 0.5])
    t2b = jnp.stack([t2, t2])
    qs = jnp.linspace(-5, 5, 64)
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    kw = dict(max_bond_dim=8, abs_err=0.0, rel_err=1e-3, keys=keys,
              power_iters=4)
    m1h, m2h, rank_h = streamed_pair_svd_batched(t1b, t2b, qs, ("cz", 0.8), **kw)
    monkeypatch.setattr(st, "_EIGH_MODE", "device")
    m1d, m2d, rank_d = streamed_pair_svd_batched(t1b, t2b, qs, ("cz", 0.8), **kw)
    np.testing.assert_array_equal(np.asarray(rank_h), np.asarray(rank_d))
    for i in range(2):
        full_h = np.einsum("abj,jcd->abcd", np.asarray(m1h[i]), np.asarray(m2h[i]))
        full_d = np.einsum("abj,jcd->abcd", np.asarray(m1d[i]), np.asarray(m2d[i]))
        np.testing.assert_allclose(full_d, full_h,
                                   atol=1e-8 * np.abs(full_h).max())
