"""Axis-grouped gate application vs the rank-N reference path."""

import numpy as np
import jax.numpy as jnp
import pytest

from quantum_computations_tpu.dv import qop

rng = np.random.default_rng(3)


def rand_u(d):
    a = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    q, _ = np.linalg.qr(a)
    return q


@pytest.mark.parametrize("N,targets", [
    (6, (0,)), (6, (5,)), (6, (3,)),
    (7, (1, 4)), (7, (4, 1)), (7, (0, 6)), (7, (5, 6)),
])
def test_grouped_matches_rankN(N, targets):
    u = rand_u(2 ** len(targets))
    psi = rng.normal(size=2**N) + 1j * rng.normal(size=2**N)
    psi = jnp.asarray(psi / np.linalg.norm(psi))
    got = np.asarray(qop.apply_unitary_grouped(psi, jnp.asarray(u), targets))
    want = np.asarray(qop.apply_unitary(psi, jnp.asarray(u), targets))
    np.testing.assert_allclose(got, want, atol=1e-10)
