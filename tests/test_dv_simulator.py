"""End-to-end DV simulator tests: Grover, measurements, classical control."""

import numpy as np
import jax

from quantum_computations_tpu.dv import (
    CX, CZ, H, Insert, M, MX, MZ, P, Simulator, State, T, X, Z,
    ClassicalControl, qop,
)
from quantum_computations_tpu.pipelines import circuits


def test_grover_amplifies_tagged_states():
    for tagged in ([3, 6], [0, 4], [2, 7]):
        circ = circuits.grover(circuits.oracle(tagged))
        sim = Simulator(circ)
        state = np.asarray(sim.run())
        probs = np.abs(state) ** 2
        # 2 marked of 8: sin^2(theta)=1/4 so one iteration rotates to
        # 3*theta = pi/2 — exact success probability 1, split evenly.
        tagged_p = probs[tagged]
        assert np.allclose(tagged_p, 0.5, atol=1e-6)
        assert np.isclose(probs.sum(), 1.0, atol=1e-6)
        assert np.isclose(tagged_p.sum(), 1.0, atol=1e-6)


def test_grover_jit_matches_eager():
    circ = circuits.grover(circuits.oracle([2, 7]))
    s1 = np.asarray(Simulator(circ).run())
    s2 = np.asarray(Simulator(circ).run(jit=True))
    np.testing.assert_allclose(s1, s2, atol=1e-10)


def test_postselected_measurement():
    # |+> measured in Z with result forced to 1 -> |1>
    sim = Simulator([Insert(0, State.PLUS), MZ(0, result=1)])
    state = np.asarray(sim.run())
    np.testing.assert_allclose(np.abs(state), [0, 1], atol=1e-10)
    assert sim.results == [1]


def test_measurement_statistics():
    # Born sampling on |+> should give ~50/50 over seeds.
    outcomes = []
    for seed in range(40):
        sim = Simulator([Insert(0, State.PLUS), MZ(0)], rng_seed=seed)
        sim.run()
        outcomes.append(sim.results[0])
    assert 5 < sum(outcomes) < 35


def test_classical_control_teleport_style():
    # Prepare |1>, measure Z (deterministic 1), then conditionally flip.
    circ = [
        Insert(0, State.ONE),
        Insert(1, State.ZERO),
        MZ(0),
        ClassicalControl(X(1), positive_indices=[0]),
    ]
    sim = Simulator(circ, rng_seed=0)
    state = np.asarray(sim.run())
    # qubit0 collapsed to |1>, qubit1 flipped to |1> -> state |11>
    np.testing.assert_allclose(np.abs(state), [0, 0, 0, 1], atol=1e-10)


def test_classical_control_negative():
    circ = [
        Insert(0, State.ZERO),
        Insert(1, State.ZERO),
        MZ(0),  # deterministic 0
        ClassicalControl(X(1), negative_indices=[0]),
    ]
    state = np.asarray(Simulator(circ, rng_seed=0).run())
    np.testing.assert_allclose(np.abs(state), [0, 1, 0, 0], atol=1e-10)


def test_mx_measurement():
    # |0> in X basis: outcomes 50/50; forced result=0 projects onto |+>.
    sim = Simulator([Insert(0, State.ZERO), MX(0, result=0)])
    state = np.asarray(sim.run())
    np.testing.assert_allclose(state, np.array([1, 1]) / np.sqrt(2), atol=1e-10)


def test_vmapped_trajectories():
    """Monte-Carlo over keys: the flagship batching pattern."""
    import jax.numpy as jnp
    circ = [MZ(0)]
    sim = Simulator(circ)
    fn = sim.as_fn()
    init = qop.normalise(np.array([1.0, 1.0j]))
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    _, results = jax.vmap(lambda k: fn(jnp.asarray(init), k))(keys)
    mean = np.asarray(results).mean()
    assert 0.3 < mean < 0.7
