"""FastStatevector: split-real large-N engine vs the complex reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quantum_computations_tpu.dv import qop, gates as dvg
from quantum_computations_tpu.dv.fast_sv import FastStatevector

N = 10  # inner >= 128 for qubits 0..2 -> exercises pallas AND xla fallbacks


def _reference_state(gates, n):
    psi = jnp.zeros((1 << n,), dtype=complex).at[0].set(1.0)
    for g in gates:
        psi = qop.apply_unitary(psi, jnp.asarray(g.matrix), tuple(g.indices))
    return np.asarray(psi).reshape(-1)


def _circuit():
    return [
        dvg.H(0), dvg.H(1), dvg.H(2),          # fusable chain (bits 9,8,7)
        dvg.CX(1, 2),                          # adjacent pair, inner 2^7
        dvg.T(0), dvg.P(1),
        dvg.CZ(4, 7),                          # non-adjacent -> xla
        dvg.H(9),                              # inner < 128 -> xla
        dvg.X(5), dvg.Y(6),
    ]


@pytest.mark.parametrize("mode", ["xla", "pallas-interpret", "window"])
def test_matches_complex_reference(mode):
    gates = _circuit()
    want = _reference_state(gates, N)
    if mode == "window":
        sv = FastStatevector(N, fusion_mode="window")
    else:
        sv = FastStatevector(N, use_pallas=(mode == "pallas-interpret"),
                             interpret=True, fusion_mode="chain")
    sv.run(gates)
    got = np.asarray(sv.re) + 1j * np.asarray(sv.im)
    # global state, not just probabilities
    np.testing.assert_allclose(got, want, atol=2e-6)
    assert abs(sv.norm_sq() - 1.0) < 1e-5


def test_chain_fusion_planned():
    sv = FastStatevector(N, use_pallas=True, interpret=True)
    assert sv.fusion_mode == "chain"  # explicit use_pallas keeps the old path
    plans = sv._plan(_circuit())
    kinds = [p.kind for p in plans]
    assert kinds[0] == "chain" and len(plans[0].matrices) == 3
    assert "2q" in kinds and "xla" in kinds


def test_slab_mode_is_default():
    sv = FastStatevector(N)
    assert sv.fusion_mode == "slab"


def test_window_mode_fuses():
    sv = FastStatevector(N, fusion_mode="window")
    gates = _circuit()  # 10 gates over qubits {0,1,2,4,5,6,7,9}
    want = _reference_state(gates, N)
    sv.run(gates)
    got = np.asarray(sv.re) + 1j * np.asarray(sv.im)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_sampling_distribution():
    # 3 Hadamards on a 10-qubit register -> uniform over 8 leading patterns
    sv = FastStatevector(N, use_pallas=False)
    sv.run([dvg.H(0), dvg.H(1), dvg.H(2)])
    samples = sv.sample(jax.random.PRNGKey(0), shots=4096)
    # remaining qubits must be |0>
    assert np.all(samples % (1 << (N - 3)) == 0)
    leading = samples >> (N - 3)
    counts = np.bincount(leading, minlength=8)
    assert counts.min() > 4096 / 8 * 0.7, counts


def test_grover_on_fast_engine():
    """The DV Grover circuit runs end-to-end on the fast engine (xla mode on
    CPU) and concentrates on the tagged states."""
    from quantum_computations_tpu.pipelines import circuits

    gates = circuits.grover(circuits.oracle([2, 7]))
    sv = FastStatevector(3, use_pallas=False).run(gates)
    p = np.asarray(sv.probs())
    assert abs(p[2] - 0.5) < 1e-5 and abs(p[7] - 0.5) < 1e-5


def test_slab_mode_matches_reference():
    """Lazy-layout slab engine: scattered windows force move passes; the
    final probs/sample remap back to logical order."""
    gates = _circuit()
    want = _reference_state(gates, N)
    sv = FastStatevector(N, fusion_mode="slab")
    sv.run(gates)
    assert not sv._layout_is_identity()  # moves actually happened
    p = np.asarray(sv.probs())
    np.testing.assert_allclose(p, np.abs(want) ** 2, atol=2e-6)
    assert abs(sv.norm_sq() - 1.0) < 1e-5


def test_slab_mode_sample_remap():
    # H on qubits 0..2 only: samples must be uniform over the 8 leading
    # patterns with trailing qubits |0> — in LOGICAL order, despite the
    # physical layout having moved qubits 0..2 into the minor slab.
    import jax as _jax

    sv = FastStatevector(N, fusion_mode="slab")
    sv.run([dvg.H(0), dvg.H(1), dvg.H(2)])
    assert not sv._layout_is_identity()
    samples = sv.sample(_jax.random.PRNGKey(0), shots=4096)
    assert np.all(samples % (1 << (N - 3)) == 0)
    counts = np.bincount(samples >> (N - 3), minlength=8)
    assert counts.min() > 4096 / 8 * 0.7, counts


def test_slab_mode_no_move_when_resident():
    """A window on already-slab-resident qubits costs no move pass."""
    sv = FastStatevector(N, fusion_mode="slab")
    slab_qubits = list(range(N - sv.slab_bits, N))
    sv.run([dvg.H(q) for q in slab_qubits])
    assert sv._layout_is_identity()
    want = _reference_state([dvg.H(q) for q in slab_qubits], N)
    got = np.asarray(sv.re) + 1j * np.asarray(sv.im)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_slab_large_n_minor_safe_moves():
    """Exercises the minor-safe move sequence (block swaps + upper moves)
    — every branch: resident-only, full eviction, and the mixed case.
    Uses a narrow slab (S=4) so N >= 3S+1 holds at a testable size."""
    rng = np.random.default_rng(7)
    NN = 15  # S=4 -> slab axes 11..14, block B axes 7..10

    def rand_u():
        a = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
        q, _ = np.linalg.qr(a)
        return q.astype(np.complex64)

    # window 1: all in slab (resident, no move); window 2: all upper
    # (eviction-free import); window 3: mixed resident + upper targets
    circuits_ = [
        [(rand_u(), (q,)) for q in (11, 12, 14)],
        [(rand_u(), (q,)) for q in (0, 2, 5)],
        [(rand_u(), (q,)) for q in (0, 3, 8)],   # mixed after moves
    ]
    sv = FastStatevector(NN, fusion_mode="slab")
    sv.slab_bits = 4
    sv.scatter_move_max = 0   # force the minor-safe sequence
    psi = jnp.zeros((1 << NN,), dtype=complex).at[0].set(1.0)
    for circ in circuits_:
        sv.run(circ)
        for m, t in circ:
            psi = qop.apply_unitary(psi, jnp.asarray(m), t)
    p = np.asarray(sv.probs())
    np.testing.assert_allclose(p, np.abs(np.asarray(psi)) ** 2, atol=2e-6)
    assert abs(sv.norm_sq() - 1.0) < 1e-5


def test_slab_move_branches_random():
    """Randomised window sequences at N=16: layout bookkeeping must stay
    consistent across many move/swap compositions."""
    rng = np.random.default_rng(11)
    NN = 16

    def rand_u(k):
        d = 1 << k
        a = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
        q, _ = np.linalg.qr(a)
        return q.astype(np.complex64)

    sv = FastStatevector(NN, fusion_mode="slab")
    sv.slab_bits = 4
    sv.scatter_move_max = 0
    psi = jnp.zeros((1 << NN,), dtype=complex).at[0].set(1.0)
    for _ in range(10):
        k = int(rng.integers(1, 3))
        tgts = tuple(int(x) for x in rng.choice(NN, size=k, replace=False))
        u = rand_u(k)
        sv.run([(u, tgts)])
        psi = qop.apply_unitary(psi, jnp.asarray(u), tgts)
    p = np.asarray(sv.probs())
    np.testing.assert_allclose(p, np.abs(np.asarray(psi)) ** 2, atol=2e-5)


def test_slab_mode_pallas_matmul_interpret():
    """Slab engine with the in-place Pallas matmul (interpret mode)."""
    sv = FastStatevector(12, fusion_mode="slab", use_pallas=True,
                         interpret=True)
    gates = [dvg.H(0), dvg.H(8), dvg.CX(0, 8), dvg.T(11)]
    sv.run(gates)
    psi = jnp.zeros((1 << 12,), dtype=complex).at[0].set(1.0)
    for g in gates:
        psi = qop.apply_unitary(psi, jnp.asarray(g.matrix), tuple(g.indices))
    np.testing.assert_allclose(np.asarray(sv.probs()),
                               np.abs(np.asarray(psi)) ** 2, atol=2e-6)


def test_run_compiled_matches_per_step():
    """Whole-circuit compiled slab execution == per-step == dense."""
    rng = np.random.default_rng(13)
    NN = 15

    def rand_u(k):
        d = 1 << k
        a = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
        q, _ = np.linalg.qr(a)
        return q.astype(np.complex64)

    gates = [(rand_u(1), (q,)) for q in (0, 3, 12, 7, 9)] + \
            [(rand_u(2), (2, 14))]
    sv1 = FastStatevector(NN, fusion_mode="slab")
    sv1.slab_bits = 4
    sv1.scatter_move_max = 0
    sv1.run(gates)
    sv2 = FastStatevector(NN, fusion_mode="slab")
    sv2.slab_bits = 4
    sv2.scatter_move_max = 0
    sv2.run_compiled(gates)
    psi = jnp.zeros((1 << NN,), dtype=complex).at[0].set(1.0)
    for m, t in gates:
        psi = qop.apply_unitary(psi, jnp.asarray(m), t)
    p = np.abs(np.asarray(psi)) ** 2
    np.testing.assert_allclose(np.asarray(sv1.probs()), p, atol=2e-6)
    np.testing.assert_allclose(np.asarray(sv2.probs()), p, atol=2e-6)
    assert sv1.axis_of == sv2.axis_of
    # a second compiled run on the evolved layout still matches
    sv2.run_compiled(gates)
    psi2 = psi
    for m, t in gates:
        psi2 = qop.apply_unitary(psi2, jnp.asarray(m), t)
    np.testing.assert_allclose(np.asarray(sv2.probs()),
                               np.abs(np.asarray(psi2)) ** 2, atol=2e-6)


def test_plan_slab_residency_properties():
    """Property test of the shared pass planner: for random (N, S, targets)
    the emitted newpos maps are consistent permutations, the targets end in
    the slab, and above the scatter cutoff only minor-safe passes appear."""
    from quantum_computations_tpu.dv.fast_sv import plan_slab_residency

    rng = np.random.default_rng(11)
    for trial in range(200):
        N = int(rng.integers(4, 32))
        S = int(rng.integers(1, min(7, N) + 1))
        k = int(rng.integers(1, S + 1))
        phys = list(rng.choice(N, size=k, replace=False))
        scatter_max = int(rng.choice([0, 21, N]))
        ops = []
        pos = list(range(N))  # pos[p] = current position of original axis p

        def emit(op, newpos):
            ops.append(op)
            # newpos must be a bijection on 0..N-1
            mapped = [newpos(p) for p in range(N)]
            assert sorted(mapped) == list(range(N)), (op, mapped)
            for i in range(N):
                pos[i] = newpos(pos[i])

        final = plan_slab_residency(N, S, scatter_max, phys, emit)
        # returned positions agree with tracking through the newpos maps
        assert final == [pos[p] for p in phys]
        assert all(f >= N - S for f in final), (N, S, phys, final)
        minor_safe_regime = N >= 3 * S + 1 and N > scatter_max
        if minor_safe_regime:
            assert all(op[0] in ("move", "swap") for op in ops), ops
            assert len(ops) <= 4


def _rand_u(rng, k):
    d = 1 << k
    a = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    q, _ = np.linalg.qr(a)
    return q.astype(np.complex64)


def test_order_windows_groups_commuting_supports():
    """Alternating disjoint-support windows reorder into contiguous groups
    and merge, cutting layout passes; the state is unchanged (exact)."""
    rng = np.random.default_rng(17)
    NN = 15  # S=4: slab axes 11..14
    A, B = (11, 12, 13), (0, 1, 2)
    gates = []
    for _ in range(3):  # A B A B A B
        gates.append((_rand_u(rng, 3), A))
        gates.append((_rand_u(rng, 3), B))

    def engine(plan):
        sv = FastStatevector(NN, fusion_mode="slab")
        sv.slab_bits = 4
        sv.scatter_move_max = 0
        sv.plan_windows = plan
        return sv

    sv_plain = engine(False).run(gates)
    sv_plan = engine(True).run(gates)
    # planner: A-windows run first (slab-resident, 0 passes) and merge,
    # then ONE import of B — strictly fewer passes than the alternation
    assert sv_plan.layout_passes < sv_plain.layout_passes
    assert sv_plan.layout_passes <= 2
    psi = jnp.zeros((1 << NN,), dtype=complex).at[0].set(1.0)
    for m, t in gates:
        psi = qop.apply_unitary(psi, jnp.asarray(m), t)
    p = np.abs(np.asarray(psi)) ** 2
    np.testing.assert_allclose(np.asarray(sv_plain.probs()), p, atol=2e-6)
    np.testing.assert_allclose(np.asarray(sv_plan.probs()), p, atol=2e-6)


def test_order_windows_respects_dependencies():
    """Windows with overlapping supports never reorder: a random circuit
    with heavy support overlap gives identical states with/without the
    planner, per-step AND compiled."""
    rng = np.random.default_rng(23)
    NN = 14
    gates = []
    for _ in range(12):
        k = int(rng.integers(1, 4))
        tgts = tuple(int(x) for x in rng.choice(NN, size=k, replace=False))
        gates.append((_rand_u(rng, k), tgts))
    psi = jnp.zeros((1 << NN,), dtype=complex).at[0].set(1.0)
    for m, t in gates:
        psi = qop.apply_unitary(psi, jnp.asarray(m), t)
    p = np.abs(np.asarray(psi)) ** 2
    for compiled in (False, True):
        sv = FastStatevector(NN, fusion_mode="slab")
        sv.slab_bits = 4
        sv.scatter_move_max = 0
        assert sv.plan_windows  # default on
        (sv.run_compiled if compiled else sv.run)(gates)
        np.testing.assert_allclose(np.asarray(sv.probs()), p, atol=2e-5)


def test_merge_adjacent_windows_exact():
    from quantum_computations_tpu.dv import fusion

    rng = np.random.default_rng(29)
    windows = [(_rand_u(rng, 2), (1, 3)), (_rand_u(rng, 2), (1, 2)),
               (_rand_u(rng, 1), (5,))]
    merged = fusion.merge_adjacent_windows(windows, max_bits=4)
    # first two merge over support (1,2,3); the third joins too (union 4)
    assert len(merged) == 1 and merged[0][1] == (1, 2, 3, 5)
    NN = 6
    psi0 = jnp.asarray((rng.normal(size=1 << NN)
                        + 1j * rng.normal(size=1 << NN)))
    psi0 = psi0 / jnp.linalg.norm(psi0)
    a = psi0
    for m, t in windows:
        a = qop.apply_unitary(a, jnp.asarray(m), t)
    b = psi0
    for m, t in merged:
        b = qop.apply_unitary(b, jnp.asarray(m), t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_probabilities_single_qubit_any_layout():
    """Layout-aware per-qubit marginals agree with probs() on a permuted
    slab layout (small N), and close the probs()-refusal gap at N=24."""
    gates = _circuit()
    sv = FastStatevector(N, fusion_mode="slab")
    sv.run(gates)
    assert not sv._layout_is_identity()
    full = np.asarray(sv.probs()).reshape((2,) * N)
    for q in range(N):
        marg = full.sum(axis=tuple(i for i in range(N) if i != q))
        got = np.asarray(sv.probabilities(q))
        np.testing.assert_allclose(got, marg, atol=1e-6)


@pytest.mark.slow
def test_probabilities_n24_permuted_layout():
    """N=24 permuted layout: one-reduction marginals work, and probs()
    (run-grouped transpose — it used to refuse N>22 permuted layouts)
    agrees with them. X(0) then H(23): qubit 0 is deterministically 1,
    qubit 23 uniform, everything else 0."""
    NN = 24
    sv = FastStatevector(NN, fusion_mode="slab")
    sv.run([dvg.X(0), dvg.H(NN - 1), dvg.CX(0, 1)])
    if sv._layout_is_identity():  # the slab planner should have moved bit 0
        sv._ensure_slab_resident((0,))
    assert not sv._layout_is_identity()
    np.testing.assert_allclose(np.asarray(sv.probabilities(0)), [0, 1],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sv.probabilities(1)), [0, 1],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sv.probabilities(NN - 1)),
                               [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(sv.probabilities(2)), [1, 0],
                               atol=1e-6)
    # full logical-order probs via the run-grouped transpose
    p = np.asarray(sv.probs())
    idx = np.flatnonzero(p > 1e-9)
    # |11 0..0 0> and |11 0..0 1>: qubits 0,1 set, last qubit uniform
    base = (1 << (NN - 1)) | (1 << (NN - 2))
    np.testing.assert_array_equal(np.sort(idx), [base, base | 1])
    np.testing.assert_allclose(p[idx], [0.5, 0.5], atol=1e-6)
    # marginal(): joint tables in requested order, any layout
    np.testing.assert_allclose(np.asarray(sv.marginal([0, NN - 1])),
                               [0, 0, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(sv.marginal([NN - 1, 0])),
                               [0, 0.5, 0, 0.5], atol=1e-6)


def test_marginal_matches_probs_any_layout():
    """marginal() vs brute-force marginals of probs() on a permuted slab
    layout, including non-sorted qubit orders."""
    gates = _circuit()
    sv = FastStatevector(N, fusion_mode="slab")
    sv.run(gates)
    assert not sv._layout_is_identity()
    full = np.asarray(sv.probs()).reshape((2,) * N)
    for qs in [(0,), (3, 1), (9, 0, 4), (2, 8, 5, 1)]:
        keep = set(qs)
        marg = full.sum(axis=tuple(i for i in range(N) if i not in keep))
        # marg axes are sorted(qs); reorder to the requested order
        srt = sorted(qs)
        marg = np.transpose(marg, [srt.index(q) for q in qs]).reshape(-1)
        np.testing.assert_allclose(np.asarray(sv.marginal(list(qs))), marg,
                                   atol=1e-6, err_msg=str(qs))
    with pytest.raises(ValueError):
        sv.marginal([0, 0])
    with pytest.raises(ValueError):
        sv.marginal([N])


def test_order_windows_fallback_above_cap(monkeypatch):
    """Above _PLAN_MAX_WINDOWS the scheduler returns circuit order
    untouched (the O(n^2) planning would dominate host time)."""
    from quantum_computations_tpu.dv import fast_sv

    monkeypatch.setattr(fast_sv, "_PLAN_MAX_WINDOWS", 4)
    wins = [(np.eye(2), (i % 6,)) for i in range(6)]
    called = []

    def cost_fn(state, tgts):
        called.append(tgts)
        return 0, state

    out = fast_sv.order_windows_by_cost(wins, [0], cost_fn)
    assert out == wins and not called


def test_move_decomposition_matches_single_transpose(monkeypatch):
    """The per-run middle-swap decomposition of an upper move (the N>=29
    OOM-safe form) produces bit-identical layouts to the grouped single
    transpose, for scattered/adjacent/front/back target sets."""
    from quantum_computations_tpu.dv import fast_sv

    NN, S = 12, 5
    rng = np.random.default_rng(11)
    x = rng.normal(size=1 << NN).astype(np.float32)
    cases = [
        (0,), (6,), (0, 1), (2, 5), (0, 3, 6), (1, 2, 5, 6), (4, 5, 6),
        (0, 2, 4, 6), (0, 1, 2), (3,), (0, 6), (1, 4),
    ]
    for axes in cases:
        for to_front in (False, True):
            monkeypatch.setenv("QCT_SV_MOVE_DECOMP", "0")
            want = np.asarray(fast_sv._upper_move_raw(
                jnp.asarray(x), axes, NN, S, to_front))
            monkeypatch.setenv("QCT_SV_MOVE_DECOMP", "1")
            got = np.asarray(fast_sv._upper_move_raw(
                jnp.asarray(x), axes, NN, S, to_front))
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"{axes} front={to_front}")


def test_slab_engine_with_forced_move_decomposition(monkeypatch):
    """End-to-end slab engine correctness with the decomposed moves on."""
    monkeypatch.setenv("QCT_SV_MOVE_DECOMP", "1")
    gates = _circuit()
    want = _reference_state(gates, N)
    sv = FastStatevector(N, fusion_mode="slab")
    sv.run(gates)
    assert not sv._layout_is_identity()
    np.testing.assert_allclose(np.asarray(sv.probs()), np.abs(want) ** 2,
                               atol=2e-6)
    sv2 = FastStatevector(N, fusion_mode="slab")
    sv2.run_compiled(gates)
    np.testing.assert_allclose(np.asarray(sv2.probs()), np.abs(want) ** 2,
                               atol=2e-6)
