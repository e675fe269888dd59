"""Fully-jitted batched GKP trajectory engine (the TPU throughput path).

The eager :class:`.simulator.Simulator` resolves classical feed-forward on the
host. Here the ENTIRE measurement-based circuit — Bell insertions,
beamsplitters, stochastic homodynes, syndrome arithmetic, the Pauli frame and
the classically-controlled T corrections — is a single traceable function of
``(initial tensors, PRNG key)``:

- circuit structure (gadget sequence, chain-length evolution) is static, so
  XLA compiles one program;
- measurement randomness stays on-device (``jax.random.categorical``);
- classical control selects *parameters*, not structure: the controlled
  P/Pdg-vs-I gadget shares one shape, so the choice becomes a traced homodyne
  ANGLE (`jnp.where`), and the Pauli-frame T/Tdg flip becomes a traced sign in
  the magic-Bell coefficient;
- bond capacities stay at their static caps (no eager trimming), so the
  function vmaps over batches of keys → trajectories/sec/chip.

This has no reference counterpart — the reference runs one trajectory per
process (`multiprocessing.Pool(3)`, SURVEY.md §2.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SVDOptions, complex_dtype
from ..cv import gates as cvg
from ..cv.mps import MPS, tensor_svd
from ..cv.states import State as CVState
from ..cv.gate_abc import MeasurementResult
from ..ops import interp
from ..dv import gates as dv_gates
from ..dv.simulator import ClassicalControl
from ..utils import as_key
from .transpiler import MBGKPCircuit
from .gates import MB2Type, MBType

SQPI = np.sqrt(np.pi)
ARCTAN2 = float(np.arctan(2))


def _insert_bell(mps: MPS, idx: int, coeff1, epsilon, opts: SVDOptions, key):
    """Bell insertion with a possibly-traced second logical coefficient."""
    qs = jnp.asarray(mps.domain)
    zero = CVState.GKP_ZERO.eval(qs, epsilon)
    one = CVState.GKP_ONE.eval(qs, epsilon)
    c1 = jnp.asarray(coeff1, dtype=complex_dtype())
    bell = jnp.stack([2 ** (-1 / 4) * zero, 2 ** (-1 / 4) * c1 * one], axis=-1)
    b_left = bell[None, :, :]          # (1, d, 2)
    b_right = jnp.permute_dims(b_left, (2, 1, 0))

    if idx == 0:
        mps.tensors = [b_left, b_right] + mps.tensors
        return
    if idx == len(mps):
        mps.tensors = mps.tensors + [b_left, b_right]
        return

    # Product-segment splice: exact and SVD-free (see bell.splice_product_segment);
    # the transient 2r bond is re-truncated by the gadget's beamsplitter splits.
    from .bell import splice_product_segment

    t1 = mps[idx - 1]
    b1, b2 = b_left[0], b_right[:, :, 0]
    b1_t, b2_t = splice_product_segment(t1, b1, b2)
    mps.tensors.insert(idx, b1_t)
    mps.tensors.insert(idx + 1, b2_t)


def _homodyne(mps: MPS, idx: int, angle, key, *, static_zero: bool = False):
    """Homodyne at (possibly traced) angle; returns the traced sample."""
    if not static_zero:
        qs = jnp.asarray(mps.domain)
        mps[idx] = interp.rotation(qs, mps[idx], -angle, axis=1)
    res: MeasurementResult = cvg.Mq(idx).apply(mps, key=key)
    return res.result


def _syndrome_from(ta, tb, ma, mb):
    mu = 1j * (ma * jnp.exp(1j * tb) + mb * jnp.exp(1j * ta)) / jnp.sin(ta - tb)
    vec = jnp.stack([mu.real, mu.imag]) * 2**0.5
    return jnp.round(vec / SQPI).astype(jnp.int32) % 2


def _single_gadget(mps, idx, meas_angles, syn_angles, bell_coeff, epsilon, opts, key,
                   *, a1_zero: bool = True):
    """Walshe single-mode gadget with possibly-traced angles/Bell coefficient.

    `meas_angles` are the two homodyne angles actually measured;
    `syn_angles` the angles entering the byproduct-syndrome formula. They
    coincide for I/H/P gadgets; for a Pauli-frame-flipped T the reference
    measures at the unsigned I-angles but signs the syndrome formula
    (gkp gates.py:248-258 vs :114-127). Returns the (x, z) syndrome pair.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    _insert_bell(mps, idx + 1, bell_coeff, epsilon, opts, k1)
    cvg.BS(idx, idx + 1).apply(mps, key=k2, svd_options=opts)
    m_a = _homodyne(mps, idx, meas_angles[0], k3, static_zero=a1_zero)
    m_b = _homodyne(mps, idx, meas_angles[1], k4)
    s = _syndrome_from(syn_angles[0], syn_angles[1], m_a, m_b)
    return (s[0], s[1])


def _two_mode_gadget(mps, idx, mb2type: MB2Type, dagger: bool, epsilon, opts, key):
    """Macronode two-mode gadget (static angles). Returns two syndromes."""
    sgn = -1.0 if dagger else 1.0
    ta, tc, tb, td = [sgn * a for a in mb2type.angles()]
    ks = jax.random.split(key, 10)
    _insert_bell(mps, idx, 1.0, epsilon, opts, ks[0])
    _insert_bell(mps, idx + 4, 1.0, epsilon, opts, ks[1])
    cvg.BS(idx + 2, idx + 1).apply(mps, key=ks[2], svd_options=opts)
    cvg.BS(idx + 3, idx + 4).apply(mps, key=ks[3], svd_options=opts)
    cvg.BS(idx + 2, idx + 3).apply(mps, key=ks[4], svd_options=opts)
    m_a = _homodyne(mps, idx + 2, ta, ks[5], static_zero=(ta == 0.0))
    m_c = _homodyne(mps, idx + 2, tc, ks[6], static_zero=(tc == 0.0))
    cvg.BS(idx + 1, idx + 2).apply(mps, key=ks[7], svd_options=opts)
    m_b = _homodyne(mps, idx + 1, tb, ks[8], static_zero=(tb == 0.0))
    m_d = _homodyne(mps, idx + 1, td, ks[9], static_zero=(td == 0.0))

    mu_ab = 1j * (m_a * jnp.exp(1j * tb) + m_b * jnp.exp(1j * ta)) / jnp.sin(ta - tb)
    mu_cd = 1j * (m_c * jnp.exp(1j * td) + m_d * jnp.exp(1j * tc)) / jnp.sin(tc - td)
    out = []
    for mu in (mu_cd + mu_ab, mu_cd - mu_ab):
        vec = jnp.stack([mu.real, mu.imag])
        s = jnp.round(vec / SQPI).astype(jnp.int32) % 2
        out.append((s[0], s[1]))
    return out


class CompiledGKP:
    """Traceable trajectory executor for a transpiled :class:`MBGKPCircuit`.

    >>> prog = CompiledGKP(circuit, qs, epsilon, svd_options)
    >>> run = jax.jit(prog.trajectory)
    >>> tensors, syndrome = run(init.tensors, jax.random.PRNGKey(0))
    >>> batch = jax.vmap(lambda k: prog.trajectory(init.tensors, k))
    """

    def __init__(self, circuit: MBGKPCircuit, qs, ancilla_epsilon,
                 svd_options: SVDOptions | dict | None = None):
        self.circuit = circuit
        self.qs = np.asarray(qs)
        self.epsilon = ancilla_epsilon
        if isinstance(svd_options, dict):
            svd_options = SVDOptions(**svd_options)
        self.opts = svd_options or SVDOptions()
        self.N = circuit._N

    # -- traced frame arithmetic -------------------------------------------
    @staticmethod
    def _commute_frame(gate, frame):
        """Pauli-frame update for a *static* gate type; frame is (N,2) int32."""
        t = type(gate)
        if t in (dv_gates.H,):
            i = gate.indices[0]
            frame = frame.at[i].set(frame[i][::-1])
        elif t in (dv_gates.P, dv_gates.Pdg):
            i = gate.indices[0]
            frame = frame.at[i, 1].set(frame[i, 1] ^ frame[i, 0])
        elif t is dv_gates.CZ:
            i, j = gate.indices
            zi = frame[i, 1] ^ frame[j, 0]
            zj = frame[j, 1] ^ frame[i, 0]
            frame = frame.at[i, 1].set(zi).at[j, 1].set(zj)
        elif t is dv_gates.SWAP:
            i, j = gate.indices
            fi, fj = frame[i], frame[j]
            frame = frame.at[i].set(fj).at[j].set(fi)
        return frame

    def trajectory(self, init_tensors: list[jax.Array], key: jax.Array):
        """One full MB-GKP trajectory. Returns (tensors, (N,2) Pauli syndrome)."""
        mps = MPS(self.qs, list(init_tensors))
        key = as_key(key)
        N = self.N
        eps = self.epsilon
        opts = self.opts

        frame = jnp.zeros((N, 2), dtype=jnp.int32)
        prev_synd = jnp.zeros((N, 2), dtype=jnp.int32)  # layer - 1 gadget syndromes

        for layer in self.circuit._layers:
            cur_synd = jnp.zeros((N, 2), dtype=jnp.int32)
            for gate in layer.gates:
                key, sub = jax.random.split(key)
                if isinstance(gate, ClassicalControl):
                    # controlled P/Pdg vs I: traced angle selection
                    idx = gate.gate.indices[0]
                    cond = prev_synd[idx, 0]
                    dg = isinstance(gate.gate, dv_gates.Pdg)
                    p_angle = -ARCTAN2 if dg else ARCTAN2
                    angle2 = jnp.where(cond == 1, p_angle, np.pi / 2)
                    # frame: P/Pdg set z ^= x only when triggered
                    frame = frame.at[idx, 1].set(frame[idx, 1] ^ (cond & frame[idx, 0]))
                    x, z = _single_gadget(mps, idx, (0.0, angle2), (0.0, angle2),
                                          1.0, eps, opts, sub)
                    cur_synd = cur_synd.at[idx, 0].set(x).at[idx, 1].set(z)
                    continue

                t = type(gate)
                if t in (dv_gates.T, dv_gates.Tdg):
                    idx = gate.indices[0]
                    # Pauli frame flips T <-> Tdg (traced sign)
                    base = -1.0 if t is dv_gates.Tdg else 1.0
                    sgn = jnp.where(frame[idx, 0] == 1, -base, base)
                    bell_coeff = jnp.exp(1j * jnp.pi / 8 * sgn)
                    # MBT measures at the plain I-angles; the syndrome formula
                    # uses the dagger-signed angles (reference parity).
                    x, z = _single_gadget(
                        mps, idx, (0.0, np.pi / 2), (0.0 * sgn, sgn * np.pi / 2),
                        bell_coeff, eps, opts, sub,
                    )
                    cur_synd = cur_synd.at[idx, 0].set(x).at[idx, 1].set(z)
                    continue

                frame = self._commute_frame(gate, frame)
                if t is dv_gates.I:
                    idx = gate.indices[0]
                    x, z = _single_gadget(mps, idx, (0.0, np.pi / 2), (0.0, np.pi / 2),
                                          1.0, eps, opts, sub)
                    cur_synd = cur_synd.at[idx, 0].set(x).at[idx, 1].set(z)
                elif t is dv_gates.H:
                    idx = gate.indices[0]
                    angles = (np.pi / 4, -np.pi / 4)
                    x, z = _single_gadget(mps, idx, angles, angles, 1.0, eps, opts, sub,
                                          a1_zero=False)
                    cur_synd = cur_synd.at[idx, 0].set(x).at[idx, 1].set(z)
                elif t in (dv_gates.P, dv_gates.Pdg):
                    idx = gate.indices[0]
                    angle2 = -ARCTAN2 if t is dv_gates.Pdg else ARCTAN2
                    x, z = _single_gadget(mps, idx, (0.0, angle2), (0.0, angle2),
                                          1.0, eps, opts, sub)
                    cur_synd = cur_synd.at[idx, 0].set(x).at[idx, 1].set(z)
                elif t is dv_gates.CZ:
                    idx = min(gate.indices)
                    (s1, s2) = _two_mode_gadget(mps, idx, MB2Type.CZ, False, eps, opts, sub)
                    cur_synd = cur_synd.at[idx, 0].set(s1[0]).at[idx, 1].set(s1[1])
                    cur_synd = cur_synd.at[idx + 1, 0].set(s2[0]).at[idx + 1, 1].set(s2[1])
                elif t is dv_gates.SWAP:
                    idx = min(gate.indices)
                    (s1, s2) = _two_mode_gadget(mps, idx, MB2Type.SWAP, False, eps, opts, sub)
                    cur_synd = cur_synd.at[idx, 0].set(s1[0]).at[idx, 1].set(s1[1])
                    cur_synd = cur_synd.at[idx + 1, 0].set(s2[0]).at[idx + 1, 1].set(s2[1])
                else:
                    raise NotImplementedError(f"Gate {gate} not supported in compiled mode.")

            # end of layer: fold gadget syndromes + scheduled Paulis into frame
            frame = frame ^ cur_synd
            frame = frame ^ jnp.asarray(layer.paulis, dtype=jnp.int32)
            prev_synd = cur_synd

        return mps.tensors, frame

    def batched(self, init_mps: MPS, n: int, rng_seed=None, *, jit: bool = True):
        """Run n trajectories via vmap; returns (stacked tensors, (n,N,2) syndromes)."""
        keys = jax.random.split(as_key(rng_seed), n)
        fn = lambda k: self.trajectory(init_mps.tensors, k)
        vf = jax.vmap(fn)
        if jit:
            vf = jax.jit(vf)
        return vf(keys)

    # -- fully device-resident entry point ---------------------------------
    #
    # The axon TPU backend cannot transfer complex buffers across the
    # host<->device boundary (flaky UNIMPLEMENTED), while complex compute
    # inside a compiled program works. This entry point therefore builds the
    # initial GKP product state INSIDE the trace (state evaluation is
    # jittable) and returns only real/int outputs: the Pauli frame and the
    # syndrome-corrected logical density matrix split into (real, imag).

    def trajectory_with_readout(self, init_coeffs, key):
        """One trajectory from logical initial coefficients to corrected rho.

        init_coeffs: (N, 2) REAL-pair array [[c0_re, c0_im], ...] per mode is
        not expressive enough for two complex coefficients; instead pass
        shape (N, 2, 2): per mode [[a_re, a_im], [b_re, b_im]] with the GKP
        state a|0_gkp> + b|1_gkp>. Returns (frame, rho_re, rho_im).
        """
        from .utils import full_logical_density_mps

        qs = jnp.asarray(self.qs)
        init_coeffs = jnp.asarray(init_coeffs)
        tensors = []
        for i in range(self.N):
            a = init_coeffs[i, 0, 0] + 1j * init_coeffs[i, 0, 1]
            b = init_coeffs[i, 1, 0] + 1j * init_coeffs[i, 1, 1]
            psi = CVState.GKP_ZERO.eval(qs, self.epsilon) * a \
                + CVState.GKP_ONE.eval(qs, self.epsilon) * b
            norm = jnp.sqrt(jnp.sum(jnp.abs(psi) ** 2) * (qs[1] - qs[0]))
            tensors.append((psi / norm).reshape(1, -1, 1))

        out_tensors, frame = self.trajectory(tensors, key)
        rho = full_logical_density_mps(MPS(self.qs, out_tensors))

        # Syndrome correction C = kron_i X^x Z^z as traced selection.
        X = jnp.array([[0.0, 1.0], [1.0, 0.0]], dtype=rho.dtype)
        Z = jnp.array([[1.0, 0.0], [0.0, -1.0]], dtype=rho.dtype)
        I2 = jnp.eye(2, dtype=rho.dtype)
        corr = jnp.ones((1, 1), dtype=rho.dtype)
        for i in range(self.N):
            m = jnp.where(frame[i, 1] == 1, Z, I2)
            m = jnp.where(frame[i, 0] == 1, X @ m, m)
            corr = jnp.kron(corr, m)
        rho = corr @ rho @ corr.conj().T
        # raw (trace-unnormalised) rho: reference convention, see
        # BatchedGKP.readout docstring / reference grover.py:71-80
        return frame, rho.real, rho.imag

    def batched_readout(self, init_coeffs, n: int, rng_seed=None):
        """n trajectories -> (frames (n,N,2), rho_re, rho_im (n,2^N,2^N)).

        All inputs/outputs are real or integer arrays — safe for backends
        without complex host transfer.
        """
        keys = jax.random.split(as_key(rng_seed), n)
        init_coeffs = jnp.asarray(np.asarray(init_coeffs, dtype=np.float32))
        fn = jax.jit(jax.vmap(lambda k: self.trajectory_with_readout(init_coeffs, k)))
        return fn(keys)


def logical_coeffs(dv_states) -> np.ndarray:
    """(N, 2, 2) real init-coefficient array from DV State enums."""
    from ..dv.states import State as DVState

    mapping = {
        DVState.ZERO: (1, 0), DVState.ONE: (0, 1),
        DVState.PLUS: (2**-0.5, 2**-0.5), DVState.MINUS: (2**-0.5, -(2**-0.5)),
        DVState.T: (2**-0.5, 2**-0.5 * np.exp(1j * np.pi / 4)),
        DVState.TDG: (2**-0.5, 2**-0.5 * np.exp(-1j * np.pi / 4)),
        DVState.H: (np.cos(np.pi / 8), np.sin(np.pi / 8)),
    }
    out = np.zeros((len(dv_states), 2, 2), dtype=np.float32)
    for i, s in enumerate(dv_states):
        a, b = mapping[s]
        out[i, 0] = (np.real(a), np.imag(a))
        out[i, 1] = (np.real(b), np.imag(b))
    return out
