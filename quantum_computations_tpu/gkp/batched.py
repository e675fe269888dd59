"""Per-gadget-jit batched GKP runner.

:class:`.compiled.CompiledGKP` traces a WHOLE circuit into one XLA program —
ideal steady-state throughput, but compile time grows with circuit depth and
every random circuit is a fresh compile. This runner instead jits one
executor per (gadget kind, chain-shape signature) and reuses it across
layers, circuits and sweeps: a depth-20 RB sweep compiles ~6 small programs
total instead of one huge program per random circuit.

Structure:
- gadget executors are jitted, vmapped pure functions over batched MPS
  tensors + per-trajectory real parameter arrays (angles, syndrome signs,
  Bell phases) + PRNG keys;
- the Pauli frame, layer syndromes and classical feed-forward live on the
  HOST as small NumPy integer arrays (syndromes are fetched per gadget —
  int/real transfers work on every backend; complex tensors never leave the
  device);
- readout (logical rho + syndrome correction) is one more cached executor.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..config import SVDOptions, complex_dtype
from ..cv import gates as cvg
from ..cv.mps import MPS
from ..dv import gates as dv_gates
from ..dv.simulator import ClassicalControl
from ..ops.fused_gadget import (fused_pair_measure2, fused_single_gadget,
                                pair_measure_path)
from ..utils import as_key
from ..utils.profiling import span
from .compiled import ARCTAN2, _homodyne, _insert_bell, _syndrome_from, _two_mode_gadget
from .gates import MB2Type
from .transpiler import MBGKPCircuit
from .utils import full_logical_density_mps

SQPI = np.sqrt(np.pi)

# Fused single-mode gadgets (Bell + BS + both homodynes in ONE executor with
# no SVD at all — ops/fused_gadget.py). Default ON; QCT_FUSED_SINGLE=0
# restores the split bell/BS-SVD/homodyne op path for A/B comparison.
_FUSED_SINGLE_DEFAULT = os.environ.get("QCT_FUSED_SINGLE", "1") == "1"
# Fused measure-out of the macronode's last two beamsplitters (each followed
# by homodynes on both operands — fused_pair_measure2). QCT_FUSED_PAIR=0
# restores the streamed-BS + homodyne op path.
_FUSED_PAIR_DEFAULT = os.environ.get("QCT_FUSED_PAIR", "1") == "1"
# Host-side incremental bond-rank tracking (kills the per-op full-chain
# rank fetch — a device sync + whole-state HBM scan, ~7% of trajectory time
# in the round-3 attribution). QCT_RANK_TRACK=0 restores full fetches.
_RANK_TRACK_DEFAULT = os.environ.get("QCT_RANK_TRACK", "1") == "1"


class BatchedGKP:
    def __init__(self, qs, ancilla_epsilon, svd_options: SVDOptions | dict | None = None,
                 *, adaptive: bool = False, granularity: str = "gadget",
                 fused_single: bool | None = None,
                 fused_pair: bool | None = None,
                 track_ranks: bool | None = None):
        """adaptive=True enables rank-adaptive bond trimming: true bond ranks
        are measured on-device (integer fetch), the batch-maximum is bucketed,
        and tensors are sliced by cached executors. This restores dynamic-rank
        memory behaviour on accelerators (static caps at chi=100, d=1000 would
        not fit HBM) at the price of extra compiles for new shape signatures.

        granularity: "gadget" jits one executor per MB gadget (fewest host
        round-trips); "op" jits one executor per CV operation with trimming
        BETWEEN ops — required at production bond dimensions, where a whole
        macronode gadget at static caps materialises a (chi, d, d, chi)
        tensor (80 GB at chi=100, d=1000) regardless of the true ranks.

        fused_single (default: QCT_FUSED_SINGLE env, on): run every
        single-mode gadget through the SVD-free fused executor
        (ops/fused_gadget.py) regardless of granularity — one dispatch, no
        truncation, shape-preserving."""
        if granularity not in ("gadget", "op"):
            raise ValueError(granularity)
        self.qs = np.asarray(qs)
        self.epsilon = ancilla_epsilon
        if isinstance(svd_options, dict):
            svd_options = SVDOptions(**svd_options)
        self.opts = svd_options or SVDOptions()
        self.adaptive = adaptive
        self.granularity = granularity
        self.fused_single = (_FUSED_SINGLE_DEFAULT if fused_single is None
                             else bool(fused_single))
        self.fused_pair = (_FUSED_PAIR_DEFAULT if fused_pair is None
                           else bool(fused_pair))
        self.track_ranks = (_RANK_TRACK_DEFAULT if track_ranks is None
                            else bool(track_ranks))
        # Host-side measured bond ranks (bond j = right bond of tensor j),
        # maintained incrementally by the op executors during run_circuit.
        # Valid only on the production op path, where every rank-changing op
        # is immediately followed by a targeted trim:
        # - Bell splices insert structurally FULL bonds (identity-kron —
        #   every column nonzero regardless of the chain data) and modify no
        #   existing tensor, so no rank changes and no trim is needed;
        # - the streamed BS split returns its new bond rank on the host
        #   already (the other operand's bond is unitarily invariant, and
        #   zero-masked columns propagate to exact zeros);
        # - fused pair-measures piggyback the absorbed neighbour's bond rank
        #   on the measurement fetch that already syncs;
        # - fused single gadgets act on the physical axis only (bond axes
        #   carried through einsums), so the zero-column mask — which is
        #   what the rank fetch measures — is preserved exactly.
        self._ranks: list[int] | None = None
        self._cache: dict = {}

    @property
    def _tracking_active(self) -> bool:
        return (self.track_ranks and self.adaptive
                and self.granularity == "op"
                and self.fused_single and self.fused_pair)

    def _eps_arr(self, batch: int) -> np.ndarray:
        """Per-trajectory epsilon as a TRACED executor argument.

        epsilon enters compiled programs as data, not as a baked constant,
        so one compiled executor set serves every dB value of a sweep (the
        round-3 attribution showed per-dB recompiles costing ~6 min each).
        float64 here: under x64 (tests) precision is preserved; otherwise
        JAX casts to f32 at the jit boundary.
        """
        return np.full((batch,), self.epsilon, np.float64)

    # ------------------------------------------------------------------
    def _shapes(self, tensors) -> tuple:
        return tuple(t.shape[1:] for t in tensors)  # strip batch axis

    def _get(self, key, builder):
        fn = self._cache.get(key)
        if fn is None:
            fn = jax.jit(jax.vmap(builder))
            self._cache[key] = fn
        return fn

    # ------------------------------------------------------------------
    def _single(self, tensors, idx, meas_a2, syn_a1, syn_a2, bell_phase, keys,
                *, a1, a1_zero):
        """Single-mode gadget executor (I/P/T family and H).

        a1 (static) is the first measured angle; syn_a1/syn_a2 (per-trajectory
        arrays) enter the syndrome formula — they differ from the measured
        angles only for Pauli-frame-flipped T gadgets.
        """
        if self.fused_single:
            return self._single_fused(tensors, idx, meas_a2, syn_a1, syn_a2,
                                      bell_phase, keys, a1=a1)
        if self.granularity == "op":
            return self._single_ops(tensors, idx, meas_a2, syn_a1, syn_a2,
                                    bell_phase, keys, a1=a1, a1_zero=a1_zero)
        sig = ("single", idx, a1, a1_zero, self._shapes(tensors))

        def body(tensor_tuple, m_a2, s_a1, s_a2, b_phase, e, key):
            mps = MPS(self.qs, list(tensor_tuple))
            coeff = jnp.exp(1j * b_phase)
            k1, k2, k3, k4 = jax.random.split(key, 4)
            _insert_bell(mps, idx + 1, coeff, e, self.opts, k1)
            cvg.BS(idx, idx + 1).apply(mps, key=k2, svd_options=self.opts)
            m_first = _homodyne(mps, idx, a1, k3, static_zero=a1_zero)
            m_second = _homodyne(mps, idx, m_a2, k4)
            s = _syndrome_from(s_a1, s_a2, m_first, m_second)
            return tuple(mps.tensors), jnp.stack([s[0], s[1]])

        fn = self._get(sig, body)
        out_tensors, synd = fn(tuple(tensors), meas_a2, syn_a1, syn_a2, bell_phase,
                               self._eps_arr(tensors[0].shape[0]), keys)
        return list(out_tensors), synd

    def _single_fused(self, tensors, idx, meas_a2, syn_a1, syn_a2, bell_phase,
                      keys, *, a1):
        """SVD-free fused single-mode gadget executor (ops/fused_gadget.py).

        ONE jitted program per (idx, a1, chain-shape) signature: Bell vectors
        from traced epsilon, both homodynes sampled on-device, syndrome
        arithmetic in-program. Shape-preserving — the teleported output mode
        has the input mode's exact bond shape, so no post-gadget trim is
        needed and the executor cache sees no new signatures from it.
        """
        sig = ("fused_single", idx, float(a1), self._shapes(tensors))

        def body(tensor_tuple, m_a2, s_a1, s_a2, b_phase, e, key):
            from ..cv.states import State as CVState

            qs = jnp.asarray(self.qs)
            zero = CVState.GKP_ZERO.eval(qs, e)
            one = CVState.GKP_ONE.eval(qs, e)
            c1 = jnp.exp(1j * b_phase).astype(complex_dtype())
            bell = jnp.stack([2 ** (-1 / 4) * zero, 2 ** (-1 / 4) * c1 * one],
                             axis=-1)
            new_tensors, m1, m2 = fused_single_gadget(
                list(tensor_tuple), idx, self.qs, bell, a1, m_a2, key)
            s = _syndrome_from(s_a1, s_a2, m1, m2)
            return tuple(new_tensors), jnp.stack([s[0], s[1]])

        fn = self._get(sig, body)
        with span("op:fused_single"):
            out_tensors, synd = fn(
                tuple(tensors), jnp.asarray(meas_a2), jnp.asarray(syn_a1),
                jnp.asarray(syn_a2), jnp.asarray(bell_phase),
                self._eps_arr(tensors[0].shape[0]), keys)
        return list(out_tensors), synd

    # -- op-level executors (granularity="op") --------------------------
    def _maybe_trim(self, tensors):
        return self._trim_tensors(tensors) if self.adaptive else tensors

    def _op_insert_bell(self, tensors, idx, bell_phase, keys):
        sig = ("op_bell", idx, self._shapes(tensors))

        def body(tt, ph, e, key):
            mps = MPS(self.qs, list(tt))
            _insert_bell(mps, idx, jnp.exp(1j * ph), e, self.opts, key)
            return tuple(mps.tensors)

        with span("op:bell"):
            out = self._get(sig, body)(tuple(tensors), bell_phase,
                                       self._eps_arr(tensors[0].shape[0]), keys)
        out = list(out)
        if self._ranks is not None:
            # Splice tensors are identity-kron over the pass-through bond:
            # every column of both new bonds is nonzero (the Bell coefficient
            # is a unit phase), so the measured rank equals the capacity and
            # a trim is provably a no-op. No existing tensor is modified.
            if idx < len(tensors):  # front/middle insert
                self._ranks[idx:idx] = [int(out[idx].shape[-1]),
                                        int(out[idx + 1].shape[-1])]
            else:
                # append: the new bonds are (old-last <-> b_left), measured
                # from the unchanged old last tensor (edge capacity 1), and
                # (b_left <-> b_right)
                self._ranks.extend([int(out[idx - 1].shape[-1]),
                                    int(out[idx].shape[-1])])
            return out
        return self._maybe_trim(out)

    def _op_bs(self, tensors, i, j, keys):
        li, ri = (i, j) if i < j else (j, i)
        t1, t2 = tensors[li], tensors[ri]
        _, a, d, _ = t1.shape
        b = t2.shape[-1]
        if cvg._use_streamed(a, d, b, True, self.opts):
            # Oversize contraction: stream the contraction+rotation+SVD from
            # host-driven split programs (cv gates `_pair_transform_split`'s
            # streamed branch, batched). Angle sign follows cvg.BS.apply.
            from ..ops.streamed import effective_power_iters, streamed_pair_svd_batched

            angle = float(jnp.pi / 4) * (-1) ** (i > j)
            cap = min(self.opts.max_bond_dim, a * d, d * b)
            # Saturation signal for the "auto" q policy: when any operand
            # bond already sits at max_bond_dim (the sliced shapes ARE the
            # tracked ranks on the adaptive path), truncation is binding and
            # the cutoff spectrum is flat — use the reference-strength
            # sketch; otherwise the cheap q=2 sketch is ample (round-3
            # shallow adjudication, rb_q2_anchor.dat).
            sat = max(a, b, t1.shape[-1]) >= self.opts.max_bond_dim
            q = effective_power_iters(
                7 if cap + 10 < 0.1 * min(a * d, d * b) else 4, saturated=sat)
            with span("op:bs_streamed"):
                m1, m2, _rank = streamed_pair_svd_batched(
                    t1, t2, self.qs, ("rot", angle),
                    max_bond_dim=self.opts.max_bond_dim,
                    abs_err=self.opts.abs_err, rel_err=self.opts.rel_err,
                    keys=keys, power_iters=q,
                )
            out = list(tensors)
            out[li], out[ri] = m1, m2
            if self._ranks is not None:
                # The split's kept rank arrives on the host with the factors
                # (streamed_pair_svd_batched returns it); the right operand's
                # own right bond is unitarily invariant under the pair gate
                # and zero-masked columns map to exact zeros.
                self._ranks[li] = max(1, int(np.max(_rank)))
                return self._trim_with_ranks(out)
            return self._maybe_trim(out)
        sig = ("op_bs", i, j, self._shapes(tensors))

        def body(tt, key):
            mps = MPS(self.qs, list(tt))
            cvg.BS(i, j).apply(mps, key=key, svd_options=self.opts)
            return tuple(mps.tensors)

        with span("op:bs"):
            out = self._get(sig, body)(tuple(tensors), keys)
        out = list(out)
        if self._ranks is not None:
            self._ranks[li] = self._bond_rank_single(out, li)
            return self._trim_with_ranks(out)
        return self._maybe_trim(out)

    def _op_homodyne(self, tensors, idx, angles, keys, *, a_zero: bool):
        sig = ("op_hom", idx, a_zero, self._shapes(tensors))

        def body(tt, a, key):
            mps = MPS(self.qs, list(tt))
            m = _homodyne(mps, idx, a, key, static_zero=a_zero)
            return tuple(mps.tensors), m

        with span("op:homodyne"):
            out_t, m = self._get(sig, body)(tuple(tensors), angles, keys)
        with span("op:homodyne_fetch"):
            m = np.asarray(m)
        return self._maybe_trim(list(out_t)), m

    @staticmethod
    def _syndrome_np(ta, tb, ma, mb):
        """Byproduct syndrome on host numpy arrays (per-trajectory)."""
        mu = 1j * (ma * np.exp(1j * tb) + mb * np.exp(1j * ta)) / np.sin(ta - tb)
        vec = np.stack([mu.real, mu.imag], axis=-1) * 2**0.5
        return (np.round(vec / SQPI).astype(np.int32) % 2)

    @staticmethod
    def _split_batch_keys(keys, n):
        """Per-trajectory key batch -> n per-op key batches."""
        arr = jax.vmap(lambda k: jax.random.split(k, n))(keys)
        return [arr[:, i, :] for i in range(n)]

    def _single_ops(self, tensors, idx, meas_a2, syn_a1, syn_a2, bell_phase, keys,
                    *, a1, a1_zero):
        """Single-mode gadget composed of op-level executors with trims."""
        batch = len(np.asarray(meas_a2))
        keysets = self._split_batch_keys(keys, 4)
        ones = np.ones(batch, np.float32)
        tensors = self._op_insert_bell(tensors, idx + 1, bell_phase, keysets[0])
        tensors = self._op_bs(tensors, idx, idx + 1, keysets[1])
        tensors, m_a = self._op_homodyne(tensors, idx, a1 * ones, keysets[2], a_zero=a1_zero)
        tensors, m_b = self._op_homodyne(tensors, idx, np.asarray(meas_a2), keysets[3], a_zero=False)
        synd = self._syndrome_np(np.asarray(syn_a1, np.float64), np.asarray(syn_a2, np.float64),
                                 m_a.astype(np.float64), m_b.astype(np.float64))
        return tensors, synd

    def _op_fused_pair(self, tensors, m, a1, a2, keys):
        """Fused BS(m, m+1) + homodynes on both pair modes (static angles)."""
        shapes = self._shapes(tensors)
        L0 = len(tensors)
        # Absorb target (shape-static — mirrors fused_pair_measure2's
        # smaller-intermediate rule): index in the NEW (pair-removed) list.
        a_dim, c_dim = shapes[m][0], shapes[m + 1][-1]
        has_left, has_right = m > 0, m + 2 < L0
        p = m - 1 if (has_left and (a_dim >= c_dim or not has_right)) else m
        # Only the absorbed tensor is modified, so only its right bond's
        # measured rank can change; piggyback that rank on the measurement
        # fetch (which syncs anyway) instead of a separate full-chain fetch.
        want_rank = self._ranks is not None and p < L0 - 3
        sig = ("fused_pair", m, float(a1), float(a2), shapes, want_rank)
        # Span label carries the executor's static path choice (single
        # source of truth: fused_gadget.pair_measure_path — includes the
        # prerot reroute) so on-chip attribution separates the very
        # different cost profiles.
        path = pair_measure_path(a1, a2)

        def body(tt, key):
            new_tensors, m1, m2 = fused_pair_measure2(
                list(tt), m, self.qs, a1, a2, key)
            ms = jnp.stack([m1, m2])
            if not want_rank:
                return tuple(new_tensors), ms
            t = new_tensors[p]
            norms = jnp.sum(jnp.abs(t) ** 2, axis=(0, 1))
            r = jnp.max(jnp.where(norms > 0, jnp.arange(t.shape[-1]) + 1, 0))
            return tuple(new_tensors), ms, r

        fn = self._get(sig, body)
        with span(f"op:fused_pair[{path}]"):
            res = fn(tuple(tensors), keys)
        with span(f"op:fused_pair_fetch[{path}]"):
            ms = np.asarray(res[1])
        out_t = list(res[0])
        if self._ranks is not None:
            rank = [max(1, int(np.max(np.asarray(res[2]))))] if want_rank else []
            nr = self._ranks
            if p == m - 1:
                self._ranks = nr[:m - 1] + rank + nr[m + 2:]
            else:
                self._ranks = nr[:m] + rank + nr[m + 3:]
            return self._trim_with_ranks(out_t), ms[:, 0], ms[:, 1]
        return self._maybe_trim(out_t), ms[:, 0], ms[:, 1]

    def _two_ops(self, tensors, idx, mb2type: MB2Type, keys):
        """Macronode gadget composed of op-level executors with trims.

        Between-op trimming keeps every BS contraction at true-rank sizes —
        at production parameters the whole-gadget executor would materialise
        (cap, d, d, cap) regardless of data. With ``fused_pair`` the third and
        fourth beamsplitters (whose operands are both measured immediately)
        run through the SVD-free fused pair-measure executor instead of a
        streamed split + two homodyne ops."""
        ta, tc, tb, td = mb2type.angles()
        batch_probe = tensors[0].shape[0]
        ones = np.ones(batch_probe, np.float32)
        ks = self._split_batch_keys(keys, 10)
        tensors = self._op_insert_bell(tensors, idx, 0.0 * ones, ks[0])
        tensors = self._op_insert_bell(tensors, idx + 4, 0.0 * ones, ks[1])
        tensors = self._op_bs(tensors, idx + 2, idx + 1, ks[2])
        tensors = self._op_bs(tensors, idx + 3, idx + 4, ks[3])
        if self.fused_pair:
            tensors, m_a, m_c = self._op_fused_pair(tensors, idx + 2, ta, tc, ks[4])
            tensors, m_b, m_d = self._op_fused_pair(tensors, idx + 1, tb, td, ks[7])
        else:
            tensors = self._op_bs(tensors, idx + 2, idx + 3, ks[4])
            tensors, m_a = self._op_homodyne(tensors, idx + 2, ta * ones, ks[5], a_zero=(ta == 0.0))
            tensors, m_c = self._op_homodyne(tensors, idx + 2, tc * ones, ks[6], a_zero=(tc == 0.0))
            tensors = self._op_bs(tensors, idx + 1, idx + 2, ks[7])
            tensors, m_b = self._op_homodyne(tensors, idx + 1, tb * ones, ks[8], a_zero=(tb == 0.0))
            tensors, m_d = self._op_homodyne(tensors, idx + 1, td * ones, ks[9], a_zero=(td == 0.0))

        ma, mb_, mc, md = (x.astype(np.float64) for x in (m_a, m_b, m_c, m_d))
        mu_ab = 1j * (ma * np.exp(1j * tb) + mb_ * np.exp(1j * ta)) / np.sin(ta - tb)
        mu_cd = 1j * (mc * np.exp(1j * td) + md * np.exp(1j * tc)) / np.sin(tc - td)
        out = []
        for mu in (mu_cd + mu_ab, mu_cd - mu_ab):
            vec = np.stack([mu.real, mu.imag], axis=-1)
            out.append(np.round(vec / SQPI).astype(np.int32) % 2)
        synd = np.stack(out, axis=1)  # (batch, 2, 2)
        return tensors, synd

    def _two(self, tensors, idx, mb2type: MB2Type, keys):
        if self.granularity == "op" or self.fused_pair:
            return self._two_ops(tensors, idx, mb2type, keys)
        sig = ("two", idx, mb2type, self._shapes(tensors))

        def body(tensor_tuple, e, key):
            mps = MPS(self.qs, list(tensor_tuple))
            (s1, s2) = _two_mode_gadget(mps, idx, mb2type, False, e, self.opts, key)
            return tuple(mps.tensors), jnp.stack([
                jnp.stack([s1[0], s1[1]]), jnp.stack([s2[0], s2[1]]),
            ])

        fn = self._get(sig, body)
        out_tensors, synd = fn(tuple(tensors), self._eps_arr(tensors[0].shape[0]), keys)
        return list(out_tensors), synd

    # ------------------------------------------------------------------
    def _bond_ranks(self, tensors) -> np.ndarray:
        """Batch-max true rank of every bond (truncated directions are exact
        zeros, so rank = highest nonzero bond column + 1)."""
        sig = ("ranks", self._shapes(tensors))

        def body(*tensor_tuple):
            out = []
            for t in tensor_tuple[:-1]:
                # t: (batch, l, d, r); column norms over the RIGHT bond
                norms = jnp.sum(jnp.abs(t) ** 2, axis=(1, 2))  # (batch, r)
                idx = jnp.arange(t.shape[-1])[None, :]
                rank = jnp.max(jnp.where(norms > 0, idx + 1, 0))
                out.append(rank)
            return jnp.stack(out) if out else jnp.zeros((0,), jnp.int32)

        fn = self._cache.get(sig)
        if fn is None:
            fn = jax.jit(body)  # operates on full batched tensors (no vmap)
            self._cache[sig] = fn
        with span("op:rank_fetch"):
            return np.asarray(fn(*tensors))

    @staticmethod
    def _trim_bucket(n: int) -> int:
        """Finer buckets than powers of two: 1,2,4,8,16 then multiples of 16.

        At production bond dimensions the power-of-two jump (33 -> 64) doubles
        the memory of every downstream (chi d)^2 contraction."""
        if n <= 16:
            return 1 << (max(1, n) - 1).bit_length()
        return ((n + 15) // 16) * 16

    def _slice_bonds(self, tensors, new):
        """Slice every bond to the sizes in ``new`` via a cached executor."""
        sig = ("trim", self._shapes(tensors), tuple(new))

        def body(*tensor_tuple):
            out = []
            for i, t in enumerate(tensor_tuple):
                l = new[i - 1] if i > 0 else t.shape[1]
                r = new[i] if i < len(tensor_tuple) - 1 else t.shape[3]
                out.append(t[:, :l, :, :r])
            return tuple(out)

        fn = self._cache.get(sig)
        if fn is None:
            fn = jax.jit(body)
            self._cache[sig] = fn
        with span("op:trim"):
            return list(fn(*tensors))

    def _trim_tensors(self, tensors):
        """Slice all bonds down to bucketed batch-max true ranks."""
        if len(tensors) < 2:
            return tensors
        ranks = self._bond_ranks(tensors)
        caps = [int(t.shape[-1]) for t in tensors[:-1]]
        new = [min(c, self._trim_bucket(max(1, int(r)))) for r, c in zip(ranks, caps)]
        if all(n == c for n, c in zip(new, caps)):
            return tensors
        return self._slice_bonds(tensors, new)

    def _trim_with_ranks(self, tensors):
        """Targeted trim from host-tracked measured bond ranks — no device
        sync, no whole-state HBM scan (the tracked ranks reproduce exactly
        what :meth:`_bond_ranks` would measure; see __init__)."""
        if len(tensors) < 2:
            return tensors
        if len(self._ranks) != len(tensors) - 1:
            raise RuntimeError(
                f"rank tracker out of sync: {len(self._ranks)} tracked bonds "
                f"for a {len(tensors)}-tensor chain")
        caps = [int(t.shape[-1]) for t in tensors[:-1]]
        new = [min(c, self._trim_bucket(max(1, int(r))))
               for r, c in zip(self._ranks, caps)]
        if all(n == c for n, c in zip(new, caps)):
            return tensors
        return self._slice_bonds(tensors, new)

    def _bond_rank_single(self, tensors, j) -> int:
        """Batch-max measured rank of bond ``j`` only (reads ONE tensor)."""
        sig = ("rank1", tensors[j].shape[1:])

        def body(t):
            norms = jnp.sum(jnp.abs(t) ** 2, axis=(1, 2))  # (batch, r)
            idx = jnp.arange(t.shape[-1])[None, :]
            return jnp.max(jnp.where(norms > 0, idx + 1, 0))

        fn = self._cache.get(sig)
        if fn is None:
            fn = jax.jit(body)
            self._cache[sig] = fn
        with span("op:rank1_fetch"):
            return max(1, int(fn(tensors[j])))

    # ------------------------------------------------------------------
    def init_tensors(self, coeffs: np.ndarray, batch: int):
        """Batched initial product state from (N,2,2) real logical coeffs."""
        from ..cv.states import State as CVState

        sig = ("init", coeffs.shape, batch)

        def body(c, e):
            # coeffs and epsilon are TRACED (not baked): the executor is
            # reusable across dB values and initial logical states.
            qs = jnp.asarray(self.qs)
            tensors = []
            for i in range(coeffs.shape[0]):
                a = c[i, 0, 0] + 1j * c[i, 0, 1]
                b = c[i, 1, 0] + 1j * c[i, 1, 1]
                psi = CVState.GKP_ZERO.eval(qs, e) * a \
                    + CVState.GKP_ONE.eval(qs, e) * b
                norm = jnp.sqrt(jnp.sum(jnp.abs(psi) ** 2) * (qs[1] - qs[0]))
                tensors.append((psi / norm).reshape(1, -1, 1))
            return tuple(tensors)

        fn = self._get(sig, body)
        c_b = np.broadcast_to(np.asarray(coeffs, np.float64),
                              (batch,) + tuple(coeffs.shape))
        with span("init"):
            return list(fn(c_b, self._eps_arr(batch)))

    def readout(self, tensors, frames: np.ndarray):
        """Syndrome-corrected logical rho for a batch: (rho_re, rho_im).

        The rho is NOT trace-normalised — reference convention
        (``impact_.../grover.py:71-80`` scores on ``full_logical_density_mps``
        with ``normalised=False``, ``gkp_simulator/utils.py:93``): truncation-
        discarded weight shows up as trace deficit and counts as infidelity.
        Round 3 found normalising here biased RB fidelity ~+19% over the
        committed reference dataset at the (5.83 dB, depth 8) anchor.
        """
        N = int(np.log2(2) * 0 + len(frames[0]))  # frames (n, N, 2)
        sig = ("readout", self._shapes(tensors))

        def body(tensor_tuple, frame):
            mps = MPS(self.qs, list(tensor_tuple))
            rho = full_logical_density_mps(mps)
            X = jnp.array([[0.0, 1.0], [1.0, 0.0]], dtype=rho.dtype)
            Z = jnp.array([[1.0, 0.0], [0.0, -1.0]], dtype=rho.dtype)
            I2 = jnp.eye(2, dtype=rho.dtype)
            corr = jnp.ones((1, 1), dtype=rho.dtype)
            for i in range(len(tensor_tuple)):
                m = jnp.where(frame[i, 1] == 1, Z, I2)
                m = jnp.where(frame[i, 0] == 1, X @ m, m)
                corr = jnp.kron(corr, m)
            rho = corr @ rho @ corr.conj().T
            return rho.real, rho.imag

        fn = self._get(sig, body)
        with span("readout"):
            return fn(tuple(tensors), jnp.asarray(frames, jnp.int32))

    # ------------------------------------------------------------------
    def run_circuit(self, circuit: MBGKPCircuit, coeffs: np.ndarray, batch: int,
                    rng_seed=0, data_sharding=None):
        """Run `batch` trajectories of a transpiled circuit.

        ``data_sharding`` (a ``jax.sharding.Sharding`` over the batch axis)
        places the initial tensors on a device mesh; every op executor then
        propagates the batch sharding (GSPMD), so trajectories run
        data-parallel across the mesh while the Pauli frame stays on host.

        Returns (tensors [batched], frames (batch, N, 2) numpy).
        """
        N = circuit._N
        key = as_key(rng_seed)
        tensors = self.init_tensors(np.asarray(coeffs, np.float32), batch)
        if data_sharding is not None:
            tensors = [jax.device_put(t, data_sharding) for t in tensors]
        # product initial state: every bond has capacity (and rank) 1
        self._ranks = [1] * (N - 1) if self._tracking_active else None
        try:
            return self._run_layers(circuit, tensors, batch, key)
        finally:
            self._ranks = None  # circuit-scoped; do not leak across calls

    def _run_layers(self, circuit, tensors, batch, key):
        N = circuit._N
        frame = np.zeros((batch, N, 2), dtype=np.int32)
        prev_synd = np.zeros((batch, N, 2), dtype=np.int32)
        ones = np.ones(batch, np.float32)

        for layer in circuit._layers:
            cur_synd = np.zeros((batch, N, 2), dtype=np.int32)
            for gate in layer.gates:
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, batch)

                if isinstance(gate, ClassicalControl):
                    idx = gate.gate.indices[0]
                    cond = prev_synd[:, idx, 0]
                    dg = isinstance(gate.gate, dv_gates.Pdg)
                    p_angle = -ARCTAN2 if dg else ARCTAN2
                    a2 = np.where(cond == 1, p_angle, np.pi / 2).astype(np.float32)
                    frame[:, idx, 1] ^= cond & frame[:, idx, 0]
                    tensors, synd = self._single(
                        tensors, idx, a2, 0.0 * ones, a2, 0.0 * ones, keys,
                        a1=0.0, a1_zero=True)
                    with span("op:synd_fetch"):
                        cur_synd[:, idx, :] = np.asarray(synd)
                    if self.adaptive and not self.fused_single:
                        tensors = self._trim_tensors(tensors)
                    continue

                t = type(gate)
                if t in (dv_gates.T, dv_gates.Tdg):
                    idx = gate.indices[0]
                    base = -1.0 if t is dv_gates.Tdg else 1.0
                    sgn = np.where(frame[:, idx, 0] == 1, -base, base).astype(np.float32)
                    tensors, synd = self._single(
                        tensors, idx, (np.pi / 2) * ones, 0.0 * ones,
                        sgn * np.pi / 2, sgn * np.pi / 8, keys,
                        a1=0.0, a1_zero=True)
                    with span("op:synd_fetch"):
                        cur_synd[:, idx, :] = np.asarray(synd)
                    if self.adaptive and not self.fused_single:
                        tensors = self._trim_tensors(tensors)
                    continue

                # frame commutation for static Clifford gates
                if t is dv_gates.H:
                    idx = gate.indices[0]
                    frame[:, idx, :] = frame[:, idx, ::-1]
                elif t in (dv_gates.P, dv_gates.Pdg):
                    idx = gate.indices[0]
                    frame[:, idx, 1] ^= frame[:, idx, 0]
                elif t is dv_gates.CZ:
                    i, j = gate.indices
                    zi = frame[:, i, 1] ^ frame[:, j, 0]
                    zj = frame[:, j, 1] ^ frame[:, i, 0]
                    frame[:, i, 1], frame[:, j, 1] = zi, zj
                elif t is dv_gates.SWAP:
                    i, j = gate.indices
                    frame[:, [i, j], :] = frame[:, [j, i], :]

                if t is dv_gates.I:
                    idx = gate.indices[0]
                    tensors, synd = self._single(
                        tensors, idx, (np.pi / 2) * ones, 0.0 * ones,
                        (np.pi / 2) * ones, 0.0 * ones, keys, a1=0.0, a1_zero=True)
                    with span("op:synd_fetch"):
                        cur_synd[:, idx, :] = np.asarray(synd)
                elif t is dv_gates.H:
                    idx = gate.indices[0]
                    tensors, synd = self._single(
                        tensors, idx, (-np.pi / 4) * ones, (np.pi / 4) * ones,
                        (-np.pi / 4) * ones, 0.0 * ones, keys,
                        a1=np.pi / 4, a1_zero=False)
                    with span("op:synd_fetch"):
                        cur_synd[:, idx, :] = np.asarray(synd)
                elif t in (dv_gates.P, dv_gates.Pdg):
                    idx = gate.indices[0]
                    a2 = (-ARCTAN2 if t is dv_gates.Pdg else ARCTAN2) * ones
                    tensors, synd = self._single(
                        tensors, idx, a2, 0.0 * ones, a2, 0.0 * ones, keys,
                        a1=0.0, a1_zero=True)
                    with span("op:synd_fetch"):
                        cur_synd[:, idx, :] = np.asarray(synd)
                elif t is dv_gates.CZ:
                    idx = min(gate.indices)
                    tensors, synd = self._two(tensors, idx, MB2Type.CZ, keys)
                    with span("op:synd_fetch"):
                        cur_synd[:, idx:idx + 2, :] = np.asarray(synd)
                elif t is dv_gates.SWAP:
                    idx = min(gate.indices)
                    tensors, synd = self._two(tensors, idx, MB2Type.SWAP, keys)
                    with span("op:synd_fetch"):
                        cur_synd[:, idx:idx + 2, :] = np.asarray(synd)
                else:
                    raise NotImplementedError(f"Gate {gate} not supported in batched mode.")

                # fused single gadgets are shape- and rank-preserving
                two_mode = t in (dv_gates.CZ, dv_gates.SWAP)
                if self.adaptive and (two_mode or not self.fused_single):
                    tensors = (self._trim_with_ranks(tensors)
                               if self._ranks is not None
                               else self._trim_tensors(tensors))

            frame ^= cur_synd
            frame ^= np.asarray([layer.paulis], dtype=np.int32)
            prev_synd = cur_synd

        return tensors, frame
