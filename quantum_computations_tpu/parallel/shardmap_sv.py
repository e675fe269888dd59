"""Explicit-collective sharded statevector (shard_map + all_to_all).

The GSPMD engine (:mod:`.statevector`) lets the XLA partitioner choose the
communication. This engine makes the distributed-statevector design explicit
— the standard index-swap scheme of distributed simulators (cf. mpiQulacs,
arXiv:2203.16044), expressed with jax collectives over ICI:

- the 2^N state lives as a (D, 2^(N-k)) array over a 1-D mesh of D = 2^k
  devices; the k device-index bits are GLOBAL qubit slots, the remaining
  N-k bits LOCAL slots;
- gates on local slots are pure per-device contractions (zero communication);
- a gate on a global slot first SWAPS that slot with a local slot via one
  pairwise `lax.all_to_all` (each device exchanges half its block with the
  partner differing in that device bit) — the swap is LAZY: the engine keeps
  the new layout and only updates its logical→physical permutation table, so
  repeated gates on formerly-global qubits pay no further communication.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import PRECISION, complex_dtype
from .mesh import data_mesh


def _pair_groups(k: int, bit: int) -> list[list[int]]:
    """Device-id pairs differing only in device bit `bit` (0 = MSB of k bits)."""
    D = 1 << k
    shift = k - 1 - bit
    groups = []
    seen = set()
    for d in range(D):
        if d in seen:
            continue
        partner = d ^ (1 << shift)
        groups.append([d, partner])
        seen.add(d)
        seen.add(partner)
    return groups


class ShardMapStateVector:
    """N-qubit statevector over D=2^k devices with explicit collectives.

    `self.slot_of[q]` gives the current physical slot of logical qubit q:
    slots 0..k-1 are device bits (MSB first), slots k..N-1 local bits.
    """

    def __init__(self, N: int, mesh: Mesh | None = None):
        self.mesh = mesh if mesh is not None else data_mesh()
        (self.D,) = (int(np.prod(self.mesh.devices.shape)),)
        self.k = int(np.log2(self.D))
        assert 2**self.k == self.D, "device count must be a power of two"
        self.N = N
        self.L = N - self.k
        self.axis = self.mesh.axis_names[0]
        self.slot_of = list(range(N))  # identity layout initially
        # read once at construction, same point as FastStatevector
        # (dv/fast_sv.py __init__) so the toggle semantics match
        self.plan_windows = os.environ.get("QCT_SV_PLAN", "1") != "0"
        self._sharding = NamedSharding(self.mesh, P(self.axis))

        @partial(jax.jit, out_shardings=self._sharding)
        def init():
            flat = jnp.zeros((2**N,), dtype=complex_dtype()).at[0].set(1.0)
            return flat.reshape(self.D, -1)

        self.state = init()

    # -- layout helpers -----------------------------------------------------
    def _local_view_axes(self, local_slot: int):
        """(pre, 2, post) split of the local block for a local slot."""
        j = local_slot - self.k
        pre = 1 << j
        post = 1 << (self.L - j - 1)
        return pre, post

    # -- collective swap ----------------------------------------------------
    def _swap_global_local(self, global_slot: int, local_slot: int):
        """Exchange a device-bit slot with a local slot (one all_to_all)."""
        pre, post = self._local_view_axes(local_slot)
        groups = _pair_groups(self.k, global_slot)
        axis = self.axis

        @partial(shard_map, mesh=self.mesh, in_specs=P(axis),
                 out_specs=P(axis))
        def swap(block):
            x = block.reshape(1, pre, 2, post)
            out = jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=2,
                                     axis_index_groups=groups, tiled=True)
            return out.reshape(1, -1)

        self.state = jax.jit(swap)(self.state)
        # lazy layout update: the two slots' occupants exchange places
        qg = self.slot_of.index(global_slot)
        ql = self.slot_of.index(local_slot)
        self.slot_of[qg], self.slot_of[ql] = local_slot, global_slot

    def _ensure_local(self, qubits: tuple[int, ...]):
        """Swap any globally-stored target qubits into local slots."""
        for q in qubits:
            slot = self.slot_of[q]
            if slot < self.k:
                # Victim: the local slot whose occupant has the highest logical
                # index among non-targets — heuristically the least-active
                # qubit, so hot qubits settle into local slots (lazy layout).
                target_slots = {self.slot_of[t] for t in qubits}
                candidates = [s for s in range(self.k, self.N) if s not in target_slots]
                victim = max(candidates, key=lambda s: self.slot_of.index(s))
                self._swap_global_local(slot, victim)

    # -- gates --------------------------------------------------------------
    def apply(self, matrix, qubits: tuple[int, ...]):
        """Apply a 1- or 2-qubit unitary to logical `qubits`."""
        self._ensure_local(qubits)
        slots = tuple(self.slot_of[q] for q in qubits)
        mat = jnp.asarray(matrix, dtype=complex_dtype())
        axis = self.axis
        L = self.L
        k = self.k

        if len(qubits) == 1:
            (s,) = slots
            pre, post = self._local_view_axes(s)

            @partial(shard_map, mesh=self.mesh, in_specs=(P(axis), P()),
                     out_specs=P(axis))
            def apply1(block, u):
                x = block.reshape(pre, 2, post)
                x = jnp.einsum("bc,acj->abj", u, x, precision=PRECISION)
                return x.reshape(1, -1)

            self.state = jax.jit(apply1)(self.state, mat)
            return self

        if len(qubits) == 2:
            s1, s2 = slots
            swapped = s1 > s2
            lo, hi = sorted(slots)
            u = mat.reshape(2, 2, 2, 2)
            if swapped:
                u = jnp.permute_dims(u, (1, 0, 3, 2))
            jlo, jhi = lo - k, hi - k
            pre = 1 << jlo
            mid = 1 << (jhi - jlo - 1)
            post = 1 << (L - jhi - 1)

            @partial(shard_map, mesh=self.mesh, in_specs=(P(axis), P()),
                     out_specs=P(axis))
            def apply2(block, u4):
                x = block.reshape(pre, 2, mid, 2, post)
                x = jnp.einsum("xyce,ocmei->oxmyi", u4, x, precision=PRECISION)
                return x.reshape(1, -1)

            self.state = jax.jit(apply2)(self.state, u)
            return self

        raise NotImplementedError("1- and 2-qubit gates only")

    def apply_window(self, u, qubits: tuple[int, ...]):
        """Apply a fused k-qubit window unitary (k <= local bits).

        Zero communication once the targets are local: one grouped einsum
        per device block (:func:`..dv.fusion.apply_window`), so a fused
        window of j gates costs one per-device HBM pass instead of j.
        ``u`` rows/cols index the qubits of ``qubits`` in the given order.
        """
        from ..dv import fusion as dvfusion
        from ..dv import qop

        qubits = tuple(int(q) for q in qubits)
        if len(qubits) > self.L:
            raise ValueError(f"window of {len(qubits)} qubits exceeds the "
                             f"{self.L} local bits per device")
        self._ensure_local(qubits)
        slots = [self.slot_of[q] for q in qubits]
        order = list(np.argsort(slots))
        u = np.asarray(u)
        if order != list(range(len(qubits))):
            # re-order the operator's tensor factors to ascending slot order:
            # old factor i moves to its slot's rank (permute_tensor_product
            # sends old factor k to position perm[k])
            ranks = list(np.argsort(order))
            u = np.asarray(qop.permute_tensor_product(jnp.asarray(u), ranks))
        tgts = tuple(sorted(s - self.k for s in slots))
        axis, L = self.axis, self.L
        mat = jnp.asarray(u, dtype=complex_dtype())

        @partial(shard_map, mesh=self.mesh, in_specs=(P(axis), P()),
                 out_specs=P(axis))
        def applyw(block, uu):
            x = dvfusion.apply_window(block.reshape(-1), uu, tgts, L)
            return x.reshape(1, -1)

        self.state = jax.jit(applyw)(self.state, mat)
        return self

    def run_fused(self, gates, max_bits: int | None = None):
        """Fuse a unitary gate list into window unitaries and apply them.

        ``gates``: (matrix, qubits) tuples or gate objects, as accepted by
        :func:`..dv.fusion.fuse_windows`. Windows are capped at the
        per-device local bit count so every window applies communication-free
        after its layout swaps. Each window is its own dispatch through the
        scattered grouped einsum — fine on the CPU mesh; the TPU hot path
        is :meth:`run_fused_slab`.
        """
        from ..dv import fusion as dvfusion

        mb = dvfusion.MAX_WINDOW_BITS if max_bits is None else int(max_bits)
        mb = min(mb, self.L)
        for u, tgts in dvfusion.fuse_windows(gates, max_bits=mb):
            self.apply_window(u, tgts)
        return self

    # -- fused slab execution -------------------------------------------------
    SCATTER_MOVE_MAX = 21  # larger per-device blocks use only minor-safe passes
    A2A_PASS_COST = 4      # scheduler weight: one collective swap vs one local pass

    def _plan_window_residency(self, slot_of: list[int],
                               qubits: tuple[int, ...], S: int,
                               plan: list[tuple]) -> list[int]:
        """Append to ``plan`` the collective swaps + minor-safe local passes
        that make logical ``qubits`` minor-slab-resident from layout
        ``slot_of``; returns the updated layout (input not mutated).

        Pure planning over the slot table — shared by the real trace build
        and the window scheduler's cost simulation.
        """
        from ..dv import fast_sv

        L, k, N = self.L, self.k, self.N
        slab_start_slot = N - S
        slot_of = list(slot_of)
        # 1) collective swaps bring global targets into local slots
        for q in qubits:
            slot = slot_of[q]
            if slot >= k:
                continue
            tslots = {slot_of[t] for t in qubits}
            cands = [s for s in range(k, N) if s not in tslots]
            # prefer victims outside the minor slab (resident windows stay
            # resident); tie-break: least-active (highest-logical-index)
            # occupant, as in _ensure_local
            outside = [s for s in cands if s < slab_start_slot]
            pool = outside or cands
            victim = max(pool, key=lambda s: slot_of.index(s))
            plan.append(("a2a", slot, victim - k))
            qg = slot_of.index(slot)
            ql = slot_of.index(victim)
            slot_of[qg], slot_of[ql] = victim, slot
        # 2) minor-safe local passes park the targets in the slab
        phys = [slot_of[q] - k for q in qubits]

        def emit(op, newpos):
            plan.append(op)
            slot_of[:] = [k + newpos(s - k) if s >= k else s
                          for s in slot_of]

        fast_sv.plan_slab_residency(L, S, self.SCATTER_MOVE_MAX, phys, emit)
        return slot_of

    def run_fused_slab(self, gates, max_bits: int | None = None,
                       plan_windows: bool | None = None):
        """Whole fused circuit as ONE shard_map program over the mesh.

        The sharded twin of :meth:`..dv.fast_sv.FastStatevector.run_compiled`:
        every device block keeps a 2^S-wide minor *slab* with a lazy
        logical→physical layout, windows apply as pure ``(R, 2^S) @
        (2^S, 2^S)`` MXU contractions, and layout moves use only minor-safe
        passes (:func:`..dv.fast_sv.plan_slab_residency` — the scattered
        grouped einsum of :meth:`apply_window` measured 22x the bandwidth
        floor on v5e, and its rank-N views stop compiling at large N).
        Collective index swaps (pairwise ``all_to_all``), local layout
        passes and slab matmuls are all traced into a single program, so a
        whole circuit is one dispatch; the window matrices are baked in as
        HLO constants and programs are cached per (plan, matrices).

        The final layout lands in ``self.slot_of`` — every readout method
        (``probabilities``/``measure``/``sample``/``to_dense``) is already
        layout-aware, so no restore pass is needed.
        """
        from ..dv import fast_sv
        from ..dv import fusion as dvfusion

        L, k, N = self.L, self.k, self.N
        S = min(dvfusion.MAX_WINDOW_BITS if max_bits is None
                else int(max_bits), L)
        normalized = []
        for g in gates:
            mat, tgts = g if isinstance(g, tuple) else (g.matrix, tuple(g.indices))
            normalized.append((np.asarray(mat), tuple(int(t) for t in tgts)))
        if any(len(t) > S for _, t in normalized):
            raise ValueError(f"gate support exceeds the {S}-bit slab")
        windows = dvfusion.fuse_windows(normalized, max_bits=S)
        if plan_windows is None:
            plan_windows = self.plan_windows
        if plan_windows:
            # commutation-exact scheduling: minimise collective swaps
            # (weighted A2A_PASS_COST) + local layout passes, then merge
            # now-adjacent same-support windows into single matmuls
            def cost_fn(slot_of, tgts):
                sim: list[tuple] = []
                after = self._plan_window_residency(slot_of, tgts, S, sim)
                c = sum(self.A2A_PASS_COST if op[0] == "a2a" else 1
                        for op in sim)
                return c, after

            windows = fast_sv.order_windows_by_cost(
                windows, list(self.slot_of), cost_fn)
            windows = dvfusion.merge_adjacent_windows(windows, max_bits=S)

        # plan on a shadow table; commit only after the program ran
        plan: list[tuple] = []
        mats: list[np.ndarray] = []
        slot_of = list(self.slot_of)
        for u, qubits in windows:
            slot_of = self._plan_window_residency(slot_of, qubits, S, plan)
            # slab matmul; window expanded to 2^S on the host
            positions = [slot_of[q] - k - (L - S) for q in qubits]
            w = dvfusion._np_expand(np.asarray(u, np.complex128), S,
                                    positions)
            plan.append(("matmul",))
            mats.append(w)
        d = 1 << S
        packed = (np.stack(mats) if mats
                  else np.zeros((0, d, d), np.complex128))
        prog = self._fused_slab_program(tuple(plan), packed.tobytes(),
                                        len(mats), S)
        self.state = prog(self.state)
        self.slot_of = slot_of
        return self

    _FUSED_CACHE_MAX = 32

    def _fused_slab_program(self, plan: tuple, mats_bytes: bytes,
                            n_mats: int, S: int):
        """Build (and cache per instance, LRU-bounded) the single-dispatch
        program.

        The plan depends on the starting layout, so re-running the same
        circuit is single-dispatch-cached only once the layout reaches a
        fixed point; until then each call traces a fresh program. The LRU
        bound keeps a pathological never-converging layout from growing the
        cache without limit."""
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        key = (plan, mats_bytes, S)
        if key in cache:
            cache[key] = cache.pop(key)  # refresh LRU position
            return cache[key]
        while len(cache) >= self._FUSED_CACHE_MAX:
            cache.pop(next(iter(cache)))
        from ..dv import fast_sv

        d = 1 << S
        mats = np.frombuffer(mats_bytes, np.complex128).reshape(n_mats, d, d)
        axis, L, k = self.axis, self.L, self.k
        cdtype = complex_dtype()

        @partial(shard_map, mesh=self.mesh, in_specs=P(axis),
                 out_specs=P(axis))
        def body(block):
            x = block.reshape(-1)
            mi = 0
            for op in plan:
                if op[0] == "a2a":
                    gslot, j = op[1], op[2]
                    pre, post = 1 << j, 1 << (L - j - 1)
                    groups = _pair_groups(k, gslot)
                    y = x.reshape(1, pre, 2, post)
                    y = jax.lax.all_to_all(y, axis, split_axis=2,
                                           concat_axis=2,
                                           axis_index_groups=groups,
                                           tiled=True)
                    x = y.reshape(-1)
                elif op[0] == "swap":
                    x = fast_sv._block_swap_raw(x, L, S)
                elif op[0] == "move":
                    x = fast_sv._upper_move_raw(x, op[1], L, S, op[2])
                elif op[0] == "scatter":
                    x = fast_sv._move_axes_raw(x, op[1], L)
                else:  # matmul — the window matrix traced as a constant
                    w = jnp.asarray(mats[mi].T, dtype=cdtype)
                    mi += 1
                    x = (x.reshape(-1, d) @ w).reshape(-1)
            return x.reshape(1, -1)

        prog = jax.jit(body)
        cache[key] = prog
        return prog

    # -- observables --------------------------------------------------------
    def norm(self):
        axis = self.axis

        @partial(shard_map, mesh=self.mesh, in_specs=P(axis), out_specs=P())
        def n2(block):
            return jax.lax.psum(jnp.sum(jnp.abs(block) ** 2), axis)

        return jnp.sqrt(jax.jit(n2)(self.state))

    def probabilities(self, qubit: int):
        """Marginal (p0, p1) of a logical qubit (works for any layout)."""
        slot = self.slot_of[qubit]
        axis = self.axis
        k = self.k

        if slot < self.k:
            shift = k - 1 - slot

            @partial(shard_map, mesh=self.mesh, in_specs=P(axis), out_specs=P())
            def probs(block):
                me = jax.lax.axis_index(axis)
                bit = (me >> shift) & 1
                total = jnp.sum(jnp.abs(block) ** 2)
                p1 = jax.lax.psum(jnp.where(bit == 1, total, 0.0), axis)
                p0 = jax.lax.psum(jnp.where(bit == 0, total, 0.0), axis)
                return jnp.stack([p0, p1])

            return jax.jit(probs)(self.state)

        pre, post = self._local_view_axes(slot)

        @partial(shard_map, mesh=self.mesh, in_specs=P(axis), out_specs=P())
        def probs_local(block):
            x = block.reshape(pre, 2, post)
            p = jnp.sum(jnp.abs(x) ** 2, axis=(0, 2))
            return jax.lax.psum(p, axis)

        return jax.jit(probs_local)(self.state)

    # -- measurement / sampling ----------------------------------------------
    def _project_z(self, qubit: int, outcome: int, prob):
        """Collapse `qubit` onto Z-eigenstate `outcome` and renormalise.

        One shard_map program, zero communication: projection is an
        elementwise mask in both the local-slot and device-bit layouts.
        """
        slot = self.slot_of[qubit]
        axis = self.axis
        p = jnp.asarray(prob)

        if slot < self.k:
            shift = self.k - 1 - slot

            @partial(shard_map, mesh=self.mesh, in_specs=(P(axis), P()),
                     out_specs=P(axis))
            def proj_g(block, pr):
                me = jax.lax.axis_index(axis)
                keep = ((me >> shift) & 1) == outcome
                return jnp.where(keep, block, 0.0) / jnp.sqrt(pr).astype(block.dtype)

            self.state = jax.jit(proj_g)(self.state, p)
            return

        pre, post = self._local_view_axes(slot)

        @partial(shard_map, mesh=self.mesh, in_specs=(P(axis), P()),
                 out_specs=P(axis))
        def proj_l(block, pr):
            x = block.reshape(pre, 2, post)
            mask = (jnp.arange(2) == outcome)[None, :, None]
            x = jnp.where(mask, x, 0.0) / jnp.sqrt(pr).astype(block.dtype)
            return x.reshape(1, -1)

        self.state = jax.jit(proj_l)(self.state, p)

    def measure(self, qubit: int, key=None, *, theta: float = 0.0,
                phi: float = 0.0, result: int | None = None) -> int:
        """Projective measurement along the (theta, phi) axis with collapse.

        Matches the DV engine's ``M`` semantics (dv/gates.py `M.apply`;
        reference ``simulators/dv_simulator/gates.py:155-186``): Born
        probabilities along the axis, sampled outcome (or post-selected via
        ``result``), state projected onto the outcome eigenvector and
        renormalised. The outcome is returned as a host int — mid-circuit
        classical feed-forward is host-side control flow in this engine, the
        same structure as the eager reference.

        A general axis is handled by basis change: P_e = U P_z U^dagger, so
        apply U^dagger (local 1q program), project in Z, apply U back.
        """
        from ..dv import qop

        rotated = (theta, phi) != (0.0, 0.0)
        if rotated:
            u = qop.axis_rotation(phi, [0, 0, 1]) @ qop.axis_rotation(theta, [0, 1, 0])
            self.apply(np.conj(u).T, (qubit,))
        p0, p1 = (float(x) for x in np.asarray(self.probabilities(qubit)))
        if result is not None:
            outcome = int(result)
        else:
            if key is None:
                raise ValueError("Measurement requires a PRNG key (pass key=...).")
            outcome = int(jax.random.bernoulli(key, p1 / (p0 + p1)))
        self._project_z(qubit, outcome, p1 if outcome else p0)
        if rotated:
            self.apply(u, (qubit,))
        return outcome

    def sample(self, key, num_samples: int) -> np.ndarray:
        """Born-sample `num_samples` bitstrings without collapsing the state.

        Two-stage ancestral sampling that never gathers the 2^N distribution:
        every device draws a LOCAL index from its shard's conditional
        distribution and reports its total probability mass (a (D,)-vector);
        the host then picks the device per draw from the mass distribution.
        Communication is O(D * num_samples) scalars, independent of N.

        Returns an (num_samples, N) int8 array in LOGICAL qubit order.
        """
        axis = self.axis
        n = int(num_samples)

        @partial(shard_map, mesh=self.mesh, in_specs=(P(axis), P()),
                 out_specs=(P(axis), P(axis)))
        def local_draws(block, keys):
            probs = jnp.abs(block.reshape(-1)) ** 2
            mass = jnp.sum(probs)
            logits = jnp.log(probs)
            me = jax.lax.axis_index(axis)

            def draw(k):
                return jax.random.categorical(jax.random.fold_in(k, me), logits)

            idx = jax.vmap(draw)(keys)
            return mass[None], idx[None, :]

        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, n)
        mass, local_idx = jax.jit(local_draws)(self.state, keys)
        mass = np.asarray(mass, np.float64)
        local_idx = np.asarray(local_idx)  # (D, n)

        dev = np.asarray(jax.random.categorical(
            key, jnp.log(jnp.asarray(mass / mass.sum())), shape=(n,)))
        flat = dev.astype(np.int64) * (1 << self.L) + local_idx[dev, np.arange(n)]

        # physical-slot bits (MSB-first) -> logical qubit order
        bits = (flat[:, None] >> (self.N - 1 - np.arange(self.N))[None, :]) & 1
        return bits[:, [self.slot_of[q] for q in range(self.N)]].astype(np.int8)

    def to_dense(self):
        """Gather the full state in LOGICAL qubit order (testing only)."""
        flat = np.asarray(self.state).reshape(-1)
        t = flat.reshape((2,) * self.N)
        # out axis q comes from the physical slot currently holding qubit q
        t = np.transpose(t, [self.slot_of[q] for q in range(self.N)])
        return t.reshape(-1)
