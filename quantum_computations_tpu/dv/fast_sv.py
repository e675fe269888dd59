"""Large-N split-real statevector engine on the Pallas kernel set.

The general :class:`.simulator.Simulator` keeps a complex statevector and
supports mid-circuit measurement / classical control — the reference DV
engine's semantics (``simulators/dv_simulator/simulator.py``). At large N
the TPU wants something different:

- **split-real float planes** — the tunnelled TPU backend cannot transfer
  complex buffers host<->device at all, and Pallas has no native complex;
- **fused gate chains** — a single-qubit gate pass is HBM-bound (read +
  write the full state), so fusing k gates into one pass via
  :func:`..ops.pallas_kernels.apply_1q_chain` is a ~k× win;
- **buffer donation** — an N=30 float32 state is 2 × 4 GiB planes; only
  in-place updates fit a 16 GiB chip.

This module packages those kernels as an engine for unitary circuits +
terminal Born sampling (the Grover/RB usage pattern — the reference's
mid-circuit measurements live in the general engine). Replaces the
reference's dense O(4^N) ``expand_gate`` construction
(``simulators/dv_simulator/numpy_quantum.py:243-247``) at scale.

Gate scheduling (``fusion_mode``):

- ``"slab"`` (default) — gates fuse into <=7-qubit *window* unitaries
  (:mod:`.fusion`) and apply on the minor 128-lane slab as pure
  ``(R, 128) @ (128, 128)`` MXU matmuls with a lazy logical->physical axis
  layout: a window whose qubits live outside the slab pays ONE grouped
  transpose pass to move them in (and they stay). Measured on v5e at N=28:
  slab pass 20.4 ms = 1.37x the achieved-BW floor (0.85 ms/gate for a
  24-gate window), move pass 5.1 ms — vs 22x the floor for the scattered
  grouped einsum and 20x for the per-gate Pallas chain. NOTE: ``re``/``im``
  are in PHYSICAL axis order when the layout is permuted; use
  ``probs()``/``sample()``/``norm_sq()`` (layout-aware) for readout.
- ``"window"`` — the same fused windows applied in logical order via a
  grouped einsum (exact; XLA inserts layout transposes for scattered
  targets — fine on CPU, slow on TPU).
- ``"chain"`` — the Pallas split-real kernels: runs of fusable 1q gates form
  one :func:`..ops.pallas_kernels.apply_1q_chain` pass, adjacent pairs use
  the 4x4 branch-mix kernel, everything else falls back to XLA.
"""

from __future__ import annotations

import functools
import math
import os
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import fusion
from ..ops import pallas_kernels as pk

__all__ = ["FastStatevector", "order_windows", "plan_slab_residency"]


@partial(jax.jit, static_argnames=("targets", "num_qubits"),
         donate_argnums=(0, 1))
def _window_step(re, im, u_re, u_im, targets: tuple, num_qubits: int):
    """One fused-window application; donates the input planes (in-place on
    HBM — the N=30 requirement)."""
    return fusion.apply_window_split(re, im, u_re, u_im, targets, num_qubits)


def _move_axes_to_end_plan(N: int, axes: tuple[int, ...]):
    """(view_shape, transpose_perm) sending physical axes ``axes`` (sorted)
    to the trailing positions, preserving the order of the others.

    Uses the interleaved-segment grouped view (rank <= 2k+1), never the
    rank-N (2,)*N view, so it is XLA-safe at any N.
    """
    shape, taxes = fusion._grouped_view(N, axes)
    others = [i for i in range(len(shape)) if i not in taxes]
    return tuple(shape), tuple(others) + tuple(taxes)


def _move_axes_raw(x, axes: tuple, num_qubits: int):
    shape, perm = _move_axes_to_end_plan(num_qubits, axes)
    return x.reshape(shape).transpose(perm).reshape(-1)


@partial(jax.jit, static_argnames=("num_qubits", "axes"),
         donate_argnums=(0, 1))
def _move_axes_step(re, im, axes: tuple, num_qubits: int):
    """One HBM pass relocating physical axes ``axes`` to the end of both
    planes. ONLY safe at small N: the transpose output ends in size-2 axes,
    which TPU layout assignment pads to the (sublane, 128-lane) tile — at
    N=28 the padded copy buffer exceeds HBM (measured: 34-64 GB). Large-N
    moves use the minor-safe primitives below instead."""
    return (_move_axes_raw(re, axes, num_qubits),
            _move_axes_raw(im, axes, num_qubits))


def _block_swap_raw(x, num_qubits: int, slab_bits: int):
    S = slab_bits
    A = 1 << (num_qubits - 2 * S)
    d = 1 << S
    return jnp.swapaxes(x.reshape(A, d, d), 1, 2).reshape(-1)


@partial(jax.jit, static_argnames=("num_qubits", "slab_bits"),
         donate_argnums=(0, 1))
def _block_swap_step(re, im, num_qubits: int, slab_bits: int):
    """Swap the slab (last S axes) with block B (the S axes above it) —
    a (A, 2^S, 2^S) axis swap whose minor dim stays 2^S = 128: measured
    0.24-0.35x the elementwise floor on v5e."""
    return (_block_swap_raw(re, num_qubits, slab_bits),
            _block_swap_raw(im, num_qubits, slab_bits))


# Above this plane size (bytes of one f32 plane) the grouped single-transpose
# form of an upper move is decomposed into per-run middle swaps: XLA lowers
# the many-axis transpose as TWO full-plane copies (measured in the N=30 OOM
# dump — 4G temp + 4G copy + 4G input + the other 4G plane = 20G on a 16G
# chip), while a 4-axis (P, X, Y, Q) middle swap needs only in + out.
# QCT_SV_MOVE_DECOMP=1/0 forces the choice.
_MOVE_DECOMP_BYTES = 2 << 30


def _move_decomposition(axes: tuple, num_qubits: int, slab_bits: int,
                        to_front: bool) -> list[tuple[int, int, int, int]]:
    """Decompose an upper move into single middle-swap passes.

    Returns [(p, x, y, q), ...]: each pass is
    ``v.reshape(p, x, y, q).swapaxes(1, 2)`` — a 4-axis transpose whose
    minor dim is untouched (>= the 2^S slab), which XLA lowers as ONE copy
    pass. One pass per contiguous run of target axes:

    - to_back (``to_front=False``): runs processed right-to-left, each run G
      swaps past everything right of it (B) and merges into the minor block
      Q (initially the slab); final upper order = others + targets(sorted),
      exactly :func:`_upper_move_raw`'s permutation.
    - to_front: runs processed left-to-right, each run G swaps past the
      non-target block A to its left and merges into the leading block P;
      final order = targets(sorted) + others.
    """
    Nu = num_qubits - slab_bits
    shape, taxes = fusion._grouped_view(Nu, axes)
    sizes = list(shape)
    is_tgt = [i in taxes for i in range(len(sizes))]
    # contiguous runs of target axes in the grouped view
    runs: list[tuple[int, int]] = []  # [start, end) index ranges
    i = 0
    while i < len(sizes):
        if is_tgt[i]:
            j = i
            while j < len(sizes) and is_tgt[j]:
                j += 1
            runs.append((i, j))
            i = j
        else:
            i += 1
    passes: list[tuple[int, int, int, int]] = []
    if not to_front:
        Q = 1 << slab_bits
        rem = list(sizes)
        rem_tgt = list(is_tgt)
        for (i0, j0) in reversed(runs):
            G = math.prod(rem[i0:j0])
            B = math.prod(rem[j0:])
            P = math.prod(rem[:i0])
            if B > 1:
                passes.append((P, G, B, Q))
            Q *= G
            del rem[i0:j0], rem_tgt[i0:j0]
    else:
        # left-to-right: each run G hops over the (contiguous, growing)
        # non-target block A to land right after the already-moved runs F
        F = 1  # product of runs already moved to the front
        A = 1  # product of non-target sizes swept past so far
        idx = 0
        for (i0, j0) in runs:
            A *= math.prod(sizes[idx:i0])
            G = math.prod(sizes[i0:j0])
            Q = math.prod(sizes[j0:]) * (1 << slab_bits)
            if A > 1:
                passes.append((F, A, G, Q))
            F *= G
            idx = j0
    return passes


def _upper_move_raw(x, axes: tuple, num_qubits: int, slab_bits: int,
                    to_front: bool):
    decomp = os.environ.get("QCT_SV_MOVE_DECOMP", "auto")
    if decomp == "1" or (decomp != "0"
                         and (x.size * 4 >= _MOVE_DECOMP_BYTES)):
        for (p, xs, ys, q) in _move_decomposition(axes, num_qubits,
                                                  slab_bits, to_front):
            x = x.reshape(p, xs, ys, q).swapaxes(1, 2).reshape(-1)
        return x
    Nu = num_qubits - slab_bits
    shape, taxes = fusion._grouped_view(Nu, axes)
    shape = shape + (1 << slab_bits,)
    slab_ax = len(shape) - 1
    others = tuple(i for i in range(slab_ax) if i not in taxes)
    if to_front:
        perm = tuple(taxes) + others + (slab_ax,)
    else:
        perm = others + tuple(taxes) + (slab_ax,)
    return x.reshape(shape).transpose(perm).reshape(-1)


@partial(jax.jit, static_argnames=("num_qubits", "slab_bits", "axes",
                                   "to_front"), donate_argnums=(0, 1))
def _upper_move_step(re, im, axes: tuple, num_qubits: int, slab_bits: int,
                     to_front: bool):
    """Relocate UPPER physical axes ``axes`` to the end (or front) of the
    upper region, slab untouched. The slab stays merged as a trailing
    2^S-wide axis, so the transpose output's minor dim is 128 — the
    layout-safe form of the grouped move at any N."""
    return (_upper_move_raw(re, axes, num_qubits, slab_bits, to_front),
            _upper_move_raw(im, axes, num_qubits, slab_bits, to_front))


@functools.lru_cache(maxsize=256)
def _chain_program(plan: tuple, mats_bytes: bytes, n_mats: int,
                   num_qubits: int, slab_bits: int, use_pallas: bool,
                   interpret: bool):
    """Build (and cache) a single jitted program for a whole fused circuit.

    Layout moves + slab matmuls all live in ONE dispatch — per-step
    dispatch costs ~45 ms of RTT on the tunnelled TPU, 18x the kernel
    time. The window matrices are baked into the program as HLO constants
    (keyed by their bytes), so repeat runs of the same circuit+layout do
    ZERO host->device transfers: one dispatch, nothing else.
    """
    S = slab_bits
    d = 1 << S
    mats = np.frombuffer(mats_bytes, np.float32).reshape(n_mats, 2, d, d)

    def seq_planes(f, r, i):
        """Run a per-plane pass plane-AFTER-plane: a transpose cannot be
        in-place, so concurrent planes peak at 4 buffers (16 GB at N=30 —
        the measured OOM); sequencing caps the live set at 3 (12 GB)."""
        r2 = f(r)
        r2, i = jax.lax.optimization_barrier((r2, i))
        i2 = f(i)
        return jax.lax.optimization_barrier((r2, i2))

    @partial(jax.jit, donate_argnums=(0, 1))
    def prog(re, im):
        mi = 0
        r, i = re, im
        for op in plan:
            if op[0] == "swap":
                r, i = seq_planes(
                    lambda x: _block_swap_raw(x, num_qubits, S), r, i)
            elif op[0] == "move":
                _, srcs, front = op
                r, i = seq_planes(
                    lambda x: _upper_move_raw(x, srcs, num_qubits, S, front),
                    r, i)
            elif op[0] == "scatter":
                r, i = seq_planes(
                    lambda x: _move_axes_raw(x, op[1], num_qubits), r, i)
            else:  # matmul — mats[mi] traced as a program constant
                wtr = mats[mi, 0]
                wti = mats[mi, 1]
                mi += 1
                if use_pallas:
                    r, i = pk.slab_matmul(r, i, jnp.asarray(wtr),
                                          jnp.asarray(wti), d,
                                          interpret=interpret)
                else:
                    xr = r.reshape(-1, d)
                    xi = i.reshape(-1, d)
                    out_r = jnp.dot(xr, wtr) - jnp.dot(xi, wti)
                    out_i = jnp.dot(xi, wtr) + jnp.dot(xr, wti)
                    r, i = out_r.reshape(-1), out_i.reshape(-1)
        return r, i

    return prog


def _swap_newpos(N: int, S: int):
    """old→new physical-axis map of the slab <-> block-B swap."""
    slab_start = N - S

    def f(p):
        if p >= slab_start:
            return p - S
        if p >= slab_start - S:
            return p + S
        return p

    return f


def _move_newpos(N: int, S: int, srcs: tuple[int, ...], to_front: bool):
    """old→new physical-axis map of an upper-region move (slab untouched)."""
    Nu = N - S
    src_set = set(srcs)
    others = [p for p in range(Nu) if p not in src_set]
    newpos = {}
    if to_front:
        for r, p in enumerate(srcs):
            newpos[p] = r
        for r, p in enumerate(others):
            newpos[p] = len(srcs) + r
    else:
        for r, p in enumerate(others):
            newpos[p] = r
        for r, p in enumerate(srcs):
            newpos[p] = len(others) + r
    return lambda p: newpos.get(p, p)


def _scatter_newpos(N: int, move: tuple[int, ...]):
    """old→new physical-axis map of the direct grouped move-to-end."""
    moved = set(move)
    untouched = [p for p in range(N) if p not in moved]
    newpos = {p: r for r, p in enumerate(untouched)}
    for r, p in enumerate(move):
        newpos[p] = len(untouched) + r
    return lambda p: newpos[p]


def plan_slab_residency(N: int, S: int, scatter_move_max: int,
                        phys: list[int], emit) -> list[int]:
    """Emit the minor-safe pass sequence bringing physical axes ``phys``
    into the minor slab (the last S axes of an N-axis register).

    ``emit(op, newpos)`` executes or records ONE pass and must apply
    ``newpos`` (old → new physical axis) to the caller's own layout
    bookkeeping. Ops are ``("swap",)``, ``("move", srcs, to_front)`` and
    ``("scatter", srcs)`` — see the ``_*_step`` kernels above. Returns the
    targets' final physical positions (all >= N - S).

    The pass selection is the measured-on-v5e scheme shared by the
    single-chip slab engine and the sharded per-device blocks: arbitrary
    grouped moves do NOT compile at N>=28 (tiny trailing axes pad to
    34-64 GB copies), so large N uses only passes whose transpose output
    keeps a 2^S-wide minor axis:

    1. targets in BOTH the slab and the upper region: move the upper
       targets to the front of the upper region (1 pass — front positions
       are outside block B since N >= 3S + 1 there);
    2. any slab-resident target: slab <-> B swap evicts them to B;
    3. move all targets to the end of the upper region;
    4. slab <-> B swap brings them in.
    """
    slab_start = N - S
    phys = list(phys)
    if all(p >= slab_start for p in phys):
        return phys
    if N < 3 * S + 1 or N <= scatter_move_max:
        srcs = tuple(sorted(phys))
        f = _scatter_newpos(N, srcs)
        emit(("scatter", srcs), f)
        return [f(p) for p in phys]
    in_slab = [p for p in phys if p >= slab_start]
    upper = tuple(sorted(p for p in phys if p < slab_start))
    if in_slab and upper:
        f = _move_newpos(N, S, upper, True)
        emit(("move", upper, True), f)
        phys = [f(p) for p in phys]
    if in_slab:
        f = _swap_newpos(N, S)
        emit(("swap",), f)
        phys = [f(p) for p in phys]
    assert all(p < slab_start for p in phys)
    srcs = tuple(sorted(phys))
    f = _move_newpos(N, S, srcs, False)
    emit(("move", srcs, False), f)
    phys = [f(p) for p in phys]
    f = _swap_newpos(N, S)
    emit(("swap",), f)
    return [f(p) for p in phys]


def _residency_cost(N: int, S: int, scatter_move_max: int,
                    layout: list[int], tgts: tuple[int, ...]):
    """(pass_count, layout_after) of bringing logical ``tgts`` slab-resident
    from ``layout`` — a pure simulation of :func:`plan_slab_residency` on a
    shadow table (no planes touched)."""
    lay = list(layout)
    passes = 0

    def emit(op, newpos):
        nonlocal passes
        passes += 1
        lay[:] = [newpos(p) for p in lay]

    plan_slab_residency(N, S, scatter_move_max, [lay[t] for t in tgts], emit)
    return passes, lay


# Window count above which greedy scheduling falls back to circuit order
# (the O(n^2) host-side planning would dominate for very long unfused
# chains; ~500 windows keeps planning well under a second).
_PLAN_MAX_WINDOWS = 512


def order_windows_by_cost(windows, state, cost_fn):
    """Commutation-exact greedy scheduling of fused windows.

    Windows on disjoint qubit supports commute exactly, so any topological
    order of the overlap-dependency DAG is equivalent. Lazy layouts make the
    order *performance-relevant*: a window whose targets are already
    resident costs nothing, one that isn't pays layout passes (and, on the
    mesh engine, collective index swaps). Greedy list scheduling: among
    ready windows pick the one whose simulated residency plan from the
    current shadow ``state`` has the lowest ``cost_fn(state, targets) ->
    (cost, state_after)``, tie-broken by original circuit position; then
    advance the shadow state.

    The reference applies every gate as its own dense O(4^N) operator in
    strict circuit order (``simulators/dv_simulator/gates.py:44-54``); it
    has no scheduling layer at all.

    Scheduling is O(n^2) in the window count (DAG edges + one residency
    simulation per (step, ready window)); above ``_PLAN_MAX_WINDOWS`` the
    host time would rival the device time saved, so the planner falls back
    to circuit order.
    """
    n = len(windows)
    if n <= 1 or n > _PLAN_MAX_WINDOWS:
        return list(windows)
    supports = [set(t) for _, t in windows]
    preds_left = [0] * n
    succs: list[list[int]] = [[] for _ in range(n)]
    for i in range(n):
        for j in range(i):
            if supports[i] & supports[j]:
                preds_left[i] += 1
                succs[j].append(i)
    ready = [i for i in range(n) if preds_left[i] == 0]
    order: list[int] = []
    while ready:
        ready.sort()
        best, best_cost, best_state = None, None, None
        for i in ready:
            cost, state_after = cost_fn(state, windows[i][1])
            if best_cost is None or cost < best_cost:
                best, best_cost, best_state = i, cost, state_after
                if cost == 0:
                    break  # can't beat a resident window
        ready.remove(best)
        order.append(best)
        state = best_state
        for s in succs[best]:
            preds_left[s] -= 1
            if preds_left[s] == 0:
                ready.append(s)
    return [windows[i] for i in order]


def order_windows(windows, N: int, S: int, scatter_move_max: int,
                  layout: list[int]):
    """Single-chip slab-engine planner: schedule windows to minimise
    minor-safe layout passes (~5 ms HBM passes each), then let the caller
    merge now-adjacent same-support windows
    (:func:`..dv.fusion.merge_adjacent_windows`)."""
    return order_windows_by_cost(
        windows, list(layout),
        lambda lay, tgts: _residency_cost(N, S, scatter_move_max, lay, tgts))


@partial(jax.jit, static_argnames=("slab_dim",), donate_argnums=(0, 1))
def _slab_matmul_step(re, im, w_re, w_im, slab_dim: int):
    """Slab window application: (R, 2^S) @ (2^S, 2^S) split-real matmuls —
    zero transposes, MXU-bound, one HBM pass."""
    xr = re.reshape(-1, slab_dim)
    xi = im.reshape(-1, slab_dim)
    wrt = w_re.T
    wit = w_im.T
    out_r = jnp.dot(xr, wrt) - jnp.dot(xi, wit)
    out_i = jnp.dot(xi, wrt) + jnp.dot(xr, wit)
    return out_r.reshape(-1), out_i.reshape(-1)


def _apply_xla_general(re, im, u, targets: tuple[int, ...], num_qubits: int):
    """Split-real k-qubit unitary application via tensordot (XLA path).

    Functional twin of :func:`.qop.apply_unitary` (big-endian qubit order)
    on (re, im) planes: four real contractions instead of one complex one.
    """
    N = num_qubits
    k = len(targets)
    shape = (2,) * N
    xr = re.reshape(shape)
    xi = im.reshape(shape)
    u = jnp.asarray(u)
    ur = jnp.real(u).astype(xr.dtype).reshape((2,) * (2 * k))
    ui = jnp.imag(u).astype(xr.dtype).reshape((2,) * (2 * k))
    axes = (tuple(range(k, 2 * k)), tuple(targets))
    rr = jnp.tensordot(ur, xr, axes=axes)
    ri = jnp.tensordot(ur, xi, axes=axes)
    ir = jnp.tensordot(ui, xr, axes=axes)
    ii = jnp.tensordot(ui, xi, axes=axes)
    out_r, out_i = rr - ii, ri + ir
    # tensordot moved the target axes to the front; restore positions
    perm = list(targets) + [i for i in range(N) if i not in targets]
    inv = np.argsort(perm)
    return (jnp.transpose(out_r, inv).reshape(-1),
            jnp.transpose(out_i, inv).reshape(-1))


@dataclass
class _Plan:
    """One scheduled device call."""

    kind: str                      # "chain" | "2q" | "xla"
    matrices: list = field(default_factory=list)
    bits: list = field(default_factory=list)    # chain: amplitude bits
    targets: tuple = ()                         # 2q/xla: qubit indices


class FastStatevector:
    """Unitary-circuit engine over split-real planes with Pallas fast paths.

    Parameters
    ----------
    num_qubits:
        State size; planes are float32 of shape (2**num_qubits,).
    use_pallas:
        ``None`` (default) enables the Pallas kernels only on a TPU
        backend; tests force ``True`` with ``interpret=True`` or ``False``
        for the pure-XLA path.
    donate:
        Alias kernel outputs onto the input planes (in-place on HBM) —
        required for N >= 30 on one chip.
    """

    C_BITS = 11
    BLOCK_ROWS = 32  # (32, 2048) blocks fit the 16 MB scoped-VMEM stack (pallas_kernels)

    def __init__(self, num_qubits: int, *, use_pallas: bool | None = None,
                 interpret: bool = False, donate: bool = False,
                 fusion_mode: str | None = None):
        self.N = int(num_qubits)
        if fusion_mode is None:
            # explicit use_pallas=True selects the chain kernels (back-compat)
            fusion_mode = ("chain" if use_pallas
                           else os.environ.get("QCT_SV_FUSION", "slab"))
        if fusion_mode not in ("window", "chain", "slab"):
            raise ValueError(f"unknown fusion_mode {fusion_mode!r}")
        self.fusion_mode = fusion_mode
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self.use_pallas = bool(use_pallas)
        self.interpret = bool(interpret)
        self.donate = bool(donate)
        # layout must fit the register: columns 2^c_bits <= state size with
        # at least one block row
        self.c_bits = min(self.C_BITS, self.N - 1)
        self.block_rows = min(self.BLOCK_ROWS, 1 << (self.N - self.c_bits))
        n = 1 << self.N

        @jax.jit
        def _init():
            re = jnp.zeros((n,), jnp.float32).at[0].set(1.0)
            return re, jnp.zeros((n,), jnp.float32)

        self.re, self.im = _init()
        self._fusable = set(pk.fusable_bits(self.N, self.c_bits,
                                            self.block_rows))
        # slab mode: logical axis -> physical axis (lazy layout; axes move
        # into the minor slab on demand and stay there)
        self.axis_of = list(range(self.N))
        self.slab_bits = min(fusion.MAX_WINDOW_BITS, self.N)
        # N up to this uses the direct grouped move (1 pass; its tiny-axis
        # layout padding only matters at multi-GB planes); tests lower it
        # (with a small slab_bits) to exercise the minor-safe sequence
        self.scatter_move_max = 21
        self._plan_only = None  # set by run_compiled during planning
        # layout-aware window scheduling (order_windows); exact, default on
        self.plan_windows = os.environ.get("QCT_SV_PLAN", "1") != "0"
        self.layout_passes = 0  # move/swap/scatter passes executed so far

    # -- scheduling ------------------------------------------------------
    def _bit(self, qubit: int) -> int:
        """Amplitude-bit position of a big-endian qubit index."""
        return self.N - qubit - 1

    @staticmethod
    def _normalize(g) -> tuple[np.ndarray, tuple[int, ...]]:
        """(matrix, targets) with Insert-style injections unitarised.

        A 2-vector (a, b) means state injection: the reference engine grows
        the register (dv gates.py Insert); here the register is fixed and
        the target starts in |0>, so the injection is the state-prep
        unitary [[a, -b*], [b, a*]].
        """
        mat, targets = g if isinstance(g, tuple) else (g.matrix, tuple(g.indices))
        mat = np.asarray(mat)
        if mat.size == 2:
            a, b = mat.reshape(2)
            mat = np.array([[a, -np.conj(b)], [b, np.conj(a)]])
        return mat, tuple(int(t) for t in targets)

    def _plan(self, gates) -> list[_Plan]:
        """Greedy fusion: runs of Pallas-fusable 1q gates form one chain."""
        plans: list[_Plan] = []
        chain: _Plan | None = None
        for g in gates:
            mat, targets = self._normalize(g)
            k = len(targets)
            bit = self._bit(targets[0])
            if (self.use_pallas and k == 1 and bit in self._fusable):
                if chain is None or len(chain.bits) >= pk._MAX_CHAIN_LEN:
                    chain = _Plan("chain")
                    plans.append(chain)
                chain.matrices.append(mat)
                chain.bits.append(bit)
                continue
            chain = None
            if (self.use_pallas and k == 2 and targets[1] == targets[0] + 1
                    and self.N - targets[0] - 2 >= 7):
                plans.append(_Plan("2q", matrices=[mat], targets=targets))
            else:
                plans.append(_Plan("xla", matrices=[mat], targets=targets))
        return plans

    # -- execution -------------------------------------------------------
    def run(self, gates) -> "FastStatevector":
        """Apply a sequence of gate objects (``.matrix`` + ``.indices``) or
        ``(matrix, targets)`` tuples. Returns self."""
        if self.fusion_mode in ("window", "slab"):
            for u, tgts in self._windows(gates):
                if self.fusion_mode == "slab":
                    self._apply_slab_window(u, tgts)
                else:
                    self.re, self.im = _window_step(
                        self.re, self.im,
                        jnp.asarray(np.ascontiguousarray(u.real)),
                        jnp.asarray(np.ascontiguousarray(u.imag)),
                        tgts, self.N)
            return self
        for plan in self._plan(gates):
            if plan.kind == "chain":
                us = np.stack(plan.matrices).astype(np.complex64)
                self.re, self.im = pk.apply_1q_chain(
                    self.re, self.im, us, tuple(plan.bits), self.N,
                    c_bits=self.c_bits, block_rows=self.block_rows,
                    donate=self.donate, interpret=self.interpret)
            elif plan.kind == "2q":
                self.re, self.im = pk.apply_2q_adjacent(
                    self.re, self.im, plan.matrices[0], plan.targets[0],
                    self.N, interpret=self.interpret)
            else:
                self.re, self.im = _apply_xla_general(
                    self.re, self.im, plan.matrices[0], plan.targets, self.N)
        return self

    # -- slab engine -------------------------------------------------------
    def _windows(self, gates):
        """Fuse ``gates`` into windows; in slab mode additionally schedule
        them with the layout planner (exact commuting reorder + adjacent
        merge) unless ``plan_windows`` is off."""
        max_bits = (self.slab_bits if self.fusion_mode == "slab"
                    else min(fusion.MAX_WINDOW_BITS, self.N))
        normalized = [self._normalize(g) for g in gates]
        windows = fusion.fuse_windows(normalized, max_bits=max_bits)
        if self.fusion_mode == "slab" and self.plan_windows:
            windows = order_windows(windows, self.N, self.slab_bits,
                                    self.scatter_move_max, self.axis_of)
            windows = fusion.merge_adjacent_windows(windows,
                                                    max_bits=max_bits)
        return windows

    def _ensure_slab_resident(self, tgts: tuple[int, ...]):
        """Bring all target axes into the minor slab (lazy layout).

        Pass selection lives in :func:`plan_slab_residency` (shared with
        the sharded engine); here each emitted pass either runs on the
        planes or is recorded by ``run_compiled``'s plan-only hook.
        Typical cost is 2 passes at ~5 ms each (no slab residents);
        windows already resident pay nothing. N <= scatter_move_max uses
        the direct grouped move — its tiny-axis layout padding is only
        prohibitive at large N (64x of a 16 MB plane is nothing; of a
        1-4 GB plane it exceeds HBM).
        """
        N, S = self.N, self.slab_bits
        phys = [self.axis_of[t] for t in tgts]

        def emit(op, newpos):
            self.layout_passes += 1
            if self._plan_only is not None:
                self._plan_only(*op)
            elif op[0] == "swap":
                self.re, self.im = _block_swap_step(self.re, self.im, N, S)
            elif op[0] == "move":
                self.re, self.im = _upper_move_step(self.re, self.im, op[1],
                                                    N, S, op[2])
            else:  # scatter
                self.re, self.im = _move_axes_step(self.re, self.im, op[1], N)
            self.axis_of = [newpos(p) for p in self.axis_of]

        plan_slab_residency(N, S, self.scatter_move_max, phys, emit)

    def _apply_slab_window(self, u: np.ndarray, tgts: tuple[int, ...]):
        """Apply one fused window with the lazy-layout slab scheme.

        Targets move into the minor slab via minor-safe passes (see
        :meth:`_ensure_slab_resident`) and STAY there — later windows on
        the same qubits pay nothing. The window is then expanded to the
        full slab (host kron) and applied as a pure
        (R, 2^S) @ (2^S, 2^S) MXU matmul (measured 1.37x the BW floor).
        """
        N, S = self.N, self.slab_bits
        slab_start = N - S
        self._ensure_slab_resident(tgts)
        positions = [self.axis_of[t] - slab_start for t in tgts]
        w_slab = fusion._np_expand(np.asarray(u, np.complex128), S, positions)
        if self.use_pallas:
            # streamed in-place Pallas matmul — the only variant whose
            # output aliases the input planes (required at N=30)
            self.re, self.im = pk.slab_matmul(
                self.re, self.im,
                jnp.asarray(np.ascontiguousarray(w_slab.real.T), jnp.float32),
                jnp.asarray(np.ascontiguousarray(w_slab.imag.T), jnp.float32),
                1 << S, interpret=self.interpret)
        else:
            self.re, self.im = _slab_matmul_step(
                self.re, self.im,
                jnp.asarray(np.ascontiguousarray(w_slab.real), jnp.float32),
                jnp.asarray(np.ascontiguousarray(w_slab.imag), jnp.float32),
                1 << S)

    def run_compiled(self, gates) -> "FastStatevector":
        """Slab-mode execution of a whole gate list as ONE jitted program.

        The per-step :meth:`run` dispatches each move/swap/matmul as its
        own jitted call — correct, but on the tunnelled TPU every dispatch
        costs an RTT (measured ~45 ms/step, 18x the kernel time). This
        traces the complete fused plan (layout moves + slab matmuls)
        into a single program keyed by the plan structure; re-running the
        same circuit shape is one dispatch.
        """
        if self.fusion_mode != "slab":
            raise ValueError("run_compiled requires fusion_mode='slab'")
        N, S = self.N, self.slab_bits
        slab_start = N - S
        windows = self._windows(gates)

        # plan on a shadow layout table (same logic as the per-step path)
        plan: list[tuple] = []
        mats: list[jax.Array] = []
        re, im, saved_layout = self.re, self.im, list(self.axis_of)
        saved_passes = self.layout_passes
        self.re = self.im = None  # force planning-only: steps must not run

        def record(kind, *args):
            plan.append((kind,) + args)

        self._plan_only = record
        try:
            for u, tgts in windows:
                self._ensure_slab_resident(tgts)
                positions = [self.axis_of[t] - slab_start for t in tgts]
                w_slab = fusion._np_expand(np.asarray(u, np.complex128), S,
                                           positions)
                record("matmul")
                mats.append(np.stack([
                    np.ascontiguousarray(w_slab.real.T),
                    np.ascontiguousarray(w_slab.imag.T)]).astype(np.float32))
            packed = (np.stack(mats) if mats
                      else np.zeros((0, 2, 1 << S, 1 << S), np.float32))
            prog = _chain_program(tuple(plan), packed.tobytes(), len(mats),
                                  N, S, self.use_pallas, self.interpret)
            self.re, self.im = prog(re, im)
        except BaseException:
            # roll back: the planes never moved, so the table (and the
            # pass counter incremented during plan-only tracing) must not
            # move either
            self.re, self.im, self.axis_of = re, im, saved_layout
            self.layout_passes = saved_passes
            raise
        finally:
            self._plan_only = None
        return self

    def _layout_is_identity(self) -> bool:
        return self.axis_of == list(range(self.N))

    def _logical_perm(self):
        """transpose perm taking the physical-order (2,)*N view to logical."""
        return list(self.axis_of)

    # -- readout ---------------------------------------------------------
    def norm_sq(self) -> float:
        @jax.jit
        def f(re, im):
            return jnp.sum(re * re) + jnp.sum(im * im)

        return float(f(self.re, self.im))

    def probs(self) -> jax.Array:
        """|amp|^2 vector in LOGICAL qubit order — any layout.

        Identity layouts are free. Permuted layouts at N <= 22 use the
        rank-N transpose. Larger N uses a RUN-GROUPED transpose instead:
        the logical order is a permutation of maximal physical-axis runs,
        so the view rank is the run count (slab-engine layouts are built
        from grouped moves and keep runs long). Only a pathological layout
        with more than 16 runs is refused — use :meth:`marginal` for
        subset readout there. (TPU caveat: the transpose output's minor
        dim is the last logical run; tiny trailing runs pay layout
        padding — full 2^N probs readout at N > 22 is itself a multi-GB
        fetch, so this path is for completeness, not the hot path.)
        """

        @jax.jit
        def f(re, im):
            return re * re + im * im

        p = f(self.re, self.im)
        if self._layout_is_identity():
            return p
        perm = self._logical_perm()
        if self.N <= 22:
            return jnp.transpose(p.reshape((2,) * self.N), perm).reshape(-1)
        # maximal runs of consecutive physical axes in the logical order
        runs = [[perm[0]]]
        for a in perm[1:]:
            if a == runs[-1][-1] + 1:
                runs[-1].append(a)
            else:
                runs.append([a])
        if len(runs) > 16:
            raise ValueError(
                f"probs() on a {len(runs)}-run permuted layout at N={self.N} "
                "would need a high-rank transpose; read a subset via "
                "marginal() instead")
        starts = sorted(range(len(runs)), key=lambda i: runs[i][0])
        shape = tuple(1 << len(runs[i]) for i in starts)
        tperm = tuple(starts.index(i) for i in range(len(runs)))

        @partial(jax.jit, static_argnames=("shape", "tperm"))
        def g(p, shape, tperm):
            return p.reshape(shape).transpose(tperm).reshape(-1)

        return g(p, shape=shape, tperm=tperm)

    def marginal(self, qubits) -> jax.Array:
        """Joint Born distribution of LOGICAL ``qubits`` (in the order
        given) — any N, any slab layout.

        One layout-aware grouped reduction: |amp|^2 reshaped to the
        interleaved-segment view of the qubits' physical axes (rank
        <= 2k+1, never rank N) and summed over the complementary
        segments; the k-bit result is then reordered to the requested
        qubit order on-host-side-shape only. Returns a (2^k,) vector,
        big-endian in ``qubits``. Closes the permuted-layout readout gap
        of :meth:`probs` (reference parity surface:
        ``simulators/dv_simulator/simulator.py`` measurement marginals).
        """
        qs = list(qubits)
        if len(set(qs)) != len(qs):
            raise ValueError(f"duplicate qubits in marginal: {qs}")
        if not all(0 <= q < self.N for q in qs):
            raise ValueError(f"qubits out of range for N={self.N}: {qs}")
        if len(qs) > 16:
            raise ValueError("marginal() of more than 16 qubits")
        pos = [self.axis_of[q] for q in qs]
        order = sorted(range(len(pos)), key=lambda i: pos[i])
        spos = tuple(pos[i] for i in order)
        shape, taxes = fusion._grouped_view(self.N, spos)
        others = tuple(i for i in range(len(shape)) if i not in taxes)
        # result axis j holds qubit qs[order[j]]; put qs[i] at axis i
        inv = tuple(order.index(i) for i in range(len(qs)))

        @partial(jax.jit,
                 static_argnames=("shape", "others", "inv"))
        def f(re, im, shape, others, inv):
            p = (re * re + im * im).reshape(shape)
            out = jnp.sum(p, axis=others)
            return out.transpose(inv).reshape(-1)

        return f(self.re, self.im, shape=shape, others=others, inv=inv)

    def probabilities(self, qubit: int) -> jax.Array:
        """Marginal (p0, p1) of one LOGICAL qubit — any N, any slab layout.

        Layout-aware single reduction: the qubit's physical axis position
        is resolved through ``axis_of`` and the |amp|^2 sum folds over the
        complementary axes, so no rank-N transpose is ever needed (unlike
        :meth:`probs`, which refuses permuted layouts at N>22). Mirrors the
        sharded engine's API (``parallel/shardmap_sv.py probabilities``).
        """
        if not 0 <= qubit < self.N:
            raise ValueError(f"qubit {qubit} out of range for N={self.N}")
        pos = self.axis_of[qubit]
        lead = 1 << pos                      # axes above the target bit
        trail = 1 << (self.N - 1 - pos)      # axes below

        @partial(jax.jit, static_argnums=(2, 3))
        def f(re, im, lead, trail):
            p = (re * re + im * im).reshape(lead, 2, trail)
            return jnp.sum(p, axis=(0, 2))

        return f(self.re, self.im, lead, trail)

    def sample(self, key, shots: int = 1) -> np.ndarray:
        """Terminal Born sampling of all qubits: (shots,) basis indices.

        Two-stage exact factorisation — a categorical over row sums
        (marginal of the leading N-C_BITS bits) then a categorical over the
        chosen row — so no 2^N logits temp is ever materialised; at N=30
        the temps are a (2^19,) row-sum vector and (shots, 2^11) rows.
        """
        cbits = min(self.c_bits, self.N)
        C = 1 << cbits
        R = (1 << self.N) // C

        @jax.jit
        def f(re, im, key):
            p = (re * re + im * im).reshape(R, C)
            rows = jnp.sum(p, axis=1)                      # (R,)
            k1, k2 = jax.random.split(key)
            r = jax.random.categorical(k1, jnp.log(rows + 1e-30),
                                       shape=(shots,))    # (shots,)
            pr = p[r, :]                                   # (shots, C)
            c = jax.random.categorical(k2, jnp.log(pr + 1e-30), axis=-1)
            return r * C + c

        samples = np.asarray(f(self.re, self.im, key))
        if self._layout_is_identity():
            return samples
        # slab layout: sampled indices are in PHYSICAL axis order — remap
        # each bit to its logical position (host-side, (shots,) ints)
        N = self.N
        out = np.zeros_like(samples)
        for l, p in enumerate(self.axis_of):
            bit = (samples >> (N - 1 - p)) & 1
            out |= bit << (N - 1 - l)
        return out
