"""Pallas TPU kernels for the DV statevector hot path.

The single-qubit gate update is the canonical HBM-bound operation of a
statevector simulator: every amplitude is read and written once per gate, so
the speed-of-light is 2 x state-size of HBM traffic. This kernel fuses the
2x2 mix of both qubit branches into one pass over the state, with the state
split into (real, imag) float planes — the TPU backend here has no native
complex support in Pallas, and split-real is also how XLA lowers complex
arithmetic internally.

Layout: the state is viewed as (outer, 2, inner) with outer = 2^q,
inner = 2^(N-q-1); the grid tiles (outer, inner) and each program mixes the
two middle-axis slices with the 2x2 unitary held in SMEM.

The kernel requires inner >= 128 (the qubit must not sit in the last 7
axes); callers fall back to the XLA tensordot path otherwise — for those
qubits the permutation cost would dominate anyway.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mix_kernel(u_ref, xr_ref, xi_ref, or_ref, oi_ref):
    """out[b] = sum_c U[b,c] x[c], complex as split real.

    The state is viewed as a dense 2D array (outer*2, inner): row 2o holds the
    qubit-0 branch of outer index o, row 2o+1 the qubit-1 branch. Blocks are
    dense (B_r, B_in) tiles (full sublane utilisation); the branch split is a
    value-level reshape inside the kernel.

    u_ref: SMEM (2, 2, 2) — [re/im, row, col]; x/o refs: VMEM (B_r, B_in).
    """
    br, bi = xr_ref.shape
    xr = xr_ref[:].reshape(br // 2, 2, bi)
    xi = xi_ref[:].reshape(br // 2, 2, bi)
    xr0, xr1 = xr[:, 0, :], xr[:, 1, :]
    xi0, xi1 = xi[:, 0, :], xi[:, 1, :]

    rows_r = []
    rows_i = []
    for row in range(2):
        ur0 = u_ref[0, row, 0]
        ur1 = u_ref[0, row, 1]
        ui0 = u_ref[1, row, 0]
        ui1 = u_ref[1, row, 1]
        rows_r.append(ur0 * xr0 - ui0 * xi0 + ur1 * xr1 - ui1 * xi1)
        rows_i.append(ur0 * xi0 + ui0 * xr0 + ur1 * xi1 + ui1 * xr1)

    or_ref[:] = jnp.stack(rows_r, axis=1).reshape(br, bi)
    oi_ref[:] = jnp.stack(rows_i, axis=1).reshape(br, bi)


@partial(jax.jit, static_argnames=("qubit", "num_qubits", "interpret"))
def apply_1q(state_re: jax.Array, state_im: jax.Array, u: jax.Array,
             qubit: int, num_qubits: int, *, interpret: bool = False):
    """Apply a single-qubit unitary to a split-real statevector.

    state_re/state_im: shape (2**num_qubits,) float32.
    u: (2, 2) complex (host or device) — passed to SMEM as (2,2,2) float.
    Returns (out_re, out_im).
    """
    N = num_qubits
    outer = 1 << qubit
    inner = 1 << (N - qubit - 1)
    if inner < 128:
        raise ValueError("apply_1q pallas kernel requires inner >= 128; use the XLA path")

    u = jnp.asarray(u)
    u_split = jnp.stack([u.real, u.imag]).astype(jnp.float32)

    rows = outer * 2  # row 2o+b = branch b of outer index o (pure view)
    b_in = min(inner, 2048)
    b_r = min(rows, max(2, 16 * 2048 // b_in))
    grid = (rows // b_r, inner // b_in)

    shape2 = (rows, inner)
    xr = state_re.reshape(shape2)
    xi = state_im.reshape(shape2)

    spec = pl.BlockSpec((b_r, b_in), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(shape2, jnp.float32)] * 2
    out_re, out_im = pl.pallas_call(
        _mix_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec,
        ],
        out_specs=[spec, spec],
        out_shape=out_shape,
        interpret=interpret,
    )(u_split, xr, xi)
    return out_re.reshape(-1), out_im.reshape(-1)


def _mix4_kernel(u_ref, xr_ref, xi_ref, or_ref, oi_ref):
    """4x4 branch mix for an ADJACENT qubit pair, split-real.

    State viewed as (outer*4, inner) rows; row 4o+b holds branch b in
    {00,01,10,11} of outer index o. u_ref: SMEM (2, 4, 4) [re/im, row, col].
    """
    br, bi = xr_ref.shape
    xr = xr_ref[:].reshape(br // 4, 4, bi)
    xi = xi_ref[:].reshape(br // 4, 4, bi)

    rows_r, rows_i = [], []
    for row in range(4):
        acc_r = None
        acc_i = None
        for col in range(4):
            ur = u_ref[0, row, col]
            ui = u_ref[1, row, col]
            tr = ur * xr[:, col, :] - ui * xi[:, col, :]
            ti = ur * xi[:, col, :] + ui * xr[:, col, :]
            acc_r = tr if acc_r is None else acc_r + tr
            acc_i = ti if acc_i is None else acc_i + ti
        rows_r.append(acc_r)
        rows_i.append(acc_i)
    or_ref[:] = jnp.stack(rows_r, axis=1).reshape(br, bi)
    oi_ref[:] = jnp.stack(rows_i, axis=1).reshape(br, bi)


@partial(jax.jit, static_argnames=("qubit", "num_qubits", "interpret"))
def apply_2q_adjacent(state_re: jax.Array, state_im: jax.Array, u: jax.Array,
                      qubit: int, num_qubits: int, *, interpret: bool = False):
    """Apply a 2-qubit unitary to the ADJACENT pair (qubit, qubit+1).

    u: (4, 4) complex with row/col index = 2*b_first + b_second.
    Requires inner = 2^(N-qubit-2) >= 128. Nearest-neighbour pairs are the
    native gate topology of the reference's circuits.
    """
    N = num_qubits
    outer = 1 << qubit
    inner = 1 << (N - qubit - 2)
    if inner < 128:
        raise ValueError("apply_2q_adjacent requires inner >= 128; use the XLA path")

    u = jnp.asarray(u)
    u_split = jnp.stack([u.real, u.imag]).astype(jnp.float32)

    rows = outer * 4
    b_in = min(inner, 2048)
    b_r = min(rows, max(4, 16 * 2048 // b_in))
    grid = (rows // b_r, inner // b_in)

    shape2 = (rows, inner)
    xr = state_re.reshape(shape2)
    xi = state_im.reshape(shape2)

    spec = pl.BlockSpec((b_r, b_in), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(shape2, jnp.float32)] * 2
    out_re, out_im = pl.pallas_call(
        _mix4_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec],
        out_specs=[spec, spec],
        out_shape=out_shape,
        interpret=interpret,
    )(u_split, xr, xi)
    return out_re.reshape(-1), out_im.reshape(-1)


def apply_1q_xla(state_re, state_im, u, qubit: int, num_qubits: int):
    """Reference XLA implementation of the same split-real update."""
    N = num_qubits
    shape3 = (1 << qubit, 2, 1 << (N - qubit - 1))
    xr = state_re.reshape(shape3)
    xi = state_im.reshape(shape3)
    u = jnp.asarray(u)
    ur = u.real.astype(xr.dtype)
    ui = u.imag.astype(xr.dtype)
    out_r = jnp.einsum("bc,acj->abj", ur, xr) - jnp.einsum("bc,acj->abj", ui, xi)
    out_i = jnp.einsum("bc,acj->abj", ur, xi) + jnp.einsum("bc,acj->abj", ui, xr)
    return out_r.reshape(-1), out_i.reshape(-1)
