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


# ---------------------------------------------------------------------------
# fused gate chains: k gates per HBM pass
# ---------------------------------------------------------------------------
#
# A single-gate pass is HBM-bound: read+write the whole state per gate. The
# fused kernel applies a CHAIN of single-qubit gates to each VMEM-resident
# block before writing it back, so k gates cost ONE pass (k/[2 x state] of
# the single-gate bandwidth floor).
#
# Layout: the state is viewed as (R, C) = (2^(N-c), 2^c). A block is
# (block_rows, C). A gate on amplitude-bit p (LSB = 0) is block-local iff
#   - p in [lane_min, c): the branch pair lives within a block row at lane
#     stride 2^p (lane_min = 7 keeps the minor dim >= 128 lanes), or
#   - p in [c, c + log2(block_rows)): the pair lives across block rows
#     (sublane mixing).
# Gates on other bits need a different layout pass (or the XLA path).

_LANE_MIN_BITS = 7  # minor-most mixing stride >= 128 lanes

# Default (c_bits=11, block_rows=32) keeps the per-block VMEM footprint at
# 32*2048*4 = 256 KB/plane. Mosaic allocates kernel stack for the UNROLLED
# chain's live temporaries, which scales with block size x chain length:
# measured on v5e, a 24-gate chain at (128, 2048) blocks needs ~36 MB of
# scoped VMEM vs the 16 MB hardware limit; (32, 2048) fits at ~9 MB.
_MAX_CHAIN_LEN = 24  # stack also scales with k — cap chains at the measured config


def fusable_bits(num_qubits: int, c_bits: int = 11, block_rows: int = 32):
    """Amplitude-bit positions a (c_bits, block_rows) layout can fuse."""
    hi = min(num_qubits, c_bits + int(np.log2(block_rows)))
    return tuple(range(_LANE_MIN_BITS, min(c_bits, num_qubits))) + \
        tuple(range(c_bits, hi))


def _fused_chain_kernel(bits, c_bits):
    """Kernel applying one 2x2 split-real mix per (gate, bit) to the block."""

    def kernel(u_ref, xr_ref, xi_ref, or_ref, oi_ref):
        br, C = xr_ref.shape
        xr = xr_ref[:]
        xi = xi_ref[:]
        for g, p in enumerate(bits):
            if p < c_bits:
                shape = (br, C >> (p + 1), 2, 1 << p)
                ax = 2
            else:
                rp = p - c_bits
                shape = (br >> (rp + 1), 2, 1 << rp, C)
                ax = 1
            xr4 = xr.reshape(shape)
            xi4 = xi.reshape(shape)
            sel0 = tuple(slice(None) if i != ax else 0 for i in range(4))
            sel1 = tuple(slice(None) if i != ax else 1 for i in range(4))
            xr0, xr1 = xr4[sel0], xr4[sel1]
            xi0, xi1 = xi4[sel0], xi4[sel1]
            rows_r, rows_i = [], []
            for row in range(2):
                ur0, ur1 = u_ref[g, 0, row, 0], u_ref[g, 0, row, 1]
                ui0, ui1 = u_ref[g, 1, row, 0], u_ref[g, 1, row, 1]
                rows_r.append(ur0 * xr0 - ui0 * xi0 + ur1 * xr1 - ui1 * xi1)
                rows_i.append(ur0 * xi0 + ui0 * xr0 + ur1 * xi1 + ui1 * xr1)
            xr = jnp.stack(rows_r, axis=ax).reshape(br, C)
            xi = jnp.stack(rows_i, axis=ax).reshape(br, C)
        or_ref[:] = xr
        oi_ref[:] = xi

    return kernel


def _slab_mix_kernel(w_ref, xr_ref, xi_ref, or_ref, oi_ref):
    """Split-real (Br, d) @ (d, d) slab-window mix on the MXU.

    w_ref: VMEM (2, d, d) [re/im], already transposed so the mix is a
    plain right-multiplication. Outputs alias the inputs (in-place on
    HBM) — the N=30 single-chip requirement that the XLA dot cannot
    satisfy (it cannot alias a matmul's input to its output, so the
    split-real window at N=30 needs 2x4 GB in + 2x4 GB out + temps).
    """
    wr = w_ref[0]
    wi = w_ref[1]
    xr = xr_ref[:]
    xi = xi_ref[:]
    or_ref[:] = (jnp.dot(xr, wr, preferred_element_type=jnp.float32)
                 - jnp.dot(xi, wi, preferred_element_type=jnp.float32))
    oi_ref[:] = (jnp.dot(xi, wr, preferred_element_type=jnp.float32)
                 + jnp.dot(xr, wi, preferred_element_type=jnp.float32))


@partial(jax.jit, static_argnames=("slab_dim", "interpret"))
def slab_matmul(state_re: jax.Array, state_im: jax.Array,
                wt_re: jax.Array, wt_im: jax.Array, slab_dim: int,
                *, interpret: bool = False):
    """Apply a slab-window unitary in-place: out = x @ W^T, split-real.

    ``wt_re``/``wt_im``: the ALREADY-TRANSPOSED window matrix (d, d).
    Streams (block_rows, d) tiles through VMEM with outputs aliased onto
    the input planes; one HBM read+write of the state total.
    """
    d = slab_dim
    n = state_re.shape[-1] if state_re.ndim else state_re.size
    R = state_re.size // d
    block_rows = min(R, 2048)
    del n

    xr = state_re.reshape(R, d)
    xi = state_im.reshape(R, d)
    w = jnp.stack([wt_re, wt_im]).astype(jnp.float32)

    spec = pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((R, d), jnp.float32)] * 2
    out_re, out_im = pl.pallas_call(
        _slab_mix_kernel,
        grid=(R // block_rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), spec, spec],
        out_specs=[spec, spec],
        out_shape=out_shape,
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(w, xr, xi)
    return out_re.reshape(-1), out_im.reshape(-1)


@partial(jax.jit, static_argnames=("bits", "num_qubits", "c_bits",
                                   "block_rows", "donate", "interpret"))
def apply_1q_chain(state_re: jax.Array, state_im: jax.Array, us: jax.Array,
                   bits: tuple, num_qubits: int, *, c_bits: int = 11,
                   block_rows: int = 32, donate: bool = False,
                   interpret: bool = False):
    """Apply a chain of single-qubit unitaries in ONE pass over the state.

    us: (k, 2, 2) complex stacked gates; bits: length-k tuple of amplitude-bit
    positions (LSB = 0; qubit q in the big-endian convention of
    :func:`apply_1q` sits at bit ``num_qubits - q - 1``). Every bit must be
    in :func:`fusable_bits` for this (c_bits, block_rows) layout.
    ``donate=True`` aliases outputs onto the input buffers (in-place on HBM)
    — required for N=30 single-chip states.
    """
    N = num_qubits
    C = 1 << c_bits
    R = 1 << (N - c_bits)
    allowed = set(fusable_bits(N, c_bits, block_rows))
    if not set(bits) <= allowed:
        raise ValueError(f"bits {sorted(set(bits) - allowed)} not fusable "
                         f"with c_bits={c_bits}, block_rows={block_rows}")
    b_r = min(block_rows, R)

    us = jnp.asarray(us)
    u_split = jnp.stack([us.real, us.imag], axis=1).astype(jnp.float32)

    shape2 = (R, C)
    xr = state_re.reshape(shape2)
    xi = state_im.reshape(shape2)

    spec = pl.BlockSpec((b_r, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(shape2, jnp.float32)] * 2
    kwargs = {}
    if donate:
        kwargs["input_output_aliases"] = {1: 0, 2: 1}
    out_re, out_im = pl.pallas_call(
        _fused_chain_kernel(bits, c_bits),
        grid=(R // b_r,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec],
        out_specs=[spec, spec],
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(u_split, xr, xi)
    return out_re.reshape(-1), out_im.reshape(-1)
