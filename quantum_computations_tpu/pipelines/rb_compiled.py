"""Randomised benchmarking with the compiled batched engine — fully on-chip.

TPU-native counterpart of :mod:`.rb`: each random MB-Clifford circuit is
compiled once into a single XLA program that runs the GKP trajectory, the
exact DV reference state, the logical readout, the syndrome correction AND
the fidelity/purity scoring — then vmaps over a batch of trajectories. Only
real scalars cross the host boundary (the TPU backend cannot transfer complex
buffers), and the reference's one-trajectory-per-process sampling
(multiprocessing.Pool) becomes one device launch per circuit.

Output schema matches ``gkp_rb.dat``: {db, depth, fidelity, purity}.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SVDOptions, complex_dtype
from ..cv.mps import MPS
from ..dv import gates as dv_gates, qop
from ..dv.states import State as DVState
from ..gkp.compiled import CompiledGKP
from ..gkp.utils import full_logical_density_mps
from ..utils import as_key
from .rb import random_circ
from .common import config_cli, prepare_output, write_data


def _dv_state_in_trace(dv_circ, N: int):
    """Exact DV final state computed with traced jnp ops (structure static)."""
    state = jnp.zeros((2**N,), dtype=complex_dtype()).at[0].set(1.0)
    for gate in dv_circ:
        state = qop.apply_unitary(state, jnp.asarray(gate.matrix, complex_dtype()),
                                  tuple(gate.indices))
    return state


def make_scored_trajectory(prog: CompiledGKP, dv_circ, init_states: list[DVState]):
    """fn(key) -> (fidelity, purity): one full scored RB trajectory in-trace."""
    from ..gkp.compiled import logical_coeffs

    N = prog.N
    coeffs = logical_coeffs(init_states)
    psi_ref = None  # computed inside the trace

    def fn(key):
        frame, rho_re, rho_im = prog.trajectory_with_readout(coeffs, key)
        rho = rho_re + 1j * rho_im
        psi = _dv_state_in_trace(dv_circ, N)
        fidelity = jnp.real(jnp.conj(psi) @ rho @ psi)
        purity = jnp.trace(rho @ rho).real
        return fidelity, purity

    return fn


def sample_depth_compiled(db: float, depth: int, num_circuits: int,
                          traj_per_circuit: int, rng_seed=0, *,
                          grid_points: int = 512, grid_span: float = 20.0,
                          max_bond_dim: int = 16, rel_err: float = 1e-2) -> list[dict]:
    """RB samples: num_circuits random circuits x traj_per_circuit trajectories."""
    from ..gkp import MBGKPCircuit, db2eps

    N = 2
    qs = np.linspace(-grid_span, grid_span, grid_points)
    eps = float(db2eps(db))
    svd = SVDOptions(max_bond_dim=max_bond_dim, rel_err=rel_err)
    circ_rng = np.random.default_rng(
        rng_seed if isinstance(rng_seed, (int, np.integer)) else None
    )
    key = as_key(rng_seed)

    samples = []
    for _ in range(num_circuits):
        dv_circ, gkp_circ = random_circ(N, depth, circ_rng)
        prog = CompiledGKP(gkp_circ, qs, eps, svd)
        fn = jax.jit(jax.vmap(make_scored_trajectory(prog, dv_circ, [DVState.ZERO] * N)))
        key, sub = jax.random.split(key)
        fids, purs = fn(jax.random.split(sub, traj_per_circuit))
        for f, p in zip(np.asarray(fids), np.asarray(purs)):
            samples.append({
                "db": float(db), "depth": int(depth),
                "fidelity": float(f), "purity": float(p),
            })
    return samples


@dataclasses.dataclass
class RBCompiledConfig:
    """On-chip RB sweep (gkp_rb.dat schema)."""

    dbs: str = "5.83,6.67,7.5"
    depths: str = "4,8"
    num_circuits: int = 4
    traj_per_circuit: int = 16
    grid_points: int = 512
    max_bond_dim: int = 16
    rel_err: float = 1e-2
    rng_seed: int = 0
    data_file: str = "gkp_rb_compiled.dat"
    overwrite: bool = False


def main(config: RBCompiledConfig | None = None):
    config = config or RBCompiledConfig()
    prepare_output(config.data_file, config.overwrite)
    data = []
    for db in [float(x) for x in str(config.dbs).split(",")]:
        for depth in [int(x) for x in str(config.depths).split(",")]:
            data += sample_depth_compiled(
                db, depth, config.num_circuits, config.traj_per_circuit,
                config.rng_seed, grid_points=config.grid_points,
                max_bond_dim=config.max_bond_dim, rel_err=config.rel_err,
            )
            if config.data_file:
                write_data(config.data_file, data)
    return data


if __name__ == "__main__":
    main(config_cli(RBCompiledConfig))
