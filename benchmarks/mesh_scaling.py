#!/usr/bin/env python
"""Trajectories/sec vs mesh size for the data-sharded batched GKP engine.

Weak-scaling measurement on a virtual CPU mesh (the driver environment has
one physical TPU chip; `--xla_force_host_platform_device_count` provides the
n-device mesh, the same recipe as tests/conftest.py). For each mesh size n
the batch is TRAJ_PER_DEV * n trajectories sharded over the batch axis, so
perfect weak scaling is flat sec/traj, i.e. traj/s proportional to n.

Caveat printed with the data: all virtual CPU devices share one host's
cores, so CPU-mesh scaling understates real multi-chip scaling whenever a
single device's program already saturates the host (the measurement is a
lower bound on sharding benefit; its purpose is to prove the data-sharded
path executes and to catch pathological NON-scaling in the collective
layout).

Prints one JSON line per mesh size.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

TRAJ_PER_DEV = int(os.environ.get("QCT_SCALE_TRAJ_PER_DEV", 4))
REPS = int(os.environ.get("QCT_SCALE_REPS", 3))
MESHES = [int(x) for x in os.environ.get("QCT_SCALE_MESHES", "1,2,4,8").split(",")]


def run_one(n_devices: int) -> dict:
    """One mesh size in a fresh subprocess (device count is process-global)."""
    code = f"""
import os, sys, time, json
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {REPO!r})
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from quantum_computations_tpu.config import SVDOptions
from quantum_computations_tpu.dv import State as DVState, gates as dvg
from quantum_computations_tpu.gkp import MBGKPCircuit, db2eps
from quantum_computations_tpu.gkp.batched import BatchedGKP
from quantum_computations_tpu.gkp.compiled import logical_coeffs
from quantum_computations_tpu.parallel import data_mesh

n = {n_devices}
assert len(jax.devices()) >= n, jax.devices()
mesh = data_mesh(devices=jax.devices()[:n])
shard = NamedSharding(mesh, P(mesh.axis_names[0]))
batch = {TRAJ_PER_DEV} * n

circ = MBGKPCircuit.transpile([dvg.H(0), dvg.P(0), dvg.CZ(0, 1), dvg.H(1)], 2)
circ.fill()
qs = np.linspace(-20, 20, 256)
runner = BatchedGKP(qs, float(db2eps(10.0)),
                    SVDOptions(max_bond_dim=8, rel_err=1e-2),
                    adaptive=True, granularity="op")
coeffs = logical_coeffs([DVState.ZERO] * 2)

def once(seed):
    t, f = runner.run_circuit(circ, coeffs, batch, rng_seed=seed,
                              data_sharding=shard)
    rho_re, _ = runner.readout(t, f)
    tr = np.asarray(jnp.trace(jnp.asarray(rho_re), axis1=1, axis2=2))
    assert np.all(np.isfinite(tr)), tr
    return tr

once(0)  # compile warm-up (per-op executors, cached within process)
t0 = time.perf_counter()
for r in range({REPS}):
    once(r + 1)
dt = time.perf_counter() - t0
print(json.dumps(dict(n_devices=n, batch=batch,
                      traj_per_sec=round({REPS} * batch / dt, 3),
                      sec_per_traj=round(dt / ({REPS} * batch), 3))))
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={n_devices}"])
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"mesh={n_devices} failed:\n{out.stdout}\n{out.stderr}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    rows = []
    for n in MESHES:
        row = run_one(n)
        rows.append(row)
        print(json.dumps(row), flush=True)
    base = rows[0]["traj_per_sec"] / rows[0]["n_devices"]
    for row in rows:
        row["scaling_efficiency"] = round(
            row["traj_per_sec"] / (base * row["n_devices"]), 3)
    out_path = os.path.join(HERE, "mesh_scaling_results.json")
    with open(out_path, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(json.dumps({"written": out_path, "rows": rows}))


if __name__ == "__main__":
    main()
