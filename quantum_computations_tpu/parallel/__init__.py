"""Device-mesh sharding and batched Monte-Carlo sweeps.

The reference has no distributed backend — its only parallelism is
``multiprocessing.Pool`` sweeps (SURVEY.md §2.7). The TPU-native equivalents:

- :mod:`.mesh` — mesh construction helpers (one binary mesh axis per sharded
  qubit for the DV engine; 1-D data meshes for trajectory sweeps)
- :mod:`.statevector` — a ≥30-qubit state vector sharded over the mesh with
  XLA-inserted collectives for gates on sharded qubit axes
- :mod:`.sweep` — vmap/pmap-style Monte-Carlo batching over PRNG keys,
  replacing ``Pool.imap_unordered`` parameter sweeps
"""

from .mesh import qubit_mesh, data_mesh
from .statevector import ShardedStateVector, apply_gate_sharded
from .sweep import batched_sweep, sharded_sweep

__all__ = [
    "qubit_mesh", "data_mesh", "ShardedStateVector", "apply_gate_sharded",
    "batched_sweep", "sharded_sweep",
]
