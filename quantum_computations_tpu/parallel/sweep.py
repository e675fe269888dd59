"""Monte-Carlo sweep batching.

Replaces the reference's ``multiprocessing.Pool(3).imap_unordered`` parameter
sweeps (``average_clifford_fidelity.py:212-216`` et al.) with vmapped batches
of PRNG keys, optionally sharded across a device mesh — this is where the
"trajectories/sec/chip" throughput comes from.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils import as_key
from .mesh import data_mesh


def batched_sweep(trajectory_fn, n: int, rng_seed=None, *, jit: bool = True):
    """Run `trajectory_fn(key) -> pytree` for n independent keys via vmap.

    Returns a pytree with a leading batch axis of size n.
    """
    keys = jax.random.split(as_key(rng_seed), n)
    fn = jax.vmap(trajectory_fn)
    if jit:
        fn = jax.jit(fn)
    return fn(keys)


def sharded_sweep(trajectory_fn, n: int, rng_seed=None, *, mesh: Mesh | None = None):
    """vmapped sweep with the batch axis sharded over a 1-D device mesh.

    n is rounded up to a multiple of the device count; surplus trajectories
    are computed and discarded (cheaper than ragged batches).
    """
    mesh = mesh if mesh is not None else data_mesh()
    d = int(np.prod(mesh.devices.shape))
    n_pad = ((n + d - 1) // d) * d
    keys = jax.random.split(as_key(rng_seed), n_pad)
    axis = mesh.axis_names[0]
    keys = jax.device_put(keys, NamedSharding(mesh, P(axis)))

    fn = jax.jit(jax.vmap(trajectory_fn))
    out = fn(keys)
    return jax.tree.map(lambda x: x[:n], out)
