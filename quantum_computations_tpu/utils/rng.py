"""PRNG-key plumbing.

The framework threads explicit jax PRNG keys everywhere (the reference mixes
seeded NumPy generators with one global-RNG leak at ``dv gates.py:183``; we
standardise on deterministic key-splitting instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def is_key(x) -> bool:
    """True if x is a jax PRNG key (typed key or legacy uint32[2])."""
    if not isinstance(x, jax.Array):
        return False
    if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
        return True
    return x.dtype == jnp.uint32 and x.shape == (2,)


def as_key(rng_seed) -> jax.Array:
    """Coerce a seed-or-key argument into a PRNG key.

    None → fresh entropy; int → PRNGKey(int); key → itself.
    """
    if is_key(rng_seed):
        return rng_seed
    if rng_seed is None:
        rng_seed = np.random.SeedSequence().entropy % (2**31)
    return jax.random.PRNGKey(int(rng_seed))
