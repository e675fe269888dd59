"""quantum_computations_tpu — TPU-native quantum-computing simulation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference repo
``frederik-kofoed-marqversen/quantum_computations`` (see SURVEY.md):

- :mod:`.dv`   — qubit state-vector simulator (single-chip jitted + mesh-sharded)
- :mod:`.cv`   — continuous-variable functional-MPS simulator on a position grid
- :mod:`.gkp`  — measurement-based GKP-qubit simulator layered on the CV engine
- :mod:`.ops`  — shared numerical kernels (truncated SVD, interpolation, theta fns)
- :mod:`.parallel` — device-mesh sharding and batched Monte-Carlo sweeps
- :mod:`.pipelines` — research pipelines (Grover, RB, Clifford fidelity,
  tomography, GKP-EC performance analysis)
- :mod:`.distill`  — distillation-sequence optimisation (CPU, exact arithmetic)

Design notes: all array math is JAX; shapes are static (bond dimensions are
padded to fixed capacities with truncation expressed as zero-masking), so whole
measurement-based trajectories jit-compile into single XLA programs and vmap
over trajectory batches.
"""

import logging as _logging

_logging.getLogger(__name__).addHandler(_logging.NullHandler())

__version__ = "0.1.0"
