"""Bucket/chunk policy unit tests (memory-policy helpers)."""

import numpy as np

from quantum_computations_tpu.gkp.batched import BatchedGKP
from quantum_computations_tpu.ops.linalg import bucket
from quantum_computations_tpu.ops.streamed import _pick_chunks


def test_pow2_bucket():
    assert [bucket(n) for n in (0, 1, 2, 3, 5, 8, 9, 100)] == [1, 1, 2, 4, 8, 8, 16, 128]


def test_trim_bucket_fine_grained():
    tb = BatchedGKP._trim_bucket
    assert tb(1) == 1 and tb(2) == 2 and tb(3) == 4 and tb(16) == 16
    assert tb(17) == 32
    assert tb(33) == 48  # NOT 64: multiples of 16 above 16
    assert tb(48) == 48 and tb(49) == 64 and tb(100) == 112


def test_pick_chunks_divide_and_fit():
    a, d, b = 48, 1000, 32
    ac, bc = _pick_chunks(a, d, b)
    assert a % ac == 0 and b % bc == 0
    assert ac * d * d * bc <= (1 << 25)
    # the b bond is kept whole in preference to a
    assert bc == b
    # small tensors are unchunked
    assert _pick_chunks(2, 64, 2) == (2, 2)
