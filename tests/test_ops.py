"""Pallas kernel equivalence (interpret mode on CPU) vs the jnp reference."""

import numpy as np
import pytest

from lirec_tpu.ops.gather_pool import (
    gather_masked_sum,
    gather_masked_sum_reference,
)


@pytest.mark.parametrize("M,R,N,D", [(16, 18, 64, 128), (8, 5, 32, 256)])
def test_gather_masked_sum_interpret(M, R, N, D):
    rng = np.random.default_rng(0)
    table = rng.standard_normal((N, D)).astype(np.float32)
    idx = rng.integers(0, N, (M, R)).astype(np.int32)
    mask = (rng.random((M, R)) < 0.5).astype(np.float32)
    ref = gather_masked_sum_reference(table, idx, mask)
    out = gather_masked_sum(table, idx, mask, force="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dispatch_falls_back_on_cpu():
    rng = np.random.default_rng(1)
    table = rng.standard_normal((32, 128)).astype(np.float32)
    idx = rng.integers(0, 32, (8, 4)).astype(np.int32)
    mask = np.ones((8, 4), np.float32)
    out = gather_masked_sum(table, idx, mask)  # auto -> reference on CPU
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(gather_masked_sum_reference(table, idx, mask)),
        atol=1e-6,
    )
