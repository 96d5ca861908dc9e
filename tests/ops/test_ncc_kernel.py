"""Pallas NCC kernel vs XLA reference (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from densepoints_tpu.core.scores import ncc_score
from densepoints_tpu.ops.ncc import ncc_pairs_pallas


def test_kernel_matches_reference(rng):
    a = rng.uniform(0, 255, (37, 121)).astype(np.float32)
    b = rng.uniform(0, 255, (37, 121)).astype(np.float32)
    expected = np.asarray(ncc_score(a, b))
    got = np.asarray(ncc_pairs_pallas(jnp.asarray(a), jnp.asarray(b), interpret=True))
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=1e-5)


def test_kernel_masked(rng):
    a = rng.uniform(0, 255, (8, 121)).astype(np.float32)
    b = rng.uniform(0, 255, (8, 121)).astype(np.float32)
    mask = rng.uniform(size=(8, 121)) > 0.3
    mask[0] = False  # empty row -> -1 sentinel
    expected = np.asarray(ncc_score(a, b, jnp.asarray(mask)))
    got = np.asarray(
        ncc_pairs_pallas(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask), interpret=True
        )
    )
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=1e-5)
    assert got[0] == -1.0


def test_kernel_golden_value():
    A = np.array([1, 2, 3, -1, -2, -3, 1, 2, 3], np.float32)
    B = np.array([2, 0, 5, -4, 5, -2, -1, 0, -3], np.float32)
    got = np.asarray(
        ncc_pairs_pallas(jnp.asarray(A[None]), jnp.asarray(B[None]), interpret=True)
    )
    np.testing.assert_allclose(got[0], 0.1005653, rtol=1e-5)
