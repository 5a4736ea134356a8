"""Pallas kernels vs XLA reference implementations (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from sqrtlm_slam_tpu.ops.hamming import (
    hamming_matrix_pallas,
    hamming_matrix_reference,
)


def test_hamming_pallas_matches_reference():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randint(0, 2**31, (300, 8)).astype(np.uint32))
    t = jnp.asarray(rng.randint(0, 2**31, (450, 8)).astype(np.uint32))
    ref = hamming_matrix_reference(q, t)
    out = hamming_matrix_pallas(q, t, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_hamming_identity_is_zero():
    rng = np.random.RandomState(1)
    d = jnp.asarray(rng.randint(0, 2**31, (64, 8)).astype(np.uint32))
    out = hamming_matrix_pallas(d, d, interpret=True)
    assert int(jnp.sum(jnp.diagonal(out))) == 0
