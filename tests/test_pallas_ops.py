"""Pallas kernels vs reference implementations (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from besskge_tpu.ops.pallas_distance import l1_distance_matrix


def test_l1_distance_matrix_interpret():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(37, 100)).astype(np.float32)
    b = rng.normal(size=(211, 100)).astype(np.float32)
    got = np.asarray(
        l1_distance_matrix(jnp.asarray(a), jnp.asarray(b), interpret=True)
    )
    expected = np.abs(a[:, None, :] - b[None, :, :]).sum(-1)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)


def test_l1_distance_matrix_aligned_shapes():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(128, 64)).astype(np.float32)
    b = rng.normal(size=(256, 64)).astype(np.float32)
    got = np.asarray(
        l1_distance_matrix(jnp.asarray(a), jnp.asarray(b), interpret=True)
    )
    expected = np.abs(a[:, None, :] - b[None, :, :]).sum(-1)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)
