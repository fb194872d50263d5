"""Tests for besskge_tpu.utils (device helpers, entity filter)."""

import jax.numpy as jnp
import numpy as np

from besskge_tpu.utils import (
    complex_multiplication,
    complex_rotation,
    gather_indices,
    get_entity_filter,
)


def test_gather_indices_matching_rows():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 20)).astype(np.float32)
    idx = rng.integers(0, 20, size=(5, 7))
    out = np.asarray(gather_indices(jnp.asarray(x), jnp.asarray(idx)))
    np.testing.assert_allclose(out, np.take_along_axis(x, idx, axis=1))


def test_gather_indices_broadcast():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 20)).astype(np.float32)
    idx = rng.integers(0, 20, size=(1, 7))
    out = np.asarray(gather_indices(jnp.asarray(x), jnp.asarray(idx)))
    np.testing.assert_allclose(
        out, np.take_along_axis(x, np.broadcast_to(idx, (5, 7)), axis=1)
    )
    # Single data row, many index rows.
    x1 = x[:1]
    idx5 = rng.integers(0, 20, size=(5, 3))
    out = np.asarray(gather_indices(jnp.asarray(x1), jnp.asarray(idx5)))
    np.testing.assert_allclose(out, x1[0][idx5])


def test_complex_multiplication_matches_numpy():
    rng = np.random.default_rng(2)
    d = 8
    v1 = rng.normal(size=(6, 2 * d)).astype(np.float32)
    v2 = rng.normal(size=(6, 2 * d)).astype(np.float32)
    out = np.asarray(complex_multiplication(jnp.asarray(v1), jnp.asarray(v2)))
    c1 = v1[:, :d] + 1j * v1[:, d:]
    c2 = v2[:, :d] + 1j * v2[:, d:]
    prod = c1 * c2
    np.testing.assert_allclose(out[:, :d], prod.real, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, d:], prod.imag, rtol=1e-5, atol=1e-6)


def test_complex_rotation_is_unit_modulus():
    rng = np.random.default_rng(3)
    d = 8
    v = rng.normal(size=(6, 2 * d)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, size=(6, d)).astype(np.float32)
    out = np.asarray(complex_rotation(jnp.asarray(v), jnp.asarray(phase)))
    c = v[:, :d] + 1j * v[:, d:]
    rot = c * np.exp(1j * phase)
    np.testing.assert_allclose(out[:, :d], rot.real, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[:, d:], rot.imag, rtol=1e-5, atol=1e-5)


def test_get_entity_filter_brute_force():
    rng = np.random.default_rng(4)
    triples = rng.integers(0, 10, size=(50, 3)).astype(np.int32)
    filter_triples = rng.integers(0, 10, size=(80, 3)).astype(np.int32)
    for mode in ("h", "t"):
        got = get_entity_filter(triples, filter_triples, mode)
        expected = []
        for i, (h, r, t) in enumerate(triples):
            for fh, fr, ft in filter_triples:
                if mode == "t" and fh == h and fr == r:
                    expected.append((i, ft))
                if mode == "h" and ft == t and fr == r:
                    expected.append((i, fh))
        exp = np.asarray(sorted(expected), dtype=np.int64).reshape(-1, 2)
        got_sorted = got[np.lexsort((got[:, 1], got[:, 0]))]
        exp_sorted = exp[np.lexsort((exp[:, 1], exp[:, 0]))] if len(exp) else exp
        np.testing.assert_array_equal(got_sorted, exp_sorted)
