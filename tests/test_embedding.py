"""Tests for embedding initialization and re-sharding."""

import numpy as np
import pytest

from besskge_tpu.embedding import (
    init_KGE_normal,
    init_KGE_uniform,
    init_uniform_norm,
    init_uniform_rotation,
    init_xavier_norm,
    initialize_entity_embedding,
    initialize_relation_embedding,
    refactor_embedding_sharding,
)
from besskge_tpu.sharding import Sharding


def test_initializers_shapes_and_ranges():
    rng = np.random.default_rng(0)
    shape = (100, 64)
    x = init_uniform_norm(shape, rng)
    np.testing.assert_allclose(np.linalg.norm(x, axis=-1), 1.0, rtol=1e-5)
    x = init_uniform_rotation(shape, rng)
    assert x.min() >= 0 and x.max() < 2 * np.pi
    x = init_KGE_uniform(shape, rng)
    assert np.abs(x).max() <= 1.0 / 64
    x = init_KGE_normal(shape, rng)
    assert abs(x.std() - 1.0 / 64) < 0.2 / 64
    x = init_xavier_norm(shape, rng)
    assert x.shape == shape


def test_entity_table_from_functions():
    sharding = Sharding.create(n_entity=100, n_shard=4, seed=0)
    table = initialize_entity_embedding(
        sharding, [init_KGE_uniform, init_uniform_rotation], [8, 4], seed=1
    )
    assert table.shape == (4, sharding.max_entity_per_shard, 12)
    # Rotation slice in [0, 2pi).
    assert table[..., 8:].min() >= 0


def test_entity_table_from_unsharded_roundtrip():
    n_entity = 83
    sharding = Sharding.create(n_entity=n_entity, n_shard=4, seed=0)
    flat = np.random.default_rng(2).normal(size=(n_entity, 16)).astype(np.float32)
    table = initialize_entity_embedding(sharding, flat, [16])
    # Unshard and compare.
    recovered = table[sharding.entity_to_shard, sharding.entity_to_idx]
    np.testing.assert_allclose(recovered, flat)
    # Padding rows are zero.
    pad = sharding.shard_and_idx_to_entity >= n_entity
    assert np.all(table[pad] == 0)


def test_entity_table_shape_validation():
    sharding = Sharding.create(n_entity=50, n_shard=2, seed=0)
    with pytest.raises(ValueError):
        initialize_entity_embedding(
            sharding, np.zeros((49, 8), np.float32), [8]
        )
    with pytest.raises(ValueError):
        initialize_entity_embedding(
            sharding, np.zeros((50, 9), np.float32), [8]
        )


def test_relation_table_inverse_relations():
    table = initialize_relation_embedding(
        5, True, [init_KGE_uniform], [8], seed=0
    )
    assert table.shape == (10, 8)
    with pytest.raises(ValueError):
        initialize_relation_embedding(5, True, np.zeros((5, 8), np.float32), [8])


def test_refactor_embedding_sharding_roundtrip():
    n_entity = 77
    old = Sharding.create(n_entity=n_entity, n_shard=4, seed=0)
    new = Sharding.create(n_entity=n_entity, n_shard=2, seed=3)
    table = initialize_entity_embedding(old, [init_KGE_normal], [12], seed=4)
    moved = refactor_embedding_sharding(table, old, new)
    assert moved.shape == (2, new.max_entity_per_shard, 12)
    flat_old = table[old.entity_to_shard, old.entity_to_idx]
    flat_new = moved[new.entity_to_shard, new.entity_to_idx]
    np.testing.assert_allclose(flat_old, flat_new)
