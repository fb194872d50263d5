"""Unit tests for entity sharding and triple partitioning (host-side numpy).

Mirrors the invariants checked by the reference tests
(/root/reference/tests/test_sharding.py): balance, inversibility, type
clustering, partition correctness for all 3 modes, inverse triples,
negatives reordering, and query partitioning with dummy completion.
"""

import numpy as np
import pytest

from besskge_tpu.dataset import KGDataset
from besskge_tpu.sharding import PartitionedTripleSet, Sharding

SEED = 42
N_ENTITY = 533
N_RELATION = 11
N_SHARD = 4
N_TRIPLE = 2100


@pytest.fixture(scope="module")
def type_offsets():
    return np.array([0, 100, 260, 531])  # 4 types, last tiny


@pytest.fixture(scope="module")
def sharding(type_offsets):
    return Sharding.create(N_ENTITY, N_SHARD, seed=SEED, type_offsets=type_offsets)


@pytest.fixture(scope="module")
def triples():
    rng = np.random.default_rng(SEED + 1)
    h = rng.integers(N_ENTITY, size=N_TRIPLE)
    r = rng.integers(N_RELATION, size=N_TRIPLE)
    t = rng.integers(N_ENTITY, size=N_TRIPLE)
    return np.stack([h, r, t], axis=1).astype(np.int32)


@pytest.fixture(scope="module")
def dataset(triples):
    return KGDataset(
        n_entity=N_ENTITY,
        n_relation_type=N_RELATION,
        triples={"train": triples},
        original_triple_ids={"train": np.arange(N_TRIPLE)},
    )


def test_sharding_balance_and_inverse(sharding):
    assert sharding.n_entity == N_ENTITY
    rows = sharding.max_entity_per_shard
    assert rows == int(np.ceil(N_ENTITY / N_SHARD))
    # Every real entity maps back through (shard, idx).
    recovered = sharding.shard_and_idx_to_entity[
        sharding.entity_to_shard, sharding.entity_to_idx
    ]
    np.testing.assert_array_equal(recovered, np.arange(N_ENTITY))
    # shard_counts count real entities and sum to n_entity.
    assert sharding.shard_counts.sum() == N_ENTITY
    for s in range(N_SHARD):
        real = sharding.shard_and_idx_to_entity[s] < N_ENTITY
        assert real.sum() == sharding.shard_counts[s]
        # Padding sorts to the end of the row.
        assert np.all(real[: sharding.shard_counts[s]])
    # Balance: shard sizes differ by at most n_shard.
    assert sharding.shard_counts.max() - sharding.shard_counts.min() <= N_SHARD


def test_sharding_local_ids_sorted(sharding):
    # Global order (hence type clustering) is preserved within each shard.
    tbl = sharding.shard_and_idx_to_entity
    assert np.all(np.diff(tbl, axis=1) > 0)


def test_sharding_type_counts(sharding, type_offsets):
    counts = sharding.entity_type_counts
    offs = sharding.entity_type_offsets
    assert counts.sum() == N_ENTITY
    bounds = np.concatenate([type_offsets, [N_ENTITY]])
    for s in range(N_SHARD):
        ents = sharding.shard_and_idx_to_entity[s]
        for ty in range(len(type_offsets)):
            members = ents[offs[s, ty] : offs[s, ty] + counts[s, ty]]
            assert np.all(members >= bounds[ty]) and np.all(members < bounds[ty + 1])


def test_sharding_save_load(tmp_path, sharding):
    path = tmp_path / "sharding.npz"
    sharding.save(path)
    loaded = Sharding.load(path)
    np.testing.assert_array_equal(loaded.entity_to_shard, sharding.entity_to_shard)
    np.testing.assert_array_equal(
        loaded.shard_and_idx_to_entity, sharding.shard_and_idx_to_entity
    )
    assert loaded.n_shard == sharding.n_shard


@pytest.mark.parametrize("mode", ["h_shard", "t_shard", "ht_shardpair"])
def test_partition_correctness(dataset, sharding, triples, mode):
    pts = PartitionedTripleSet.create_from_dataset(dataset, "train", sharding, mode)
    assert pts.triples.shape == triples.shape
    # Sorting indices recover original triples, modulo localization.
    re_globalized = pts.triples.copy()
    offsets = pts.triple_offsets.reshape(-1)
    counts = pts.triple_counts.reshape(-1)
    assert counts.sum() == N_TRIPLE
    for p, (off, cnt) in enumerate(zip(offsets, counts)):
        blk = pts.triples[off : off + cnt]
        if mode == "h_shard":
            sh = p
            re_globalized[off : off + cnt, 0] = sharding.shard_and_idx_to_entity[
                sh, blk[:, 0]
            ]
        elif mode == "t_shard":
            st = p
            re_globalized[off : off + cnt, 2] = sharding.shard_and_idx_to_entity[
                st, blk[:, 2]
            ]
        else:
            sh, st = divmod(p, N_SHARD)
            re_globalized[off : off + cnt, 0] = sharding.shard_and_idx_to_entity[
                sh, blk[:, 0]
            ]
            re_globalized[off : off + cnt, 2] = sharding.shard_and_idx_to_entity[
                st, blk[:, 2]
            ]
        # Every triple in block p belongs there.
        if mode in ("h_shard", "ht_shardpair"):
            np.testing.assert_array_equal(
                sharding.entity_to_shard[re_globalized[off : off + cnt, 0]],
                sh if mode == "h_shard" or mode == "ht_shardpair" else p,
            )
        if mode in ("t_shard", "ht_shardpair"):
            np.testing.assert_array_equal(
                sharding.entity_to_shard[re_globalized[off : off + cnt, 2]],
                st if mode == "ht_shardpair" else p,
            )
    np.testing.assert_array_equal(re_globalized, triples[pts.triple_sort_idx])


def test_partition_inverse_triples(dataset, sharding, triples):
    rng = np.random.default_rng(0)
    neg_h = rng.integers(N_ENTITY, size=(N_TRIPLE, 7)).astype(np.int32)
    neg_t = rng.integers(N_ENTITY, size=(N_TRIPLE, 7)).astype(np.int32)
    ds = KGDataset(
        n_entity=N_ENTITY,
        n_relation_type=N_RELATION,
        triples={"train": triples},
        original_triple_ids={"train": np.arange(N_TRIPLE)},
        neg_heads={"train": neg_h},
        neg_tails={"train": neg_t},
    )
    pts = PartitionedTripleSet.create_from_dataset(
        ds, "train", sharding, "ht_shardpair", add_inverse_triples=True
    )
    assert pts.triples.shape[0] == 2 * N_TRIPLE
    # Undo sort; second half must be the inverse of the first.
    inv_sort = np.argsort(pts.triple_sort_idx)
    glob = pts.triples.copy()
    # Re-globalize sharded columns.
    part_of = np.repeat(
        np.arange(N_SHARD * N_SHARD), pts.triple_counts.reshape(-1)
    )
    sh, st = np.divmod(part_of, N_SHARD)
    glob[:, 0] = sharding.shard_and_idx_to_entity[sh, pts.triples[:, 0]]
    glob[:, 2] = sharding.shard_and_idx_to_entity[st, pts.triples[:, 2]]
    ordered = glob[inv_sort]
    np.testing.assert_array_equal(ordered[:N_TRIPLE], triples)
    np.testing.assert_array_equal(ordered[N_TRIPLE:, 0], triples[:, 2])
    np.testing.assert_array_equal(ordered[N_TRIPLE:, 2], triples[:, 0])
    np.testing.assert_array_equal(ordered[N_TRIPLE:, 1], triples[:, 1] + N_RELATION)
    # Negatives follow the same sort and swap h/t roles on the inverse half.
    nh = pts.neg_heads[inv_sort]
    nt = pts.neg_tails[inv_sort]
    np.testing.assert_array_equal(nh[:N_TRIPLE], neg_h)
    np.testing.assert_array_equal(nh[N_TRIPLE:], neg_t)
    np.testing.assert_array_equal(nt[:N_TRIPLE], neg_t)
    np.testing.assert_array_equal(nt[N_TRIPLE:], neg_h)


@pytest.mark.parametrize("query_mode", ["hr", "rt"])
def test_partition_queries(dataset, sharding, query_mode):
    rng = np.random.default_rng(7)
    n_query = 200
    ents = rng.integers(N_ENTITY, size=n_query)
    rels = rng.integers(N_RELATION, size=n_query)
    queries = (
        np.stack([ents, rels], axis=1)
        if query_mode == "hr"
        else np.stack([rels, ents], axis=1)
    ).astype(np.int32)
    pts = PartitionedTripleSet.create_from_queries(
        dataset, sharding, queries, query_mode
    )
    col = 0 if query_mode == "hr" else 2
    expected_mode = "h_shard" if query_mode == "hr" else "t_shard"
    assert pts.partition_mode == expected_mode
    assert pts.dummy == ("tail" if query_mode == "hr" else "head")
    # Default negatives: all entities, on the corrupted side only.
    negs = pts.neg_tails if query_mode == "hr" else pts.neg_heads
    assert negs.shape == (1, N_ENTITY)
    assert (pts.neg_heads is None) == (query_mode == "hr")
    # Known entity correctly localized and bucketed.
    part_of = np.repeat(np.arange(N_SHARD), pts.triple_counts)
    glob = sharding.shard_and_idx_to_entity[part_of, pts.triples[:, col]]
    np.testing.assert_array_equal(glob, ents[pts.triple_sort_idx])


def test_partition_queries_typed_negatives(dataset, sharding, type_offsets):
    rng = np.random.default_rng(8)
    n_query = 64
    ents = rng.integers(N_ENTITY, size=n_query)
    rels = rng.integers(N_RELATION, size=n_query)
    queries = np.stack([ents, rels], axis=1).astype(np.int32)
    ds = KGDataset(
        n_entity=N_ENTITY,
        n_relation_type=N_RELATION,
        triples=dataset.triples,
        original_triple_ids=dataset.original_triple_ids,
        type_offsets={"a": 0, "b": 100, "c": 260, "d": 531},
    )
    pts = PartitionedTripleSet.create_from_queries(
        ds, sharding, queries, "hr", negative_type="b"
    )
    # Negatives restricted to type "b" = ids [100, 260).
    assert pts.neg_tails.min() >= 100 and pts.neg_tails.max() < 260
    assert pts.types is not None
