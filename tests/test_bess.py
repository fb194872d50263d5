"""Golden-model integration tests for the BESS distribution core.

TPU analog of reference ``/root/reference/tests/test_bess.py:55-275``: run the
4-shard distributed program on a virtual CPU mesh (``shard_map`` + real
collectives) and compare, after undoing all permutations (triple_sort_idx,
negative_sort_idx, triple_mask, BAD_NEGATIVE_SCORE filtering), against scores
computed with the unsharded table.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from besskge_tpu.batch_sampler import RigidShardedBatchSampler
from besskge_tpu.bess import (
    BAD_NEGATIVE_SCORE,
    EmbeddingMovingBessKGE,
    ScoreMovingBessKGE,
    build_bess_forward,
)
from besskge_tpu.dataset import KGDataset
from besskge_tpu.negative_sampler import TripleBasedShardedNegativeSampler
from besskge_tpu.parallel import make_shard_mesh
from besskge_tpu.scoring import TransE
from besskge_tpu.sharding import PartitionedTripleSet, Sharding

SEED = 1234
N_ENTITY = 500
N_RELATION_TYPE = 10
N_SHARD = 4
N_TEST_TRIPLE = 1000
BATCHES_PER_STEP = 3
SHARD_BS = 48
N_NEGATIVE = 250
EMBEDDING_SIZE = 64

rng = np.random.default_rng(SEED)
sharding = Sharding.create(N_ENTITY, N_SHARD, seed=SEED)
entity_table = rng.normal(
    size=(N_SHARD, sharding.max_entity_per_shard, EMBEDDING_SIZE)
).astype(np.float32)
relation_table = rng.normal(size=(N_RELATION_TYPE, EMBEDDING_SIZE)).astype(
    np.float32
)
test_h = rng.integers(N_ENTITY, size=N_TEST_TRIPLE)
test_r = rng.integers(N_RELATION_TYPE, size=N_TEST_TRIPLE)
test_t = rng.integers(N_ENTITY, size=N_TEST_TRIPLE)
TRIPLES = {
    "test": np.stack([test_h, test_r, test_t], axis=1).astype(np.int32)
}


@pytest.mark.parametrize("model_cls", [EmbeddingMovingBessKGE, ScoreMovingBessKGE])
@pytest.mark.parametrize(
    "corruption_scheme, duplicate_batch",
    [("h", False), ("t", False), ("ht", True)],
)
@pytest.mark.parametrize("flat_negative_format", [True, False])
def test_bess_inference(model_cls, corruption_scheme, duplicate_batch,
                        flat_negative_format):
    neg_outer = 1 if flat_negative_format else N_TEST_TRIPLE
    local_rng = np.random.default_rng(SEED + 1)
    neg_heads = local_rng.integers(
        N_ENTITY, size=(neg_outer, N_NEGATIVE), dtype=np.int32
    )
    neg_tails = local_rng.integers(
        N_ENTITY, size=(neg_outer, N_NEGATIVE), dtype=np.int32
    )
    ds = KGDataset(
        n_entity=N_ENTITY,
        n_relation_type=N_RELATION_TYPE,
        entity_dict=None,
        relation_dict=None,
        type_offsets=None,
        triples=TRIPLES,
        original_triple_ids={k: np.arange(v.shape[0]) for k, v in TRIPLES.items()},
        neg_heads={"test": neg_heads},
        neg_tails={"test": neg_tails},
    )
    pts = PartitionedTripleSet.create_from_dataset(
        ds, "test", sharding, partition_mode="ht_shardpair"
    )
    score_fn = TransE(
        negative_sample_sharing=flat_negative_format,
        scoring_norm=1,
        sharding=sharding,
        n_relation_type=N_RELATION_TYPE,
        embedding_size=EMBEDDING_SIZE,
        entity_initializer=entity_table,
        relation_initializer=relation_table,
    )
    ns = TripleBasedShardedNegativeSampler(
        pts.neg_heads,
        pts.neg_tails,
        sharding,
        corruption_scheme=corruption_scheme,
        seed=SEED,
        return_sort_idx=True,
        mask_on_gather=False,
    )
    bs = RigidShardedBatchSampler(
        partitioned_triple_set=pts,
        negative_sampler=ns,
        shard_bs=SHARD_BS,
        batches_per_step=BATCHES_PER_STEP,
        seed=SEED,
        duplicate_batch=duplicate_batch,
        return_triple_idx=True,
    )

    mesh = make_shard_mesh(N_SHARD)
    bess = model_cls(
        negative_sampler=ns, score_fn=score_fn, return_scores=True
    )
    fwd = build_bess_forward(bess, mesh)
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}

    # Unsharded golden scores.
    flat_table = entity_table[sharding.entity_to_shard, sharding.entity_to_idx]
    g_params = {"relation_embedding": jnp.asarray(relation_table)}
    h_embs = jnp.asarray(flat_table[test_h])
    t_embs = jnp.asarray(flat_table[test_t])
    r_ids = jnp.asarray(test_r.astype(np.int32))
    nh_embs = flat_table[neg_heads]
    nt_embs = flat_table[neg_tails]
    if flat_negative_format:
        nh_in, nt_in = jnp.asarray(nh_embs), jnp.asarray(nt_embs)
    else:
        nh_in, nt_in = jnp.asarray(nh_embs), jnp.asarray(nt_embs)
    true_pos = np.asarray(score_fn.score_triple(g_params, h_embs, r_ids, t_embs))
    true_neg_h = np.asarray(score_fn.score_heads(g_params, nh_in, r_ids, t_embs))
    true_neg_t = np.asarray(score_fn.score_tails(g_params, h_embs, r_ids, nt_in))

    for block in bs.epoch_index_blocks(shuffle=False):
        batch = bs.sample_batch(block)
        triple_idx = batch["triple_idx"]
        triple_mask = batch["triple_mask"]
        neg_sort_idx = batch["negative_sort_idx"]
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        res = jax.tree.map(np.asarray, fwd(params, jbatch))

        pos = res["positive_score"].reshape(
            BATCHES_PER_STEP, N_SHARD, N_SHARD, -1
        )
        neg = res["negative_score"]
        keep = neg > 0.95 * BAD_NEGATIVE_SCORE
        assert keep.sum() == neg.shape[0] * neg.shape[1] * neg.shape[2] * N_NEGATIVE
        neg = neg[keep].reshape(
            BATCHES_PER_STEP, N_SHARD, N_SHARD, -1, N_NEGATIVE
        )
        neg_sort_idx = neg_sort_idx.reshape(
            BATCHES_PER_STEP, N_SHARD, N_SHARD, -1, N_NEGATIVE
        )

        if duplicate_batch:
            cut = pos.shape[-1] // 2
            triple_idx = triple_idx[..., :cut]
            pos = pos[..., :cut]
            triple_mask = triple_mask[..., :cut]
            neg_1, neg_2 = np.split(neg, 2, axis=-2)
            nsi_1, nsi_2 = np.split(neg_sort_idx, 2, axis=-2)

        global_idx = triple_idx[triple_mask]
        pos_filtered = pos[triple_mask]
        sort_idx = pts.triple_sort_idx
        np.testing.assert_allclose(
            true_pos[sort_idx][global_idx], pos_filtered, rtol=1e-4, atol=1e-4
        )

        def check_neg(true_scores, scores, nsi):
            expected = np.take_along_axis(
                true_scores[sort_idx][global_idx], nsi, axis=-1
            )
            np.testing.assert_allclose(expected, scores, rtol=1e-4, atol=1e-4)

        if duplicate_batch:
            check_neg(true_neg_h, neg_1[triple_mask], nsi_1[triple_mask])
            check_neg(true_neg_t, neg_2[triple_mask], nsi_2[triple_mask])
        else:
            true_neg = true_neg_h if corruption_scheme == "h" else true_neg_t
            check_neg(true_neg, neg[triple_mask], neg_sort_idx[triple_mask])
        break  # one step is enough per config


def test_embedding_moving_local_sampling():
    """local_sampling=True: negatives sampled AND scored on the processing
    shard (their AllToAll is skipped; reference ``bess.py:339-345``)."""
    from besskge_tpu.negative_sampler import RandomShardedNegativeSampler

    ds = KGDataset(
        n_entity=N_ENTITY,
        n_relation_type=N_RELATION_TYPE,
        entity_dict=None,
        relation_dict=None,
        type_offsets=None,
        triples=TRIPLES,
        original_triple_ids={k: np.arange(v.shape[0]) for k, v in TRIPLES.items()},
        neg_heads=None,
        neg_tails=None,
    )
    pts = PartitionedTripleSet.create_from_dataset(
        ds, "test", sharding, partition_mode="ht_shardpair"
    )
    score_fn = TransE(
        negative_sample_sharing=False,
        scoring_norm=1,
        sharding=sharding,
        n_relation_type=N_RELATION_TYPE,
        embedding_size=EMBEDDING_SIZE,
        entity_initializer=entity_table,
        relation_initializer=relation_table,
    )
    n_neg = 7
    ns = RandomShardedNegativeSampler(
        n_neg, sharding, SEED, "t", local_sampling=True,
        flat_negative_format=False, use_native=False,
    )
    bs = RigidShardedBatchSampler(
        partitioned_triple_set=pts,
        negative_sampler=ns,
        shard_bs=SHARD_BS,
        batches_per_step=1,
        seed=SEED,
        return_triple_idx=True,
    )
    mesh = make_shard_mesh(N_SHARD)
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns, score_fn=score_fn, return_scores=True
    )
    fwd = build_bess_forward(bess, mesh)
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}

    flat_table = entity_table[sharding.entity_to_shard, sharding.entity_to_idx]
    batch = bs.sample_batch(next(bs.epoch_index_blocks(shuffle=False)))
    res = jax.tree.map(np.asarray, fwd(params, {k: jnp.asarray(v) for k, v in batch.items()}))

    trip_idx = batch["triple_idx"][0]           # (S, S, ppp)
    triple_mask = batch["triple_mask"][0]
    negs = batch["negative"][0]                  # (S_src, S_dest?, B, n_neg)
    orig_triples = TRIPLES["test"][pts.triple_sort_idx][trip_idx]
    neg_score = res["negative_score"][0]         # (S, bs, S*n_neg)

    g_params = {"relation_embedding": jnp.asarray(relation_table)}
    ppp = trip_idx.shape[-1]
    bs_dev = N_SHARD * ppp
    for dev in range(N_SHARD):
        # The pool on device `dev` = its own local negatives for every k
        # (column order: k-axis major, as laid out by score_batch).
        local_ids = negs[dev].transpose(1, 0, 2).reshape(bs_dev, -1)
        pool_global = sharding.shard_and_idx_to_entity[dev][local_ids]
        trips = orig_triples[dev].reshape(-1, 3)
        h_emb = jnp.asarray(flat_table[trips[:, 0]])
        r_id = jnp.asarray(trips[:, 1].astype(np.int32))
        t_pool = jnp.asarray(flat_table[pool_global])
        expected = np.asarray(
            score_fn.score_tails(g_params, h_emb, r_id, t_pool)
        )
        mask = triple_mask[dev].reshape(-1)
        np.testing.assert_allclose(
            neg_score[dev][mask], expected[mask], rtol=1e-4, atol=1e-4
        )


def test_score_moving_random_flat_negatives():
    """ScoreMoving + Random flat sampler: every query is scored against ALL
    shards' sampled pools (n_shard x n_negative columns, source-major)."""
    from besskge_tpu.negative_sampler import RandomShardedNegativeSampler

    ds = KGDataset(
        n_entity=N_ENTITY,
        n_relation_type=N_RELATION_TYPE,
        entity_dict=None,
        relation_dict=None,
        type_offsets=None,
        triples=TRIPLES,
        original_triple_ids={k: np.arange(v.shape[0]) for k, v in TRIPLES.items()},
        neg_heads=None,
        neg_tails=None,
    )
    pts = PartitionedTripleSet.create_from_dataset(
        ds, "test", sharding, partition_mode="ht_shardpair"
    )
    score_fn = TransE(
        negative_sample_sharing=True,
        scoring_norm=1,
        sharding=sharding,
        n_relation_type=N_RELATION_TYPE,
        embedding_size=EMBEDDING_SIZE,
        entity_initializer=entity_table,
        relation_initializer=relation_table,
    )
    n_neg = 6
    ns = RandomShardedNegativeSampler(
        n_neg, sharding, SEED, "t", local_sampling=False,
        flat_negative_format=True, use_native=False,
    )
    bs = RigidShardedBatchSampler(
        partitioned_triple_set=pts,
        negative_sampler=ns,
        shard_bs=SHARD_BS,
        batches_per_step=1,
        seed=SEED,
        return_triple_idx=True,
    )
    mesh = make_shard_mesh(N_SHARD)
    bess = ScoreMovingBessKGE(
        negative_sampler=ns, score_fn=score_fn, return_scores=True
    )
    fwd = build_bess_forward(bess, mesh)
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}
    flat_table = entity_table[sharding.entity_to_shard, sharding.entity_to_idx]

    batch = bs.sample_batch(next(bs.epoch_index_blocks(shuffle=False)))
    res = jax.tree.map(
        np.asarray, fwd(params, {k: jnp.asarray(v) for k, v in batch.items()})
    )
    trip_idx = batch["triple_idx"][0]
    mask = batch["triple_mask"][0]
    negs = batch["negative"][0]  # (S_src, S_dest, 1, n_neg)
    orig = TRIPLES["test"][pts.triple_sort_idx][trip_idx]
    g_params = {"relation_embedding": jnp.asarray(relation_table)}

    for dev in range(N_SHARD):
        # Column order: (source shard major, then that source's flat pool of
        # S_dest*n_neg draws). On source s the local pool enumerates
        # (dest, n_neg) in order.
        pool_global = np.concatenate(
            [
                sharding.shard_and_idx_to_entity[s][negs[s].reshape(-1)]
                for s in range(N_SHARD)
            ]
        )
        trips = orig[dev].reshape(-1, 3)
        expected = np.asarray(
            score_fn.score_tails(
                g_params,
                jnp.asarray(flat_table[trips[:, 0]]),
                jnp.asarray(trips[:, 1].astype(np.int32)),
                jnp.asarray(flat_table[pool_global])[None],
            )
        )
        m = mask[dev].reshape(-1)
        np.testing.assert_allclose(
            res["negative_score"][0][dev][m], expected[m], rtol=1e-4, atol=1e-4
        )


def test_type_based_negatives_on_device():
    """TypeBased sampler end-to-end: every negative scored on device must be
    an entity of the corrupted slot's type."""
    from besskge_tpu.negative_sampler import TypeBasedShardedNegativeSampler

    n_ent, n_types = 240, 3
    type_offsets = np.asarray([0, 80, 160])
    typed_sharding = Sharding.create(
        n_ent, N_SHARD, seed=7, type_offsets=type_offsets
    )
    local_rng = np.random.default_rng(7)
    h = local_rng.integers(n_ent, size=600)
    r = local_rng.integers(N_RELATION_TYPE, size=600)
    t = local_rng.integers(n_ent, size=600)
    ds = KGDataset(
        n_entity=n_ent,
        n_relation_type=N_RELATION_TYPE,
        entity_dict=None,
        relation_dict=None,
        type_offsets={"a": 0, "b": 80, "c": 160},
        triples={"test": np.stack([h, r, t], 1).astype(np.int32)},
        original_triple_ids={"test": np.arange(600)},
        neg_heads=None,
        neg_tails=None,
    )
    pts = PartitionedTripleSet.create_from_dataset(ds, "test", typed_sharding)
    table = local_rng.normal(
        size=(N_SHARD, typed_sharding.max_entity_per_shard, 16)
    ).astype(np.float32)
    rel = local_rng.normal(size=(N_RELATION_TYPE, 16)).astype(np.float32)
    score_fn = TransE(
        negative_sample_sharing=False,
        scoring_norm=1,
        sharding=typed_sharding,
        n_relation_type=N_RELATION_TYPE,
        embedding_size=16,
        entity_initializer=table,
        relation_initializer=rel,
    )
    ns = TypeBasedShardedNegativeSampler(
        pts.types, 5, typed_sharding, "t", local_sampling=False, seed=7
    )
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=24, batches_per_step=1, seed=7,
        return_triple_idx=True,
    )
    mesh = make_shard_mesh(N_SHARD)
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns, score_fn=score_fn, return_scores=True
    )
    fwd = build_bess_forward(bess, mesh)
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}
    batch = bs.sample_batch(next(bs.epoch_index_blocks(shuffle=False)))
    res = jax.tree.map(
        np.asarray, fwd(params, {k: jnp.asarray(v) for k, v in batch.items()})
    )
    assert np.isfinite(res["negative_score"]).all()

    # Type correctness: negatives for triple (dev, part, pos) must share the
    # TAIL's type. negatives layout (src, dest, B=bs, n_neg) of local ids.
    negs = batch["negative"][0]
    trip_idx = batch["triple_idx"][0]
    mask = batch["triple_mask"][0]
    orig = ds.triples["test"][pts.triple_sort_idx]
    for src in range(N_SHARD):
        for dev in range(N_SHARD):
            flat_trips = orig[trip_idx[dev].reshape(-1)]
            flat_mask = mask[dev].reshape(-1)
            globals_ = typed_sharding.shard_and_idx_to_entity[src][
                negs[src, dev]
            ]  # (bs, n_neg)
            tail_type = np.digitize(flat_trips[:, 2], type_offsets) - 1
            neg_type = np.digitize(globals_, type_offsets) - 1
            np.testing.assert_array_equal(
                neg_type[flat_mask],
                np.broadcast_to(
                    tail_type[:, None], neg_type.shape
                )[flat_mask],
            )
