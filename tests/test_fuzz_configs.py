"""Config sweep: positive-score parity with the unsharded model across
random topologies, partition schemes, samplers, and score functions.

The detailed per-column negative golden lives in test_bess.py; this sweep
covers the cross-product breadth cheaply via the universal invariant that
distributed positive scores equal unsharded ones, for every config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from besskge_tpu.batch_sampler import RigidShardedBatchSampler
from besskge_tpu.bess import (
    EmbeddingMovingBessKGE,
    ScoreMovingBessKGE,
    build_bess_forward,
)
from besskge_tpu.dataset import KGDataset
from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
from besskge_tpu.parallel import make_shard_mesh
from besskge_tpu.scoring import (
    BoxE,
    ComplEx,
    DistMult,
    InterHT,
    PairRE,
    RotatE,
    TranS,
    TransE,
    TripleRE,
)
from besskge_tpu.sharding import PartitionedTripleSet, Sharding

CONFIGS = [
    # (model_cls, mover, n_shard, n_entity, scheme, flat, n_neg, bps)
    (TransE, EmbeddingMovingBessKGE, 2, 101, "h", True, 3, 2),
    (RotatE, ScoreMovingBessKGE, 2, 67, "t", True, 5, 1),
    (DistMult, EmbeddingMovingBessKGE, 8, 203, "ht", True, 4, 1),
    (ComplEx, ScoreMovingBessKGE, 8, 130, "ht", True, 2, 2),
    (PairRE, EmbeddingMovingBessKGE, 4, 99, "t", False, 3, 1),
    (TripleRE, ScoreMovingBessKGE, 4, 77, "h", False, 2, 1),
    (BoxE, EmbeddingMovingBessKGE, 2, 55, "ht", False, 2, 1),
    (InterHT, ScoreMovingBessKGE, 2, 88, "t", True, 3, 1),
    (TranS, EmbeddingMovingBessKGE, 4, 121, "h", True, 2, 2),
]


@pytest.mark.parametrize(
    "model_cls,mover,n_shard,n_entity,scheme,flat,n_neg,bps", CONFIGS
)
def test_positive_score_parity(
    model_cls, mover, n_shard, n_entity, scheme, flat, n_neg, bps
):
    seed = hash((model_cls.__name__, n_shard, n_entity)) % (2**31)
    rng = np.random.default_rng(seed)
    n_rel, emb = 5, 8
    n_triple = 400
    trip = np.stack(
        [
            rng.integers(n_entity, size=n_triple),
            rng.integers(n_rel, size=n_triple),
            rng.integers(n_entity, size=n_triple),
        ],
        1,
    ).astype(np.int32)
    ds = KGDataset(
        n_entity=n_entity,
        n_relation_type=n_rel,
        entity_dict=None,
        relation_dict=None,
        type_offsets=None,
        triples={"t": trip},
        original_triple_ids={"t": np.arange(n_triple)},
        neg_heads=None,
        neg_tails=None,
    )
    sharding = Sharding.create(n_entity, n_shard, seed=seed)
    pts = PartitionedTripleSet.create_from_dataset(ds, "t", sharding)
    kwargs = dict(
        negative_sample_sharing=flat,
        sharding=sharding,
        n_relation_type=n_rel,
        embedding_size=emb,
        seed=seed % 1000,
    )
    if model_cls not in (DistMult, ComplEx):
        kwargs["scoring_norm"] = 1 + (seed % 2)
    score_fn = model_cls(**kwargs)
    ns = RandomShardedNegativeSampler(
        n_neg, sharding, seed, scheme, local_sampling=False,
        flat_negative_format=flat,
    )
    shard_bs = 2 * n_shard  # even ppp for "ht"
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=shard_bs, batches_per_step=bps, seed=seed,
        return_triple_idx=True,
    )
    bess = mover(negative_sampler=ns, score_fn=score_fn, return_scores=True)
    fwd = build_bess_forward(bess, make_shard_mesh(n_shard))
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}
    batch = bs.sample_batch(next(bs.epoch_index_blocks(shuffle=False)))
    res = jax.tree.map(
        np.asarray, fwd(params, {k: jnp.asarray(v) for k, v in batch.items()})
    )
    # Golden positives from the unsharded table.
    ent = np.asarray(params["entity_embedding"]).reshape(
        n_shard, sharding.max_entity_per_shard, -1
    )
    flat_table = ent[sharding.entity_to_shard, sharding.entity_to_idx]
    orig = trip[pts.triple_sort_idx][batch["triple_idx"]]  # (bps,S,S,ppp,3)
    g_params = {"relation_embedding": params["relation_embedding"]}
    golden = np.asarray(
        score_fn.score_triple(
            g_params,
            jnp.asarray(flat_table[orig[..., 0].reshape(-1)]),
            jnp.asarray(orig[..., 1].reshape(-1).astype(np.int32)),
            jnp.asarray(flat_table[orig[..., 2].reshape(-1)]),
        )
    ).reshape(orig.shape[:-1])
    pos = res["positive_score"].reshape(golden.shape)
    mask = batch["triple_mask"]
    np.testing.assert_allclose(
        pos[mask], golden[mask], rtol=5e-4, atol=5e-4
    )
    assert np.isfinite(res["negative_score"]).all()
