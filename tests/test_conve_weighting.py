"""End-to-end ConvE training (dropout rng + BN), hrt frequency weighting,
and triple_weight plumbing through the distributed forward."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from besskge_tpu.batch_sampler import RandomShardedBatchSampler, RigidShardedBatchSampler
from besskge_tpu.bess import EmbeddingMovingBessKGE, build_bess_forward
from besskge_tpu.dataset import KGDataset
from besskge_tpu.loss import LogSigmoidLoss, SampledSoftmaxCrossEntropyLoss
from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
from besskge_tpu.parallel import make_shard_mesh
from besskge_tpu.scoring import ConvE, TransE
from besskge_tpu.sharding import PartitionedTripleSet, Sharding
from besskge_tpu.trainer import Trainer

N_ENTITY = 100
N_RELATION = 4
N_SHARD = 4
SEED = 21


def _dataset():
    rng = np.random.default_rng(SEED)
    h = rng.integers(N_ENTITY, size=1600)
    r = rng.integers(N_RELATION, size=1600)
    t = (h * (r + 2) + 1) % N_ENTITY
    return KGDataset(
        n_entity=N_ENTITY,
        n_relation_type=N_RELATION,
        entity_dict=None,
        relation_dict=None,
        type_offsets=None,
        triples={"train": np.stack([h, r, t], 1).astype(np.int32)},
        original_triple_ids={"train": np.arange(1600)},
        neg_heads=None,
        neg_tails=None,
    )


def test_conve_trains_end_to_end():
    ds = _dataset()
    sharding = Sharding.create(N_ENTITY, N_SHARD, seed=SEED)
    # ConvE with inverse triples: tail-corruption only.
    pts = PartitionedTripleSet.create_from_dataset(
        ds, "train", sharding, add_inverse_triples=True
    )
    score_fn = ConvE(
        negative_sample_sharing=True,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=32,
        embedding_height=4,
        embedding_width=8,
        inverse_relations=True,
        seed=SEED,
    )
    ns = RandomShardedNegativeSampler(
        8, sharding, SEED, "t", local_sampling=False, flat_negative_format=True
    )
    bs = RandomShardedBatchSampler(
        pts, ns, shard_bs=32, batches_per_step=1, seed=SEED
    )
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns,
        score_fn=score_fn,
        loss_fn=SampledSoftmaxCrossEntropyLoss(n_entity=N_ENTITY),
    )
    mesh = make_shard_mesh(N_SHARD)
    trainer = Trainer(bess, bs, optax.adam(3e-3), mesh=mesh, seed=SEED)
    assert trainer.needs_rng  # dropout rng must be threaded
    fwd = build_bess_forward(bess, mesh)
    batch = trainer._put(bs.sample_batch([0]))
    loss0 = float(fwd(trainer.params, batch)["loss"])
    trainer.fit(n_epochs=20)
    loss1 = float(fwd(trainer.params, batch)["loss"])
    assert np.isfinite(loss1) and loss1 < 0.85 * loss0, (loss0, loss1)

    # BN running-stats refresh on a sample batch.
    params = trainer.params
    ent = np.asarray(params["entity_embedding"])
    h_emb = jnp.asarray(ent[:64])
    r_id = jnp.asarray(np.arange(64, dtype=np.int32) % N_RELATION)
    new_params = score_fn.update_bn_stats(params, h_emb, r_id)
    assert not np.allclose(
        np.asarray(new_params["bn0"]["mean"]), np.asarray(params["bn0"]["mean"])
    )


def test_hrt_freq_weighting_and_triple_weight():
    ds = _dataset()
    sharding = Sharding.create(N_ENTITY, N_SHARD, seed=SEED)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    score_fn = TransE(
        negative_sample_sharing=True,
        scoring_norm=1,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=16,
        seed=SEED,
    )
    ns = RandomShardedNegativeSampler(
        4, sharding, SEED, "t", local_sampling=False, flat_negative_format=True
    )
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=16, batches_per_step=2, seed=SEED,
        hrt_freq_weighting=True, weight_smoothing=0.5,
    )
    batch = bs.sample_batch(next(bs.epoch_index_blocks(shuffle=False)))
    w = batch["triple_weight"]
    assert w.shape == (2, N_SHARD, N_SHARD * bs.positive_per_partition)
    # Normalized: sums to shard_bs per device micro-batch.
    np.testing.assert_allclose(w.sum(-1), bs.shard_bs, rtol=1e-5)

    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns,
        score_fn=score_fn,
        loss_fn=LogSigmoidLoss(margin=1.0, negative_adversarial_sampling=False),
    )
    mesh = make_shard_mesh(N_SHARD)
    fwd = build_bess_forward(bess, mesh)
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}
    out_w = fwd(params, {k: jnp.asarray(v) for k, v in batch.items()})
    # Same batch with uniform weights gives a different loss.
    no_w = {k: v for k, v in batch.items() if k != "triple_weight"}
    out_u = fwd(params, {k: jnp.asarray(v) for k, v in no_w.items()})
    assert np.isfinite(float(out_w["loss"]))
    assert abs(float(out_w["loss"]) - float(out_u["loss"])) > 1e-3
