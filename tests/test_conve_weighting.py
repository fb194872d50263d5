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
    # hrt weights must visibly perturb the loss (threshold well above fp32
    # noise on an ~90 summed loss, but tolerant of batch-composition shifts
    # from sharding-padding changes).
    assert abs(float(out_w["loss"]) - float(out_u["loss"])) > 1e-4


# ---------------------------------------------------------------------------
# BatchNorm running-stats maintenance (torch-EMA analog) and SyncBN.
# Reference behavior: torch BN momentum EMA per forward
# (/root/reference/besskge/scoring.py ConvE, torch.nn.BatchNorm defaults).


def _conve_training(n_shard, sync_bn, mesh):
    ds = _dataset()
    sharding = Sharding.create(N_ENTITY, n_shard, seed=SEED)
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
        sync_batch_norm=sync_bn,
        seed=SEED,
    )
    ns = RandomShardedNegativeSampler(
        8, sharding, SEED, "t", local_sampling=False, flat_negative_format=True
    )
    bs = RandomShardedBatchSampler(pts, ns, shard_bs=32, batches_per_step=1, seed=SEED)
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns,
        score_fn=score_fn,
        loss_fn=SampledSoftmaxCrossEntropyLoss(n_entity=N_ENTITY),
        axis_name=None if mesh is None else "shard",
    )
    trainer = Trainer(bess, bs, optax.adam(3e-3), mesh=mesh, seed=SEED)
    return sharding, score_fn, bs, trainer


def _expected_bn_stats(score_fn, params_host, h_emb, rels):
    """Host-side EMA reference: update_bn_stats on the global positive batch
    (per-shard pmean of equal-size stats == global-batch stats)."""
    saved = score_fn.mesh_axis
    score_fn.mesh_axis = None
    try:
        return score_fn.update_bn_stats(
            params_host, jnp.asarray(h_emb), jnp.asarray(rels), momentum=0.1
        )
    finally:
        score_fn.mesh_axis = saved


def test_bn_ema_in_train_step_single_device():
    """One train step refreshes bn0/1/2 running stats with the 0.1-momentum
    EMA of this step's positive (h, r) batch statistics (dropout-free)."""
    _, score_fn, bs, trainer = _conve_training(1, False, None)
    params0 = jax.device_get(trainer.params)
    batch = trainer._put(bs.sample_batch([0]))
    new_params, _, _ = trainer.train_step(
        trainer.params, trainer.opt_state, batch, jax.random.PRNGKey(3)
    )
    heads = np.asarray(batch["head"])[:, 0].reshape(-1)
    rels = np.asarray(batch["relation"])[:, 0].reshape(-1)
    expected = _expected_bn_stats(
        score_fn, params0, params0["entity_embedding"][heads], rels
    )
    for k in ("bn0", "bn1", "bn2"):
        # Stats moved off their init values...
        assert float(jnp.abs(new_params[k]["mean"]).max()) > 1e-4
        # ...and match the torch-style EMA formula exactly.
        np.testing.assert_allclose(
            np.asarray(new_params[k]["mean"]), np.asarray(expected[k]["mean"]),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(new_params[k]["var"]), np.asarray(expected[k]["var"]),
            rtol=1e-4, atol=1e-5,
        )


def test_bn_ema_in_train_step_mesh_matches_global_batch():
    """On a 4-shard mesh the in-step EMA pmeans the statistics: the running
    stats equal the EMA of the GLOBAL positive batch, replicated."""
    sharding, score_fn, bs, trainer = _conve_training(N_SHARD, False, make_shard_mesh(N_SHARD))
    params0 = jax.device_get(trainer.params)
    batch = trainer._put(bs.sample_batch([0]))
    new_params, _, _ = trainer.train_step(
        trainer.params, trainer.opt_state, batch, jax.random.PRNGKey(3)
    )
    table = params0["entity_embedding"]  # (S*M, row) shard-major
    M = sharding.max_entity_per_shard
    head, rel = np.asarray(batch["head"]), np.asarray(batch["relation"])
    h_emb = np.concatenate(
        [table[s * M + head[:, s].reshape(-1)] for s in range(N_SHARD)]
    )
    rels = np.concatenate([rel[:, s].reshape(-1) for s in range(N_SHARD)])
    expected = _expected_bn_stats(score_fn, params0, h_emb, rels)
    for k in ("bn0", "bn1", "bn2"):
        np.testing.assert_allclose(
            np.asarray(new_params[k]["mean"]), np.asarray(expected[k]["mean"]),
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(new_params[k]["var"]), np.asarray(expected[k]["var"]),
            rtol=2e-4, atol=2e-5,
        )


def test_sync_batch_norm_forward_uses_global_stats():
    """sync_batch_norm=True: _batch_stats pmeans mean/E[x^2] over the mesh
    axis, so every shard normalizes with GLOBAL batch statistics."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    sharding = Sharding.create(N_ENTITY, N_SHARD, seed=SEED)
    score_fn = ConvE(
        negative_sample_sharing=True,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=32,
        embedding_height=4,
        embedding_width=8,
        sync_batch_norm=True,
        seed=SEED,
    )
    score_fn.mesh_axis = "shard"
    mesh = make_shard_mesh(N_SHARD)
    x = np.random.default_rng(0).normal(size=(N_SHARD * 8, 5, 5, 3)).astype(np.float32)

    def f(xb):
        return score_fn._batch_stats(xb, (0, 1, 2), True)

    mean, var = shard_map(
        f, mesh=mesh, in_specs=P("shard"), out_specs=(P(), P())
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mean), x.mean((0, 1, 2)), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), x.var((0, 1, 2)), rtol=1e-4, atol=1e-6)
