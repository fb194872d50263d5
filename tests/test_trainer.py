"""Training-step tests: gradient parity vs the unsharded model, shard-local
entity updates, and end-to-end convergence on a toy KG.

The gradient-parity test is the training analog of the golden inference test:
one SGD(lr=1) step of the distributed program must move the entity table by
exactly the gradient of the unsharded loss (all collectives differentiated).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from besskge_tpu.batch_sampler import RandomShardedBatchSampler, RigidShardedBatchSampler
from besskge_tpu.bess import EmbeddingMovingBessKGE, build_bess_forward
from besskge_tpu.dataset import KGDataset
from besskge_tpu.loss import LogSigmoidLoss
from besskge_tpu.metric import Evaluation
from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
from besskge_tpu.parallel import make_shard_mesh
from besskge_tpu.scoring import DistMult, TransE
from besskge_tpu.sharding import PartitionedTripleSet, Sharding
from besskge_tpu.trainer import Trainer, build_train_step, init_optimizer_state

SEED = 7
N_ENTITY = 120
N_RELATION = 5
N_SHARD = 4


def _toy_dataset(n_triple=2000, seed=SEED):
    rng = np.random.default_rng(seed)
    h = rng.integers(N_ENTITY, size=n_triple)
    r = rng.integers(N_RELATION, size=n_triple)
    # Structured tails: learnable pattern t = (h + 7r) mod N.
    t = (h + 7 * (r + 1)) % N_ENTITY
    trip = np.stack([h, r, t], 1).astype(np.int32)
    return KGDataset(
        n_entity=N_ENTITY,
        n_relation_type=N_RELATION,
        entity_dict=None,
        relation_dict=None,
        type_offsets=None,
        triples={"train": trip},
        original_triple_ids={"train": np.arange(n_triple)},
        neg_heads=None,
        neg_tails=None,
    )


def test_gradient_parity_with_unsharded_model():
    ds = _toy_dataset()
    sharding = Sharding.create(N_ENTITY, N_SHARD, seed=SEED)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    score_fn = DistMult(
        negative_sample_sharing=True,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=16,
        seed=3,
    )
    ns = RandomShardedNegativeSampler(
        8, sharding, SEED, "t", local_sampling=False, flat_negative_format=True
    )
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=16, batches_per_step=1, seed=SEED,
        return_triple_idx=True,
    )
    loss_fn = LogSigmoidLoss(margin=2.0, negative_adversarial_sampling=False)
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns, score_fn=score_fn, loss_fn=loss_fn
    )
    mesh = make_shard_mesh(N_SHARD)
    sgd = optax.sgd(1.0)
    step = build_train_step(bess, sgd, mesh, donate=False)

    params0 = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}
    opt_state = init_optimizer_state(sgd, params0, mesh)
    batch = bs.sample_batch(next(bs.epoch_index_blocks(shuffle=False)))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    new_params, _, out = step(params0, opt_state, jbatch)

    # ---- golden: same loss on the unsharded table -----------------------
    ent0 = np.asarray(params0["entity_embedding"]).reshape(
        N_SHARD, sharding.max_entity_per_shard, -1
    )
    rel0 = np.asarray(params0["relation_embedding"])
    flat0 = ent0[sharding.entity_to_shard, sharding.entity_to_idx]
    s2e = sharding.shard_and_idx_to_entity

    # Reconstruct global triples per device, in device row order.
    trip_idx = batch["triple_idx"][0]  # (S, S, ppp)
    global_triples = ds.triples["train"][pts.triple_sort_idx][trip_idx]
    # (S, S, ppp, 3): device h, partition t, position p.
    neg_local = batch["negative"][0]  # (S_src, S_dest, 1, n_neg)
    n_neg = neg_local.shape[-1]
    # Global negative ids, pool per destination: source-major.
    neg_global = s2e[
        np.arange(N_SHARD)[:, None, None, None], neg_local
    ]  # (S_src, S_dest, 1, n_neg)

    def golden_loss(flat_table, rel_table):
        total = 0.0
        g_params = {"relation_embedding": rel_table}
        for dev in range(N_SHARD):
            trips = global_triples[dev].reshape(-1, 3)
            h_emb = flat_table[trips[:, 0]]
            t_emb = flat_table[trips[:, 2]]
            r_id = trips[:, 1]
            pool = flat_table[neg_global[:, dev].reshape(-1)][None]
            pos = score_fn.score_triple(g_params, h_emb, r_id, t_emb)
            neg = score_fn.score_tails(g_params, h_emb, r_id, pool)
            total = total + loss_fn(pos, neg, jnp.asarray(1.0))
        return total

    grad_flat, grad_rel = jax.grad(golden_loss, argnums=(0, 1))(
        jnp.asarray(flat0), jnp.asarray(rel0)
    )

    # Distributed update was params - grad (SGD lr=1).
    delta_ent = ent0 - np.asarray(new_params["entity_embedding"]).reshape(
        ent0.shape
    )
    delta_flat = delta_ent[sharding.entity_to_shard, sharding.entity_to_idx]
    np.testing.assert_allclose(
        delta_flat, np.asarray(grad_flat), rtol=1e-4, atol=1e-5
    )
    delta_rel = rel0 - np.asarray(new_params["relation_embedding"])
    np.testing.assert_allclose(
        delta_rel, np.asarray(grad_rel), rtol=1e-4, atol=1e-5
    )
    # Padding rows never move.
    pad = sharding.shard_and_idx_to_entity >= N_ENTITY
    np.testing.assert_array_equal(np.asarray(delta_ent)[pad], 0.0)


def _build_training(n_shard, mesh, axis_name="shard", emb=32):
    ds = _toy_dataset()
    sharding = Sharding.create(N_ENTITY, n_shard, seed=SEED)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    score_fn = TransE(
        negative_sample_sharing=True,
        scoring_norm=1,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=emb,
        seed=4,
    )
    ns = RandomShardedNegativeSampler(
        32, sharding, SEED, "ht", local_sampling=False,
        flat_negative_format=True,
    )
    bs = RandomShardedBatchSampler(
        pts, ns, shard_bs=48, batches_per_step=2, seed=SEED
    )
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns,
        score_fn=score_fn,
        loss_fn=LogSigmoidLoss(margin=4.0, negative_adversarial_sampling=True),
        evaluation=Evaluation(["mrr"], reduction="sum"),
        axis_name=axis_name,
    )
    return Trainer(
        bess, bs, optax.adam(1e-2), mesh=mesh, seed=SEED
    ), bess, bs


def test_training_convergence_multishard():
    trainer, bess, bs = _build_training(N_SHARD, make_shard_mesh(N_SHARD))
    fwd = build_bess_forward(bess, trainer.mesh)
    batch = trainer._put(bs.sample_batch(next(bs.epoch_index_blocks())))
    out0 = fwd(trainer.params, batch)
    loss0 = float(out0["loss"])
    mrr0 = float(np.asarray(out0["metrics"]).sum()) / (
        bs.batches_per_step * bs.n_shard * bs.shard_bs
    )
    stats = trainer.fit(n_epochs=30, log_every=5)
    out1 = fwd(trainer.params, batch)
    loss1 = float(out1["loss"])
    mrr1 = float(np.asarray(out1["metrics"]).sum()) / (
        bs.batches_per_step * bs.n_shard * bs.shard_bs
    )
    assert np.isfinite(loss1)
    assert loss1 < 0.7 * loss0, (loss0, loss1)
    assert mrr1 > max(2 * mrr0, 0.1), (mrr0, mrr1)
    assert stats["triples_per_s"] > 0


def test_training_single_device_path():
    trainer, bess, bs = _build_training(1, None, axis_name=None, emb=16)
    batch = trainer._put(bs.sample_batch(next(bs.epoch_index_blocks())))
    fwd = build_bess_forward(bess, None)
    loss0 = float(fwd(trainer.params, batch)["loss"])
    trainer.fit(n_epochs=10)
    loss1 = float(fwd(trainer.params, batch)["loss"])
    assert loss1 < loss0


def test_training_eight_shards():
    """8-device mesh: forward golden vs unsharded + training convergence."""
    n_shard = 8
    ds = _toy_dataset()
    sharding = Sharding.create(N_ENTITY, n_shard, seed=SEED)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    rng = np.random.default_rng(1)
    table = rng.normal(
        size=(n_shard, sharding.max_entity_per_shard, 16)
    ).astype(np.float32)
    rel = rng.normal(size=(N_RELATION, 16)).astype(np.float32)
    score_fn = DistMult(
        negative_sample_sharing=True,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=16,
        entity_initializer=table,
        relation_initializer=rel,
    )
    ns = RandomShardedNegativeSampler(
        4, sharding, SEED, "t", local_sampling=False, flat_negative_format=True
    )
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=16, batches_per_step=1, seed=SEED,
        return_triple_idx=True,
    )
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns,
        score_fn=score_fn,
        loss_fn=LogSigmoidLoss(margin=2.0, negative_adversarial_sampling=False),
        return_scores=True,
    )
    mesh = make_shard_mesh(n_shard)
    fwd = build_bess_forward(bess, mesh)
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}
    batch = bs.sample_batch(next(bs.epoch_index_blocks(shuffle=False)))
    res = jax.tree.map(
        np.asarray, fwd(params, {k: jnp.asarray(v) for k, v in batch.items()})
    )
    # Positive scores vs unsharded golden.
    flat = table[sharding.entity_to_shard, sharding.entity_to_idx]
    orig = ds.triples["train"][pts.triple_sort_idx]
    trip = orig[batch["triple_idx"][0]]          # (S, S, ppp, 3)
    mask = batch["triple_mask"][0]
    g_params = {"relation_embedding": jnp.asarray(rel)}
    golden = np.asarray(
        score_fn.score_triple(
            g_params,
            jnp.asarray(flat[trip[..., 0].reshape(-1)]),
            jnp.asarray(trip[..., 1].reshape(-1).astype(np.int32)),
            jnp.asarray(flat[trip[..., 2].reshape(-1)]),
        )
    ).reshape(trip.shape[:-1])
    pos = res["positive_score"].reshape(golden.shape)
    np.testing.assert_allclose(pos[mask], golden[mask], rtol=1e-4, atol=1e-5)

    # And a few training steps converge.
    import optax

    from besskge_tpu.optim import RowAdamW

    trainer = Trainer(
        bess, bs, optax.adam(2e-2), mesh=mesh,
        entity_optimizer=RowAdamW(learning_rate=2e-2), seed=SEED,
    )
    stats = trainer.fit(n_epochs=5)
    assert stats["steps"] > 0 and np.isfinite(stats["final_loss"])


def test_fit_valid_hook_and_best_checkpoint(tmp_path):
    """In-loop validation hook runs every `valid_every` epochs; the best
    checkpoint (by the monitored metric) is written and loadable."""
    from besskge_tpu.checkpoint import load_checkpoint

    trainer, bess, bs = _build_training(1, None, axis_name=None, emb=16)
    calls = []

    def valid_fn(params):
        calls.append(1)
        return {"mrr": float(len(calls))}  # strictly improving

    ckpt = tmp_path / "best.npz"
    stats = trainer.fit(
        n_epochs=4,
        valid_fn=valid_fn,
        valid_every=2,
        checkpoint_path=str(ckpt),
        checkpoint_metric="mrr",
    )
    assert len(calls) == 2
    assert stats["best_mrr"] == 2.0
    assert np.isfinite(stats["final_loss"])
    valid_recs = [h for h in trainer.history if "valid" in h]
    assert [r["valid"]["mrr"] for r in valid_recs] == [1.0, 2.0]
    params, _, sh, meta = load_checkpoint(str(ckpt))
    assert params["entity_embedding"].shape == np.asarray(
        trainer.params["entity_embedding"]
    ).shape
