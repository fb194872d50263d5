"""wikikg2 re-distribution fixture (:func:`fixtures.build_wikikg2_fixture`):
planted-structure invariants and learnability."""

import numpy as np

from besskge_tpu.fixtures import build_wikikg2_fixture


def _build(scale=0.003, **kw):
    return build_wikikg2_fixture(
        seed=3, scale=scale, return_planted=True, oracle_sample=500, **kw
    )


def test_fixture_shapes_and_ranges():
    ds, planted = _build()
    assert planted.entity.shape == (ds.n_entity, 128)
    assert planted.relation.shape == (ds.n_relation_type, 128)
    for part, tri in ds.triples.items():
        assert tri.min() >= 0
        assert tri[:, [0, 2]].max() < ds.n_entity
        assert tri[:, 1].max() < ds.n_relation_type
    for store in (ds.neg_heads, ds.neg_tails):
        for part, neg in store.items():
            assert neg.shape == (len(ds.triples[part]), 500)
            assert neg.min() >= 0 and neg.max() < ds.n_entity
    # negatives never contain the true entity
    v = ds.triples["valid"]
    assert not (ds.neg_heads["valid"] == v[:, :1]).any()
    assert not (ds.neg_tails["valid"] == v[:, 2:]).any()


def test_planted_structure_is_noise_scale():
    ds, planted = _build()
    tri = ds.triples["train"][:4000]
    d = -planted.score(tri[:, 0], tri[:, 1], tri[:, 2])
    # ~95% of triples are structural (the calibrated default —
    # fixtures.py "Calibration (round 3)"): |e_h + v_r - e_t| =
    # |eta_h - eta_t|, expected ~ d * 2*noise/3 = 128 * 0.0533 ~ 6.8;
    # noise triples are cluster-scale (orders of magnitude larger)
    frac_structural = float((d < 20).mean())
    assert 0.92 < frac_structural < 0.98, frac_structural
    assert np.median(d[d < 20]) < 10
    # oracle ceiling: reported, in the plausible band for this tiny scale
    assert 0.2 < planted.oracle_estimate < 0.9, planted.oracle_estimate


def test_fixture_is_learnable():
    """A few epochs of the recipe (shrunk) must lift valid MRR well above
    the uniform-rank floor and toward the planted ceiling."""
    import jax.numpy as jnp
    import optax

    from besskge_tpu.batch_sampler import RandomShardedBatchSampler
    from besskge_tpu.bess import EmbeddingMovingBessKGE
    from besskge_tpu.fixtures import _planted_transe_rank_kernel
    from besskge_tpu.loss import SampledSoftmaxCrossEntropyLoss
    from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
    from besskge_tpu.optim import RowSGDM
    from besskge_tpu.scoring import TransE
    from besskge_tpu.sharding import PartitionedTripleSet, Sharding
    from besskge_tpu.trainer import build_train_step, init_optimizer_state

    # Pinned (pre-round-3-calibration) fixture params: at tiny scale with
    # the heavy default member_skew a trained model can legitimately EXCEED
    # the planted oracle (worst-tie ranking loses the ~n_neg*cluster/n
    # co-cluster ties that dominate small-scale eval), which would break
    # the eval-sanity upper bound below. This test checks OPTIMIZATION
    # sanity, not the default calibration.
    ds, planted = _build(
        scale=0.0015, structural_fraction=0.90, member_skew=3.0
    )
    sharding = Sharding.create(ds.n_entity, 1, seed=0)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    sf = TransE(
        negative_sample_sharing=True, scoring_norm=1, sharding=sharding,
        n_relation_type=ds.n_relation_type, embedding_size=64, seed=0,
    )
    ns = RandomShardedNegativeSampler(
        32, sharding, 0, "ht", local_sampling=False,
        flat_negative_format=True,
    )
    bs = RandomShardedBatchSampler(
        pts, ns, shard_bs=256, batches_per_step=4, seed=0
    )
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns, score_fn=sf,
        loss_fn=SampledSoftmaxCrossEntropyLoss(n_entity=ds.n_entity),
        augment_negative=True, axis_name=None,
    )
    opt = optax.sgd(1e-3, momentum=0.9)
    row = RowSGDM(learning_rate=1e-3, momentum=0.9)
    params = sf.initial_params_device()
    ost = init_optimizer_state(opt, params, None, row)
    step = build_train_step(bess, opt, None, row)

    def mrr(params):
        s2e = sharding.shard_and_idx_to_entity[0][: ds.n_entity]
        inv = np.empty(ds.n_entity, np.int64)
        inv[s2e] = np.arange(ds.n_entity)
        e_glob = np.asarray(params["entity_embedding"], np.float32)[inv]
        r_tab = np.asarray(params["relation_embedding"], np.float32)
        m = min(400, len(ds.triples["valid"]))
        out = []
        for c, negs in (("h", ds.neg_heads), ("t", ds.neg_tails)):
            ranks = np.asarray(
                _planted_transe_rank_kernel(c == "t")(
                    jnp.asarray(e_glob), jnp.asarray(r_tab),
                    jnp.asarray(ds.triples["valid"][:m]),
                    jnp.asarray(negs["valid"][:m]),
                )
            )
            out.append((1.0 / ranks).mean())
        return float(np.mean(out))

    m0 = mrr(params)
    loader = bs.get_dataloader(shuffle=True, repeat=True)
    for _, b in zip(range(3 * max(1, len(bs))), loader):
        params, ost, _ = step(
            params, ost, {k: jnp.asarray(v) for k, v in b.items()}
        )
    m1 = mrr(params)
    assert m1 > max(5 * m0, 0.08), (m0, m1)
    assert m1 < planted.oracle_estimate + 0.05
