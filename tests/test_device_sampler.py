"""On-device batch sampler tests.

:class:`~besskge_tpu.device_sampler.DeviceBatchSampler` draws the whole BESS
batch inside the compiled step. These tests pin (a) layout parity with the
host samplers, (b) the sampling invariants the device program relies on
(positives come from the right shard-pair bucket, negatives from the right
shard / type range), and (c) end-to-end training through ``Trainer`` with
``steps_per_call`` fusion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from besskge_tpu.batch_sampler import RandomShardedBatchSampler
from besskge_tpu.bess import EmbeddingMovingBessKGE
from besskge_tpu.dataset import KGDataset
from besskge_tpu.device_sampler import DeviceBatchSampler
from besskge_tpu.loss import LogSigmoidLoss
from besskge_tpu.negative_sampler import (
    RandomShardedNegativeSampler,
    TypeBasedShardedNegativeSampler,
)
from besskge_tpu.parallel import make_shard_mesh
from besskge_tpu.scoring import TransE
from besskge_tpu.sharding import PartitionedTripleSet, Sharding
from besskge_tpu.trainer import Trainer

SEED = 11
N_SHARD = 4
N_ENTITY = 360
N_RELATION = 6


def _dataset(n_triple=3000, structured=False, type_offsets=None):
    rng = np.random.default_rng(SEED)
    h = rng.integers(N_ENTITY, size=n_triple)
    r = rng.integers(N_RELATION, size=n_triple)
    if structured:
        t = (h + 13 * (r + 1)) % N_ENTITY
    else:
        t = rng.integers(N_ENTITY, size=n_triple)
    trip = np.stack([h, r, t], 1).astype(np.int32)
    return KGDataset(
        n_entity=N_ENTITY,
        n_relation_type=N_RELATION,
        entity_dict=None,
        relation_dict=None,
        type_offsets=type_offsets,
        triples={"train": trip},
        original_triple_ids={"train": np.arange(n_triple)},
        neg_heads=None,
        neg_tails=None,
    )


def _setup(corruption="t", type_offsets=None, hrt_weighting=False,
           shard_bs=24, bps=2, n_negative=5):
    ds = _dataset(type_offsets={"a": 0, "b": 120, "c": 240}
                  if type_offsets is not None else None)
    sharding = Sharding.create(
        N_ENTITY, N_SHARD, seed=SEED, type_offsets=type_offsets
    )
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    if type_offsets is not None:
        ns = TypeBasedShardedNegativeSampler(
            pts.types, n_negative, sharding, corruption,
            local_sampling=False, seed=SEED,
        )
    else:
        ns = RandomShardedNegativeSampler(
            n_negative, sharding, SEED, corruption,
            local_sampling=False, flat_negative_format=False,
        )
    dev = DeviceBatchSampler(
        pts, ns, shard_bs=shard_bs, batches_per_step=bps, seed=SEED,
        hrt_freq_weighting=hrt_weighting,
    )
    return ds, sharding, pts, ns, dev


def test_layout_matches_host_sampler():
    """Device batches carry the host samplers' exact key set / shapes."""
    _, _, pts, ns, dev = _setup()
    host = RandomShardedBatchSampler(
        pts, ns, shard_bs=24, batches_per_step=2, seed=SEED
    )
    hb = host.sample_batch(next(host.epoch_index_blocks(shuffle=False)))
    db = jax.tree.map(np.asarray, dev.sample(dev.state(), dev.next_key(0)))
    for key in ("head", "relation", "tail", "negative"):
        assert key in db, key
        assert db[key].shape == hb[key].shape, (
            key, db[key].shape, hb[key].shape
        )
        assert db[key].dtype == np.int32


def test_positives_come_from_their_partition():
    """Every sampled (h, r, t) must be a triple of its (shard_h, shard_t)
    bucket — heads/tails local IDs, relation global."""
    _, _, pts, _, dev = _setup(shard_bs=32, bps=3)
    batch = jax.tree.map(np.asarray, dev.sample(dev.state(), dev.next_key(3)))
    ppp = dev.positive_per_partition
    # Undo the AllToAll pre-transpose: tail[b, t, h, i] pairs head[b, h, t, i]
    tail = np.swapaxes(batch["tail"], 1, 2)
    for sh in range(N_SHARD):
        for st in range(N_SHARD):
            lo = pts.triple_offsets[sh, st]
            bucket = pts.triples[lo : lo + pts.triple_counts[sh, st]]
            rows = np.stack(
                [
                    batch["head"][:, sh, st].ravel(),
                    batch["relation"][:, sh, st].ravel(),
                    tail[:, sh, st].ravel(),
                ],
                axis=1,
            )
            # Membership check via row-view intersection.
            bucket_set = {tuple(x) for x in bucket.tolist()}
            for row in rows.tolist():
                assert tuple(row) in bucket_set, (sh, st, row)
            assert rows.shape[0] == 3 * ppp


def test_runs_mode_positives_are_partition_runs():
    """positive_mode='runs': every emitted triple belongs to its
    (shard_h, shard_t) bucket AND each (micro-batch, partition) block is a
    contiguous run of that bucket."""
    ds = _dataset(n_triple=6000)
    sharding = Sharding.create(N_ENTITY, N_SHARD, seed=SEED)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    ns = RandomShardedNegativeSampler(
        5, sharding, SEED, "t", local_sampling=False,
        flat_negative_format=False,
    )
    dev = DeviceBatchSampler(
        pts, ns, shard_bs=32, batches_per_step=3, seed=SEED,
        positive_mode="runs",
    )
    batch = jax.tree.map(np.asarray, dev.sample(dev.state(), dev.next_key(2)))
    ppp = dev.positive_per_partition
    tail = np.swapaxes(batch["tail"], 1, 2)
    for mb in range(3):
        for sh in range(N_SHARD):
            for st in range(N_SHARD):
                lo = pts.triple_offsets[sh, st]
                n = pts.triple_counts[sh, st]
                bucket = pts.triples[lo : lo + n]
                rows = np.stack(
                    [
                        batch["head"][mb, sh, st],
                        batch["relation"][mb, sh, st],
                        tail[mb, sh, st],
                    ],
                    axis=1,
                )
                # the block must equal a contiguous slice of the bucket
                first = rows[0].tolist()
                starts = [
                    i for i in range(n - ppp + 1)
                    if bucket[i].tolist() == first
                ]
                assert any(
                    (bucket[s : s + ppp] == rows).all() for s in starts
                ), (mb, sh, st)


def test_runs_mode_rejects_small_partitions():
    _, _, pts, ns, _ = _setup()
    with pytest.raises(ValueError, match="runs"):
        DeviceBatchSampler(
            pts, ns, shard_bs=3000, batches_per_step=2, seed=SEED,
            positive_mode="runs",
        )


def test_runs_mode_trains():
    """End-to-end: a Trainer over the runs-mode device sampler converges."""
    ds = _dataset(n_triple=6000, structured=True)
    sharding = Sharding.create(N_ENTITY, N_SHARD, seed=SEED)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    ns = RandomShardedNegativeSampler(
        5, sharding, SEED, "t", local_sampling=False,
        flat_negative_format=False,
    )
    dev = DeviceBatchSampler(
        pts, ns, shard_bs=24, batches_per_step=2, seed=SEED,
        positive_mode="runs",
    )
    score = TransE(
        negative_sample_sharing=False, scoring_norm=1, sharding=sharding,
        n_relation_type=N_RELATION, embedding_size=32, seed=SEED,
    )
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns, score_fn=score,
        loss_fn=LogSigmoidLoss(margin=4.0,
                               negative_adversarial_sampling=False),
    )
    mesh = make_shard_mesh(N_SHARD)
    tr = Trainer(bess, dev, optax.adamw(1e-2), mesh=mesh)
    hist = tr.fit(n_epochs=6, log_every=0)
    tr0 = Trainer(bess, dev, optax.adamw(1e-2), mesh=mesh)
    h0 = tr0.fit(n_epochs=1, log_every=0)
    assert hist["final_loss"] < 0.6 * h0["final_loss"], (hist, h0)


def test_random_negatives_within_source_shard_range():
    _, sharding, _, ns, dev = _setup(n_negative=7)
    batch = jax.tree.map(np.asarray, dev.sample(dev.state(), dev.next_key(1)))
    neg = batch["negative"]  # (bps, S_src, S_dest, B, n)
    assert neg.shape[1] == N_SHARD and neg.shape[-1] == 7
    for src in range(N_SHARD):
        block = neg[:, src]
        assert block.min() >= 0
        assert block.max() < sharding.shard_counts[src]


def test_type_based_negatives_match_consumer_type():
    """Decoded negatives must have the type of the corrupted slot of the
    *consumer* triple (axis 2 = consumer shard for non-local sampling)."""
    type_offsets = np.asarray([0, 120, 240])
    _, sharding, pts, ns, dev = _setup(
        corruption="t", type_offsets=type_offsets
    )
    state = dev.state()
    batch = jax.tree.map(np.asarray, dev.sample(state, dev.next_key(5)))
    neg = batch["negative"]  # (bps, S_src, S_dest, B, n) local IDs on src
    bps, S, _, B, n = neg.shape

    # Expected type: the consumer triple's tail type, per (b, dest, j).
    tail = np.swapaxes(batch["tail"], 1, 2)  # (bps, S_h, S_t, ppp)
    ppp = tail.shape[-1]
    # Recover global tail IDs: local id within shard_t -> global.
    ent_of = sharding.shard_and_idx_to_entity  # (S, max_per_shard)
    ent_type = np.searchsorted(type_offsets, np.arange(N_ENTITY), "right") - 1

    for b in range(bps):
        for dest in range(S):
            # Consumer batch on shard `dest`, flattened over (shard_t, ppp)
            # in the same order the device program consumes it.
            gtails = ent_of[np.arange(S)[:, None], tail[b, dest]].ravel()
            want = ent_type[gtails]  # (B,)
            for src in range(S):
                got_g = ent_of[src, neg[b, src, dest]]  # (B, n) global
                got_t = ent_type[got_g]
                assert (got_t == want[:, None]).all(), (b, src, dest)


def test_ht_corruption_even_split():
    """\"ht\" forces an even per-partition positive count; negative block
    count B equals the shard batch."""
    _, _, _, _, dev = _setup(corruption="ht", shard_bs=30)
    assert dev.positive_per_partition % 2 == 0
    batch = jax.tree.map(np.asarray, dev.sample(dev.state(), dev.next_key(0)))
    assert batch["negative"].shape[3] == batch["head"].shape[1] * (
        batch["head"].shape[-1]
    )


def test_hrt_weighting_normalized_per_shard_batch():
    _, _, _, _, dev = _setup(hrt_weighting=True, shard_bs=24, bps=2)
    batch = dev.sample(dev.state(), dev.next_key(2))
    w = np.asarray(batch["triple_weight"])
    shard_bs = N_SHARD * dev.positive_per_partition
    assert w.shape == (2, N_SHARD, shard_bs)
    np.testing.assert_allclose(w.sum(-1), dev.shard_bs, rtol=1e-5)
    assert (w > 0).all()


def test_trainer_device_sampling_converges():
    """End-to-end on the mesh: loss must drop markedly on a learnable KG."""
    ds = _dataset(structured=True)
    sharding = Sharding.create(N_ENTITY, N_SHARD, seed=SEED)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    ns = RandomShardedNegativeSampler(
        8, sharding, SEED, "ht", local_sampling=False,
        flat_negative_format=False,
    )
    dev = DeviceBatchSampler(pts, ns, shard_bs=48, batches_per_step=2,
                             seed=SEED)
    score = TransE(
        negative_sample_sharing=True, scoring_norm=1, sharding=sharding,
        n_relation_type=N_RELATION, embedding_size=32, seed=SEED,
    )
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns, score_fn=score,
        loss_fn=LogSigmoidLoss(margin=4.0,
                               negative_adversarial_sampling=False),
    )
    mesh = make_shard_mesh(N_SHARD)
    tr = Trainer(bess, dev, optax.adamw(1e-2), mesh=mesh)
    first = float(tr.train_step_out_loss) if hasattr(
        tr, "train_step_out_loss") else None
    hist = tr.fit(n_epochs=6, log_every=0)
    # Fresh trainer, single epoch, for the starting loss.
    tr0 = Trainer(bess, dev, optax.adamw(1e-2), mesh=mesh)
    h0 = tr0.fit(n_epochs=1, log_every=0)
    assert hist["final_loss"] < 0.6 * h0["final_loss"], (hist, h0)


def test_steps_per_call_fusion_matches_stepwise():
    """K fused steps from the same key sequence must land on the same params
    as K separate dispatches."""
    _, sharding, pts, ns, dev = _setup(shard_bs=16, bps=1)
    score = TransE(
        negative_sample_sharing=True, scoring_norm=1, sharding=sharding,
        n_relation_type=N_RELATION, embedding_size=16, seed=SEED,
    )
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns, score_fn=score,
        loss_fn=LogSigmoidLoss(margin=2.0,
                               negative_adversarial_sampling=False),
    )
    mesh = make_shard_mesh(N_SHARD)
    from besskge_tpu.trainer import build_device_train_step, init_optimizer_state
    from besskge_tpu.parallel.mesh import replicate_tree, shard_params

    opt = optax.sgd(0.5)
    params = shard_params(
        {k: jnp.asarray(v) for k, v in score.initial_params().items()}, mesh
    )
    state = replicate_tree(dev.state(), mesh)

    step1 = build_device_train_step(bess, opt, dev, mesh, donate=False)
    stepK = build_device_train_step(
        bess, opt, dev, mesh, donate=False, steps_per_call=3
    )

    p_a = params
    o_a = init_optimizer_state(opt, params, mesh)
    base = dev.next_key(0)
    keys = jax.random.split(base, 3)
    for k in keys:
        p_a, o_a, _ = step1(p_a, o_a, state, k)

    p_b, o_b, out = stepK(
        params, init_optimizer_state(opt, params, mesh), state, base
    )
    for name in p_a:
        np.testing.assert_allclose(
            np.asarray(p_a[name]), np.asarray(p_b[name]), rtol=2e-5,
            atol=2e-6, err_msg=name,
        )
    assert np.isfinite(float(out["loss"]))


def test_sparse_steps_per_call_fusion_matches_stepwise():
    """K fused SPARSE steps (in-place row updates threaded through the scan
    carry) must land on the same params as K separate dispatches — the scan
    carry must alias, not copy, the table and the moment buffers."""
    from besskge_tpu.optim import RowAdamW
    from besskge_tpu.trainer import build_device_train_step, init_optimizer_state
    from besskge_tpu.parallel.mesh import replicate_tree, shard_params

    _, sharding, pts, ns, dev = _setup(shard_bs=16, bps=1)
    score = TransE(
        negative_sample_sharing=True, scoring_norm=1, sharding=sharding,
        n_relation_type=N_RELATION, embedding_size=16, seed=SEED,
    )
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns, score_fn=score,
        loss_fn=LogSigmoidLoss(margin=2.0,
                               negative_adversarial_sampling=False),
    )
    mesh = make_shard_mesh(N_SHARD)
    opt = optax.sgd(0.5)
    row = RowAdamW(1e-2)
    params = shard_params(
        {k: jnp.asarray(v) for k, v in score.initial_params().items()}, mesh
    )
    state = replicate_tree(dev.state(), mesh)

    step1 = build_device_train_step(
        bess, opt, dev, mesh, entity_optimizer=row, donate=False
    )
    stepK = build_device_train_step(
        bess, opt, dev, mesh, entity_optimizer=row, donate=False,
        steps_per_call=3,
    )

    p_a = params
    o_a = init_optimizer_state(opt, params, mesh, entity_optimizer=row)
    base = dev.next_key(0)
    keys = jax.random.split(base, 3)
    for k in keys:
        p_a, o_a, _ = step1(p_a, o_a, state, k)

    p_b, o_b, out = stepK(
        params, init_optimizer_state(opt, params, mesh, entity_optimizer=row),
        state, base,
    )
    for name in p_a:
        np.testing.assert_allclose(
            np.asarray(p_a[name]), np.asarray(p_b[name]), rtol=2e-5,
            atol=2e-6, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(o_a["entity"]["mu"]), np.asarray(o_b["entity"]["mu"]),
        rtol=2e-5, atol=2e-6,
    )
    assert np.isfinite(float(out["loss"]))


def _runs_sampler(n_shard, n_triple=20000, shard_bs=32, bps=2):
    rng = np.random.default_rng(SEED)
    n_entity = 40 * n_shard
    trip = np.stack(
        [
            rng.integers(n_entity, size=n_triple),
            rng.integers(N_RELATION, size=n_triple),
            rng.integers(n_entity, size=n_triple),
        ],
        1,
    ).astype(np.int32)
    ds = KGDataset(
        n_entity=n_entity,
        n_relation_type=N_RELATION,
        triples={"train": trip},
        original_triple_ids={"train": np.arange(n_triple)},
    )
    sharding = Sharding.create(n_entity, n_shard, seed=SEED)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    ns = RandomShardedNegativeSampler(
        4, sharding, SEED, "t", local_sampling=False,
        flat_negative_format=True,
    )
    return DeviceBatchSampler(
        pts, ns, shard_bs=shard_bs, batches_per_step=bps, seed=SEED,
        positive_mode="runs",
    )


def test_runs_mode_program_size_flat_in_shard_count():
    """The vectorized run gather keeps the traced program size constant in
    n_shard (VERDICT r2 item 7: no Python-unrolled bps*S^2 slab loop)."""
    sizes = {}
    for s in (4, 16, 32):
        dev = _runs_sampler(s)
        jaxpr = jax.make_jaxpr(
            lambda st, k, d=dev: d.sample(st, k)
        )(dev.state(), dev.next_key(0))
        sizes[s] = len(jaxpr.eqns)
    assert sizes[16] == sizes[32], sizes
    assert sizes[32] <= sizes[4] + 4, sizes


def test_runs_mode_gather_matches_element_gather():
    """The batched-slice run gather returns exactly the triples selected by
    sample_idx (the element-gather formulation)."""
    for s in (4, 16):
        dev = _runs_sampler(s)
        state = dev.state()
        batch = jax.jit(dev.sample)(state, dev.next_key(3))
        # Recompute positives by element gather from the same key.
        bps, S, ppp = dev.batches_per_step, dev.n_shard, dev.positive_per_partition
        k_pos, _ = jax.random.split(dev.next_key(3))
        counts = jnp.asarray(dev._counts, jnp.float32)
        offsets = jnp.asarray(dev._offsets, jnp.int32)
        u = jax.random.uniform(k_pos, (bps, *counts.shape))
        starts = offsets + (u * (counts - ppp + 1)).astype(jnp.int32)
        idx = np.asarray(starts)[..., None] + np.arange(ppp)
        hrt = np.asarray(state["hrt"]).reshape(-1, 3)
        h = hrt[:, 0][idx]
        r = hrt[:, 1][idx]
        t = hrt[:, 2][idx]
        np.testing.assert_array_equal(np.asarray(batch["head"]), h)
        np.testing.assert_array_equal(np.asarray(batch["relation"]), r)
        np.testing.assert_array_equal(
            np.asarray(batch["tail"]), np.swapaxes(t, 1, 2)
        )
