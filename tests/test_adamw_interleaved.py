"""Treble-interleaved RowAdamW entity tables (round 5).

``RowAdamW(interleaved=True)`` stores BOTH Adam moments with the params in
one treble-major ``(3N, D)`` fp32 buffer — param row ``i`` at ``3i``, mu at
``3i+1``, nu at ``3i+2`` — so the sparse update reads and writes each
touched row's trio with one (3, D) block DMA instead of three row DMAs
(the scatter is scalar-core issue-bound; same argument as the SGDM pair
store, BASELINE.md roofline). The reference's capacity tables train Adam
at capacity scale (``/root/reference/README.md:121-144``), which is the
scenario this layout serves. These tests pin:

* trajectory equivalence with the separate-buffer ``RowAdamW`` (exact on
  one compiled program; small FMA-contraction tolerance across the two
  mesh programs);
* widen/split round-trips and treble-aware gathers;
* checkpoint byte-compatibility: the on-disk layout is the plain table +
  ``opt/entity/{mu,nu}``, loadable in either layout;
* init validation (un-widened tables rejected with a clear error).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import besskge_tpu.packed as pk
from besskge_tpu.optim import (
    RowAdamW,
    interleave_adamw,
    split_interleaved_adamw,
)


def test_widen_split_roundtrip_and_reads():
    rng = np.random.default_rng(0)
    n, d = 24, 128
    tab = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    nu = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    treb = interleave_adamw(tab, mu, nu)
    assert treb.shape == (3 * n, d)
    p, m, v = split_interleaved_adamw(treb)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(tab))
    np.testing.assert_array_equal(np.asarray(m), np.asarray(mu))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(nu))
    # treble-aware logical-row gathers
    idx = jnp.asarray(rng.integers(n, size=(3, 5)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(pk.take_rows(treb, idx, n_logical=n)),
        np.asarray(jnp.take(tab, idx, axis=0)),
    )
    got = pk.take_contiguous_rows(treb, jnp.int32(4), 8, n_logical=n)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(tab)[4:12]
    )
    # zero-moment widen
    _, m0, v0 = split_interleaved_adamw(interleave_adamw(tab))
    assert not np.asarray(m0).any() and not np.asarray(v0).any()


def test_init_validates_treble_height():
    row = RowAdamW(learning_rate=0.1, interleaved=True)
    tab = jnp.zeros((16, 128), jnp.float32)
    with pytest.raises(ValueError, match="interleave_adamw"):
        row.init(tab, n_logical=16)  # plain: not widened
    row.init(interleave_adamw(tab), n_logical=16)  # ok
    with pytest.raises(ValueError, match="treble-major"):
        row.init(jnp.zeros((16, 128), jnp.float32), n_logical=None)
    with pytest.raises(ValueError, match="fp32"):
        row.init(jnp.zeros((48, 128), jnp.bfloat16), n_logical=16)
    with pytest.raises(ValueError, match="packed"):
        interleave_adamw(pk.pack_table(jnp.zeros((16, 128), jnp.bfloat16)))


def test_treble_trajectory_matches_separate_buffers():
    """Identical arithmetic — the trajectories must match the
    separate-buffer RowAdamW bit-for-bit on one backend."""
    rng = np.random.default_rng(3)
    n, d = 24, 128
    tab0 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    def run(interleaved):
        opt = RowAdamW(
            learning_rate=0.05, weight_decay=0.01, interleaved=interleaved
        )
        table = interleave_adamw(tab0) if interleaved else tab0
        state = opt.init(table, n_logical=n)
        for step in range(5):
            srng = np.random.default_rng(100 + step)
            idx = jnp.asarray(srng.integers(n, size=12).astype(np.int32))
            grads = jnp.asarray(
                srng.normal(size=(12, d)).astype(np.float32)
            )
            table, state = opt.update_rows(table, state, idx, grads)
        if interleaved:
            p, m, v = split_interleaved_adamw(table)
            return np.asarray(p), np.asarray(m), np.asarray(v)
        return (
            np.asarray(table),
            np.asarray(state["mu"]),
            np.asarray(state["nu"]),
        )

    p_sep, mu_sep, nu_sep = run(False)
    p_int, mu_int, nu_int = run(True)
    np.testing.assert_allclose(p_int, p_sep, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(mu_int, mu_sep, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(nu_int, nu_sep, rtol=1e-6, atol=1e-8)


def test_end_to_end_mesh_and_checkpoint(tmp_path):
    """Full BESS train step with a treble-interleaved AdamW table on the
    8-device mesh via the Trainer's auto-widening; checkpoints store the
    plain layout (opt/entity/{mu,nu}) and load back in either layout."""
    from besskge_tpu.batch_sampler import RigidShardedBatchSampler
    from besskge_tpu.bess import EmbeddingMovingBessKGE
    from besskge_tpu.checkpoint import load_checkpoint, save_checkpoint
    from besskge_tpu.dataset import KGDataset
    from besskge_tpu.loss import LogSigmoidLoss
    from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
    from besskge_tpu.parallel import (
        make_shard_mesh,
        shard_batch,
        shard_params,
    )
    from besskge_tpu.scoring import TransE
    from besskge_tpu.sharding import PartitionedTripleSet, Sharding
    from besskge_tpu.trainer import build_train_step, init_optimizer_state

    rng = np.random.default_rng(7)
    n_entity, n_rel, n_train, n_shard = 200, 5, 256, 4
    triples = np.stack(
        [
            rng.integers(n_entity, size=n_train),
            rng.integers(n_rel, size=n_train),
            rng.integers(n_entity, size=n_train),
        ],
        axis=1,
    ).astype(np.int32)
    ds = KGDataset(
        n_entity=n_entity, n_relation_type=n_rel, entity_dict=None,
        relation_dict=None, type_offsets=None, triples={"train": triples},
        original_triple_ids={"train": np.arange(n_train)},
        neg_heads=None, neg_tails=None,
    )
    sharding = Sharding.create(n_entity, n_shard, seed=7)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    mesh = make_shard_mesh(n_shard)
    n_logical = sharding.n_shard * sharding.max_entity_per_shard

    def run(interleaved):
        score_fn = TransE(
            negative_sample_sharing=True, scoring_norm=1,
            sharding=sharding, n_relation_type=n_rel,
            embedding_size=128, seed=7,
        )
        ns = RandomShardedNegativeSampler(
            4, sharding, 7, "ht",
            local_sampling=False, flat_negative_format=True,
        )
        bs = RigidShardedBatchSampler(
            pts, ns, shard_bs=16, batches_per_step=2, seed=7
        )
        bess = EmbeddingMovingBessKGE(
            negative_sampler=ns, score_fn=score_fn,
            loss_fn=LogSigmoidLoss(
                margin=3.0, negative_adversarial_sampling=False
            ),
            axis_name="shard",
        )
        opt = optax.sgd(0.05)
        row = RowAdamW(
            learning_rate=0.05, weight_decay=0.01, interleaved=interleaved
        )
        params = {
            k: jnp.asarray(v) for k, v in score_fn.initial_params().items()
        }
        if interleaved:
            params["entity_embedding"] = interleave_adamw(
                params["entity_embedding"]
            )
        params = shard_params(params, mesh)
        opt_state = init_optimizer_state(
            opt, params, mesh, row, n_logical=n_logical
        )
        step_fn = build_train_step(bess, opt, mesh, row, donate=False)
        loader = bs.get_dataloader(shuffle=False)
        losses = []
        for _, batch in zip(range(3), loader):
            params, opt_state, out = step_fn(
                params, opt_state,
                {k: jnp.asarray(v) for k, v in batch.items()},
            )
            losses.append(float(np.sum(out["loss"])))
        return params, opt_state, losses

    p_sep, s_sep, l_sep = run(False)
    p_int, s_int, l_int = run(True)
    np.testing.assert_allclose(l_int, l_sep, rtol=1e-6)
    tab_int, mu_int, nu_int = split_interleaved_adamw(
        p_int["entity_embedding"]
    )
    np.testing.assert_allclose(
        np.asarray(tab_int), np.asarray(p_sep["entity_embedding"]),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(mu_int), np.asarray(s_sep["entity"]["mu"]),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(nu_int), np.asarray(s_sep["entity"]["nu"]),
        rtol=1e-5, atol=1e-7,
    )

    # checkpoint: treble save -> plain on disk -> load back both ways
    path = tmp_path / "ck.npz"
    save_checkpoint(
        path,
        {k: np.asarray(v) for k, v in p_int.items()},
        opt_state=jax.tree.map(np.asarray, s_int),
        sharding=sharding,
        step=3,
        interleaved_entity="adamw",
    )
    params_p, opt_p, _, meta = load_checkpoint(path)
    assert meta["step"] == 3
    np.testing.assert_array_equal(
        params_p["entity_embedding"], np.asarray(tab_int)
    )
    np.testing.assert_array_equal(opt_p["entity"]["mu"], np.asarray(mu_int))
    np.testing.assert_array_equal(opt_p["entity"]["nu"], np.asarray(nu_int))
    params_i, opt_i, _, _ = load_checkpoint(path, interleave_entity="adamw")
    np.testing.assert_array_equal(
        params_i["entity_embedding"], np.asarray(p_int["entity_embedding"])
    )
    assert "mu" not in opt_i["entity"] and "nu" not in opt_i["entity"]


def test_trainer_auto_widens_adamw(tmp_path):
    """The Trainer widens a plain table for an interleaved RowAdamW and
    saves checkpoints in the plain on-disk layout."""
    from besskge_tpu.batch_sampler import RandomShardedBatchSampler
    from besskge_tpu.bess import EmbeddingMovingBessKGE
    from besskge_tpu.checkpoint import load_checkpoint
    from besskge_tpu.dataset import KGDataset
    from besskge_tpu.loss import LogSigmoidLoss
    from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
    from besskge_tpu.scoring import DistMult
    from besskge_tpu.sharding import PartitionedTripleSet, Sharding
    from besskge_tpu.trainer import Trainer

    rng = np.random.default_rng(1)
    trip = np.stack(
        [
            rng.integers(90, size=600),
            rng.integers(4, size=600),
            rng.integers(90, size=600),
        ],
        1,
    ).astype(np.int32)
    ds = KGDataset(
        n_entity=90, n_relation_type=4, entity_dict=None,
        relation_dict=None, type_offsets=None, triples={"train": trip},
        original_triple_ids={"train": np.arange(600)},
        neg_heads=None, neg_tails=None,
    )
    sharding = Sharding.create(90, 1, seed=1)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    score_fn = DistMult(
        negative_sample_sharing=True, sharding=sharding,
        n_relation_type=4, embedding_size=16, seed=2,
    )
    ns = RandomShardedNegativeSampler(
        8, sharding, 1, "t", local_sampling=False, flat_negative_format=True
    )
    bs = RandomShardedBatchSampler(
        pts, ns, shard_bs=16, batches_per_step=2, seed=1
    )
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns, score_fn=score_fn,
        loss_fn=LogSigmoidLoss(
            margin=2.0, negative_adversarial_sampling=False
        ),
        axis_name=None,
    )
    row = RowAdamW(learning_rate=0.01, interleaved=True)
    tr = Trainer(bess, bs, optax.sgd(0.01), entity_optimizer=row)
    n_rows = sharding.max_entity_per_shard
    assert tr.params["entity_embedding"].shape[-2] == 3 * n_rows
    tr.fit(n_epochs=1)
    path = tmp_path / "ck.npz"
    tr.save(path)
    params, opt, _, _ = load_checkpoint(path)
    assert params["entity_embedding"].shape[-2] == n_rows
    assert "mu" in opt["entity"] and "nu" in opt["entity"]
    # wrong-height table fails clearly at construction
    bad = {
        k: np.asarray(v) for k, v in score_fn.initial_params().items()
    }
    bad["entity_embedding"] = np.zeros((2 * n_rows, 16), np.float32)
    with pytest.raises(ValueError, match="RowAdamW"):
        Trainer(
            bess, bs, optax.sgd(0.01), entity_optimizer=row, params=bad
        )


@pytest.mark.parametrize("half", ["bf16", "fp16"])
@pytest.mark.parametrize("sr", [True, False])
def test_packed_quint_trajectory_matches_separate(half, sr):
    """Packed-table interleaved AdamW (quintuplet-major (5P, D) store,
    packed.interleave_packed_adamw — the reference capacity tables' fp16
    + Adam recipe) applies identical arithmetic to the separate-buffer
    packed RowAdamW: bit-for-bit trajectories."""
    rng = np.random.default_rng(5)
    n, d = 24, 128
    hd = jnp.bfloat16 if half == "bf16" else jnp.float16
    packed0 = pk.pack_table(
        jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)).astype(hd)
    )

    def run(interleaved):
        opt = RowAdamW(
            learning_rate=0.05, weight_decay=0.01,
            stochastic_rounding=sr, interleaved=interleaved,
        )
        table = (
            pk.interleave_packed_adamw(packed0) if interleaved else packed0
        )
        state = opt.init(table, n_logical=n)
        for step in range(5):
            srng = np.random.default_rng(100 + step)
            idx = jnp.asarray(srng.integers(n, size=12).astype(np.int32))
            grads = jnp.asarray(
                srng.normal(size=(12, d)).astype(np.float32)
            )
            table, state = opt.update_rows(table, state, idx, grads)
        if interleaved:
            p, mu, nu = pk.split_packed_adamw(table)
            return np.asarray(p), np.asarray(mu), np.asarray(nu)
        return (
            np.asarray(table),
            np.asarray(state["mu"]),
            np.asarray(state["nu"]),
        )

    p_sep, mu_sep, nu_sep = run(False)
    p_int, mu_int, nu_int = run(True)
    np.testing.assert_array_equal(p_int, p_sep)
    np.testing.assert_array_equal(mu_int, mu_sep)
    np.testing.assert_array_equal(nu_int, nu_sep)


def test_packed_quint_reads_and_checkpoint(tmp_path):
    """Quintuplet widen/split round-trips; logical-row and contiguous
    gathers read through the (5P, D) store; checkpoint stores the plain
    packed table + logical fp32 mu/nu and loads back in either layout."""
    from besskge_tpu.checkpoint import load_checkpoint, save_checkpoint
    from besskge_tpu.sharding import Sharding

    rng = np.random.default_rng(6)
    n, d = 24, 128
    packed = pk.pack_table(
        jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    )
    mu = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    nu = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    quin = pk.interleave_packed_adamw(packed, mu, nu)
    assert quin.shape == (5 * n // 2, d)
    back_p, back_mu, back_nu = pk.split_packed_adamw(quin)
    np.testing.assert_array_equal(np.asarray(back_p), np.asarray(packed))
    np.testing.assert_array_equal(np.asarray(back_mu), np.asarray(mu))
    np.testing.assert_array_equal(np.asarray(back_nu), np.asarray(nu))
    idx = jnp.asarray(rng.integers(n, size=(2, 7)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(pk.take_rows(quin, idx, n_logical=n).astype(jnp.float32)),
        np.asarray(pk.take_rows(packed, idx).astype(jnp.float32)),
    )
    got = pk.take_contiguous_rows(quin, jnp.int32(4), 8, n_logical=n)
    want = pk.take_contiguous_rows(packed, jnp.int32(4), 8)
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)),
        np.asarray(want.astype(jnp.float32)),
    )

    # checkpoint round-trip (1-shard sharding metadata for completeness)
    sh = Sharding.create(n, 1, seed=0)
    path = tmp_path / "quin.npz"
    save_checkpoint(
        path,
        {"entity_embedding": np.asarray(quin)},
        opt_state={"entity": {"count": np.int32(7)}},
        sharding=sh,
        interleaved_entity="adamw",
    )
    params_p, opt_p, _, _ = load_checkpoint(path)
    np.testing.assert_array_equal(
        params_p["entity_embedding"], np.asarray(packed)
    )
    np.testing.assert_array_equal(opt_p["entity"]["mu"], np.asarray(mu))
    np.testing.assert_array_equal(opt_p["entity"]["nu"], np.asarray(nu))
    params_i, opt_i, _, _ = load_checkpoint(path, interleave_entity="adamw")
    np.testing.assert_array_equal(
        params_i["entity_embedding"], np.asarray(quin)
    )
    assert "mu" not in opt_i["entity"]


def test_packed_quint_init_validation():
    row = RowAdamW(learning_rate=0.1, interleaved=True)
    packed = pk.pack_table(jnp.zeros((16, 128), jnp.bfloat16))
    with pytest.raises(ValueError, match="interleave_packed_adamw"):
        row.init(packed, n_logical=16)
    row.init(pk.interleave_packed_adamw(packed), n_logical=16)  # ok
    with pytest.raises(ValueError, match="quintuplet-major"):
        row.init(packed[:4], n_logical=None)
