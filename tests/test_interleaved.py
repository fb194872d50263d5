"""Interleaved-momentum entity tables (VERDICT r3 #2).

``RowSGDM(interleaved=True)`` stores the momentum pair-major with the
params in ONE ``(2N, D)`` buffer (param row ``i`` at ``2i``, momentum at
``2i+1``) so the sparse update gathers and scatters (2, D) blocks — half
the DMA issues; the sparse step's scatter is scalar-core issue-bound
(BASELINE.md roofline). These tests pin:

* bit-level trajectory equivalence with the separate-buffer ``RowSGDM`` on
  the full mesh train step (same batches, same seeds);
* width-aware gathers: forward scores with a wide table equal those with
  the plain table (train and the three eval programs' gather paths);
* checkpoint round-trips: a checkpoint saved from an interleaved run is
  byte-compatible with a non-interleaved one (``params/entity_embedding``
  is the plain table, momentum under ``opt/entity/m``) and loads back in
  either layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from besskge_tpu.batch_sampler import RandomShardedBatchSampler
from besskge_tpu.bess import EmbeddingMovingBessKGE
from besskge_tpu.dataset import KGDataset
from besskge_tpu.checkpoint import load_checkpoint, save_checkpoint
from besskge_tpu.loss import LogSigmoidLoss
from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
from besskge_tpu.optim import RowSGDM, interleave_momentum, split_interleaved
from besskge_tpu.parallel import make_shard_mesh, shard_batch, shard_params
from besskge_tpu.scoring import DistMult
from besskge_tpu.sharding import PartitionedTripleSet, Sharding
from besskge_tpu.trainer import build_train_step, init_optimizer_state

SEED = 7
N_ENTITY = 90
N_RELATION = 4
N_SHARD = 4


def _setup():
    rng = np.random.default_rng(SEED)
    trip = np.stack(
        [
            rng.integers(N_ENTITY, size=1200),
            rng.integers(N_RELATION, size=1200),
            rng.integers(N_ENTITY, size=1200),
        ],
        1,
    ).astype(np.int32)
    ds = KGDataset(
        n_entity=N_ENTITY,
        n_relation_type=N_RELATION,
        entity_dict=None,
        relation_dict=None,
        type_offsets=None,
        triples={"train": trip},
        original_triple_ids={"train": np.arange(1200)},
        neg_heads=None,
        neg_tails=None,
    )
    sharding = Sharding.create(N_ENTITY, N_SHARD, seed=SEED)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    score_fn = DistMult(
        negative_sample_sharing=True,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=16,
        seed=2,
    )
    ns = RandomShardedNegativeSampler(
        8, sharding, SEED, "t", local_sampling=False, flat_negative_format=True
    )
    bs = RandomShardedBatchSampler(
        pts, ns, shard_bs=16, batches_per_step=4, seed=SEED
    )
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns,
        score_fn=score_fn,
        loss_fn=LogSigmoidLoss(margin=2.0, negative_adversarial_sampling=False),
    )
    return bess, bs, score_fn, sharding


def _run(bess, bs, score_fn, interleaved, n_steps=4, batches=None):
    mesh = make_shard_mesh(N_SHARD)
    params = shard_params(
        {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()},
        mesh,
    )
    if interleaved:
        params = dict(params)
        params["entity_embedding"] = interleave_momentum(
            params["entity_embedding"]
        )
        params = shard_params(params, mesh)
    opt = optax.sgd(0.3)
    row = RowSGDM(learning_rate=0.3, momentum=0.9, weight_decay=0.01,
                  interleaved=interleaved)
    state = init_optimizer_state(opt, params, mesh, row)
    step = build_train_step(bess, opt, mesh, row, donate=False)
    losses = []
    if batches is None:
        # the host sampler's RNG is stateful — pre-sample when comparing runs
        batches = [bs.sample_batch([i]) for i in range(n_steps)]
    for b in batches[:n_steps]:
        params, state, out = step(params, state, shard_batch(b, mesh))
        losses.append(float(out["loss"]))
    return params, state, losses


def test_interleaved_matches_separate_buffers():
    bess, bs, score_fn, _ = _setup()
    batches = [bs.sample_batch([i]) for i in range(4)]
    p_sep, s_sep, l_sep = _run(
        bess, bs, score_fn, interleaved=False, batches=batches
    )
    p_int, s_int, l_int = _run(
        bess, bs, score_fn, interleaved=True, batches=batches
    )
    np.testing.assert_allclose(l_sep, l_int, rtol=1e-6)
    tab_int, mom_int = split_interleaved(p_int["entity_embedding"])
    # The two layouts apply identical update arithmetic, but they are two
    # DIFFERENT compiled programs (pair-major vs plain gathers reshape the
    # surrounding graph), so XLA's FMA contraction can differ by a few ULP
    # (measured: params <=2 ULP, momentum <=58 ULP after 4 steps).
    # Same-layout bit-exactness — the guarantee that matters for resume —
    # is pinned by test_checkpoint_roundtrip_interleaved below.
    np.testing.assert_allclose(
        np.asarray(tab_int), np.asarray(p_sep["entity_embedding"]),
        rtol=1e-6, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(mom_int), np.asarray(s_sep["entity"]["m"]),
        rtol=1e-5, atol=1e-8,
    )
    np.testing.assert_array_equal(
        np.asarray(p_int["relation_embedding"]),
        np.asarray(p_sep["relation_embedding"]),
    )


def test_wide_table_forward_scores_match_plain():
    """Width-aware gathers: inference scores from a [params | momentum]
    table equal the plain-table scores (the momentum half is never read)."""
    rng = np.random.default_rng(SEED)
    trip = np.stack(
        [
            rng.integers(N_ENTITY, size=600),
            rng.integers(N_RELATION, size=600),
            rng.integers(N_ENTITY, size=600),
        ],
        1,
    ).astype(np.int32)
    ds = KGDataset(
        n_entity=N_ENTITY, n_relation_type=N_RELATION, entity_dict=None,
        relation_dict=None, type_offsets=None, triples={"train": trip},
        original_triple_ids={"train": np.arange(600)},
        neg_heads=None, neg_tails=None,
    )
    sharding1 = Sharding.create(N_ENTITY, 1, seed=SEED)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding1)
    score_fn = DistMult(
        negative_sample_sharing=True, sharding=sharding1,
        n_relation_type=N_RELATION, embedding_size=16, seed=2,
    )
    ns = RandomShardedNegativeSampler(
        8, sharding1, SEED, "t",
        local_sampling=False, flat_negative_format=True,
    )
    bs = RandomShardedBatchSampler(
        pts, ns, shard_bs=16, batches_per_step=4, seed=SEED
    )
    bess_1 = EmbeddingMovingBessKGE(
        negative_sampler=ns,
        score_fn=score_fn,
        loss_fn=LogSigmoidLoss(
            margin=2.0, negative_adversarial_sampling=False
        ),
        axis_name=None,
        return_scores=True,
    )
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}
    wide = dict(params)
    wide["entity_embedding"] = interleave_momentum(
        params["entity_embedding"],
        momentum=jnp.full_like(params["entity_embedding"], 123.0),
    )
    from besskge_tpu.bess import build_bess_forward

    batch = {
        k: jnp.asarray(v) for k, v in bs.sample_batch([0]).items()
        if k in ("head", "relation", "tail", "negative")
    }
    fwd = build_bess_forward(bess_1)
    out_plain = fwd(params, batch)
    out_wide = fwd(wide, batch)
    np.testing.assert_allclose(
        np.asarray(out_plain["negative_score"]),
        np.asarray(out_wide["negative_score"]),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_plain["positive_score"]),
        np.asarray(out_wide["positive_score"]),
        rtol=1e-6, atol=1e-6,
    )


def test_checkpoint_roundtrip_interleaved(tmp_path):
    """Interleaved save -> on-disk plain layout -> load back interleaved
    AND load back plain; both reproduce the exact trajectory state."""
    bess, bs, score_fn, sharding = _setup()
    p_int, s_int, _ = _run(bess, bs, score_fn, interleaved=True)
    path = tmp_path / "ck.npz"
    save_checkpoint(
        path,
        {k: np.asarray(v) for k, v in p_int.items()},
        opt_state=jax.tree.map(np.asarray, s_int),
        sharding=sharding,
        step=4,
        interleaved_entity=True,
    )
    tab, mom = split_interleaved(p_int["entity_embedding"])

    # plain load: byte-compatible with a non-interleaved RowSGDM checkpoint
    params_p, opt_p, _, meta = load_checkpoint(path)
    assert meta["step"] == 4
    np.testing.assert_array_equal(
        params_p["entity_embedding"], np.asarray(tab)
    )
    np.testing.assert_array_equal(
        opt_p["entity"]["m"], np.asarray(mom)
    )

    # interleaved load: wide table rebuilt, momentum consumed from opt/m
    params_i, opt_i, _, _ = load_checkpoint(path, interleave_entity=True)
    np.testing.assert_array_equal(
        params_i["entity_embedding"], np.asarray(p_int["entity_embedding"])
    )
    assert "m" not in opt_i["entity"]

    # resuming from the re-interleaved state matches resuming from the
    # original wide state bit-for-bit for another step
    mesh = make_shard_mesh(N_SHARD)
    opt = optax.sgd(0.3)
    row = RowSGDM(learning_rate=0.3, momentum=0.9, weight_decay=0.01,
                  interleaved=True)
    step = build_train_step(bess, opt, mesh, row, donate=False)
    b = shard_batch(bs.sample_batch([99]), mesh)

    def one(params, state):
        params = shard_params(
            {k: jnp.asarray(v) for k, v in params.items()}, mesh
        )
        state = jax.tree.map(jnp.asarray, state)
        p2, _, out = step(params, state, b)
        return np.asarray(p2["entity_embedding"]), float(out["loss"])

    t_orig, l_orig = one(p_int, s_int)
    t_resumed, l_resumed = one(params_i, {
        "entity": {k: v for k, v in opt_i["entity"].items()},
        "other": s_int["other"],
    })
    assert l_orig == l_resumed
    np.testing.assert_array_equal(t_orig, t_resumed)


def test_interleaved_requires_fp32_and_momentum():
    import pytest

    row = RowSGDM(learning_rate=0.1, momentum=0.0, interleaved=True)
    with pytest.raises(ValueError, match="momentum"):
        row.init(jnp.zeros((8, 32), jnp.float32))
    row2 = RowSGDM(learning_rate=0.1, momentum=0.9, interleaved=True)
    with pytest.raises(ValueError, match="fp32"):
        row2.init(jnp.zeros((8, 32), jnp.bfloat16))


def test_interleaved_init_validates_logical_height():
    """An even-N PLAIN table (not widened) passes the parity check alone but
    would take out-of-bounds DMA writes at phys=2*idx; with the logical row
    count supplied, init must demand the exact (2*n_logical, D) height
    (round-4 advisor finding)."""
    import pytest

    row = RowSGDM(learning_rate=0.1, momentum=0.9, interleaved=True)
    with pytest.raises(ValueError, match="interleave_momentum"):
        row.init(jnp.zeros((8, 32), jnp.float32), n_logical=8)
    # correctly widened table passes
    row.init(jnp.zeros((16, 32), jnp.float32), n_logical=8)
    # and the Trainer's init path threads n_logical through
    from besskge_tpu.trainer import init_optimizer_state as init_os

    with pytest.raises(ValueError, match="interleave_momentum"):
        init_os(
            optax.sgd(0.1),
            {"entity_embedding": jnp.zeros((8, 32), jnp.float32),
             "relation_embedding": jnp.zeros((4, 32), jnp.float32)},
            None, row, n_logical=8,
        )


def test_take_rows_paired_override():
    """Explicit ``paired=`` beats the shape heuristic: a plain table whose
    height happens to be 2*n_logical must be readable as plain (round-4
    advisor finding), and paired=True on an incompatible table raises."""
    import pytest

    from besskge_tpu.packed import pack_table, take_rows

    t = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    # heuristic says pair-major at n_logical=8 ...
    np.testing.assert_array_equal(
        np.asarray(take_rows(t, jnp.array([3]), n_logical=8))[0],
        np.asarray(t)[6],
    )
    # ... explicit override reads it as the plain table it is
    np.testing.assert_array_equal(
        np.asarray(take_rows(t, jnp.array([3]), n_logical=8, paired=False))[0],
        np.asarray(t)[3],
    )
    np.testing.assert_array_equal(
        np.asarray(take_rows(t, jnp.array([3]), paired=True))[0],
        np.asarray(t)[6],
    )
    with pytest.raises(ValueError, match="paired"):
        take_rows(
            pack_table(jnp.zeros((16, 4), jnp.bfloat16)),
            jnp.array([3]), paired=True,
        )
    with pytest.raises(ValueError, match="paired"):
        take_rows(jnp.zeros((15, 4), jnp.float32), jnp.array([3]), paired=True)


def test_fused_variant_field_overrides_env_default():
    """BESSKGE_FUSED_SGDM is captured once at import (trace-time reads would
    silently ignore mid-process changes — round-4 advisor finding); the
    RowSGDM.fused_variant field is the per-instance override."""
    from besskge_tpu import optim as optim_mod

    assert optim_mod._FUSED_SGDM_MODE == "xla"  # captured default
    row = RowSGDM(
        learning_rate=0.5, momentum=0.9, interleaved=True,
        fused_variant="xla",
    )
    n = 16
    table = interleave_momentum(
        jnp.asarray(np.random.default_rng(0).normal(size=(n, 32)), jnp.float32)
    )
    st = row.init(table, n_logical=n)
    idx = jnp.array([1, 5, 5, 9], jnp.int32)
    g = jnp.asarray(np.random.default_rng(1).normal(size=(4, 32)), jnp.float32)
    new_t, _ = row.update_rows(table, st, idx, g)
    assert np.isfinite(np.asarray(new_t)).all()
