"""Tests for sparse row-wise entity optimizers.

Sparse SGD must match the dense optax trajectory exactly (SGD is stateless,
so lazy == dense); lazy AdamW is checked against a numpy per-row reference
including duplicate-index handling; the bf16-table path must keep fp32
moments and still converge.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from besskge_tpu.batch_sampler import RandomShardedBatchSampler
from besskge_tpu.bess import EmbeddingMovingBessKGE
from besskge_tpu.dataset import KGDataset
from besskge_tpu.loss import LogSigmoidLoss
from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
from besskge_tpu.optim import RowAdagrad, RowAdamW, RowSGDM
from besskge_tpu.parallel import make_shard_mesh, shard_batch, shard_params
from besskge_tpu.scoring import DistMult, TransE
from besskge_tpu.sharding import PartitionedTripleSet, Sharding
from besskge_tpu.trainer import build_train_step, init_optimizer_state

SEED = 5
N_ENTITY = 90
N_RELATION = 4
N_SHARD = 4


def _setup(dtype=np.float32, emb=16):
    rng = np.random.default_rng(SEED)
    trip = np.stack(
        [
            rng.integers(N_ENTITY, size=1500),
            rng.integers(N_RELATION, size=1500),
            rng.integers(N_ENTITY, size=1500),
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
        original_triple_ids={"train": np.arange(1500)},
        neg_heads=None,
        neg_tails=None,
    )
    sharding = Sharding.create(N_ENTITY, N_SHARD, seed=SEED)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    score_fn = DistMult(
        negative_sample_sharing=True,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=emb,
        seed=2,
        dtype=dtype,
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


def test_sparse_sgd_matches_dense():
    bess, bs, score_fn, sharding = _setup()
    mesh = make_shard_mesh(N_SHARD)
    params0 = shard_params(
        {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}, mesh
    )
    batches = [
        shard_batch(bs.sample_batch([i]), mesh) for i in range(3)
    ]

    dense_opt = optax.sgd(0.5)
    p_dense = params0
    s_dense = init_optimizer_state(dense_opt, p_dense, mesh)
    step_dense = build_train_step(bess, dense_opt, mesh, donate=False)

    p_sparse = params0
    row_opt = RowSGDM(learning_rate=0.5, momentum=0.0)
    s_sparse = init_optimizer_state(dense_opt, p_sparse, mesh, row_opt)
    step_sparse = build_train_step(bess, dense_opt, mesh, row_opt, donate=False)

    for b in batches:
        p_dense, s_dense, out_d = step_dense(p_dense, s_dense, b)
        p_sparse, s_sparse, out_s = step_sparse(p_sparse, s_sparse, b)
        np.testing.assert_allclose(
            float(out_d["loss"]), float(out_s["loss"]), rtol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(p_dense["entity_embedding"]),
        np.asarray(p_sparse["entity_embedding"]),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(p_dense["relation_embedding"]),
        np.asarray(p_sparse["relation_embedding"]),
        rtol=1e-5,
        atol=1e-6,
    )


def test_row_adamw_update_rows_duplicates():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    opt = RowAdamW(learning_rate=0.1, weight_decay=0.01)
    state = opt.init(table)
    idx = jnp.asarray([2, 5, 2, 7, 5, 2], dtype=jnp.int32)
    grads = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    new_table, new_state = opt.update_rows(table, state, idx, grads)

    # Numpy reference: summed grads per unique row, one AdamW step.
    t_np = np.asarray(table).copy()
    mu = np.zeros_like(t_np)
    nu = np.zeros_like(t_np)
    g_sum = np.zeros_like(t_np)
    for i, g in zip(np.asarray(idx), np.asarray(grads)):
        g_sum[i] += g
    touched = np.unique(np.asarray(idx))
    for i in touched:
        g = g_sum[i]
        mu[i] = 0.1 * g
        nu[i] = 0.001 * g * g
        mu_hat = mu[i] / (1 - 0.9)
        nu_hat = nu[i] / (1 - 0.999)
        t_np[i] -= 0.1 * (mu_hat / (np.sqrt(nu_hat) + 1e-8) + 0.01 * t_np[i])
    np.testing.assert_allclose(np.asarray(new_table), t_np, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["mu"]), mu, rtol=1e-5)
    # Untouched rows unchanged.
    untouched = np.setdiff1d(np.arange(10), touched)
    np.testing.assert_array_equal(
        np.asarray(new_table)[untouched], np.asarray(table)[untouched]
    )


def test_sparse_adamw_trains_and_respects_padding():
    bess, bs, score_fn, sharding = _setup()
    mesh = make_shard_mesh(N_SHARD)
    params = shard_params(
        {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}, mesh
    )
    row_opt = RowAdamW(learning_rate=5e-2)
    opt = optax.adam(5e-2)
    opt_state = init_optimizer_state(opt, params, mesh, row_opt)
    step = build_train_step(bess, opt, mesh, row_opt)
    batch = shard_batch(bs.sample_batch([0]), mesh)
    loss0 = None
    ent0 = np.asarray(params["entity_embedding"])
    for i in range(50):
        params, opt_state, out = step(params, opt_state, batch)
        if loss0 is None:
            loss0 = float(out["loss"])
    loss1 = float(out["loss"])
    assert loss1 < 0.8 * loss0, (loss0, loss1)
    # Padding rows (ids >= n_entity) never move: their local rows are never
    # in any gather plan because samplers only emit real local ids.
    pad = sharding.shard_and_idx_to_entity >= N_ENTITY
    shape3 = (N_SHARD, sharding.max_entity_per_shard, -1)
    np.testing.assert_array_equal(
        np.asarray(params["entity_embedding"]).reshape(shape3)[pad],
        ent0.reshape(shape3)[pad],
    )


def test_sparse_bf16_table():
    bess, bs, score_fn, sharding = _setup(dtype=jnp.bfloat16)
    mesh = make_shard_mesh(N_SHARD)
    params = shard_params(
        {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}, mesh
    )
    assert params["entity_embedding"].dtype == jnp.bfloat16
    row_opt = RowAdagrad(learning_rate=0.3)
    opt = optax.adam(5e-3)
    opt_state = init_optimizer_state(opt, params, mesh, row_opt)
    assert opt_state["entity"]["acc"].dtype == jnp.float32
    step = build_train_step(bess, opt, mesh, row_opt)
    batch = shard_batch(bs.sample_batch([0]), mesh)
    for i in range(20):
        params, opt_state, out = step(params, opt_state, batch)
        if i == 0:
            loss0 = float(out["loss"])
    loss1 = float(out["loss"])
    assert params["entity_embedding"].dtype == jnp.bfloat16
    assert np.isfinite(loss1) and loss1 < loss0, (loss0, loss1)


def test_sparse_sgd_matches_dense_score_moving():
    """Sparse-update path through ScoreMoving's AllGather/AllToAll
    transposes must equal the dense trajectory (SGD, stateless)."""
    from besskge_tpu.bess import ScoreMovingBessKGE

    bess_em, bs, score_fn, sharding = _setup()
    bess = ScoreMovingBessKGE(
        negative_sampler=bess_em.negative_sampler,
        score_fn=score_fn,
        loss_fn=bess_em.loss_fn,
    )
    mesh = make_shard_mesh(N_SHARD)
    params0 = shard_params(
        {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}, mesh
    )
    batch = shard_batch(bs.sample_batch([0]), mesh)
    opt = optax.sgd(0.5)

    p_d = params0
    s_d = init_optimizer_state(opt, p_d, mesh)
    step_d = build_train_step(bess, opt, mesh, donate=False)
    p_s = params0
    row = RowSGDM(learning_rate=0.5, momentum=0.0)
    s_s = init_optimizer_state(opt, p_s, mesh, row)
    step_s = build_train_step(bess, opt, mesh, row, donate=False)
    for _ in range(2):
        p_d, s_d, out_d = step_d(p_d, s_d, batch)
        p_s, s_s, out_s = step_s(p_s, s_s, batch)
    np.testing.assert_allclose(
        np.asarray(p_d["entity_embedding"]),
        np.asarray(p_s["entity_embedding"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(p_d["relation_embedding"]),
        np.asarray(p_s["relation_embedding"]),
        rtol=1e-5, atol=1e-6,
    )


def test_compute_dtype_bf16_training():
    """bf16-compute over fp32 storage: scores close to fp32, training
    converges, params stay fp32."""
    bess, bs, score_fn, sharding = _setup()
    mesh = make_shard_mesh(N_SHARD)
    params = shard_params(
        {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}, mesh
    )
    from besskge_tpu.bess import build_bess_forward

    batch = shard_batch(bs.sample_batch([0]), mesh)
    fwd32 = build_bess_forward(bess, mesh)
    l32 = float(fwd32(params, batch)["loss"])
    score_fn.compute_dtype = jnp.bfloat16
    fwd16 = build_bess_forward(bess, mesh)
    l16 = float(fwd16(params, batch)["loss"])
    assert abs(l32 - l16) / abs(l32) < 0.02, (l32, l16)

    row_opt = RowAdamW(learning_rate=5e-2)
    opt = optax.adam(5e-2)
    opt_state = init_optimizer_state(opt, params, mesh, row_opt)
    step = build_train_step(bess, opt, mesh, row_opt, donate=False)
    for i in range(30):
        params, opt_state, out = step(params, opt_state, batch)
    assert params["entity_embedding"].dtype == jnp.float32
    assert float(out["loss"]) < 0.9 * l16
    score_fn.compute_dtype = None


def test_fused_dense_adamw_matches_optax():
    """FusedDenseAdamW trajectory == optax.adamw (entity leaf) exactly
    (CPU fallback path computes the same formula)."""
    from besskge_tpu.optim import FusedDenseAdamW

    bess, bs, score_fn, sharding = _setup()
    mesh = make_shard_mesh(N_SHARD)
    params0 = shard_params(
        {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}, mesh
    )
    batch = shard_batch(bs.sample_batch([0]), mesh)
    lr, wd = 3e-2, 1e-3

    opt = optax.adamw(lr, weight_decay=wd)
    p_d = params0
    s_d = init_optimizer_state(opt, p_d, mesh)
    step_d = build_train_step(bess, opt, mesh, donate=False)

    fused = FusedDenseAdamW(learning_rate=lr, weight_decay=wd)
    p_f = params0
    s_f = init_optimizer_state(opt, p_f, mesh, fused)
    step_f = build_train_step(bess, opt, mesh, fused, donate=False)

    for _ in range(3):
        p_d, s_d, out_d = step_d(p_d, s_d, batch)
        p_f, s_f, out_f = step_f(p_f, s_f, batch)
        np.testing.assert_allclose(
            float(out_d["loss"]), float(out_f["loss"]), rtol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(p_d["entity_embedding"]),
        np.asarray(p_f["entity_embedding"]),
        rtol=1e-5, atol=1e-6,
    )


def test_sparse_mesh_step_hlo_flat_in_bps():
    """The sparse mesh path scans micro-batches: the compiled program must
    not grow with batches_per_step (round-1 unrolled it, HLO ~ O(bps))."""
    import jax

    def hlo_len(bps):
        bess, bs, score_fn, sharding = _setup()
        bs.batches_per_step = bps
        mesh = make_shard_mesh(N_SHARD)
        params = shard_params(
            {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()},
            mesh,
        )
        row_opt = RowSGDM(learning_rate=0.5, momentum=0.9)
        opt = optax.sgd(0.5)
        state = init_optimizer_state(opt, params, mesh, row_opt)
        step = build_train_step(bess, opt, mesh, row_opt, donate=False)
        batch = shard_batch(bs.sample_batch([0]), mesh)
        lowered = jax.jit(lambda p, s, b: step(p, s, b)).lower(
            params, state, batch
        )
        return len(lowered.compile().as_text())

    small, large = hlo_len(2), hlo_len(16)
    assert large < 1.5 * small, (small, large)


# ---------------------------------------------------------------------------
# stochastic rounding into 16-bit tables
# ---------------------------------------------------------------------------


def test_sr_round_bf16_is_unbiased_and_progresses():
    """SR must (a) be unbiased in expectation over step counts and (b) let
    sub-ulp updates make progress where round-to-nearest freezes."""
    import jax.numpy as jnp

    from besskge_tpu.optim import _sr_round_bf16

    idx = jnp.arange(4, dtype=jnp.int32)
    target = np.full((4, 128), 1.0 + 2.0 ** -10, np.float32)  # between ulps
    rows = jnp.asarray(target)
    # (a) unbiased: average over many counts converges to the fp32 value
    acc = np.zeros_like(target, np.float64)
    n = 400
    for c in range(n):
        acc += np.asarray(
            _sr_round_bf16(rows, idx, jnp.asarray(c, jnp.int32)),
            np.float32,
        )
    # per-element: binomial noise ~ ulp*0.5/sqrt(n) ~ 1e-4 -> 6 sigma
    np.testing.assert_allclose(acc / n, target, rtol=8e-4)
    # global mean: noise ~ 4e-6 -> tight unbiasedness check
    np.testing.assert_allclose((acc / n).mean(), target.mean(), rtol=2e-5)
    # RN by comparison collapses to exactly 1.0 (drops the 2^-10)
    assert (np.asarray(rows.astype(jnp.bfloat16), np.float32) == 1.0).all()

    # (b) progress: repeated tiny decrements move the stored bf16 value
    import ml_dtypes

    w = jnp.asarray(np.ones((4, 128), ml_dtypes.bfloat16))
    for c in range(300):
        new = w.astype(jnp.float32) - 1e-4  # ~1/40 ulp at 1.0
        w = _sr_round_bf16(new, idx, jnp.asarray(c, jnp.int32))
    moved = float(np.mean(np.asarray(w, np.float32)))
    assert moved < 0.985, moved  # expected ~0.97; RN would stay at 1.0


def test_sr_duplicate_occurrences_identical():
    """Duplicate row occurrences must round to byte-identical values (the
    racing-DMA contract)."""
    import jax.numpy as jnp

    from besskge_tpu.optim import _sr_round_bf16

    rng = np.random.default_rng(0)
    row = rng.normal(size=(1, 128)).astype(np.float32)
    rows = jnp.asarray(np.repeat(row, 3, axis=0))
    idx = jnp.asarray(np.array([7, 7, 7], np.int32))
    out = np.asarray(
        _sr_round_bf16(rows, idx, jnp.asarray(5, jnp.int32)), np.float32
    )
    assert (out == out[0]).all()


def test_sparse_bf16_training_learns_with_sr():
    """End-to-end: with lr far below the bf16 ulp, a packed-table RowSGDM
    trajectory must still track the fp32 trajectory in expectation (it
    freezes with stochastic_rounding=False)."""
    import jax.numpy as jnp

    import besskge_tpu.packed as pk
    from besskge_tpu.optim import RowSGDM

    rng = np.random.default_rng(1)
    n, d, lr = 32, 128, 1e-4
    tab32 = (rng.normal(size=(n, d)) * 2).astype(np.float32)

    def run(table, sr):
        opt = RowSGDM(learning_rate=lr, momentum=0.0,
                      stochastic_rounding=sr)
        state = opt.init(table)
        for step in range(400):
            srng = np.random.default_rng(1000 + step)
            idx = jnp.asarray(np.arange(n, dtype=np.int32))
            grads = jnp.asarray(
                np.ones((n, d), np.float32)
            )  # constant pull: fp32 moves by lr each step
            table, state = opt.update_rows(table, state, idx, grads)
        if pk.is_packed(table):
            return np.asarray(pk.unpack_table(table, n).astype(jnp.float32))
        return np.asarray(table.astype(jnp.float32))

    # SR: the MEAN movement matches the fp32 drift of -400*lr = -0.04
    # (per-element it is a random walk with ~ulp-sized steps; the mean over
    # 32*128 elements has noise ~1e-3)
    with_sr = run(pk.pack_table(jnp.asarray(tab32)), True)
    without = run(pk.pack_table(jnp.asarray(tab32)), False)
    move_sr = (with_sr - tab32.astype(np.float32)).mean()
    np.testing.assert_allclose(move_sr, -400 * lr, atol=8e-3)
    # round-to-nearest freezes: per-step 1e-4 is far below ulp(|w|~2)
    move_rn = np.abs(without - np.asarray(
        pk.unpack_table_host(np.asarray(pk.pack_table(jnp.asarray(tab32))), 32),
        np.float32)).mean()
    assert move_rn < 0.004, move_rn


def test_schedule_learning_rate_matches_manual_floats():
    """A schedule lr must reproduce running each step with the schedule's
    value passed as a static float (pre-increment count: step k uses
    schedule(k), matching optax.scale_by_schedule)."""
    rng = np.random.default_rng(3)
    table0 = jnp.asarray(rng.normal(size=(12, 8)).astype(np.float32))
    sched = optax.cosine_decay_schedule(0.05, decay_steps=10, alpha=0.1)
    idxs = [jnp.asarray(rng.integers(0, 12, size=6), jnp.int32) for _ in range(5)]
    gradss = [jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32)) for _ in range(5)]

    for make in (
        lambda lr: RowSGDM(learning_rate=lr, momentum=0.9),
        lambda lr: RowAdamW(learning_rate=lr, weight_decay=0.01),
        lambda lr: RowAdagrad(learning_rate=lr),
    ):
        opt = make(sched)
        table, state = table0, opt.init(table0)
        for idx, grads in zip(idxs, gradss):
            table, state = opt.update_rows(table, state, idx, grads)

        table_m = table0
        state_m = make(0.0).init(table0)
        for k, (idx, grads) in enumerate(zip(idxs, gradss)):
            opt_k = make(float(sched(k)))
            table_m, state_m = opt_k.update_rows(table_m, state_m, idx, grads)
        np.testing.assert_allclose(
            np.asarray(table), np.asarray(table_m), rtol=1e-6, atol=1e-7
        )


def test_fused_dense_adamw_schedule_takes_jnp_path():
    from besskge_tpu.optim import FusedDenseAdamW

    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
    grad = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
    sched = optax.cosine_decay_schedule(0.02, decay_steps=4)
    opt = FusedDenseAdamW(learning_rate=sched)
    state = opt.init(table)
    t1, s1 = opt.apply_dense(table, state, grad)
    t1f, _ = FusedDenseAdamW(learning_rate=float(sched(0))).apply_dense(
        table, state, grad
    )
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t1f), rtol=1e-6)
    assert int(s1["count"]) == 1
