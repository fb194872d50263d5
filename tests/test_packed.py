"""Row-pair-packed bf16 entity tables (:mod:`besskge_tpu.packed`).

The packed representation backs the reference's fp16 capacity recipe
(``/root/reference/notebooks/3_wikikg2_fp16.ipynb``) on TPU: these tests pin
the bit-exact pack/unpack contract, the duplicate-safe packed-row merge, and
end-to-end training equality between packed-bf16 and plain-bf16 tables.
"""

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import optax
import pytest

import besskge_tpu.packed as pk
from besskge_tpu.optim import RowAdamW, RowSGDM


def _bf16(x):
    return np.asarray(x, dtype=ml_dtypes.bfloat16)


def test_pack_unpack_roundtrip_and_host_parity():
    rng = np.random.default_rng(0)
    for n in (6, 7):  # even and odd logical row counts
        tab = rng.normal(size=(n, 256)).astype(np.float32)
        packed = pk.pack_table(jnp.asarray(tab))
        assert packed.shape == ((n + 1) // 2, 256)
        assert packed.dtype == jnp.int32
        unp = np.asarray(pk.unpack_table(packed, n).astype(jnp.float32))
        np.testing.assert_array_equal(unp, _bf16(tab).astype(np.float32))
        # Host numpy pack is bit-identical to the device transform.
        np.testing.assert_array_equal(pk.pack_table_host(tab), np.asarray(packed))
        back = pk.unpack_table_host(np.asarray(packed), n)
        np.testing.assert_array_equal(back, _bf16(tab))


def test_take_rows_matches_bf16_take():
    rng = np.random.default_rng(1)
    tab = rng.normal(size=(31, 128)).astype(np.float32)
    packed = pk.pack_table(jnp.asarray(tab))
    idx = rng.integers(31, size=(4, 9)).astype(np.int32)
    got = pk.take_rows(packed, jnp.asarray(idx))
    assert got.dtype == jnp.bfloat16 and got.shape == (4, 9, 128)
    want = jnp.take(jnp.asarray(_bf16(tab)), jnp.asarray(idx), axis=0)
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)), np.asarray(want.astype(jnp.float32))
    )
    # Plain tables pass straight through jnp.take.
    plain = pk.take_rows(jnp.asarray(tab), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(plain), tab[idx])


@pytest.mark.parametrize("three_d", [False, True])
def test_merge_packed_row_writes(three_d):
    """Sibling pairs, duplicates, lone rows: the merged packed writes must be
    byte-identical per packed row and reproduce the logical writes."""
    rng = np.random.default_rng(2)
    n, d = 16, 128
    tab = rng.normal(size=(n, d)).astype(np.float32)
    packed = pk.pack_table(jnp.asarray(tab))
    if three_d:
        packed = packed[None]
    # logical rows: 4&5 are siblings (pair 2, both halves written), 4 twice
    # (duplicate), 10 lone (other half preserved), 7&6 siblings written in
    # reverse order.
    idx = np.array([4, 5, 4, 10, 7, 6, 5], np.int32)
    rows = rng.normal(size=(7, d)).astype(np.float32)
    rows[2] = rows[0]  # duplicate occurrences carry identical content
    rows[6] = rows[1]
    p_idx, p_rows = pk.merge_packed_row_writes(
        packed, jnp.asarray(idx), jnp.asarray(rows)
    )
    p_idx, p_rows = np.asarray(p_idx), np.asarray(p_rows)
    np.testing.assert_array_equal(np.sort(p_idx), [2, 2, 2, 2, 3, 3, 5])
    for p in np.unique(p_idx):
        dup = p_rows[p_idx == p]
        assert (dup == dup[0]).all(), "racing DMAs must write identical bytes"
    sim = np.asarray(packed if not three_d else packed[0]).copy()
    sim[p_idx] = p_rows  # any write order — duplicates are identical
    got = pk.unpack_table_host(sim, n)
    want = _bf16(tab).copy()
    for i, li in enumerate(idx):
        want[li] = _bf16(rows[i])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("opt_name", ["sgdm", "adamw"])
def test_sparse_training_packed_equals_plain_bf16(opt_name):
    """A sparse row-optimizer trajectory on a packed table is bit-identical
    to the same trajectory on a plain bf16 table (the XLA fallback path)."""
    rng = np.random.default_rng(3)
    n, d = 24, 128
    tab32 = rng.normal(size=(n, d)).astype(np.float32)
    make_opt = {
        "sgdm": lambda: RowSGDM(learning_rate=0.05, momentum=0.9),
        "adamw": lambda: RowAdamW(learning_rate=0.05, weight_decay=0.01),
    }[opt_name]

    def run(table):
        opt = make_opt()
        state = opt.init(table)
        for step in range(5):
            srng = np.random.default_rng(100 + step)
            idx = jnp.asarray(srng.integers(n, size=12).astype(np.int32))
            grads = jnp.asarray(srng.normal(size=(12, d)).astype(np.float32))
            table, state = opt.update_rows(table, state, idx, grads)
        if pk.is_packed(table):
            return np.asarray(pk.unpack_table(table, n).astype(jnp.float32))
        return np.asarray(table.astype(jnp.float32))

    plain = run(jnp.asarray(_bf16(tab32)))
    packed = run(pk.pack_table(jnp.asarray(tab32)))
    np.testing.assert_array_equal(packed, plain)
    # And the bf16 trajectory tracks fp32 within bf16 rounding noise.
    full = run(jnp.asarray(tab32))
    np.testing.assert_allclose(packed, full, rtol=0.05, atol=0.05)


def test_packed_moment_shapes():
    tab = pk.pack_table(jnp.asarray(np.zeros((10, 128), np.float32)))
    state = RowAdamW(learning_rate=0.1).init(tab)
    assert state["mu"].shape == (10, 128)  # 2 * packed rows = logical rows
    assert state["mu"].dtype == jnp.float32


def test_end_to_end_packed_training_on_mesh():
    """Full BESS train step with a packed bf16 table on the 8-device mesh:
    runs, loss finite, and the final table matches the plain-bf16 run."""
    import jax.random as jr

    from besskge_tpu.batch_sampler import RigidShardedBatchSampler
    from besskge_tpu.bess import EmbeddingMovingBessKGE
    from besskge_tpu.dataset import KGDataset
    from besskge_tpu.loss import LogSigmoidLoss
    from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
    from besskge_tpu.optim import RowSGDM
    from besskge_tpu.parallel import make_shard_mesh
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
        n_entity=n_entity,
        n_relation_type=n_rel,
        entity_dict=None,
        relation_dict=None,
        type_offsets=None,
        triples={"train": triples},
        original_triple_ids={"train": np.arange(n_train)},
        neg_heads=None,
        neg_tails=None,
    )
    sharding = Sharding.create(n_entity, n_shard, seed=7)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    mesh = make_shard_mesh(n_shard)

    def run(packed_storage):
        score_fn = TransE(
            negative_sample_sharing=True,
            scoring_norm=1,
            sharding=sharding,
            n_relation_type=n_rel,
            embedding_size=128,
            seed=7,
        )
        score_fn.dtype = jnp.bfloat16
        score_fn.packed_entity_storage = packed_storage
        ns = RandomShardedNegativeSampler(
            4, sharding, 7, "ht", local_sampling=False, flat_negative_format=True
        )
        bs = RigidShardedBatchSampler(
            pts, ns, shard_bs=16, batches_per_step=2, seed=7
        )
        bess = EmbeddingMovingBessKGE(
            negative_sampler=ns,
            score_fn=score_fn,
            loss_fn=LogSigmoidLoss(
                margin=3.0, negative_adversarial_sampling=False
            ),
            axis_name="shard",
        )
        opt = optax.sgd(0.05)
        row = RowSGDM(learning_rate=0.05, momentum=0.9)
        params = score_fn.initial_params()
        params = {k: jnp.asarray(v) for k, v in params.items()}
        opt_state = init_optimizer_state(opt, params, mesh, row)
        step_fn = build_train_step(bess, opt, mesh, row)
        loader = bs.get_dataloader(shuffle=False)
        losses = []
        for _, batch in zip(range(3), loader):
            params, opt_state, out = step_fn(
                params, opt_state, {k: jnp.asarray(v) for k, v in batch.items()}
            )
            losses.append(float(np.sum(out["loss"])))
        table = params["entity_embedding"]
        if pk.is_packed(table):
            table = pk.unpack_table(table, table.shape[0] * 2)
        return np.asarray(table.astype(jnp.float32)), losses

    plain_tab, plain_losses = run(False)
    packed_tab, packed_losses = run(True)
    assert all(np.isfinite(plain_losses)) and all(np.isfinite(packed_losses))
    np.testing.assert_allclose(packed_losses, plain_losses, rtol=1e-5)
    # The pack/unpack transforms are bit-exact (test_pack_roundtrip*), but
    # the two runs compile to different fusions, so fp32 gradient reductions
    # may reassociate; allow a couple of bf16 ulps on a handful of elements.
    import ml_dtypes

    a = packed_tab.astype(ml_dtypes.bfloat16).view(np.uint16).astype(np.int32)
    b = plain_tab.astype(ml_dtypes.bfloat16).view(np.uint16).astype(np.int32)
    # Map the bf16 bit pattern to a monotonic integer line (sign-magnitude
    # → offset binary) so subtraction counts representable values between.
    a = np.where(a >= 0x8000, 0x8000 - a, a + 0x8000)
    b = np.where(b >= 0x8000, 0x8000 - b, b + 0x8000)
    ulps = np.abs(a - b)
    assert ulps.max() <= 4, f"max ulp diff {ulps.max()}"
    assert (ulps > 0).mean() < 1e-3, f"{(ulps > 0).sum()} elements differ"


def test_take_contiguous_rows_matches_take_rows():
    """Windowed loads (TopK/AllScores) must agree with the row gather for
    plain and packed tables, including clamped starts."""
    rng = np.random.default_rng(9)
    tab = rng.normal(size=(53, 128)).astype(np.float32)
    packed = pk.pack_table(jnp.asarray(tab))
    plain = jnp.asarray(_bf16(tab))
    for start, w in ((0, 16), (20, 16), (38, 16), (2, 52)):
        idx = jnp.arange(start, start + w, dtype=jnp.int32)
        for t in (plain, packed):
            got = pk.take_contiguous_rows(t, jnp.asarray(start), w)
            # clamp semantics: dynamic_slice shifts the window in range
            cap = 2 * packed.shape[0] if pk.is_packed(t) else t.shape[0]
            lo = min(start, cap - w)
            want = pk.take_rows(t, jnp.arange(lo, lo + w, dtype=jnp.int32))
            np.testing.assert_array_equal(
                np.asarray(got.astype(jnp.float32)),
                np.asarray(want.astype(jnp.float32)),
            )


def test_topk_packed_table_matches_plain():
    """TopKQueryBessKGE over a packed bf16 table returns the same
    completions as over the plain bf16 table (contiguous packed windows)."""
    from besskge_tpu.bess import TopKQueryBessKGE
    from besskge_tpu.negative_sampler import PlaceholderNegativeSampler
    from besskge_tpu.scoring import TransE
    from besskge_tpu.sharding import Sharding

    rng = np.random.default_rng(10)
    n_entity, n_shard, n_query = 220, 4, 12
    sharding = Sharding.create(n_entity, n_shard, seed=3)
    score_fn = TransE(
        negative_sample_sharing=True, scoring_norm=1, sharding=sharding,
        n_relation_type=4, embedding_size=128, seed=3,
    )
    score_fn.dtype = jnp.bfloat16
    ns = PlaceholderNegativeSampler("t")

    head = rng.integers(sharding.max_entity_per_shard, size=n_query)
    rel = rng.integers(4, size=n_query)

    def run(packed_storage):
        import jax as _jax

        from besskge_tpu.parallel import make_shard_mesh
        from besskge_tpu.parallel.mesh import shard_params

        score_fn.packed_entity_storage = packed_storage
        topk = TopKQueryBessKGE(
            k=8, candidate_sampler=ns, score_fn=score_fn, window_size=16
        )
        mesh = make_shard_mesh(n_shard)
        params = shard_params(
            {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()},
            mesh,
        )
        from jax.sharding import PartitionSpec as P

        fwd = _jax.jit(
            _jax.shard_map(
                lambda p, r, h: topk.forward(p, r, head=h),
                mesh=mesh,
                in_specs=(
                    {k: P("shard") for k in params},
                    P("shard"),
                    P("shard"),
                ),
                out_specs=P("shard"),
                check_vma=False,
            )
        )
        rel_g = jnp.asarray(
            np.tile(rel, n_shard).reshape(n_shard * n_query), jnp.int32
        )
        head_g = jnp.asarray(
            np.tile(head, n_shard).reshape(n_shard * n_query), jnp.int32
        )
        out = fwd(params, rel_g, head_g)
        return np.asarray(out["topk_global_id"])

    plain = run(False)
    packed = run(True)
    np.testing.assert_array_equal(plain, packed)


def test_scoremoving_eval_packed_matches_plain():
    """ScoreMovingBessKGE candidate evaluation over a packed bf16 table
    returns the same metrics as over the plain bf16 table (the wikikg2
    capacity recipe's validation path)."""
    from besskge_tpu.batch_sampler import RigidShardedBatchSampler
    from besskge_tpu.bess import ScoreMovingBessKGE, build_bess_forward
    from besskge_tpu.dataset import KGDataset
    from besskge_tpu.metric import Evaluation
    from besskge_tpu.negative_sampler import TripleBasedShardedNegativeSampler
    from besskge_tpu.parallel import make_shard_mesh
    from besskge_tpu.scoring import TransE
    from besskge_tpu.sharding import PartitionedTripleSet, Sharding

    rng = np.random.default_rng(17)
    n_entity, n_shard, n_tri, n_neg = 240, 4, 96, 20
    tri = np.stack(
        [
            rng.integers(n_entity, size=n_tri),
            rng.integers(5, size=n_tri),
            rng.integers(n_entity, size=n_tri),
        ],
        axis=1,
    ).astype(np.int32)
    nh = rng.integers(n_entity, size=(n_tri, n_neg)).astype(np.int32)
    nt = rng.integers(n_entity, size=(n_tri, n_neg)).astype(np.int32)
    ds = KGDataset(
        n_entity=n_entity, n_relation_type=5, entity_dict=None,
        relation_dict=None, type_offsets=None,
        triples={"valid": tri},
        original_triple_ids={"valid": np.arange(n_tri)},
        neg_heads={"valid": nh}, neg_tails={"valid": nt},
    )
    sharding = Sharding.create(n_entity, n_shard, seed=17)
    mesh = make_shard_mesh(n_shard)

    def run(packed_storage):
        pts = PartitionedTripleSet.create_from_dataset(ds, "valid", sharding)
        sf = TransE(
            negative_sample_sharing=False, scoring_norm=1,
            sharding=sharding, n_relation_type=5, embedding_size=128,
            seed=17,
        )
        sf.dtype = jnp.bfloat16
        sf.packed_entity_storage = packed_storage
        ns = TripleBasedShardedNegativeSampler(
            pts.neg_heads, pts.neg_tails, sharding,
            corruption_scheme="ht", seed=17,
        )
        bs = RigidShardedBatchSampler(
            pts, ns, shard_bs=16, batches_per_step=2, seed=17,
            duplicate_batch=True,
        )
        ev = Evaluation(["mrr", "hits@10"], reduction="sum")
        bess = ScoreMovingBessKGE(
            negative_sampler=ns, score_fn=sf, evaluation=ev,
        )
        fwd = build_bess_forward(bess, mesh)
        params = sf.initial_params()
        if packed_storage:
            assert pk.is_packed(params["entity_embedding"])
        totals = np.zeros(2)
        n_q = 0
        for batch in bs.get_dataloader(shuffle=False):
            out = fwd(params, {k: jnp.asarray(v) for k, v in batch.items()})
            totals += np.asarray(out["metrics"], np.float64).reshape(
                -1, 2
            ).sum(0)
            n_q += int(batch["triple_mask"].sum())
        return totals / n_q

    plain = run(False)
    packed = run(True)
    np.testing.assert_allclose(packed, plain, rtol=1e-6, atol=1e-7)


def test_fp16_pack_unpack_roundtrip_and_host_parity():
    """uint32 storage = packed fp16: bit-exact roundtrip, device == host."""
    rng = np.random.default_rng(11)
    for n in (6, 7):
        tab = rng.normal(size=(n, 128)).astype(np.float16)
        packed = pk.pack_table(jnp.asarray(tab))
        assert packed.dtype == jnp.uint32
        assert pk.half_dtype(packed) == jnp.float16
        unp = np.asarray(pk.unpack_table(packed, n))
        assert unp.dtype == np.float16
        np.testing.assert_array_equal(unp, tab)
        host = pk.pack_table_host(tab)
        assert host.dtype == np.uint32
        np.testing.assert_array_equal(np.asarray(packed), host)
        np.testing.assert_array_equal(pk.unpack_table_host(host, n), tab)


def test_fp16_take_rows_and_contiguous():
    rng = np.random.default_rng(12)
    n, d = 16, 128
    tab = rng.normal(size=(n, d)).astype(np.float16)
    packed = pk.pack_table(jnp.asarray(tab))
    idx = jnp.asarray([0, 3, 3, 15, 8], jnp.int32)
    got = np.asarray(pk.take_rows(packed, idx))
    assert got.dtype == np.float16
    np.testing.assert_array_equal(got, tab[np.asarray(idx)])
    win = np.asarray(pk.take_contiguous_rows(packed, jnp.asarray(4), 8))
    np.testing.assert_array_equal(win, tab[4:12])


@pytest.mark.parametrize("opt_name", ["sgdm", "adamw"])
def test_sparse_training_packed_fp16_equals_plain_fp16(opt_name):
    """A sparse row-optimizer trajectory on a PACKED fp16 table is
    bit-identical to the same trajectory on a plain fp16 table."""
    rng = np.random.default_rng(13)
    n, d = 24, 128
    tab32 = rng.normal(size=(n, d)).astype(np.float32)
    make_opt = {
        "sgdm": lambda: RowSGDM(learning_rate=0.05, momentum=0.9,
                                stochastic_rounding=False),
        "adamw": lambda: RowAdamW(learning_rate=0.05, weight_decay=0.01,
                                  stochastic_rounding=False),
    }[opt_name]

    def run(table):
        opt = make_opt()
        state = opt.init(table)
        for step in range(5):
            srng = np.random.default_rng(200 + step)
            idx = jnp.asarray(srng.integers(n, size=12).astype(np.int32))
            grads = jnp.asarray(srng.normal(size=(12, d)).astype(np.float32))
            table, state = opt.update_rows(table, state, idx, grads)
        if pk.is_packed(table):
            return np.asarray(
                pk.unpack_table(table, n).astype(jnp.float32))
        return np.asarray(table.astype(jnp.float32))

    plain = run(jnp.asarray(tab32, jnp.float16))
    packed = run(pk.pack_table(jnp.asarray(tab32, jnp.float16)))
    np.testing.assert_array_equal(packed, plain)
    full = run(jnp.asarray(tab32))
    np.testing.assert_allclose(packed, full, rtol=0.01, atol=0.01)


def test_sr_fp16_unbiased_and_finer_than_bf16():
    """fp16 SR is unbiased (mean of many rounds ≈ exact) and its rounding
    noise is ~8x smaller than bf16's (10- vs 7-bit mantissa)."""
    from besskge_tpu.optim import _sr_round_16

    rng = np.random.default_rng(14)
    rows = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32)) * 0.3
    idx = jnp.asarray([5, 9, 14, 21], jnp.int32)
    t16 = pk.pack_table(jnp.zeros((8, 128), jnp.float16))
    tb16 = pk.pack_table(jnp.zeros((8, 128), jnp.bfloat16))

    def mean_and_err(table):
        acc = np.zeros((4, 128), np.float64)
        reps = 400
        for c in range(reps):
            out = _sr_round_16(rows, idx, jnp.asarray(c, jnp.int32), table)
            acc += np.asarray(out, np.float64)
        mean = acc / reps
        return mean, np.abs(mean - np.asarray(rows, np.float64)).mean()

    _, err16 = mean_and_err(t16)
    _, errb16 = mean_and_err(tb16)
    # Unbiased up to sampling noise: fp16 mean error far below a bf16 ulp.
    assert err16 < 2e-4, err16
    # And the dtype's rounding noise ordering holds.
    assert err16 < errb16, (err16, errb16)


@pytest.mark.parametrize("three_d", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_merge_sorted_adjacency_equals_general(three_d, seed):
    """The sorted_idx adjacency merge (round 5) must be byte-identical to
    the general segmented-scan merge on sorted duplicate-identical input —
    randomized over sibling presence, duplicates, run lengths, boundaries."""
    rng = np.random.default_rng(seed)
    n, d = 64, 128
    tab = rng.normal(size=(n, d)).astype(np.float32)
    packed = pk.pack_table(jnp.asarray(tab))
    if three_d:
        packed = packed[None]
    # sorted logical ids incl. row 0 and n-1, duplicates, sibling pairs
    raw = np.unique(
        np.concatenate([
            rng.integers(0, n, size=40),
            [0, 1, n - 2, n - 1],
        ])
    ).astype(np.int32)
    reps = rng.integers(1, 4, size=raw.shape[0])
    idx = np.repeat(raw, reps).astype(np.int32)  # sorted with duplicates
    uniq_rows = rng.normal(size=(raw.shape[0], d)).astype(np.float32)
    rows = np.repeat(uniq_rows, reps, axis=0)  # duplicate-identical
    gi, gr = pk.merge_packed_row_writes(
        packed, jnp.asarray(idx), jnp.asarray(rows)
    )
    fi, fr = pk.merge_packed_row_writes(
        packed, jnp.asarray(idx), jnp.asarray(rows), sorted_idx=True
    )
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(fi))
    np.testing.assert_array_equal(np.asarray(gr), np.asarray(fr))
