"""Golden tests for the windowed top-k and all-scores inference paths.

Distributed top-k on the 4-device CPU mesh vs the exact top-k from the full
unsharded score matrix (analog of reference
``/root/reference/tests/test_bess.py:285-423``, which requires IPU hardware —
here the loop compiles fine on the emulated mesh).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from besskge_tpu.batch_sampler import RigidShardedBatchSampler
from besskge_tpu.bess import (
    AllScoresBESS,
    TopKQueryBessKGE,
    build_allscores_forward,
    build_topk_forward,
)
from besskge_tpu.dataset import KGDataset
from besskge_tpu.metric import Evaluation
from besskge_tpu.negative_sampler import (
    PlaceholderNegativeSampler,
    TripleBasedShardedNegativeSampler,
)
from besskge_tpu.parallel import make_shard_mesh
from besskge_tpu.scoring import ComplEx
from besskge_tpu.sharding import PartitionedTripleSet, Sharding

SEED = 99
N_ENTITY = 320
N_RELATION = 6
N_SHARD = 4
N_QUERY = 256
EMB = 16
K = 10

rng = np.random.default_rng(SEED)
sharding = Sharding.create(N_ENTITY, N_SHARD, seed=SEED)
entity_table = rng.normal(
    size=(N_SHARD, sharding.max_entity_per_shard, 2 * EMB)
).astype(np.float32)
relation_table = rng.normal(size=(N_RELATION, 2 * EMB)).astype(np.float32)
flat_table = entity_table[sharding.entity_to_shard, sharding.entity_to_idx]

query_h = rng.integers(N_ENTITY, size=N_QUERY)
query_r = rng.integers(N_RELATION, size=N_QUERY)
ground_truth = rng.integers(N_ENTITY, size=N_QUERY)

ds = KGDataset(
    n_entity=N_ENTITY,
    n_relation_type=N_RELATION,
    entity_dict=None,
    relation_dict=None,
    type_offsets=None,
    triples={"test": np.zeros((1, 3), np.int32)},
    original_triple_ids={"test": np.arange(1)},
    neg_heads=None,
    neg_tails=None,
)


def _score_fn(sharing=True):
    return ComplEx(
        negative_sample_sharing=sharing,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=EMB,
        entity_initializer=entity_table,
        relation_initializer=relation_table,
    )


def _golden_scores():
    score_fn = _score_fn()
    g_params = {"relation_embedding": jnp.asarray(relation_table)}
    return np.asarray(
        score_fn.score_tails(
            g_params,
            jnp.asarray(flat_table[query_h]),
            jnp.asarray(query_r.astype(np.int32)),
            jnp.asarray(flat_table)[None],
        )
    )  # (N_QUERY, N_ENTITY)


def _run_batches(bs, fwd, params, collect):
    """Iterate one epoch, collecting per-triple outputs with masking."""
    for block in bs.epoch_index_blocks(shuffle=False):
        batch = bs.sample_batch(block)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        out = fwd(params, jbatch)
        collect(batch, {k: np.asarray(v) for k, v in out.items()})


@pytest.mark.parametrize("window", [50, 1600])
def test_topk_vs_all_entities(window):
    # window 50: many windows, clamped final window.
    # window 1600 (> n_entity/shard): one mostly-invalid window through the
    # gather fallback (the contiguous load requires window <= table rows).
    score_fn = _score_fn()
    queries = np.stack([query_h, query_r], 1).astype(np.int32)
    pts = PartitionedTripleSet.create_from_queries(
        ds, sharding, queries, "hr", ground_truth=ground_truth.astype(np.int32)
    )
    ns = PlaceholderNegativeSampler(corruption_scheme="t", seed=SEED)
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=32, batches_per_step=2, seed=SEED,
        return_triple_idx=True,
    )
    topk = TopKQueryBessKGE(
        k=K,
        candidate_sampler=ns,
        score_fn=score_fn,
        evaluation=Evaluation(["mrr"], worst_rank_infty=True, reduction="none"),
        return_scores=True,
        window_size=window,
    )
    fwd = build_topk_forward(topk, make_shard_mesh(N_SHARD))
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}

    golden = _golden_scores()
    golden_topk = np.argsort(-golden, axis=1)[:, :K]

    seen = np.zeros(N_QUERY, bool)

    def collect(batch, out):
        ids = out["topk_global_id"].reshape(-1, K)
        scores = out["topk_scores"].reshape(-1, K)
        mask = batch["triple_mask"].reshape(-1)
        tidx = batch["triple_idx"].reshape(-1)
        orig = pts.triple_sort_idx[tidx[mask]]
        np.testing.assert_array_equal(ids[mask], golden_topk[orig])
        np.testing.assert_allclose(
            scores[mask],
            np.take_along_axis(golden[orig], golden_topk[orig], axis=1),
            rtol=1e-4,
            atol=1e-4,
        )
        seen[orig] = True

    _run_batches(bs, fwd, params, collect)
    assert seen.all()


def test_topk_candidate_sets():
    score_fn = _score_fn(sharing=False)
    n_cand = 40
    local_rng = np.random.default_rng(SEED + 5)
    # Duplicate-free candidate rows (ranks_from_indices assumes distinct).
    candidates = np.argsort(
        local_rng.random((N_QUERY, N_ENTITY)), axis=1
    )[:, :n_cand].astype(np.int32)
    queries = np.stack([query_h, query_r], 1).astype(np.int32)
    pts = PartitionedTripleSet.create_from_queries(
        ds,
        sharding,
        queries,
        "hr",
        ground_truth=ground_truth.astype(np.int32),
        negative=candidates,
    )
    ns = TripleBasedShardedNegativeSampler(
        None,
        pts.neg_tails,
        sharding,
        corruption_scheme="t",
        seed=SEED,
        mask_on_gather=True,
    )
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=32, batches_per_step=1, seed=SEED,
        return_triple_idx=True,
    )
    topk = TopKQueryBessKGE(
        k=K,
        candidate_sampler=ns,
        score_fn=score_fn,
        return_scores=True,
        window_size=16,
    )
    fwd = build_topk_forward(topk, make_shard_mesh(N_SHARD))
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}

    golden = _golden_scores()

    def collect(batch, out):
        ids = out["topk_global_id"].reshape(-1, K)
        mask = batch["triple_mask"].reshape(-1)
        tidx = batch["triple_idx"].reshape(-1)
        orig = pts.triple_sort_idx[tidx[mask]]
        # Golden: top-k restricted to each query's candidate set.
        for row_ids, q in zip(ids[mask], orig):
            cand = candidates[q]
            cand_scores = golden[q, cand]
            order = np.argsort(-cand_scores)[:K]
            expected = cand[order]
            np.testing.assert_array_equal(row_ids[: len(expected)], expected)

    _run_batches(bs, fwd, params, collect)


def test_allscores_full_matrix():
    score_fn = _score_fn()
    queries = np.stack([query_h, query_r], 1).astype(np.int32)
    pts = PartitionedTripleSet.create_from_queries(
        ds, sharding, queries, "hr", ground_truth=ground_truth.astype(np.int32)
    )
    ns = PlaceholderNegativeSampler(corruption_scheme="t", seed=SEED)
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=32, batches_per_step=1, seed=SEED,
        return_triple_idx=True,
    )
    allsc = AllScoresBESS(ns, score_fn, window_size=37)
    fwd = build_allscores_forward(allsc, make_shard_mesh(N_SHARD))
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}
    golden = _golden_scores()

    # Column map: stitched columns enumerate (window, shard, pos-in-window).
    n_step = allsc.n_step
    ws = allsc.window_size
    max_e = sharding.max_entity_per_shard

    for block in bs.epoch_index_blocks(shuffle=False):
        batch = bs.sample_batch(block)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        chunks = [
            np.asarray(fwd(params, jbatch, jnp.asarray(i)))
            for i in range(n_step)
        ]
        # (bps, S, shard_bs, S*ws) per step -> (bs_total, n_step, S, ws)
        stitched = np.stack(chunks, axis=3).reshape(
            -1, n_step, N_SHARD, ws
        )
        mask = batch["triple_mask"].reshape(-1)
        tidx = batch["triple_idx"].reshape(-1)
        orig = pts.triple_sort_idx[tidx]
        full = np.full((stitched.shape[0], N_ENTITY), np.nan, np.float32)
        for s in range(N_SHARD):
            for w in range(n_step):
                # Mirror AllScoresBESS's contiguous-window math: the final
                # window clamps its start; re-read columns carry identical
                # scores, so overwriting on duplicates is harmless.
                idx = min(w * ws, max_e - ws) + np.arange(ws)
                use = idx < sharding.shard_counts[s]
                cols = sharding.shard_and_idx_to_entity[s, idx[use]]
                full[:, cols] = stitched[:, w, s, use]
        assert not np.isnan(full[mask]).any()
        np.testing.assert_allclose(
            full[mask], golden[orig[mask]], rtol=1e-4, atol=1e-4
        )
        break


def test_topk_head_queries():
    """(?, r, t) completion: 'rt' query set + 'h' corruption scheme."""
    score_fn = _score_fn()
    queries = np.stack([query_r, query_h], 1).astype(np.int32)  # (r, t)
    pts = PartitionedTripleSet.create_from_queries(
        ds, sharding, queries, "rt", ground_truth=ground_truth.astype(np.int32)
    )
    ns = PlaceholderNegativeSampler(corruption_scheme="h", seed=SEED)
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=32, batches_per_step=1, seed=SEED,
        return_triple_idx=True,
    )
    topk = TopKQueryBessKGE(
        k=K, candidate_sampler=ns, score_fn=score_fn, return_scores=True,
        window_size=64,
    )
    fwd = build_topk_forward(topk, make_shard_mesh(N_SHARD))
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}

    # Golden: score_heads over all entities, queries are (r, tail=query_h).
    g_params = {"relation_embedding": jnp.asarray(relation_table)}
    golden = np.asarray(
        score_fn.score_heads(
            g_params,
            jnp.asarray(flat_table)[None],
            jnp.asarray(query_r.astype(np.int32)),
            jnp.asarray(flat_table[query_h]),
        )
    )
    golden_topk = np.argsort(-golden, axis=1)[:, :K]

    for block in bs.epoch_index_blocks(shuffle=False):
        batch = bs.sample_batch(block)
        out = fwd(params, {k: jnp.asarray(v) for k, v in batch.items()})
        ids = np.asarray(out["topk_global_id"]).reshape(-1, K)
        mask = batch["triple_mask"].reshape(-1)
        tidx = batch["triple_idx"].reshape(-1)
        orig = pts.triple_sort_idx[tidx[mask]]
        np.testing.assert_array_equal(ids[mask], golden_topk[orig])
        break


def test_topk_non_divisible_entities_padding_killed():
    """n_entity not divisible by n_shard: padding rows exist in every shard
    and must never appear among top-k ids (killed via shard_counts)."""
    n_ent = 317  # 317 = 4*80 - 3 -> shards carry padding rows
    pad_sharding = Sharding.create(n_ent, N_SHARD, seed=3)
    assert (pad_sharding.shard_counts < pad_sharding.max_entity_per_shard).any()
    local_rng = np.random.default_rng(3)
    table = local_rng.normal(
        size=(N_SHARD, pad_sharding.max_entity_per_shard, 2 * EMB)
    ).astype(np.float32)
    # Make padding rows maximally attractive: huge values. If the padding
    # kill is broken, they WILL rank top.
    pad_rows = pad_sharding.shard_and_idx_to_entity >= n_ent
    table[pad_rows] = 10.0
    rel = local_rng.normal(size=(N_RELATION, 2 * EMB)).astype(np.float32)
    flat = table[pad_sharding.entity_to_shard, pad_sharding.entity_to_idx]

    score_fn = ComplEx(
        negative_sample_sharing=True,
        sharding=pad_sharding,
        n_relation_type=N_RELATION,
        embedding_size=EMB,
        entity_initializer=table,
        relation_initializer=rel,
    )
    n_q = 64
    qh = local_rng.integers(n_ent, size=n_q)
    qr = local_rng.integers(N_RELATION, size=n_q)
    gt = local_rng.integers(n_ent, size=n_q)
    ds_pad = KGDataset(
        n_entity=n_ent,
        n_relation_type=N_RELATION,
        entity_dict=None,
        relation_dict=None,
        type_offsets=None,
        triples={"test": np.zeros((1, 3), np.int32)},
        original_triple_ids={"test": np.arange(1)},
        neg_heads=None,
        neg_tails=None,
    )
    pts = PartitionedTripleSet.create_from_queries(
        ds_pad, pad_sharding, np.stack([qh, qr], 1).astype(np.int32), "hr",
        ground_truth=gt.astype(np.int32),
    )
    ns = PlaceholderNegativeSampler(corruption_scheme="t", seed=3)
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=16, batches_per_step=1, seed=3,
        return_triple_idx=True,
    )
    topk = TopKQueryBessKGE(
        k=K, candidate_sampler=ns, score_fn=score_fn, return_scores=True,
        window_size=30,
    )
    fwd = build_topk_forward(topk, make_shard_mesh(N_SHARD))
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}

    g_params = {"relation_embedding": jnp.asarray(rel)}
    golden = np.asarray(
        score_fn.score_tails(
            g_params,
            jnp.asarray(flat[qh]),
            jnp.asarray(qr.astype(np.int32)),
            jnp.asarray(flat[:n_ent])[None],
        )
    )
    golden_topk = np.argsort(-golden[:, :n_ent], axis=1)[:, :K]

    for block in bs.epoch_index_blocks(shuffle=False):
        batch = bs.sample_batch(block)
        out = fwd(params, {k: jnp.asarray(v) for k, v in batch.items()})
        ids = np.asarray(out["topk_global_id"]).reshape(-1, K)
        mask = batch["triple_mask"].reshape(-1)
        # No padding (>= n_ent) ids ever.
        assert ids[mask].max() < n_ent
        orig = pts.triple_sort_idx[batch["triple_idx"].reshape(-1)[mask]]
        np.testing.assert_array_equal(ids[mask], golden_topk[orig])
        break


def test_topk_bf16_compute_matches_fp32_completions():
    """compute_dtype=bf16 must be honored by the TopK window loop (gathered
    window + query embeddings cast before scoring; fp32 merge) and return
    essentially the same completions on a well-separated toy table."""
    import jax
    from jax.sharding import PartitionSpec as P

    from besskge_tpu.parallel.mesh import param_partition_specs, shard_params

    score_fn = ComplEx(
        negative_sample_sharing=True,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=EMB,
        entity_initializer=entity_table,
        relation_initializer=relation_table,
    )
    ns = PlaceholderNegativeSampler(corruption_scheme="t", seed=SEED)

    def run(cd):
        score_fn.compute_dtype = cd
        topk = TopKQueryBessKGE(
            k=10, candidate_sampler=ns, score_fn=score_fn, window_size=32
        )
        mesh = make_shard_mesh(N_SHARD)
        params = shard_params(
            {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()},
            mesh,
        )
        fwd = jax.jit(
            jax.shard_map(
                lambda p, r, h: topk.forward(p, r, head=h),
                mesh=mesh,
                in_specs=(
                    param_partition_specs(params),
                    P("shard"),
                    P("shard"),
                ),
                out_specs=P("shard"),
                check_vma=False,
            )
        )
        rel = jnp.asarray(np.tile(query_r, N_SHARD), jnp.int32)
        head = jnp.asarray(np.tile(h_loc, N_SHARD), jnp.int32)
        out = fwd(params, rel, head)
        score_fn.compute_dtype = None
        return np.asarray(out["topk_global_id"])

    # shard-correct queries: shard s's local head id h_loc[q] refers to the
    # global entity shard_and_idx_to_entity[s, h_loc[q]]
    local_rng = np.random.default_rng(SEED + 9)
    h_loc = local_rng.integers(
        0, sharding.shard_counts.min(), N_QUERY
    ).astype(np.int32)
    h_glob = np.concatenate(
        [sharding.shard_and_idx_to_entity[s, h_loc] for s in range(N_SHARD)]
    )
    r_glob = np.tile(query_r, N_SHARD).astype(np.int32)

    fp32 = run(None)
    bf16 = run(jnp.bfloat16)

    g_params = {"relation_embedding": jnp.asarray(relation_table)}
    golden = np.asarray(
        _score_fn().score_tails(
            g_params,
            jnp.asarray(flat_table[h_glob]),
            jnp.asarray(r_glob),
            jnp.asarray(flat_table)[None],
        )
    )
    # bf16 ranking may swap near-ties; assert eps-optimality instead: the
    # fp32 score of bf16's top-1 must be within bf16 rounding of the true
    # optimum, and the top-k sets must mostly agree.
    top1_true = golden.max(axis=1)
    for got in (fp32, bf16):
        top1 = np.take_along_axis(golden, got[:, :1], axis=1)[:, 0]
        np.testing.assert_array_less(
            top1_true - top1, 0.02 * np.abs(golden).max()
        )
    overlap = np.mean(
        [len(np.intersect1d(a, b)) / a.size for a, b in zip(fp32, bf16)]
    )
    assert overlap > 0.8, overlap


@pytest.mark.parametrize("k", [2, 10])
def test_topk_chunk_merge_matches_sort(k):
    """The hierarchical chunk merge is exact: identical top-k IDs and scores
    to the full-window sort (random normal scores — no ties)."""
    score_fn = _score_fn()
    queries = np.stack([query_h, query_r], 1).astype(np.int32)
    pts = PartitionedTripleSet.create_from_queries(
        ds, sharding, queries, "hr", ground_truth=ground_truth.astype(np.int32)
    )
    ns = PlaceholderNegativeSampler(corruption_scheme="t", seed=SEED)
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=32, batches_per_step=1, seed=SEED,
        return_triple_idx=True,
    )
    params = {kk: jnp.asarray(v) for kk, v in _score_fn().initial_params().items()}
    # window 512 = 4 chunks of 128 (> n_best for k=2, degenerate for k=10 —
    # the degenerate case must silently fall back to the sort merge); wider
    # than the 80 local rows, so this runs the gather path with the
    # valid-mask clamp.
    outs = {}
    for mode in ("sort", "chunk"):
        topk = TopKQueryBessKGE(
            k=k, candidate_sampler=ns, score_fn=score_fn,
            return_scores=True, window_size=512, merge_mode=mode,
        )
        fwd = build_topk_forward(topk, make_shard_mesh(N_SHARD))
        ids, scores = [], []

        def collect(batch, out, ids=ids, scores=scores):
            mask = batch["triple_mask"].reshape(-1)
            ids.append(out["topk_global_id"].reshape(-1, k)[mask])
            scores.append(out["topk_scores"].reshape(-1, k)[mask])

        _run_batches(bs, fwd, params, collect)
        outs[mode] = (np.concatenate(ids), np.concatenate(scores))
    np.testing.assert_array_equal(outs["sort"][0], outs["chunk"][0])
    np.testing.assert_array_equal(outs["sort"][1], outs["chunk"][1])
    # And vs the exact golden top-k.
    golden = _golden_scores()
    golden_topk = np.argsort(-golden, axis=1)[:, :k]
    # collect order above follows the rigid epoch; rebuild the map once more
    topk = TopKQueryBessKGE(
        k=k, candidate_sampler=ns, score_fn=score_fn,
        return_scores=True, window_size=512, merge_mode="chunk",
    )
    fwd = build_topk_forward(topk, make_shard_mesh(N_SHARD))
    seen = np.zeros(N_QUERY, bool)

    def collect_g(batch, out):
        ids = out["topk_global_id"].reshape(-1, k)
        mask = batch["triple_mask"].reshape(-1)
        tidx = batch["triple_idx"].reshape(-1)
        orig = pts.triple_sort_idx[tidx[mask]]
        np.testing.assert_array_equal(ids[mask], golden_topk[orig])
        seen[orig] = True

    _run_batches(bs, fwd, params, collect_g)
    assert seen.all()


@pytest.mark.parametrize("mode", ["xla", "pallas_interpret"])
@pytest.mark.parametrize("model", ["transe", "rotate"])
def test_topk_vs_all_fused_l1(mode, model, monkeypatch):
    """The fused L1 window path (scores + mask + chunk-max in one op,
    ops.distance.l1_scores_chunkmax) returns exactly the same top-k as the
    unsharded golden matrix, for both the XLA fallback and the Mosaic
    kernel (interpreted on CPU). A call counter proves the fused branch
    actually ran."""
    from besskge_tpu import bess as bess_mod
    from besskge_tpu.ops import distance as dist_mod
    from besskge_tpu.scoring import RotatE, TransE

    monkeypatch.setattr(dist_mod, "_FUSED_L1_MODE", mode)
    calls = []
    real = bess_mod.ops_l1_scores_chunkmax

    def counted(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(bess_mod, "ops_l1_scores_chunkmax", counted)

    # Bigger KG than the module fixture: the contiguous window path needs
    # window <= rows/shard, and the chunk merge needs window >= 128*(k+2).
    n_entity, n_query, emb = 6400, 128, 8
    lrng = np.random.default_rng(SEED + 9)
    shard_l = Sharding.create(n_entity, N_SHARD, seed=SEED)
    ent_l = lrng.normal(
        size=(N_SHARD, shard_l.max_entity_per_shard, 2 * emb)
    ).astype(np.float32)
    rel_l = lrng.normal(size=(N_RELATION, 2 * emb)).astype(np.float32)
    flat_l = ent_l[shard_l.entity_to_shard, shard_l.entity_to_idx]
    qh = lrng.integers(n_entity, size=n_query)
    qr = lrng.integers(N_RELATION, size=n_query)
    truth = lrng.integers(n_entity, size=n_query)
    ds_l = KGDataset(
        n_entity=n_entity,
        n_relation_type=N_RELATION,
        triples={"test": np.zeros((1, 3), np.int32)},
        original_triple_ids={"test": np.arange(1)},
    )

    cls = {"transe": TransE, "rotate": RotatE}[model]
    score_fn = cls(
        negative_sample_sharing=True,
        scoring_norm=1,
        sharding=shard_l,
        n_relation_type=N_RELATION,
        embedding_size=2 * emb if model == "transe" else emb,
        entity_initializer=ent_l,
        relation_initializer=(
            rel_l if model == "transe" else rel_l[:, :emb]
        ),
    )
    queries = np.stack([qh, qr], 1).astype(np.int32)
    pts = PartitionedTripleSet.create_from_queries(
        ds_l, shard_l, queries, "hr", ground_truth=truth.astype(np.int32)
    )
    ns = PlaceholderNegativeSampler(corruption_scheme="t", seed=SEED)
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=32, batches_per_step=1, seed=SEED,
        return_triple_idx=True,
    )
    # window 128*12 with k=10 -> n_chunk=12 > n_best=11: chunk merge active;
    # 1536 <= 1600 rows/shard: contiguous active.
    topk = TopKQueryBessKGE(
        k=K, candidate_sampler=ns, score_fn=score_fn, return_scores=True,
        window_size=128 * 12, merge_mode="chunk",
    )
    fwd = build_topk_forward(topk, make_shard_mesh(N_SHARD))
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}

    g_params = {"relation_embedding": jnp.asarray(params["relation_embedding"])}
    golden = np.asarray(
        score_fn.score_tails(
            g_params,
            jnp.asarray(flat_l[qh]),
            jnp.asarray(qr.astype(np.int32)),
            jnp.asarray(flat_l)[None],
        )
    )
    golden_topk = np.argsort(-golden, axis=1)[:, :K]

    seen = np.zeros(n_query, bool)

    def collect(batch, out):
        ids = out["topk_global_id"].reshape(-1, K)
        scores = out["topk_scores"].reshape(-1, K)
        mask = batch["triple_mask"].reshape(-1)
        tidx = batch["triple_idx"].reshape(-1)
        orig = pts.triple_sort_idx[tidx[mask]]
        np.testing.assert_array_equal(ids[mask], golden_topk[orig])
        np.testing.assert_allclose(
            scores[mask],
            np.take_along_axis(golden[orig], golden_topk[orig], axis=1),
            rtol=1e-4,
            atol=1e-4,
        )
        seen[orig] = True

    _run_batches(bs, fwd, params, collect)
    assert seen.all()
    assert calls, "fused L1 window path was never taken"
