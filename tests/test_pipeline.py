"""AllScoresPipeline vs CPU full score matrix, with filters and candidates
(analog of reference ``/root/reference/tests/test_pipeline.py``)."""

import jax.numpy as jnp
import numpy as np

from besskge_tpu.batch_sampler import RigidShardedBatchSampler
from besskge_tpu.dataset import KGDataset
from besskge_tpu.metric import Evaluation
from besskge_tpu.negative_sampler import PlaceholderNegativeSampler
from besskge_tpu.parallel import make_shard_mesh
from besskge_tpu.pipeline import AllScoresPipeline
from besskge_tpu.scoring import DistMult
from besskge_tpu.sharding import PartitionedTripleSet, Sharding

SEED = 42
N_ENTITY = 210
N_RELATION = 4
N_SHARD = 4
N_TRIPLE = 400
EMB = 16

rng = np.random.default_rng(SEED)
sharding = Sharding.create(N_ENTITY, N_SHARD, seed=SEED)
entity_table = rng.normal(
    size=(N_SHARD, sharding.max_entity_per_shard, EMB)
).astype(np.float32)
relation_table = rng.normal(size=(N_RELATION, EMB)).astype(np.float32)
flat_table = entity_table[sharding.entity_to_shard, sharding.entity_to_idx]

h = rng.integers(N_ENTITY, size=N_TRIPLE)
r = rng.integers(N_RELATION, size=N_TRIPLE)
t = rng.integers(N_ENTITY, size=N_TRIPLE)
triples = np.stack([h, r, t], 1).astype(np.int32)

ds = KGDataset(
    n_entity=N_ENTITY,
    n_relation_type=N_RELATION,
    entity_dict=None,
    relation_dict=None,
    type_offsets=None,
    triples={"test": triples},
    original_triple_ids={"test": np.arange(N_TRIPLE)},
    neg_heads=None,
    neg_tails=None,
)


def _golden_matrix():
    score_fn = DistMult(
        negative_sample_sharing=True,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=EMB,
        entity_initializer=entity_table,
        relation_initializer=relation_table,
    )
    g_params = {"relation_embedding": jnp.asarray(relation_table)}
    return np.asarray(
        score_fn.score_tails(
            g_params,
            jnp.asarray(flat_table[h]),
            jnp.asarray(r.astype(np.int32)),
            jnp.asarray(flat_table)[None],
        )
    )


def test_all_scores_pipeline_with_filters():
    score_fn = DistMult(
        negative_sample_sharing=True,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=EMB,
        entity_initializer=entity_table,
        relation_initializer=relation_table,
    )
    pts = PartitionedTripleSet.create_from_dataset(
        ds, "test", sharding, partition_mode="h_shard"
    )
    ns = PlaceholderNegativeSampler(corruption_scheme="t", seed=SEED)
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=24, batches_per_step=2, seed=SEED,
        return_triple_idx=True,
    )
    filter_set = triples[: N_TRIPLE // 2]
    pipeline = AllScoresPipeline(
        bs,
        "t",
        score_fn,
        mesh=make_shard_mesh(N_SHARD),
        evaluation=Evaluation(["mrr", "hits@5"], reduction="none"),
        filter_triples=[filter_set],
        return_scores=True,
        return_topk=True,
        k=7,
        window_size=29,
    )
    params = score_fn.initial_params()
    out = pipeline.forward(params)

    golden = _golden_matrix()
    # Map pipeline row order back to the original triples.
    orig = pts.triple_sort_idx[out["triple_idx"]]
    scores = out["scores"]
    assert scores.shape == (N_TRIPLE, N_ENTITY)

    # Build golden filtered matrix.
    gf = golden[orig].astype(np.float32)
    for i, q in enumerate(orig):
        hq, rq, tq = triples[q]
        known = (filter_set[:, 0] == hq) & (filter_set[:, 1] == rq)
        gf[i, filter_set[known, 2]] = -np.inf
        gf[i, tq] = golden[q, tq]  # positive score restored
    np.testing.assert_allclose(scores, gf, rtol=1e-4, atol=1e-4)

    # Golden ranks/metrics (average tie mode): positives masked out.
    gmask = gf.copy()
    true_sc = gmask[np.arange(len(orig)), triples[orig, 2]]
    gmask[np.arange(len(orig)), triples[orig, 2]] = -np.inf
    n_better = 0.5 * (
        (gmask > true_sc[:, None]).sum(-1) + (gmask >= true_sc[:, None]).sum(-1)
    )
    golden_mrr = 1.0 / (1.0 + n_better)
    np.testing.assert_allclose(
        out["metrics"]["mrr"], golden_mrr, rtol=1e-5, atol=1e-6
    )
    assert 0 < out["metrics_avg"]["mrr"] <= 1
    # topk consistent with the filtered matrix.
    np.testing.assert_array_equal(
        out["topk_global_id"], np.argsort(-gf, axis=-1)[:, :7]
    )


def test_pipeline_candidate_restriction():
    score_fn = DistMult(
        negative_sample_sharing=True,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=EMB,
        entity_initializer=entity_table,
        relation_initializer=relation_table,
    )
    pts = PartitionedTripleSet.create_from_dataset(
        ds, "test", sharding, partition_mode="h_shard"
    )
    ns = PlaceholderNegativeSampler(corruption_scheme="t", seed=SEED)
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=24, batches_per_step=1, seed=SEED,
        return_triple_idx=True,
    )
    cands = np.unique(rng.integers(N_ENTITY, size=64)).astype(np.int32)
    pipeline = AllScoresPipeline(
        bs,
        "t",
        score_fn,
        mesh=make_shard_mesh(N_SHARD),
        candidate_ents=cands,
        return_scores=True,
        window_size=50,
    )
    out = pipeline.forward(score_fn.initial_params())
    scores = out["scores"]
    non_cand = np.setdiff1d(np.arange(N_ENTITY), cands)
    # Non-candidate columns are -inf except restored positive scores.
    orig = pts.triple_sort_idx[out["triple_idx"]]
    pos_col = triples[orig, 2]
    masked = scores[:, non_cand]
    rows_pos = np.isin(non_cand[None, :], pos_col[:, None]) & (
        non_cand[None, :] == pos_col[:, None]
    )
    assert np.isneginf(masked[~rows_pos]).all()


def test_pipeline_packed_table_matches_plain_bf16():
    """AllScoresPipeline over a packed bf16 entity table returns the same
    score matrix as over the plain bf16 table (packed contiguous windows,
    clamped final window deduped by the stitch). ``Sharding.create`` keeps
    per-shard rows even, so the packed table never exposes its pad row
    here; the stitch handles it defensively for externally built
    shardings."""
    import besskge_tpu.packed as pk

    def run(packed_storage):
        score_fn = DistMult(
            negative_sample_sharing=True,
            sharding=sharding,
            n_relation_type=N_RELATION,
            embedding_size=128,
            entity_initializer=np.repeat(entity_table, 8, axis=-1),
            relation_initializer=np.repeat(relation_table, 8, axis=-1),
        )
        score_fn.dtype = jnp.bfloat16
        score_fn.packed_entity_storage = packed_storage
        pts = PartitionedTripleSet.create_from_dataset(
            ds, "test", sharding, partition_mode="h_shard"
        )
        ns = PlaceholderNegativeSampler(corruption_scheme="t", seed=SEED)
        bs = RigidShardedBatchSampler(
            pts, ns, shard_bs=24, batches_per_step=2, seed=SEED,
            return_triple_idx=True,
        )
        pipeline = AllScoresPipeline(
            bs, "t", score_fn,
            mesh=make_shard_mesh(N_SHARD),
            evaluation=Evaluation(["mrr"], reduction="none"),
            return_scores=True,
            window_size=16,
        )
        params = score_fn.initial_params()
        if packed_storage:
            assert pk.is_packed(params["entity_embedding"])
        out = pipeline.forward(params)
        orig = pts.triple_sort_idx[out["triple_idx"]]
        back = np.empty_like(out["scores"])
        back[orig] = out["scores"]
        return back

    plain = run(False)
    packed = run(True)
    np.testing.assert_array_equal(plain, packed)
