"""run_device_eval must reproduce the per-step forward loop exactly.

The blocked driver (one compiled dispatch per block of steps, padded ragged
tail) is a pure performance transformation of the notebook-style host loop:
same sampler pass, same masks, same metric sums.
"""

import jax.numpy as jnp
import numpy as np

from besskge_tpu.batch_sampler import RigidShardedBatchSampler
from besskge_tpu.bess import ScoreMovingBessKGE, build_bess_forward
from besskge_tpu.dataset import KGDataset
from besskge_tpu.eval_loop import run_device_eval
from besskge_tpu.metric import Evaluation
from besskge_tpu.negative_sampler import TripleBasedShardedNegativeSampler
from besskge_tpu.parallel import make_shard_mesh
from besskge_tpu.scoring import TransE
from besskge_tpu.sharding import PartitionedTripleSet, Sharding

SEED = 77
N_ENTITY = 360
N_RELATION = 7
N_SHARD = 4
N_TRIPLE = 700
N_NEG = 40
D = 32

rng = np.random.default_rng(SEED)
sharding = Sharding.create(N_ENTITY, N_SHARD, seed=SEED)
triples = np.stack(
    [
        rng.integers(N_ENTITY, size=N_TRIPLE),
        rng.integers(N_RELATION, size=N_TRIPLE),
        rng.integers(N_ENTITY, size=N_TRIPLE),
    ],
    axis=1,
).astype(np.int32)
neg_h = rng.integers(N_ENTITY, size=(N_TRIPLE, N_NEG)).astype(np.int32)
neg_t = rng.integers(N_ENTITY, size=(N_TRIPLE, N_NEG)).astype(np.int32)


def _setup(duplicate_batch=True, bps=2, shard_bs=24):
    ds = KGDataset(
        n_entity=N_ENTITY,
        n_relation_type=N_RELATION,
        entity_dict=None,
        relation_dict=None,
        type_offsets=None,
        triples={"valid": triples},
        original_triple_ids={"valid": np.arange(N_TRIPLE, dtype=np.int64)},
        neg_heads={"valid": neg_h},
        neg_tails={"valid": neg_t},
    )
    pts = PartitionedTripleSet.create_from_dataset(ds, "valid", sharding)
    ns = TripleBasedShardedNegativeSampler(
        pts.neg_heads, pts.neg_tails, sharding,
        corruption_scheme="ht", seed=SEED,
    )
    bs = RigidShardedBatchSampler(
        pts, ns, shard_bs=shard_bs, batches_per_step=bps, seed=SEED,
        duplicate_batch=duplicate_batch,
    )
    score_fn = TransE(
        negative_sample_sharing=False, scoring_norm=1, sharding=sharding,
        n_relation_type=N_RELATION, embedding_size=D, seed=SEED,
    )
    ev = Evaluation(["mrr", "hits@1", "hits@3"], reduction="sum")
    bess = ScoreMovingBessKGE(
        negative_sampler=ns, score_fn=score_fn, evaluation=ev,
    )
    mesh = make_shard_mesh(N_SHARD)
    params = {k: jnp.asarray(v) for k, v in score_fn.initial_params().items()}
    return bess, bs, params, mesh, ev


def test_run_device_eval_matches_stepwise_loop():
    bess, bs, params, mesh, ev = _setup()

    # reference: notebook-style per-step loop
    fwd = build_bess_forward(bess, mesh)
    totals = np.zeros(len(ev.metrics), np.float64)
    n_q = 0
    n_steps = 0
    for batch in bs.get_dataloader(shuffle=False):
        out = fwd(params, {k: jnp.asarray(v) for k, v in batch.items()})
        totals += (
            np.asarray(out["metrics"], np.float64)
            .reshape(-1, len(ev.metrics))
            .sum(0)
        )
        n_q += int(batch["triple_mask"].sum())
        n_steps += 1
    # blocked driver, with a RAGGED final block (steps_per_block doesn't
    # divide the pass length)
    spb = 3 if n_steps % 3 else 4
    assert n_steps % spb, "want a ragged final block"
    metrics, n_q2 = run_device_eval(
        bess, params, bs, mesh=mesh, steps_per_block=spb
    )
    assert n_q2 == n_q
    for i, (name, val) in enumerate(metrics.items()):
        np.testing.assert_allclose(val, totals[i] / n_q, rtol=1e-5,
                                   err_msg=name)


def test_run_device_eval_requires_sum_reduction():
    import pytest

    bess, bs, params, mesh, ev = _setup()
    bess.evaluation = Evaluation(["mrr"], reduction="none")
    with pytest.raises(ValueError, match="sum"):
        run_device_eval(bess, params, bs, mesh=mesh)
