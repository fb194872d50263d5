"""End-to-end BESS-KGE walkthrough (parity with the reference notebooks
1-3: training, candidate-set validation, top-k prediction, filtered
all-scores evaluation, checkpoint + re-shard).

Runs anywhere: a TPU mesh if available, else a virtual CPU mesh:

    env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python examples/train_and_evaluate.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from besskge_tpu.batch_sampler import (
    RandomShardedBatchSampler,
    RigidShardedBatchSampler,
)
from besskge_tpu.bess import (
    EmbeddingMovingBessKGE,
    ScoreMovingBessKGE,
    TopKQueryBessKGE,
    build_bess_forward,
    build_topk_forward,
)
from besskge_tpu.checkpoint import load_checkpoint, save_checkpoint
from besskge_tpu.dataset import KGDataset
from besskge_tpu.loss import LogSigmoidLoss
from besskge_tpu.metric import Evaluation
from besskge_tpu.negative_sampler import (
    PlaceholderNegativeSampler,
    RandomShardedNegativeSampler,
    TripleBasedShardedNegativeSampler,
)
from besskge_tpu.optim import RowAdamW
from besskge_tpu.parallel import make_shard_mesh
from besskge_tpu.pipeline import AllScoresPipeline
from besskge_tpu.scoring import RotatE
from besskge_tpu.sharding import PartitionedTripleSet, Sharding
from besskge_tpu.trainer import Trainer

N_ENTITY, N_RELATION = 500, 8
N_SHARD = min(4, len(jax.devices()))

# ----------------------------------------------------------------- dataset
rng = np.random.default_rng(0)
h = rng.integers(N_ENTITY, size=20_000)
r = rng.integers(N_RELATION, size=20_000)
t = (h * 7 + r * 13 + 1) % N_ENTITY  # structured, learnable
ds = KGDataset.from_triples(
    np.stack([h, r, t], 1).astype(np.int32), split=(0.85, 0.1, 0.05)
)
sharding = Sharding.create(ds.n_entity, N_SHARD, seed=0)
train_pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)

# ------------------------------------------------------------------- model
score_fn = RotatE(
    negative_sample_sharing=True,
    scoring_norm=2,
    sharding=sharding,
    n_relation_type=ds.n_relation_type,
    embedding_size=64,  # entity row = 128 -> in-place update kernel eligible
    seed=0,
)

# ---------------------------------------------------------------- training
train_ns = RandomShardedNegativeSampler(
    8, sharding, 0, "ht", local_sampling=False, flat_negative_format=True
)
train_bs = RandomShardedBatchSampler(
    train_pts, train_ns, shard_bs=64, batches_per_step=4, seed=0
)
bess = EmbeddingMovingBessKGE(
    negative_sampler=train_ns,
    score_fn=score_fn,
    loss_fn=LogSigmoidLoss(margin=6.0, negative_adversarial_sampling=True),
    evaluation=Evaluation(["mrr"], reduction="sum"),
)
mesh = make_shard_mesh(N_SHARD)
trainer = Trainer(
    bess, train_bs, optax.adam(3e-3), mesh=mesh,
    entity_optimizer=RowAdamW(learning_rate=3e-3), seed=0,
)
stats = trainer.fit(n_epochs=60)
print(f"train: {stats['steps']} steps, {stats['triples_per_s']:.0f} triples/s,"
      f" final loss {stats['final_loss']:.1f}")
params = trainer.params

# ------------------------------------- validation vs random candidate sets
valid = ds.triples["valid"]
cand = rng.integers(N_ENTITY, size=(valid.shape[0], 64)).astype(np.int32)
ds.neg_heads = {"valid": cand}
ds.neg_tails = {"valid": cand}
valid_pts = PartitionedTripleSet.create_from_dataset(ds, "valid", sharding)
valid_ns = TripleBasedShardedNegativeSampler(
    valid_pts.neg_heads, valid_pts.neg_tails, sharding,
    corruption_scheme="ht", seed=0,
)
valid_bs = RigidShardedBatchSampler(
    valid_pts, valid_ns, shard_bs=64, batches_per_step=1, seed=0,
    duplicate_batch=True,
)
# Per-triple candidate sets need a non-sharing scorer; it reads the SAME
# trained params (the flag only changes the negative-scoring layout).
val_score_fn = RotatE(
    negative_sample_sharing=False,
    scoring_norm=2,
    sharding=sharding,
    n_relation_type=ds.n_relation_type,
    embedding_size=64,
)
val_bess = ScoreMovingBessKGE(
    negative_sampler=valid_ns,
    score_fn=val_score_fn,
    evaluation=Evaluation(["mrr", "hits@10"], reduction="sum"),
)
val_fwd = build_bess_forward(val_bess, mesh)
total, count = np.zeros(2), 0
for block in valid_bs.epoch_index_blocks(shuffle=False):
    batch = valid_bs.sample_batch(block)
    out = val_fwd(params, {k: jnp.asarray(v) for k, v in batch.items()})
    total += np.asarray(out["metrics"]).reshape(-1)
    count += int(batch["triple_mask"].sum())
print(f"valid vs 64 candidates: metrics/triple = {total / count}")

# --------------------------------------------- top-k (h, r, ?) prediction
test = ds.triples["test"]
test_pts = PartitionedTripleSet.create_from_queries(
    ds, sharding, test[:, :2], "hr", ground_truth=test[:, 2]
)
topk_ns = PlaceholderNegativeSampler(corruption_scheme="t")
topk_bs = RigidShardedBatchSampler(
    test_pts, topk_ns, shard_bs=32, batches_per_step=1, seed=0
)
topk = TopKQueryBessKGE(
    k=10, candidate_sampler=topk_ns, score_fn=score_fn,
    evaluation=Evaluation(["mrr", "hits@10"], worst_rank_infty=True,
                          reduction="sum"),
    window_size=100,
)
topk_fwd = build_topk_forward(topk, mesh)
total, count = np.zeros(2), 0
for block in topk_bs.epoch_index_blocks(shuffle=False):
    batch = topk_bs.sample_batch(block)
    out = topk_fwd(params, {k: jnp.asarray(v) for k, v in batch.items()})
    total += np.asarray(out["metrics"]).reshape(-1)
    count += int(batch["triple_mask"].sum())
print(f"test top-10 vs ALL entities: metrics/triple = {total / count}")

# ------------------------------- filtered all-scores evaluation (pipeline)
pipe_bs = RigidShardedBatchSampler(
    test_pts, topk_ns, shard_bs=32, batches_per_step=1, seed=0,
    return_triple_idx=True,
)
pipeline = AllScoresPipeline(
    pipe_bs, "t", score_fn, mesh=mesh,
    evaluation=Evaluation(["mrr", "hits@10"], reduction="none"),
    filter_triples=[ds.triples["train"]],
    window_size=128,
)
out = pipeline.forward(params)
print(f"test filtered (train triples masked): {out['metrics_avg']}")

# --------------------------------------------- checkpoint + reshard to 1
save_checkpoint("/tmp/bess_example.npz", jax.tree.map(np.asarray, params),
                sharding=sharding, step=stats["steps"])
one = Sharding.create(ds.n_entity, 1, seed=1)
p1, _, _, meta = load_checkpoint("/tmp/bess_example.npz", new_sharding=one)
print(f"resharded checkpoint to 1 device: table {p1['entity_embedding'].shape},"
      f" step {meta['step']}")
