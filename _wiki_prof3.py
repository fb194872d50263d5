import numpy as np, jax, jax.numpy as jnp, optax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys; sys.path.insert(0, "/root/repo")
exec(open("/root/repo/benchmarks/bench_wikikg2.py").read().split('def main')[0])
import jax.numpy as jnp, optax
from besskge_tpu.batch_sampler import RandomShardedBatchSampler
from besskge_tpu.bess import EmbeddingMovingBessKGE
from besskge_tpu.dataset import KGDataset
from besskge_tpu.loss import SampledSoftmaxCrossEntropyLoss
from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
from besskge_tpu.optim import RowSGDM
from besskge_tpu.scoring import TransE
from besskge_tpu.sharding import PartitionedTripleSet, Sharding
from besskge_tpu.trainer import build_train_step, init_optimizer_state
rng = np.random.default_rng(0)
triples = np.stack([rng.integers(N_ENTITY, size=N_TRAIN), rng.integers(N_RELATION, size=N_TRAIN), rng.integers(N_ENTITY, size=N_TRAIN)], axis=1).astype(np.int32)
ds = KGDataset(n_entity=N_ENTITY, n_relation_type=N_RELATION, entity_dict=None, relation_dict=None, type_offsets=None, triples={"train": triples}, original_triple_ids={"train": np.arange(N_TRAIN)}, neg_heads=None, neg_tails=None)
sharding = Sharding.create(N_ENTITY, 1, seed=0)
pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
score_fn = TransE(negative_sample_sharing=True, scoring_norm=1, sharding=sharding, n_relation_type=N_RELATION, embedding_size=D, seed=0)
params = score_fn.initial_params_device()
ns = RandomShardedNegativeSampler(N_NEGATIVE, sharding, 0, "ht", local_sampling=False, flat_negative_format=True)
bs = RandomShardedBatchSampler(pts, ns, shard_bs=SHARD_BS, batches_per_step=BPS, seed=0)
bess = EmbeddingMovingBessKGE(negative_sampler=ns, score_fn=score_fn, loss_fn=SampledSoftmaxCrossEntropyLoss(n_entity=N_ENTITY), augment_negative=True, axis_name=None)
opt = optax.sgd(1e-3, momentum=0.9)
row = RowSGDM(learning_rate=1e-3, momentum=0.9)
st = init_optimizer_state(opt, params, None, row)
step = build_train_step(bess, opt, None, row)
b = {k: jnp.asarray(v) for k, v in bs.sample_batch([0]).items()}
params, st, out = step(params, st, b); l = float(out["loss"])
jax.profiler.start_trace("/tmp/wiki_t6")
for i in range(20): params, st, out = step(params, st, b)
l = float(out["loss"])
jax.profiler.stop_trace()
print("done")
