"""Worker for the REAL 2-process multihost test (launched by
``test_multihost.py::test_two_process_train_step``).

Each process brings up ``jax.distributed`` against a localhost coordinator
with 8/nproc virtual CPU devices (global mesh: 8 shards),
assembles its process-local batch slice via ``shard_batch_multihost`` (the
``make_array_from_process_local_data`` path that a single process never
takes), runs ONE sharded train step, and prints the global loss as JSON.
"""

import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
N_SHARD_TOTAL = 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_SHARD_TOTAL // nproc}"
)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

jax.distributed.initialize(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == N_SHARD_TOTAL, jax.device_count()

from besskge_tpu.batch_sampler import RigidShardedBatchSampler  # noqa: E402
from besskge_tpu.bess import EmbeddingMovingBessKGE  # noqa: E402
from besskge_tpu.dataset import KGDataset  # noqa: E402
from besskge_tpu.loss import LogSigmoidLoss  # noqa: E402
from besskge_tpu.negative_sampler import RandomShardedNegativeSampler  # noqa: E402
from besskge_tpu.parallel.multihost import (  # noqa: E402
    local_shard_range,
    make_global_mesh,
    shard_batch_multihost,
    shard_params_multihost,
)
from besskge_tpu.scoring import TransE  # noqa: E402
from besskge_tpu.sharding import PartitionedTripleSet, Sharding  # noqa: E402
from besskge_tpu.trainer import build_train_step, init_optimizer_state  # noqa: E402

N_ENTITY, N_REL, N_SHARD, SEED = 96, 3, 8, 5

rng = np.random.default_rng(SEED)
trip = np.stack(
    [
        rng.integers(N_ENTITY, size=800),
        rng.integers(N_REL, size=800),
        rng.integers(N_ENTITY, size=800),
    ],
    1,
).astype(np.int32)
ds = KGDataset(
    n_entity=N_ENTITY,
    n_relation_type=N_REL,
    entity_dict=None,
    relation_dict=None,
    type_offsets=None,
    triples={"train": trip},
    original_triple_ids={"train": np.arange(800)},
    neg_heads=None,
    neg_tails=None,
)
sharding = Sharding.create(N_ENTITY, N_SHARD, seed=SEED)
pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
sf = TransE(
    negative_sample_sharing=True,
    scoring_norm=1,
    sharding=sharding,
    n_relation_type=N_REL,
    embedding_size=8,
    seed=7,
)
ns = RandomShardedNegativeSampler(
    4, sharding, SEED, "t", local_sampling=False, flat_negative_format=True
)
bs = RigidShardedBatchSampler(
    partitioned_triple_set=pts,
    negative_sampler=ns,
    shard_bs=16,
    batches_per_step=2,
    seed=SEED,
)
bess = EmbeddingMovingBessKGE(
    negative_sampler=ns,
    score_fn=sf,
    loss_fn=LogSigmoidLoss(margin=1.0, negative_adversarial_sampling=False),
)

mesh = make_global_mesh(N_SHARD)
lo, hi = local_shard_range(mesh)
assert (hi - lo) == N_SHARD // nproc, (lo, hi)

params = shard_params_multihost(
    {k: np.asarray(v) for k, v in sf.initial_params().items()}, mesh
)
opt = optax.adam(1e-2)
opt_state = init_optimizer_state(opt, params, mesh)
step = build_train_step(bess, opt, mesh, donate=False)

# Every process samples the FULL deterministic batch, then keeps only its
# devices' slice — the per-host dataloader pattern.
full_batch = bs.sample_batch(next(bs.epoch_index_blocks(shuffle=False)))
local = {k: v[:, lo:hi] for k, v in full_batch.items()}
gbatch = shard_batch_multihost(local, mesh)

params, opt_state, out = step(params, opt_state, gbatch)
loss = float(np.asarray(jax.device_get(out["loss"])))
print(json.dumps({"pid": pid, "loss": loss}), flush=True)
