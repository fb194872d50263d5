"""Secondary benchmark: ogbl-wikikg2-scale training throughput.

Config mirrors `/root/reference/notebooks/3_wikikg2_fp16.ipynb` (cells
14-24): 2.5M-entity table, TransE, SSCE loss, 32 flat negatives + sharing +
in-batch negative augmentation, "ht" corruption, shard_bs 512, SGDM — with
the TPU-native choices: d=128 rows (MXU/VPU-aligned), sparse row-wise SGDM
(the dense IPU-style update is HBM-bound on TPU), device-side table init.

Reference baseline: ~4.47 s/epoch for 1.9e7 triples on 4 IPUs ≈ 4.3M pos
triples/s ≈ 1.08M/s/chip. The reference ran fp16 weights+compute; this bench
uses fp32 tables by default (pass --bf16 for bf16 tables — note 16-bit
tables fall back to XLA's copying scatter for the sparse update, so fp32
is faster for training; bf16 is for inference/capacity). Prints ONE JSON
line.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_ENTITY = 2_500_604
N_RELATION = 535
N_TRAIN = 1_000_000  # synthetic subset; throughput is per-step, not per-epoch
D = 128
SHARD_BS = 512
BPS = 8
N_NEGATIVE = 32
BASELINE_PER_CHIP = 4.3e6 / 4


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

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
    triples = np.stack(
        [
            rng.integers(N_ENTITY, size=N_TRAIN),
            rng.integers(N_RELATION, size=N_TRAIN),
            rng.integers(N_ENTITY, size=N_TRAIN),
        ],
        axis=1,
    ).astype(np.int32)
    ds = KGDataset(
        n_entity=N_ENTITY,
        n_relation_type=N_RELATION,
        entity_dict=None,
        relation_dict=None,
        type_offsets=None,
        triples={"train": triples},
        original_triple_ids={"train": np.arange(N_TRAIN)},
        neg_heads=None,
        neg_tails=None,
    )
    sharding = Sharding.create(N_ENTITY, 1, seed=0)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    score_fn = TransE(
        negative_sample_sharing=True,
        scoring_norm=1,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=D,
        seed=0,
        dtype=dtype,
    )
    # fp16-compute parity with the reference notebook: bf16 scoring math
    # over fp32-stored tables (2x VPU width; fp32 loss/update unchanged).
    score_fn.compute_dtype = jnp.bfloat16
    params = score_fn.initial_params_device()
    ns = RandomShardedNegativeSampler(
        N_NEGATIVE, sharding, 0, "ht", local_sampling=False,
        flat_negative_format=True,
    )
    bs = RandomShardedBatchSampler(
        pts, ns, shard_bs=SHARD_BS, batches_per_step=BPS, seed=0
    )
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns,
        score_fn=score_fn,
        loss_fn=SampledSoftmaxCrossEntropyLoss(n_entity=N_ENTITY),
        augment_negative=True,
        axis_name=None,
    )
    opt = optax.sgd(1e-3, momentum=0.9)
    row = RowSGDM(learning_rate=1e-3, momentum=0.9)
    opt_state = init_optimizer_state(opt, params, None, row)
    step_fn = build_train_step(bess, opt, None, row)
    batches = [
        {k: jnp.asarray(v) for k, v in bs.sample_batch([i]).items()}
        for i in range(6)
    ]
    params, opt_state, out = step_fn(params, opt_state, batches[0])
    loss = float(out["loss"])

    n_steps, best = 120, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n_steps):
            params, opt_state, out = step_fn(
                params, opt_state, batches[i % len(batches)]
            )
        loss = float(out["loss"])
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(loss)
    triples_per_s = n_steps * BPS * SHARD_BS / best
    print(
        json.dumps(
            {
                "metric": "wikikg2_transe_sparse_train_pos_triples_per_s_per_chip",
                "value": round(triples_per_s, 1),
                "unit": "triples/s",
                "vs_baseline": round(triples_per_s / BASELINE_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
