"""Training-throughput benchmarks on the reference's two headline configs.

Prints one JSON line per config (biokg first):

1. **biokg** — `/root/reference/notebooks/1_biokg_training_inference.ipynb`
   (cells 22-29): ogbl-biokg-sized graph (93,773 entities / 51 relations),
   RotatE d=64, LogSigmoid + self-adversarial, 1 random negative + sharing +
   "ht", shard_bs 240 x 48 micro-batches, dense AdamW. Reference: ~0.92M
   positive triples/s on 1 IPU, ~3.0M/s on 4.
2. **wikikg2** — `/root/reference/notebooks/3_wikikg2_fp16.ipynb` (cells
   14-24): 2.5M-entity table, TransE d=128 bf16-compute, SSCE, 32 flat
   negatives + sharing + in-batch augmentation, shard_bs 512 x 8, sparse
   row-wise SGDM. Reference: ~4.3M pos triples/s on 4 IPUs = 1.08M/s/chip.

Honest timing: batches are assembled by the background host sampler thread
(`get_dataloader`) DURING the timed loop and transferred per step — the
number includes host sampling + H2D, not just device compute. Each line
also reports MFU and HBM-bandwidth utilization derived from the compiled
step's XLA cost analysis over the measured step time, and a real-TPU
numerics self-test of the in-place Pallas kernels runs first (they are
CPU-gated in CI, so the bench asserts them on hardware).
"""

import json
import sys
import time

import numpy as np

# v5e peak: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
PEAK_FLOPS_BF16 = 197e12
PEAK_HBM_BPS = 819e9

CONFIGS = {
    "biokg": dict(
        metric="biokg_rotate_train_pos_triples_per_s_per_chip",
        baseline=0.92e6,  # 1-IPU reference rate
    ),
    "wikikg2": dict(
        metric="wikikg2_transe_sparse_train_pos_triples_per_s_per_chip",
        baseline=4.3e6 / 4,  # per-chip of the 4-IPU reference rate
    ),
    # Storage parity with the reference fp16 recipe: the 2.5M-entity table
    # held in row-pair-packed bf16 (half the HBM), sparse in-place updates.
    "wikikg2_bf16": dict(
        metric="wikikg2_transe_bf16table_train_pos_triples_per_s_per_chip",
        baseline=4.3e6 / 4,
    ),
}


def _tpu_kernel_selftest() -> None:
    """Real-TPU numerics assertions for the in-place Pallas kernels (their
    CI tests run interpret-mode on CPU; this validates the Mosaic path)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return
    from besskge_tpu.ops.pallas_adamw import dense_adamw_update
    from besskge_tpu.ops.pallas_scatter import scatter_rows

    rng = np.random.default_rng(0)
    tab_np = rng.normal(size=(512, 128)).astype(np.float32)
    idx_np = rng.choice(512, size=37, replace=False).astype(np.int32)
    rows_np = rng.normal(size=(37, 128)).astype(np.float32)
    out = jax.jit(scatter_rows, donate_argnums=0)(
        jnp.asarray(tab_np), jnp.asarray(idx_np), jnp.asarray(rows_np)
    )
    want = tab_np.copy()
    want[idx_np] = rows_np
    np.testing.assert_allclose(np.asarray(out), want, rtol=0, atol=0)

    p = rng.normal(size=(256, 128)).astype(np.float32)
    mu = rng.normal(size=(256, 128)).astype(np.float32) * 0.1
    nu = abs(rng.normal(size=(256, 128)).astype(np.float32)) * 0.01
    g = rng.normal(size=(256, 128)).astype(np.float32)
    lr, b1, b2, eps, wd, t = 1e-2, 0.9, 0.999, 1e-8, 0.01, 7
    new_p, new_mu, new_nu = jax.jit(
        lambda *a: dense_adamw_update(*a, lr=lr, b1=b1, b2=b2, eps=eps, wd=wd),
        donate_argnums=(0, 1, 2),
    )(jnp.asarray(p), jnp.asarray(mu), jnp.asarray(nu), jnp.asarray(g),
      jnp.asarray(t, dtype=jnp.int32))
    mu_w = b1 * mu + (1 - b1) * g
    nu_w = b2 * nu + (1 - b2) * g * g
    mhat = mu_w / (1 - b1**t)
    vhat = nu_w / (1 - b2**t)
    p_w = p - lr * (mhat / (np.sqrt(vhat) + eps) + wd * p)
    np.testing.assert_allclose(np.asarray(new_mu), mu_w, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(new_nu), nu_w, rtol=1e-6, atol=1e-9)
    # TPU rsqrt is a fast approximation — allow ~1e-4 relative on the param.
    np.testing.assert_allclose(np.asarray(new_p), p_w, rtol=3e-4, atol=1e-5)
    print("# pallas in-place kernels: TPU numerics OK", file=sys.stderr)


def _make_dataset(n_entity, n_relation, n_train):
    from besskge_tpu.dataset import KGDataset

    rng = np.random.default_rng(0)
    triples = np.stack(
        [
            rng.integers(n_entity, size=n_train),
            rng.integers(n_relation, size=n_train),
            rng.integers(n_entity, size=n_train),
        ],
        axis=1,
    ).astype(np.int32)
    return KGDataset(
        n_entity=n_entity,
        n_relation_type=n_relation,
        entity_dict=None,
        relation_dict=None,
        type_offsets=None,
        triples={"train": triples},
        original_triple_ids={"train": np.arange(n_train)},
        neg_heads=None,
        neg_tails=None,
    )


def _setup_biokg():
    import optax

    from besskge_tpu.batch_sampler import RandomShardedBatchSampler
    from besskge_tpu.bess import EmbeddingMovingBessKGE
    from besskge_tpu.loss import LogSigmoidLoss
    from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
    from besskge_tpu.scoring import RotatE
    from besskge_tpu.sharding import PartitionedTripleSet, Sharding
    from besskge_tpu.trainer import build_train_step, init_optimizer_state

    shard_bs, bps = 240, 48
    ds = _make_dataset(93_773, 51, 4_762_678)
    sharding = Sharding.create(ds.n_entity, 1, seed=0)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    score_fn = RotatE(
        negative_sample_sharing=True, scoring_norm=2, sharding=sharding,
        n_relation_type=ds.n_relation_type, embedding_size=64, seed=0,
    )
    ns = RandomShardedNegativeSampler(
        1, sharding, 0, "ht", local_sampling=False, flat_negative_format=True
    )
    bs = RandomShardedBatchSampler(pts, ns, shard_bs=shard_bs,
                                   batches_per_step=bps, seed=0)
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns, score_fn=score_fn,
        loss_fn=LogSigmoidLoss(margin=12.0, negative_adversarial_sampling=True),
        axis_name=None,
    )
    # Plain optax dense AdamW: at this table size XLA fuses the update into
    # the backward epilogue and beats the custom fused kernel
    # (optim.FusedDenseAdamW measured ~12% slower in context).
    optimizer = optax.adamw(1e-3)
    params = score_fn.initial_params_device()
    opt_state = init_optimizer_state(optimizer, params, None)
    step_fn = build_train_step(bess, optimizer, None)
    return step_fn, params, opt_state, bs, shard_bs * bps


def _setup_wikikg2(bf16_table: bool = False):
    import jax.numpy as jnp
    import optax

    from besskge_tpu.batch_sampler import RandomShardedBatchSampler
    from besskge_tpu.bess import EmbeddingMovingBessKGE
    from besskge_tpu.loss import SampledSoftmaxCrossEntropyLoss
    from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
    from besskge_tpu.optim import RowSGDM
    from besskge_tpu.scoring import TransE
    from besskge_tpu.sharding import PartitionedTripleSet, Sharding
    from besskge_tpu.trainer import build_train_step, init_optimizer_state

    shard_bs, bps = 512, 8
    ds = _make_dataset(2_500_604, 535, 1_000_000)
    sharding = Sharding.create(ds.n_entity, 1, seed=0)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    score_fn = TransE(
        negative_sample_sharing=True, scoring_norm=1, sharding=sharding,
        n_relation_type=ds.n_relation_type, embedding_size=128, seed=0,
    )
    # fp16-compute parity with the reference notebook: bf16 scoring math
    # over fp32-stored tables (2x VPU width; fp32 loss/update unchanged).
    score_fn.compute_dtype = jnp.bfloat16
    if bf16_table:
        # Full storage parity with the reference fp16 recipe: the entity
        # table itself in bf16 (row-pair-packed int32 — half the HBM),
        # sparse in-place updates at full speed (besskge_tpu.packed).
        score_fn.dtype = jnp.bfloat16
        score_fn.packed_entity_storage = True
    ns = RandomShardedNegativeSampler(
        32, sharding, 0, "ht", local_sampling=False, flat_negative_format=True
    )
    bs = RandomShardedBatchSampler(pts, ns, shard_bs=shard_bs,
                                   batches_per_step=bps, seed=0)
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns, score_fn=score_fn,
        loss_fn=SampledSoftmaxCrossEntropyLoss(n_entity=ds.n_entity),
        augment_negative=True, axis_name=None,
    )
    opt = optax.sgd(1e-3, momentum=0.9)
    row = RowSGDM(learning_rate=1e-3, momentum=0.9)
    params = score_fn.initial_params_device()
    opt_state = init_optimizer_state(opt, params, None, row)
    step_fn = build_train_step(bess, opt, None, row)
    return step_fn, params, opt_state, bs, shard_bs * bps


def _cost_fields(step_fn, params, opt_state, batch, step_s):
    """MFU / HBM utilization from the compiled step's XLA cost analysis."""
    try:
        cost = step_fn.lower(params, opt_state, batch).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        byts = float(cost.get("bytes accessed", 0.0))
        return {
            "mfu_bf16_pct": round(100 * flops / step_s / PEAK_FLOPS_BF16, 2),
            "hbm_bw_pct": round(100 * byts / step_s / PEAK_HBM_BPS, 2),
        }
    except Exception:  # cost analysis is best-effort (backend-dependent)
        return {"mfu_bf16_pct": None, "hbm_bw_pct": None}


def _device_prefetch(it, depth: int = 2):
    """Move batches to device one step ahead so H2D overlaps compute (the
    transfers still happen inside the timed loop — this is pipelining, not
    pre-assembly)."""
    from collections import deque

    import jax.numpy as jnp

    q = deque()
    for b in it:
        q.append({k: jnp.asarray(v) for k, v in b.items()})
        if len(q) >= depth:
            yield q.popleft()
    while q:
        yield q.popleft()


def run_one(name: str, n_steps: int = 120, repeats: int = 3) -> dict:
    setup = {
        "biokg": _setup_biokg,
        "wikikg2": _setup_wikikg2,
        "wikikg2_bf16": lambda: _setup_wikikg2(bf16_table=True),
    }[name]
    step_fn, params, opt_state, bs, pos_per_step = setup()
    loader = _device_prefetch(
        bs.get_dataloader(shuffle=True, prefetch=4, repeat=True)
    )

    # Warm-up/compile. NB: fetch the value — on remote-attached backends
    # block_until_ready can return before execution completes.
    first = next(loader)
    params, opt_state, out = step_fn(params, opt_state, first)
    loss = float(out["loss"])

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            params, opt_state, out = step_fn(params, opt_state, next(loader))
        loss = float(out["loss"])  # device->host sync point
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(loss), f"non-finite loss {loss}"

    # Pure-device rate: same step re-fed one resident batch — the gap to the
    # live-sampler rate is the input pipeline's NON-overlapped share (host
    # assembly + H2D the prefetch failed to hide). AllToAll/compute overlap
    # needs >1 chip and is reported by the multichip dryrun instead.
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, out = step_fn(params, opt_state, first)
    loss = float(out["loss"])
    t_pure = time.perf_counter() - t0
    assert np.isfinite(loss)
    input_stall_pct = max(0.0, 100.0 * (best - t_pure) / best)

    cfg = CONFIGS[name]
    value = n_steps * pos_per_step / best
    line = {
        "metric": cfg["metric"],
        "value": round(value, 1),
        "unit": "triples/s",
        "vs_baseline": round(value / cfg["baseline"], 3),
        "host_sampler_concurrent": True,
        "input_stall_pct": round(input_stall_pct, 1),
        "device_only_triples_per_s": round(n_steps * pos_per_step / t_pure, 1),
        **_cost_fields(step_fn, params, opt_state, first, best / n_steps),
    }
    print(json.dumps(line), flush=True)
    return line


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _tpu_kernel_selftest()
    names = sys.argv[1:] or ["biokg", "wikikg2", "wikikg2_bf16"]
    for name in names:
        run_one(name)


if __name__ == "__main__":
    sys.exit(main())
