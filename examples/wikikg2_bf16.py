"""The bf16 capacity recipe at ogbl-wikikg2 scale — tutorial parity with
`/root/reference/notebooks/3_wikikg2_fp16.ipynb`.

The reference trains TransE on wikikg2 (2.5M entities) with **fp16 weights**
to fit the table in IPU SRAM (cells 16-18: TransE, SSCE loss, 32 shared
"t"-corruption negatives + in-batch augmentation, shard_bs 512 × 100
micro-batches, SGD lr 1e-3 momentum 0.95, `model.half()`).

The TPU translation of `model.half()` is **row-pair-packed bf16 storage**
(:mod:`besskge_tpu.packed`): the entity table lives in HBM at half the fp32
footprint while the in-place Pallas row scatter keeps sparse updates at
full speed (XLA's scatter on a plain bf16 table would copy the whole
table every step). Momentum stays fp32 per logical row, and scoring math
runs in bf16 (`compute_dtype`), mirroring the fp16-compute of the IPU.

Deviations from the notebook, both documented: embedding_size 128 instead
of 100 (the in-place DMA kernel needs 128-aligned rows — and d=128 is
MXU/VPU-lane native), and SGD momentum handled by the lazy row-wise
:class:`~besskge_tpu.optim.RowSGDM` (touched rows only) instead of a dense
velocity tensor.

Data: ``--real DIR`` loads actual ogbl-wikikg2
(:func:`besskge_tpu.dataset.build_ogbl_wikikg2`, needs network). Offline
(default) a wikikg2-shaped random graph exercises the full capacity path;
training quality on it is meaningless, so the offline run reports
throughput, the table's HBM footprint versus fp32, and a sampled top-k
smoke-eval — the biokg fixture (`examples/biokg_parity.py`) is the
downstream-quality harness.

Run:  python examples/wikikg2_bf16.py                    # full, real TPU
      python examples/wikikg2_bf16.py --cpu --entities 20000 --steps 8
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", default=None, metavar="DIR")
    ap.add_argument("--entities", type=int, default=2_500_604)
    ap.add_argument("--relations", type=int, default=535)
    ap.add_argument("--triples", type=int, default=2_000_000)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--shard-bs", type=int, default=512)
    ap.add_argument("--bps", type=int, default=8,
                    help="micro-batches per step (notebook packs 100 per "
                         "device iteration; 8 keeps host batches small)")
    ap.add_argument("--topk-queries", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import optax

    from besskge_tpu.batch_sampler import (
        RandomShardedBatchSampler,
        RigidShardedBatchSampler,
    )
    from besskge_tpu.bess import (
        EmbeddingMovingBessKGE,
        TopKQueryBessKGE,
        build_topk_forward,
    )
    from besskge_tpu.dataset import KGDataset
    from besskge_tpu.loss import SampledSoftmaxCrossEntropyLoss
    from besskge_tpu.metric import Evaluation
    from besskge_tpu.negative_sampler import (
        PlaceholderNegativeSampler,
        RandomShardedNegativeSampler,
    )
    from besskge_tpu.optim import RowSGDM
    from besskge_tpu.scoring import TransE
    from besskge_tpu.sharding import PartitionedTripleSet, Sharding
    from besskge_tpu.trainer import build_train_step, init_optimizer_state

    seed = 42
    if args.real:
        from besskge_tpu.dataset import build_ogbl_wikikg2

        ds = build_ogbl_wikikg2(args.real)
    else:
        rng = np.random.default_rng(seed)
        tri = np.stack(
            [
                rng.integers(args.entities, size=args.triples),
                rng.integers(args.relations, size=args.triples),
                rng.integers(args.entities, size=args.triples),
            ],
            axis=1,
        ).astype(np.int32)
        ds = KGDataset(
            n_entity=args.entities,
            n_relation_type=args.relations,
            entity_dict=None,
            relation_dict=None,
            type_offsets=None,
            triples={"train": tri[:-5000], "valid": tri[-5000:]},
            original_triple_ids={
                "train": np.arange(len(tri) - 5000, dtype=np.int64),
                "valid": np.arange(5000, dtype=np.int64),
            },
            neg_heads=None,
            neg_tails=None,
        )
    print(f"dataset: {ds.n_entity:,} entities, "
          f"{len(ds.triples['train']):,} train triples")

    n_shard = 1 if not args.cpu else 1  # capacity demo: one chip's HBM
    sharding = Sharding.create(ds.n_entity, n_shard, seed=seed)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)

    # ------------------- model: bf16 packed table (the `model.half()`) ----
    score_fn = TransE(
        negative_sample_sharing=True,
        scoring_norm=1,
        sharding=sharding,
        n_relation_type=ds.n_relation_type,
        embedding_size=128,
        seed=seed,
    )
    score_fn.dtype = jnp.bfloat16
    score_fn.packed_entity_storage = True
    score_fn.compute_dtype = jnp.bfloat16

    ns = RandomShardedNegativeSampler(
        32, sharding, seed, "t", local_sampling=False,
        flat_negative_format=True,
    )
    bs = RandomShardedBatchSampler(
        pts, ns, shard_bs=args.shard_bs, batches_per_step=args.bps, seed=seed
    )
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns,
        score_fn=score_fn,
        loss_fn=SampledSoftmaxCrossEntropyLoss(n_entity=ds.n_entity),
        augment_negative=True,
        axis_name=None,
    )
    opt = optax.sgd(1e-3, momentum=0.95)
    # interleaved=True: momentum lives inside the packed store (triplet-
    # major (3P, D) blocks, one scatter DMA per touched packed row — +5-8%
    # end-to-end, BASELINE.md round 5); trajectory is bit-identical to the
    # separate-buffer layout and checkpoints keep the plain on-disk format
    row = RowSGDM(learning_rate=1e-3, momentum=0.95, interleaved=True)
    params = score_fn.initial_params_device()
    params = dict(params)
    from besskge_tpu.packed import interleave_packed_momentum

    params["entity_embedding"] = interleave_packed_momentum(
        params["entity_embedding"]
    )
    table = params["entity_embedding"]
    fp32_bytes = sharding.n_shard * sharding.max_entity_per_shard * 128 * 4
    print(f"entity table: packed {table.dtype} {table.shape} = "
          f"{table.size * 4 / 2**30:.2f} GiB incl. interleaved fp32 "
          f"momentum (fp32 params alone would be "
          f"{fp32_bytes / 2**30:.2f} GiB + momentum)")
    opt_state = init_optimizer_state(opt, params, None, row)
    step_fn = build_train_step(bess, opt, None, row)

    # ----------------------------- train ----------------------------------
    loader = bs.get_dataloader(shuffle=True, prefetch=4, repeat=True)
    batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
    params, opt_state, out = step_fn(params, opt_state, batch)
    print(f"compiled; first loss {float(out['loss']):.3f}")
    t0 = time.perf_counter()
    for _ in range(args.steps):
        batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
        params, opt_state, out = step_fn(params, opt_state, batch)
    loss = float(out["loss"])  # sync point
    dt = time.perf_counter() - t0
    rate = args.steps * args.shard_bs * args.bps / dt
    print(f"train: {args.steps} steps, loss {loss:.3f}, "
          f"{rate:,.0f} pos triples/s")
    assert np.isfinite(loss)

    # -------------------- sampled top-k smoke eval (cells 20-24) ----------
    vq = ds.triples["valid"][: args.topk_queries]
    qpts = PartitionedTripleSet.create_from_queries(
        ds, sharding, vq[:, :2].astype(np.int32), "hr",
        ground_truth=vq[:, 2].astype(np.int32),
    )
    pns = PlaceholderNegativeSampler(corruption_scheme="t", seed=seed)
    qbs = RigidShardedBatchSampler(
        qpts, pns, shard_bs=128, batches_per_step=2, seed=seed,
        return_triple_idx=True,
    )
    topk = TopKQueryBessKGE(
        k=10, candidate_sampler=pns, score_fn=score_fn,
        evaluation=Evaluation(["mrr", "hits@10"], worst_rank_infty=True,
                              reduction="sum"),
        window_size=1000,
        axis_name=None,  # single-shard capacity demo
    )
    fwd = build_topk_forward(topk, None)
    # split the triplet store for eval: contiguous window slices over the
    # interleaved table would read 3x the bytes (packed.py docstring)
    from besskge_tpu.packed import split_packed_interleaved

    eval_params = dict(params)
    eval_params["entity_embedding"], _ = split_packed_interleaved(
        params["entity_embedding"]
    )
    totals, n_q = np.zeros(2), 0
    t0 = time.perf_counter()
    for b in qbs.get_dataloader(shuffle=False):
        o = fwd(eval_params, {k: jnp.asarray(v) for k, v in b.items()})
        totals += np.asarray(o["metrics"], np.float64).reshape(-1, 2).sum(0)
        n_q += int(b["triple_mask"].sum())
    print(f"top-10 vs ALL {ds.n_entity:,} entities, {n_q} queries: "
          f"{time.perf_counter() - t0:.1f}s, "
          f"mrr {totals[0] / n_q:.4f} hits@10 {totals[1] / n_q:.4f}")

    print(json.dumps({
        "metric": "wikikg2_bf16_packed_train_pos_triples_per_s",
        "value": round(rate, 1),
        "unit": "triples/s",
        "table_gib": round(table.size * 4 / 2**30, 3),
        "fp32_table_gib": round(fp32_bytes / 2**30, 3),
    }))


if __name__ == "__main__":
    main()
