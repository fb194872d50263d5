"""Top-k inference throughput: (h, r, ?) completion against ALL entities.

Mirrors the reference's YAGO3-10 inference benchmark
(`/root/reference/notebooks/2_yago_topk_prediction.ipynb` cells 30-39:
123,182 entities, ComplEx, window 500; 0.0227 s/val-batch on 4 IPUs,
0.1207 s on 1 IPU, 0.654 s on CPU). Runs TopKQueryBessKGE on one chip and
reports queries/s and s/val-batch on the same query-batch size.

    python benchmarks/bench_topk.py                 # real chip
    python benchmarks/bench_topk.py --force-gather  # A/B: pre-contiguous path
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=123_182)
    ap.add_argument("--model", default="complex",
                    choices=["complex", "transe-l1", "transe-l2"])
    ap.add_argument("--dim", type=int, default=128, help="complex dim (row 2d)")
    ap.add_argument("--window", type=int, default=None,
                    help="window size (default: auto — min(32768, rows))")
    ap.add_argument("--batch", type=int, default=512, help="queries per call")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--force-gather", action="store_true",
                    help="disable the contiguous window load (A/B baseline)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 scoring math (2x VPU width; the reference "
                         "runs fp16 on IPU)")
    ap.add_argument("--merge", default="auto",
                    choices=["auto", "sort", "chunk"],
                    help="window merge: full-window lax.top_k sort vs the "
                         "exact hierarchical chunk-max merge")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from besskge_tpu import bess as bess_mod
    from besskge_tpu.bess import TopKQueryBessKGE
    from besskge_tpu.negative_sampler import PlaceholderNegativeSampler
    from besskge_tpu.scoring import ComplEx
    from besskge_tpu.sharding import Sharding

    # window None defers to TopKQueryBessKGE's auto default (32k for
    # MXU-formable scorers, 128k for the fused-L1 window path).
    window = args.window
    if args.force_gather:
        # knock out the contiguous path by masking the helper's gate
        orig = bess_mod.pk_is_packed
        bess_mod.pk_is_packed = lambda t: True  # packed + odd W -> fallback
        if window is None:
            rows = args.entities
            window = max(min(32768, rows) // 128 * 128, min(rows, 128))
        window = window + (1 - window % 2)  # make W odd

    from besskge_tpu.scoring import TransE

    rng = np.random.default_rng(0)
    sharding = Sharding.create(args.entities, 1, seed=0)
    if args.model == "complex":
        score_fn = ComplEx(
            negative_sample_sharing=True, sharding=sharding,
            n_relation_type=37, embedding_size=args.dim, seed=0,
        )
    else:
        score_fn = TransE(
            negative_sample_sharing=True,
            scoring_norm=1 if args.model.endswith("l1") else 2,
            sharding=sharding, n_relation_type=37,
            embedding_size=args.dim, seed=0,
        )
    if args.bf16:
        score_fn.compute_dtype = jnp.bfloat16
    ns = PlaceholderNegativeSampler("t")
    topk = TopKQueryBessKGE(
        k=args.k, candidate_sampler=ns, score_fn=score_fn,
        window_size=window, merge_mode=args.merge, axis_name=None,
    )
    params = score_fn.initial_params_device()
    fwd = jax.jit(lambda p, r, h: topk.forward(p, r, head=h))

    rel = jnp.asarray(rng.integers(37, size=args.batch).astype(np.int32))
    head = jnp.asarray(
        rng.integers(sharding.max_entity_per_shard, size=args.batch).astype(
            np.int32
        )
    )
    out = fwd(params, rel, head)
    _ = np.asarray(out["topk_global_id"][0, 0])  # sync by value fetch

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fwd(params, rel, head)
        _ = np.asarray(out["topk_global_id"][0, 0])
        best = min(best, (time.perf_counter() - t0) / args.steps)

    mode = "gather" if args.force_gather else "contiguous"
    print(
        f"topk vs {args.entities} entities ({args.model} d={args.dim}, "
        f"window {topk.window_size}, {mode}, merge={args.merge}): "
        f"{best*1e3:.1f} ms / "
        f"{args.batch}-query batch = {args.batch/best:,.0f} queries/s"
    )


if __name__ == "__main__":
    main()
