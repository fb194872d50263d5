"""Wall-clock decomposition of the wikikg2 train step (VERDICT r4 #3).

The round-3 roofline's per-component table was built from xprof Pallas
durations that round 4 showed ~10x inflated vs wall-clock A/B
(BASELINE.md "round 4 measurement corrections"). This script rebuilds the
decomposition the only way round 4 treats as real: END-TO-END step-time
deltas between ablated variants of the SAME device train step, at the
exact driver-bench geometry (2.5M entities, TransE d=128 bf16-compute,
SSCE, 32 flat "ht" negatives + in-batch augmentation, shard_bs 512 x 8
micro-batches, on-device sampling, steps_per_call 8).

Ablations hold everything else constant and keep the removed stage's
inputs alive (a tiny scalar folded into optimizer state) so XLA cannot
dead-code the upstream work:

fp32 family (momentum interleaved pair-major — bench `wikikg2`):
  full            the driver-bench step
  sep             separate momentum buffer (interleaved=False)
  no_update       entity dedup+math+scatter removed (grads kept live)
  no_scatter      update math runs, the (2, D) pair write removed
  xla_l1          Pallas L1 fwd/bwd kernels swapped for XLA broadcast

packed family (row-pair-packed 16-bit table — bench `wikikg2_bf16`):
  full            the driver-bench step (SR on, as the driver runs it)
  no_sr           stochastic rounding off (round-to-nearest)
  no_update       as above
  no_scatter      math+SR live, merge_packed_row_writes + scatter removed
  merge_no_scatter  math+SR+plane-merge live, only the scatter DMA removed
  xla_l1          as above

Deltas: full-no_update = whole sparse update; full-no_scatter = write
path; (packed) no_scatter-merge_no_scatter ~ plane-merge cost;
full-no_sr = SR cost; xla_l1-full = L1 kernel benefit; and packed
no_update - fp32 no_update ~ the gather-unpack (halfword select) cost of
reading a packed table in the forward/backward.

Run on the real chip: ``python benchmarks/decompose_wikikg2.py``
(optionally a variant-name filter argv). One JSON line per variant plus a
summary delta table on stderr.
"""

import dataclasses
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_SMOKE = os.environ.get("BENCH_SMOKE") == "1"
SHARD_BS, BPS, SPC = (64, 2, 2) if _SMOKE else (512, 8, 8)
N_ENTITY = 8_192 if _SMOKE else 2_500_604
N_REL, EMB = 535, 128
N_CALLS, REPEATS = (1, 1) if _SMOKE else (4, 3)


def _live(*arrs):
    """Fold arrays into a numerically-negligible live scalar (anti-DCE)."""
    import jax.numpy as jnp

    s = jnp.zeros((), jnp.float32)
    for a in arrs:
        s = s + a.astype(jnp.float32).sum() * 1e-30
    return s


def _make_rows():
    """Variant row optimizers (import-time jax deps resolved lazily)."""
    import jax.numpy as jnp

    from besskge_tpu.optim import (
        RowSGDM,
        _dedup_row_grads,
        _flat,
        _lr_at,
        _moment_shape,
        _read_rows,
        _sr_round_16,
    )
    from besskge_tpu.packed import merge_packed_row_writes

    @dataclasses.dataclass
    class NoUpdate(RowSGDM):
        def init(self, table, n_logical=None):
            return {
                "count": jnp.zeros((), jnp.int32),
                "live": jnp.zeros((), jnp.float32),
            }

        def update_rows(self, table, state, idx, grad_rows):
            return table, {
                "count": state["count"] + 1,
                "live": state["live"] + _live(grad_rows, idx),
            }

    @dataclasses.dataclass
    class NoScatter(RowSGDM):
        """Full update math (incl. SR on 16-bit tables), no table writes.

        The momentum buffer is REAL runtime state (not a traced-constant
        zeros array, which XLA would fold the gather away from), so the
        non-interleaved momentum gather stays in the measured program.
        """

        merge: bool = False

        def init(self, table, n_logical=None):
            st = {
                "count": jnp.zeros((), jnp.int32),
                "live": jnp.zeros((), jnp.float32),
            }
            if not self.interleaved:  # interleaved momentum lives in-table
                st["m"] = jnp.zeros(_moment_shape(table), jnp.float32)
            return st

        def update_rows(self, table, state, idx, grad_rows):
            lr = _lr_at(self.learning_rate, state["count"])
            new_state = dict(state, count=state["count"] + 1)
            if self.interleaved:
                idx, g = _dedup_row_grads(table, idx, grad_rows)
                d = grad_rows.shape[-1]
                t = _flat(table)
                phys = (2 * idx).astype(jnp.int32)
                flat_idx = (
                    phys[:, None] + jnp.arange(2, dtype=phys.dtype)
                ).reshape(-1)
                pairs = jnp.take(t, flat_idx, axis=0).reshape(-1, 2, d)
                p_rows, m_prev = pairs[:, 0], pairs[:, 1]
                m_rows = self.momentum * m_prev + g
                new_p = p_rows - lr * m_rows
                new_pairs = jnp.stack([new_p, m_rows], axis=1).reshape(-1, d)
                new_state["live"] = state["live"] + _live(new_pairs)
                return table, new_state
            # packed/plain path: replicate RowSGDM.update_rows sans writes
            idx, g = _dedup_row_grads(table, idx, grad_rows)
            p_rows = _read_rows(table, idx)
            m_rows = (
                self.momentum * jnp.take(_flat(state["m"]), idx, axis=0) + g
            )
            new_rows = p_rows - lr * m_rows
            if self.stochastic_rounding:
                new_rows = _sr_round_16(
                    new_rows, idx, new_state["count"], table
                )
            live = _live(new_rows, m_rows)
            if self.merge:
                # sorted_idx=True = the production path (the general
                # segmented merge measured 1.05 ms/step in-context before
                # the round-5 adjacency fix — BASELINE.md)
                p_idx, p_rows_m = merge_packed_row_writes(
                    table, idx, new_rows, sorted_idx=True
                )
                live = live + _live(p_idx, p_rows_m)
            new_state["live"] = state["live"] + live
            return table, new_state

    return RowSGDM, NoUpdate, NoScatter


def build(variant: str):
    import jax.numpy as jnp
    import optax

    from besskge_tpu.bess import EmbeddingMovingBessKGE
    from besskge_tpu.device_sampler import DeviceBatchSampler
    from besskge_tpu.loss import SampledSoftmaxCrossEntropyLoss
    from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
    from besskge_tpu.optim import interleave_momentum
    from besskge_tpu.scoring import TransE
    from besskge_tpu.sharding import PartitionedTripleSet, Sharding
    from besskge_tpu.trainer import (
        build_device_train_step,
        init_optimizer_state,
    )
    from besskge_tpu.dataset import KGDataset
    from besskge_tpu.ops import distance as dist_mod

    RowSGDM, NoUpdate, NoScatter = _make_rows()
    family, _, abl = variant.partition(":")
    packed = family in ("packed", "packed_int")

    # ablate the Pallas L1 kernels by raising the size gate
    orig_thresh = (dist_mod._PALLAS_MIN_ELEMS,
                   dist_mod._PALLAS_MIN_ELEMS_BATCHED)
    if abl == "xla_l1":
        dist_mod._PALLAS_MIN_ELEMS = 1 << 62
        dist_mod._PALLAS_MIN_ELEMS_BATCHED = 1 << 62

    rng = np.random.default_rng(0)
    n_train = 1_000_000
    triples = np.stack(
        [rng.integers(N_ENTITY, size=n_train),
         rng.integers(N_REL, size=n_train),
         rng.integers(N_ENTITY, size=n_train)], axis=1
    ).astype(np.int32)
    ds = KGDataset(
        n_entity=N_ENTITY, n_relation_type=N_REL,
        triples={"train": triples},
        original_triple_ids={"train": np.arange(n_train)},
    )
    sharding = Sharding.create(N_ENTITY, 1, seed=0)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    score_fn = TransE(
        negative_sample_sharing=True, scoring_norm=1, sharding=sharding,
        n_relation_type=N_REL, embedding_size=EMB, seed=0,
    )
    score_fn.compute_dtype = jnp.bfloat16
    if packed:
        score_fn.dtype = jnp.bfloat16
        score_fn.packed_entity_storage = True
    ns = RandomShardedNegativeSampler(
        32, sharding, 0, "ht", local_sampling=False,
        flat_negative_format=True,
    )
    bess = EmbeddingMovingBessKGE(
        negative_sampler=ns, score_fn=score_fn,
        loss_fn=SampledSoftmaxCrossEntropyLoss(n_entity=ds.n_entity),
        augment_negative=True, axis_name=None,
    )

    interleaved = family in ("fp32", "packed_int")
    sr = packed and abl != "no_sr"
    kw = dict(learning_rate=1e-3, momentum=0.9, stochastic_rounding=sr,
              interleaved=interleaved)
    if abl == "no_update":
        row = NoUpdate(**kw)
    elif abl == "no_scatter":
        row = NoScatter(**kw)
    elif abl == "merge_no_scatter":
        row = NoScatter(**kw, merge=True)
    else:
        row = RowSGDM(**kw)

    params = score_fn.initial_params_device()
    if interleaved:
        params = dict(params)
        if packed:
            from besskge_tpu.packed import interleave_packed_momentum

            params["entity_embedding"] = interleave_packed_momentum(
                params["entity_embedding"]
            )
        else:
            params["entity_embedding"] = interleave_momentum(
                params["entity_embedding"]
            )
    opt = optax.sgd(1e-3, momentum=0.9)
    opt_state = init_optimizer_state(opt, params, None, row)
    dev = DeviceBatchSampler(pts, ns, shard_bs=SHARD_BS,
                             batches_per_step=BPS, seed=0,
                             positive_mode="runs")
    dstep = build_device_train_step(
        bess, opt, dev, None, entity_optimizer=row, steps_per_call=SPC
    )
    if abl == "xla_l1":
        pass  # restored by caller after compile via finish()

    def finish():
        dist_mod._PALLAS_MIN_ELEMS = orig_thresh[0]
        dist_mod._PALLAS_MIN_ELEMS_BATCHED = orig_thresh[1]

    return dstep, dev, params, opt_state, finish


VARIANTS = [
    "fp32:full", "fp32_sep:full", "fp32:no_update", "fp32:no_scatter",
    "fp32:xla_l1",
    "packed:full", "packed:no_sr", "packed:no_update", "packed:no_scatter",
    "packed:merge_no_scatter", "packed:xla_l1",
    "packed_int:full", "packed_int:no_sr",
]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    want = sys.argv[1:] or VARIANTS
    results = {}
    for variant in want:
        dstep, dev, params, opt_state, finish = build(variant)
        dstate = dev.state()
        params, opt_state, out = dstep(
            params, opt_state, dstate, dev.next_key(0)
        )
        loss = float(out["loss"])  # fetch = sync (compile + warm)
        finish()
        assert np.isfinite(loss), (variant, loss)
        times = []
        for r in range(REPEATS):
            t0 = time.perf_counter()
            for i in range(N_CALLS):
                params, opt_state, out = dstep(
                    params, opt_state, dstate,
                    dev.next_key(1 + r * N_CALLS + i),
                )
            loss = float(out["loss"])
            times.append(time.perf_counter() - t0)
        med = float(np.median(times)) / (N_CALLS * SPC)
        rate = SHARD_BS * BPS / med
        results[variant] = med
        print(json.dumps({
            "variant": variant,
            "us_per_step": round(med * 1e6, 1),
            "pos_triples_per_s": round(rate, 1),
            "spread_us": [
                round(min(times) / (N_CALLS * SPC) * 1e6, 1),
                round(max(times) / (N_CALLS * SPC) * 1e6, 1),
            ],
        }), flush=True)
        del dstep, dev, params, opt_state

    def delta(a, b):
        return (
            f"{(results[a] - results[b]) * 1e6:8.1f} us  ({a} - {b})"
            if a in results and b in results else None
        )

    print("\n# wall-clock deltas (us/step):", file=sys.stderr)
    for pair in [
        ("fp32:full", "fp32:no_update"),
        ("fp32:full", "fp32:no_scatter"),
        ("fp32_sep:full", "fp32:full"),
        ("fp32:xla_l1", "fp32:full"),
        ("packed:full", "packed:no_update"),
        ("packed:full", "packed:no_scatter"),
        ("packed:no_scatter", "packed:merge_no_scatter"),
        ("packed:full", "packed:no_sr"),
        ("packed:xla_l1", "packed:full"),
        ("packed:no_update", "fp32:no_update"),
        ("packed:full", "fp32:full"),
    ]:
        d = delta(*pair)
        if d:
            print(d, file=sys.stderr)


if __name__ == "__main__":
    main()
