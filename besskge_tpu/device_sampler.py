"""On-device batch sampling: the whole training batch is drawn inside the
jitted step.

The host-side samplers (:mod:`besskge_tpu.batch_sampler`) assemble numpy
batches and ship them to the device every step. On IPUs (the reference
design, ``besskge/batch_sampler.py``) that is the only option — triples live
in host DRAM. On TPU the triple array comfortably fits in HBM (wikikg2's 16M
triples are 192 MB), so batch construction can move *into* the compiled
program: positives are drawn from the device-resident partitioned triple
array and negatives from per-shard entity ranges with ``jax.random``, and a
training step consumes nothing but a PRNG key from the host. This removes
the per-step host→device batch transfer and (with ``steps_per_call``) the
per-step dispatch — the dominant costs when the accelerator is behind a
network tunnel or the host sampler cannot keep up.

Semantics match :class:`~besskge_tpu.batch_sampler.RandomShardedBatchSampler`
(IID sampling with replacement from every shard-pair partition — no epoch
cover or padding masks) combined with
:class:`~besskge_tpu.negative_sampler.RandomShardedNegativeSampler` or
:class:`~besskge_tpu.negative_sampler.TypeBasedShardedNegativeSampler`
(uniform / type-matched draws balanced across shards). The produced batch
dict has exactly the host layout: ``head``/``relation`` (bps, S, S, ppp),
``tail`` pre-transposed (bps, S_t, S_h, ppp) for the AllToAll, ``negative``
(bps, S_src, S_dest, B, n). Under ``shard_map`` every device evaluates the
same draws from the same replicated key and slices out its own block, so
cross-shard consistency (head block on shard h, tail block on shard t refer
to the same sampled triples) holds by construction.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from besskge_tpu.negative_sampler import (
    RandomShardedNegativeSampler,
    TypeBasedShardedNegativeSampler,
)
from besskge_tpu.sharding import PartitionedTripleSet

__all__ = ["DeviceBatchSampler"]


class DeviceBatchSampler:
    """Draw BESS batches on device, inside the jitted train step.

    :param partitioned_triple_set: pre-partitioned triples ("ht_shardpair"
        or "h_shard" partition modes).
    :param negative_sampler: a :class:`RandomShardedNegativeSampler` or
        :class:`TypeBasedShardedNegativeSampler` — used for its
        *configuration* (n_negative, corruption scheme, type tables); its
        host RNG is never consumed.
    :param shard_bs: positive triples scored per shard per micro-batch.
    :param batches_per_step: micro-batches per training step.
    :param seed: base PRNG seed for :meth:`next_key`.
    :param hrt_freq_weighting: emit per-triple ``triple_weight`` =
        ``sqrt(1/(count(h,r)+count(r,t)+smoothing))``, micro-batch
        normalized (reference ``besskge/batch_sampler.py:130-143``).
    :param positive_mode: how positives are drawn from each partition.
        ``"iid"`` — uniform with replacement per triple (the
        :class:`RandomShardedBatchSampler` semantics; a row gather).
        ``"runs"`` — one uniform start per (micro-batch, partition) and a
        CONTIGUOUS run of ``positive_per_partition`` triples from it: the
        device twin of the reference's epoch-style
        :class:`~besskge_tpu.batch_sampler.RigidShardedBatchSampler`
        (sequential consumption of a shuffled partition,
        ``/root/reference/besskge/batch_sampler.py:299-363`` — the sampler
        its training notebooks use). On TPU a run is one ``dynamic_slice``
        DMA instead of per-triple row gathers — the iid triple gather is
        HBM-latency-bound and costs as much as the whole forward pass.
        Requires every partition to hold at least one run.
    """

    def __init__(
        self,
        partitioned_triple_set: PartitionedTripleSet,
        negative_sampler: Any,
        shard_bs: int,
        batches_per_step: int,
        seed: int = 0,
        hrt_freq_weighting: bool = False,
        weight_smoothing: float = 0.0,
        positive_mode: str = "iid",
    ) -> None:
        pts = partitioned_triple_set
        self.sharding = pts.sharding
        self.n_shard = self.sharding.n_shard
        self.triple_partition_mode = pts.partition_mode
        self.negative_sampler = negative_sampler
        self.shard_bs = shard_bs
        self.batches_per_step = batches_per_step
        self.seed = seed
        self.dummy = pts.dummy
        if pts.partition_mode not in ("ht_shardpair", "h_shard"):
            raise ValueError(
                f"Unsupported partition mode {pts.partition_mode!r}"
            )
        if isinstance(negative_sampler, TypeBasedShardedNegativeSampler):
            self._negative_kind = "type"
        elif isinstance(negative_sampler, RandomShardedNegativeSampler):
            self._negative_kind = "random"
        else:
            raise ValueError(
                "DeviceBatchSampler supports Random/TypeBased sharded "
                f"negative samplers, got {type(negative_sampler).__name__}"
            )

        if pts.partition_mode == "ht_shardpair":
            self.positive_per_partition = int(
                np.ceil(shard_bs / self.n_shard)
            )
        else:
            self.positive_per_partition = shard_bs
        if negative_sampler.corruption_scheme == "ht":
            self.positive_per_partition = 2 * (self.positive_per_partition // 2)
        self.partition_sample_size = (
            self.batches_per_step * self.positive_per_partition
        )

        self._triples = np.asarray(pts.triples, np.int32)
        self._counts = np.maximum(np.asarray(pts.triple_counts, np.int64), 1)
        self._offsets = np.asarray(pts.triple_offsets, np.int64)
        self._shard_counts = np.asarray(self.sharding.shard_counts, np.int32)

        if positive_mode not in ("iid", "runs"):
            raise ValueError(f"Unknown positive_mode {positive_mode!r}")
        if positive_mode == "runs" and (
            self._counts < self.positive_per_partition
        ).any():
            raise ValueError(
                "positive_mode='runs' needs every partition to hold at "
                f"least one run of {self.positive_per_partition} triples "
                f"(smallest partition: {int(self._counts.min())})"
            )
        self.positive_mode = positive_mode

        self.hrt_freq_weighting = hrt_freq_weighting
        self._weights: Optional[np.ndarray] = None
        if hrt_freq_weighting:
            n_ent = self.sharding.n_entity
            tri = self._triples.astype(np.int64)
            _, hr_inv, hr_count = np.unique(
                tri[:, 0] + n_ent * tri[:, 1],
                return_inverse=True, return_counts=True,
            )
            _, rt_inv, rt_count = np.unique(
                tri[:, 2] + n_ent * tri[:, 1],
                return_inverse=True, return_counts=True,
            )
            self._weights = np.sqrt(
                1.0 / (hr_count[hr_inv] + rt_count[rt_inv] + weight_smoothing)
            ).astype(np.float32)

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        """Steps per nominal epoch (matches
        :class:`RandomShardedBatchSampler.__len__`)."""
        return int(
            np.ceil(self._counts.max() / self.partition_sample_size)
        )

    def state(self) -> Dict[str, jnp.ndarray]:
        """Device-resident sampling state, passed into the jitted step (so
        the triple array is a runtime buffer, not a baked-in HLO constant).
        Replicate it over the mesh (``P()`` spec).

        Triples are stored as ONE 1-D triple-major column (``h, r, t`` of
        triple 0, then triple 1, ...): a 2-D ``(n, 3)`` int32 array would
        get its minor dim lane-padded 3 → 128 by the TPU tiled layout (42x
        the HBM), while three separate columns cost three gather loops per
        draw where the interleave needs one.
        """
        st = {
            # Triple-major interleave [h0, r0, t0, h1, r1, t1, ...]: a run
            # of ppp triples is ONE contiguous 3*ppp slice, so the whole
            # positive draw is a single batched-slice gather (one serial
            # DMA loop) instead of three — the 3-column layout spent ~12%
            # of the biokg step in three gather loops (round-4 trace).
            "hrt": jnp.asarray(self._triples.reshape(-1)),
        }
        if self._weights is not None:
            st["weights"] = jnp.asarray(self._weights)
        if self._negative_kind == "type":
            ns = self.negative_sampler
            # 1-D pair-major [(h_type0, t_type0), ...]: a 2-D (n, 2) int32
            # array would get its minor dim lane-padded 2 -> 128 by the TPU
            # tiled layout — 64x the HBM at wikikg2 scale.
            st["triple_types"] = jnp.asarray(
                np.asarray(ns.triple_types, np.int32).reshape(-1)
            )
            st["type_counts"] = jnp.asarray(
                np.asarray(ns.type_counts, np.int32)
            )
            st["type_offsets"] = jnp.asarray(
                np.asarray(ns.type_offsets, np.int32)
            )
        return st

    def next_key(self, step: int) -> jax.Array:
        """Deterministic per-step PRNG key (host side, tiny)."""
        return jax.random.fold_in(jax.random.PRNGKey(self.seed), step)

    # ------------------------------------------------------------------
    def sample(
        self, state: Dict[str, jnp.ndarray], key: jax.Array
    ) -> Dict[str, jnp.ndarray]:
        """Traced: draw one step's batch in the global host layout.

        Under ``shard_map`` call with the *replicated* key and slice the
        result per shard (:meth:`slice_local`); draws are identical on every
        device, so the blocks are mutually consistent.
        """
        bps, S, ppp = (
            self.batches_per_step,
            self.n_shard,
            self.positive_per_partition,
        )
        k_pos, k_neg = jax.random.split(key)

        if self.triple_partition_mode == "ht_shardpair":
            shape = (bps, S, S, ppp)
        else:
            shape = (bps, S, ppp)

        if self.positive_mode == "runs":
            # One uniform run start per (micro-batch, partition); the run is
            # a contiguous dynamic_slice — a single DMA per column instead
            # of ppp latency-bound row gathers.
            counts = jnp.asarray(self._counts, jnp.float32)
            offsets = jnp.asarray(self._offsets, jnp.int32)
            u = jax.random.uniform(k_pos, (bps, *counts.shape))
            starts = offsets + (u * (counts - ppp + 1)).astype(jnp.int32)
            sample_idx = starts[..., None] + jnp.arange(ppp, dtype=jnp.int32)
            flat = (3 * starts).reshape(-1, 1)  # (bps*S*S, 1) run starts
            # ONE batched-slice gather for all three columns: in the
            # triple-major interleave a run of ppp triples is a contiguous
            # 3*ppp slice (the vector form of one dynamic_slice per run).
            # Unlike a Python-unrolled slab loop the program size is flat
            # in bps and S (compile time stays constant at pod-slice shard
            # counts); unlike an element gather each run is one DMA.
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,),
            )
            runs = jax.lax.gather(
                state["hrt"], flat, dn, (3 * ppp,),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            ).reshape(*shape, 3)
            head = runs[..., 0]
            relation = runs[..., 1]
            tail = runs[..., 2]
        else:
            counts = jnp.asarray(self._counts, jnp.float32)[None, ..., None]
            offsets = jnp.asarray(self._offsets, jnp.int32)[None, ..., None]
            u = jax.random.uniform(k_pos, shape)
            # (u * count) floor is uniform over [0, count) up to 2^-24 bias —
            # negligible at real partition sizes, and avoids per-element-bound
            # randint (unsupported) or a modulo (biased at large counts).
            sample_idx = offsets + (u * counts).astype(jnp.int32)
            # One 3-element contiguous slice per triple (vs three separate
            # single-element gathers in a columnar layout).
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,),
            )
            trip = jax.lax.gather(
                state["hrt"], (3 * sample_idx).reshape(-1, 1), dn, (3,),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            ).reshape(*shape, 3)
            head = trip[..., 0]
            relation = trip[..., 1]
            tail = trip[..., 2]
        if self.triple_partition_mode == "ht_shardpair":
            # Pre-transpose tails (shard_h <-> shard_t) for the AllToAll.
            tail = jnp.swapaxes(tail, 1, 2)

        batch = {
            "head": head,
            "relation": relation,
            "tail": tail,
            "negative": self._sample_negatives(state, k_neg, sample_idx),
        }
        if self.dummy in ("head", "tail"):
            batch.pop(self.dummy)
        if self._weights is not None:
            w = jnp.take(state["weights"], sample_idx, axis=0).reshape(
                bps, S, -1
            )
            w = w / w.sum(axis=-1, keepdims=True) * self.shard_bs
            batch["triple_weight"] = w
        return batch

    def _sample_negatives(self, state, key, sample_idx):
        ns = self.negative_sampler
        bps, S = self.batches_per_step, self.n_shard
        shard_bs = sample_idx.shape[-1] * (
            S if sample_idx.ndim == 4 else 1
        )
        if getattr(ns, "flat_negative_format", False):
            b = 2 if ns.corruption_scheme == "ht" else 1
        else:
            b = shard_bs
        shape = (bps, S, S, b, ns.n_negative)
        u = jax.random.uniform(key, shape)
        shard_counts = jnp.asarray(self._shard_counts, jnp.float32)[
            None, :, None, None, None
        ]
        draws = (u * shard_counts).astype(jnp.int32)
        if self._negative_kind == "random":
            return draws

        # Type-based: remap each source shard's draw into the local range of
        # the consumer triple's corrupted-entity type (reference
        # ``besskge/negative_sampler.py`` TypeBased; host twin
        # ``negative_sampler.py:164-202``).
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,),
        )
        types = jax.lax.gather(
            state["triple_types"], (2 * sample_idx).reshape(-1, 1), dn, (2,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(*sample_idx.shape, 2)
        head_type, tail_type = types[..., 0], types[..., 1]
        if ns.corruption_scheme == "h":
            corrupt = head_type
        elif ns.corruption_scheme == "t":
            corrupt = tail_type
        else:  # "ht": first half of each partition corrupts heads
            cut = sample_idx.shape[-1] // 2
            corrupt = jnp.concatenate(
                [head_type[..., :cut], tail_type[..., cut:]], axis=-1
            )
        flat = corrupt.reshape(bps, S, shard_bs)
        if ns.local_sampling:
            rel_type = jnp.broadcast_to(
                flat[:, :, None, :], (bps, S, S, shard_bs)
            )
        else:
            rel_type = jnp.broadcast_to(
                flat[:, None, :, :], (bps, S, S, shard_bs)
            )
        src = jnp.arange(S, dtype=jnp.int32)[None, :, None, None]
        t_counts = state["type_counts"][src, rel_type][..., None]
        t_offsets = state["type_offsets"][src, rel_type][..., None]
        return (
            (u * t_counts.astype(jnp.float32)).astype(jnp.int32) + t_offsets
        )

    # ------------------------------------------------------------------
    def slice_local(
        self, batch: Dict[str, jnp.ndarray], shard: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """Traced: extract shard ``shard``'s (bps, 1, ...) block of a global
        batch — the layout ``shard_map`` hands the device code."""
        return {
            k: jax.lax.dynamic_slice_in_dim(v, shard, 1, axis=1)
            for k, v in batch.items()
        }
