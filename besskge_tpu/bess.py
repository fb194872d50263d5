"""BESS distribution core: device programs for distributed KGE (JAX).

Capability parity with reference ``besskge/bess.py:34-1062``
(graphcore-research/bess-kge), re-designed for the TPU execution model:

* Each module's :meth:`forward` is *device code*: a pure function over the
  device-local blocks of the batch and the local entity-table shard, meant to
  run inside ``jax.shard_map`` over the 1-D ``("shard",)`` mesh (or plain
  ``jit`` with ``axis_name=None`` for the single-chip degenerate path).
* The reference's GCL custom-op collectives (``bess.py:14-19``) become
  ``jax.lax.all_to_all`` / ``jax.lax.all_gather`` over ICI; their autodiff
  transposes route entity-gradient cotangents back to the home shard, so the
  entity-table gradient never crosses devices — the built-in equivalent of
  the reference's C++ ``RemoveAllReducePattern`` plugin.
* :func:`build_bess_forward` wraps a module into one jitted
  ``(params, batch) -> outputs`` step with `bps` micro-batches handled by an
  on-device ``lax.scan`` (the analog of poptorch ``deviceIterations``).

Batch layout contract (host side, produced by
:mod:`besskge_tpu.batch_sampler`): every array is ``(bps, shard, ...)`` with
axis 1 mapped to the mesh axis; per-device micro-batch blocks are exactly the
reference's shapes (``bess.py:140-160``):

* ``head``/``relation``/``tail``: (n_shard, positive_per_partition) —
  local IDs, tails pre-transposed for the AllToAll;
* ``negative``: (n_shard, B, n_negative) local IDs on this (source) shard,
  destination-major;
* ``negative_mask``: (B, n_shard, pad) — processing-device layout;
* ``triple_mask``: (n_shard, positive_per_partition);
* ``triple_weight``: (shard_bs,) or scalar.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from besskge_tpu.loss import BaseLossFunction
from besskge_tpu.metric import Evaluation
from besskge_tpu.negative_sampler import (
    PlaceholderNegativeSampler,
    ShardedNegativeSampler,
    TripleBasedShardedNegativeSampler,
)
from besskge_tpu.ops.distance import (
    l1_scores_chunkmax as ops_l1_scores_chunkmax,
)
from besskge_tpu.parallel.mesh import AXIS, batch_partition_specs, param_partition_specs
from besskge_tpu.scoring import (
    BaseScoreFunction,
    DistanceBasedScoreFunction,
)
from besskge_tpu.packed import is_packed as pk_is_packed
from besskge_tpu.packed import is_paired as pk_is_paired
from besskge_tpu.packed import is_trebled as pk_is_trebled
from besskge_tpu.packed import is_quintupled as pk_is_quintupled
from besskge_tpu.packed import is_tripled as pk_is_tripled
from besskge_tpu.packed import take_contiguous_rows, take_rows


def _cast_gathered(emb, cd):
    """Cast GATHERED rows to the compute dtype without letting XLA hoist the
    convert above the gather: ``convert(gather(t))`` is otherwise rewritten
    to ``gather(convert(t))``, which materializes a full low-precision copy
    of the table per call AND takes the ~5x-slower sub-512B-row gather path
    (measured 12 GB/s vs 61 GB/s on the 500-candidate eval block). The
    barrier pins the gather to the table's storage dtype."""
    if cd is None or emb.dtype == cd:
        return emb
    return jax.lax.optimization_barrier(emb).astype(cd)

from besskge_tpu.utils import gather_indices

__all__ = [
    "BAD_NEGATIVE_SCORE",
    "BessKGE",
    "EmbeddingMovingBessKGE",
    "ScoreMovingBessKGE",
    "TopKQueryBessKGE",
    "AllScoresBESS",
    "build_bess_forward",
    "build_topk_forward",
    "build_allscores_forward",
]

#: Sentinel added to masked-out negative scores (reference ``bess.py:31``).
BAD_NEGATIVE_SCORE = -50000.0


class BessKGE(ABC):
    """Base class for BESS distribution modules.

    To be used with an ``"ht_shardpair"``-partitioned triple set. See
    reference ``besskge/bess.py:34-305`` for the contract being mirrored.

    :param negative_sampler: sharded negative sampler (defines layouts).
    :param score_fn: scoring function (owns table shapes).
    :param loss_fn: loss, required for training.
    :param evaluation: on-device metrics module.
    :param return_scores: return positive/negative scores to host.
    :param augment_negative: use in-batch heads/tails as extra negatives.
    :param axis_name: mesh axis for collectives; ``None`` = single device
        (all collectives become identities; requires ``n_shard == 1``).
    """

    def __init__(
        self,
        negative_sampler: ShardedNegativeSampler,
        score_fn: BaseScoreFunction,
        loss_fn: Optional[BaseLossFunction] = None,
        evaluation: Optional[Evaluation] = None,
        return_scores: bool = False,
        augment_negative: bool = False,
        axis_name: Optional[str] = AXIS,
    ) -> None:
        self.sharding = score_fn.sharding
        self.negative_sampler = negative_sampler
        self.score_fn = score_fn
        self.loss_fn = loss_fn
        self.evaluation = evaluation
        self.return_scores = return_scores
        self.augment_negative = augment_negative
        self.axis_name = axis_name
        if not (loss_fn or evaluation or return_scores):
            raise ValueError(
                "Nothing to return. At least one of loss_fn, evaluation or"
                " return_scores needs to be != None"
            )
        if augment_negative:
            if not score_fn.negative_sample_sharing:
                raise ValueError(
                    "Negative augmentation requires negative sample sharing"
                )
            if isinstance(self, ScoreMovingBessKGE):
                raise ValueError(
                    "ScoreMovingBessKGE does not support negative augmentation"
                )
        if negative_sampler.flat_negative_format:
            if not score_fn.negative_sample_sharing:
                raise ValueError(
                    "Using flat negative format requires negative sample sharing"
                )
        elif score_fn.negative_sample_sharing and isinstance(
            negative_sampler, TripleBasedShardedNegativeSampler
        ):
            raise ValueError(
                "Negative sample sharing cannot be used with non-flat"
                " triple-specific negatives"
            )
        if axis_name is None and self.sharding.n_shard != 1:
            raise ValueError("axis_name=None requires n_shard == 1")
        # Let the score function reach mesh collectives (e.g. ConvE SyncBN).
        score_fn.mesh_axis = axis_name
        self.entity_embedding_size: int = score_fn.entity_row_size

    # ------------------------------------------------------------------
    # Collectives (identities on the single-device path).
    def _all_to_all(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.axis_name is None:
            return x
        return jax.lax.all_to_all(
            x, self.axis_name, split_axis=0, concat_axis=0, tiled=True
        )

    def _all_gather(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.axis_name is None:
            return x[None]
        return jax.lax.all_gather(x, self.axis_name, axis=0, tiled=False)

    def psum(self, x: Any) -> Any:
        """Sum a (pytree of) per-device value(s) over the mesh axis."""
        if self.axis_name is None:
            return x
        return jax.lax.psum(x, self.axis_name)

    @property
    def n_embedding_parameters(self) -> int:
        """Trainable parameters in the (global) embedding tables."""
        sh = self.score_fn.sharding
        n_rel = self.score_fn.n_relation_type * (
            2 if self.score_fn.inverse_relations else 1
        )
        return int(
            sh.n_shard * sh.max_entity_per_shard * self.score_fn.entity_row_size
            + n_rel * self.score_fn.relation_row_size
        )

    # ------------------------------------------------------------------
    def forward(
        self,
        params: Dict[str, Any],
        head: jnp.ndarray,
        relation: jnp.ndarray,
        tail: jnp.ndarray,
        negative: jnp.ndarray,
        triple_mask: Optional[jnp.ndarray] = None,
        triple_weight: Optional[jnp.ndarray] = None,
        negative_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        gathered_emb: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """One device's forward for one micro-batch: gather → collectives →
        score → loss/metrics (reference ``bess.py:117-276``).

        ``params["entity_embedding"]`` must be the LOCAL 2-D table shard
        ``(max_entity_per_shard, row)``. The returned ``loss`` is the
        device-local (unreduced) value — callers ``psum`` it.
        ``gathered_emb`` optionally supplies the pre-gathered entity rows
        (see :meth:`EmbeddingMovingBessKGE.gather_plan`).
        """
        if triple_weight is None:
            triple_weight = jnp.asarray(1.0, jnp.float32)

        positive_score, negative_score = self.score_batch(
            params, head, relation, tail, negative, train=train, rng=rng,
            gathered_emb=gathered_emb,
        )
        n_shard, ppp = relation.shape
        bs = n_shard * ppp

        mask_flat = None
        if negative_mask is not None:
            # (B, n_shard_src, pad) -> (B, n_shard_src * pad)
            mask_flat = negative_mask.reshape(negative_mask.shape[0], -1)
            if (
                self.negative_sampler.flat_negative_format
                and self.negative_sampler.corruption_scheme == "ht"
            ):
                cut = ppp // 2
                width = mask_flat.shape[-1]
                mask_h = jnp.broadcast_to(
                    mask_flat[0][None, None, :], (n_shard, cut, width)
                )
                mask_t = jnp.broadcast_to(
                    mask_flat[1][None, None, :], (n_shard, ppp - cut, width)
                )
                mask_flat = jnp.concatenate([mask_h, mask_t], axis=1).reshape(
                    bs, width
                )

        if self.augment_negative:
            # Kill the score of each triple's own true head/tail, which was
            # prepended to the candidate pool (reference ``bess.py:207-238``).
            n_col = negative_score.shape[1]
            cols = jnp.arange(n_col, dtype=jnp.int32)[None, :]
            rows = jnp.arange(bs, dtype=jnp.int32)
            if self.negative_sampler.flat_negative_format:
                if self.negative_sampler.corruption_scheme == "ht":
                    cut = ppp // 2
                    s_idx, p_idx = rows // ppp, rows % ppp
                    target = s_idx * cut + p_idx % cut
                else:
                    target = rows
            else:
                step = 1 + negative.shape[0] * negative.shape[2]
                target = rows * step
            aug_mask = cols == target[:, None]
            if mask_flat is not None:
                width = mask_flat.shape[-1]
                aug_mask = jnp.concatenate(
                    [aug_mask[:, : n_col - width], ~mask_flat], axis=1
                )
            negative_score = negative_score + BAD_NEGATIVE_SCORE * aug_mask.astype(
                negative_score.dtype
            )
        elif mask_flat is not None:
            negative_score = negative_score + BAD_NEGATIVE_SCORE * (
                ~mask_flat
            ).astype(negative_score.dtype)

        out: Dict[str, jnp.ndarray] = {}
        if self.return_scores:
            out["positive_score"] = positive_score
            out["negative_score"] = negative_score
        if self.loss_fn is not None:
            out["loss"] = self.loss_fn(
                positive_score.astype(jnp.float32),
                negative_score.astype(jnp.float32),
                jnp.asarray(triple_weight, jnp.float32),
            )
        if self.evaluation is not None:
            t_mask = triple_mask.reshape(-1) if triple_mask is not None else None
            ranks = jax.lax.stop_gradient(
                self.evaluation.ranks_from_scores(positive_score, negative_score)
            )
            if self.evaluation.return_ranks:
                out["ranks"] = ranks
            out["metrics"] = self.evaluation.stacked_metrics_from_ranks(
                ranks, t_mask
            )
        return out

    @abstractmethod
    def score_batch(
        self,
        params: Dict[str, Any],
        head: jnp.ndarray,
        relation: jnp.ndarray,
        tail: jnp.ndarray,
        negative: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        gathered_emb: Optional[jnp.ndarray] = None,
    ):
        """Positive (bs,) and negative (bs, n_neg_total) scores for the
        micro-batch."""
        raise NotImplementedError

    def gather_plan(
        self, head: jnp.ndarray, tail: jnp.ndarray, negative: jnp.ndarray
    ) -> jnp.ndarray:
        """Local row indices gathered by :meth:`score_batch`, shape (S, G)."""
        return jnp.concatenate(
            [head, tail, negative.reshape(negative.shape[0], -1)], axis=1
        )


class EmbeddingMovingBessKGE(BessKGE):
    """Score negatives on the head (processing) shard: one fused local gather
    of [head | tail | negative] rows, one AllToAll moving tail + negative
    embeddings (reference ``besskge/bess.py:308-468``).

    Preferred for training: per step, exactly one collective whose payload is
    ``shard_bs + B·n_negative`` embedding rows per shard pair.
    """

    def score_batch(self, params, head, relation, tail, negative, train=False,
                    rng=None, gathered_emb=None):
        table = params["entity_embedding"]
        n_shard, ppp = relation.shape
        bs = n_shard * ppp
        d = self.entity_embedding_size
        scheme = self.negative_sampler.corruption_scheme
        flat = self.negative_sampler.flat_negative_format
        b_neg, n_neg = negative.shape[1], negative.shape[2]

        # Fused gather from the local shard (device hot loop #1).
        if gathered_emb is None:
            gathered_emb = take_rows(
                table,
                self.gather_plan(head, tail, negative),
                n_logical=self.sharding.max_entity_per_shard,
            )
        gathered_emb = _cast_gathered(
            gathered_emb, self.score_fn.compute_dtype
        )
        emb = gathered_emb
        head_emb = emb[:, :ppp]
        tail_and_neg = emb[:, ppp:]

        # Single AllToAll over the shard axis (device hot loop #2, ICI).
        if self.negative_sampler.local_sampling:
            tail_emb = self._all_to_all(tail_and_neg[:, :ppp])
            neg_emb = tail_and_neg[:, ppp:]
        else:
            moved = self._all_to_all(tail_and_neg)
            tail_emb = moved[:, :ppp]
            neg_emb = moved[:, ppp:]
        # (S, B, n_neg, d) -> (B, S * n_neg, d): source-shard-major pool.
        neg_emb = (
            neg_emb.reshape(n_shard, b_neg, n_neg, d)
            .transpose(1, 0, 2, 3)
            .reshape(b_neg, n_shard * n_neg, d)
        )

        positive_score = self.score_fn.score_triple(
            params,
            head_emb.reshape(bs, d),
            relation.reshape(bs),
            tail_emb.reshape(bs, d),
            train=train,
            rng=rng,
        )

        if scheme == "h":
            if self.augment_negative:
                neg_emb = jnp.concatenate(
                    [head_emb.reshape(neg_emb.shape[0], -1, d), neg_emb], axis=1
                )
            negative_score = self.score_fn.score_heads(
                params,
                neg_emb,
                relation.reshape(bs),
                tail_emb.reshape(bs, d),
                train=train,
                rng=rng,
            )
        elif scheme == "t":
            if self.augment_negative:
                neg_emb = jnp.concatenate(
                    [tail_emb.reshape(neg_emb.shape[0], -1, d), neg_emb], axis=1
                )
            negative_score = self.score_fn.score_tails(
                params,
                head_emb.reshape(bs, d),
                relation.reshape(bs),
                neg_emb,
                train=train,
                rng=rng,
            )
        elif scheme == "ht":
            # First half of each partition: head-corrupted; second: tail-
            # corrupted (reference ``bess.py:400-466``).
            cut = ppp // 2
            rel1 = relation[:, :cut].reshape(-1)
            rel2 = relation[:, cut:].reshape(-1)
            h1, h2 = head_emb[:, :cut], head_emb[:, cut:]
            t1, t2 = tail_emb[:, :cut], tail_emb[:, cut:]
            if flat:
                neg_h, neg_t = neg_emb[0:1], neg_emb[1:2]
            else:
                ne = neg_emb.reshape(n_shard, ppp, -1, d)
                neg_h = ne[:, :cut].reshape(n_shard * cut, -1, d)
                neg_t = ne[:, cut:].reshape(n_shard * (ppp - cut), -1, d)
            if self.augment_negative:
                neg_h = jnp.concatenate(
                    [h1.reshape(neg_h.shape[0], -1, d), neg_h], axis=1
                )
                neg_t = jnp.concatenate(
                    [t2.reshape(neg_t.shape[0], -1, d), neg_t], axis=1
                )
            ns_h = self.score_fn.score_heads(
                params, neg_h, rel1, t1.reshape(-1, d), train=train, rng=rng
            )
            ns_t = self.score_fn.score_tails(
                params, h2.reshape(-1, d), rel2, neg_t, train=train, rng=rng
            )
            negative_score = jnp.concatenate(
                [
                    ns_h.reshape(n_shard, cut, -1),
                    ns_t.reshape(n_shard, ppp - cut, -1),
                ],
                axis=1,
            ).reshape(bs, -1)
        else:
            raise ValueError(f"Unsupported corruption scheme {scheme}")

        return positive_score, negative_score


class ScoreMovingBessKGE(BessKGE):
    """Score negatives on the shard that stores them: queries are replicated
    with AllGathers, each shard scores its local negatives against all
    queries, and an AllToAll returns the scores
    (reference ``besskge/bess.py:471-603``).

    Cheaper than embedding-moving when negatives are many or rows wide
    (scores are smaller than embeddings). No local sampling / augmentation.

    Positive scores are computed WITHOUT the reference's trailing tail
    AllToAll (its own ``#TODO: avoidable?``, reference ``bess.py:594-601``):
    when the corruption scheme AllGathers tail embeddings ("h", and the
    head-corrupted half of "ht"), this device's own tails are already present
    in the gathered tensor, so positives are scored locally for free; when it
    does not ("t", and the tail-corrupted half of "ht"), positives are scored
    on the tail's home shard — which holds the gathered head embeddings — and
    ride back to the query device as ONE extra column of the existing score
    AllToAll. Net: one collective fewer per step, and the extra column
    (bs × n_shard values) is a factor d/n_shard smaller than the tail-row
    AllToAll it replaces.
    """

    def score_batch(self, params, head, relation, tail, negative, train=False,
                    rng=None, gathered_emb=None):
        table = params["entity_embedding"]
        n_shard, ppp = relation.shape
        bs = n_shard * ppp
        d = self.entity_embedding_size
        scheme = self.negative_sampler.corruption_scheme
        flat = self.negative_sampler.flat_negative_format
        b_neg, n_neg = negative.shape[1], negative.shape[2]

        if gathered_emb is None:
            gathered_emb = take_rows(
                table,
                self.gather_plan(head, tail, negative),
                n_logical=self.sharding.max_entity_per_shard,
            )
        gathered_emb = _cast_gathered(
            gathered_emb, self.score_fn.compute_dtype
        )
        emb = gathered_emb
        head_emb = emb[:, :ppp]
        tail_emb = emb[:, ppp : 2 * ppp]
        neg_emb = emb[:, 2 * ppp :].reshape(n_shard, b_neg, n_neg, d)
        if (
            isinstance(self.negative_sampler, TripleBasedShardedNegativeSampler)
            and flat
        ):
            # Candidate sets are replicated along the destination axis;
            # score one copy only.
            neg_emb = neg_emb[0:1]

        relation_all = self._all_gather(relation)  # (S_q, S, ppp)
        my = (
            jax.lax.axis_index(self.axis_name)
            if self.axis_name is not None
            else jnp.asarray(0, jnp.int32)
        )

        # Positive scores, without a dedicated collective (see class docs):
        # pos_local — scored on this (query) device from the AllGathered
        # tails; pos_col — (S_dest, bs, 1) column of home-shard-scored
        # positives that rides the score AllToAll.
        pos_local = None
        pos_col = None

        def _home_pos_column(pos_home, col_offset, col_width):
            """Pack home-shard positive scores (S_dest, col_width) into the
            (S_dest, bs, 1) ride-along column at this device's block."""
            col = jnp.zeros((n_shard, bs, 1), pos_home.dtype)
            return jax.lax.dynamic_update_slice(
                col,
                pos_home.reshape(n_shard, col_width, 1),
                (0, my * ppp + col_offset, 0),
            )

        if scheme == "h":
            # Tails are host-pre-transposed; gathered axis is the tail's home
            # shard -> swap to (query_shard, home_shard, ...) order.
            tail_all = jnp.swapaxes(self._all_gather(tail_emb), 0, 1)
            negative_score = self.score_fn.score_heads(
                params,
                neg_emb.reshape(-1, n_neg, d),
                relation_all.reshape(-1),
                tail_all.reshape(-1, d),
                train=train,
                rng=rng,
            )
            # This device's own tails sit at row `my` of the gathered tensor.
            my_tails = jax.lax.dynamic_index_in_dim(
                tail_all, my, 0, keepdims=False
            )  # (S_home, ppp, d)
            pos_local = self.score_fn.score_triple(
                params,
                head_emb.reshape(bs, d),
                relation.reshape(bs),
                my_tails.reshape(bs, d),
                train=train,
                rng=rng,
            )
        elif scheme == "t":
            head_all = self._all_gather(head_emb)  # (S_q, S_home, ppp, d)
            negative_score = self.score_fn.score_tails(
                params,
                head_all.reshape(-1, d),
                relation_all.reshape(-1),
                neg_emb.reshape(-1, n_neg, d),
                train=train,
                rng=rng,
            )
            # Tails of every query device's block `my` live here; their heads
            # and relations arrived with the AllGathers used above.
            heads_here = jax.lax.dynamic_index_in_dim(
                head_all, my, 1, keepdims=False
            )  # (S_q, ppp, d)
            rel_here = jax.lax.dynamic_index_in_dim(
                relation_all, my, 1, keepdims=False
            )  # (S_q, ppp)
            pos_home = self.score_fn.score_triple(
                params,
                heads_here.reshape(bs, d),
                rel_here.reshape(bs),
                tail_emb.reshape(bs, d),
                train=train,
                rng=rng,
            )
            pos_col = _home_pos_column(pos_home.reshape(n_shard, ppp), 0, ppp)
        elif scheme == "ht":
            cut = ppp // 2
            rel1 = relation_all[:, :, :cut].reshape(-1)
            rel2 = relation_all[:, :, cut:].reshape(-1)
            tail_all = jnp.swapaxes(
                self._all_gather(tail_emb[:, :cut]), 0, 1
            )  # (S_q, S_home, cut, d)
            head_all = self._all_gather(head_emb[:, cut:])  # (S_q, S_home, ., d)
            if flat:
                neg_h = neg_emb[:, 0]
                neg_t = neg_emb[:, 1]
            else:
                ne = neg_emb.reshape(n_shard, n_shard, ppp, n_neg, d)
                neg_h = ne[:, :, :cut].reshape(-1, n_neg, d)
                neg_t = ne[:, :, cut:].reshape(-1, n_neg, d)
            ns_h = self.score_fn.score_heads(
                params, neg_h, rel1, tail_all.reshape(-1, d), train=train, rng=rng
            )
            ns_t = self.score_fn.score_tails(
                params, head_all.reshape(-1, d), rel2, neg_t, train=train, rng=rng
            )
            negative_score = jnp.concatenate(
                [
                    ns_h.reshape(n_shard, n_shard, cut, -1),
                    ns_t.reshape(n_shard, n_shard, ppp - cut, -1),
                ],
                axis=2,
            ).reshape(n_shard * bs, -1)
            # Head-corrupted half: own tails are in the gathered tensor.
            my_tails = jax.lax.dynamic_index_in_dim(
                tail_all, my, 0, keepdims=False
            )  # (S_home, cut, d)
            pos_local = self.score_fn.score_triple(
                params,
                head_emb[:, :cut].reshape(-1, d),
                relation[:, :cut].reshape(-1),
                my_tails.reshape(-1, d),
                train=train,
                rng=rng,
            ).reshape(n_shard, cut)
            # Tail-corrupted half: scored here (tails' home), shipped back.
            heads_here = jax.lax.dynamic_index_in_dim(
                head_all, my, 1, keepdims=False
            )  # (S_q, ppp - cut, d)
            rel_here = jax.lax.dynamic_index_in_dim(
                relation_all, my, 1, keepdims=False
            )[:, cut:]
            pos_home = self.score_fn.score_triple(
                params,
                heads_here.reshape(-1, d),
                rel_here.reshape(-1),
                tail_emb[:, cut:].reshape(-1, d),
                train=train,
                rng=rng,
            )
            pos_col = _home_pos_column(
                pos_home.reshape(n_shard, ppp - cut), cut, ppp - cut
            )
        else:
            raise ValueError(f"Unsupported corruption scheme {scheme}")

        # Return scores to the query's device (source-shard-major columns),
        # with the home-scored positives as a trailing ride-along column.
        negative_score = negative_score.reshape(n_shard, bs, -1)
        if pos_col is not None:
            negative_score = jnp.concatenate(
                [negative_score, pos_col.astype(negative_score.dtype)], axis=2
            )
        negative_score = self._all_to_all(negative_score)
        negative_score = jnp.swapaxes(negative_score, 0, 1)  # (bs, S_src, .)
        if pos_col is not None:
            # Each row's column is zero except at its tail's home shard.
            pos_recv = negative_score[..., -1].sum(axis=1)  # (bs,)
            negative_score = negative_score[..., :-1]
        negative_score = negative_score.reshape(bs, -1)

        if scheme == "h":
            positive_score = pos_local
        elif scheme == "t":
            positive_score = pos_recv
        else:  # "ht": local head-half + received tail-half
            positive_score = jnp.concatenate(
                [
                    pos_local,
                    pos_recv.reshape(n_shard, ppp)[:, cut:].astype(
                        pos_local.dtype
                    ),
                ],
                axis=1,
            ).reshape(bs)
        return positive_score, negative_score


class TopKQueryBessKGE:
    """Distributed top-k completion of (h, r, ?) / (?, r, t) queries against
    all entities or candidate sets (reference ``besskge/bess.py:606-921``).

    Use with an ``"h_shard"``/``"t_shard"``-partitioned triple set. Queries
    are replicated via AllGather; each shard streams a sliding window over
    its local entities in an on-device ``lax.fori_loop`` — the reference's
    ``poptorch.for_loop`` — keeping a running top-(k+1) merge, then one
    AllToAll returns the per-shard bests. Inference only.

    :param k: number of completions to return per query.
    :param candidate_sampler: :class:`PlaceholderNegativeSampler` to score
        against every entity, or a :class:`TripleBasedShardedNegativeSampler`
        with ``mask_on_gather=True`` for candidate sets.
    :param score_fn: scoring function.
    :param evaluation: optional on-device metrics (needs ground truth).
    :param return_scores: return the top-k scores too.
    :param window_size: entities scored per query per loop iteration, or
        ``None`` (default) to auto-size to ``min(32768, local rows)`` rounded
        down to a 128-multiple. Large windows amortize the per-iteration
        merge and keep the MXU matmuls big: on a v5e chip at YAGO scale
        (123k entities, 512 queries, ComplEx 2x128) the sort merge peaks
        ~9 ms/batch near window 4000, while the chunk merge keeps improving
        to 5.2 ms at 32768 — ``benchmarks/bench_topk.py`` sweeps it. The
        reference default is effectively 500 on IPU SRAM
        (``besskge/bess.py:640``).
    :param merge_mode: how the per-window top-(k+1) merge is computed.
        ``"sort"`` runs ``lax.top_k`` over the full ``window + k + 1``
        concatenation (the reference's ``torch.topk`` merge,
        ``besskge/bess.py:811-822``). ``"chunk"`` is an exact hierarchical
        merge: reduce the window to 128-wide chunk maxima (one VPU pass that
        fuses into the scoring epilogue), pick the top-(k+1) chunks, and
        sort only those — any true top-(k+1) element's chunk max bounds it
        from above, so if its chunk were not selected, k+1 chunks each hold
        a strictly better element and it could not be top-(k+1). Cuts the
        sorted width from ``window`` to ``128·(k+1)`` (sorting dominates the
        window loop: the scoring roofline at wikikg2-scale vs-all is ~6 ms
        of a measured 125 ms/batch). ``"auto"`` (default) picks ``"chunk"``
        whenever the window is 128-divisible and wider than ``128·(k+1)``.
        Tied scores may resolve to different (equally ranked) entity IDs
        than ``"sort"``.
    :param axis_name: see :class:`BessKGE`.
    """

    def __init__(
        self,
        k: int,
        candidate_sampler: ShardedNegativeSampler,
        score_fn: BaseScoreFunction,
        evaluation: Optional[Evaluation] = None,
        return_scores: bool = False,
        window_size: Optional[int] = None,
        merge_mode: str = "auto",
        axis_name: Optional[str] = AXIS,
    ) -> None:
        self.sharding = score_fn.sharding
        self.negative_sampler = candidate_sampler
        self.score_fn = score_fn
        self.evaluation = evaluation
        self.return_scores = return_scores
        self.k = k
        if window_size is None:
            rows = score_fn.sharding.max_entity_per_shard
            # Pure-cdist L1 models take the fused Pallas window path
            # (scores + mask + chunk-max in one kernel pass): its per-window
            # overhead is lower, so much larger windows keep paying —
            # measured at wikikg2 vs-all (512q x 2.5M, TransE-L1 d=128):
            # 32k -> 159 ms/batch, 128k -> 148 ms. MXU-formable scorers
            # peak at 32k (benchmarks/bench_topk.py).
            fused_l1 = (
                getattr(score_fn, "scoring_norm", None) == 1
                and score_fn.negative_sample_sharing
                and type(score_fn).distance_query_vector
                is not DistanceBasedScoreFunction.distance_query_vector
            )
            cap = 131072 if fused_l1 else 32768
            window_size = max(min(cap, rows) // 128 * 128, min(rows, 128))
        self.window_size = window_size
        if merge_mode not in ("auto", "sort", "chunk"):
            raise ValueError(f"Unknown merge_mode {merge_mode!r}")
        self.merge_mode = merge_mode
        self.axis_name = axis_name
        if candidate_sampler.flat_negative_format:
            if not score_fn.negative_sample_sharing:
                raise ValueError(
                    "Using flat negative format requires negative sample sharing"
                )
        elif score_fn.negative_sample_sharing:
            raise ValueError(
                "Negative sample sharing cannot be used with non-flat"
                " triple-specific negatives"
            )
        if candidate_sampler.corruption_scheme not in ("h", "t"):
            raise ValueError(
                "TopKQueryBessKGE only supports 'h', 't' corruption scheme"
            )
        if isinstance(candidate_sampler, TripleBasedShardedNegativeSampler):
            if not candidate_sampler.mask_on_gather:
                raise ValueError(
                    "TopKQueryBessKGE requires mask_on_gather=True in the"
                    " candidate_sampler"
                )
        if axis_name is None and self.sharding.n_shard != 1:
            raise ValueError("axis_name=None requires n_shard == 1")
        self.entity_embedding_size = score_fn.entity_row_size
        self.loss_fn = None  # uniform interface for _out_specs

    _all_to_all = BessKGE._all_to_all
    _all_gather = BessKGE._all_gather
    psum = BessKGE.psum

    def forward(
        self,
        params: Dict[str, Any],
        relation: jnp.ndarray,
        head: Optional[jnp.ndarray] = None,
        tail: Optional[jnp.ndarray] = None,
        negative: Optional[jnp.ndarray] = None,
        triple_mask: Optional[jnp.ndarray] = None,
        negative_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Device code for one micro-batch of queries.

        :param relation: (shard_bs,) relation IDs of this device's queries.
        :param head/tail: (shard_bs,) local IDs of the known entity (the
            other is the ground truth — global IDs — or absent).
        :param negative: (n_shard_dest, B, pad) local candidate IDs
            (gather-device layout), or None to use all local entities.
        :param negative_mask: (n_shard_dest, B, pad) validity mask.
        """
        table = params["entity_embedding"]
        sharding = self.sharding
        n_shard = sharding.n_shard
        shard_bs = relation.shape[0]
        n_best = self.k + 1
        scheme = self.negative_sampler.corruption_scheme

        if negative is None:
            candidate = jnp.arange(
                sharding.max_entity_per_shard, dtype=jnp.int32
            )[None, :]
            mask_rows = None
        else:
            if negative_mask is None:
                raise ValueError("Candidate sets require a negative_mask")
            if self.negative_sampler.flat_negative_format:
                negative = negative[0]
                negative_mask = negative_mask[0]
            candidate = negative.reshape(-1, negative.shape[-1])
            mask_rows = negative_mask.reshape(-1, negative_mask.shape[-1])
        n_candidate = candidate.shape[-1]
        # Candidate sets are usually far narrower than the vs-all auto
        # window (e.g. ~500 padded candidates vs 32768): clamp the
        # effective window to the candidate width so each loop iteration
        # gathers/scores only real candidates instead of mostly-masked rows.
        window_size = self.window_size
        if negative is not None:
            window_size = min(window_size, max(-(-n_candidate // 128) * 128, 1))

        relation_all = self._all_gather(relation).reshape(-1)
        if scheme == "h":
            known_emb_all = self._all_gather(
                take_rows(table, tail, n_logical=self.sharding.max_entity_per_shard)
            )
        else:
            known_emb_all = self._all_gather(
                take_rows(table, head, n_logical=self.sharding.max_entity_per_shard)
            )
        known_emb_all = known_emb_all.reshape(-1, self.entity_embedding_size)
        cd = self.score_fn.compute_dtype
        known_emb_all = _cast_gathered(known_emb_all, cd)

        # All-entities mode slides over CONTIGUOUS local rows: load each
        # window with one dynamic_slice DMA instead of window_size row
        # gathers (XLA row gathers are HBM-latency-bound). The final window
        # clamps its start so it stays in range; rows it re-reads from the
        # previous window are masked invalid (idx < i*W), so the top-k merge
        # never sees an entity twice.
        t_flat = table[0] if table.ndim == 3 else table
        packed_tab = pk_is_packed(t_flat)
        # logical row cap: packed tables back 2 logical rows per physical
        # row (2/3 per row for the triplet-major interleaved store);
        # pair-major interleaved tables (optimizer state interleaved,
        # see besskge_tpu.optim.interleave_momentum) back 1 per 2.
        if pk_is_tripled(t_flat, self.sharding.max_entity_per_shard):
            row_cap = 2 * (t_flat.shape[0] // 3)
        elif pk_is_quintupled(t_flat, self.sharding.max_entity_per_shard):
            row_cap = 2 * (t_flat.shape[0] // 5)
        elif packed_tab:
            row_cap = 2 * t_flat.shape[0]
        elif pk_is_paired(t_flat, self.sharding.max_entity_per_shard):
            row_cap = t_flat.shape[0] // 2
        elif pk_is_trebled(t_flat, self.sharding.max_entity_per_shard):
            row_cap = t_flat.shape[0] // 3
        else:
            row_cap = t_flat.shape[0]
        contiguous = (
            mask_rows is None
            and window_size <= row_cap
            and not (packed_tab and window_size % 2)
        )

        CHUNK = 128  # one vreg of lanes per chunk max
        n_chunk = window_size // CHUNK
        # Forced "chunk" still needs a 128-divisible window and more chunks
        # than n_best to be meaningful; degenerate cases use the plain sort.
        use_chunk_merge = (
            self.merge_mode in ("auto", "chunk")
            and window_size % CHUNK == 0
            and n_chunk > n_best
        )

        # Fused L1 window path: for pure-cdist L1 models (TransE/RotatE),
        # one Pallas pass per window computes scores + mask + chunk maxima
        # (besskge_tpu.ops.distance.l1_scores_chunkmax) — the window's
        # scores never round-trip HBM between scoring and the merge, and
        # the separate negate/mask/reduce dispatches disappear.
        fused_query = None
        if (
            use_chunk_merge
            and contiguous
            and self.score_fn.negative_sample_sharing
            and getattr(self.score_fn, "scoring_norm", None) == 1
        ):
            qv_fn = getattr(self.score_fn, "distance_query_vector", None)
            if qv_fn is not None:
                fused_query = qv_fn(
                    params, known_emb_all, relation_all, scheme
                )
                if fused_query is not None and cd is not None:
                    fused_query = fused_query.astype(cd)

        def loop_body(i, carry):
            curr_score, curr_idx = carry
            chunk_max = None
            if contiguous:
                start = jnp.minimum(
                    i * window_size, row_cap - window_size
                )
                neg_ent_idx = (
                    start + jnp.arange(window_size, dtype=jnp.int32)
                )[None, :]
                valid = jnp.logical_and(
                    neg_ent_idx >= i * window_size,
                    neg_ent_idx < n_candidate,
                )
                if fused_query is not None:
                    neg_rows = take_contiguous_rows(
                        table, start, window_size,
                        n_logical=self.sharding.max_entity_per_shard,
                    )
                    if cd is not None:
                        neg_rows = neg_rows.astype(cd)
                    negative_score, chunk_max = ops_l1_scores_chunkmax(
                        fused_query, neg_rows, valid[0],
                        chunk=CHUNK, bad=BAD_NEGATIVE_SCORE,
                    )
                    idx_broad = jnp.broadcast_to(
                        neg_ent_idx, negative_score.shape
                    )
                    return _merge(
                        negative_score, idx_broad, chunk_max,
                        curr_score, curr_idx,
                    )
                neg_emb = take_contiguous_rows(
                    table, start, window_size,
                    n_logical=self.sharding.max_entity_per_shard,
                )[None]
            else:
                slide = (
                    i * window_size
                    + jnp.arange(window_size, dtype=jnp.int32)
                )[None, :]
                valid = slide < n_candidate
                slide = jnp.where(valid, slide, n_candidate - 1)
                if mask_rows is not None:
                    valid = jnp.logical_and(
                        valid, gather_indices(mask_rows, slide)
                    )
                neg_ent_idx = gather_indices(candidate, slide)
                neg_emb = take_rows(
                    table, neg_ent_idx, n_logical=self.sharding.max_entity_per_shard
                )
            if cd is not None:
                neg_emb = neg_emb.astype(cd)
            if scheme == "h":
                negative_score = self.score_fn.score_heads(
                    params, neg_emb, relation_all, known_emb_all
                )
            else:
                negative_score = self.score_fn.score_tails(
                    params, known_emb_all, relation_all, neg_emb
                )
            # fp32 merge regardless of score/storage dtype: ranking wants
            # the extra mantissa, and the scan carry stays dtype-stable
            # across fp32 / bf16-compute / packed-bf16 configurations.
            negative_score = negative_score.astype(jnp.float32)
            negative_score = negative_score + BAD_NEGATIVE_SCORE * (
                ~valid
            ).astype(negative_score.dtype)
            # NB: an iterative-argmax top-n_best extraction (n_best
            # elementwise passes instead of the padded bitonic sort) was
            # measured SLOWER end-to-end at window 4000 — it breaks XLA's
            # fusion of the scoring epilogue into the merge (L2: 114 ->
            # 201 ms/batch). The chunked merge keeps a single fusable
            # reduction pass over the scores instead.
            idx_broad = jnp.broadcast_to(neg_ent_idx, negative_score.shape)
            return _merge(
                negative_score, idx_broad, None, curr_score, curr_idx
            )

        def _merge(negative_score, idx_broad, chunk_max, curr_score, curr_idx):
            if use_chunk_merge:
                # Exact hierarchical merge (see class docstring): any
                # window element in the true top-n_best has a chunk max
                # >= itself, so the top-n_best chunks by max contain it.
                nb_rows = negative_score.shape[0]
                s3 = negative_score.reshape(nb_rows, n_chunk, CHUNK)
                i3 = idx_broad.reshape(nb_rows, n_chunk, CHUNK)
                if chunk_max is None:
                    chunk_max = jnp.max(s3, axis=-1)
                _, chunk_pos = jax.lax.top_k(chunk_max, n_best)
                cand_score = jnp.take_along_axis(
                    s3, chunk_pos[:, :, None], axis=1
                ).reshape(nb_rows, n_best * CHUNK)
                cand_idx = jnp.take_along_axis(
                    i3, chunk_pos[:, :, None], axis=1
                ).reshape(nb_rows, n_best * CHUNK)
            else:
                cand_score, cand_idx = negative_score, idx_broad
            merged = jnp.concatenate([cand_score, curr_score], axis=1)
            top_scores, top_pos = jax.lax.top_k(merged, n_best)
            all_idx = jnp.concatenate([cand_idx, curr_idx], axis=1)
            new_idx = jnp.take_along_axis(all_idx, top_pos, axis=1)
            return top_scores, new_idx

        total_bs = n_shard * shard_bs
        init_score = jnp.full(
            (total_bs, n_best), BAD_NEGATIVE_SCORE, dtype=jnp.float32
        )
        init_idx = jnp.full(
            (total_bs, n_best), sharding.max_entity_per_shard, dtype=jnp.int32
        )
        n_rep = int(np.ceil(n_candidate / window_size))
        best_score, best_idx = jax.lax.fori_loop(
            0, n_rep, loop_body, (init_score, init_idx)
        )

        # Return each query's per-shard bests to its home device.
        best_score = self._all_to_all(
            best_score.reshape(n_shard, shard_bs, n_best)
        )
        best_idx = self._all_to_all(best_idx.reshape(n_shard, shard_bs, n_best))

        # Kill padding-entity scores (per source shard).
        counts = jnp.asarray(sharding.shard_counts, jnp.int32)[:, None, None]
        best_score = best_score + BAD_NEGATIVE_SCORE * (
            best_idx >= counts
        ).astype(best_score.dtype)

        # Local -> global IDs through the sharding map.
        s2e = jnp.asarray(sharding.shard_and_idx_to_entity, jnp.int32)
        safe_idx = jnp.minimum(best_idx, sharding.max_entity_per_shard - 1)
        best_global = gather_indices(
            s2e, safe_idx.reshape(n_shard, -1)
        ).reshape(n_shard, shard_bs, n_best)
        best_global = jnp.swapaxes(best_global, 0, 1).reshape(shard_bs, -1)

        final_scores, final_pos = jax.lax.top_k(
            jnp.swapaxes(best_score, 0, 1).reshape(shard_bs, -1), self.k
        )
        topk_global_id = jnp.take_along_axis(best_global, final_pos, axis=1)

        out: Dict[str, jnp.ndarray] = {"topk_global_id": topk_global_id}
        if self.return_scores:
            out["topk_scores"] = final_scores
        if self.evaluation is not None:
            ground_truth = tail if scheme == "t" else head
            if ground_truth is None:
                raise ValueError(
                    "Evaluation requires providing ground truth entities"
                )
            ranks = self.evaluation.ranks_from_indices(
                ground_truth, topk_global_id
            )
            if self.evaluation.return_ranks:
                out["ranks"] = ranks
            out["metrics"] = self.evaluation.stacked_metrics_from_ranks(
                ranks, triple_mask
            )
        return out


class AllScoresBESS:
    """Distributed scoring of (h, r, ?) / (?, r, t) queries against a window
    of every shard's entities; the host stitches the full score matrix
    (reference ``besskge/bess.py:924-1062``). Use through
    :class:`besskge_tpu.pipeline.AllScoresPipeline`. Inference only.
    """

    def __init__(
        self,
        candidate_sampler: PlaceholderNegativeSampler,
        score_fn: BaseScoreFunction,
        window_size: int = 1000,
        axis_name: Optional[str] = AXIS,
    ) -> None:
        self.sharding = score_fn.sharding
        self.score_fn = score_fn
        self.negative_sampler = candidate_sampler
        self.window_size = window_size
        self.axis_name = axis_name
        if not score_fn.negative_sample_sharing:
            raise ValueError("AllScoresBESS requires negative sample sharing")
        if candidate_sampler.corruption_scheme not in ("h", "t"):
            raise ValueError("AllScoresBESS only supports 'h', 't' corruption")
        if not isinstance(candidate_sampler, PlaceholderNegativeSampler):
            raise ValueError(
                "AllScoresBESS requires a PlaceholderNegativeSampler"
            )
        if axis_name is None and self.sharding.n_shard != 1:
            raise ValueError("axis_name=None requires n_shard == 1")
        self.entity_embedding_size = score_fn.entity_row_size
        self.n_step = int(
            np.ceil(self.sharding.max_entity_per_shard / window_size)
        )

    _all_to_all = BessKGE._all_to_all
    _all_gather = BessKGE._all_gather
    psum = BessKGE.psum

    def forward(
        self,
        params: Dict[str, Any],
        step: jnp.ndarray,
        relation: jnp.ndarray,
        head: Optional[jnp.ndarray] = None,
        tail: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Scores (shard_bs, n_shard * window) for window ``step`` of every
        shard's local entities, for this device's queries."""
        table = params["entity_embedding"]
        n_shard = self.sharding.n_shard
        shard_bs = relation.shape[0]
        scheme = self.negative_sampler.corruption_scheme

        relation_all = self._all_gather(relation).reshape(-1)
        known = tail if scheme == "h" else head
        known_emb_all = self._all_gather(
            take_rows(table, known, n_logical=self.sharding.max_entity_per_shard)
        ).reshape(-1, self.entity_embedding_size)
        cd = self.score_fn.compute_dtype
        known_emb_all = _cast_gathered(known_emb_all, cd)

        # Contiguous window load (one dynamic_slice DMA) whenever possible;
        # the host stitch in AllScoresPipeline mirrors this index math
        # exactly (pipeline.py column map). The final window clamps its
        # start, re-scoring a prefix of the previous window — the host
        # dedup keeps first occurrences, and duplicated columns carry
        # identical scores.
        t_flat = table[0] if table.ndim == 3 else table
        packed_tab = pk_is_packed(t_flat)
        # logical row cap: packed tables back 2 logical rows per physical
        # row (2/3 per row for the triplet-major interleaved store);
        # pair-major interleaved tables (optimizer state interleaved,
        # see besskge_tpu.optim.interleave_momentum) back 1 per 2.
        if pk_is_tripled(t_flat, self.sharding.max_entity_per_shard):
            row_cap = 2 * (t_flat.shape[0] // 3)
        elif pk_is_quintupled(t_flat, self.sharding.max_entity_per_shard):
            row_cap = 2 * (t_flat.shape[0] // 5)
        elif packed_tab:
            row_cap = 2 * t_flat.shape[0]
        elif pk_is_paired(t_flat, self.sharding.max_entity_per_shard):
            row_cap = t_flat.shape[0] // 2
        elif pk_is_trebled(t_flat, self.sharding.max_entity_per_shard):
            row_cap = t_flat.shape[0] // 3
        else:
            row_cap = t_flat.shape[0]
        w = self.window_size
        if w <= row_cap and not (packed_tab and w % 2):
            start = jnp.minimum(step * w, row_cap - w)
            neg_emb = take_contiguous_rows(
                table, start, w, n_logical=self.sharding.max_entity_per_shard
            )[None]
        else:
            ent_slice = jnp.minimum(
                step * w + jnp.arange(w, dtype=jnp.int32),
                self.sharding.max_entity_per_shard - 1,
            )
            neg_emb = take_rows(
                table, ent_slice, n_logical=self.sharding.max_entity_per_shard
            )[None]
        if cd is not None:
            neg_emb = neg_emb.astype(cd)

        if scheme == "h":
            scores = self.score_fn.score_heads(
                params, neg_emb, relation_all, known_emb_all
            )
        else:
            scores = self.score_fn.score_tails(
                params, known_emb_all, relation_all, neg_emb
            )
        scores = self._all_to_all(
            scores.reshape(n_shard, shard_bs, self.window_size)
        )
        return jnp.swapaxes(scores, 0, 1).reshape(shard_bs, -1)


# ----------------------------------------------------------------------
# Jitted step builders.

_FORWARD_KEYS = (
    "head",
    "relation",
    "tail",
    "negative",
    "triple_mask",
    "triple_weight",
    "negative_mask",
)


def _device_step(bess: BessKGE, params, batch, train=False, rng=None):
    """Device code: loop the `bps` micro-batches of a sharded batch dict.

    ``params["entity_embedding"]`` is the (1, max_ent, row) block; batch
    arrays are (bps, 1, ...) blocks.
    """
    local = params
    if rng is not None and bess.axis_name is not None:
        # Per-device dropout streams.
        rng = jax.random.fold_in(rng, jax.lax.axis_index(bess.axis_name))
    mbs = {k: v[:, 0] for k, v in batch.items() if k in _FORWARD_KEYS}
    bps = next(iter(mbs.values())).shape[0]
    rngs = (
        jax.random.split(rng, bps)
        if rng is not None
        else jnp.zeros((bps, 2), jnp.uint32)
    )

    def body_fn(mb, step_rng):
        return bess.forward(
            local, train=train, rng=step_rng if rng is not None else None, **mb
        )

    if bess.axis_name is None:
        # Single device: no collectives in the body, so the micro-batches
        # can be vmapped — one fused program instead of a while loop (the
        # scan's per-iteration overhead dominates small micro-batches).
        return jax.vmap(body_fn)(mbs, rngs)

    def body(_, inp):
        mb, step_rng = inp
        return None, body_fn(mb, step_rng)

    _, outs = jax.lax.scan(body, None, (mbs, rngs))
    return outs  # each leaf: (bps, ...)


def _format_outputs(bess: BessKGE, outs):
    """Per-device stacked outputs -> blocks matching the out partition specs
    (insert the size-1 device axis; psum reduced quantities)."""
    formatted = {}
    if "loss" in outs:
        formatted["loss"] = bess.psum(jnp.sum(outs["loss"]))
    for key in ("positive_score", "negative_score", "ranks"):
        if key in outs:
            formatted[key] = outs[key][:, None]
    if "metrics" in outs:
        m = outs["metrics"]  # (bps, 1, n_metric[, bs])
        if m.ndim == 3:  # "sum" reduction -> psum to global sums
            formatted["metrics"] = bess.psum(m)
        else:
            formatted["metrics"] = m
    return formatted


def _out_specs(bess: BessKGE):
    specs: Dict[str, P] = {}
    if bess.loss_fn is not None:
        specs["loss"] = P()
    if bess.return_scores:
        specs["positive_score"] = P(None, AXIS)
        specs["negative_score"] = P(None, AXIS)
    if bess.evaluation is not None:
        if bess.evaluation.return_ranks:
            specs["ranks"] = P(None, AXIS)
        reduced = bess.evaluation.reduction(jnp.zeros((2,))).ndim == 0
        specs["metrics"] = P() if reduced else P(None, AXIS)
    return specs


def build_bess_forward(
    bess: BessKGE,
    mesh: Optional[Mesh] = None,
    train: bool = False,
):
    """Build the jitted forward step ``fn(params, batch[, rng]) -> outputs``.

    With a mesh, the step is ``jit(shard_map(...))`` over the ``("shard",)``
    axis; without, a plain ``jit`` (requires ``bess.axis_name is None`` and
    ``n_shard == 1``).

    Outputs: ``loss`` () global sum; ``positive_score`` (bps, n_shard, bs);
    ``negative_score`` (bps, n_shard, bs, n_col); ``ranks`` same as scores;
    ``metrics`` (bps, 1, n_metric) global sums (sum reduction) or
    (bps, n_shard, n_metric, bs).
    """
    if mesh is None:
        if bess.axis_name is not None:
            raise ValueError("A mesh is required unless axis_name is None")

        @jax.jit
        def single_fn(params, batch, rng=None):
            blocked = dict(params)
            # Match the block convention: table keeps its leading shard axis.
            outs = _device_step(bess, blocked, batch, train=train, rng=rng)
            return _format_outputs(bess, outs)

        return single_fn

    def sharded_step(params, batch, rng=None):
        outs = _device_step(bess, params, batch, train=train, rng=rng)
        return _format_outputs(bess, outs)

    @jax.jit
    def fn(params, batch, rng=None):
        fwd_batch = {k: v for k, v in batch.items() if k in _FORWARD_KEYS}
        p_specs = param_partition_specs(params)
        b_specs = batch_partition_specs(fwd_batch)
        if rng is None:
            mapped = jax.shard_map(
                sharded_step,
                mesh=mesh,
                in_specs=(p_specs, b_specs),
                out_specs=_out_specs(bess),
                check_vma=False,
            )
            return mapped(params, fwd_batch)
        mapped = jax.shard_map(
            partial(sharded_step),
            mesh=mesh,
            in_specs=(p_specs, b_specs, P()),
            out_specs=_out_specs(bess),
            check_vma=False,
        )
        return mapped(params, fwd_batch, rng)

    return fn


_TOPK_KEYS = (
    "head",
    "relation",
    "tail",
    "negative",
    "triple_mask",
    "negative_mask",
)


def build_topk_forward(topk: TopKQueryBessKGE, mesh: Optional[Mesh] = None):
    """Build the jitted top-k query step ``fn(params, batch) -> outputs``.

    Outputs: ``topk_global_id`` (bps, n_shard, shard_bs, k) and optionally
    ``topk_scores``, ``ranks``, ``metrics``.
    """

    def device_step(params, batch):
        local = params
        mbs = {k: v[:, 0] for k, v in batch.items() if k in _TOPK_KEYS}

        def body(_, mb):
            return None, topk.forward(local, **mb)

        _, outs = jax.lax.scan(body, None, mbs)
        formatted = {}
        for key in ("topk_global_id", "topk_scores", "ranks"):
            if key in outs:
                formatted[key] = outs[key][:, None]
        if "metrics" in outs:
            m = outs["metrics"]
            formatted["metrics"] = topk.psum(m) if m.ndim == 3 else m
        return formatted

    def out_specs():
        specs = {"topk_global_id": P(None, AXIS)}
        if topk.return_scores:
            specs["topk_scores"] = P(None, AXIS)
        if topk.evaluation is not None:
            if topk.evaluation.return_ranks:
                specs["ranks"] = P(None, AXIS)
            reduced = topk.evaluation.reduction(jnp.zeros((2,))).ndim == 0
            specs["metrics"] = P() if reduced else P(None, AXIS)
        return specs

    if mesh is None:
        if topk.axis_name is not None:
            raise ValueError("A mesh is required unless axis_name is None")
        return jax.jit(device_step)

    @jax.jit
    def fn(params, batch):
        fwd_batch = {k: v for k, v in batch.items() if k in _TOPK_KEYS}
        mapped = jax.shard_map(
            device_step,
            mesh=mesh,
            in_specs=(
                param_partition_specs(params),
                batch_partition_specs(fwd_batch),
            ),
            out_specs=out_specs(),
            check_vma=False,
        )
        return mapped(params, fwd_batch)

    return fn


def build_allscores_forward(
    allscores: AllScoresBESS, mesh: Optional[Mesh] = None
):
    """Build ``fn(params, batch, step) -> scores`` with
    scores (bps, n_shard, shard_bs, n_shard*window)."""

    def device_step(params, batch, step):
        local = params
        keys = ("relation", "head", "tail")
        mbs = {k: v[:, 0] for k, v in batch.items() if k in keys}

        def body(_, mb):
            return None, allscores.forward(local, step, **mb)

        _, outs = jax.lax.scan(body, None, mbs)
        return outs[:, None]  # (bps, 1, shard_bs, S*window)

    if mesh is None:
        if allscores.axis_name is not None:
            raise ValueError("A mesh is required unless axis_name is None")
        return jax.jit(device_step)

    @jax.jit
    def fn(params, batch, step):
        fwd_batch = {
            k: v for k, v in batch.items() if k in ("relation", "head", "tail")
        }
        mapped = jax.shard_map(
            device_step,
            mesh=mesh,
            in_specs=(
                param_partition_specs(params),
                batch_partition_specs(fwd_batch),
                P(),
            ),
            out_specs=P(None, AXIS),
            check_vma=False,
        )
        return mapped(params, fwd_batch, step)

    return fn
