"""High-level host pipelines for BESS inference.

Capability parity with reference ``besskge/pipeline.py:23-320``
(graphcore-research/bess-kge): batched full-vocabulary scoring with triple
filtering, candidate restriction, top-k extraction and host-side metrics,
wrapped around the jitted :class:`besskge_tpu.bess.AllScoresBESS` window step.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from numpy.typing import NDArray

from besskge_tpu.batch_sampler import ShardedBatchSampler
from besskge_tpu.bess import AllScoresBESS, build_allscores_forward
from besskge_tpu.metric import Evaluation
from besskge_tpu.negative_sampler import PlaceholderNegativeSampler
from besskge_tpu.scoring import BaseScoreFunction
from besskge_tpu.utils import get_entity_filter

__all__ = ["AllScoresPipeline"]


class AllScoresPipeline:
    """Score (h, r, ?) / (?, r, t) queries against all (or candidate)
    entities, with filtered evaluation.

    :param batch_sampler: based on an "h_shard"/"t_shard"-partitioned set,
        with ``return_triple_idx=True`` when filtering.
    :param corruption_scheme: "t" to complete (h, r, ?), "h" for (?, r, t).
    :param score_fn: the trained scoring function.
    :param mesh: device mesh (None = single-device path).
    :param evaluation: metrics module (host-side here).
    :param filter_triples: list of triple arrays (GLOBAL IDs) whose
        completions must be filtered out of the rankings.
    :param candidate_ents: global IDs; restrict scoring to these entities.
    :param return_scores: return the full (filtered) score matrix.
    :param return_topk: return top-k most likely completions per query.
    :param k: how many completions when ``return_topk``.
    :param window_size: entities per shard scored per device call.
    """

    def __init__(
        self,
        batch_sampler: ShardedBatchSampler,
        corruption_scheme: str,
        score_fn: BaseScoreFunction,
        mesh: Optional[Mesh] = None,
        evaluation: Optional[Evaluation] = None,
        filter_triples: Optional[List[NDArray[np.int32]]] = None,
        candidate_ents: Optional[NDArray[np.int32]] = None,
        return_scores: bool = False,
        return_topk: bool = False,
        k: int = 10,
        window_size: int = 1000,
    ) -> None:
        if not (evaluation or return_scores):
            raise ValueError(
                "Nothing to return. Provide `evaluation` or set"
                " `return_scores=True`"
            )
        if corruption_scheme not in ("h", "t"):
            raise ValueError("corruption_scheme needs to be either 'h' or 't'")
        expected_mode = "t_shard" if corruption_scheme == "h" else "h_shard"
        if batch_sampler.triple_partition_mode != expected_mode:
            raise ValueError(
                f"Corruption scheme '{corruption_scheme}' requires"
                f" '{expected_mode}'-partitioned triples"
            )
        self.batch_sampler = batch_sampler
        self.score_fn = score_fn
        self.evaluation = evaluation
        self.return_scores = return_scores
        self.return_topk = return_topk
        self.k = k
        self.corruption_scheme = corruption_scheme
        self.candidate_sampler = PlaceholderNegativeSampler(
            corruption_scheme=corruption_scheme
        )
        axis_name = None if mesh is None else "shard"
        self.bess_module = AllScoresBESS(
            self.candidate_sampler, score_fn, window_size, axis_name=axis_name
        )
        self.mesh = mesh
        self._fwd = build_allscores_forward(self.bess_module, mesh)
        sharding = self.bess_module.sharding

        # Precompute the stitched-column -> global-entity dedup map: column
        # order is (step, shard, window-pos); keep the first occurrence of
        # each global ID, drop padding IDs (reference ``pipeline.py:243-247``).
        # MUST mirror AllScoresBESS.forward's window index math exactly: a
        # contiguous window clamps its start (re-reading a prefix of the
        # previous window — identical scores, deduped here), and a packed
        # bf16 table may expose one zero pad row past max_entity_per_shard
        # (its column aliases the last real index and loses the first-
        # occurrence race to the real column, so it is always dropped).
        ws = self.bess_module.window_size
        max_e = sharding.max_entity_per_shard
        packed_tab = bool(getattr(score_fn, "packed_entity_storage", False))
        self._packed_tab = packed_tab
        row_cap = max_e + (max_e % 2) if packed_tab else max_e
        contiguous = ws <= row_cap and not (packed_tab and ws % 2)
        col_ids = []
        for i in range(self.bess_module.n_step):
            if contiguous:
                ent_slice = np.minimum(
                    min(i * ws, row_cap - ws) + np.arange(ws), max_e - 1
                )
            else:
                ent_slice = np.minimum(i * ws + np.arange(ws), max_e - 1)
            col_ids.append(sharding.shard_and_idx_to_entity[:, ent_slice].ravel())
        self._col_select = np.unique(
            np.concatenate(col_ids), return_index=True
        )[1][: sharding.n_entity]

        self.filter_triples: Optional[NDArray] = None
        if filter_triples:
            # Reconstruct global IDs of the partitioned column.
            local_col = (
                0 if batch_sampler.triple_partition_mode == "h_shard" else 2
            )
            offsets = np.concatenate(
                [[0], np.cumsum(batch_sampler.triple_counts)]
            )
            parts = []
            for s in range(len(offsets) - 1):
                chunk = batch_sampler.triples[offsets[s] : offsets[s + 1]].copy()
                chunk[:, local_col] = sharding.shard_and_idx_to_entity[s][
                    chunk[:, local_col]
                ]
                parts.append(chunk)
            self.triples = np.concatenate(parts, axis=0)
            self.filter_triples = np.concatenate(
                [np.asarray(tr) for tr in filter_triples], axis=0
            )
        self.candidate_mask: Optional[NDArray] = None
        if candidate_ents is not None:
            self.candidate_mask = np.setdiff1d(
                np.arange(sharding.n_entity), candidate_ents
            )

    def forward(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Run the full pipeline over one epoch of the batch sampler."""
        from besskge_tpu.packed import is_packed

        if bool(is_packed(params["entity_embedding"])) != self._packed_tab:
            raise ValueError(
                "entity table packedness changed after pipeline "
                "construction — the stitched-column map was built for "
                f"packed={self._packed_tab}; rebuild the AllScoresPipeline"
            )
        scores, ids, metrics, ranks, topk_ids = [], [], [], [], []
        n_triple = 0
        n_step = self.bess_module.n_step
        jparams = {k: jnp.asarray(v) for k, v in params.items()}
        for batch in self.batch_sampler.get_dataloader(shuffle=False):
            triple_mask = batch["triple_mask"].reshape(-1)
            ground_truth = None
            gt_key = "head" if self.corruption_scheme == "h" else "tail"
            if gt_key in batch:
                ground_truth = batch[gt_key].reshape(-1)
            triple_id = None
            if self.batch_sampler.return_triple_idx:
                triple_id = batch["triple_idx"].reshape(-1)
                ids.append(triple_id[triple_mask])
            n_triple += int(triple_mask.sum())

            jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
            chunks = [
                np.asarray(self._fwd(jparams, jbatch, jnp.asarray(i)))
                for i in range(n_step)
            ]
            # (bps, S, shard_bs, S*ws) x n_step -> (bs_total, n_step*S*ws)
            batch_scores = np.concatenate(
                [c.reshape(-1, c.shape[-1]) for c in chunks], axis=-1
            )
            filt = batch_scores[triple_mask][:, self._col_select].astype(
                np.float32
            )
            if self.candidate_mask is not None:
                filt[:, self.candidate_mask] = -np.inf
            rows = np.arange(filt.shape[0])
            true_scores = None
            if ground_truth is not None:
                true_scores = filt[rows, ground_truth[triple_mask]]
            if self.filter_triples is not None:
                if triple_id is None:
                    raise ValueError(
                        "Filtering requires return_triple_idx=True in the"
                        " batch sampler"
                    )
                batch_filter = get_entity_filter(
                    self.triples[triple_id[triple_mask]],
                    self.filter_triples,
                    filter_mode=self.corruption_scheme,
                )
                filt[batch_filter[:, 0], batch_filter[:, 1]] = -np.inf
            if self.evaluation:
                if ground_truth is None:
                    raise ValueError(
                        "Evaluation requires ground truth entities"
                    )
                filt[rows, ground_truth[triple_mask]] = -np.inf
                batch_ranks = np.asarray(
                    self.evaluation.ranks_from_scores(
                        jnp.asarray(true_scores), jnp.asarray(filt)
                    )
                )
                metrics.append(
                    {
                        k: np.asarray(v)
                        for k, v in self.evaluation.dict_metrics_from_ranks(
                            jnp.asarray(batch_ranks)
                        ).items()
                    }
                )
                if self.evaluation.return_ranks:
                    ranks.append(batch_ranks)
            if ground_truth is not None:
                filt[rows, ground_truth[triple_mask]] = true_scores
            if self.return_scores:
                scores.append(filt)
            if self.return_topk:
                topk_ids.append(np.argsort(-filt, axis=-1)[:, : self.k])

        out: Dict[str, Any] = {}
        if scores:
            out["scores"] = np.concatenate(scores, axis=0)
        if topk_ids:
            out["topk_global_id"] = np.concatenate(topk_ids, axis=0)
        if ids:
            out["triple_idx"] = np.concatenate(ids, axis=0)
        if self.evaluation:
            final = {
                m: self.evaluation.reduction(
                    jnp.asarray(
                        np.concatenate(
                            [met[m].reshape(-1) for met in metrics]
                        )
                    )
                )
                for m in metrics[0]
            }
            out["metrics"] = {k: np.asarray(v) for k, v in final.items()}
            out["metrics_avg"] = {
                m: float(np.sum(v)) / n_triple for m, v in out["metrics"].items()
            }
            if ranks:
                out["ranks"] = np.concatenate(ranks, axis=0)
        return out
