"""KGE score functions (device math, JAX).

Capability parity with reference ``besskge/scoring.py:28-1751``
(graphcore-research/bess-kge), re-designed functional-first for XLA:

* A score function object holds *static* configuration and table
  construction; the learnable state lives in an explicit ``params`` pytree
  (``{"entity_embedding": (n_shard * max_ent_per_shard, row) — shard-major
  2-D, "relation_embedding": (n_relation, row), ...}``) threaded through
  every method — so the whole train step is a pure function that ``jax.jit`` /
  ``shard_map`` / ``jax.grad`` compose over.
* With ``negative_sample_sharing``, matrix-decomposition models score the
  candidate pool with one MXU matmul and distance models use the
  ``|a|²+|b|²−2ab`` decomposition (:func:`besskge_tpu.ops.p_distance_matrix`)
  — the TPU-native replacement for the reference's fused C++ cdist op.
* All methods accept embeddings already gathered from the sharded table; the
  gather + AllToAll choreography lives in :mod:`besskge_tpu.bess`.

Score-method shape contract (matches reference ``scoring.py:46-112``):

* ``score_triple(params, head (B, r_e), rel_id (B,), tail (B, r_e)) -> (B,)``
* ``score_heads(params, heads (b, n, r_e), rel_id (B,), tail (B, r_e))
  -> (B, b*n)`` if sample sharing (``b`` is folded into the pool) else
  ``(B, n)`` with ``b == B``.
* ``score_tails`` symmetric.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from besskge_tpu.embedding import (
    Initializer,
    init_KGE_normal,
    init_KGE_uniform,
    init_uniform,
    init_uniform_norm,
    init_uniform_rotation,
    init_xavier_norm,
    init_zeros,
    initialize_entity_embedding,
    initialize_relation_embedding,
    refactor_embedding_sharding,
)
from besskge_tpu.ops import p_distance_matrix
from besskge_tpu.sharding import Sharding
from besskge_tpu.utils import complex_multiplication, complex_rotation

__all__ = [
    "BaseScoreFunction",
    "DistanceBasedScoreFunction",
    "MatrixDecompositionScoreFunction",
    "TransE",
    "RotatE",
    "PairRE",
    "TripleRE",
    "DistMult",
    "ComplEx",
    "ConvE",
    "BoxE",
    "InterHT",
    "TranS",
]

Params = Dict[str, Any]
TableOrInit = Union[np.ndarray, List[Initializer]]

#: Softening for norms/sqrt at exactly zero (keeps grads finite).
_NORM_EPS = 1e-12


def _l2_normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Row-wise L2 normalization (torch ``F.normalize`` semantics)."""
    norm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + _NORM_EPS)
    return v / norm


class BaseScoreFunction(ABC):
    """Base class for scoring functions.

    Subclasses build the initial entity/relation tables (numpy, host-side) at
    construction; :meth:`initial_params` returns them as the params pytree.
    """

    #: Share negative entities across all queries of the micro-batch.
    negative_sample_sharing: bool
    #: Entity sharding (device table layout: 2-D shard-major rows).
    sharding: Sharding
    #: Width of one entity-table row.
    entity_row_size: int
    #: Width of one relation-table row.
    relation_row_size: int
    #: Nominal embedding size of the model.
    embedding_size: int
    #: Optional compute precision for scoring: embeddings/relation rows are
    #: cast to this dtype after gathering (e.g. ``jnp.bfloat16`` for the
    #: reference's fp16-compute recipe) while storage stays in ``dtype``.
    compute_dtype: Any = None
    #: Mesh axis name set by the BESS module wrapping this score function
    #: (``None`` outside shard_map); used by cross-shard ops like SyncBN.
    mesh_axis: Any = None
    #: Store the entity table in row-pair-packed bf16 (int32 storage, half
    #: the HBM of fp32 — the reference's fp16 capacity recipe, notebook 3)
    #: while keeping full-speed in-place sparse updates; requires an
    #: :class:`~besskge_tpu.optim.EntityRowOptimizer` for training. See
    #: :mod:`besskge_tpu.packed`. Set before ``initial_params*``.
    packed_entity_storage: bool = False

    def _build_tables(
        self,
        sharding: Sharding,
        n_relation_type: int,
        inverse_relations: bool,
        entity_initializer: TableOrInit,
        entity_slices: List[int],
        relation_initializer: TableOrInit,
        relation_slices: List[int],
        seed: int,
        dtype: Any,
    ) -> None:
        # Tables are built LAZILY (initial_params / initial_params_device):
        # at production scale the entity table is GBs and should be generated
        # directly on device, never materialized on host.
        self.sharding = sharding
        self.n_relation_type = n_relation_type
        self.inverse_relations = inverse_relations
        self.dtype = dtype
        self.seed = seed
        self.entity_row_size = int(sum(entity_slices))
        self.relation_row_size = int(sum(relation_slices))
        self._entity_spec = (entity_initializer, list(entity_slices))
        self._relation_spec = (relation_initializer, list(relation_slices))

    def initial_params(self) -> Params:
        """The initial learnable state as a pytree of numpy arrays
        (host-side; prefer :meth:`initial_params_device` for large tables).

        The entity table's params layout is 2-D ``(n_shard *
        max_entity_per_shard, row)`` — shard s owns the contiguous row block
        ``[s*max_entity_per_shard, (s+1)*max_entity_per_shard)``. (The 3-D
        view exists only host-side: XLA's default TPU layout for huge
        leading-unit 3-D arrays degenerates to (1, 128) tiling, which costs
        a full-table relayout copy at every Pallas row update.)"""
        ent_init, ent_slices = self._entity_spec
        rel_init, rel_slices = self._relation_spec
        ent = (
            initialize_entity_embedding(
                self.sharding, ent_init, ent_slices, seed=self.seed
            )
            .astype(self.dtype, copy=False)
            .reshape(-1, self.entity_row_size)
        )
        if self.packed_entity_storage:
            from besskge_tpu.packed import pack_table_host

            assert self.sharding.max_entity_per_shard % 2 == 0
            ent = pack_table_host(ent)
        return {
            "entity_embedding": ent,
            "relation_embedding": initialize_relation_embedding(
                self.n_relation_type,
                self.inverse_relations,
                rel_init,
                rel_slices,
                seed=self.seed + 1,
            ).astype(self.dtype, copy=False),
            **self._extra_params(),
        }

    def initial_params_device(self, mesh: Any = None) -> Params:
        """Generate the initial tables ON DEVICE with ``jax.random``: no
        host-side gigabytes, no host→device transfer; on a mesh the entity
        table is generated pre-sharded (GSPMD partitions the RNG).

        Function initializers are mapped to jax equivalents (values differ
        from the host RNG stream); array initializers are ``device_put``.
        """
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from besskge_tpu.embedding import device_table_init

        n_rel = self.n_relation_type * (2 if self.inverse_relations else 1)
        ent_shape = (
            self.sharding.n_shard * self.sharding.max_entity_per_shard,
            self.entity_row_size,
        )
        rel_shape = (n_rel, self.relation_row_size)
        ent_sharding = (
            NamedSharding(mesh, P("shard")) if mesh is not None else None
        )
        rel_sharding = NamedSharding(mesh, P()) if mesh is not None else None
        ent = device_table_init(
            self._entity_spec[0],
            self._entity_spec[1],
            ent_shape,
            self.seed,
            self.dtype,
            ent_sharding,
        )
        if self.packed_entity_storage:
            from besskge_tpu.packed import pack_table

            # Shard blocks have an even row count (Sharding.create), so the
            # global row-pair pack never crosses a shard boundary and GSPMD
            # keeps it collective-free.
            assert self.sharding.max_entity_per_shard % 2 == 0
            pack = jax.jit(
                pack_table,
                out_shardings=(
                    NamedSharding(mesh, P("shard")) if mesh is not None else None
                ),
            )
            ent = pack(ent)
        params = {
            "entity_embedding": ent,
            "relation_embedding": device_table_init(
                self._relation_spec[0],
                self._relation_spec[1],
                rel_shape,
                self.seed + 1,
                self.dtype,
                rel_sharding,
            ),
        }
        extra = self._extra_params()
        if extra:
            put = (
                (lambda x: jax.device_put(x, rel_sharding))
                if mesh is not None
                else jax.device_put
            )
            params.update(jax.tree.map(put, extra))
        return params

    def _extra_params(self) -> Params:
        """Non-table learnable parameters (overridden by ConvE)."""
        return {}

    def update_sharding(self, params: Params, new_sharding: Sharding) -> Params:
        """Re-shard a (trained) entity table to a new device topology
        (reference ``besskge/scoring.py:126-142``)."""
        raw = np.asarray(params["entity_embedding"])
        packed = np.issubdtype(raw.dtype, np.integer)
        if packed:
            from besskge_tpu.packed import pack_table_host, unpack_table_host

            raw = unpack_table_host(
                raw, self.sharding.n_shard * self.sharding.max_entity_per_shard
            )
        table = raw.reshape(
            self.sharding.n_shard, self.sharding.max_entity_per_shard, -1
        )
        new_table = refactor_embedding_sharding(
            table.astype(np.float32), self.sharding, new_sharding
        ).astype(table.dtype)
        self.sharding = new_sharding
        new_table = new_table.reshape(-1, new_table.shape[-1])
        if packed:
            assert new_sharding.max_entity_per_shard % 2 == 0
            new_table = pack_table_host(new_table)
        return {
            **params,
            "entity_embedding": new_table,
        }

    def relation_embedding(
        self, params: Params, relation_id: jnp.ndarray
    ) -> jnp.ndarray:
        """Gather relation rows from the replicated table (cast to
        :attr:`compute_dtype` when set)."""
        r = jnp.take(params["relation_embedding"], relation_id, axis=0)
        if self.compute_dtype is not None and r.dtype != self.compute_dtype:
            r = r.astype(self.compute_dtype)
        return r

    @abstractmethod
    def score_triple(
        self,
        params: Params,
        head_emb: jnp.ndarray,
        relation_id: jnp.ndarray,
        tail_emb: jnp.ndarray,
        **kwargs: Any,
    ) -> jnp.ndarray:
        """Score a batch of (h, r, t) triples; see module docstring."""
        raise NotImplementedError

    @abstractmethod
    def score_heads(
        self,
        params: Params,
        head_emb: jnp.ndarray,
        relation_id: jnp.ndarray,
        tail_emb: jnp.ndarray,
        **kwargs: Any,
    ) -> jnp.ndarray:
        """Score head candidates against fixed (r, t) queries."""
        raise NotImplementedError

    @abstractmethod
    def score_tails(
        self,
        params: Params,
        head_emb: jnp.ndarray,
        relation_id: jnp.ndarray,
        tail_emb: jnp.ndarray,
        **kwargs: Any,
    ) -> jnp.ndarray:
        """Score tail candidates against fixed (h, r) queries."""
        raise NotImplementedError

    def _pool(self, v: jnp.ndarray) -> jnp.ndarray:
        """(b, n, d) -> (1, b*n, d) when sample sharing, else unchanged."""
        if self.negative_sample_sharing:
            return v.reshape(1, -1, v.shape[-1])
        return v


class DistanceBasedScoreFunction(BaseScoreFunction, ABC):
    """Base for distance scorers: p-norm reduction + broadcasted distance
    (reference ``besskge/scoring.py:145-200``)."""

    def __init__(self, negative_sample_sharing: bool, scoring_norm: int) -> None:
        self.negative_sample_sharing = negative_sample_sharing
        self.scoring_norm = scoring_norm

    def reduce_embedding(self, v: jnp.ndarray) -> jnp.ndarray:
        """p-norm along the last axis (grad-safe at 0)."""
        if self.scoring_norm == 1:
            return jnp.sum(jnp.abs(v), axis=-1)
        if self.scoring_norm == 2:
            return jnp.sqrt(jnp.sum(v * v, axis=-1) + _NORM_EPS)
        return jnp.sum(jnp.abs(v) ** self.scoring_norm, axis=-1) ** (
            1.0 / self.scoring_norm
        )

    def broadcasted_distance(
        self, v1: jnp.ndarray, v2: jnp.ndarray
    ) -> jnp.ndarray:
        """p-distance of queries ``v1 (B, d)`` against candidates
        ``v2 (b, n, d)``; with sample sharing this is the MXU cdist path."""
        if self.negative_sample_sharing:
            return p_distance_matrix(
                v1, v2.reshape(-1, v2.shape[-1]), p=self.scoring_norm
            )
        return self.reduce_embedding(v1[:, None, :] - v2)

    def distance_query_vector(self, params, known_emb, relation_id, scheme):
        """Transformed query ``a`` such that ``score_heads``/``score_tails``
        against a shared candidate pool equals ``−cdist_p(a, pool)`` — the
        hook for the fused window-scoring kernels
        (:func:`besskge_tpu.ops.distance.l1_scores_chunkmax`). ``None``
        (default) means the model has no pure-cdist form (e.g. PairRE
        modulates candidates by the relation) and the fused path must not
        be used.

        :param known_emb: (B, row) embeddings of the known entity.
        :param relation_id: (B,) relation IDs.
        :param scheme: "h" (ranking heads) or "t" (ranking tails).
        """
        return None


class MatrixDecompositionScoreFunction(BaseScoreFunction, ABC):
    """Base for bilinear scorers: sum reduction + broadcasted dot product —
    a single MXU matmul under sample sharing
    (reference ``besskge/scoring.py:203-255``)."""

    def __init__(self, negative_sample_sharing: bool) -> None:
        self.negative_sample_sharing = negative_sample_sharing

    def reduce_embedding(self, v: jnp.ndarray) -> jnp.ndarray:
        """Sum along the last axis."""
        return jnp.sum(v, axis=-1)

    def broadcasted_dot_product(
        self, v1: jnp.ndarray, v2: jnp.ndarray
    ) -> jnp.ndarray:
        """Dot products of queries ``v1 (B, d)`` against ``v2 (b, n, d)``."""
        if self.negative_sample_sharing:
            pool = v2.reshape(-1, v2.shape[-1])
            return jnp.dot(
                v1, pool.T, preferred_element_type=jnp.float32
            ).astype(v1.dtype)
        return self.reduce_embedding(v1[:, None, :] * v2)


class TransE(DistanceBasedScoreFunction):
    """TransE: ``-||h + r − t||_p`` (reference ``besskge/scoring.py:258-354``)."""

    def __init__(
        self,
        negative_sample_sharing: bool,
        scoring_norm: int,
        sharding: Sharding,
        n_relation_type: int,
        embedding_size: int,
        entity_initializer: TableOrInit = None,  # type: ignore[assignment]
        relation_initializer: TableOrInit = None,  # type: ignore[assignment]
        inverse_relations: bool = False,
        seed: int = 0,
        dtype: Any = np.float32,
    ) -> None:
        super().__init__(negative_sample_sharing, scoring_norm)
        self.embedding_size = embedding_size
        self._build_tables(
            sharding,
            n_relation_type,
            inverse_relations,
            entity_initializer if entity_initializer is not None else [init_KGE_uniform],
            [embedding_size],
            relation_initializer
            if relation_initializer is not None
            else [init_KGE_uniform],
            [embedding_size],
            seed,
            dtype,
        )

    def score_triple(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        return -self.reduce_embedding(head_emb + r - tail_emb)

    def score_heads(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        return -self.broadcasted_distance(tail_emb - r, head_emb)

    def score_tails(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        return -self.broadcasted_distance(head_emb + r, tail_emb)

    def distance_query_vector(self, params, known_emb, relation_id, scheme):
        """``a`` such that scoring vs a candidate pool is ``−cdist_p(a, pool)``
        (the fused-window hook; see
        :meth:`DistanceBasedScoreFunction.distance_query_vector`)."""
        r = self.relation_embedding(params, relation_id)
        return known_emb - r if scheme == "h" else known_emb + r


class RotatE(DistanceBasedScoreFunction):
    """RotatE: ``-||h ∘ e^{i r} − t||_p`` on blocked complex rows
    (reference ``besskge/scoring.py:357-462``)."""

    def __init__(
        self,
        negative_sample_sharing: bool,
        scoring_norm: int,
        sharding: Sharding,
        n_relation_type: int,
        embedding_size: int,
        entity_initializer: TableOrInit = None,  # type: ignore[assignment]
        relation_initializer: TableOrInit = None,  # type: ignore[assignment]
        inverse_relations: bool = False,
        seed: int = 0,
        dtype: Any = np.float32,
    ) -> None:
        super().__init__(negative_sample_sharing, scoring_norm)
        self.embedding_size = embedding_size
        self._build_tables(
            sharding,
            n_relation_type,
            inverse_relations,
            entity_initializer if entity_initializer is not None else [init_KGE_uniform],
            [2 * embedding_size],
            relation_initializer
            if relation_initializer is not None
            else [init_uniform_rotation],
            [embedding_size],
            seed,
            dtype,
        )

    def score_triple(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        return -self.reduce_embedding(complex_rotation(head_emb, r) - tail_emb)

    def score_heads(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        return -self.broadcasted_distance(complex_rotation(tail_emb, -r), head_emb)

    def score_tails(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        return -self.broadcasted_distance(complex_rotation(head_emb, r), tail_emb)

    def distance_query_vector(self, params, known_emb, relation_id, scheme):
        """See :meth:`DistanceBasedScoreFunction.distance_query_vector`."""
        r = self.relation_embedding(params, relation_id)
        return complex_rotation(known_emb, -r if scheme == "h" else r)


class PairRE(DistanceBasedScoreFunction):
    """PairRE: ``-||h ∘ r_h − t ∘ r_t||_p``
    (reference ``besskge/scoring.py:465-593``)."""

    def __init__(
        self,
        negative_sample_sharing: bool,
        scoring_norm: int,
        sharding: Sharding,
        n_relation_type: int,
        embedding_size: int,
        entity_initializer: TableOrInit = None,  # type: ignore[assignment]
        relation_initializer: TableOrInit = None,  # type: ignore[assignment]
        normalize_entities: bool = True,
        inverse_relations: bool = False,
        seed: int = 0,
        dtype: Any = np.float32,
    ) -> None:
        super().__init__(negative_sample_sharing, scoring_norm)
        self.embedding_size = embedding_size
        self.normalize = normalize_entities
        rel_init = (
            relation_initializer
            if relation_initializer is not None
            else [init_KGE_uniform]
        )
        if isinstance(rel_init, list):
            rel_init = 2 * rel_init
        self._build_tables(
            sharding,
            n_relation_type,
            inverse_relations,
            entity_initializer if entity_initializer is not None else [init_KGE_uniform],
            [embedding_size],
            rel_init,
            [embedding_size, embedding_size],
            seed,
            dtype,
        )

    def _split_rel(self, params, relation_id):
        r = self.relation_embedding(params, relation_id)
        return jnp.split(r, 2, axis=-1)

    def _maybe_norm(self, v):
        return _l2_normalize(v) if self.normalize else v

    def score_triple(self, params, head_emb, relation_id, tail_emb, **kw):
        r_h, r_t = self._split_rel(params, relation_id)
        h = self._maybe_norm(head_emb)
        t = self._maybe_norm(tail_emb)
        return -self.reduce_embedding(h * r_h - t * r_t)

    def score_heads(self, params, head_emb, relation_id, tail_emb, **kw):
        r_h, r_t = self._split_rel(params, relation_id)
        h = self._pool(self._maybe_norm(head_emb))
        t = self._maybe_norm(tail_emb)
        return -self.reduce_embedding(h * r_h[:, None, :] - (t * r_t)[:, None, :])

    def score_tails(self, params, head_emb, relation_id, tail_emb, **kw):
        r_h, r_t = self._split_rel(params, relation_id)
        h = self._maybe_norm(head_emb)
        t = self._pool(self._maybe_norm(tail_emb))
        return -self.reduce_embedding(t * r_t[:, None, :] - (h * r_h)[:, None, :])


class TripleRE(DistanceBasedScoreFunction):
    """TripleRE(v2): ``-||h ∘ (r_h [+u]) − t ∘ (r_t [+u]) + r_m||_p``
    (reference ``besskge/scoring.py:596-743``)."""

    def __init__(
        self,
        negative_sample_sharing: bool,
        scoring_norm: int,
        sharding: Sharding,
        n_relation_type: int,
        embedding_size: int,
        entity_initializer: TableOrInit = None,  # type: ignore[assignment]
        relation_initializer: TableOrInit = None,  # type: ignore[assignment]
        normalize_entities: bool = True,
        u: float = 0.0,
        inverse_relations: bool = False,
        seed: int = 0,
        dtype: Any = np.float32,
    ) -> None:
        super().__init__(negative_sample_sharing, scoring_norm)
        self.embedding_size = embedding_size
        self.normalize = normalize_entities
        self.u = float(u)
        self.use_v2 = u > 0.0
        rel_init = (
            relation_initializer
            if relation_initializer is not None
            else [init_KGE_uniform]
        )
        if isinstance(rel_init, list):
            rel_init = 3 * rel_init
        self._build_tables(
            sharding,
            n_relation_type,
            inverse_relations,
            entity_initializer if entity_initializer is not None else [init_KGE_uniform],
            [embedding_size],
            rel_init,
            [embedding_size] * 3,
            seed,
            dtype,
        )

    def _split_rel(self, params, relation_id):
        r = self.relation_embedding(params, relation_id)
        r_h, r_m, r_t = jnp.split(r, 3, axis=-1)
        if self.use_v2:
            r_h = r_h + self.u
            r_t = r_t + self.u
        return r_h, r_m, r_t

    def _maybe_norm(self, v):
        return _l2_normalize(v) if self.normalize else v

    def score_triple(self, params, head_emb, relation_id, tail_emb, **kw):
        r_h, r_m, r_t = self._split_rel(params, relation_id)
        h = self._maybe_norm(head_emb)
        t = self._maybe_norm(tail_emb)
        return -self.reduce_embedding(h * r_h - t * r_t + r_m)

    def score_heads(self, params, head_emb, relation_id, tail_emb, **kw):
        r_h, r_m, r_t = self._split_rel(params, relation_id)
        h = self._pool(self._maybe_norm(head_emb))
        t = self._maybe_norm(tail_emb)
        return -self.reduce_embedding(
            h * r_h[:, None, :] - (t * r_t - r_m)[:, None, :]
        )

    def score_tails(self, params, head_emb, relation_id, tail_emb, **kw):
        r_h, r_m, r_t = self._split_rel(params, relation_id)
        h = self._maybe_norm(head_emb)
        t = self._pool(self._maybe_norm(tail_emb))
        return -self.reduce_embedding(
            t * r_t[:, None, :] - (h * r_h + r_m)[:, None, :]
        )


class DistMult(MatrixDecompositionScoreFunction):
    """DistMult: ``⟨h, r, t⟩`` (reference ``besskge/scoring.py:746-837``)."""

    def __init__(
        self,
        negative_sample_sharing: bool,
        sharding: Sharding,
        n_relation_type: int,
        embedding_size: int,
        entity_initializer: TableOrInit = None,  # type: ignore[assignment]
        relation_initializer: TableOrInit = None,  # type: ignore[assignment]
        inverse_relations: bool = False,
        seed: int = 0,
        dtype: Any = np.float32,
    ) -> None:
        super().__init__(negative_sample_sharing)
        self.embedding_size = embedding_size
        self._build_tables(
            sharding,
            n_relation_type,
            inverse_relations,
            entity_initializer if entity_initializer is not None else [init_KGE_uniform],
            [embedding_size],
            relation_initializer
            if relation_initializer is not None
            else [init_KGE_uniform],
            [embedding_size],
            seed,
            dtype,
        )

    def score_triple(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        return self.reduce_embedding(head_emb * r * tail_emb)

    def score_heads(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        return self.broadcasted_dot_product(r * tail_emb, head_emb)

    def score_tails(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        return self.broadcasted_dot_product(head_emb * r, tail_emb)


class ComplEx(MatrixDecompositionScoreFunction):
    """ComplEx: ``Re⟨h, r, t̄⟩`` on blocked complex rows
    (reference ``besskge/scoring.py:840-946``)."""

    def __init__(
        self,
        negative_sample_sharing: bool,
        sharding: Sharding,
        n_relation_type: int,
        embedding_size: int,
        entity_initializer: TableOrInit = None,  # type: ignore[assignment]
        relation_initializer: TableOrInit = None,  # type: ignore[assignment]
        inverse_relations: bool = False,
        seed: int = 0,
        dtype: Any = np.float32,
    ) -> None:
        super().__init__(negative_sample_sharing)
        self.embedding_size = embedding_size
        self._build_tables(
            sharding,
            n_relation_type,
            inverse_relations,
            entity_initializer if entity_initializer is not None else [init_KGE_normal],
            [2 * embedding_size],
            relation_initializer
            if relation_initializer is not None
            else [init_KGE_normal],
            [2 * embedding_size],
            seed,
            dtype,
        )

    def score_triple(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        return self.reduce_embedding(
            complex_multiplication(head_emb, r) * tail_emb
        )

    def score_heads(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        re, im = jnp.split(r, 2, axis=-1)
        r_conj = jnp.concatenate([re, -im], axis=-1)
        return self.broadcasted_dot_product(
            complex_multiplication(r_conj, tail_emb), head_emb
        )

    def score_tails(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        return self.broadcasted_dot_product(
            complex_multiplication(head_emb, r), tail_emb
        )


def _kaiming_uniform(
    shape: Sequence[int], rng: np.random.Generator, fan_in: int
) -> np.ndarray:
    bound = float(np.sqrt(1.0 / fan_in))
    return rng.uniform(-bound, bound, size=shape).astype(np.float32)


class ConvE(MatrixDecompositionScoreFunction):
    """ConvE: 2-D convolution over stacked [h; r] reshaped maps, dot with t
    plus a learned tail bias (reference ``besskge/scoring.py:949-1146``).

    Tail-corruption only (use with inverse triples for head queries). On TPU
    the conv runs in NHWC via ``lax.conv_general_dilated``. BatchNorm uses
    batch statistics when ``train=True`` (per device by default — matching
    the reference's per-IPU-replica torch BN; set ``sync_batch_norm=True``
    to ``pmean`` mean/E[x²] over the mesh axis for global-batch statistics);
    for inference the running stats in the params pytree are used. The
    training step refreshes them with a torch-style momentum EMA every step
    (see ``trainer._apply_bn_ema``); :meth:`update_bn_stats` remains for
    offline refresh. EMA inputs are computed dropout-free, once per device
    step over all micro-batches' positive (h, r) pairs.
    """

    def __init__(
        self,
        negative_sample_sharing: bool,
        sharding: Sharding,
        n_relation_type: int,
        embedding_size: int,
        embedding_height: int,
        embedding_width: int,
        entity_initializer: TableOrInit = None,  # type: ignore[assignment]
        relation_initializer: TableOrInit = None,  # type: ignore[assignment]
        inverse_relations: bool = True,
        input_channels: int = 1,
        output_channels: int = 32,
        kernel_height: int = 3,
        kernel_width: int = 3,
        input_dropout: float = 0.2,
        feature_map_dropout: float = 0.2,
        hidden_dropout: float = 0.3,
        batch_normalization: bool = True,
        sync_batch_norm: bool = False,
        seed: int = 0,
        dtype: Any = np.float32,
    ) -> None:
        super().__init__(negative_sample_sharing)
        self.sync_batch_norm = sync_batch_norm
        if input_channels * embedding_height * embedding_width != embedding_size:
            raise ValueError(
                "embedding_size must equal"
                " input_channels * embedding_height * embedding_width"
            )
        self.embedding_size = embedding_size
        self.inp_channels = input_channels
        self.out_channels = output_channels
        self.emb_h = embedding_height
        self.emb_w = embedding_width
        self.kernel_h = kernel_height
        self.kernel_w = kernel_width
        self.p_in, self.p_fm, self.p_hid = (
            input_dropout,
            feature_map_dropout,
            hidden_dropout,
        )
        self.batch_norm = batch_normalization
        # Entity row: [embedding, tail-bias scalar].
        self._build_tables(
            sharding,
            n_relation_type,
            inverse_relations,
            entity_initializer
            if entity_initializer is not None
            else [init_xavier_norm, init_zeros],
            [embedding_size, 1],
            relation_initializer
            if relation_initializer is not None
            else [init_xavier_norm],
            [embedding_size],
            seed,
            dtype,
        )
        rng = np.random.default_rng(seed + 2)
        fc_in = (
            output_channels
            * (2 * embedding_height - kernel_height + 1)
            * (embedding_width - kernel_width + 1)
        )
        self.fc_in = fc_in
        fan_conv = input_channels * kernel_height * kernel_width
        self._net_params: Params = {
            # HWIO layout for lax.conv.
            "conv_w": _kaiming_uniform(
                (kernel_height, kernel_width, input_channels, output_channels),
                rng,
                fan_conv,
            ),
            "conv_b": _kaiming_uniform((output_channels,), rng, fan_conv),
            "fc_w": _kaiming_uniform((fc_in, embedding_size), rng, fc_in),
            "fc_b": _kaiming_uniform((embedding_size,), rng, fc_in),
        }
        if batch_normalization:
            for name, n in (
                ("bn0", input_channels),
                ("bn1", output_channels),
                ("bn2", embedding_size),
            ):
                self._net_params[name] = {
                    "scale": np.ones(n, np.float32),
                    "bias": np.zeros(n, np.float32),
                    "mean": np.zeros(n, np.float32),
                    "var": np.ones(n, np.float32),
                }

    def _extra_params(self) -> Params:
        return jax.tree.map(lambda x: x, self._net_params)

    def _batch_stats(self, x, axes, sync):
        """(mean, var) of a batch; with ``sync``, pmean'd over the mesh axis
        for exact global-batch statistics (equal per-device batch sizes)."""
        mean = jnp.mean(x, axis=axes)
        sq = jnp.mean(jnp.square(x), axis=axes)
        if sync and self.mesh_axis is not None:
            mean = jax.lax.pmean(mean, self.mesh_axis)
            sq = jax.lax.pmean(sq, self.mesh_axis)
        return mean, sq - jnp.square(mean)

    def _bn(self, x, stats, train, axes):
        if train:
            mean, var = self._batch_stats(x, axes, self.sync_batch_norm)
        else:
            mean, var = stats["mean"], stats["var"]
        inv = jax.lax.rsqrt(var + 1e-5)
        return (x - mean) * (inv * stats["scale"]) + stats["bias"]

    @staticmethod
    def _dropout(x, rate, train, rng):
        if not train or rate == 0.0 or rng is None:
            return x
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), 0.0)

    def hr_transform(
        self,
        params: Params,
        head_emb: jnp.ndarray,
        relation_emb: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """The conv/BN/FC trunk mapping [h; r] to a query vector (B, d)."""
        b = head_emb.shape[0]
        # NHWC: stack head map above relation map.
        h_map = head_emb.reshape(b, self.inp_channels, self.emb_h, self.emb_w)
        r_map = relation_emb.reshape(b, self.inp_channels, self.emb_h, self.emb_w)
        x = jnp.concatenate([h_map, r_map], axis=2).transpose(0, 2, 3, 1)
        rngs = (
            list(jax.random.split(rng, 3)) if rng is not None else [None] * 3
        )
        if self.batch_norm:
            x = self._bn(x, params["bn0"], train, axes=(0, 1, 2))
        x = self._dropout(x, self.p_in, train, rngs[0])
        x = (
            jax.lax.conv_general_dilated(
                x,
                params["conv_w"].astype(x.dtype),
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            + params["conv_b"].astype(x.dtype)
        )
        if self.batch_norm:
            x = self._bn(x, params["bn1"], train, axes=(0, 1, 2))
        x = jax.nn.relu(x)
        if train and self.p_fm > 0.0 and rngs[1] is not None:
            # Dropout2d: drop whole channels.
            keep = jax.random.bernoulli(
                rngs[1], 1.0 - self.p_fm, (b, 1, 1, x.shape[-1])
            )
            x = jnp.where(keep, x / (1.0 - self.p_fm), 0.0)
        # NHWC -> NCHW flatten to match the torch Linear's input ordering.
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)
        x = jnp.dot(
            x, params["fc_w"].astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype) + params["fc_b"].astype(x.dtype)
        x = self._dropout(x, self.p_hid, train, rngs[2])
        if self.batch_norm:
            x = self._bn(x, params["bn2"], train, axes=(0,))
        return jax.nn.relu(x)

    def update_bn_stats(
        self,
        params: Params,
        head_emb,
        relation_id,
        momentum: float = 0.1,
        sync: bool = False,
    ) -> Params:
        """Refresh BN running stats from one (large) batch of (h, r) inputs.

        ``sync=True`` (used by the in-step EMA under ``shard_map``) pmeans
        the statistics over the mesh axis: running stats are REPLICATED
        params, so every shard must write the same value."""
        if not self.batch_norm:
            return params
        r = self.relation_embedding(params, relation_id)
        b = head_emb.shape[0]
        h_map = head_emb[..., :-1].reshape(
            b, self.inp_channels, self.emb_h, self.emb_w
        )
        r_map = r.reshape(b, self.inp_channels, self.emb_h, self.emb_w)
        x = jnp.concatenate([h_map, r_map], axis=2).transpose(0, 2, 3, 1)
        new = dict(params)

        def upd(stats, x, axes):
            m, v = self._batch_stats(x, axes, sync)
            return {
                **stats,
                "mean": (1 - momentum) * stats["mean"] + momentum * m,
                "var": (1 - momentum) * stats["var"] + momentum * v,
            }

        new["bn0"] = upd(params["bn0"], x, (0, 1, 2))
        x = self._bn(x, new["bn0"], False, (0, 1, 2))
        x = (
            jax.lax.conv_general_dilated(
                x,
                params["conv_w"].astype(x.dtype),
                (1, 1),
                "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + params["conv_b"].astype(x.dtype)
        )
        new["bn1"] = upd(params["bn1"], x, (0, 1, 2))
        x = jax.nn.relu(self._bn(x, new["bn1"], False, (0, 1, 2)))
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)
        x = jnp.dot(x, params["fc_w"].astype(x.dtype)) + params["fc_b"].astype(
            x.dtype
        )
        new["bn2"] = upd(params["bn2"], x, (0,))
        return new

    def score_triple(
        self, params, head_emb, relation_id, tail_emb, *, train=False, rng=None, **kw
    ):
        r = self.relation_embedding(params, relation_id)
        hr = self.hr_transform(params, head_emb[..., :-1], r, train, rng)
        t, t_bias = tail_emb[..., :-1], tail_emb[..., -1]
        return self.reduce_embedding(hr * t) + t_bias

    def score_heads(self, params, head_emb, relation_id, tail_emb, **kw):
        raise NotImplementedError("ConvE should not be used with head corruption")

    def score_tails(
        self, params, head_emb, relation_id, tail_emb, *, train=False, rng=None, **kw
    ):
        r = self.relation_embedding(params, relation_id)
        hr = self.hr_transform(params, head_emb[..., :-1], r, train, rng)
        t, t_bias = tail_emb[..., :-1], tail_emb[..., -1]
        if self.negative_sample_sharing:
            t_bias = t_bias.reshape(1, -1)
        return self.broadcasted_dot_product(hr, t) + t_bias


class BoxE(DistanceBasedScoreFunction):
    """BoxE: two-box distance with tanh bounding and per-dim in/out switch
    (reference ``besskge/scoring.py:1149-1415``)."""

    def __init__(
        self,
        negative_sample_sharing: bool,
        scoring_norm: int,
        sharding: Sharding,
        n_relation_type: int,
        embedding_size: int,
        entity_initializer: TableOrInit = None,  # type: ignore[assignment]
        relation_initializer: TableOrInit = None,  # type: ignore[assignment]
        apply_tanh: bool = True,
        dist_func_per_dim: bool = True,
        eps: float = 1e-6,
        inverse_relations: bool = False,
        seed: int = 0,
        dtype: Any = np.float32,
    ) -> None:
        super().__init__(negative_sample_sharing, scoring_norm)
        self.embedding_size = embedding_size
        self.apply_tanh = apply_tanh
        self.dist_func_per_dim = dist_func_per_dim
        self.eps = eps
        ent_init = (
            entity_initializer if entity_initializer is not None else [init_uniform]
        )
        if isinstance(ent_init, list):
            ent_init = 2 * ent_init
        rel_init = (
            relation_initializer
            if relation_initializer is not None
            else [init_uniform, init_uniform_norm]
        )
        if isinstance(rel_init, list):
            rel_init = 4 * [rel_init[0]] + 2 * [rel_init[1]]
        # Entity row: [base position (d), translational bump (d)].
        # Relation row: [head center, tail center, head width, tail width,
        #                head size, tail size] = 4d + 2.
        self._build_tables(
            sharding,
            n_relation_type,
            inverse_relations,
            ent_init,
            [embedding_size, embedding_size],
            rel_init,
            [embedding_size] * 4 + [1, 1],
            seed,
            dtype,
        )

    def boxe_score(self, bumped_ht, center_ht, width_ht, box_size):
        """Negative sum of head and tail box distances; shapes as in
        reference ``besskge/scoring.py:1253-1345``."""
        d = self.embedding_size
        width_ht = jnp.abs(width_ht)
        # Geometric-mean normalization of widths, softened by eps.
        log_w = jnp.log(jnp.maximum(width_ht, self.eps))
        width_ht = width_ht / jnp.maximum(
            jnp.exp(jnp.mean(log_w, axis=-1, keepdims=True)), self.eps
        )
        scale = 1.0 + jax.nn.elu(box_size[..., None].astype(jnp.float32)).astype(
            width_ht.dtype
        )
        width_ht = width_ht * scale

        if self.apply_tanh:
            box_low = jnp.tanh(center_ht - 0.5 * width_ht)
            box_up = jnp.tanh(box_low + width_ht)
            center_ht = 0.5 * (box_low + box_up)
            width_ht = box_up - box_low
            center_dist = jnp.abs(jnp.tanh(bumped_ht) - center_ht)
        else:
            center_dist = jnp.abs(bumped_ht - center_ht)

        width_p1 = 1.0 + width_ht
        k = 0.5 * width_ht * (width_p1 - 1.0 / width_p1)
        in_box = center_dist <= 0.5 * width_ht
        if not self.dist_func_per_dim:
            in_box = jnp.all(in_box, axis=-1, keepdims=True)
        final = jnp.where(in_box, center_dist / width_p1, center_dist * width_p1 - k)
        del d
        return -jnp.sum(self.reduce_embedding(final), axis=-1)

    def _split_rel(self, params, relation_id):
        r = self.relation_embedding(params, relation_id)
        d = self.embedding_size
        return r[..., : 2 * d], r[..., 2 * d : 4 * d], r[..., 4 * d :]

    def score_triple(self, params, head_emb, relation_id, tail_emb, **kw):
        center, width, size = self._split_rel(params, relation_id)
        d = self.embedding_size
        # Element 0: head bumped by tail's bump (vs head box);
        # element 1: tail bumped by head's bump (vs tail box).
        bumped = (
            head_emb.reshape(-1, 2, d)
            + tail_emb.reshape(-1, 2, d)[:, ::-1, :]
        )
        return self.boxe_score(
            bumped,
            center.reshape(-1, 2, d),
            width.reshape(-1, 2, d),
            size.reshape(-1, 2),
        )

    def score_heads(self, params, head_emb, relation_id, tail_emb, **kw):
        center, width, size = self._split_rel(params, relation_id)
        d = self.embedding_size
        h = self._pool(head_emb)
        bumped = (
            h.reshape(h.shape[0], -1, 2, d)
            + tail_emb.reshape(-1, 1, 2, d)[:, :, ::-1, :]
        )
        return self.boxe_score(
            bumped,
            center.reshape(-1, 1, 2, d),
            width.reshape(-1, 1, 2, d),
            size.reshape(-1, 1, 2),
        )

    def score_tails(self, params, head_emb, relation_id, tail_emb, **kw):
        center, width, size = self._split_rel(params, relation_id)
        d = self.embedding_size
        t = self._pool(tail_emb)
        bumped = (
            head_emb.reshape(-1, 1, 2, d)
            + t.reshape(t.shape[0], -1, 2, d)[:, :, ::-1, :]
        )
        return self.boxe_score(
            bumped,
            center.reshape(-1, 1, 2, d),
            width.reshape(-1, 1, 2, d),
            size.reshape(-1, 1, 2),
        )


class InterHT(DistanceBasedScoreFunction):
    """InterHT: ``-||h ∘ (t̂+off) + r − t ∘ (ĥ+off)||_p``
    (reference ``besskge/scoring.py:1418-1572``)."""

    def __init__(
        self,
        negative_sample_sharing: bool,
        scoring_norm: int,
        sharding: Sharding,
        n_relation_type: int,
        embedding_size: int,
        entity_initializer: TableOrInit = None,  # type: ignore[assignment]
        relation_initializer: TableOrInit = None,  # type: ignore[assignment]
        normalize_entities: bool = True,
        offset: float = 1.0,
        inverse_relations: bool = False,
        seed: int = 0,
        dtype: Any = np.float32,
    ) -> None:
        super().__init__(negative_sample_sharing, scoring_norm)
        self.embedding_size = embedding_size
        self.normalize = normalize_entities
        self.offset = float(offset)
        ent_init = (
            entity_initializer if entity_initializer is not None else [init_KGE_uniform]
        )
        if isinstance(ent_init, list):
            ent_init = 2 * ent_init
        # Entity row: [main embedding (d), auxiliary embedding (d)].
        self._build_tables(
            sharding,
            n_relation_type,
            inverse_relations,
            ent_init,
            [embedding_size, embedding_size],
            relation_initializer
            if relation_initializer is not None
            else [init_KGE_uniform],
            [embedding_size],
            seed,
            dtype,
        )

    def _split_ent(self, v):
        main, aux = jnp.split(v, 2, axis=-1)
        if self.normalize:
            main, aux = _l2_normalize(main), _l2_normalize(aux)
        return main, aux

    def score_triple(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        h, h_aux = self._split_ent(head_emb)
        t, t_aux = self._split_ent(tail_emb)
        return -self.reduce_embedding(
            h * (t_aux + self.offset) + r - t * (h_aux + self.offset)
        )

    def score_heads(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        h, h_aux = self._split_ent(head_emb)
        t, t_aux = self._split_ent(tail_emb)
        h, h_aux = self._pool(h), self._pool(h_aux)
        return -self.reduce_embedding(
            h * (t_aux + self.offset)[:, None, :]
            + r[:, None, :]
            - t[:, None, :] * (h_aux + self.offset)
        )

    def score_tails(self, params, head_emb, relation_id, tail_emb, **kw):
        r = self.relation_embedding(params, relation_id)
        h, h_aux = self._split_ent(head_emb)
        t, t_aux = self._split_ent(tail_emb)
        t, t_aux = self._pool(t), self._pool(t_aux)
        return -self.reduce_embedding(
            h[:, None, :] * (t_aux + self.offset)
            + r[:, None, :]
            - t * (h_aux + self.offset)[:, None, :]
        )


class TranS(DistanceBasedScoreFunction):
    """TranS: ``-||h ∘ (t̃+off+r̄) − t ∘ (h̃+off−r̂) + r||_p``
    (reference ``besskge/scoring.py:1575-1751``)."""

    def __init__(
        self,
        negative_sample_sharing: bool,
        scoring_norm: int,
        sharding: Sharding,
        n_relation_type: int,
        embedding_size: int,
        entity_initializer: TableOrInit = None,  # type: ignore[assignment]
        relation_initializer: TableOrInit = None,  # type: ignore[assignment]
        normalize_entities: bool = True,
        offset: float = 1.0,
        inverse_relations: bool = False,
        seed: int = 0,
        dtype: Any = np.float32,
    ) -> None:
        super().__init__(negative_sample_sharing, scoring_norm)
        self.embedding_size = embedding_size
        self.normalize = normalize_entities
        self.offset = float(offset)
        ent_init = (
            entity_initializer if entity_initializer is not None else [init_KGE_uniform]
        )
        if isinstance(ent_init, list):
            ent_init = 2 * ent_init
        rel_init = (
            relation_initializer
            if relation_initializer is not None
            else [init_KGE_uniform]
        )
        if isinstance(rel_init, list):
            rel_init = 3 * rel_init
        # Entity row: [main embedding (d), tilde embedding (d)].
        # Relation row: [r, r_bar, r_hat].
        self._build_tables(
            sharding,
            n_relation_type,
            inverse_relations,
            ent_init,
            [embedding_size, embedding_size],
            rel_init,
            [embedding_size] * 3,
            seed,
            dtype,
        )

    def _split_ent(self, v):
        main, tilde = jnp.split(v, 2, axis=-1)
        if self.normalize:
            main, tilde = _l2_normalize(main), _l2_normalize(tilde)
        return main, tilde

    def score_triple(self, params, head_emb, relation_id, tail_emb, **kw):
        rel = self.relation_embedding(params, relation_id)
        r, r_bar, r_hat = jnp.split(rel, 3, axis=-1)
        h, h_tilde = self._split_ent(head_emb)
        t, t_tilde = self._split_ent(tail_emb)
        return -self.reduce_embedding(
            h * (t_tilde + self.offset + r_bar)
            - t * (h_tilde + self.offset - r_hat)
            + r
        )

    def score_heads(self, params, head_emb, relation_id, tail_emb, **kw):
        rel = self.relation_embedding(params, relation_id)
        r, r_bar, r_hat = jnp.split(rel, 3, axis=-1)
        h, h_tilde = self._split_ent(head_emb)
        t, t_tilde = self._split_ent(tail_emb)
        h, h_tilde = self._pool(h), self._pool(h_tilde)
        return -self.reduce_embedding(
            h * (t_tilde + self.offset + r_bar)[:, None, :]
            - t[:, None, :] * (h_tilde + self.offset - r_hat[:, None, :])
            + r[:, None, :]
        )

    def score_tails(self, params, head_emb, relation_id, tail_emb, **kw):
        rel = self.relation_embedding(params, relation_id)
        r, r_bar, r_hat = jnp.split(rel, 3, axis=-1)
        h, h_tilde = self._split_ent(head_emb)
        t, t_tilde = self._split_ent(tail_emb)
        t, t_tilde = self._pool(t), self._pool(t_tilde)
        return -self.reduce_embedding(
            h[:, None, :] * (t_tilde + self.offset + r_bar[:, None, :])
            - t * (h_tilde + self.offset - r_hat)[:, None, :]
            + r[:, None, :]
        )
