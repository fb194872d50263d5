"""Embedding-table initialization and re-sharding (host-side, numpy).

Builds the sharded entity table ``(n_shard, max_entity_per_shard, row_size)``
— laid out so axis 0 maps 1:1 onto the ``("shard",)`` device-mesh axis — and
the replicated relation table ``(n_relation_type, row_size)``.

Capability parity with reference ``besskge/embedding.py:15-290``
(graphcore-research/bess-kge). Tables are plain ``np.float32`` arrays here;
the training step moves them to device with a ``NamedSharding`` placing one
table shard per chip.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Union

import numpy as np
from numpy.typing import NDArray

from besskge_tpu.sharding import Sharding

__all__ = [
    "init_uniform",
    "init_zeros",
    "init_uniform_norm",
    "init_xavier_norm",
    "init_uniform_rotation",
    "init_KGE_uniform",
    "init_KGE_normal",
    "initialize_entity_embedding",
    "initialize_relation_embedding",
    "refactor_embedding_sharding",
]

#: An initializer fills a shape using the provided RNG.
Initializer = Callable[[Sequence[int], np.random.Generator], NDArray[np.float32]]


def init_uniform(
    shape: Sequence[int], rng: np.random.Generator
) -> NDArray[np.float32]:
    """Plain uniform [0, 1) (the reference's ``torch.nn.init.uniform_``
    default, used by BoxE)."""
    return rng.random(size=tuple(shape), dtype=np.float32)


def init_zeros(
    shape: Sequence[int], rng: np.random.Generator
) -> NDArray[np.float32]:
    """All-zero initializer (ConvE tail biases)."""
    return np.zeros(shape, dtype=np.float32)


def init_uniform_norm(
    shape: Sequence[int], rng: np.random.Generator
) -> NDArray[np.float32]:
    """Uniform [0,1) rows normalized to unit L2 norm
    (reference ``besskge/embedding.py:15-28``)."""
    x = rng.random(size=tuple(shape), dtype=np.float32)
    norm = np.linalg.norm(x, axis=-1, keepdims=True).astype(np.float32)
    return x / np.maximum(norm, np.float32(1e-12))


def init_xavier_norm(
    shape: Sequence[int], rng: np.random.Generator, gain: float = 1.0
) -> NDArray[np.float32]:
    """Xavier/Glorot normal over the last dimension
    (reference ``besskge/embedding.py:31-47``)."""
    std = gain * float(np.sqrt(2.0 / (shape[-1] + 1)))
    return rng.standard_normal(tuple(shape), dtype=np.float32) * np.float32(std)


def init_uniform_rotation(
    shape: Sequence[int], rng: np.random.Generator
) -> NDArray[np.float32]:
    """Uniform rotation phases in [0, 2π)
    (reference ``besskge/embedding.py:50-62``)."""
    return rng.random(size=tuple(shape), dtype=np.float32) * np.float32(2.0 * np.pi)


def init_KGE_uniform(
    shape: Sequence[int], rng: np.random.Generator, b: float = 1.0,
    divide_by_embedding_size: bool = True,
) -> NDArray[np.float32]:
    """Uniform in ±b (optionally ±b/row_size)
    (reference ``besskge/embedding.py:65-84``)."""
    if divide_by_embedding_size:
        b = b / shape[-1]
    x = rng.random(size=tuple(shape), dtype=np.float32)
    return (2.0 * x - 1.0) * np.float32(b)


def init_KGE_normal(
    shape: Sequence[int], rng: np.random.Generator, std: float = 1.0,
    divide_by_embedding_size: bool = True,
) -> NDArray[np.float32]:
    """Normal with σ=std (optionally std/row_size)
    (reference ``besskge/embedding.py:87-104``)."""
    if divide_by_embedding_size:
        std = std / shape[-1]
    return rng.standard_normal(tuple(shape), dtype=np.float32) * np.float32(std)


def _build_sliced(
    shape: Sequence[int],
    initializers: List[Initializer],
    row_sizes: List[int],
    rng: np.random.Generator,
) -> NDArray[np.float32]:
    if len(initializers) != len(row_sizes):
        raise ValueError(
            f"Got {len(initializers)} initializers for {len(row_sizes)} row slices"
        )
    if len(initializers) == 1:
        # No concat copy for single-slice rows (the common case; matters at
        # multi-GB table scale).
        return initializers[0](tuple(shape), rng)
    slices = [
        fn(tuple(shape[:-1]) + (size,), rng)
        for fn, size in zip(initializers, row_sizes)
    ]
    return np.concatenate(slices, axis=-1)


def initialize_entity_embedding(
    sharding: Sharding,
    initializer: Union[NDArray[np.float32], List[Initializer]],
    row_size: List[int],
    seed: int = 0,
) -> NDArray[np.float32]:
    """Build the sharded entity table ``(n_shard, max_entity_per_shard, Σrow)``.

    ``initializer`` is either a list of initializer functions — one per row
    slice in ``row_size`` (e.g. ``[init_KGE_uniform, init_uniform_rotation]``
    for BoxE-style multi-part rows) — or a pre-trained table: 2-D
    ``(n_entity, row)`` (unsharded; rows are permuted into shards through
    ``shard_and_idx_to_entity``) or 3-D (already sharded, shape-checked).

    Mirrors reference ``besskge/embedding.py:107-190``.
    """
    total = int(sum(row_size))
    shape = (sharding.n_shard, sharding.max_entity_per_shard, total)
    if isinstance(initializer, np.ndarray):
        if initializer.ndim == 3:
            if initializer.shape != shape:
                raise ValueError(
                    f"Pre-sharded table has shape {initializer.shape},"
                    f" expected {shape}"
                )
            return np.ascontiguousarray(initializer, dtype=np.float32)
        if initializer.ndim == 2:
            if initializer.shape[0] != sharding.n_entity:
                raise ValueError(
                    f"Table has {initializer.shape[0]} rows for"
                    f" {sharding.n_entity} entities"
                )
            if initializer.shape[1] != total:
                raise ValueError(
                    f"Table row size {initializer.shape[1]} != sum(row_size)={total}"
                )
            # Permute global rows into (shard, idx) slots; padding slots
            # (global id >= n_entity) are zero.
            ids = sharding.shard_and_idx_to_entity  # (S, rows)
            safe = np.minimum(ids, sharding.n_entity - 1)
            table = initializer[safe].astype(np.float32)
            table[ids >= sharding.n_entity] = 0.0
            return table
        raise ValueError("Entity table must be 2-D or 3-D")

    rng = np.random.default_rng(seed)
    return _build_sliced(shape, initializer, row_size, rng)


def initialize_relation_embedding(
    n_relation_type: int,
    inverse_relations: bool,
    initializer: Union[NDArray[np.float32], List[Initializer]],
    row_size: List[int],
    seed: int = 0,
) -> NDArray[np.float32]:
    """Build the replicated relation table ``(n_relation, Σrow)``.

    With ``inverse_relations`` the row count doubles: relation ``r + n`` is
    the inverse of ``r`` (used with
    :meth:`PartitionedTripleSet.create_from_dataset(add_inverse_triples=True)
    <besskge_tpu.sharding.PartitionedTripleSet.create_from_dataset>`).
    Mirrors reference ``besskge/embedding.py:193-259``.
    """
    n_rows = n_relation_type * 2 if inverse_relations else n_relation_type
    total = int(sum(row_size))
    if isinstance(initializer, np.ndarray):
        if initializer.ndim != 2:
            raise ValueError("Relation table must be 2-D")
        if initializer.shape != (n_rows, total):
            raise ValueError(
                f"Relation table has shape {initializer.shape},"
                f" expected {(n_rows, total)}"
            )
        return np.ascontiguousarray(initializer, dtype=np.float32)
    rng = np.random.default_rng(seed)
    return _build_sliced((n_rows, total), initializer, row_size, rng)


def device_table_init(
    initializer: Union[NDArray[np.float32], List[Initializer]],
    row_sizes: List[int],
    shape: Sequence[int],
    seed: int,
    dtype: "np.dtype",
    sharding: "object" = None,
) -> "object":
    """Generate an embedding table directly on device with ``jax.random``.

    The jax equivalent of each host initializer runs inside one jitted
    program with ``out_shardings`` — at multi-GB table scale this avoids
    both host memory and the host→device transfer entirely. Array
    initializers must already have the target shape (use the host path for
    unsharded 2-D tables that need permutation).
    """
    import jax
    import jax.numpy as jnp

    if isinstance(initializer, np.ndarray):
        if tuple(initializer.shape) != tuple(shape):
            raise ValueError(
                f"Array initializer shape {initializer.shape} != {tuple(shape)};"
                " use initial_params() for unsharded 2-D tables"
            )
        arr = initializer.astype(dtype, copy=False)
        return jax.device_put(arr, sharding) if sharding else jax.device_put(arr)

    def _one(fn: Initializer, key, shp):
        d = shp[-1]
        if fn is init_uniform:
            return jax.random.uniform(key, shp)
        if fn is init_zeros:
            return jnp.zeros(shp)
        if fn is init_uniform_norm:
            x = jax.random.uniform(key, shp)
            return x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
            )
        if fn is init_xavier_norm:
            return jax.random.normal(key, shp) * float(np.sqrt(2.0 / (d + 1)))
        if fn is init_uniform_rotation:
            return jax.random.uniform(key, shp, maxval=2.0 * np.pi)
        if fn is init_KGE_uniform:
            return (2.0 * jax.random.uniform(key, shp) - 1.0) / d
        if fn is init_KGE_normal:
            return jax.random.normal(key, shp) / d
        raise ValueError(
            f"No device equivalent for initializer {fn}; pass a table or use"
            " the host initial_params() path"
        )

    if len(initializer) != len(row_sizes):
        raise ValueError(
            f"Got {len(initializer)} initializers for {len(row_sizes)} slices"
        )

    def gen():
        key = jax.random.PRNGKey(seed)
        parts = [
            _one(fn, jax.random.fold_in(key, i), tuple(shape[:-1]) + (size,))
            for i, (fn, size) in enumerate(zip(initializer, row_sizes))
        ]
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        return out.astype(dtype)

    if sharding is not None:
        return jax.jit(gen, out_shardings=sharding)()
    return jax.jit(gen)()


def refactor_embedding_sharding(
    entity_embedding: NDArray[np.float32],
    old_sharding: Sharding,
    new_sharding: Sharding,
) -> NDArray[np.float32]:
    """Move a trained sharded table to a new device topology.

    Unshards through ``(entity_to_shard, entity_to_idx)`` then re-shards under
    ``new_sharding`` — e.g. collapse a 4-shard trained table to 1 chip for
    inference. Mirrors reference ``besskge/embedding.py:262-290``.
    """
    flat = entity_embedding[
        old_sharding.entity_to_shard, old_sharding.entity_to_idx
    ]
    return initialize_entity_embedding(
        new_sharding, flat, [entity_embedding.shape[-1]]
    )
