"""1-D device mesh and sharding specs for BESS.

The whole framework uses a single named mesh axis ``"shard"`` that carries,
simultaneously, data parallelism (each device scores a disjoint slice of the
batch) and embedding-table model parallelism (one entity-table shard per
device) — the TPU-native expression of the reference's replica-grouped
variables (``poptorch replicaGrouping``, notebook 1 cell 28). Multi-host
slices extend the same axis over DCN with an identical program.

This replaces the reference's PopART/GCL backend
(``/root/reference/besskge/bess.py:14-19`` and
``custom_ops/remove_all_reduce_pattern.cpp``): under ``shard_map`` the entity
table is a per-device distinct block, so no spurious all-reduce over its
gradient can ever be emitted — see
:func:`besskge_tpu.parallel.hlo_check.assert_no_entity_allreduce` for the
compile-time audit utility.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_shard_mesh",
    "param_partition_specs",
    "batch_partition_specs",
    "shard_params",
    "shard_batch",
    "replicate_tree",
]

AXIS = "shard"


def make_shard_mesh(
    n_shard: int, devices: Optional[list] = None
) -> Mesh:
    """A 1-D ``("shard",)`` mesh over the first ``n_shard`` devices."""
    devices = devices if devices is not None else jax.devices()[:n_shard]
    if len(devices) != n_shard:
        raise ValueError(
            f"Requested {n_shard} shards but got {len(devices)} devices"
        )
    return Mesh(np.asarray(devices), (AXIS,))


def param_partition_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Entity table is sharded on its leading (shard) axis; every other
    parameter (relation table, ConvE trunk, optimizer state for them) is
    replicated."""
    return {
        k: (P(AXIS) if k == "entity_embedding" else jax.tree.map(lambda _: P(), v))
        for k, v in params.items()
    }


def batch_partition_specs(batch: Dict[str, Any]) -> Dict[str, Any]:
    """All batch arrays produced by the samplers have layout
    ``(bps, shard, ...)`` with axis 1 mapping to the device axis."""
    return {k: P(None, AXIS) for k in batch}


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place the params pytree on the mesh (entity table split per device)."""
    specs = param_partition_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, (np.ndarray, jax.Array)),
    )


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Move a host batch dict onto the mesh, split along axis 1."""
    return {
        k: jax.device_put(v, NamedSharding(mesh, P(None, AXIS)))
        for k, v in batch.items()
    }


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree fully replicated on every mesh device (e.g. the
    :class:`~besskge_tpu.device_sampler.DeviceBatchSampler` state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
