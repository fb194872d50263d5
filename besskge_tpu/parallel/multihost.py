"""Multi-host (pod-slice) support.

The BESS program is topology-agnostic: the same 1-D ``("shard",)`` mesh
spans all chips of a multi-host v5e/v5p slice, the n² shard-pair partition
logic only depends on ``n_shard = total chips``, and GSPMD routes the
AllToAll over ICI within a host and DCN across hosts. This module provides
the host-side glue:

* :func:`initialize` — ``jax.distributed`` bring-up (one call per process);
* :func:`make_global_mesh` — the shard mesh over ALL processes' devices;
* :func:`shard_batch_multihost` — build global batch arrays from
  process-local numpy (each host samples only its own devices' slice of the
  batch, exactly like the reference's per-IPU dataloader workers);
* :func:`local_shard_range` — which table shards this process owns (for
  host-side sampling / checkpoint IO).

This extends the reference's ≤16-IPU ceiling (``README.md:94``): the scheme
itself has no topology limit, and TPU HBM removes the SRAM capacity caps.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from besskge_tpu.parallel.mesh import AXIS

__all__ = [
    "initialize",
    "make_global_mesh",
    "local_shard_range",
    "shard_batch_multihost",
    "shard_params_multihost",
]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize ``jax.distributed`` (no-op when already initialized or on
    TPU pods where the args are auto-detected from the environment)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


def make_global_mesh(n_shard: Optional[int] = None) -> Mesh:
    """1-D ``("shard",)`` mesh over all devices of all processes, ordered so
    each process' devices are contiguous (host h owns shards
    ``[h*devices_per_host, (h+1)*devices_per_host)``)."""
    devices = sorted(
        jax.devices(), key=lambda d: (d.process_index, d.id)
    )
    if n_shard is not None:
        devices = devices[:n_shard]
    return Mesh(np.asarray(devices), (AXIS,))


def local_shard_range(mesh: Mesh) -> Tuple[int, int]:
    """[start, stop) table-shard indices owned by this process."""
    devs = list(mesh.devices.ravel())
    mine = [i for i, d in enumerate(devs) if d.process_index == jax.process_index()]
    if not mine:
        return 0, 0
    return min(mine), max(mine) + 1


def shard_batch_multihost(
    local_batch: Dict[str, np.ndarray], mesh: Mesh
) -> Dict[str, jax.Array]:
    """Assemble global batch arrays from process-local slices.

    Each host calls its batch sampler for ITS shards only (slice the
    sampler's axis-1 output with :func:`local_shard_range`) and passes the
    result here; the returned global arrays are addressable only where
    local. Single-process meshes fall back to a plain sharded device_put.
    """
    if jax.process_count() == 1:
        return {
            k: jax.device_put(v, NamedSharding(mesh, P(None, AXIS)))
            for k, v in local_batch.items()
        }
    n_shard = mesh.devices.size
    lo, hi = local_shard_range(mesh)
    out = {}
    for k, v in local_batch.items():
        global_shape = (v.shape[0], n_shard) + v.shape[2:]
        if v.shape[1] != hi - lo:
            raise ValueError(
                f"Batch array '{k}' has {v.shape[1]} local shards; this"
                f" process owns {hi - lo}"
            )
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(None, AXIS)), v, global_shape
        )
    return out


def shard_params_multihost(
    params: Dict[str, np.ndarray], mesh: Mesh
) -> Dict[str, jax.Array]:
    """Place a (host-replicated) params pytree on a multi-process mesh.

    Every process passes the SAME full numpy pytree (cheap: tables at
    multi-host scale should instead restore from a sharded checkpoint or
    init on device); the entity table is split on its leading axis via
    ``make_array_from_callback`` — each process only touches the slices its
    devices need — and everything else is replicated.
    """
    from besskge_tpu.parallel.mesh import param_partition_specs

    specs = param_partition_specs(params)

    def place(x, spec):
        x = np.asarray(x)
        ns = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, ns, lambda idx: x[idx])

    return jax.tree.map(
        place,
        params,
        specs,
        is_leaf=lambda x: isinstance(x, (np.ndarray, jax.Array)),
    )
