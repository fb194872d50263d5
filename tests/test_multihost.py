"""Single-process checks of the multi-host glue (mesh ordering, local shard
ranges, batch assembly fallback)."""

import numpy as np

from besskge_tpu.parallel.multihost import (
    local_shard_range,
    make_global_mesh,
    shard_batch_multihost,
)


def test_global_mesh_and_ranges():
    mesh = make_global_mesh(4)
    assert mesh.devices.size == 4
    lo, hi = local_shard_range(mesh)
    assert (lo, hi) == (0, 4)  # single process owns everything


def test_shard_batch_multihost_single_process():
    mesh = make_global_mesh(4)
    batch = {"head": np.zeros((2, 4, 8), np.int32)}
    out = shard_batch_multihost(batch, mesh)
    assert out["head"].shape == (2, 4, 8)
    assert len(out["head"].sharding.device_set) == 4
