"""Device-mesh utilities and collective wrappers for the BESS scheme."""

from besskge_tpu.parallel.mesh import (  # noqa: F401
    batch_partition_specs,
    make_shard_mesh,
    param_partition_specs,
    shard_batch,
    shard_params,
)
