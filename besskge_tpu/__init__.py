"""besskge_tpu — TPU-native BESS knowledge-graph-embedding framework.

A from-scratch JAX/XLA/Pallas implementation of the BESS distribution scheme
(Balanced Entity Sampling and Sharing, arXiv:2211.12281) with the capability
surface of graphcore-research/bess-kge: sharded entity tables over a 1-D
device mesh, n² shard-pair balanced batching, a single AllToAll per training
step, 10 KGE scoring functions, sharded negative samplers, windowed top-k /
all-scores inference pipelines, and on-device metrics.
"""

__version__ = "0.1.0"

from besskge_tpu._hostmem import configure_host_allocator

configure_host_allocator()

from besskge_tpu import (  # noqa: F401,E402
    batch_sampler,
    bess,
    checkpoint,
    dataset,
    embedding,
    eval_loop,
    loss,
    metric,
    monitor,
    native,
    negative_sampler,
    optim,
    packed,
    pipeline,
    scoring,
    sharding,
    trainer,
    utils,
)
