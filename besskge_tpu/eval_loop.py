"""Blocked device-resident evaluation driver.

Candidate-set evaluation (``ScoreMovingBessKGE`` + ``TripleBased``
negatives, the reference's notebook-1/3 validation loop) is dominated on a
network-attached TPU not by scoring but by the per-step host round trip:
assemble a numpy batch, ship ~10 MB of negative indices/masks H2D, dispatch,
fetch. Measured ~270 ms per step against ~3 ms of device work.

:func:`run_device_eval` keeps the exact semantics of looping a
``RigidShardedBatchSampler`` through :func:`besskge_tpu.bess.
build_bess_forward` — same batches, same masks, same metric sums — but
ships a BLOCK of steps in one transfer and consumes it with one compiled
dispatch (``lax.fori_loop`` over the step axis), returning only the
accumulated metric sums. The ragged final block is padded with zeroed
``triple_mask`` steps so one program serves every block.

Reference counterpart: the host-side per-batch poptorch inference loop
(``/root/reference/notebooks/1_biokg_training_inference.ipynb`` cell 33,
``3_wikikg2_fp16.ipynb`` cell 32); this is its TPU-native replacement.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from besskge_tpu.bess import (
    BessKGE,
    _FORWARD_KEYS,
    _device_step,
    _format_outputs,
)
from besskge_tpu.parallel.mesh import param_partition_specs

__all__ = ["run_device_eval", "make_block_runner"]


def make_block_runner(bess: "BessKGE", mesh: Optional[Mesh] = None):
    """The jitted evaluator of one device-resident step-block.

    ``run_block(params, block) -> (n_metric,) metric sums``, where
    ``block`` stacks ``steps_per_block`` forward batches on a leading
    axis (``lax.fori_loop`` consumes it step by step on device). Exposed
    separately from :func:`run_device_eval` so callers can pre-stage
    blocks and time pure device throughput (``bench.py run_valid``).
    """
    ev = bess.evaluation
    n_metric = len(ev.metrics)

    def block_fn(p, block):
        n_steps = next(iter(block.values())).shape[0]

        def body(i, acc):
            batch = {
                k: jax.lax.dynamic_index_in_dim(v, i, 0, keepdims=False)
                for k, v in block.items()
            }
            outs = _device_step(bess, p, batch, train=False)
            m = _format_outputs(bess, outs)["metrics"]  # (bps, 1, n_metric)
            return acc + jnp.sum(m, axis=(0, 1))

        return jax.lax.fori_loop(
            0, n_steps, body, jnp.zeros((n_metric,), jnp.float32)
        )

    if mesh is None:
        if bess.axis_name is not None:
            raise ValueError("A mesh is required unless axis_name is None")
        return jax.jit(block_fn)

    @jax.jit
    def run_block(p, block):
        p_specs = param_partition_specs(p)
        b_specs = {k: P(None, None, "shard") for k in block}
        mapped = jax.shard_map(
            block_fn,
            mesh=mesh,
            in_specs=(p_specs, b_specs),
            out_specs=P(),
            check_vma=False,
        )
        return mapped(p, block)

    return run_block


def run_device_eval(
    bess: BessKGE,
    params: Dict[str, Any],
    batch_sampler,
    mesh: Optional[Mesh] = None,
    steps_per_block: int = 16,
) -> Tuple[Dict[str, float], int]:
    """Evaluate one full pass of ``batch_sampler`` with blocked dispatches.

    :param bess: an inference BESS module with an ``evaluation`` whose
        reduction is ``"sum"`` (metrics leave the device as global sums).
    :param params: model params (sharded when ``mesh`` is given).
    :param batch_sampler: a host batch sampler with a deterministic pass
        and a ``triple_mask`` output (``RigidShardedBatchSampler``).
    :param mesh: device mesh, or ``None`` single-device.
    :param steps_per_block: steps fused per transfer+dispatch (bounds the
        device-resident block to ``steps_per_block`` × per-step bytes).
    :return: ``(metrics dict averaged per query, n_queries)``.
    """
    ev = bess.evaluation
    if ev is None:
        raise ValueError("bess.evaluation is required for run_device_eval")
    if ev.reduction(jnp.zeros((2,))).ndim != 0:
        raise ValueError('run_device_eval needs reduction="sum"')
    n_metric = len(ev.metrics)
    run_block = make_block_runner(bess, mesh)
    totals = np.zeros(n_metric, np.float64)
    n_queries = 0
    buf = []

    def flush():
        nonlocal totals
        if not buf:
            return
        pad = steps_per_block - len(buf)
        steps = buf + [
            {
                k: (np.zeros_like(v) if k == "triple_mask" else v)
                for k, v in buf[-1].items()
            }
        ] * pad
        block = {
            k: jnp.asarray(np.stack([s[k] for s in steps]))
            for k in steps[0]
        }
        totals += np.asarray(run_block(params, block), np.float64)
        buf.clear()

    for batch in batch_sampler.get_dataloader(shuffle=False):
        fwd = {k: v for k, v in batch.items() if k in _FORWARD_KEYS}
        if "triple_mask" not in fwd:
            raise ValueError(
                "run_device_eval needs triple_mask (use "
                "RigidShardedBatchSampler)"
            )
        n_queries += int(fwd["triple_mask"].sum())
        buf.append(fwd)
        if len(buf) == steps_per_block:
            flush()
    flush()

    metrics = {
        name: float(t / max(n_queries, 1))
        for name, t in zip(ev.metrics.keys(), totals)
    }
    return metrics, n_queries
