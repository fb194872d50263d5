"""Training step and loop for BESS-KGE on a TPU mesh.

Productizes the training recipe that the reference leaves to user notebooks
(``/root/reference/notebooks/1_biokg_training_inference.ipynb`` cells 26-29)
as a ``Trainer`` with a jitted ``shard_map`` train step:

* the whole step — gather → AllToAll → score → loss → backward → optimizer —
  is ONE compiled device program; gradients flow through the collectives via
  their AD transposes, so the entity-table gradient and optimizer state stay
  shard-local (the reference needed a C++ PopART pattern for this,
  ``custom_ops/remove_all_reduce_pattern.cpp``);
* gradients of replicated parameters (relation table, ConvE trunk) are
  ``psum``-reduced over the mesh axis — the data-parallel reduction that
  PopTorch applied implicitly;
* `bps` micro-batches per step (the analog of ``deviceIterations ×
  gradientAccumulation``) are fused with ``vmap`` on a single device, or
  unrolled on the mesh, accumulating gradients.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from besskge_tpu.batch_sampler import ShardedBatchSampler
from besskge_tpu.packed import is_packed, take_rows
from besskge_tpu.bess import BessKGE, _device_step, _format_outputs, _out_specs
from besskge_tpu.optim import EntityRowOptimizer
from besskge_tpu.parallel.mesh import AXIS, batch_partition_specs, param_partition_specs

__all__ = [
    "build_train_step",
    "build_device_train_step",
    "init_optimizer_state",
    "Trainer",
]

Params = Dict[str, Any]


def _opt_state_specs(opt_state: Any, entity_shape: Tuple[int, ...]) -> Any:
    """Optimizer-state leaves that mirror the entity table (Adam moments,
    momentum, ...) are sharded like it; everything else is replicated.

    A row-pair-packed bf16 table (:mod:`besskge_tpu.packed`) keeps its
    moments UNPACKED — (2 · packed_rows, width) fp32 — so that shape is
    row-sharded too."""
    table_like = {
        tuple(entity_shape),
        (2 * entity_shape[0],) + tuple(entity_shape[1:]),
    }
    return jax.tree.map(
        lambda leaf: P(AXIS)
        if hasattr(leaf, "shape") and tuple(leaf.shape) in table_like
        else P(),
        opt_state,
    )


def init_optimizer_state(
    optimizer: optax.GradientTransformation,
    params: Params,
    mesh: Optional[Mesh] = None,
    entity_optimizer: Optional["EntityRowOptimizer"] = None,
    n_logical: Optional[int] = None,
) -> Any:
    """Initialize optimizer state; on a mesh, entity-table moments inherit
    the table's sharding (one block per device, never communicated).

    With ``entity_optimizer``, the state is ``{"entity": row-optimizer
    state, "other": optax state for the replicated params}``.
    ``n_logical`` (the global logical entity count,
    ``sharding.n_shard * sharding.max_entity_per_shard``) lets
    layout-sensitive row optimizers validate the table height — pass it
    whenever known (the Trainer does).
    """

    if entity_optimizer is None:
        def _init(p):
            return optimizer.init(p)
    else:
        def _init(p):
            other = {k: v for k, v in p.items() if k != "entity_embedding"}
            return {
                "entity": entity_optimizer.init(
                    p["entity_embedding"], n_logical=n_logical
                ),
                "other": optimizer.init(other),
            }

    if mesh is None:
        return jax.jit(_init)(params)
    state_shape = jax.eval_shape(_init, params)
    entity_shape = params["entity_embedding"].shape
    out_specs = _opt_state_specs(state_shape, entity_shape)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), out_specs)
    return jax.jit(_init, out_shardings=shardings)(params)



def _apply_bn_ema(score_fn, old_params, new_params, batch, momentum=0.1):
    """Torch-style BatchNorm running-stats maintenance inside the train step.

    Running mean/var are NOT trainable: any optimizer touch (zero-grad AdamW
    weight decay) is discarded, and they are refreshed with a momentum EMA of
    this step's positive (h, r) batch statistics computed from the
    pre-update params — the closest functional analog of torch BN's
    per-forward EMA (one update per device step over all micro-batches'
    positives, dropout-free).
    """
    if not getattr(score_fn, "batch_norm", False) or not hasattr(
        score_fn, "update_bn_stats"
    ):
        return new_params
    heads = batch["head"][:, 0].reshape(-1)
    rels = batch["relation"][:, 0].reshape(-1)
    sh = getattr(score_fn, "sharding", None)
    h_emb = take_rows(
        old_params["entity_embedding"], heads,
        n_logical=sh.max_entity_per_shard if sh is not None else None,
    )
    refreshed = score_fn.update_bn_stats(
        old_params, h_emb, rels, momentum=momentum, sync=True
    )
    out = dict(new_params)
    for k in ("bn0", "bn1", "bn2"):
        if k in out:
            out[k] = {
                **out[k],
                "mean": refreshed[k]["mean"],
                "var": refreshed[k]["var"],
            }
    return out


def _sparse_device_train_step(bess, optimizer, entity_optimizer):
    """Device train step with sparse entity updates: differentiate w.r.t. the
    gathered rows only (no dense table gradient is ever materialized), then
    apply a lazy row-wise optimizer (:mod:`besskge_tpu.optim`)."""
    from besskge_tpu.bess import _FORWARD_KEYS

    def step(params, opt_state, batch, rng=None):
        # 2-D table block (max_entity_per_shard, row): no squeeze — any
        # reshape would insert a bitcast between the donated buffer and the
        # in-place Pallas writes, and XLA then copies the whole table.
        table = params["entity_embedding"]
        other = {k: v for k, v in params.items() if k != "entity_embedding"}
        if rng is not None and bess.axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(bess.axis_name))
        mbs = {k: v[:, 0] for k, v in batch.items() if k in _FORWARD_KEYS}
        bps = next(iter(mbs.values())).shape[0]
        rngs = (
            jax.random.split(rng, bps)
            if rng is not None
            else jnp.zeros((bps, 2), jnp.uint32)
        )
        zero_other = jax.tree.map(
            lambda x: jnp.zeros(x.shape, x.dtype), other
        )

        def mb_fn(mb, step_rng):
            idx = bess.gather_plan(mb["head"], mb["tail"], mb["negative"])
            gathered = take_rows(
                table, idx,
                n_logical=bess.sharding.max_entity_per_shard,
            )
            srng = step_rng if rng is not None else None

            def f(g, o):
                local = dict(o)
                local["entity_embedding"] = jax.lax.stop_gradient(table)
                out = bess.forward(
                    local, train=True, rng=srng, gathered_emb=g, **mb
                )
                return out["loss"], out

            _, vjp, out = jax.vjp(f, gathered, other, has_aux=True)
            g_gathered, g_other = vjp(jnp.ones((), jnp.float32))
            return out, idx.reshape(-1), g_gathered, g_other

        if bess.axis_name is None:
            # Single device (no collectives): fuse micro-batches with vmap.
            outs, idxs, g_rows, g_other_all = jax.vmap(mb_fn)(mbs, rngs)
            acc_other = jax.tree.map(
                lambda z, x: z + jnp.sum(x, axis=0), zero_other, g_other_all
            )
        else:
            # Mesh path (collectives in the body, so no vmap): lax.scan over
            # micro-batches, accumulating (idx, grad-row) buffers; HLO size
            # and compile time stay flat in bps. The table is a CAPTURED
            # constant of the loop — only read inside it — and the in-place
            # Pallas row update below runs ONCE after the scan, so the
            # donated buffer still aliases straight through (threading the
            # table through the carry is what defeats XLA's alias analysis).
            def scan_body(acc, xs):
                mb_i, rng_i = xs
                out_i, idx_i, g_i, g_o = mb_fn(mb_i, rng_i)
                return jax.tree.map(jnp.add, acc, g_o), (out_i, idx_i, g_i)

            acc_other, (outs, idxs, g_rows) = jax.lax.scan(
                scan_body, zero_other, (mbs, rngs)
            )
        # Sparse entity update over all micro-batches' touched rows; the
        # 2-D table block goes in unreshaped so the donated buffer aliases
        # straight through to the in-place Pallas writes.
        row = g_rows.shape[-1]
        new_table, new_ent_state = entity_optimizer.update_rows(
            params["entity_embedding"],
            opt_state["entity"],
            idxs.reshape(-1),
            g_rows.reshape(-1, row),
        )
        # Replicated params: data-parallel psum then the optax transform.
        acc_other = bess.psum(acc_other)
        updates, new_other_state = optimizer.update(
            acc_other, opt_state["other"], other
        )
        new_other = optax.apply_updates(other, updates)
        new_params = dict(new_other)
        new_params["entity_embedding"] = new_table
        new_params = _apply_bn_ema(bess.score_fn, params, new_params, batch)
        new_opt_state = {"entity": new_ent_state, "other": new_other_state}
        return new_params, new_opt_state, _format_outputs(bess, outs)

    return step


def build_train_step(
    bess: BessKGE,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    entity_optimizer: Optional["EntityRowOptimizer"] = None,
    donate: bool = True,
) -> Callable:
    """Build ``fn(params, opt_state, batch[, rng]) -> (params, opt_state,
    outputs)`` — the full BESS training step, jitted over the mesh.

    With ``entity_optimizer`` the table update specializes:

    * :class:`~besskge_tpu.optim.EntityRowOptimizer` (RowAdamW/...) — sparse
      row-wise updates, no dense table-sized gradient or moment traffic
      (large tables);
    * :class:`~besskge_tpu.optim.FusedDenseAdamW` — dense gradients with a
      fused in-place AdamW Pallas kernel (small/medium tables);

    in both cases ``optimizer`` applies to the replicated parameters only.
    Otherwise ``optimizer`` handles everything densely.

    ``outputs`` contains the psum'd global ``loss`` plus whatever the module
    config produces (metrics, scores).
    """
    from besskge_tpu.optim import FusedDenseAdamW

    fused_dense = (
        entity_optimizer
        if isinstance(entity_optimizer, FusedDenseAdamW)
        else None
    )
    device_train_step = (
        _sparse_device_train_step(bess, optimizer, entity_optimizer)
        if entity_optimizer is not None and fused_dense is None
        else _dense_device_train_step(bess, optimizer, fused_dense)
    )

    donate_args = (0, 1) if donate else ()
    if mesh is None:
        if bess.axis_name is not None:
            raise ValueError("A mesh is required unless axis_name is None")
        return jax.jit(device_train_step, donate_argnums=donate_args)

    @partial(jax.jit, donate_argnums=donate_args)
    def fn(params, opt_state, batch, rng=None):
        from besskge_tpu.bess import _FORWARD_KEYS

        fwd_batch = {k: v for k, v in batch.items() if k in _FORWARD_KEYS}
        p_specs = param_partition_specs(params)
        o_specs = _opt_state_specs(opt_state, params["entity_embedding"].shape)
        b_specs = batch_partition_specs(fwd_batch)
        out_specs = (p_specs, o_specs, _out_specs(bess))
        if rng is None:
            mapped = jax.shard_map(
                device_train_step,
                mesh=mesh,
                in_specs=(p_specs, o_specs, b_specs),
                out_specs=out_specs,
                check_vma=False,
            )
            return mapped(params, opt_state, fwd_batch)
        mapped = jax.shard_map(
            device_train_step,
            mesh=mesh,
            in_specs=(p_specs, o_specs, b_specs, P()),
            out_specs=out_specs,
            check_vma=False,
        )
        return mapped(params, opt_state, fwd_batch, rng)

    return fn


def _dense_device_train_step(bess, optimizer, fused_dense=None):
    """Device train step with a dense entity-table gradient (small/medium
    tables): one ``value_and_grad`` over the whole params pytree, optionally
    finishing with the fused in-place AdamW Pallas kernel."""

    def dense_device_train_step(params, opt_state, batch, rng=None):
        if is_packed(params["entity_embedding"]):
            raise ValueError(
                "A row-pair-packed bf16 entity table cannot take a dense "
                "gradient (int32 storage is not differentiable); train it "
                "with a sparse EntityRowOptimizer (RowAdamW/RowSGDM/...)."
            )

        def loss_fn(p):
            outs = _device_step(bess, p, batch, train=True, rng=rng)
            return jnp.sum(outs["loss"]), outs

        (_, outs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # Data-parallel reduction for replicated params only: the entity
        # table's gradient is complete shard-locally (AllToAll transpose).
        grads = {
            k: (g if k == "entity_embedding" else bess.psum(g))
            for k, g in grads.items()
        }
        if fused_dense is not None:
            ent_g = grads.pop("entity_embedding")
            new_table, new_ent_state = fused_dense.apply_dense(
                params["entity_embedding"], opt_state["entity"], ent_g
            )
            other = {
                k: v for k, v in params.items() if k != "entity_embedding"
            }
            updates, new_other_state = optimizer.update(
                grads, opt_state["other"], other
            )
            new_params = optax.apply_updates(other, updates)
            new_params["entity_embedding"] = new_table
            new_params = _apply_bn_ema(bess.score_fn, params, new_params, batch)
            return (
                new_params,
                {"entity": new_ent_state, "other": new_other_state},
                _format_outputs(bess, outs),
            )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = _apply_bn_ema(bess.score_fn, params, new_params, batch)
        return new_params, new_opt_state, _format_outputs(bess, outs)

    return dense_device_train_step


def build_device_train_step(
    bess: BessKGE,
    optimizer: optax.GradientTransformation,
    sampler: "DeviceBatchSampler",
    mesh: Optional[Mesh] = None,
    entity_optimizer: Optional["EntityRowOptimizer"] = None,
    donate: bool = True,
    steps_per_call: int = 1,
) -> Callable:
    """Build ``fn(params, opt_state, sampler_state, key[, rng]) ->
    (params, opt_state, outputs)`` with the batch drawn ON DEVICE by a
    :class:`~besskge_tpu.device_sampler.DeviceBatchSampler` — the host feeds
    nothing but a PRNG key per call.

    ``steps_per_call > 1`` runs that many optimizer steps in one compiled
    dispatch (``lax.scan`` over per-step keys), amortizing host dispatch
    latency; outputs then carry only the last step's ``loss``. Works for
    both the dense path and a sparse :class:`EntityRowOptimizer`: XLA
    aliases scan carries in place (the loop buffer is threaded, not
    double-buffered), so the in-place Pallas row writes still touch only
    the gathered rows — measured bit-identical to the unrolled sequence
    with zero table-sized copies at 2.5M x 128.
    """
    from besskge_tpu.optim import FusedDenseAdamW

    fused_dense = (
        entity_optimizer
        if isinstance(entity_optimizer, FusedDenseAdamW)
        else None
    )
    sparse = entity_optimizer is not None and fused_dense is None
    device_train_step = (
        _sparse_device_train_step(bess, optimizer, entity_optimizer)
        if sparse
        else _dense_device_train_step(bess, optimizer, fused_dense)
    )

    def run(params, opt_state, sampler_state, key, rng, local_slice):
        def one(p, o, k, r):
            batch = sampler.sample(sampler_state, k)
            if local_slice:
                batch = sampler.slice_local(
                    batch, jax.lax.axis_index(AXIS)
                )
            return device_train_step(p, o, batch, r)

        if steps_per_call == 1:
            return one(params, opt_state, key, rng)
        keys = jax.random.split(key, steps_per_call)
        rngs = (
            jax.random.split(rng, steps_per_call) if rng is not None else keys
        )

        def body(carry, xs):
            p, o = carry
            k, r = xs
            p, o, outs = one(p, o, k, r if rng is not None else None)
            return (p, o), outs["loss"]

        (p, o), losses = jax.lax.scan(
            body, (params, opt_state), (keys, rngs)
        )
        return p, o, {"loss": losses[-1]}

    donate_args = (0, 1) if donate else ()
    if mesh is None:
        if bess.axis_name is not None:
            raise ValueError("A mesh is required unless axis_name is None")

        @partial(jax.jit, donate_argnums=donate_args)
        def single_fn(params, opt_state, sampler_state, key, rng=None):
            return run(params, opt_state, sampler_state, key, rng, False)

        return single_fn

    out_specs_outs = (
        _out_specs(bess) if steps_per_call == 1 else {"loss": P()}
    )

    @partial(jax.jit, donate_argnums=donate_args)
    def fn(params, opt_state, sampler_state, key, rng=None):
        p_specs = param_partition_specs(params)
        o_specs = _opt_state_specs(opt_state, params["entity_embedding"].shape)
        st_specs = {k: P() for k in sampler_state}
        out_specs = (p_specs, o_specs, out_specs_outs)

        def sharded(p, o, st, k, r=None):
            return run(p, o, st, k, r, True)

        if rng is None:
            mapped = jax.shard_map(
                sharded,
                mesh=mesh,
                in_specs=(p_specs, o_specs, st_specs, P()),
                out_specs=out_specs,
                check_vma=False,
            )
            return mapped(params, opt_state, sampler_state, key)
        mapped = jax.shard_map(
            sharded,
            mesh=mesh,
            in_specs=(p_specs, o_specs, st_specs, P(), P()),
            out_specs=out_specs,
            check_vma=False,
        )
        return mapped(params, opt_state, sampler_state, key, rng)

    return fn


class Trainer:
    """End-to-end training driver.

    :param bess: the BESS module (must have a ``loss_fn``).
    :param batch_sampler: host-side batch stream
        (:class:`~besskge_tpu.batch_sampler.ShardedBatchSampler`) or a
        :class:`~besskge_tpu.device_sampler.DeviceBatchSampler` — with the
        latter, batches are drawn inside the jitted step and the host feeds
        only PRNG keys.
    :param optimizer: any optax transformation (AdamW, SGDM, ...).
    :param mesh: device mesh; ``None`` for the single-device path.
    :param params: initial params; defaults to ``score_fn.initial_params()``.
    :param seed: rng seed for dropout streams.
    :param steps_per_call: with a device sampler, optimizer steps fused into
        one dispatch (dense entity updates only).
    """

    def __init__(
        self,
        bess: BessKGE,
        batch_sampler: ShardedBatchSampler,
        optimizer: optax.GradientTransformation,
        mesh: Optional[Mesh] = None,
        params: Optional[Params] = None,
        seed: int = 0,
        entity_optimizer: Optional["EntityRowOptimizer"] = None,
        steps_per_call: int = 1,
    ) -> None:
        from besskge_tpu.device_sampler import DeviceBatchSampler

        if bess.loss_fn is None:
            raise ValueError("Training requires a loss_fn on the BESS module")
        self.bess = bess
        self.batch_sampler = batch_sampler
        self.optimizer = optimizer
        self.entity_optimizer = entity_optimizer
        self.mesh = mesh
        self.device_sampling = isinstance(batch_sampler, DeviceBatchSampler)
        self.steps_per_call = steps_per_call
        if steps_per_call != 1 and not self.device_sampling:
            raise ValueError(
                "steps_per_call requires a DeviceBatchSampler"
            )
        raw = params if params is not None else bess.score_fn.initial_params()
        if entity_optimizer is not None and getattr(
            entity_optimizer, "interleaved", False
        ):
            tab = jnp.asarray(raw["entity_embedding"])
            n_global = (
                bess.sharding.n_shard * bess.sharding.max_entity_per_shard
            )
            plain_h = (n_global + 1) // 2 if is_packed(tab) else n_global
            # The optimizer owns its interleaved layout: ask it (via an
            # abstract trace) what height a widened plain table would have,
            # then widen a plain table / pass a pre-widened one through /
            # fail clearly on anything else (e.g. params saved from a
            # differently-sharded run fed in without re-sharding — which
            # would otherwise surface later as an opaque init() shape
            # error or a wrong layout inference).
            wide_h = jax.eval_shape(
                entity_optimizer.widen_table,
                jax.ShapeDtypeStruct(
                    (plain_h, tab.shape[-1]), tab.dtype
                ),
            ).shape[-2]
            if tab.shape[-2] == plain_h:
                raw = dict(raw)
                raw["entity_embedding"] = entity_optimizer.widen_table(tab)
            elif tab.shape[-2] != wide_h:
                raise ValueError(
                    f"entity table has {tab.shape[-2]} rows; expected "
                    f"{plain_h} (plain, to be widened) or {wide_h} "
                    f"(already interleaved for "
                    f"{type(entity_optimizer).__name__}) for this sharding"
                    f" — re-shard the checkpoint (checkpoint.load with the"
                    f" current Sharding) before constructing the Trainer"
                )
        if mesh is not None:
            from besskge_tpu.parallel.mesh import shard_params

            self.params = shard_params(
                jax.tree.map(jnp.asarray, raw), mesh
            )
        else:
            self.params = jax.tree.map(jnp.asarray, raw)
        self.opt_state = init_optimizer_state(
            optimizer, self.params, mesh, entity_optimizer,
            n_logical=(
                bess.sharding.n_shard * bess.sharding.max_entity_per_shard
            ),
        )
        if self.device_sampling:
            self.sampler_state = batch_sampler.state()
            if mesh is not None:
                from besskge_tpu.parallel.mesh import replicate_tree

                self.sampler_state = replicate_tree(self.sampler_state, mesh)
            self.train_step = build_device_train_step(
                bess,
                optimizer,
                batch_sampler,
                mesh,
                entity_optimizer,
                steps_per_call=steps_per_call,
            )
        else:
            self.train_step = build_train_step(
                bess, optimizer, mesh, entity_optimizer
            )
        self.rng = jax.random.PRNGKey(seed)
        from besskge_tpu.scoring import ConvE

        self.needs_rng = isinstance(bess.score_fn, ConvE)
        self.history: list = []

    def fit(
        self,
        n_epochs: int = 1,
        shuffle: bool = True,
        log_every: int = 0,
        callback: Optional[Callable[[int, Dict[str, Any]], None]] = None,
        valid_fn: Optional[Callable[[Params], Dict[str, float]]] = None,
        valid_every: int = 1,
        checkpoint_path: Optional[str] = None,
        checkpoint_metric: str = "mrr",
    ) -> Dict[str, Any]:
        """Run ``n_epochs`` over the sampler; returns summary stats.

        The numpy batch assembly runs in a background thread
        (:meth:`ShardedBatchSampler.get_dataloader`), overlapping device
        execution — the TPU analog of poptorch's async dataloader.

        :param valid_fn: optional in-loop validation hook
            ``fn(params) -> {metric: value}``, called every ``valid_every``
            epochs; results land in :attr:`history` as
            ``{"epoch", "valid": {...}}`` records.
        :param checkpoint_path: with ``valid_fn``, save a checkpoint here
            whenever ``checkpoint_metric`` improves (best-model tracking);
            without ``valid_fn``, save once after the last epoch.
        """
        step = 0
        triples_per_step = (
            self.batch_sampler.batches_per_step
            * self.batch_sampler.n_shard
            * self.batch_sampler.shard_bs
        ) * (self.steps_per_call if self.device_sampling else 1)
        out: Optional[Dict[str, Any]] = None
        best_metric = -float("inf")
        t0 = time.perf_counter()
        for epoch in range(n_epochs):
            for out in self._step_stream(epoch, shuffle):
                step += 1
                if log_every and step % log_every == 0:
                    rec = {
                        "step": step,
                        "epoch": epoch,
                        "loss": float(out["loss"]),
                    }
                    self.history.append(rec)
                    if callback:
                        callback(step, rec)
            if valid_fn is not None and (epoch + 1) % valid_every == 0:
                metrics = valid_fn(self.params)
                self.history.append({"epoch": epoch, "valid": dict(metrics)})
                if checkpoint_path is not None:
                    val = float(metrics[checkpoint_metric])
                    if val > best_metric:
                        best_metric = val
                        self.save(checkpoint_path, step=step)
        if valid_fn is None and checkpoint_path is not None:
            self.save(checkpoint_path, step=step)
        last_loss = float(out["loss"]) if out is not None else float("nan")
        elapsed = time.perf_counter() - t0
        summary = {
            "steps": step,
            "epochs": n_epochs,
            "final_loss": last_loss,
            "wall_time_s": elapsed,
            "triples_per_s": step * triples_per_step / max(elapsed, 1e-9),
        }
        if best_metric > -float("inf"):
            summary[f"best_{checkpoint_metric}"] = best_metric
        return summary

    def _step_stream(self, epoch: int, shuffle: bool):
        """Run one epoch of train steps, yielding each step's outputs.

        Host-sampler path: iterate the background-prefetched dataloader and
        ship each batch. Device-sampler path: feed only a deterministic
        per-step PRNG key (`steps_per_call` fused steps per dispatch)."""
        if self.device_sampling:
            n_calls = max(
                1, -(-len(self.batch_sampler) // self.steps_per_call)
            )
            for i in range(n_calls):
                key = self.batch_sampler.next_key(epoch * n_calls + i)
                if self.needs_rng:
                    self.rng, sub = jax.random.split(self.rng)
                    self.params, self.opt_state, out = self.train_step(
                        self.params, self.opt_state,
                        self.sampler_state, key, sub,
                    )
                else:
                    self.params, self.opt_state, out = self.train_step(
                        self.params, self.opt_state, self.sampler_state, key
                    )
                yield out
            return
        # Ship batches to the device one step AHEAD of consumption: on
        # remote-attached backends (axon tunnel) a synchronous per-step
        # device_put round-trip dominates the step time (measured 23x
        # slower than the pipelined loop on the biokg config); depth-2
        # prefetch overlaps H2D with the previous step's compute.
        def put_ahead(it, depth=2):
            from collections import deque

            q = deque()
            for b in it:
                q.append(self._put(b))
                if len(q) >= depth:
                    yield q.popleft()
            while q:
                yield q.popleft()

        for jbatch in put_ahead(
            self.batch_sampler.get_dataloader(shuffle=shuffle, seed_offset=epoch)
        ):
            if self.needs_rng:
                self.rng, sub = jax.random.split(self.rng)
                self.params, self.opt_state, out = self.train_step(
                    self.params, self.opt_state, jbatch, sub
                )
            else:
                self.params, self.opt_state, out = self.train_step(
                    self.params, self.opt_state, jbatch
                )
            yield out

    def save(self, path: str, step: int = 0, sharded: bool = False) -> None:
        """Checkpoint current params + optimizer state (+ sharding meta).

        With ``sharded=True``, write the directory format
        (:func:`~besskge_tpu.checkpoint.save_checkpoint_sharded`): each
        process writes only its own table shards — use this at large table
        sizes and on multi-host meshes.
        """
        if sharded:
            from besskge_tpu.checkpoint import save_checkpoint_sharded

            save_checkpoint_sharded(
                path,
                self.params,
                opt_state=self.opt_state,
                sharding=self.bess.sharding,
                step=step,
            )
            return
        from besskge_tpu.checkpoint import save_checkpoint

        save_checkpoint(
            path,
            {k: np.asarray(v) for k, v in self.params.items()},
            opt_state=self.opt_state,
            sharding=self.bess.sharding,
            step=step,
            interleaved_entity=(
                getattr(
                    self.entity_optimizer, "interleave_layout", "momentum"
                )
                if (
                    getattr(self.entity_optimizer, "interleaved", False)
                    and getattr(
                        self.entity_optimizer, "interleave_layout",
                        "momentum",
                    ) != "momentum"
                )
                else bool(
                    getattr(self.entity_optimizer, "interleaved", False)
                )
            ),
        )

    def _put(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from besskge_tpu.parallel.mesh import shard_batch

        return shard_batch(batch, self.mesh)
