"""Unified checkpointing with resharding on restore.

The reference has no unified checkpoint story — tables re-enter training via
``entity_initializer=<tensor>`` and topology changes go through
``refactor_embedding_sharding`` (reference ``besskge/embedding.py:262-290``,
notebook 3 md cell 15). Here both are productized: one ``.npz`` checkpoint
holds the params pytree, optionally the optimizer state, and the
:class:`~besskge_tpu.sharding.Sharding` metadata; loading onto a different
device topology re-shards the entity table (and any table-shaped optimizer
moments) through the global-ID permutation.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

from besskge_tpu.embedding import refactor_embedding_sharding
from besskge_tpu.sharding import Sharding

__all__ = ["save_checkpoint", "load_checkpoint"]

_SEP = "/"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}{_SEP}"))
    elif tree is None:
        pass
    else:
        out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix(node: Any) -> Any:
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            return tuple(
                fix(node[f"#{i}"]) for i in range(len(node))
            )
        return {k: fix(v) for k, v in node.items()}

    return fix(tree)



def _restore_like(template: Any, flat: Dict[str, np.ndarray], prefix: str = "") -> Any:
    """Rebuild ``template``'s exact pytree (dict / tuple / NamedTuple /
    None structure, e.g. an optax chain state) with leaves taken from the
    flat key->array mapping. Zero-leaf nodes (optax ``EmptyState``) survive."""
    if isinstance(template, dict):
        return {
            k: _restore_like(v, flat, f"{prefix}{k}{_SEP}")
            for k, v in template.items()
        }
    if isinstance(template, (list, tuple)):
        vals = [
            _restore_like(v, flat, f"{prefix}#{i}{_SEP}")
            for i, v in enumerate(template)
        ]
        if hasattr(template, "_fields"):  # NamedTuple
            return type(template)(*vals)
        return type(template)(vals)
    if template is None:
        return None
    return flat[prefix.rstrip(_SEP)]


def save_checkpoint(
    path: Path,
    params: Dict[str, Any],
    opt_state: Any = None,
    sharding: Optional[Sharding] = None,
    step: int = 0,
    extra_meta: Optional[Dict[str, Any]] = None,
    interleaved_entity: "bool | str" = False,
) -> None:
    """Write params (+ optimizer state + sharding) to one ``.npz`` file.

    ``interleaved_entity=True`` de-interleaves a ``[params | momentum]``
    entity table (:class:`besskge_tpu.optim.RowSGDM` ``interleaved=True``,
    pair-major fp32 or triplet-major packed — distinguished by the storage
    dtype) at the boundary: the file stores the plain table under
    ``params/entity_embedding`` and the momentum under ``opt/entity/m`` —
    byte-compatible with a checkpoint written by a NON-interleaved run, so
    the storage layout is a pure runtime choice.
    ``interleaved_entity="adamw"`` de-interleaves the treble-major fp32
    (or quintuplet-major packed) ``[param | mu | nu]`` store of
    :class:`besskge_tpu.optim.RowAdamW` ``interleaved=True`` into
    ``opt/entity/mu`` and ``opt/entity/nu``; ``"adagrad"`` uses the
    single-state layouts with the accumulator under ``opt/entity/acc``.
    """
    path = Path(path)
    if interleaved_entity:
        wide = np.asarray(params["entity_embedding"])
        d = wide.shape[-1]
        moments: Dict[str, np.ndarray]
        if interleaved_entity == "adamw" and np.issubdtype(
            wide.dtype, np.integer
        ):
            # quintuplet-major packed store (packed.is_quintupled): file
            # keeps the plain (P, D) packed table + logical-major fp32
            # mu/nu — byte-compatible with a non-interleaved packed run
            five_p = wide.shape[-2]
            quin = wide.reshape(*wide.shape[:-2], five_p // 5, 5, d)
            p_half = np.ascontiguousarray(quin[..., 0, :])

            def _logical(j):
                return np.ascontiguousarray(
                    quin[..., 1 + 2 * j: 3 + 2 * j, :].reshape(
                        *wide.shape[:-2], -1, d
                    )
                ).view(np.uint32).view(np.float32)

            moments = {"mu": _logical(0), "nu": _logical(1)}
        elif interleaved_entity == "adamw":
            # treble-major fp32 [param | mu | nu] (optim.interleave_adamw):
            # file keeps the plain table + opt/entity/{mu,nu} — byte-
            # compatible with a non-interleaved RowAdamW run
            three_n = wide.shape[-2]
            trio = wide.reshape(*wide.shape[:-2], three_n // 3, 3, d)
            p_half = np.ascontiguousarray(trio[..., 0, :])
            moments = {
                "mu": np.ascontiguousarray(trio[..., 1, :]),
                "nu": np.ascontiguousarray(trio[..., 2, :]),
            }
        elif np.issubdtype(wide.dtype, np.integer):
            # triplet-major packed store (packed.is_tripled): file keeps
            # the plain (P, D) packed table + logical-major fp32 state
            # — byte-compatible with a non-interleaved packed run.
            # RowSGDM stores its momentum as "m"; RowAdagrad its
            # accumulator as "acc" (the layouts are identical).
            key = "acc" if interleaved_entity == "adagrad" else "m"
            three_p = wide.shape[-2]
            trip = wide.reshape(*wide.shape[:-2], three_p // 3, 3, d)
            p_half = np.ascontiguousarray(trip[..., 0, :])
            moments = {
                key: np.ascontiguousarray(
                    trip[..., 1:, :].reshape(*wide.shape[:-2], -1, d)
                ).view(np.uint32).view(np.float32)
            }
        else:
            key = "acc" if interleaved_entity == "adagrad" else "m"
            two_n = wide.shape[-2]
            pairs = wide.reshape(*wide.shape[:-2], two_n // 2, 2, d)
            p_half = np.ascontiguousarray(pairs[..., 0, :])
            moments = {key: np.ascontiguousarray(pairs[..., 1, :])}
        params = dict(params, entity_embedding=p_half)
        if opt_state is not None and isinstance(opt_state, dict):
            ent = dict(opt_state.get("entity", {}))
            ent.update(moments)
            opt_state = dict(opt_state, entity=ent)
    arrays = {f"params{_SEP}{k}": v for k, v in _flatten(params).items()}
    if opt_state is not None:
        arrays.update(
            {f"opt{_SEP}{k}": v for k, v in _flatten(opt_state).items()}
        )
    if sharding is not None:
        arrays.update(
            {
                f"sharding{_SEP}{k}": v
                for k, v in _flatten(
                    {
                        "n_shard": np.asarray(sharding.n_shard),
                        "entity_to_shard": sharding.entity_to_shard,
                        "entity_to_idx": sharding.entity_to_idx,
                        "shard_and_idx_to_entity": sharding.shard_and_idx_to_entity,
                        "shard_counts": sharding.shard_counts,
                        **(
                            {
                                "entity_type_counts": sharding.entity_type_counts,
                                "entity_type_offsets": sharding.entity_type_offsets,
                            }
                            if sharding.entity_type_counts is not None
                            else {}
                        ),
                    }
                ).items()
            }
        )
    meta = {"step": step, **(extra_meta or {})}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_checkpoint(
    path: Path,
    new_sharding: Optional[Sharding] = None,
    like: Any = None,
    interleave_entity: "bool | str" = False,
) -> Tuple[Dict[str, Any], Any, Optional[Sharding], Dict[str, Any]]:
    """Load a checkpoint; optionally re-shard onto ``new_sharding``.

    ``like`` optionally supplies an optimizer-state TEMPLATE (e.g. from
    :func:`~besskge_tpu.trainer.init_optimizer_state`): the restored state
    then reproduces its exact pytree — NamedTuple classes, optax
    ``EmptyState`` nodes — so it can be fed straight back into
    ``optimizer.update``.

    Re-sharding permutes the entity table AND any optimizer-state arrays of
    the same (table) shape through the global-ID maps, so training resumes
    bit-consistently on a different device count.

    ``interleave_entity=True`` rebuilds the ``[params | momentum]`` wide
    table for an interleaved :class:`besskge_tpu.optim.RowSGDM` run from
    the plain on-disk layout (``opt/entity/m`` is consumed; a checkpoint
    with no momentum re-interleaves against zeros); ``"adamw"`` rebuilds
    the treble-major fp32 ``[param | mu | nu]`` store of an interleaved
    :class:`besskge_tpu.optim.RowAdamW` run (``opt/entity/mu``/``nu``
    consumed). Applied AFTER re-sharding, so all planes permute
    consistently.

    :return: ``(params, opt_state, sharding, meta)``.
    """
    path = Path(path)
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    meta = json.loads(bytes(flat.pop("__meta__")).decode())

    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for key, val in flat.items():
        top, rest = key.split(_SEP, 1)
        groups.setdefault(top, {})[rest] = val

    params = _unflatten(groups.get("params", {}))
    if like is not None:
        opt_state = _restore_like(like, groups.get("opt", {}))
    else:
        opt_state = _unflatten(groups["opt"]) if "opt" in groups else None

    sharding = None
    if "sharding" in groups:
        s = groups["sharding"]
        sharding = Sharding(
            n_shard=int(s["n_shard"]),
            entity_to_shard=s["entity_to_shard"],
            entity_to_idx=s["entity_to_idx"],
            shard_and_idx_to_entity=s["shard_and_idx_to_entity"],
            shard_counts=s["shard_counts"],
            entity_type_counts=s.get("entity_type_counts"),
            entity_type_offsets=s.get("entity_type_offsets"),
        )

    if new_sharding is not None:
        if sharding is None:
            raise ValueError(
                "Checkpoint has no sharding metadata; cannot re-shard"
            )
        table_shape = params["entity_embedding"].shape
        packed_tab = np.issubdtype(
            params["entity_embedding"].dtype, np.integer
        )
        # Packed stores hold 2 logical rows per physical row; their fp32
        # moment buffers are LOGICAL-major (2·P, D), so both shapes must
        # reshard (each through its own path).
        logical_shape = (
            (2 * table_shape[-2], table_shape[-1]) if packed_tab else None
        )

        def reshard(x: np.ndarray) -> np.ndarray:
            # Params store the table 2-D (n_shard * max_ent, row); go through
            # the 3-D view for the permutation.
            if np.issubdtype(x.dtype, np.integer):
                # Row-pair-packed storage: the float32 permutation below
                # would corrupt raw 32-bit words (> 2^24 doesn't survive
                # the astype) and the packed height breaks the per-shard
                # index maps. Unpack to logical 16-bit rows (pairs never
                # cross shard boundaries: per-shard logical counts are
                # even by the packing contract), permute exactly in fp32,
                # re-pack under the new sharding.
                from besskge_tpu.packed import (
                    pack_table_host,
                    unpack_table_host,
                )

                if new_sharding.max_entity_per_shard % 2:
                    raise ValueError(
                        "cannot re-shard a packed table onto a sharding "
                        "with odd max_entity_per_shard "
                        f"({new_sharding.max_entity_per_shard}); create "
                        "the new Sharding with an even per-shard row count"
                    )
                logical = unpack_table_host(
                    np.ascontiguousarray(x), 2 * x.shape[0]
                )
                out = reshard(logical.astype(np.float32))
                return pack_table_host(
                    np.ascontiguousarray(out).astype(logical.dtype)
                )
            x3 = x.reshape(sharding.n_shard, -1, x.shape[-1]).astype(
                np.float32
            )
            out3 = refactor_embedding_sharding(x3, sharding, new_sharding)
            return out3.reshape(-1, out3.shape[-1]).astype(x.dtype)

        params = {
            k: (reshard(v) if k == "entity_embedding" else v)
            for k, v in params.items()
        }

        def reshard_tree(node: Any) -> Any:
            if isinstance(node, dict):
                return {k: reshard_tree(v) for k, v in node.items()}
            if isinstance(node, tuple):
                return tuple(reshard_tree(v) for v in node)
            if isinstance(node, np.ndarray) and (
                node.shape == table_shape or node.shape == logical_shape
            ):
                return reshard(node)
            return node

        if opt_state is not None:
            opt_state = reshard_tree(opt_state)
        sharding = new_sharding

    if interleave_entity == "adamw":
        # rebuild the treble-major fp32 (or quintuplet-major packed)
        # [param | mu | nu] store of an interleaved RowAdamW run (zeros
        # for absent moments)
        tab = np.asarray(params["entity_embedding"])
        mu = nu = None
        if isinstance(opt_state, dict) and isinstance(
            opt_state.get("entity"), dict
        ):
            ent = dict(opt_state["entity"])
            mu = ent.pop("mu", None)
            nu = ent.pop("nu", None)
            opt_state = dict(opt_state, entity=ent)
        if np.issubdtype(tab.dtype, np.integer):
            p_cnt, d = tab.shape[-2], tab.shape[-1]

            def _bits(m):
                if m is None:
                    return np.zeros(
                        (*tab.shape[:-2], 2 * p_cnt, d), tab.dtype
                    )
                return (
                    np.ascontiguousarray(np.asarray(m, np.float32))
                    .view(np.uint32)
                    .view(tab.dtype)
                )

            mub, nub = _bits(mu), _bits(nu)
            stacked = np.stack(
                [
                    tab,
                    mub[..., 0::2, :], mub[..., 1::2, :],
                    nub[..., 0::2, :], nub[..., 1::2, :],
                ],
                axis=-2,
            )  # (..., P, 5, D) -> quintuplet-major (..., 5P, D)
            params = dict(
                params,
                entity_embedding=stacked.reshape(
                    *tab.shape[:-2], 5 * p_cnt, d
                ),
            )
        else:
            mu = (
                np.zeros_like(tab) if mu is None
                else np.asarray(mu, tab.dtype)
            )
            nu = (
                np.zeros_like(tab) if nu is None
                else np.asarray(nu, tab.dtype)
            )
            stacked = np.stack([tab, mu, nu], axis=-2)
            params = dict(
                params,
                entity_embedding=stacked.reshape(
                    *tab.shape[:-2], 3 * tab.shape[-2], tab.shape[-1]
                ),
            )
    elif interleave_entity:
        tab = np.asarray(params["entity_embedding"])
        key = "acc" if interleave_entity == "adagrad" else "m"
        mom = None
        if isinstance(opt_state, dict) and isinstance(
            opt_state.get("entity"), dict
        ):
            ent = dict(opt_state["entity"])
            mom = ent.pop(key, None)
            opt_state = dict(opt_state, entity=ent)
        if np.issubdtype(tab.dtype, np.integer):
            # rebuild the triplet-major packed store from the plain packed
            # table + logical-major fp32 momentum (zeros when absent)
            p_cnt, d = tab.shape[-2], tab.shape[-1]
            if mom is None:
                mbits = np.zeros((*tab.shape[:-2], 2 * p_cnt, d), tab.dtype)
            else:
                mbits = (
                    np.ascontiguousarray(np.asarray(mom, np.float32))
                    .view(np.uint32)
                    .view(tab.dtype)
                )
            stacked = np.stack(
                [tab, mbits[..., 0::2, :], mbits[..., 1::2, :]], axis=-2
            )  # (..., P, 3, D) -> triplet-major (..., 3P, D)
            params = dict(
                params,
                entity_embedding=stacked.reshape(
                    *tab.shape[:-2], 3 * p_cnt, d
                ),
            )
        else:
            if mom is None:
                mom = np.zeros_like(tab)
            stacked = np.stack(
                [tab, np.asarray(mom).astype(tab.dtype)], axis=-2
            )  # (..., N, 2, D) -> pair-major (..., 2N, D)
            params = dict(
                params,
                entity_embedding=stacked.reshape(
                    *tab.shape[:-2], 2 * tab.shape[-2], tab.shape[-1]
                ),
            )

    return params, opt_state, sharding, meta


# ---------------------------------------------------------------------------
# Sharded (per-process, per-shard-file) checkpoint IO
# ---------------------------------------------------------------------------

__all__ += ["save_checkpoint_sharded", "load_checkpoint_sharded"]


def _flatten_lazy(tree: Any, prefix: str = "") -> Dict[str, Any]:
    """Like :func:`_flatten` but keeps leaves as-is (no host conversion)."""
    out: Dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_lazy(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_lazy(v, f"{prefix}#{i}{_SEP}"))
    elif tree is None:
        pass
    else:
        out[prefix.rstrip(_SEP)] = tree
    return out


def _owned_table_blocks(leaf: Any, rows_per_shard: int) -> Dict[int, np.ndarray]:
    """Split a table-shaped leaf into the {shard_index: (M, row) block}s this
    PROCESS holds, fetching only addressable device shards (never the global
    array) when the leaf is a sharded ``jax.Array``."""
    blocks: Dict[int, np.ndarray] = {}
    shards = getattr(leaf, "addressable_shards", None)
    if shards:
        for sh in shards:
            if sh.replica_id != 0:
                continue
            start = sh.index[0].start or 0
            data = np.asarray(sh.data)
            for k in range(data.shape[0] // rows_per_shard):
                s = start // rows_per_shard + k
                blocks[s] = data[k * rows_per_shard : (k + 1) * rows_per_shard]
    else:
        arr = np.asarray(leaf)
        for s in range(arr.shape[0] // rows_per_shard):
            blocks[s] = arr[s * rows_per_shard : (s + 1) * rows_per_shard]
    return blocks


def save_checkpoint_sharded(
    path: Path,
    params: Dict[str, Any],
    opt_state: Any = None,
    sharding: Optional[Sharding] = None,
    step: int = 0,
    extra_meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a DIRECTORY checkpoint: one ``shard_{s}.npz`` per table shard,
    written by the process that owns it — the global entity table (and its
    table-shaped optimizer moments, ~3x its size under Adam) is NEVER
    materialized on any host. Small/replicated leaves go to
    ``replicated.npz`` (process 0 only).

    Works with sharded ``jax.Array`` params on single- or multi-host meshes
    (each process writes only its ``local_shard_range``), and with plain
    numpy params (everything written by the calling process).

    The reference has no sharded-checkpoint analog — its tables re-enter
    training via host-side ``entity_initializer`` tensors; at the multi-GB
    scale this framework targets, funnelling table + moments through one
    host is the wall this path removes.
    """
    if sharding is None:
        raise ValueError("save_checkpoint_sharded requires the Sharding")
    import jax

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    table_shape = tuple(params["entity_embedding"].shape)
    rows_per_shard = table_shape[0] // sharding.n_shard

    flat: Dict[str, Any] = {
        f"params{_SEP}{k}": v for k, v in _flatten_lazy(params).items()
    }
    if opt_state is not None:
        flat.update(
            {f"opt{_SEP}{k}": v for k, v in _flatten_lazy(opt_state).items()}
        )
    table_keys = [
        k for k, v in flat.items() if tuple(v.shape) == table_shape
    ]

    per_shard: Dict[int, Dict[str, np.ndarray]] = {}
    for key in table_keys:
        for s, block in _owned_table_blocks(
            flat[key], rows_per_shard
        ).items():
            per_shard.setdefault(s, {})[key] = block
    for s, arrays in per_shard.items():
        np.savez(path / f"shard_{s:05d}.npz", **arrays)

    if jax.process_index() == 0:
        repl = {
            k: np.asarray(v) for k, v in flat.items() if k not in table_keys
        }
        np.savez(path / "replicated.npz", **repl)
        sharding.save(path / "sharding.npz")
        meta = {
            "step": step,
            "table_keys": table_keys,
            "table_shape": list(table_shape),
            "n_shard": sharding.n_shard,
            **(extra_meta or {}),
        }
        (path / "meta.json").write_text(json.dumps(meta))


def load_checkpoint_sharded(
    path: Path,
    mesh: Any = None,
    new_sharding: Optional[Sharding] = None,
    like: Any = None,
) -> Tuple[Dict[str, Any], Any, Optional[Sharding], Dict[str, Any]]:
    """Load a :func:`save_checkpoint_sharded` directory.

    With ``mesh``, every table-shaped leaf is assembled directly on the
    devices via ``jax.make_array_from_callback`` — each process reads only
    the shard files backing ITS devices; replicated leaves are device_put
    replicated. Without a mesh, tables are concatenated on the host (only
    sensible for small tables / tests).

    ``like`` optionally supplies an optimizer-state template (see
    :func:`load_checkpoint`) so the restored state drops straight back into
    ``optimizer.update``.

    With ``new_sharding``, blocks for the new topology are STREAMED: each new
    shard's rows are gathered from just the old shard files that contain
    them (padding rows restore to zero), so resharding also never builds the
    global table.

    :return: ``(params, opt_state, sharding, meta)``.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    path = Path(path)
    meta = json.loads((path / "meta.json").read_text())
    table_keys = list(meta["table_keys"])
    old_sharding = Sharding.load(path / "sharding.npz")
    n_entity = old_sharding.n_entity
    rows_old = meta["table_shape"][0] // meta["n_shard"]

    shard_cache: Dict[int, Any] = {}

    def old_block(s: int, key: str) -> np.ndarray:
        if s not in shard_cache:
            shard_cache[s] = np.load(
                path / f"shard_{s:05d}.npz", allow_pickle=False
            )
        return shard_cache[s][key]

    eff_sharding = new_sharding if new_sharding is not None else old_sharding
    rows_new = eff_sharding.max_entity_per_shard

    def block(s: int, key: str) -> np.ndarray:
        if new_sharding is None:
            return old_block(s, key)
        ids = new_sharding.shard_and_idx_to_entity[s]
        valid = np.nonzero(ids < n_entity)[0]
        real = ids[valid]
        src_shard = old_sharding.entity_to_shard[real]
        src_idx = old_sharding.entity_to_idx[real]
        probe = old_block(int(src_shard[0]) if len(src_shard) else 0, key)
        out = np.zeros((rows_new,) + probe.shape[1:], probe.dtype)
        for s_old in np.unique(src_shard):
            m = src_shard == s_old
            out[valid[m]] = old_block(int(s_old), key)[src_idx[m]]
        return out

    with np.load(path / "replicated.npz", allow_pickle=False) as data:
        flat: Dict[str, Any] = {k: data[k] for k in data.files}

    n_shard_eff = eff_sharding.n_shard
    global_shape_rows = n_shard_eff * rows_new

    for key in table_keys:
        probe = block(0, key)
        gshape = (global_shape_rows,) + probe.shape[1:]
        if mesh is None:
            flat[key] = np.concatenate(
                [probe] + [block(s, key) for s in range(1, n_shard_eff)]
            )
        else:
            ns = NamedSharding(mesh, P("shard"))

            def cb(index, key=key):
                lo = index[0].start or 0
                hi = index[0].stop or gshape[0]
                parts = [
                    block(s, key)
                    for s in range(lo // rows_new, -(-hi // rows_new))
                ]
                return np.concatenate(parts) if len(parts) > 1 else parts[0]

            flat[key] = jax.make_array_from_callback(gshape, ns, cb)

    if mesh is not None:
        repl_sharding = NamedSharding(mesh, P())
        for k in list(flat.keys()):
            if k not in table_keys:
                flat[k] = jax.device_put(flat[k], repl_sharding)

    groups: Dict[str, Dict[str, Any]] = {}
    for key, val in flat.items():
        top, rest = key.split(_SEP, 1)
        groups.setdefault(top, {})[rest] = val
    params = _unflatten(groups.get("params", {}))
    if like is not None:
        opt_state = _restore_like(like, groups.get("opt", {}))
    else:
        opt_state = _unflatten(groups["opt"]) if "opt" in groups else None
    return params, opt_state, eff_sharding, meta
