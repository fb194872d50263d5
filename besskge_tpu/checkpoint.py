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


def save_checkpoint(
    path: Path,
    params: Dict[str, Any],
    opt_state: Any = None,
    sharding: Optional[Sharding] = None,
    step: int = 0,
    extra_meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Write params (+ optimizer state + sharding) to one ``.npz`` file."""
    path = Path(path)
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
) -> Tuple[Dict[str, Any], Any, Optional[Sharding], Dict[str, Any]]:
    """Load a checkpoint; optionally re-shard onto ``new_sharding``.

    Re-sharding permutes the entity table AND any optimizer-state arrays of
    the same (table) shape through the global-ID maps, so training resumes
    bit-consistently on a different device count.

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

        def reshard(x: np.ndarray) -> np.ndarray:
            # Params store the table 2-D (n_shard * max_ent, row); go through
            # the 3-D view for the permutation.
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
            if (
                isinstance(node, np.ndarray)
                and node.shape == table_shape
            ):
                return reshard(node)
            return node

        if opt_state is not None:
            opt_state = reshard_tree(opt_state)
        sharding = new_sharding

    return params, opt_state, sharding, meta
