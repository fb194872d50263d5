"""Compile-time audit of the distributed program's collectives.

TPU-native replacement for the reference's C++ PopART plugin
``RemoveAllReducePattern`` (``besskge/custom_ops/remove_all_reduce_pattern
.cpp:14-48``): on IPU a spurious AllReduce over the fully-sharded entity
table's gradient had to be *deleted* from the compiled graph. Under
``shard_map`` the table is per-device distinct so no such AllReduce should
ever be emitted — these utilities *prove* it on the compiled HLO, so a
regression in the step construction (e.g. an accidental ``psum`` of the
table gradient) fails loudly at build time instead of silently halving
throughput.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Sequence

import jax

__all__ = ["collective_summary", "assert_no_entity_allreduce"]

_COLLECTIVES = ("all-reduce", "all-gather", "all-to-all", "reduce-scatter",
                "collective-permute")


def _compiled_text(fn: Callable, *args: Any) -> str:
    return jax.jit(fn).lower(*args).compile().as_text()


def collective_summary(fn: Callable, *args: Any) -> Dict[str, int]:
    """Count collective ops in the optimized HLO of ``jit(fn)(*args)``."""
    text = _compiled_text(fn, *args)
    counts: Dict[str, int] = {}
    for name in _COLLECTIVES:
        counts[name] = len(
            re.findall(rf"\b{name}(?:-start|-done)?(?:\.\d+)?\s*=", text)
        ) or len(re.findall(rf"= \S+ {name}", text))
    return counts


def assert_no_entity_allreduce(
    fn: Callable,
    entity_table_shape: Sequence[int],
    *args: Any,
) -> str:
    """Fail if the compiled HLO contains an ``all-reduce`` whose operand has
    the entity table's (or its local block's) shape.

    :param fn: the train/forward step to compile (un-jitted).
    :param entity_table_shape: global table shape
        ``(n_shard, max_entity_per_shard, row)``.
    :param args: example arguments for tracing.
    :return: the compiled HLO text (for further inspection).
    """
    text = _compiled_text(fn, *args)
    dims = [str(s) for s in entity_table_shape]
    shapes = {
        "[" + ",".join(dims) + "]",                  # global table
        "[" + ",".join(dims[1:]) + "]",              # local block, squeezed
        "[" + ",".join(["1"] + dims[1:]) + "]",      # local block
    }
    offending = []
    for line in text.splitlines():
        if re.search(r"=\s*\S*\s*all-reduce", line):
            for shape in shapes:
                if shape in line:
                    offending.append(line.strip())
                    break
    if offending:
        raise AssertionError(
            "Found all-reduce over entity-table-shaped operands — the table"
            " gradient/update must stay shard-local:\n"
            + "\n".join(offending[:5])
        )
    return text
