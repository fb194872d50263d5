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

__all__ = [
    "collective_summary",
    "collective_census",
    "assert_no_entity_allreduce",
]

_COLLECTIVES = ("all-reduce", "all-gather", "all-to-all", "reduce-scatter",
                "collective-permute")

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"([a-z]\w*)\[([\d,]*)\]")
_OP_RE = re.compile(
    r"=\s*(.+?)\s+(all-to-all|all-gather|all-reduce|reduce-scatter|"
    r"collective-permute)(?:-start)?\("
)


def _shapes_bytes(type_str: str) -> int:
    """Total bytes of all `dtype[dims]` shapes in an HLO result type
    (handles tuple results of variadic collectives)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_census(fn: Callable, *args: Any) -> Dict[str, Any]:
    """Exact collective census of the optimized HLO of ``jit(fn)(*args)``:
    per-op payload bytes (the per-device buffer size, summed over tuple
    elements for variadic collectives).

    The strongest multi-chip readiness proof available without hardware:
    asserting this census for the n_shard-wide train step pins the BESS
    communication contract — ONE forward AllToAll (+ its AD transpose) of
    exactly ``n_shard * (positive_per_partition + B*n_negative) * row_size``
    elements, and no all-reduce over table-shaped operands (the compile-time
    analog of the reference's C++ ``RemoveAllReducePattern``).

    :return: ``{op_name: [payload_bytes, ...]}`` for each collective kind,
        ordered as they appear in the module, plus ``"hlo"`` (full text).
    """
    text = _compiled_text(fn, *args)
    census: Dict[str, Any] = {name: [] for name in _COLLECTIVES}
    for line in text.splitlines():
        if "-done" in line or "get-tuple-element" in line:
            continue
        m = _OP_RE.search(line)
        if m:
            census[m.group(2)].append(_shapes_bytes(m.group(1)))
    census["hlo"] = text
    return census


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
