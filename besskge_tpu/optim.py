"""Sparse row-wise optimizers for the sharded entity table.

The reference runs dense SGDM/Adam over the whole entity table every step —
fine in IPU SRAM (~47 TB/s), but on TPU a dense update is HBM-bound: for a
2.5M × 100 table AdamW touches ~7 table-sizes of HBM per step. Since a BESS
step only ever *uses* the gathered rows (heads, tails, negatives), the
TPU-native update is sparse:

1. differentiate the loss w.r.t. the **gathered rows** (the AllToAll's AD
   transpose still routes tail/negative cotangents home — handled in
   :func:`besskge_tpu.trainer.build_train_step`);
2. sum duplicate-row gradients with one ``scatter-add``;
3. update parameters and (fp32) optimizer moments **only at touched rows**,
   with duplicate-safe idempotent writes.

This is the "lazy" optimizer family (as in torch's SparseAdam): moment decay
is applied only when a row is touched, and bias correction uses the global
step count. It also gives low-precision tables for free: keep the table in
bf16 while moments/updates are computed in fp32.

No reference equivalent — this replaces ``poptorch.optim`` dense updates
(notebook 1 cell 26) with a TPU-appropriate design.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Interleaved-SGDM read-path variant (see RowSGDM._update_rows_interleaved
# for the measured A/B): "xla" (default) | "pallas_gather" | "fused".
# Read ONCE at import: update_rows executes at TRACE time, so a mid-process
# change would silently not take effect after the first train-step compile
# (and could diverge across hosts in multi-host runs). Set the variable
# before importing besskge_tpu, or pass RowSGDM(fused_variant=...) to pin
# it per optimizer instance.
_FUSED_SGDM_MODE = os.environ.get("BESSKGE_FUSED_SGDM", "xla")

__all__ = [
    "RowAdamW",
    "RowSGDM",
    "RowAdagrad",
    "FusedDenseAdamW",
    "EntityRowOptimizer",
    "interleave_momentum",
    "split_interleaved",
    "interleave_adamw",
    "split_interleaved_adamw",
]


def _flat(table: jnp.ndarray) -> jnp.ndarray:
    """Read view of a table that may carry a leading unit (device) axis."""
    return table[0] if table.ndim == 3 else table


def _lr_at(lr, count: jnp.ndarray):
    """Resolve a learning rate that may be an optax-style schedule.

    ``lr`` is either a static float or a callable of the step count (e.g.
    ``optax.cosine_decay_schedule``). Schedules receive the TRACED count, so
    a decayed run still compiles to a single step function — no
    per-step recompiles. ``count`` is the PRE-increment step count (first
    step sees ``schedule(0)``), matching ``optax.scale_by_schedule`` on the
    dense tables, so the sparse and dense halves of a model see the same lr
    at every step.
    """
    return lr(count) if callable(lr) else lr


def _is_16bit_table(table: jnp.ndarray) -> bool:
    from besskge_tpu.packed import is_packed

    t = _flat(table)
    return (
        bool(is_packed(t))
        or t.dtype == jnp.bfloat16
        or t.dtype == jnp.float16
    )


def _sr_round_16(
    rows: jnp.ndarray, idx: jnp.ndarray, count: jnp.ndarray, table=None
) -> jnp.ndarray:
    """Stochastically round fp32 rows to the table's 16-bit dtype.

    Round-to-nearest silently DROPS updates smaller than half a bf16 ulp of
    the weight (~0.2% relative): at typical KGE learning rates the per-step
    delta is far below that, and a bf16-stored table simply stops learning.
    The reference's fp16 recipe trains fine because Graphcore IPUs apply
    HARDWARE stochastic rounding to fp16 arithmetic; this is the TPU
    software equivalent for the sparse row-update path: tiny updates land
    with probability proportional to their size, so the EXPECTED weight
    follows the fp32 trajectory.

    Mechanics: bf16 is the top 16 bits of fp32, so adding a uniform
    r ∈ [0, 2^16) to the fp32 bit pattern and truncating implements exact
    SR (the carry ripples through mantissa/exponent correctly; sign-
    magnitude makes it symmetric for negatives). Randomness is a
    counter-based hash of (row id, lane, step count) — stateless, and
    duplicate occurrences of a row hash identically, preserving the
    duplicate-writes-byte-identical contract the racing DMAs rely on.

    For **fp16** tables (not a bit-prefix of fp32) the bit trick does not
    apply; SR uses the exact two-candidate form instead: round to nearest,
    take the neighbor on the error's side via ``nextafter``, and pick it
    with probability err/gap — E[rounded] = exact for every finite input.
    """
    from besskge_tpu.packed import half_dtype

    half = half_dtype(_flat(table)) if table is not None else jnp.bfloat16
    lane = jnp.arange(rows.shape[-1], dtype=jnp.uint32)[None, :]
    x = (
        idx.astype(jnp.uint32)[:, None] * jnp.uint32(2654435761)
        ^ lane * jnp.uint32(0x9E3779B9)
        ^ count.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
    )
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    if half == jnp.float16:
        r32 = rows.astype(jnp.float32)
        y = r32.astype(jnp.float16)  # round-to-nearest
        y32 = y.astype(jnp.float32)
        err = r32 - y32
        toward = jnp.where(err > 0, jnp.inf, -jnp.inf).astype(jnp.float16)
        nb = jnp.nextafter(y, toward)
        gap = nb.astype(jnp.float32) - y32
        p = jnp.where(gap != 0.0, err / gap, 0.0)  # in [0, 1/2]
        u = (x >> 8).astype(jnp.float32) * (1.0 / (1 << 24))  # [0, 1)
        sr = jnp.where(u < p, nb, y)
        return jnp.where(jnp.isfinite(rows), sr, rows.astype(jnp.float16))
    bits = jax.lax.bitcast_convert_type(rows.astype(jnp.float32), jnp.uint32)
    sr = jax.lax.bitcast_convert_type(
        ((bits + (x & jnp.uint32(0xFFFF))) >> 16).astype(jnp.uint16),
        jnp.bfloat16,
    )
    # inf/nan payloads must not pick up carries
    return jnp.where(
        jnp.isfinite(rows), sr, rows.astype(jnp.bfloat16)
    )


def _apply_rows(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    rows: jnp.ndarray,
    sorted_dedup: bool = False,
) -> jnp.ndarray:
    """Duplicate-safe idempotent row writes; on TPU with 128-aligned rows
    this is the in-place Pallas DMA kernel (no table-sized copy — XLA's
    scatter copies the whole table otherwise).

    Mosaic's packed (2, 1) sublane tiling cannot express single-row slices
    of 16-bit HBM memrefs, so bf16 tables take the kernel via the row-pair
    int32 storage of :mod:`besskge_tpu.packed` — the logical writes here
    are first merged into byte-identical packed-row writes. A PLAIN bf16
    table (non-packed storage) still falls back to the XLA full-copy
    scatter; prefer packed storage for sparse-update-heavy bf16 training.

    ``sorted_dedup=True`` asserts ``idx`` is sorted with duplicate-identical
    rows (the :func:`_dedup_row_grads` contract): the Pallas kernel then
    skips duplicate slots' DMAs entirely (~50% of slots at wikikg2 shapes
    are duplicates — the issue loop is the scatter's bottleneck).
    """
    from besskge_tpu.packed import is_packed, merge_packed_row_writes

    if is_packed(_flat(table)):
        # merge returns SORTED packed indices with full segment-merged
        # content at every slot, so the sorted-dedup contract holds for
        # the packed writes regardless of the input's. Sorted input takes
        # the cheap adjacency merge (measured ~1.2 ms/step saved at
        # wikikg2 shapes — BASELINE.md round-5 decomposition).
        idx, rows = merge_packed_row_writes(
            table, idx, rows, sorted_idx=sorted_dedup
        )
        sorted_dedup = True
    else:
        rows = rows.astype(table.dtype)
    if (
        jax.default_backend() == "tpu"
        and table.shape[-1] % 128 == 0
        and table.dtype.itemsize == 4
    ):
        from besskge_tpu.ops.pallas_scatter import scatter_rows

        return scatter_rows(table, idx, rows, skip_dups=sorted_dedup)
    if table.ndim == 3:
        return table.at[0, idx].set(rows)
    return table.at[idx].set(rows)


def _apply_rows_multi(writes, sorted_dedup: bool = False):
    """Apply several (table, idx, rows) row-writes, fused into ONE Pallas
    scatter when possible (one scalar-core issue loop for all buffers —
    the loop, not the DMA engine, is the scatter bottleneck; see
    :mod:`besskge_tpu.ops.pallas_scatter`). Falls back to per-buffer
    :func:`_apply_rows` otherwise. ``writes`` is a list of
    ``(table, idx, rows)``; returns the updated tables in order.
    ``sorted_dedup``: every ``idx`` is sorted with duplicate-identical rows
    (see :func:`_apply_rows`); duplicate slots' DMAs are skipped."""
    from besskge_tpu.packed import is_packed, merge_packed_row_writes

    resolved = []
    for table, idx, rows in writes:
        if is_packed(_flat(table)):
            # merged packed indices are sorted + duplicate-identical
            idx, rows = merge_packed_row_writes(
                table, idx, rows, sorted_idx=sorted_dedup
            )
            resolved.append((table, idx, rows, True))
        else:
            rows = rows.astype(table.dtype)
            resolved.append((table, idx, rows, sorted_dedup))
    all_sorted = all(s for _, _, _, s in resolved)
    if (
        len(resolved) > 1
        and jax.default_backend() == "tpu"
        and all(
            t.shape[-1] % 128 == 0 and t.dtype.itemsize == 4
            for t, _, _, _ in resolved
        )
    ):
        from besskge_tpu.ops.pallas_scatter import scatter_rows_multi

        return scatter_rows_multi(
            tuple(t for t, _, _, _ in resolved),
            tuple(i for _, i, _, _ in resolved),
            tuple(r for _, _, r, _ in resolved),
            skip_dups=all_sorted,
        )
    out = []
    for table, idx, rows, srt in resolved:
        if (
            jax.default_backend() == "tpu"
            and table.shape[-1] % 128 == 0
            and table.dtype.itemsize == 4
        ):
            from besskge_tpu.ops.pallas_scatter import scatter_rows

            out.append(scatter_rows(table, idx, rows, skip_dups=srt))
        elif table.ndim == 3:
            out.append(table.at[0, idx].set(rows))
        else:
            out.append(table.at[idx].set(rows))
    return tuple(out)


def _apply_row_pairs(
    table: jnp.ndarray,
    phys: jnp.ndarray,
    pair_rows: jnp.ndarray,
    sorted_dedup: bool = False,
) -> jnp.ndarray:
    """Duplicate-safe (2, D) block writes at EVEN physical rows ``phys`` of
    a pair-major interleaved table (see :func:`interleave_momentum`):
    one DMA covers a row's param and momentum — the whole point of the
    layout. ``pair_rows`` is (2R, D) stacked [param; momentum] slices.
    ``sorted_dedup``: ``phys`` is sorted; duplicate slots are never written
    (their pair content may be arbitrary — the gather-redirect contract of
    :meth:`RowSGDM._update_rows_interleaved`)."""
    return _apply_row_slices(table, phys, pair_rows, 2, sorted_dedup)


def _apply_row_slices(
    table: jnp.ndarray,
    phys: jnp.ndarray,
    rows: jnp.ndarray,
    h: int,
    sorted_dedup: bool = False,
) -> jnp.ndarray:
    """Duplicate-safe ``(h, D)`` block writes at physical rows ``phys`` —
    one DMA per block on TPU (``h=2``: pair-major interleaved momentum;
    ``h=3``: triplet-major packed store). ``rows`` is ``(h·R, D)`` stacked
    slices. The XLA fallback writes EVERY slot, so under ``sorted_dedup``
    duplicate slots' content must still be byte-identical there (both
    callers' merges guarantee it)."""
    if (
        jax.default_backend() == "tpu"
        and table.shape[-1] % 128 == 0
        and table.dtype.itemsize == 4
    ):
        from besskge_tpu.ops.pallas_scatter import scatter_rows

        return scatter_rows(
            table, phys, rows, slice_rows=h, skip_dups=sorted_dedup
        )
    flat_idx = (phys[:, None] + jnp.arange(h, dtype=phys.dtype)).reshape(-1)
    if table.ndim == 3:
        return table.at[0, flat_idx].set(rows.astype(table.dtype))
    return table.at[flat_idx].set(rows.astype(table.dtype))


def _read_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """fp32 values of the touched logical rows (packed-storage aware)."""
    from besskge_tpu.packed import take_rows

    return take_rows(_flat(table), idx).astype(jnp.float32)


def _moment_shape(table: jnp.ndarray) -> Tuple[int, int]:
    """Shape of a per-logical-row fp32 moment buffer for ``table``.

    Packed bf16 tables store two logical rows per int32 row, but moments
    stay UNPACKED fp32 — (2 · packed_rows, width) — so moment reads/writes
    use plain logical indices and the direct row-scatter kernel."""
    from besskge_tpu.packed import is_packed

    t = _flat(table)
    if is_packed(t):
        return (2 * t.shape[0], t.shape[1])
    return table.shape


def interleave_momentum(
    table: jnp.ndarray, momentum: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Interleave a plain fp32 ``(N, D)`` table with its momentum into one
    pair-major ``(2N, D)`` buffer — param row ``i`` at physical row ``2i``,
    momentum at ``2i+1`` — the storage layout of :class:`RowSGDM`
    ``interleaved=True``.

    A touched row's parameter and momentum then live in ONE contiguous
    1 KB block of the (8, 128)-tiled HBM layout, so the sparse update
    reads them with one (2, D) gather slice and writes them with one
    (2, D) scatter DMA instead of two of each — the scatter is
    scalar-core DMA-issue-bound (~23 ns/DMA, BASELINE.md roofline), so
    halving the issue count is a direct step-time win. (A ``(N, 2D)``
    wide-row layout does NOT work: a 256-wide fp32 row spans two lane
    tiles, so Mosaic cannot express the single-row slice the DMA needs.)
    Leading unit (device) axes are preserved.
    """
    t = _flat(table)
    if is_packed_table(t):
        raise ValueError("interleaved momentum requires a plain fp32 table")
    m = jnp.zeros_like(t) if momentum is None else momentum.astype(t.dtype)
    n, d = t.shape
    paired = jnp.stack([t, m], axis=1).reshape(2 * n, d)
    return paired[None] if table.ndim == 3 else paired


def interleave_adamw(
    table: jnp.ndarray,
    mu: jnp.ndarray | None = None,
    nu: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Interleave a plain fp32 ``(N, D)`` table with its Adam moments into
    one treble-major ``(3N, D)`` buffer — param row ``i`` at physical row
    ``3i``, first moment at ``3i+1``, second at ``3i+2`` — the storage
    layout of :class:`RowAdamW` ``interleaved=True``. A touched row's
    param and BOTH moments then move with one (3, D) block DMA instead of
    three row DMAs (see :func:`interleave_momentum` for the measured
    DMA-issue argument). Leading unit (device) axes are preserved."""
    t = _flat(table)
    if is_packed_table(t):
        raise ValueError(
            "interleaved Adam moments require a plain fp32 table (packed "
            "tables are not supported for interleaved RowAdamW)"
        )
    m = jnp.zeros_like(t) if mu is None else mu.astype(t.dtype)
    v = jnp.zeros_like(t) if nu is None else nu.astype(t.dtype)
    n, d = t.shape
    treb = jnp.stack([t, m, v], axis=1).reshape(3 * n, d)
    return treb[None] if table.ndim == 3 else treb


def split_interleaved_adamw(
    table: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Inverse of :func:`interleave_adamw`: ``(3N, D) -> ((N, D) params,
    (N, D) mu, (N, D) nu)``. Use at checkpoint-save and before standalone
    evaluation."""
    t = _flat(table)
    if t.shape[0] % 3:
        raise ValueError(
            f"expected a treble-major (3N, D) table; got {tuple(t.shape)}"
        )
    trio = t.reshape(t.shape[0] // 3, 3, t.shape[-1])
    p, m, v = trio[:, 0], trio[:, 1], trio[:, 2]
    if table.ndim == 3:
        return p[None], m, v
    return p, m, v


def split_interleaved(table: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of :func:`interleave_momentum`: ``(2N, D) -> ((N, D) params,
    (N, D) momentum)``. Use at checkpoint-save and before standalone
    evaluation (eval over an interleaved table works — gathers are
    pair-aware — but contiguous window slices read 2x the bytes)."""
    t = _flat(table)
    pairs = t.reshape(t.shape[0] // 2, 2, t.shape[-1])
    p, m = pairs[:, 0], pairs[:, 1]
    if table.ndim == 3:
        return p[None], m[None]
    return p, m


def is_packed_table(t: jnp.ndarray) -> bool:
    from besskge_tpu.packed import is_packed

    return is_packed(t)


class EntityRowOptimizer:
    """Interface: sparse per-row optimizer for the local entity-table shard."""

    #: True when optimizer state lives inside the widened param table
    interleaved: bool = False
    #: which interleaved layout the checkpoint boundary should de/re-build
    #: ("momentum" = pair/triplet momentum stores; "adamw" = treble mu/nu)
    interleave_layout: str = "momentum"

    def widen_table(self, table: jnp.ndarray) -> jnp.ndarray:
        """Widen a plain table into this optimizer's interleaved storage
        layout (identity for non-interleaved optimizers). The Trainer
        calls this on construction for un-widened tables; ``init``
        validates the widened height against the logical row count."""
        return table

    def init(
        self, table: jnp.ndarray, n_logical: int | None = None
    ) -> Dict[str, Any]:
        """Optimizer state for one local table shard.

        ``n_logical`` (optional) is the GLOBAL logical entity-row count;
        when given, layout-sensitive optimizers validate the physical table
        height against it (an interleaved table must be exactly
        ``2 * n_logical`` rows — see :class:`RowSGDM`)."""
        raise NotImplementedError

    def update_rows(
        self,
        table: jnp.ndarray,
        state: Dict[str, Any],
        idx: jnp.ndarray,
        grad_rows: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """Apply one step given flat touched-row indices (R,) — duplicates
        allowed — and their per-occurrence gradients (R, row)."""
        raise NotImplementedError


def _dedup_row_grads(
    table: jnp.ndarray, idx: jnp.ndarray, grad_rows: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sorted occurrences with per-row summed gradients, no table-sized
    buffer: returns ``(sorted_idx, summed_grads)``, both length R.

    Sort the R touched-row occurrences by row id, segment-sum with a cumsum
    difference, and broadcast each segment's total to every occurrence of
    that row — duplicate occurrences all see the SAME total gradient, so
    row writes keyed by ``sorted_idx`` are idempotent. The result stays in
    SORTED row order on purpose: the optimizer update is order-free (pure
    per-row math + idempotent writes), sorted gather/scatter addresses are
    monotone (HBM locality for the row DMAs), and skipping the
    inverse-permutation restore saves a (R, row) scatter per step (~70 µs
    at wikikg2 bench shapes). O(R log R + R·row); the table itself is
    never traversed.
    """
    r = idx.shape[0]
    # One variadic sort yields BOTH the sorted ids and the permutation —
    # argsort followed by jnp.take(idx, order) costs an extra 1-D gather,
    # which the TPU emits as a ~58 us serial loop at R=8704 (profiled in
    # benchmarks/roofline_wikikg2.py).
    si, order = jax.lax.sort(
        (idx, jnp.arange(r, dtype=jnp.int32)), num_keys=1
    )
    sg = jnp.take(grad_rows.astype(jnp.float32), order, axis=0)
    cs = jnp.cumsum(sg, axis=0)
    pos = jnp.arange(r, dtype=jnp.int32)
    # Last/first occurrence index of each element's segment.
    is_last = jnp.concatenate([si[1:] != si[:-1], jnp.array([True])])
    is_first = jnp.concatenate([jnp.array([True]), si[1:] != si[:-1]])
    # seg_end[i] = smallest j >= i with is_last[j]: reverse cummin of
    # (pos where last else +inf).
    end_candidates = jnp.where(is_last, pos, r - 1)
    seg_end = jax.lax.cummin(end_candidates, reverse=True)
    start_candidates = jnp.where(is_first, pos, 0)
    seg_start = jax.lax.cummax(start_candidates)
    totals = jnp.take(cs, seg_end, axis=0) - jnp.where(
        (seg_start > 0)[:, None], jnp.take(cs, seg_start - 1, axis=0), 0.0
    )
    return si, totals


@dataclasses.dataclass
class RowAdamW(EntityRowOptimizer):
    """Lazy AdamW on touched rows; fp32 moments regardless of table dtype."""

    #: static float, or an optax-style schedule called with the step count
    learning_rate: Any
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    #: stochastically round writes into 16-bit tables (see _sr_round_16)
    stochastic_rounding: bool = True
    #: store both Adam moments interleaved with the params in one
    #: treble-major (3N, D) fp32 buffer (see :func:`interleave_adamw`):
    #: one (3, D) block DMA per touched row instead of three row DMAs.
    #: fp32 tables only; the Trainer widens automatically and checkpoint
    #: save/load de/re-interleaves (on-disk format unchanged).
    interleaved: bool = False
    interleave_layout: str = "adamw"

    def init(self, table, n_logical=None):
        if self.interleaved:
            from besskge_tpu.packed import is_packed

            t = _flat(table)
            if is_packed(t):
                # quintuplet-major packed store (packed.is_quintupled):
                # [packed param pair | mu 2p | mu 2p+1 | nu 2p | nu 2p+1]
                if n_logical is not None and t.shape[0] != 5 * (
                    (n_logical + 1) // 2
                ):
                    raise ValueError(
                        f"interleaved packed table must be "
                        f"(5·ceil({n_logical}/2), D) — got {tuple(t.shape)}"
                        f"; widen it with interleave_packed_adamw()"
                    )
                if t.shape[0] % 5:
                    raise ValueError(
                        "interleaved packed table must be quintuplet-major"
                        " (5P, D) — widen it with "
                        "interleave_packed_adamw()"
                    )
                return {"count": jnp.zeros((), jnp.int32)}
            if _is_16bit_table(table) or t.dtype.itemsize != 4:
                raise ValueError(
                    "interleaved Adam moments require a plain fp32 or a "
                    "row-pair-packed table"
                )
            if n_logical is not None and t.shape[0] != 3 * n_logical:
                raise ValueError(
                    f"interleaved table must be (3*{n_logical}, D) — got "
                    f"{tuple(t.shape)}; widen it with interleave_adamw()"
                )
            if t.shape[0] % 3:
                raise ValueError(
                    "interleaved table must be treble-major (3N, D) — "
                    "widen it with interleave_adamw()"
                )
            return {"count": jnp.zeros((), jnp.int32)}
        return {
            "mu": jnp.zeros(_moment_shape(table), jnp.float32),
            "nu": jnp.zeros(_moment_shape(table), jnp.float32),
            "count": jnp.zeros((), jnp.int32),
        }

    def widen_table(self, table):
        if not self.interleaved:
            return table
        from besskge_tpu.packed import interleave_packed_adamw, is_packed

        if is_packed(_flat(table)):
            return interleave_packed_adamw(table)
        return interleave_adamw(table)

    def _update_rows_interleaved_packed(self, table, state, idx, grad_rows):
        """Quintuplet-store variant for packed tables (the reference
        capacity tables' fp16 + Adam recipe): the packed param pair AND
        both logical rows' mu/nu live in one contiguous (5, D) block,
        written back with ONE scatter DMA per touched packed row — the
        separate-buffer path issues one packed-param DMA plus two fp32
        moment DMAs per touched LOGICAL row. Identical arithmetic (same
        dedup, same bias correction, same SR hash), pinned bit-exact in
        tests/test_adamw_interleaved.py."""
        from besskge_tpu.packed import (
            half_dtype,
            merge_packed_block_writes,
            take_rows,
        )

        idx, g = _dedup_row_grads(table, idx, grad_rows)
        t = _flat(table)
        p = (idx >> 1).astype(jnp.int32)
        odd = (idx & 1).astype(jnp.int32)
        count = state["count"] + 1
        p_rows = take_rows(
            t, idx, n_logical=2 * (t.shape[0] // 5)
        ).astype(jnp.float32)
        mu_prev = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(
                jnp.take(t, 5 * p + 1 + odd, axis=0), jnp.uint32
            ),
            jnp.float32,
        )
        nu_prev = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(
                jnp.take(t, 5 * p + 3 + odd, axis=0), jnp.uint32
            ),
            jnp.float32,
        )
        mu_rows = self.b1 * mu_prev + (1 - self.b1) * g
        nu_rows = self.b2 * nu_prev + (1 - self.b2) * (g * g)
        tf = count.astype(jnp.float32)
        mu_hat = mu_rows / (1 - self.b1**tf)
        nu_hat = nu_rows / (1 - self.b2**tf)
        upd = _lr_at(self.learning_rate, state["count"]) * (
            mu_hat / (jnp.sqrt(nu_hat) + self.eps)
            + self.weight_decay * p_rows
        )
        new_rows = p_rows - upd
        if self.stochastic_rounding:
            new_rows = _sr_round_16(new_rows, idx, count, table)
        else:
            new_rows = new_rows.astype(half_dtype(t))
        phys, out = merge_packed_block_writes(
            table, idx, new_rows, [mu_rows, nu_rows]
        )
        new_table = _apply_row_slices(table, phys, out, 5, sorted_dedup=True)
        return new_table, {"count": count}

    def _update_rows_interleaved(self, table, state, idx, grad_rows):
        """Treble-store variant: one flat gather reads each touched row's
        [param | mu | nu] trio, one (3, D)-block scatter writes all three
        back — identical arithmetic to the separate-buffer path (pinned
        bit-exact in tests/test_adamw_interleaved.py)."""
        from besskge_tpu.packed import is_packed

        if is_packed(_flat(table)):
            return self._update_rows_interleaved_packed(
                table, state, idx, grad_rows
            )
        idx, g = _dedup_row_grads(table, idx, grad_rows)
        d = grad_rows.shape[-1]
        t = _flat(table)
        phys = (3 * idx).astype(jnp.int32)
        count = state["count"] + 1
        flat_idx = (
            phys[:, None] + jnp.arange(3, dtype=phys.dtype)
        ).reshape(-1)
        trios = jnp.take(t, flat_idx, axis=0).reshape(-1, 3, d)
        p_rows, mu_prev, nu_prev = trios[:, 0], trios[:, 1], trios[:, 2]
        mu_rows = self.b1 * mu_prev + (1 - self.b1) * g
        nu_rows = self.b2 * nu_prev + (1 - self.b2) * (g * g)
        tf = count.astype(jnp.float32)
        mu_hat = mu_rows / (1 - self.b1**tf)
        nu_hat = nu_rows / (1 - self.b2**tf)
        upd = _lr_at(self.learning_rate, state["count"]) * (
            mu_hat / (jnp.sqrt(nu_hat) + self.eps)
            + self.weight_decay * p_rows
        )
        new_p = p_rows - upd
        new_trios = jnp.stack([new_p, mu_rows, nu_rows], axis=1).reshape(
            -1, d
        )
        on_tpu = (
            jax.default_backend() == "tpu" and table.shape[-1] % 128 == 0
        )
        new_table = _apply_row_slices(
            table, phys, new_trios, 3, sorted_dedup=on_tpu
        )
        return new_table, {"count": count}

    def update_rows(self, table, state, idx, grad_rows):
        if self.interleaved:
            return self._update_rows_interleaved(table, state, idx, grad_rows)
        idx, g = _dedup_row_grads(table, idx, grad_rows)
        count = state["count"] + 1
        mu_rows = self.b1 * jnp.take(_flat(state["mu"]), idx, axis=0) + (1 - self.b1) * g
        nu_rows = self.b2 * jnp.take(_flat(state["nu"]), idx, axis=0) + (
            1 - self.b2
        ) * (g * g)
        t = count.astype(jnp.float32)
        mu_hat = mu_rows / (1 - self.b1**t)
        nu_hat = nu_rows / (1 - self.b2**t)
        p_rows = _read_rows(table, idx)
        upd = _lr_at(self.learning_rate, state["count"]) * (
            mu_hat / (jnp.sqrt(nu_hat) + self.eps) + self.weight_decay * p_rows
        )
        new_rows = p_rows - upd  # dtype handled by _apply_rows (packed-aware)
        if self.stochastic_rounding and _is_16bit_table(table):
            new_rows = _sr_round_16(new_rows, idx, count, table)
        new_table, new_mu, new_nu = _apply_rows_multi([
            (table, idx, new_rows),
            (state["mu"], idx, mu_rows),
            (state["nu"], idx, nu_rows),
        ], sorted_dedup=True)
        return new_table, {"mu": new_mu, "nu": new_nu, "count": count}


@dataclasses.dataclass
class RowSGDM(EntityRowOptimizer):
    """Lazy SGD with momentum on touched rows (the reference wikikg2 recipe,
    notebook 3 cell 14); fp32 momentum buffer."""

    #: static float, or an optax-style schedule called with the step count
    learning_rate: Any
    momentum: float = 0.9
    weight_decay: float = 0.0
    #: stochastically round writes into 16-bit tables (see _sr_round_16)
    stochastic_rounding: bool = True
    #: store the momentum interleaved with the params in one pair-major
    #: (2N, D) fp32 buffer (see :func:`interleave_momentum`): halves the
    #: gather/scatter DMA count — the sparse step's top cost after the
    #: score kernels. The caller widens the table (Trainer does it
    #: automatically; checkpoint save/load de/re-interleaves so the
    #: on-disk format is unchanged).
    interleaved: bool = False
    #: interleaved read-path variant override ("xla" | "pallas_gather" |
    #: "fused"); None uses the import-time BESSKGE_FUSED_SGDM default.
    fused_variant: str | None = None

    def init(self, table, n_logical=None):
        if self.interleaved:
            from besskge_tpu.packed import is_packed

            t = _flat(table)
            if self.momentum == 0.0:
                raise ValueError("interleaved=True requires momentum != 0")
            if is_packed(t):
                # triplet-major packed store (see packed.is_tripled):
                # [packed param pair | fp32 momentum 2p | momentum 2p+1]
                if n_logical is not None and t.shape[0] != 3 * (
                    (n_logical + 1) // 2
                ):
                    raise ValueError(
                        f"interleaved packed table must be "
                        f"(3·ceil({n_logical}/2), D) — got {tuple(t.shape)};"
                        f" widen it with interleave_packed_momentum()"
                    )
                if t.shape[0] % 3:
                    raise ValueError(
                        "interleaved packed table must be triplet-major "
                        "(3P, D) — widen it with "
                        "interleave_packed_momentum()"
                    )
                return {"count": jnp.zeros((), jnp.int32)}
            if _is_16bit_table(table) or t.dtype.itemsize != 4:
                raise ValueError(
                    "interleaved momentum requires a plain fp32 or a "
                    "row-pair-packed table"
                )
            # An even-N PLAIN table passes the parity check but would take
            # unguarded Pallas DMA writes at phys=2*idx up to 2N-2 rows
            # past the buffer — when the caller knows the logical row
            # count, require the exact widened height.
            if n_logical is not None and t.shape[0] != 2 * n_logical:
                raise ValueError(
                    f"interleaved table must be (2*{n_logical}, D) — got "
                    f"{tuple(t.shape)}; widen it with interleave_momentum()"
                )
            if t.shape[0] % 2:
                raise ValueError(
                    "interleaved table must be pair-major (2N, D) —"
                    " widen it with interleave_momentum()"
                )
            return {"count": jnp.zeros((), jnp.int32)}
        if self.momentum == 0.0:
            return {"count": jnp.zeros((), jnp.int32)}
        return {
            "m": jnp.zeros(_moment_shape(table), jnp.float32),
            "count": jnp.zeros((), jnp.int32),
        }

    def _update_rows_interleaved(self, table, state, idx, grad_rows):
        """One (2, D) gather slice reads [param row | momentum row], one
        (2, D) scatter DMA writes both back: the pairs are
        duplicate-consistent because they are pure functions of the deduped
        gradient and the current row content, so the idempotent-scatter
        contract holds unchanged."""
        from besskge_tpu.packed import is_packed

        if is_packed(_flat(table)):
            return self._update_rows_interleaved_packed(
                table, state, idx, grad_rows
            )
        idx, g = _dedup_row_grads(table, idx, grad_rows)
        d = grad_rows.shape[-1]
        t = _flat(table)
        phys = (2 * idx).astype(jnp.int32)
        lr = _lr_at(self.learning_rate, state["count"])
        # Fused path is only safe when the Pallas kernel will actually run:
        # the XLA fallback reads/writes EVERY slot, so dup pairs must stay
        # real there.
        on_tpu = (
            jax.default_backend() == "tpu" and table.shape[-1] % 128 == 0
        )
        # Measured A/B at the wikikg2 bench shape (BASELINE.md round 4):
        # XLA row-gather + math + skip-dups Pallas scatter 2.39M/s (DEFAULT)
        # > Pallas DMA pair-gather variant 2.15M/s ("pallas_gather")
        # > fully-fused pair-SGDM kernel 1.97M/s ("fused").
        # Reads lose as row DMAs: a read stream must cover the HBM
        # round-trip latency that posted writes never pay, and XLA's
        # gather fusion pipelines better; the fused kernel additionally
        # serializes fetch/compute/store per block. Both variants stay
        # selectable for future hardware via the ``fused_variant`` field
        # or BESSKGE_FUSED_SGDM (import-time; see _FUSED_SGDM_MODE).
        mode = self.fused_variant or _FUSED_SGDM_MODE
        if on_tpu and mode == "fused":
            from besskge_tpu.ops.pallas_row_sgdm import fused_pair_sgdm

            new_table = fused_pair_sgdm(
                table, phys, g, lr,
                momentum=self.momentum, weight_decay=self.weight_decay,
                skip_dups=True,
            )
            return new_table, {"count": state["count"] + 1}
        if on_tpu and mode == "pallas_gather":
            from besskge_tpu.ops.pallas_scatter import gather_rows

            pairs = gather_rows(t, phys, slice_rows=2, skip_dups=True)
            pairs = pairs.reshape(-1, 2, d)
            p_rows, m_prev = pairs[:, 0], pairs[:, 1]
            if self.weight_decay:
                g = g + self.weight_decay * p_rows
            m_rows = self.momentum * m_prev + g
            new_p = p_rows - lr * m_rows
            new_pairs = jnp.stack([new_p, m_rows], axis=1).reshape(-1, d)
            new_table = _apply_row_pairs(
                table, phys, new_pairs, sorted_dedup=True
            )
            return new_table, {"count": state["count"] + 1}
        # Read as 2R single-row gathers. Measured alternatives, all WORSE
        # (BASELINE.md round 4): (N, 2D) wide-row take via bitcast reshape
        # — 0.43M/s end-to-end, XLA lowers wide-row gathers ~8x slower
        # than 128-lane row gathers; Pallas DMA pair-gather — 2.15M/s
        # (read DMAs pay the HBM round-trip posted writes don't); fully
        # fused pair-SGDM kernel — 1.97M/s. This XLA form: 2.39M/s.
        flat_idx = (
            phys[:, None] + jnp.arange(2, dtype=phys.dtype)
        ).reshape(-1)
        pairs = jnp.take(t, flat_idx, axis=0).reshape(-1, 2, d)
        p_rows, m_prev = pairs[:, 0], pairs[:, 1]
        if self.weight_decay:
            g = g + self.weight_decay * p_rows
        m_rows = self.momentum * m_prev + g
        new_p = p_rows - lr * m_rows
        new_pairs = jnp.stack([new_p, m_rows], axis=1).reshape(-1, d)
        new_table = _apply_row_pairs(table, phys, new_pairs, sorted_dedup=on_tpu)
        return new_table, {"count": state["count"] + 1}

    def widen_table(self, table):
        if not self.interleaved:
            return table
        from besskge_tpu.packed import (
            interleave_packed_momentum,
            is_packed,
        )

        if is_packed(_flat(table)):
            return interleave_packed_momentum(table)
        return interleave_momentum(table)

    def _update_rows_interleaved_packed(self, table, state, idx, grad_rows):
        """Triplet-store variant (see :func:`besskge_tpu.packed.is_tripled`):
        the packed param pair AND both logical rows' fp32 momenta live in
        one contiguous (3, D) block, written back with ONE scatter DMA per
        touched packed row — the non-interleaved packed path issues one
        packed-param DMA plus one fp32 momentum DMA per touched LOGICAL
        row (~3x the issue work at BESS batch shapes; the scatter is
        scalar-core issue-bound, BASELINE.md roofline). Update math is
        identical to the non-interleaved path (same dedup, same momentum
        rule, same stochastic rounding hash), so trajectories match
        bit-for-bit — pinned in tests/test_packed_interleaved.py."""
        from besskge_tpu.packed import (
            half_dtype,
            merge_packed_triplet_writes,
            take_rows,
        )

        idx, g = _dedup_row_grads(table, idx, grad_rows)
        t = _flat(table)
        p = (idx >> 1).astype(jnp.int32)
        odd = (idx & 1).astype(jnp.int32)
        # current params: triplet-aware plane select at physical row 3p
        p_rows = take_rows(t, idx, tripled=True).astype(jnp.float32)
        # current momentum: fp32 bits at physical row 3p + 1 + parity
        m_prev = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(
                jnp.take(t, 3 * p + 1 + odd, axis=0), jnp.uint32
            ),
            jnp.float32,
        )
        if self.weight_decay:
            g = g + self.weight_decay * p_rows
        lr = _lr_at(self.learning_rate, state["count"])
        m_rows = self.momentum * m_prev + g
        new_rows = p_rows - lr * m_rows
        new_state = {"count": state["count"] + 1}
        if self.stochastic_rounding:
            new_rows = _sr_round_16(new_rows, idx, new_state["count"], table)
        else:
            # match the non-interleaved write dtype (merge casts to half)
            new_rows = new_rows.astype(half_dtype(t))
        phys, out = merge_packed_triplet_writes(table, idx, new_rows, m_rows)
        new_table = _apply_row_slices(table, phys, out, 3, sorted_dedup=True)
        return new_table, new_state

    def update_rows(self, table, state, idx, grad_rows):
        if self.interleaved:
            return self._update_rows_interleaved(table, state, idx, grad_rows)
        idx, g = _dedup_row_grads(table, idx, grad_rows)
        p_rows = _read_rows(table, idx)
        if self.weight_decay:
            g = g + self.weight_decay * p_rows
        new_state = dict(state, count=state["count"] + 1)
        m_rows = None
        if self.momentum != 0.0:
            m_rows = self.momentum * jnp.take(_flat(state["m"]), idx, axis=0) + g
            g = m_rows
        # dtype handled in _apply_rows
        new_rows = p_rows - _lr_at(self.learning_rate, state["count"]) * g
        if self.stochastic_rounding and _is_16bit_table(table):
            new_rows = _sr_round_16(new_rows, idx, new_state["count"], table)
        if m_rows is None:
            return _apply_rows(table, idx, new_rows, sorted_dedup=True), new_state
        new_table, new_state["m"] = _apply_rows_multi([
            (table, idx, new_rows),
            (state["m"], idx, m_rows),
        ], sorted_dedup=True)
        return new_table, new_state


@dataclasses.dataclass
class RowAdagrad(EntityRowOptimizer):
    """Lazy Adagrad on touched rows (the classic sparse-embedding choice)."""

    #: static float, or an optax-style schedule called with the step count
    learning_rate: Any
    eps: float = 1e-10
    #: stochastically round writes into 16-bit tables (see _sr_round_16)
    stochastic_rounding: bool = True
    #: store the accumulator interleaved with the params — the single-state
    #: layouts of :class:`RowSGDM`: pair-major (2N, D) fp32 or
    #: triplet-major (3P, D) packed. One block DMA per touched row.
    interleaved: bool = False
    interleave_layout: str = "adagrad"

    def init(self, table, n_logical=None):
        if self.interleaved:
            from besskge_tpu.packed import is_packed

            t = _flat(table)
            if is_packed(t):
                if n_logical is not None and t.shape[0] != 3 * (
                    (n_logical + 1) // 2
                ):
                    raise ValueError(
                        f"interleaved packed table must be "
                        f"(3·ceil({n_logical}/2), D) — got {tuple(t.shape)}"
                        f"; widen it with interleave_packed_momentum()"
                    )
                if t.shape[0] % 3:
                    raise ValueError(
                        "interleaved packed table must be triplet-major "
                        "(3P, D) — widen it with "
                        "interleave_packed_momentum()"
                    )
                return {"count": jnp.zeros((), jnp.int32)}
            if _is_16bit_table(table) or t.dtype.itemsize != 4:
                raise ValueError(
                    "interleaved Adagrad requires a plain fp32 or a "
                    "row-pair-packed table"
                )
            if n_logical is not None and t.shape[0] != 2 * n_logical:
                raise ValueError(
                    f"interleaved table must be (2*{n_logical}, D) — got "
                    f"{tuple(t.shape)}; widen it with interleave_momentum()"
                )
            if t.shape[0] % 2:
                raise ValueError(
                    "interleaved table must be pair-major (2N, D) —"
                    " widen it with interleave_momentum()"
                )
            return {"count": jnp.zeros((), jnp.int32)}
        return {
            "acc": jnp.zeros(_moment_shape(table), jnp.float32),
            "count": jnp.zeros((), jnp.int32),
        }

    def widen_table(self, table):
        if not self.interleaved:
            return table
        from besskge_tpu.packed import (
            interleave_packed_momentum,
            is_packed,
        )

        if is_packed(_flat(table)):
            return interleave_packed_momentum(table)
        return interleave_momentum(table)

    def _update_rows_interleaved(self, table, state, idx, grad_rows):
        """Pair/triplet-store variant (the accumulator reuses RowSGDM's
        single-state layouts): one block DMA reads and writes a touched
        row's [param | acc] — identical arithmetic to the separate-buffer
        path (pinned bit-exact in tests/test_adagrad_interleaved.py)."""
        from besskge_tpu.packed import (
            half_dtype,
            is_packed,
            merge_packed_triplet_writes,
            take_rows,
        )

        idx, g = _dedup_row_grads(table, idx, grad_rows)
        t = _flat(table)
        count = state["count"] + 1
        lr = _lr_at(self.learning_rate, state["count"])
        if is_packed(t):
            p = (idx >> 1).astype(jnp.int32)
            odd = (idx & 1).astype(jnp.int32)
            p_rows = take_rows(t, idx, tripled=True).astype(jnp.float32)
            acc_prev = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(
                    jnp.take(t, 3 * p + 1 + odd, axis=0), jnp.uint32
                ),
                jnp.float32,
            )
            acc_rows = acc_prev + g * g
            new_rows = p_rows - lr * g / (jnp.sqrt(acc_rows) + self.eps)
            if self.stochastic_rounding:
                new_rows = _sr_round_16(new_rows, idx, count, table)
            else:
                new_rows = new_rows.astype(half_dtype(t))
            phys, out = merge_packed_triplet_writes(
                table, idx, new_rows, acc_rows
            )
            new_table = _apply_row_slices(
                table, phys, out, 3, sorted_dedup=True
            )
            return new_table, {"count": count}
        d = grad_rows.shape[-1]
        phys = (2 * idx).astype(jnp.int32)
        flat_idx = (
            phys[:, None] + jnp.arange(2, dtype=phys.dtype)
        ).reshape(-1)
        pairs = jnp.take(t, flat_idx, axis=0).reshape(-1, 2, d)
        p_rows, acc_prev = pairs[:, 0], pairs[:, 1]
        acc_rows = acc_prev + g * g
        new_p = p_rows - lr * g / (jnp.sqrt(acc_rows) + self.eps)
        new_pairs = jnp.stack([new_p, acc_rows], axis=1).reshape(-1, d)
        on_tpu = (
            jax.default_backend() == "tpu" and table.shape[-1] % 128 == 0
        )
        new_table = _apply_row_pairs(table, phys, new_pairs,
                                     sorted_dedup=on_tpu)
        return new_table, {"count": count}

    def update_rows(self, table, state, idx, grad_rows):
        if self.interleaved:
            return self._update_rows_interleaved(table, state, idx, grad_rows)
        idx, g = _dedup_row_grads(table, idx, grad_rows)
        acc_rows = jnp.take(_flat(state["acc"]), idx, axis=0) + g * g
        p_rows = _read_rows(table, idx)
        lr = _lr_at(self.learning_rate, state["count"])
        new_rows = (
            p_rows - lr * g / (jnp.sqrt(acc_rows) + self.eps)
        )  # dtype handled by _apply_rows (packed-aware)
        if self.stochastic_rounding and _is_16bit_table(table):
            new_rows = _sr_round_16(new_rows, idx, state["count"] + 1, table)
        new_table, new_acc = _apply_rows_multi([
            (table, idx, new_rows),
            (state["acc"], idx, acc_rows),
        ], sorted_dedup=True)
        return new_table, {"acc": new_acc, "count": state["count"] + 1}


@dataclasses.dataclass
class FusedDenseAdamW:
    """Dense AdamW over the whole entity table with a fused in-place Pallas
    kernel (one read+write pass over param/mu/nu/grad — XLA's composed optax
    update runs at ~1/3 of HBM bandwidth). The right choice for SMALL/MEDIUM
    tables where sparse row updates don't pay off; gradients are computed
    densely (scatter-add), so prefer :class:`RowAdamW` at multi-GB scale.

    Off-TPU (and for non-2-D tables) falls back to the same formula in jnp.
    A schedule ``learning_rate`` also takes the jnp path — the Pallas kernel
    bakes lr in as a compile-time scalar.
    """

    #: static float, or an optax-style schedule called with the step count
    learning_rate: Any
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0

    def init(self, table, n_logical=None):
        return {
            "mu": jnp.zeros(table.shape, jnp.float32),
            "nu": jnp.zeros(table.shape, jnp.float32),
            "count": jnp.zeros((), jnp.int32),
        }

    def apply_dense(self, table, state, grad):
        """One step from a DENSE table gradient; returns (table, state)."""
        count = state["count"] + 1
        if (
            jax.default_backend() == "tpu"
            and table.ndim == 2
            and table.dtype.itemsize == 4
            and not callable(self.learning_rate)
        ):
            from besskge_tpu.ops.pallas_adamw import dense_adamw_update

            p, mu, nu = dense_adamw_update(
                table, state["mu"], state["nu"], grad, count,
                lr=self.learning_rate, b1=self.b1, b2=self.b2, eps=self.eps,
                wd=self.weight_decay,
            )
            return p, {"mu": mu, "nu": nu, "count": count}
        g = grad.astype(jnp.float32)
        t = count.astype(jnp.float32)
        mu = self.b1 * state["mu"] + (1 - self.b1) * g
        nu = self.b2 * state["nu"] + (1 - self.b2) * g * g
        mu_hat = mu / (1 - self.b1**t)
        nu_hat = nu / (1 - self.b2**t)
        p = table.astype(jnp.float32)
        upd = _lr_at(self.learning_rate, state["count"]) * (
            mu_hat / (jnp.sqrt(nu_hat) + self.eps) + self.weight_decay * p
        )
        return (p - upd).astype(table.dtype), {
            "mu": mu, "nu": nu, "count": count,
        }


#: Backward-compatible name (bf16 was the only 16-bit table type pre-fp16).
_sr_round_bf16 = _sr_round_16
