"""Pallas TPU kernel: in-place row writes into a large embedding table.

XLA:TPU lowers ``table.at[idx].set(rows)`` to a full-table copy even when the
buffer is donated — at wikikg2 scale (1 GB table) that is ~8 ms per scatter,
dominating the whole BESS training step. This kernel writes ONLY the touched
rows, as a pipelined stream of HBM→HBM row DMAs into an output buffer that
ALIASES the input table: the sparse-update path of :mod:`besskge_tpu.optim`
becomes O(touched rows) in time as well as in gradient math. (This is the
Pallas "scatter embedding-update" component anticipated by SURVEY.md §2.12
as the native analog of the reference's update path.)

Duplicate indices are safe by construction: the row optimizers make all
occurrences of a row carry identical content, so racing DMAs write the same
bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["scatter_rows", "scatter_rows_multi", "gather_rows"]

#: DMA pipeline depth (row copies in flight). Measured on v5e: the loop is
#: ISSUE-bound (~23 ns/DMA of scalar-core work), so depth beyond 32 buys
#: nothing (benchmarks/exp_scatter_depth.py: 16/4 -> 417.7 us, 32/8 ->
#: 402.5, 64/8 -> 404.0 per wikikg2 step).
_W = 32


#: DMAs issued per loop iteration (amortizes scalar-core loop overhead).
_U = 8


def _scatter_kernel(
    idx_ref, rows_ref, table_ref, out_ref, sems, *, h=1, skip_dups=False
):
    del table_ref  # aliased with out_ref; input exists only for the alias.
    n = idx_ref.shape[0]  # guaranteed a multiple of _U by the caller
    three_d = len(out_ref.shape) == 3

    def dma(i):
        # h > 1: one (h, D) slice per index — e.g. the pair-major
        # interleaved-momentum layout writes [param row | momentum row] as
        # ONE (2, D) DMA (rows 2i, 2i+1 are contiguous within an (8, 128)
        # tile for even 2i, which Mosaic accepts; a (1, 2D) wide-row slice
        # of a (N, 2D) memref is NOT expressible — the row spans two lane
        # tiles).
        dst = (
            out_ref.at[0, pl.ds(idx_ref[i], h)]
            if three_d
            else out_ref.at[pl.ds(idx_ref[i], h)]
        )
        return pltpu.make_async_copy(
            rows_ref.at[pl.ds(h * i, h)], dst, sems.at[i % _W]
        )

    def _pred(i):
        # skip_dups predicate: slot i is a duplicate of i-1 in the SORTED
        # index list — its DMA is pure re-write traffic (and its row
        # content may be garbage under the gather-redirect contract), so
        # don't issue it. Slot 0 is never a skip. A pure function of the
        # prefetched scalars, so start and wait recompute it identically.
        if isinstance(i, int):
            return None if i == 0 else idx_ref[i] != idx_ref[i - 1]
        prev = idx_ref[jax.lax.max(i - 1, 0)]
        return (idx_ref[i] != prev) | (i == 0)

    def start(i):
        if not skip_dups:
            dma(i).start()
            return
        p = _pred(i)
        if p is None:
            dma(i).start()
        else:
            @pl.when(p)
            def _():
                dma(i).start()

    def wait(i):
        if not skip_dups:
            dma(i).wait()
            return
        p = _pred(i)
        if p is None:
            dma(i).wait()
        else:
            @pl.when(p)
            def _():
                dma(i).wait()

    if n <= _W:
        # Small n: start everything, then wait for everything.
        for i in range(n):
            start(i)
        for i in range(n):
            wait(i)
        return

    # Issue-loop structure matters: the loop is scalar-core-bound
    # (~23 ns/DMA), so the steady state carries NO branch when
    # skip_dups=False — a guarded wait per DMA (the previous shape) costs
    # an extra predicate each issue. Fill the window unguarded, run
    # wait+start pairs, drain. With skip_dups the predicate pays for
    # itself whenever >~15% of slots are duplicates (the sparse-update
    # path runs ~50% at wikikg2 shapes).
    for i in range(_W):  # fill (static unroll)
        start(i)

    def body(k, _):
        base = _W + k * _U
        for u in range(_U):
            wait(base + u - _W)
            start(base + u)
        return 0

    # n and _W are multiples of _U (caller pads; _W % _U == 0).
    jax.lax.fori_loop(0, (n - _W) // _U, body, 0)

    def drain(j, _):
        wait(n - _W + j)
        return 0

    jax.lax.fori_loop(0, _W, drain, 0)


def _scatter_kernel_multi(*refs, n_buf: int, skip_dups=False):
    # refs = idx_0..idx_{k-1}, rows_0.., table_0.., out_0.., sems
    idxs = refs[:n_buf]
    rows = refs[n_buf : 2 * n_buf]
    outs = refs[3 * n_buf : 4 * n_buf]
    sems = refs[-1]
    n = idxs[0].shape[0]

    def dma(i, b):
        out_ref = outs[b]
        dst = (
            out_ref.at[0, pl.ds(idxs[b][i], 1)]
            if len(out_ref.shape) == 3
            else out_ref.at[pl.ds(idxs[b][i], 1)]
        )
        return pltpu.make_async_copy(
            rows[b].at[pl.ds(i, 1)], dst, sems.at[i % _W, b]
        )

    def _pred(i, b):
        # Per-buffer sorted-run predicate (see _scatter_kernel._pred); the
        # buffers' index lists dedup independently (packed param indices
        # differ from the moments' logical ones).
        if isinstance(i, int):
            return None if i == 0 else idxs[b][i] != idxs[b][i - 1]
        prev = idxs[b][jax.lax.max(i - 1, 0)]
        return (idxs[b][i] != prev) | (i == 0)

    def _guarded(i, b, go):
        p = _pred(i, b)
        if p is None:
            go()
        else:
            @pl.when(p)
            def _():
                go()

    def start(i):
        for b in range(n_buf):
            if skip_dups:
                _guarded(i, b, dma(i, b).start)
            else:
                dma(i, b).start()

    def wait(i):
        for b in range(n_buf):
            if skip_dups:
                _guarded(i, b, dma(i, b).wait)
            else:
                dma(i, b).wait()

    if n <= _W:
        for i in range(n):
            start(i)
        for i in range(n):
            wait(i)
        return

    for i in range(_W):  # fill (static unroll)
        start(i)

    def body(k, _):
        base = _W + k * _U
        for u in range(_U):
            wait(base + u - _W)
            start(base + u)
        return 0

    jax.lax.fori_loop(0, (n - _W) // _U, body, 0)

    def drain(j, _):
        wait(n - _W + j)
        return 0

    jax.lax.fori_loop(0, _W, drain, 0)


#: Read-DMA pipeline depth. Reads are NOT posted like writes: each row DMA
#: carries the full HBM round-trip latency, so the in-flight byte count
#: (depth × slice bytes) must cover the bandwidth-latency product
#: (~400 KB at 819 GB/s) — far deeper than the write kernel's _W=32. The
#: depth is achieved with the SAME 32 physical semaphores: slot
#: ``(i // group) % _W`` is shared by ``group`` consecutive DMAs (DMA
#: semaphores count completions, so k copies on one slot need k waits,
#: order-free) — a (256,) semaphore array would explode Mosaic compile.
_W_READ = 256


def _gather_kernel(
    idx_ref, table_ref, out_ref, sems, *, h=1, skip_dups=False, w=_W_READ
):
    n = idx_ref.shape[0]
    three_d = len(table_ref.shape) == 3
    group = max(1, w // _W)

    def dma(i):
        src = (
            table_ref.at[0, pl.ds(idx_ref[i], h)]
            if three_d
            else table_ref.at[pl.ds(idx_ref[i], h)]
        )
        return pltpu.make_async_copy(
            src, out_ref.at[pl.ds(h * i, h)], sems.at[(i // group) % _W]
        )

    def _pred(i):
        # Sorted-run predicate, mirror of _scatter_kernel._pred: a duplicate
        # slot's output rows are left UNWRITTEN (arbitrary memory) — the
        # consumer must not read them (the sorted-dedup optimizer contract:
        # duplicate slots' updates are never applied).
        if isinstance(i, int):
            return None if i == 0 else idx_ref[i] != idx_ref[i - 1]
        prev = idx_ref[jax.lax.max(i - 1, 0)]
        return (idx_ref[i] != prev) | (i == 0)

    def start(i):
        if not skip_dups:
            dma(i).start()
            return
        p = _pred(i)
        if p is None:
            dma(i).start()
        else:
            @pl.when(p)
            def _():
                dma(i).start()

    def wait(i):
        if not skip_dups:
            dma(i).wait()
            return
        p = _pred(i)
        if p is None:
            dma(i).wait()
        else:
            @pl.when(p)
            def _():
                dma(i).wait()

    if n <= w:
        for i in range(n):
            start(i)
        for i in range(n):
            wait(i)
        return

    def fill(i, _):
        start(i)
        return 0

    jax.lax.fori_loop(0, w, fill, 0)

    def body(k, _):
        base = w + k * _U
        for u in range(_U):
            wait(base + u - w)
            start(base + u)
        return 0

    jax.lax.fori_loop(0, (n - w) // _U, body, 0)

    def drain(j, _):
        wait(n - w + j)
        return 0

    jax.lax.fori_loop(0, w, drain, 0)


@functools.partial(
    jax.jit, static_argnames=("interpret", "slice_rows", "skip_dups", "window")
)
def gather_rows(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    interpret: bool = False,
    slice_rows: int = 1,
    skip_dups: bool = False,
    window: int = _W_READ,
) -> jnp.ndarray:
    """Row gather ``out[h·i : h·i+h] = table[idx[i] : idx[i]+h]`` as a
    pipelined stream of HBM→HBM row DMAs — the read twin of
    :func:`scatter_rows`.

    XLA lowers a row ``lax.gather`` from a large table to a serial
    scalar-core loop (~16 ns/row) PLUS layout glue; at the sparse-update
    shapes (17K rows of 512 B) the DMA stream is ~5x faster, and with
    ``skip_dups`` duplicate slots cost nothing at all.

    :param table: (n_rows, D) table or its (1, n_rows, D) per-device block.
    :param idx: (R,) int32 row indices (base row of each ``h``-slice).
    :param slice_rows: rows per index — ``h=2`` with even indices reads the
        pair-major interleaved [param | momentum] block in ONE DMA.
    :param skip_dups: ``idx`` is SORTED; only the first slot of each
        equal-index run is fetched. Duplicate slots of the (h·R, D) output
        are left with arbitrary contents — callers must consume only
        first-of-run slots (the sorted-dedup optimizer contract).
    :return: (h·R, D) rows, in the table dtype.
    """
    h = slice_rows
    r = idx.shape[0]
    pad_n = r + ((-r) % _U)
    # Window must be a multiple of _U and strictly less than the padded
    # length for the fill/steady/drain pipeline; short inputs take the
    # fully-unrolled start-all/wait-all path instead (w = n). A
    # caller-supplied window is rounded DOWN to the _U grid — a ragged
    # window would leave slots started-but-never-waited (hang/corrupt).
    window = max(_U, window - window % _U)
    w = pad_n if pad_n <= 64 else min(window, pad_n - _U)
    pad = (-r) % _U
    if pad:
        # Padding repeats the last index; under skip_dups the repeats are
        # skipped outright. The pad rows are sliced off below.
        idx = jnp.concatenate([idx, jnp.broadcast_to(idx[-1:], (pad,))])
    out = pl.pallas_call(
        functools.partial(_gather_kernel, h=h, skip_dups=skip_dups, w=w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_W,))],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (h * (r + pad), table.shape[-1]), table.dtype
        ),
        interpret=interpret,
    )(idx.astype(jnp.int32), table)
    return out[: h * r] if pad else out


@functools.partial(
    jax.jit, static_argnames=("interpret", "skip_dups"), donate_argnums=(0,)
)
def scatter_rows_multi(
    tables, idxs, rows, interpret: bool = False, skip_dups: bool = False
):
    """In-place row writes into SEVERAL tables in ONE issue loop.

    The sparse row optimizers write the param rows AND 1-2 fp32 moment-row
    buffers with index lists of equal length each step. The scatter loop is
    scalar-core ISSUE-bound (see :data:`_W`), so sharing one loop across
    the buffers amortizes its per-iteration overhead — measured faster
    than consecutive :func:`scatter_rows` calls — and saves k−1 kernel
    launches.

    :param tables: tuple of (n_rows_b, D) or (1, n_rows_b, D) tables, ALL
        DONATED (outputs alias them). D must match across buffers.
    :param idxs: tuple of (R_b,) int32 row indices, one list per table
        (packed tables use merged packed indices, moments logical ones).
    :param rows: tuple of (R_b, D) replacement rows (cast to table dtype).
    :param skip_dups: EVERY ``idxs[b]`` is sorted and only the first slot
        of each equal-index run is written (see :func:`scatter_rows`);
        later slots' rows may be arbitrary. Buffers dedup independently.
    :return: tuple of updated tables.
    """
    k = len(tables)
    rows = tuple(r.astype(t.dtype) for r, t in zip(rows, tables))
    n = max(i.shape[0] for i in idxs)
    n += (-n) % _U
    p_idx, p_rows = [], []
    for i, r in zip(idxs, rows):
        pad = n - i.shape[0]
        if pad:
            # Idempotent padding: repeat the last (index, row) pair.
            i = jnp.concatenate([i, jnp.broadcast_to(i[-1:], (pad,))])
            r = jnp.concatenate(
                [r, jnp.broadcast_to(r[-1:], (pad, r.shape[-1]))]
            )
        p_idx.append(i.astype(jnp.int32))
        p_rows.append(r)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    return pl.pallas_call(
        functools.partial(
            _scatter_kernel_multi, n_buf=k, skip_dups=skip_dups
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=k,
            grid=(1,),
            in_specs=[hbm] * (2 * k),
            out_specs=tuple([hbm] * k),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_W, k))],
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct(t.shape, t.dtype) for t in tables
        ),
        input_output_aliases={2 * k + b: b for b in range(k)},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*p_idx, *p_rows, *tables)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "slice_rows", "skip_dups"),
    donate_argnums=(0,),
)
def scatter_rows(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    rows: jnp.ndarray,
    interpret: bool = False,
    slice_rows: int = 1,
    skip_dups: bool = False,
) -> jnp.ndarray:
    """Return ``table`` with ``table[idx[i]] = rows[i]`` — in place on TPU.

    :param table: (n_rows, D) table, or its (1, n_rows, D) per-device block
        (pass the block UNSQUEEZED: a reshape would re-introduce the bitcast
        that defeats XLA's alias analysis); DONATED (the output aliases it).
    :param idx: (R,) int32 row indices; duplicates allowed if their rows are
        identical.
    :param rows: (R, D) replacement rows (cast to the table dtype).
    :param slice_rows: rows written per index in ONE DMA — ``h > 1`` writes
        the ``(h, D)`` block ``table[idx[i] : idx[i]+h] = rows[h·i : h·i+h]``
        (the pair-major interleaved-momentum layout uses ``h=2`` with even
        physical indices; ``rows`` is then ``(h·R, D)`` stacked slices).
    :param skip_dups: ``idx`` is SORTED and only the FIRST slot of each
        equal-index run is written; later slots of a run are skipped
        entirely (no DMA issued), so their ``rows`` content may be
        arbitrary. This is the sorted-dedup sparse-update contract
        (:func:`besskge_tpu.optim._dedup_row_grads`): at ~50% duplicate
        slots it halves the scatter's scalar-core issue work.
    """
    h = slice_rows
    rows = rows.astype(table.dtype)
    pad = (-idx.shape[0]) % _U
    if pad:
        # Padding repeats the last (index, slice) pair: idempotent, and
        # under skip_dups automatically skipped as duplicates.
        idx = jnp.concatenate([idx, jnp.broadcast_to(idx[-1:], (pad,))])
        rows = jnp.concatenate(
            [rows]
            + [rows[-h:]] * pad
        )
    return pl.pallas_call(
        functools.partial(_scatter_kernel, h=h, skip_dups=skip_dups),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # rows
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # table
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_W,))],
        ),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx.astype(jnp.int32), rows, table)
