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

__all__ = ["scatter_rows"]

#: DMA pipeline depth (row copies in flight). Measured on v5e: the loop is
#: ISSUE-bound (~23 ns/DMA of scalar-core work), so depth beyond 32 buys
#: nothing (benchmarks/exp_scatter_depth.py: 16/4 -> 417.7 us, 32/8 ->
#: 402.5, 64/8 -> 404.0 per wikikg2 step).
_W = 32


#: DMAs issued per loop iteration (amortizes scalar-core loop overhead).
_U = 8


def _scatter_kernel(idx_ref, rows_ref, table_ref, out_ref, sems):
    del table_ref  # aliased with out_ref; input exists only for the alias.
    n = idx_ref.shape[0]  # guaranteed a multiple of _U by the caller
    three_d = len(out_ref.shape) == 3

    def dma(i):
        dst = (
            out_ref.at[0, pl.ds(idx_ref[i], 1)]
            if three_d
            else out_ref.at[pl.ds(idx_ref[i], 1)]
        )
        return pltpu.make_async_copy(
            rows_ref.at[pl.ds(i, 1)], dst, sems.at[i % _W]
        )

    def body(k, _):
        base = k * _U
        for u in range(_U):
            # Free each semaphore slot before reuse.
            @pl.when(base + u >= _W)
            def _():
                dma(base + u - _W).wait()

            dma(base + u).start()
        return 0

    jax.lax.fori_loop(0, n // _U, body, 0)

    def drain(j, _):
        i = jnp.maximum(n - _W, 0) + j

        @pl.when(i < n)
        def _():
            dma(i).wait()

        return 0

    jax.lax.fori_loop(0, min(_W, n), drain, 0)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def scatter_rows(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    rows: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Return ``table`` with ``table[idx[i]] = rows[i]`` — in place on TPU.

    :param table: (n_rows, D) table, or its (1, n_rows, D) per-device block
        (pass the block UNSQUEEZED: a reshape would re-introduce the bitcast
        that defeats XLA's alias analysis); DONATED (the output aliases it).
    :param idx: (R,) int32 row indices; duplicates allowed if their rows are
        identical.
    :param rows: (R, D) replacement rows (cast to the table dtype).
    """
    rows = rows.astype(table.dtype)
    pad = (-idx.shape[0]) % _U
    if pad:
        # Idempotent padding: repeat the last (index, row) pair.
        idx = jnp.concatenate([idx, jnp.broadcast_to(idx[-1:], (pad,))])
        rows = jnp.concatenate(
            [rows, jnp.broadcast_to(rows[-1:], (pad, rows.shape[-1]))]
        )
    return pl.pallas_call(
        _scatter_kernel,
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
