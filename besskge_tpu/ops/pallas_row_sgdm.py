"""Fused sparse SGDM update on a pair-major interleaved table.

One Pallas kernel performs the WHOLE interleaved-momentum row update of
:class:`besskge_tpu.optim.RowSGDM` — gather, optimizer math, scatter —
instead of three XLA-visible stages:

    pairs = gather(table, phys)            # (2R, D) HBM round-trip
    new   = momentum-math(pairs, grads)    # several elementwise fusions
    table = scatter(table, phys, new)      # reads (2R, D) again

The fused form streams each touched [param | momentum] (2, D) block
HBM→VMEM, applies ``m ← μ·m + g (+ wd·p);  p ← p − lr·m`` on the VPU, and
streams the block back — the (2R, D) intermediate never exists in HBM, and
the interleave copy XLA emits between math and scatter disappears.

Layout contract (see :func:`besskge_tpu.optim.interleave_momentum`): the
table is pair-major ``(2N, D)`` fp32 — param row ``i`` at physical row
``2i``, its momentum at ``2i+1`` — so one (2, D) slice at an even offset
covers both and is contiguous within the (8, 128) HBM tile.

Duplicate handling is the sorted-dedup contract of
:func:`besskge_tpu.optim._dedup_row_grads`: ``phys`` is sorted and every
occurrence of a row carries the identical summed gradient; only the first
slot of each equal-index run is fetched/updated/written (``pl.when`` on a
sorted-run predicate recomputed identically at every site).

No reference equivalent — poptorch applies a dense optimizer over the
whole SRAM-resident table (notebook 3 cell 14); this is the TPU-native
sparse form of the same update rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_pair_sgdm"]

#: Pairs per grid block: bounds the VMEM staging buffer (K, 2, D) and
#: amortizes the block's gather-wait over K row DMAs.
_K = 512

#: DMA semaphore slots shared round-robin inside a block (counting
#: semantics — k copies on one slot take k waits, order-free).
_S = 32


def _kernel(
    idx_ref,      # (R,) scalar-prefetch: even physical base rows, sorted
    g_ref,        # (K, D) VMEM block of summed gradients (auto-pipelined)
    lr_ref,       # (1, 1) SMEM learning rate (traced schedules supported)
    table_ref,    # (2N, D) or (1, 2N, D) HBM, aliased with out
    out_ref,
    pairs,        # (K, 2, D) VMEM scratch
    sems,         # (S,) DMA semaphores
    *,
    momentum: float,
    weight_decay: float,
    k_block: int,
    skip_dups: bool,
):
    del table_ref  # input exists only for the alias
    b = pl.program_id(0)
    three_d = len(out_ref.shape) == 3

    def row(k):
        return idx_ref[b * k_block + k]

    def hbm_slice(k):
        return (
            out_ref.at[0, pl.ds(row(k), 2)]
            if three_d
            else out_ref.at[pl.ds(row(k), 2)]
        )

    def in_dma(k):
        return pltpu.make_async_copy(
            hbm_slice(k), pairs.at[k], sems.at[k % _S]
        )

    def out_dma(k):
        return pltpu.make_async_copy(
            pairs.at[k], hbm_slice(k), sems.at[k % _S]
        )

    def _pred(k):
        # First slot of each sorted run; global slot 0 is never a skip.
        i = b * k_block + k
        prev = idx_ref[jax.lax.max(i - 1, 0)]
        return (idx_ref[i] != prev) | (i == 0)

    def guarded(k, mk):
        if not skip_dups:
            mk(k)
            return

        @pl.when(_pred(k))
        def _():
            mk(k)

    # Phase 1: fetch the block's unique pairs.
    def fetch(k, _):
        guarded(k, lambda k: in_dma(k).start())
        return 0

    jax.lax.fori_loop(0, k_block, fetch, 0)

    def wait_in(k, _):
        guarded(k, lambda k: in_dma(k).wait())
        return 0

    jax.lax.fori_loop(0, k_block, wait_in, 0)

    # Phase 2: vectorized momentum update over the whole block. Duplicate
    # slots compute garbage (their pair was never fetched) — never written.
    p = pairs[:, 0, :]
    m = pairs[:, 1, :]
    g = g_ref[:].astype(jnp.float32)
    if weight_decay:
        g = g + weight_decay * p
    m_new = momentum * m + g
    p_new = p - lr_ref[0, 0] * m_new
    pairs[:, 0, :] = p_new
    pairs[:, 1, :] = m_new

    # Phase 3: write the unique pairs back.
    def store(k, _):
        guarded(k, lambda k: out_dma(k).start())
        return 0

    jax.lax.fori_loop(0, k_block, store, 0)

    def wait_out(k, _):
        guarded(k, lambda k: out_dma(k).wait())
        return 0

    jax.lax.fori_loop(0, k_block, wait_out, 0)


@functools.partial(
    jax.jit,
    static_argnames=("momentum", "weight_decay", "skip_dups", "interpret"),
    donate_argnums=(0,),
)
def fused_pair_sgdm(
    table: jnp.ndarray,
    phys: jnp.ndarray,
    grads: jnp.ndarray,
    lr,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    skip_dups: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """In-place fused SGDM over the touched pairs of an interleaved table.

    :param table: pair-major (2N, D) fp32 table or its (1, 2N, D) block;
        DONATED (the output aliases it). D must be a multiple of 128.
    :param phys: (R,) int32 SORTED even physical base rows (2x the logical
        row ids), duplicates allowed under the dedup contract.
    :param grads: (R, D) summed per-row gradients (duplicate-identical).
    :param lr: learning rate — python float or traced scalar (schedules).
    :param skip_dups: skip duplicate sorted slots entirely (default; pass
        False only if ``phys`` is not sorted — every slot is then fetched
        and written, and duplicates must carry identical content).
    :return: the updated table.
    """
    r = phys.shape[0]
    k_block = min(_K, max(8, r))
    pad = (-r) % k_block
    if pad:
        # Repeat the last (index, grad) pair: under skip_dups the repeats
        # are skipped; without, the rewrite is idempotent.
        phys = jnp.concatenate([phys, jnp.broadcast_to(phys[-1:], (pad,))])
        grads = jnp.concatenate(
            [grads, jnp.broadcast_to(grads[-1:], (pad, grads.shape[-1]))]
        )
    d = grads.shape[-1]
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(
            _kernel,
            momentum=momentum,
            weight_decay=weight_decay,
            k_block=k_block,
            skip_dups=skip_dups,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=((r + pad) // k_block,),
            in_specs=[
                pl.BlockSpec((k_block, d), lambda b, idx: (b, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            scratch_shapes=[
                pltpu.VMEM((k_block, 2, d), jnp.float32),
                pltpu.SemaphoreType.DMA((_S,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(phys.astype(jnp.int32), grads.astype(jnp.float32), lr_arr, table)
