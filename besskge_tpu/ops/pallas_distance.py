"""Pallas TPU kernels for the L1 distance matrix (forward AND backward).

The p=2 case decomposes onto the MXU (``ops/distance.py``), but p=1 has no
matmul form: XLA's broadcast evaluation materializes the (B, N, d)
difference tensor in HBM when B·N·d is large. These kernels tile (B, N)
over a grid, stream the operand tiles HBM→VMEM through the Pallas pipeline,
and reduce over d entirely in VMEM — the TPU-native equivalent of the
reference's fused C++ ``pea.distance_matrix`` custom op
(used at ``besskge/scoring.py:195``).

The backward matters as much as the forward in the training hot loop:
``d|a_i − b_j|/da = sign(a_i − b_j)`` has no matmul form either, and XLA's
evaluation of ``sum_j g_ij · sign(a_i − b_j)`` materializes the (B, N, d)
sign tensor in HBM (the reduction over the non-minor axis defeats fusion) —
at the wikikg2 bench shapes that is ~1 GB of HBM traffic per step per
direction. :func:`l1_distance_grads` computes both operand gradients with
the (TB, TN, d) tile living only in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = [
    "l1_distance_matrix",
    "l1_distance_grads",
    "l1_distance_matrix_batched",
    "l1_distance_grads_batched",
    "l1_scores_chunkmax",
]


def _l1_kernel(a_ref, bt_ref, o_ref, *, db: int):
    # a_ref: (TB, D), bt_ref: (D, TN) — candidates TRANSPOSED so entities sit
    # in the lane dimension and d in sublanes.  The d-reduction is then a
    # sublane-axis elementwise add chain instead of a cross-lane shuffle
    # tree; measured 1.2-1.6x the (TN, D)-layout kernel at topk-window
    # shapes (dispatch-amortized, biggest at small d), ~2.6x off the VPU
    # 3-op elementwise floor at (512, 4000, 128).
    # Chunks over d are statically unrolled (dynamic sublane slices don't
    # lower on this Mosaic version).
    d = a_ref.shape[1]
    tb, tn = o_ref.shape
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for start in range(0, d, db):
        width = min(db, d - start)
        # fp32 for the rank-3 broadcast: Mosaic cannot insert a non-no-op
        # minor dim on 16-bit types (free for fp32 inputs; for bf16 the
        # reduction accumulates fp32 anyway, so only sub/abs lose the
        # packed width).
        a_blk = a_ref[:, start:start + width].astype(jnp.float32)
        b_blk = bt_ref[start:start + width, :].astype(jnp.float32)
        a3 = jax.lax.broadcast_in_dim(a_blk, (tb, width, tn), (0, 1))
        b3 = jax.lax.broadcast_in_dim(b_blk, (tb, width, tn), (1, 2))
        acc = acc + jnp.sum(jnp.abs(a3 - b3), axis=1)
    o_ref[:] = acc.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


#: Batched-kernel tile shape (module-level so experiments can sweep them in
#: a fresh process; benchmarks/exp_train_kernels.py). Defaults measured on
#: v5e at the wikikg2 training shapes (8, 256, 288->384, 128).
_BATCH_TB = 64
_BATCH_TN = 1024
_BATCH_TEMP_BYTES = 4 << 20
_GRAD_TB = 128
_GRAD_TN = 128


def _d_chunk(d: int) -> int:
    """Reduction chunk: full-d wins up to 256; beyond that bound the
    (TB, db, TN) broadcast temp with the largest power-of-two divisor."""
    if d <= 256:
        return d
    for c in (256, 128, 64, 32, 16, 8):
        if d % c == 0:
            return c
    return d


@functools.partial(jax.jit, static_argnames=("interpret",))
def l1_distance_matrix(
    a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """All-pairs L1 distance ``out[i, j] = ||a[i] − b[j]||_1`` on TPU.

    :param a: (B, d) queries.
    :param b: (N, d) candidates.
    :param interpret: run in the Pallas interpreter (for CPU tests).
    """
    B, d = a.shape
    N = b.shape[0]
    # TB=8 measured best IN-LOOP (the fori_loop window pipeline overlaps the
    # many small programs; larger row tiles won standalone microbenches but
    # regressed end-to-end topk 215 -> 328 ms/batch at wikikg2 scale).
    TB = min(8, _round_up(B, 8))
    TN = min(1024, _round_up(N, 128))
    Bp, Np = _round_up(B, TB), _round_up(N, TN)
    a_p = jnp.pad(a, ((0, Bp - B), (0, 0)))
    bt_p = jnp.pad(b, ((0, Np - N), (0, 0))).T  # (d, Np)
    out = pl.pallas_call(
        functools.partial(_l1_kernel, db=_d_chunk(d)),
        out_shape=jax.ShapeDtypeStruct((Bp, Np), a.dtype),
        grid=(Bp // TB, Np // TN),
        in_specs=[
            pl.BlockSpec((TB, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, TN), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((TB, TN), lambda i, j: (i, j)),
        interpret=interpret,
    )(a_p, bt_p)
    return out[:B, :N]


def _l1_scores_chunkmax_kernel(
    a_ref, bt_ref, valid_ref, o_ref, cmax_ref, *, db: int, chunk: int,
    bad: float,
):
    """Fused: masked negated L1 distances AND their per-``chunk`` column
    maxima in one pass over the tile (the window never round-trips HBM
    between scoring and the top-k chunk merge)."""
    d = a_ref.shape[1]
    tb, tn = o_ref.shape
    acc = jnp.zeros((tb, tn), jnp.float32)
    for start in range(0, d, db):
        width = min(db, d - start)
        a_blk = a_ref[:, start:start + width].astype(jnp.float32)
        b_blk = bt_ref[start:start + width, :].astype(jnp.float32)
        a3 = jax.lax.broadcast_in_dim(a_blk, (tb, width, tn), (0, 1))
        b3 = jax.lax.broadcast_in_dim(b_blk, (tb, width, tn), (1, 2))
        acc = acc + jnp.sum(jnp.abs(a3 - b3), axis=1)
    # score = −dist, invalid columns pushed to the sentinel.
    score = (1.0 - valid_ref[0, :]) * bad - acc
    o_ref[:] = score
    # cmax is emitted TRANSPOSED (n_chunk, B): its per-program block is then
    # (TN/chunk, TB), satisfying the Mosaic (8, 128) block-tiling rule
    # (a (TB, TN/chunk) block has an 8-wide minor dim).
    cmax_ref[:] = jnp.max(
        score.reshape(tb, tn // chunk, chunk), axis=-1
    ).T


@functools.partial(
    jax.jit, static_argnames=("chunk", "bad", "interpret")
)
def l1_scores_chunkmax(
    a: jnp.ndarray,
    b: jnp.ndarray,
    valid: jnp.ndarray,
    chunk: int = 128,
    bad: float = -50000.0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Masked L1 scores ``s[i, j] = −‖a[i] − b[j]‖₁ + bad·(1−valid[j])`` and
    their per-``chunk`` column maxima, fused in one VMEM pass.

    This is the TopK window hot loop (`bess.TopKQueryBessKGE` with
    ``merge_mode="chunk"``): fusing the mask, negation and chunk-max into
    the distance kernel removes three full (B, N) HBM passes per window
    and the separate reduction dispatch.

    :param a: (B, d) transformed queries (e.g. h + r for TransE tails).
    :param b: (N, d) candidate rows, N a multiple of ``chunk``.
    :param valid: (N,) 0/1 column validity.
    :return: ``(scores (B, N) fp32, chunk_max (B, N // chunk) fp32)``.
    """
    B, d = a.shape
    N = b.shape[0]
    if N % chunk:
        raise ValueError(f"N={N} not a multiple of chunk={chunk}")
    TN = min(1024, _round_up(N, chunk))
    if TN % chunk:
        raise ValueError(f"TN={TN} not a multiple of chunk={chunk}")
    # The transposed cmax block is (TN/chunk, TB): Mosaic needs its minor
    # dim (TB) 128-divisible, or the block to span the full padded array.
    Bp8 = _round_up(B, 8)
    TB = 128 if Bp8 >= 128 else Bp8
    # Full-d reduction per tile measured best end-to-end (the (TB, db, TN)
    # broadcast temp is fused by Mosaic, not materialized): at wikikg2
    # vs-all topk, db 16 -> 221 ms/batch, 64 -> 165, 128 (=d) -> 159.
    db = _d_chunk(d)
    Bp, Np = _round_up(B, TB), _round_up(N, TN)
    a_p = jnp.pad(a, ((0, Bp - B), (0, 0)))
    bt_p = jnp.pad(b, ((0, Np - N), (0, 0))).T  # (d, Np)
    valid2 = jnp.pad(
        valid.astype(jnp.float32), (0, Np - N)
    )[None, :]  # (1, Np); pad columns masked to the sentinel
    out, cmax = pl.pallas_call(
        functools.partial(
            _l1_scores_chunkmax_kernel, db=db, chunk=chunk, bad=bad
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
            jax.ShapeDtypeStruct((Np // chunk, Bp), jnp.float32),
        ),
        grid=(Bp // TB, Np // TN),
        in_specs=[
            pl.BlockSpec((TB, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, TN), lambda i, j: (0, j)),
            pl.BlockSpec((1, TN), lambda i, j: (0, j)),
        ],
        out_specs=(
            pl.BlockSpec((TB, TN), lambda i, j: (i, j)),
            pl.BlockSpec((TN // chunk, TB), lambda i, j: (j, i)),
        ),
        interpret=interpret,
    )(a_p, bt_p, valid2)
    return out[:B, :N], cmax[: N // chunk, :B].T


def _l1_kernel_b(a_ref, bt_ref, o_ref, *, db: int):
    """Batched twin of :func:`_l1_kernel`: refs carry a leading unit block
    dim mapped to the batch grid axis. Written explicitly because
    ``jax.vmap`` of the 2-D kernel rewrites its jaxpr with batched operands
    and Mosaic cannot lower the resulting rank-3 reshapes."""
    d = a_ref.shape[-1]
    tb, tn = o_ref.shape[-2:]
    acc = jnp.zeros((tb, tn), jnp.float32)
    for start in range(0, d, db):
        width = min(db, d - start)
        # fp32 rank-3 broadcast: see _l1_kernel (16-bit minor-dim limit).
        a_blk = a_ref[0, :, start:start + width].astype(jnp.float32)
        b_blk = bt_ref[0, start:start + width, :].astype(jnp.float32)
        a3 = jax.lax.broadcast_in_dim(a_blk, (tb, width, tn), (0, 1))
        b3 = jax.lax.broadcast_in_dim(b_blk, (tb, width, tn), (1, 2))
        acc = acc + jnp.sum(jnp.abs(a3 - b3), axis=1)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def l1_distance_matrix_batched(
    a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Per-group all-pairs L1 distance ``out[g, i, j] = ||a[g,i] − b[g,j]||_1``.

    The batch dim is a grid axis (one kernel launch for all groups) — this
    is the training-step form, where micro-batches are vmapped and each has
    its own candidate pool.

    :param a: (G, B, d) queries.
    :param b: (G, N, d) candidates.
    """
    G, B, d = a.shape
    N = b.shape[1]
    # Bigger row tiles than the unbatched kernel: the batch grid already
    # multiplies the program count, and per-program launch overhead (~µs)
    # dominates at small tiles. Bound the (TB, db, TN) fp32 temp.
    TB = min(_BATCH_TB, _round_up(B, 8))
    TN = min(_BATCH_TN, _round_up(N, 128))
    Bp, Np = _round_up(B, TB), _round_up(N, TN)
    db = d
    while db > 8 and TB * db * TN * 4 > _BATCH_TEMP_BYTES:
        db = (db + 1) // 2
    a_p = jnp.pad(a, ((0, 0), (0, Bp - B), (0, 0)))
    bt_p = jnp.pad(b, ((0, 0), (0, Np - N), (0, 0))).transpose(0, 2, 1)
    out = pl.pallas_call(
        functools.partial(_l1_kernel_b, db=db),
        out_shape=jax.ShapeDtypeStruct((G, Bp, Np), a.dtype),
        grid=(G, Bp // TB, Np // TN),
        in_specs=[
            pl.BlockSpec((1, TB, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, d, TN), lambda g, i, j: (g, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, TB, TN), lambda g, i, j: (g, i, j)),
        interpret=interpret,
    )(a_p, bt_p)
    return out[:, :B, :N]


def _l1_grad_kernel(a_ref, b_ref, g_ref, o_ref, *, reduce_axis):
    """Accumulate one tile of ``Σ g_ij · sign(a_i − b_j)`` over an axis.

    ``reduce_axis=1`` yields the (TB, d) da contribution, ``reduce_axis=0``
    the negated (TN, d) db contribution. The reduction runs over the grid's
    inner dimension, so the output block (indexed by the outer grid dim
    only) is revisited in consecutive steps — the Pallas
    output-accumulation pattern.
    """
    # fp32 at load: Mosaic cannot rank-lift 16-bit vectors at many tile
    # shapes, has no packed-bf16 compare, and an fp32 subtract gives the
    # same sign XLA's (internally widened) broadcast backward produces —
    # a bf16 subtract can round a tiny difference to 0 and flip the sign.
    a = a_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    # (TB, TN, d), VMEM-resident for this tile only.
    s = jnp.sign(a[:, None, :] - b[None, :, :])
    if reduce_axis == 0:
        s = -s  # d|a − b|/db = −sign(a − b)
    contrib = jnp.sum(
        g_ref[:][..., None].astype(jnp.float32) * s,
        axis=reduce_axis,
        dtype=jnp.float32,
    )

    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += contrib


@functools.partial(jax.jit, static_argnames=("interpret",))
def l1_distance_grads(
    a: jnp.ndarray, b: jnp.ndarray, g: jnp.ndarray, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Both VJPs of :func:`l1_distance_matrix` without an HBM (B, N, d) temp.

    Tie convention: at coordinates where ``a[i,k] == b[j,k]`` exactly, the
    subgradient is 0 (``sign(0) = 0``, matching ``jnp.sign``/torch autograd),
    whereas XLA's autodiff of ``abs`` is select-based and yields ``+g``
    there. Both are valid subgradients of ``|x|``; with bf16-valued inputs
    exact ties are common, so comparisons against XLA autodiff must exclude
    them.

    ``da[i] = Σ_j g[i, j] · sign(a[i] − b[j])`` and
    ``db[j] = −Σ_i g[i, j] · sign(a[i] − b[j])``, each as a tiled Pallas
    reduction with the inner grid dimension accumulating into the output
    block (two calls with transposed grids, so each output's revisits are
    consecutive).

    :param a: (B, d) queries.
    :param b: (N, d) candidates.
    :param g: (B, N) cotangent of the distance matrix.
    :return: ``(da, db)`` in fp32, shapes (B, d) and (N, d).
    """
    B, d = a.shape
    N = b.shape[0]
    TB = min(128, _round_up(B, 8))
    TN = min(128, _round_up(N, 128))
    Bp, Np = _round_up(B, TB), _round_up(N, TN)
    # Zero-padding is self-masking: padded rows/cols carry g = 0.
    a_p = jnp.pad(a, ((0, Bp - B), (0, 0)))
    b_p = jnp.pad(b, ((0, Np - N), (0, 0)))
    g_p = jnp.pad(g, ((0, Bp - B), (0, Np - N)))

    da = pl.pallas_call(
        functools.partial(_l1_grad_kernel, reduce_axis=1),
        out_shape=jax.ShapeDtypeStruct((Bp, d), jnp.float32),
        grid=(Bp // TB, Np // TN),
        in_specs=[
            pl.BlockSpec((TB, d), lambda i, j: (i, 0)),
            pl.BlockSpec((TN, d), lambda i, j: (j, 0)),
            pl.BlockSpec((TB, TN), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((TB, d), lambda i, j: (i, 0)),
        interpret=interpret,
    )(a_p, b_p, g_p)

    db = pl.pallas_call(
        functools.partial(_l1_grad_kernel, reduce_axis=0),
        out_shape=jax.ShapeDtypeStruct((Np, d), jnp.float32),
        grid=(Np // TN, Bp // TB),
        in_specs=[
            pl.BlockSpec((TB, d), lambda j, i: (i, 0)),
            pl.BlockSpec((TN, d), lambda j, i: (j, 0)),
            pl.BlockSpec((TB, TN), lambda j, i: (i, j)),
        ],
        out_specs=pl.BlockSpec((TN, d), lambda j, i: (j, 0)),
        interpret=interpret,
    )(a_p, b_p, g_p)

    return da[:B], db[:N]


def _l1_grad_kernel_b(a_ref, b_ref, g_ref, o_ref, *, reduce_axis):
    """Batched twin of :func:`_l1_grad_kernel` (leading unit block dim; the
    accumulation grid axis is now program_id(2))."""
    a = a_ref[0].astype(jnp.float32)  # fp32 at load: see _l1_grad_kernel
    b = b_ref[0].astype(jnp.float32)
    s = jnp.sign(a[:, None, :] - b[None, :, :])
    if reduce_axis == 0:
        s = -s
    contrib = jnp.sum(
        g_ref[0][..., None].astype(jnp.float32) * s,
        axis=reduce_axis,
        dtype=jnp.float32,
    )

    @pl.when(pl.program_id(2) == 0)
    def _init():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    o_ref[0] += contrib


@functools.partial(jax.jit, static_argnames=("interpret",))
def l1_distance_grads_batched(
    a: jnp.ndarray, b: jnp.ndarray, g: jnp.ndarray, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Both VJPs of :func:`l1_distance_matrix_batched`, per group.

    :param a: (G, B, d) queries.
    :param b: (G, N, d) candidates.
    :param g: (G, B, N) cotangent.
    :return: ``(da, db)`` in fp32, shapes (G, B, d) and (G, N, d).
    """
    G, B, d = a.shape
    N = b.shape[1]
    TB = min(_GRAD_TB, _round_up(B, 8))
    TN = min(_GRAD_TN, _round_up(N, 128))
    Bp, Np = _round_up(B, TB), _round_up(N, TN)
    a_p = jnp.pad(a, ((0, 0), (0, Bp - B), (0, 0)))
    b_p = jnp.pad(b, ((0, 0), (0, Np - N), (0, 0)))
    g_p = jnp.pad(g, ((0, 0), (0, Bp - B), (0, Np - N)))

    da = pl.pallas_call(
        functools.partial(_l1_grad_kernel_b, reduce_axis=1),
        out_shape=jax.ShapeDtypeStruct((G, Bp, d), jnp.float32),
        grid=(G, Bp // TB, Np // TN),
        in_specs=[
            pl.BlockSpec((1, TB, d), lambda gi, i, j: (gi, i, 0)),
            pl.BlockSpec((1, TN, d), lambda gi, i, j: (gi, j, 0)),
            pl.BlockSpec((1, TB, TN), lambda gi, i, j: (gi, i, j)),
        ],
        out_specs=pl.BlockSpec((1, TB, d), lambda gi, i, j: (gi, i, 0)),
        interpret=interpret,
    )(a_p, b_p, g_p)

    db = pl.pallas_call(
        functools.partial(_l1_grad_kernel_b, reduce_axis=0),
        out_shape=jax.ShapeDtypeStruct((G, Np, d), jnp.float32),
        grid=(G, Np // TN, Bp // TB),
        in_specs=[
            pl.BlockSpec((1, TB, d), lambda gi, j, i: (gi, i, 0)),
            pl.BlockSpec((1, TN, d), lambda gi, j, i: (gi, j, 0)),
            pl.BlockSpec((1, TB, TN), lambda gi, j, i: (gi, i, j)),
        ],
        out_specs=pl.BlockSpec((1, TN, d), lambda gi, j, i: (gi, j, 0)),
        interpret=interpret,
    )(a_p, b_p, g_p)

    return da[:, :B], db[:, :N]
