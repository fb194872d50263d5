"""Distance-matrix kernels (the ``pea.distance_matrix`` equivalent).

The reference relies on a native fused cdist custom op for
negative-sample-sharing distance scores (``besskge/scoring.py:195`` and the
C++ op in poptorch-experimental-addons). On TPU:

* p=2 is decomposed as ``sqrt(|a|² + |b|² − 2·a@bᵀ)`` so the dominant cost is
  a single MXU matmul — this IS the speed-of-light formulation on TPU;
* p=1 uses a tiled broadcast reduction (VPU-bound); tiled Mosaic kernels
  (:mod:`besskge_tpu.ops.pallas_distance`) replace it for large candidate
  pools and for vmapped training micro-batches.

AD/batching composition: ``jax.custom_batching.custom_vmap`` does not
support reverse-mode AD through it, so the p=1 dispatch is structured as a
``custom_vjp`` whose forward AND backward are each ``custom_vmap``
dispatchers. Under the trainer's ``vmap(micro_batch)(…vjp inside…)`` the
vmap batches the custom_vjp's fwd/bwd bodies, hitting the custom_vmap
rules (pure batching, no AD inside), which route to explicitly-batched
Mosaic kernels — ``jax.vmap`` of a ``pallas_call`` rank-lifts the kernel
jaxpr in ways Mosaic cannot lower.
"""

from __future__ import annotations

import jax
import jax.custom_batching
import jax.numpy as jnp

__all__ = ["p_distance_matrix", "l1_scores_chunkmax"]

#: Test hook: "auto" (Pallas on TPU, XLA elsewhere), "pallas_interpret"
#: (force the Mosaic kernel through the interpreter — CPU kernel tests), or
#: "xla" (force the reference formulation).
_FUSED_L1_MODE = "auto"

#: Softening for sqrt at zero distance (keeps gradients finite when a
#: candidate coincides with the query).
_EPS = 1e-12

#: Above this B·N·d, route an UNBATCHED p=1 call to the Mosaic kernels
#: instead of the XLA broadcast fusion (TopK/AllScores windows).
_PALLAS_MIN_ELEMS = 1 << 26
#: Batched (vmapped micro-batch) PER-GROUP threshold. Measured end-to-end:
#: at wikikg2 training shapes (8 × 256 × 288 × 128) the batched kernels
#: LOSE to XLA's broadcast fusion (2.13M → 1.38M triples/s) — per-program
#: launch overhead and 288→384 lane padding outweigh the reduction-layout
#: win, which only pays off at inference-window-sized pools.
_PALLAS_MIN_ELEMS_BATCHED = _PALLAS_MIN_ELEMS


def _l1_broadcast(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # NOTE: logical relayouts of this expression (reducing a (B, d, N)
    # middle dim, fp32 accumulation) are canonicalized away by XLA's layout
    # assignment — measured byte-identical fusions in the training step.
    # Beating it requires the explicit Mosaic kernels.
    return jnp.sum(jnp.abs(a[:, None, :] - b[None, :, :]), axis=-1)


def _l1_grads_formula(a, b, g):
    """Explicit sign-subgradient VJP of :func:`_l1_broadcast` (fp32).

    Same tie convention as the Mosaic kernels: ``sign(0) = 0`` where a
    query coordinate exactly equals a candidate's (XLA's autodiff of
    ``abs`` is select-based and yields ``+g`` there; both are valid).
    """
    s = jnp.sign(
        a.astype(jnp.float32)[:, None, :] - b.astype(jnp.float32)[None, :, :]
    )
    da = jnp.sum(g[:, :, None] * s, axis=1)
    db = -jnp.sum(g[:, :, None] * s, axis=0)
    return da, db


@jax.custom_batching.custom_vmap
def _l1_fwd_dispatch(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Size-gated p=1 forward: XLA's fused broadcast wins while the
    (B, N, d) intermediate is fusion-sized; the tiled Mosaic kernel takes
    over for large candidate pools."""
    if a.shape[0] * b.shape[0] * a.shape[-1] >= _PALLAS_MIN_ELEMS:
        from besskge_tpu.ops.pallas_distance import l1_distance_matrix

        return l1_distance_matrix(a, b)
    return _l1_broadcast(a, b)


@_l1_fwd_dispatch.def_vmap
def _l1_fwd_vmap_rule(axis_size, in_batched, a, b):
    a_b, b_b = in_batched
    if not a_b:
        a = jnp.broadcast_to(a[None], (axis_size, *a.shape))
    if not b_b:
        b = jnp.broadcast_to(b[None], (axis_size, *b.shape))
    # No backend re-check: _l1_tpu is only reached on TPU (tests force these
    # rules on CPU with interpret-mode kernels by zeroing the threshold).
    per_group = a.shape[1] * b.shape[1] * a.shape[-1]
    if per_group >= _PALLAS_MIN_ELEMS_BATCHED:
        from besskge_tpu.ops.pallas_distance import l1_distance_matrix_batched

        return l1_distance_matrix_batched(a, b), True
    return jax.vmap(_l1_broadcast)(a, b), True


@jax.custom_batching.custom_vmap
def _l1_bwd_dispatch(a, b, g):
    """Size-gated p=1 backward. The Mosaic kernel matters even more here:
    XLA's evaluation of the two sign-reductions materializes the (B, N, d)
    sign tensor in HBM (the axis-0 reduction defeats fusion) — ~1 GB/step
    at wikikg2 bench shapes; the kernel keeps each tile in VMEM."""
    if a.shape[0] * b.shape[0] * a.shape[-1] >= _PALLAS_MIN_ELEMS:
        from besskge_tpu.ops.pallas_distance import l1_distance_grads

        return l1_distance_grads(a, b, g)
    return _l1_grads_formula(a, b, g)


@_l1_bwd_dispatch.def_vmap
def _l1_bwd_vmap_rule(axis_size, in_batched, a, b, g):
    a_b, b_b, g_b = in_batched
    if not a_b:
        a = jnp.broadcast_to(a[None], (axis_size, *a.shape))
    if not b_b:
        b = jnp.broadcast_to(b[None], (axis_size, *b.shape))
    if not g_b:
        g = jnp.broadcast_to(g[None], (axis_size, *g.shape))
    per_group = a.shape[1] * b.shape[1] * a.shape[-1]
    if per_group >= _PALLAS_MIN_ELEMS_BATCHED:
        from besskge_tpu.ops.pallas_distance import l1_distance_grads_batched

        return l1_distance_grads_batched(a, b, g), (True, True)
    return jax.vmap(_l1_grads_formula)(a, b, g), (True, True)


@jax.custom_vjp
def _l1_tpu(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """TPU p=1 entry point: custom VJP over batching-aware dispatchers."""
    return _l1_fwd_dispatch(a, b)


def _l1_tpu_fwd(a, b):
    return _l1_fwd_dispatch(a, b), (a, b)


def _l1_tpu_bwd(res, g):
    a, b = res
    da, db = _l1_bwd_dispatch(a, b, g.astype(jnp.float32))
    return da.astype(a.dtype), db.astype(b.dtype)


_l1_tpu.defvjp(_l1_tpu_fwd, _l1_tpu_bwd)


def l1_scores_chunkmax(
    a: jnp.ndarray,
    b: jnp.ndarray,
    valid: jnp.ndarray,
    chunk: int = 128,
    bad: float = -50000.0,
) -> tuple:
    """Masked negated-L1 scores and their per-``chunk`` column maxima —
    the fused inference-window op for the TopK chunk merge
    (``bess.TopKQueryBessKGE``). One Pallas pass computes
    ``s = −cdist₁(a, b) + bad·(1−valid)`` AND ``max`` over each group of
    ``chunk`` columns, so the scores never round-trip HBM between scoring
    and the merge. Inference-only (no VJP). Falls back to the XLA
    formulation off-TPU.

    :param a: (B, d) transformed queries (e.g. h + r for TransE tails).
    :param b: (N, d) candidate rows, N a multiple of ``chunk``.
    :param valid: (N,) boolean/0-1 column validity.
    :return: ``(scores (B, N) fp32, chunk_max (B, N/chunk) fp32)``.
    """
    mode = _FUSED_L1_MODE
    if mode == "auto":
        mode = "pallas" if jax.default_backend() == "tpu" else "xla"
    if mode in ("pallas", "pallas_interpret"):
        from besskge_tpu.ops.pallas_distance import (
            l1_scores_chunkmax as _kernel,
        )

        return _kernel(
            a, b, valid, chunk=chunk, bad=bad,
            interpret=mode == "pallas_interpret",
        )
    scores = -_l1_broadcast(
        a.astype(jnp.float32), b.astype(jnp.float32)
    ) + bad * (1.0 - valid.astype(jnp.float32))[None, :]
    cmax = jnp.max(scores.reshape(a.shape[0], -1, chunk), axis=-1)
    return scores, cmax


def p_distance_matrix(a: jnp.ndarray, b: jnp.ndarray, p: int) -> jnp.ndarray:
    """All-pairs p-distance ``out[i, j] = ||a[i] - b[j]||_p``.

    :param a: (B, d) queries.
    :param b: (N, d) candidates.
    :param p: 1 or 2.
    :return: (B, N) distances, in the dtype of ``a``.
    """
    if p == 2:
        # MXU path: |a-b|² = |a|² + |b|² - 2ab.  Accumulate in fp32.
        ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        a2 = jnp.sum(a.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        b2 = jnp.sum(b.astype(jnp.float32) ** 2, axis=-1)[None, :]
        sq = jnp.maximum(a2 + b2 - 2.0 * ab, _EPS)
        return jnp.sqrt(sq).astype(a.dtype)
    if p == 1:
        if jax.default_backend() == "tpu":
            return _l1_tpu(a, b)
        return _l1_broadcast(a, b)
    raise ValueError(f"Unsupported distance order p={p}")
