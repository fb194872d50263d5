"""Small device-side helpers shared across models and the BESS core.

Capability parity with reference ``besskge/utils.py:10-112``
(graphcore-research/bess-kge), re-expressed for XLA: the reference's
IPU-friendly flattened ``index_select`` gather becomes a plain
``jnp.take_along_axis`` (XLA lowers it to an efficient dynamic-gather), and
the fp16 sin/cos IPU fast path is unnecessary on TPU (bf16 transcendentals
are native VPU ops).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from numpy.typing import NDArray

__all__ = [
    "gather_indices",
    "get_entity_filter",
    "complex_multiplication",
    "complex_rotation",
]


def gather_indices(x: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """Gather columns of a 2-D array with a (broadcastable) 2-D index.

    ``out[i, j] = x[i, index[i, j]]``; if ``index`` has a single row it is
    shared by all rows of ``x`` (and vice versa). Equivalent to the
    reference's IPU workaround ``besskge/utils.py:10-33``; on TPU
    ``take_along_axis`` compiles to a single gather HLO.
    """
    bc = jnp.broadcast_shapes(x.shape[:1], index.shape[:1])
    x_b = jnp.broadcast_to(x, bc + x.shape[1:])
    idx_b = jnp.broadcast_to(index, bc + index.shape[1:])
    return jnp.take_along_axis(x_b, idx_b, axis=1)


def get_entity_filter(
    triples: NDArray[np.int32],
    filter_triples: NDArray[np.int32],
    filter_mode: str,
) -> NDArray[np.int64]:
    """Sparse filter pairs for filtered evaluation (host-side, numpy).

    For each triple in ``triples``, find the entities that complete the same
    query — same (h, r) when ``filter_mode == "t"``, same (r, t) when
    ``filter_mode == "h"`` — in ``filter_triples``.

    :param triples: (n, 3) triples to evaluate.
    :param filter_triples: (m, 3) known true triples.
    :param filter_mode: "h" to filter known heads, "t" for known tails.
    :return: (k, 2) array of ``(triple_index, entity_to_filter)`` pairs.

    Mirrors reference ``besskge/utils.py:36-69``.
    """
    if filter_mode == "t":
        q_cols, ent_col = (0, 1), 2
    elif filter_mode == "h":
        q_cols, ent_col = (2, 1), 0
    else:
        raise ValueError(f"filter_mode must be 'h' or 't', got {filter_mode}")

    base = np.int64(max(triples.max(), filter_triples.max())) + 1
    q_key = triples[:, q_cols[0]].astype(np.int64) * base + triples[:, q_cols[1]]
    f_key = (
        filter_triples[:, q_cols[0]].astype(np.int64) * base
        + filter_triples[:, q_cols[1]]
    )

    # Sort filter keys once; for each query key locate its matching span.
    order = np.argsort(f_key, kind="stable")
    f_sorted = f_key[order]
    lo = np.searchsorted(f_sorted, q_key, side="left")
    hi = np.searchsorted(f_sorted, q_key, side="right")
    lengths = hi - lo
    triple_idx = np.repeat(np.arange(triples.shape[0]), lengths)
    if triple_idx.size == 0:
        return np.empty((0, 2), dtype=np.int64)
    # Positions within each span, flattened.
    span_pos = np.arange(lengths.sum()) - np.repeat(
        np.cumsum(lengths) - lengths, lengths
    )
    filter_rows = order[np.repeat(lo, lengths) + span_pos]
    entities = filter_triples[filter_rows, ent_col]
    return np.stack([triple_idx, entities.astype(np.int64)], axis=1)


def complex_multiplication(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Complex-multiply two batches of interleaved-real complex vectors.

    Both inputs store complex numbers as ``[re_0..re_{d/2}, im_0..im_{d/2}]``
    along the last axis (reference ``besskge/utils.py:72-89``).
    """
    re1, im1 = jnp.split(v1, 2, axis=-1)
    re2, im2 = jnp.split(v2, 2, axis=-1)
    return jnp.concatenate(
        [re1 * re2 - im1 * im2, re1 * im2 + im1 * re2], axis=-1
    )


def complex_rotation(v: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Rotate complex vectors ``v`` by phases ``r`` (radians).

    ``v`` is ``[re, im]``-concatenated with last dim ``2k``; ``r`` has last
    dim ``k``. Unlike the reference's IPU fp16 trick
    (``besskge/utils.py:91-112``), TPU computes sin/cos natively at the
    working precision.
    """
    rotor = jnp.concatenate([jnp.cos(r), jnp.sin(r)], axis=-1)
    return complex_multiplication(v, rotor)


def interleaved_to_blocked(x: jnp.ndarray) -> jnp.ndarray:
    """(re, im, re, im, ...) -> (re..., im...) along the last axis."""
    re = x[..., 0::2]
    im = x[..., 1::2]
    return jnp.concatenate([re, im], axis=-1)


def as_complex_pair(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a blocked complex vector into (real, imaginary) halves."""
    return tuple(jnp.split(x, 2, axis=-1))  # type: ignore[return-value]
