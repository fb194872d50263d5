"""Pallas TPU kernel for the L1 distance matrix.

The p=2 case decomposes onto the MXU (``ops/distance.py``), but p=1 has no
matmul form: XLA's broadcast evaluation materializes the (B, N, d)
difference tensor in HBM when B·N·d is large. This kernel tiles (B, N) over
a grid, streams the operand tiles HBM→VMEM through the Pallas pipeline, and
reduces |a_i − b_j| over d entirely in VMEM — the TPU-native equivalent of
the reference's fused C++ ``pea.distance_matrix`` custom op
(used at ``besskge/scoring.py:195``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["l1_distance_matrix"]


def _l1_kernel(a_ref, b_ref, o_ref):
    # a_ref: (TB, D), b_ref: (TN, D), o_ref: (TB, TN).
    # Subtract/abs in the input dtype (bf16 runs at 2x VPU width);
    # accumulate the reduction in fp32.
    a = a_ref[:]
    b = b_ref[:]
    # (TB, TN, D) lives in VMEM/registers only for this tile.
    diff = jnp.abs(a[:, None, :] - b[None, :, :])
    o_ref[:] = jnp.sum(diff, axis=-1, dtype=jnp.float32).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


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
    TB = min(128, _round_up(B, 8))
    TN = min(256, _round_up(N, 128))
    Bp, Np = _round_up(B, TB), _round_up(N, TN)
    a_p = jnp.pad(a, ((0, Bp - B), (0, 0)))
    b_p = jnp.pad(b, ((0, Np - N), (0, 0)))
    out = pl.pallas_call(
        _l1_kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, Np), a.dtype),
        grid=(Bp // TB, Np // TN),
        in_specs=[
            pl.BlockSpec((TB, d), lambda i, j: (i, 0)),
            pl.BlockSpec((TN, d), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TB, TN), lambda i, j: (i, j)),
        interpret=interpret,
    )(a_p, b_p)
    return out[:B, :N]
