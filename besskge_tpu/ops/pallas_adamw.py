"""Fused in-place dense AdamW over an embedding table (Pallas TPU).

XLA's optax-composed AdamW on a dense table runs at ~35% of HBM bandwidth
(separate update/apply passes, extra buffers). This kernel streams
(grad, param, mu, nu) tiles once, updating param/mu/nu IN PLACE via aliased
outputs — the minimum-traffic formulation (8 table-passes of HBM, ~0.5ms
for a 48MB table on v5e). Used by
:class:`besskge_tpu.optim.FusedDenseAdamW` for small/medium tables where
sparse row updates don't pay off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dense_adamw_update"]

_TM = 512  # rows per tile


def _make_kernel(lr, b1, b2, eps, wd):
    def kernel(corr_ref, g_ref, p_ref, mu_ref, nu_ref,
               po_ref, muo_ref, nuo_ref):
        # corr_ref = [1/(1-b1^t), 1/(1-b2^t)], precomputed outside (Mosaic
        # has no scalar pow).
        g = g_ref[:].astype(jnp.float32)
        p = p_ref[:].astype(jnp.float32)
        mu = b1 * mu_ref[:] + (1.0 - b1) * g
        nu = b2 * nu_ref[:] + (1.0 - b2) * (g * g)
        mu_hat = mu * corr_ref[0]
        nu_hat = nu * corr_ref[1]
        upd = lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * p)
        po_ref[:] = (p - upd).astype(po_ref.dtype)
        muo_ref[:] = mu
        nuo_ref[:] = nu

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("lr", "b1", "b2", "eps", "wd", "interpret"),
    donate_argnums=(0, 1, 2),
)
def dense_adamw_update(
    param: jnp.ndarray,
    mu: jnp.ndarray,
    nu: jnp.ndarray,
    grad: jnp.ndarray,
    count: jnp.ndarray,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    wd: float = 0.0,
    interpret: bool = False,
):
    """One AdamW step over a 2-D (M, D) table; param/mu/nu are DONATED and
    updated in place. ``count`` is the post-increment step number (int32
    scalar array). Returns (new_param, new_mu, new_nu)."""
    t = count.astype(jnp.float32)
    corr = jnp.stack(
        [1.0 / (1.0 - b1**t), 1.0 / (1.0 - b2**t)]
    ).astype(jnp.float32)
    m, d = param.shape
    grid = (pl.cdiv(m, _TM),)  # pallas masks the ragged final block
    tile = lambda i, *_: (i, 0)  # noqa: E731
    specs = [
        pl.BlockSpec((_TM, d), tile),  # grad
        pl.BlockSpec((_TM, d), tile),  # param
        pl.BlockSpec((_TM, d), tile),  # mu
        pl.BlockSpec((_TM, d), tile),  # nu
    ]
    out_specs = [
        pl.BlockSpec((_TM, d), tile),
        pl.BlockSpec((_TM, d), tile),
        pl.BlockSpec((_TM, d), tile),
    ]
    return pl.pallas_call(
        _make_kernel(lr, b1, b2, eps, wd),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=specs,
            out_specs=out_specs,
        ),
        out_shape=[
            jax.ShapeDtypeStruct(param.shape, param.dtype),
            jax.ShapeDtypeStruct(mu.shape, jnp.float32),
            jax.ShapeDtypeStruct(nu.shape, jnp.float32),
        ],
        # Positional args: (corr, grad, param, mu, nu) -> outputs 0..2.
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(corr, grad, param, mu, nu)
