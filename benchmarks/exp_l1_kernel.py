"""Experiment: transposed-accumulation L1 distance kernel vs the current one.

The shipped `_l1_kernel` reduces over d in the LANE dimension (tile
(TB, TN, D), minor = d), paying a cross-lane shuffle tree per output row.
This prototype lays the tile out as (TB, D, TN) — entities in lanes,
d in sublanes — so the reduction is a sublane-dim elementwise add chain.

Run on the TPU:  python benchmarks/exp_l1_kernel.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from besskge_tpu.ops.pallas_distance import l1_distance_matrix


def _round_up(x, m):
    return -(-x // m) * m


def _l1_kernel_T(a_ref, bt_ref, o_ref, *, db):
    # a_ref: (TB, D), bt_ref: (D, TN), o_ref: (TB, TN).
    D = a_ref.shape[1]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for k in range(D // db):  # static unroll — chunk count is compile-time
        # (TB, db, 1) vs (1, db, TN): broadcast-sub/abs, reduce sublanes.
        a_blk = a_ref[:, k * db:(k + 1) * db]
        b_blk = bt_ref[k * db:(k + 1) * db, :]
        diff = jnp.abs(a_blk[:, :, None] - b_blk[None, :, :])
        acc = acc + jnp.sum(diff, axis=1, dtype=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tb", "tn", "db"))
def l1_T(a, b, tb=8, tn=512, db=32):
    B, d = a.shape
    N = b.shape[0]
    TB = min(tb, _round_up(B, 8))
    TN = min(tn, _round_up(N, 128))
    Bp, Np = _round_up(B, TB), _round_up(N, TN)
    a_p = jnp.pad(a, ((0, Bp - B), (0, 0)))
    bt = jnp.pad(b, ((0, Np - N), (0, 0))).T  # (d, Np)
    out = pl.pallas_call(
        functools.partial(_l1_kernel_T, db=db),
        out_shape=jax.ShapeDtypeStruct((Bp, Np), a.dtype),
        grid=(Bp // TB, Np // TN),
        in_specs=[
            pl.BlockSpec((TB, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, TN), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((TB, TN), lambda i, j: (i, j)),
    )(a_p, bt)
    return out[:B, :N]


def timeit(fn, *args, iters=20):
    # NOTE: the first few dispatches in a process run 5-10x slow through the
    # remote-backend tunnel (and the jnp.sum fetch kernel compiles on first
    # use) — warm everything before taking the clock, or the first variant
    # measured eats the penalty and the comparison is garbage.
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(3):
        float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    shapes = [
        (512, 4000, 128),   # topk window shape (wikikg2 vs-all)
        (2048, 4096, 256),
    ]
    for B, N, d in shapes:
        a = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
        ref = np.asarray(l1_distance_matrix(a, b))
        floor_s = 3 * B * N * d / 2.4e12  # rough VPU fp32 elementwise rate

        t_cur = timeit(lambda a, b: l1_distance_matrix(a, b), a, b)
        print(f"B={B} N={N} d={d}: current {t_cur*1e3:.3f} ms "
              f"(floor~{floor_s*1e3:.3f} ms)")
        for tb in (8, 32, 128):
            for tn in (512, 1024):
                for db in (8, 32, d):
                    if db > d or d % db:
                        continue
                    try:
                        got = np.asarray(l1_T(a, b, tb=tb, tn=tn, db=db))
                        if not np.allclose(got, ref, rtol=1e-5, atol=1e-4):
                            print(f"  T tb={tb} tn={tn} db={db}: WRONG")
                            continue
                        t = timeit(lambda a, b: l1_T(a, b, tb=tb, tn=tn, db=db), a, b)
                        mark = " <<<" if t < t_cur else ""
                        print(f"  T tb={tb} tn={tn} db={db}: {t*1e3:.3f} ms{mark}")
                    except Exception as e:
                        print(f"  T tb={tb} tn={tn} db={db}: FAIL {str(e)[:80]}")


if __name__ == "__main__":
    main()
