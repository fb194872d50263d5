"""Micro-benchmark: Pallas row-scatter pipeline depth (VERDICT #2 follow-up).

The wikikg2 roofline shows the two row-scatter kernels at 209 us each for
8704 rows (24 ns/row issued) while XLA's row GATHER moves the same rows in
36 us (4 ns/row) — the scatter loop, not the DMA engine, is the limiter.
This sweeps the issue-loop shape: DMAs in flight (_W) x issues per
iteration (_U), plus an XLA `.at[].set` control.

Run on the TPU:  python benchmarks/exp_scatter.py
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, R = 2_500_604, 128, 8704


def make_scatter(w: int, u: int):
    def _kernel(idx_ref, rows_ref, table_ref, out_ref, sems):
        del table_ref
        n = idx_ref.shape[0]

        def dma(i):
            return pltpu.make_async_copy(
                rows_ref.at[pl.ds(i, 1)],
                out_ref.at[pl.ds(idx_ref[i], 1)],
                sems.at[i % w],
            )

        def body(k, _):
            base = k * u
            for j in range(u):
                @pl.when(base + j >= w)
                def _():
                    dma(base + j - w).wait()

                dma(base + j).start()
            return 0

        jax.lax.fori_loop(0, n // u, body, 0)

        def drain(j, _):
            i = jnp.maximum(n - w, 0) + j

            @pl.when(i < n)
            def _():
                dma(i).wait()

            return 0

        jax.lax.fori_loop(0, min(w, n), drain, 0)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scatter(table, idx, rows):
        return pl.pallas_call(
            _kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((w,))],
            ),
            out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, rows, table)

    return scatter


def bench(fn, table, idx, rows, reps=30):
    table = fn(table, idx, rows)  # compile + warm
    jax.block_until_ready(table)
    t0 = time.perf_counter()
    for _ in range(reps):
        table = fn(table, idx, rows)
    jax.block_until_ready(table)
    # remote TPU: block_until_ready may not block; force a value fetch
    float(jnp.sum(table[:8, :1]))
    return (time.perf_counter() - t0) / reps * 1e6, table


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    rng = np.random.default_rng(3)
    table = jnp.zeros((N, D), jnp.float32)
    idx = jnp.asarray(rng.choice(N, R, replace=False).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))

    import os
    variants = os.environ.get("SCATTER_VARIANTS", "16:4,32:8,64:8")
    for w, u in [tuple(map(int, v.split(":"))) for v in variants.split(",")]:
        print(f"compiling W={w} U={u} ...", flush=True)
        fn = make_scatter(w, u)
        us, table = bench(fn, table, idx, rows)
        print(f"W={w:4d} U={u:3d}: {us:7.1f} us  "
              f"({1e3 * us / R:.1f} ns/row, "
              f"{2 * R * D * 4 / us / 1e3:.0f} GB/s r+w)")

    # XLA gather control: same rows, read direction.
    @jax.jit
    def g(t, i):
        return jnp.take(t, i, axis=0)

    out = g(table, idx)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(50):
        out = g(table, idx)
    jax.block_until_ready(out)
    float(out[0, 0])
    us = (time.perf_counter() - t0) / 50 * 1e6
    print(f"XLA row gather: {us:7.1f} us  ({1e3 * us / R:.1f} ns/row)")


if __name__ == "__main__":
    main()
