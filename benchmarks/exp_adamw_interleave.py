"""A/B the treble-interleaved sparse AdamW update at wikikg2 shapes.

Isolated update-path benchmark (gather + Adam math + scatter on the real
chip): the separate-buffer RowAdamW issues 3 row DMAs per touched row
(params + mu + nu, one shared issue loop via scatter_rows_multi); the
treble-major [param | mu | nu] store (optim.interleave_adamw) issues ONE
(3, D) block DMA. Shapes mirror the wikikg2 driver bench's touched-row
set (8704 occurrences into a 2.5M-row d=128 table).

  python benchmarks/exp_adamw_interleave.py          # fp32 treble
  python benchmarks/exp_adamw_interleave.py packed   # packed fp16 quint
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from besskge_tpu.optim import RowAdamW, interleave_adamw
    from besskge_tpu import packed as pk

    packed = len(sys.argv) > 1 and sys.argv[1] == "packed"
    n, d, r = 2_500_608, 128, 8704
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    if packed:
        tab = pk.pack_table(tab.astype(jnp.float16))

    def bench(interleaved):
        opt = RowAdamW(
            learning_rate=1e-3, weight_decay=0.01, interleaved=interleaved
        )
        # fresh buffer per run: the donated table is consumed by step()
        if packed:
            table = (
                pk.interleave_packed_adamw(tab) if interleaved
                else (tab + 0)
            )
        else:
            table = interleave_adamw(tab) if interleaved else (tab + 0.0)
        state = opt.init(table, n_logical=n)

        K = 16  # updates per dispatch: amortizes the ~2 ms remote tunnel

        # donate the table (and moment buffers) so the in-place Pallas
        # scatter aliases instead of copying the multi-GB table per call;
        # scan carries the alias so all K updates stay in place
        @partial(jax.jit, donate_argnums=(0, 1))
        def steps(table, state, idx_batch, g):
            def body(carry, idx):
                t, s = carry
                t, s = opt.update_rows(t, s, idx, g)
                return (t, s), 0
            (table, state), _ = jax.lax.scan(
                body, (table, state), idx_batch
            )
            return table, state

        def idx_batch():
            # fresh index sets so no call benefits from reuse
            return jnp.asarray(
                rng.integers(n, size=(K, r)).astype(np.int32)
            )

        g = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32) * 1e-3)
        table, state = steps(table, state, idx_batch(), g)
        float(jnp.sum(table[:8]))
        t0 = time.perf_counter()
        m = 5
        for _ in range(m):
            table, state = steps(table, state, idx_batch(), g)
        float(jnp.sum(table[:8]))
        dt = (time.perf_counter() - t0) / (m * K)
        label = (("quint" if packed else "treble") if interleaved else "separate")
        print(f"{label}: {1e6 * dt:.0f} us/update")
        return dt

    sep = bench(False)
    treb = bench(True)
    print(f"speedup: {sep / treb:.2f}x")


if __name__ == "__main__":
    main()
