"""A/B the wikikg2 train step's scoring compute dtype (bf16 vs fp32).

The L1 score forward/backward broadcast fusions dominate the sparse step
(~750 of ~1460 device-busy µs, BASELINE.md round-5 decomposition) at
~31% VPU efficiency. The v5e VPU executes bf16 at fp32 rate, so the bf16
compute_dtype buys no FLOPs — but the bf16 intermediates carry (2, 1)
sublane-packed tiling, which may tax the lane-axis d-reduction. One
variant per process (jit caches bake the dtype in):

  python benchmarks/exp_compute_dtype.py bf16   # control (bench default)
  python benchmarks/exp_compute_dtype.py fp32
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    os.environ["BENCH_COMPUTE_DTYPE"] = variant

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench

    setup = bench._setup_wikikg2()
    dstep, dev = setup["dstep"], setup["dev"]
    params, opt_state = setup["params"], setup["opt_state"]
    state = dev.state()
    for i in range(3):
        params, opt_state, out = dstep(
            params, opt_state, state, dev.next_key(i)
        )
    float(out["loss"])
    n = 30
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, out = dstep(
            params, opt_state, state, dev.next_key(10 + i)
        )
    float(out["loss"])
    dt = time.perf_counter() - t0
    spc = bench.CONFIGS["wikikg2"]["steps_per_call"]
    pos = setup["pos_per_step"]
    print(
        f"{variant}: {1e6 * dt / (n * spc):.0f} us/step, "
        f"{pos * n * spc / dt / 1e6:.2f}M pos/s"
    )


if __name__ == "__main__":
    main()
