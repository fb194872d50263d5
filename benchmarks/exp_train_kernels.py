"""Sweep the training-step L1 kernel routing/tiles (VERDICT #2 follow-up).

Round 2 measured the batched Mosaic kernels LOSING to XLA's broadcast
fusion at training shapes with small tiles (grid 8x4 fwd, 8x2x3 bwd). The
HLO shows XLA pays the same 288->384 lane padding internally, so the
deficit was per-program overhead — this retries with LARGE tiles (one
program per micro-batch).

One variant per process (jit caches bake the module constants):
  python benchmarks/exp_train_kernels.py xla            # control
  python benchmarks/exp_train_kernels.py fwd:256:384 bwd:256:384
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from besskge_tpu.ops import distance, pallas_distance

    label = "xla"
    for arg in sys.argv[1:]:
        if arg == "xla":
            continue
        kind, tb, tn = arg.split(":")
        label = "pallas"
        distance._PALLAS_MIN_ELEMS_BATCHED = 0
        if kind == "fwd":
            pallas_distance._BATCH_TB = int(tb)
            pallas_distance._BATCH_TN = int(tn)
            pallas_distance._BATCH_TEMP_BYTES = 8 << 20
        elif kind == "bwd":
            pallas_distance._GRAD_TB = int(tb)
            pallas_distance._GRAD_TN = int(tn)

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
    print(f"{label} {sys.argv[1:]}: "
          f"{1e6 * dt / (n * spc):.0f} us/step = "
          f"{setup['pos_per_step'] * spc * n / dt / 1e6:.2f}M pos triples/s",
          flush=True)


if __name__ == "__main__":
    main()
