"""Scatter pipeline depth, measured the trustworthy way (VERDICT #2).

Host-side timing through the remote-TPU tunnel carries ~5-20 ms of
per-dispatch overhead, so kernel variants are compared by DEVICE trace
time inside the production wikikg2 train step: monkeypatch
``pallas_scatter._W/_U``, trace 2 dispatches, report the summed
``scatter_rows`` op time per optimizer step.

Run on the TPU:  python benchmarks/exp_scatter_depth.py 16:4 64:8 ...
"""

import glob
import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(w: int, u: int) -> dict:
    import jax

    import bench
    from besskge_tpu.monitor import top_ops, trace
    from besskge_tpu.ops import pallas_scatter

    pallas_scatter._W = w
    pallas_scatter._U = u

    setup = bench._setup_wikikg2()
    dstep, dev = setup["dstep"], setup["dev"]
    params, opt_state = setup["params"], setup["opt_state"]
    state = dev.state()
    for i in range(2):
        params, opt_state, out = dstep(
            params, opt_state, state, dev.next_key(i)
        )
    float(out["loss"])

    log_dir = f"/tmp/scatter_depth_{w}_{u}"
    with trace(log_dir):
        for i in range(2):
            params, opt_state, out = dstep(
                params, opt_state, state, dev.next_key(10 + i)
            )
        float(out["loss"])
    paths = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    events = json.load(gzip.open(paths[-1]))["traceEvents"]
    steps = 2 * 8  # dispatches x steps_per_call
    rows = [r for r in top_ops(events, 60) if "scatter_rows" in r["name"]]
    scat = sum(r["total_us"] for r in rows) / steps
    total = sum(r["total_us"] for r in top_ops(events, 10**6)
                if not r["name"].startswith("while")) / steps
    return {"w": w, "u": u, "scatter_us_per_step": round(scat, 1),
            "step_leaf_us": round(total, 1)}


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    variants = [tuple(map(int, v.split(":"))) for v in sys.argv[1:]] or [
        (16, 4), (64, 8)
    ]
    for w, u in variants:
        print(f"W={w} U={u} ...", flush=True)
        print(measure(w, u), flush=True)


if __name__ == "__main__":
    main()
