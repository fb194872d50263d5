"""Where do the packed-16-bit wikikg2 steps' extra microseconds go?

Round-3 VERDICT #7: fp16/bf16 packed tables train at ~1.4M/s vs ~2.4M/s
for fp32 sparse — the reference's fp16 is its FAST config, ours is the
slow one. This probe wall-clocks the fp32 and packed configs back to
back, then diffs their per-op trace tables (XLA fusion durations
reconcile with wall-clock; Pallas DMA-kernel rows are profiler-inflated
on this chip — see BASELINE.md round-4 corrections — so treat those rows
as relative, not absolute).

    python benchmarks/prof_packed.py [fp16|bf16]
"""

import glob
import gzip
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def profile_config(name: str, fp16: bool, bf16: bool, n_calls: int = 10):
    import jax

    import bench
    from besskge_tpu.monitor import top_ops, trace

    s = bench._setup_wikikg2(bf16_table=bf16, fp16_table=fp16)
    dev, dstep = s["dev"], s["dstep"]
    dstate = dev.state()
    params, opt_state = s["params"], s["opt_state"]
    params, opt_state, out = dstep(params, opt_state, dstate, dev.next_key(0))
    print(f"[{name}] warm loss {float(out['loss']):.1f}", flush=True)

    t0 = time.perf_counter()
    for i in range(n_calls):
        params, opt_state, out = dstep(
            params, opt_state, dstate, dev.next_key(1 + i)
        )
    _ = float(out["loss"])
    wall = (time.perf_counter() - t0) / n_calls / 8 * 1e6
    rate = s["pos_per_step"] * 8 / (wall * 8) * 1e6
    print(f"[{name}] wall {wall:.1f} us/step = {rate/1e6:.2f}M pos/s", flush=True)

    rows = []
    with tempfile.TemporaryDirectory() as td:
        with trace(td):
            p, o = params, opt_state
            for i in range(5):
                p, o, out = dstep(p, o, dstate, dev.next_key(100 + i))
            _ = float(out["loss"])
        path = sorted(glob.glob(f"{td}/**/*.trace.json.gz", recursive=True))[-1]
        events = json.load(gzip.open(path))["traceEvents"]
    for r in top_ops(events, 25):
        rows.append((r["total_us"] / 5 / 8, r["count"] // 5, r["name"]))
    return wall, rows


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fp16"
    w32, r32 = profile_config("fp32", fp16=False, bf16=False)
    wp, rp = profile_config(
        which, fp16=which == "fp16", bf16=which == "bf16"
    )
    print(f"\npacked-vs-fp32 gap: {wp - w32:.1f} us/step\n", flush=True)
    print(f"--- fp32 top ops (us/step x count) ---")
    for us, n, name in r32[:18]:
        print(f"{us:9.1f} x{n:<3d} {name[:100]}")
    print(f"--- {which} packed top ops ---")
    for us, n, name in rp[:18]:
        print(f"{us:9.1f} x{n:<3d} {name[:100]}")


if __name__ == "__main__":
    main()
