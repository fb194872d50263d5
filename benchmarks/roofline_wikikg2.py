"""Roofline + per-op profile of the wikikg2 training step (VERDICT #2).

The round-2 bench reported the wikikg2 sparse-SGDM step at 27% "HBM
bandwidth" and 0.39% MFU with the device 99% busy. That 27% comes from XLA
cost analysis "bytes accessed", which counts every byte each op TOUCHES —
including fused producer/consumer traffic that never leaves VMEM — so it is
an upper bound on HBM traffic, not a measurement. This script does the
honest version:

1. An ANALYTIC byte/flop account of one optimizer step (what must cross
   HBM: gathers, grad rows, dedup sort, moments, scatter) → the
   bandwidth-bound and VPU-bound time floors.
2. A real-chip per-op profile (``besskge_tpu.monitor.top_ops``) naming
   where the wall time actually goes.

Run on the TPU:  python benchmarks/roofline_wikikg2.py [config]
(config = wikikg2 | wikikg2_bf16 | wikikg2_fp16; default wikikg2)

Reference scale for the comparison: the notebook 3 recipe trains
19.0M triples/epoch in 4.47 s on 4 IPUs ≈ 1.08M pos triples/s/chip
(/root/reference/notebooks/3_wikikg2_fp16.ipynb cell 24).
"""

import glob
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_HBM_BPS = 819e9  # v5e
PEAK_VPU_OPS = 3.7e12  # v5e VPU ~4 x (8,128) SIMD @ 940 MHz, elem-ops/s


def analytic_account(cfg_name: str) -> dict:
    """Bytes/flops per optimizer step of the wikikg2 recipe config:
    shard_bs=512 x bps=8 vmapped micro-batches, d=128, 32 flat "ht"
    negatives + augment + sharing, SSCE, sparse RowSGDM."""
    bps, bs, d, n_neg = 8, 512, 128, 32
    packed = cfg_name != "wikikg2"
    row_b = 2 * d if packed else 4 * d  # table row bytes (16-bit packed)
    g_mb = bs + bs + 2 * n_neg  # gather_plan rows per micro-batch
    R = bps * g_mb  # touched rows per optimizer step
    pos = bps * bs

    # per ht half: bs/2 queries x (bs/2 augment + n_neg) candidates
    cand = bs // 2 + n_neg
    pairs = bps * 2 * (bs // 2) * cand  # scored (query, candidate) pairs

    read = {
        "entity gather (fwd)": R * row_b,
        "relation gather (fwd)": pos * 4 * d,
        "bwd re-read of gathered rows (remat)": R * 2 * d,  # bf16 saves
        "dedup sort+cumsum passes": R * 8 * 13 + 2 * R * 4 * d,
        "RowSGDM: param rows": R * 4 * d if not packed else R * 2 * d,
        "RowSGDM: momentum rows": R * 4 * d,
        "relation dense SGDM (read p+m)": 2 * 535 * 4 * d,
    }
    write = {
        "bwd grad rows": R * 4 * d,
        "dedup totals": R * 4 * d,
        "RowSGDM: momentum rows": R * 4 * d,
        "row scatter (params)": R * row_b,
        "relation dense SGDM (write p+m)": 2 * 535 * 4 * d,
        "scores + loss intermediates": 2 * pos * (cand + 1) * 4,
    }
    total = sum(read.values()) + sum(write.values())

    # VPU elem-ops: L1 chain |h + r - t| = sub/sub/abs + reduce-add over d,
    # ~4 ops per (pair, lane) fwd; bwd recomputes signs and reduces two
    # grad directions, ~2x fwd.
    vpu_fwd = pairs * d * 4
    vpu = vpu_fwd * 3
    return {
        "touched_rows_per_step": R,
        "pos_triples_per_step": pos,
        "scored_pairs_per_step": pairs,
        "hbm_bytes_per_step": total,
        "read_breakdown": read,
        "write_breakdown": write,
        "vpu_ops_per_step": vpu,
        "t_hbm_floor_us": 1e6 * total / PEAK_HBM_BPS,
        "t_vpu_floor_us": 1e6 * vpu / PEAK_VPU_OPS,
    }


def main() -> None:
    cfg_name = sys.argv[1] if len(sys.argv) > 1 else "wikikg2"
    acct = analytic_account(cfg_name)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from besskge_tpu.monitor import parse_trace_events, top_ops, trace

    setup = {
        "wikikg2": bench._setup_wikikg2,
        "wikikg2_bf16": lambda: bench._setup_wikikg2(bf16_table=True),
        "wikikg2_fp16": lambda: bench._setup_wikikg2(fp16_table=True),
    }[cfg_name]()
    spc = bench.CONFIGS[cfg_name]["steps_per_call"]
    dstep, dev = setup["dstep"], setup["dev"]
    params, opt_state = setup["params"], setup["opt_state"]
    pos_per_call = setup["pos_per_step"] * spc

    state = dev.state()
    # Warm up (compile) + steady state.
    for i in range(3):
        params, opt_state, out = dstep(params, opt_state, state, dev.next_key(i))
    float(out["loss"])

    n_timed = 30
    t0 = time.perf_counter()
    for i in range(n_timed):
        params, opt_state, out = dstep(
            params, opt_state, state, dev.next_key(10 + i))
    float(out["loss"])
    dt = time.perf_counter() - t0
    step_us = 1e6 * dt / (n_timed * spc)
    rate = pos_per_call * n_timed / dt

    log_dir = "/tmp/roofline_trace"

    def run():
        nonlocal params, opt_state
        for i in range(8):
            params, opt_state, out = dstep(
                params, opt_state, state, dev.next_key(100 + i))
        float(out["loss"])

    with trace(log_dir):
        run()
    paths = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    events = json.load(gzip.open(paths[-1]))["traceEvents"] if paths else []
    cats = parse_trace_events(events)
    ops = top_ops(events, 30)
    traced_steps = 8 * spc

    print(f"# wikikg2 roofline ({cfg_name}) — one optimizer step = "
          f"{acct['pos_triples_per_step']} positives, "
          f"{acct['touched_rows_per_step']} touched rows, "
          f"{acct['scored_pairs_per_step']/1e6:.1f}M scored pairs")
    print(f"measured: {step_us:.0f} us/step = {rate/1e6:.2f}M pos triples/s")
    print(f"analytic HBM bytes/step: "
          f"{acct['hbm_bytes_per_step']/1e6:.1f} MB "
          f"-> floor {acct['t_hbm_floor_us']:.0f} us "
          f"({100*acct['t_hbm_floor_us']/step_us:.0f}% of measured)")
    print(f"analytic VPU ops/step: {acct['vpu_ops_per_step']/1e9:.2f}G "
          f"-> floor {acct['t_vpu_floor_us']:.0f} us "
          f"({100*acct['t_vpu_floor_us']/step_us:.0f}% of measured)")
    eff_bw = acct["hbm_bytes_per_step"] / (step_us / 1e6)
    print(f"effective HBM bandwidth: {eff_bw/1e9:.0f} GB/s "
          f"({100*eff_bw/PEAK_HBM_BPS:.1f}% of peak) -> the step is "
          f"{'BANDWIDTH' if acct['t_hbm_floor_us'] > 0.6*step_us else 'LATENCY/COMPUTE'}-bound")
    print(f"category shares: {cats}")
    print(f"\n# top ops over {traced_steps} traced steps "
          f"(us/step = total/{traced_steps})")
    for r in ops:
        print(f"{r['total_us']/traced_steps:9.1f} us/step  x{r['count']:4d} "
              f" {r['name'][:110]}")


if __name__ == "__main__":
    main()
