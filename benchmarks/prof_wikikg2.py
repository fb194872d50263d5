import gzip, glob, json, sys, tempfile
import numpy as np
import bench
from besskge_tpu.monitor import trace, top_ops

s = bench._setup_wikikg2()
dev, dstep = s["dev"], s["dstep"]
dstate = dev.state()
params, opt_state = s["params"], s["opt_state"]
params, opt_state, out = dstep(params, opt_state, dstate, dev.next_key(0))
print("warm loss", float(out["loss"]))

with tempfile.TemporaryDirectory() as td:
    with trace(td):
        p, o = params, opt_state
        for i in range(5):
            p, o, out = dstep(p, o, dstate, dev.next_key(100 + i))
        _ = float(out["loss"])
    path = sorted(glob.glob(f"{td}/**/*.trace.json.gz", recursive=True))[-1]
    events = json.load(gzip.open(path))["traceEvents"]
for r in top_ops(events, 30):
    print(f'{r["total_us"]/5:9.1f} us/step  x{r["count"]//5:<4d} {r["name"][:110]}')
