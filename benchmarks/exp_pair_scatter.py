import time
import jax, jax.numpy as jnp, numpy as np
from besskge_tpu.ops.pallas_scatter import scatter_rows, scatter_rows_multi

N, D, R = 1_250_000, 128, 8704
key = jax.random.PRNGKey(0)

# correctness: pair write
tab = jax.random.normal(key, (2*N, D), jnp.float32)
idx = np.random.default_rng(0).choice(N, R, replace=False).astype(np.int32)
pair_rows = jax.random.normal(jax.random.PRNGKey(1), (2*R, D), jnp.float32)
ref = np.array(tab)
ref[(2*idx[:,None] + np.arange(2)).reshape(-1)] = np.asarray(pair_rows)
out = scatter_rows(tab, jnp.asarray(2*idx), pair_rows, slice_rows=2)
np.testing.assert_array_equal(np.asarray(out), ref)
print("pair scatter correctness OK")

# timing: chain 20 scatters in one jit; compare 2-buffer multi vs pair
def bench(fn, *args):
    f = jax.jit(fn)
    o = f(*args); _ = float(jnp.sum(o[0] if isinstance(o, tuple) else o[:1,:1]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = f(*args)
        _ = float(jnp.sum(o[0][:1,:1] if isinstance(o, tuple) else o[:1,:1]))
        ts.append(time.perf_counter() - t0)
    return min(ts) / 20

def multi20(t1, t2, i, r1, r2):
    for k in range(20):
        t1, t2 = scatter_rows_multi((t1, t2), (i, i), (r1 + k, r2 + k))
    return t1, t2

def pair20(t, i2, pr):
    for k in range(20):
        t = scatter_rows(t, i2, pr + k, slice_rows=2)
    return t

t1 = jax.random.normal(key, (N, D), jnp.float32)
t2 = jnp.zeros((N, D), jnp.float32)
r1 = jax.random.normal(jax.random.PRNGKey(2), (R, D), jnp.float32)
r2 = jax.random.normal(jax.random.PRNGKey(3), (R, D), jnp.float32)
ms_multi = bench(multi20, t1, t2, jnp.asarray(idx), r1, r2) * 1e3
tp = jax.random.normal(key, (2*N, D), jnp.float32)
ms_pair = bench(pair20, tp, jnp.asarray(2*idx), pair_rows) * 1e3
print(f"fused 2-buffer multi: {ms_multi:.3f} ms/step   pair (2,128) DMA: {ms_pair:.3f} ms/step   speedup {ms_multi/ms_pair:.2f}x")
