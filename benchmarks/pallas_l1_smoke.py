"""Real-TPU smoke + perf for the pallas L1 kernel vs XLA broadcast."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from besskge_tpu.ops.pallas_distance import l1_distance_matrix
from besskge_tpu.ops.distance import _l1_broadcast

rng = np.random.default_rng(0)
B, N, D = 1024, 4096, 100
a = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
b = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
pal = jax.jit(l1_distance_matrix)
xla = jax.jit(_l1_broadcast)
r1 = pal(a, b); r2 = xla(a, b)
np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-4, atol=1e-3)
print("correctness OK")
for name, fn in (("pallas", pal), ("xla", xla)):
    fn(a, b)
    t = time.perf_counter()
    for _ in range(50): out = fn(a, b)
    v = float(out[0,0]); dt = time.perf_counter() - t
    print(name, round(dt/50*1e3, 3), "ms", round(B*N*D*3*50/dt/1e12, 2), "TOP/s")
