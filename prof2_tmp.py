import time
import numpy as np, jax, jax.numpy as jnp
from lidarnerf_tpu.ops import hash_grid as hg

def sync(x):
    return float(jnp.sum(x))

B = 4096 * 832  # 3.4M points
spec = hg.make_hash_grid_spec(num_levels=16, base_resolution=16,
                              log2_hashmap_size=19, desired_resolution=32768)
print("table rows", spec.table_rows)
table = hg.hash_grid_init(jax.random.PRNGKey(0), spec)
x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3))

enc = jax.jit(lambda x, t: hg.hash_grid_encode(x, t, spec))
t0 = time.perf_counter(); out = enc(x, table); s = sync(out)
print(f"fwd compile+run {time.perf_counter()-t0:.2f}s")
t0 = time.perf_counter()
for _ in range(3):
    out = enc(x, table)
s = sync(out)
print(f"fwd steady {(time.perf_counter()-t0)/3*1e3:.1f} ms")

grad = jax.jit(jax.grad(lambda t, x: jnp.sum(hg.hash_grid_encode(x, t, spec) ** 2), argnums=0))
t0 = time.perf_counter(); g = grad(table, x); s = sync(g)
print(f"bwd compile+run {time.perf_counter()-t0:.2f}s")
t0 = time.perf_counter()
for _ in range(3):
    g = grad(table, x)
s = sync(g)
print(f"fwd+bwd steady {(time.perf_counter()-t0)/3*1e3:.1f} ms")

# raw gather benchmark: one flat gather of B*8*16 indices
idx = jax.random.randint(jax.random.PRNGKey(2), (B * 8 * 16,), 0, spec.table_rows)
gf = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
t0 = time.perf_counter(); r = gf(table, idx); s = float(r)
print(f"raw gather compile+run {time.perf_counter()-t0:.2f}s")
t0 = time.perf_counter()
for _ in range(3):
    r = gf(table, idx)
s = float(r)
dt = (time.perf_counter()-t0)/3
print(f"raw gather steady {dt*1e3:.1f} ms ({B*8*16/dt/1e9:.2f}G gathers/s)")

# sort benchmark
z = jax.random.uniform(jax.random.PRNGKey(3), (4096, 832))
sf = jax.jit(lambda z: jnp.sort(z, axis=1).sum())
r = sf(z); s = float(r)
t0 = time.perf_counter()
for _ in range(3):
    r = sf(z)
s = float(r)
print(f"sort [4096,832] steady {(time.perf_counter()-t0)/3*1e3:.1f} ms")
