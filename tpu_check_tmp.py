import time
import numpy as np, jax, jax.numpy as jnp
from lidarnerf_tpu.ops import block_hash as bh

spec = bh.make_block_hash_spec(num_levels=16, base_resolution=16,
                               log2_hashmap_size=19, desired_resolution=32768)
print("blocks/level", spec.blocks_per_level, "table rows", spec.table_rows, flush=True)
table = bh.block_hash_init(jax.random.PRNGKey(0), spec)
Q = 1 << 20
x = jax.random.uniform(jax.random.PRNGKey(1), (Q, 3))

# correctness fwd: pallas vs XLA fallback
f_pal = jax.jit(lambda x, t: bh.block_hash_encode(x, t, spec, True))
f_xla = jax.jit(lambda x, t: bh.block_hash_encode(x, t, spec, False))
small = x[:8192]
a = np.asarray(f_pal(small, table))
b = np.asarray(f_xla(small, table))
print("fwd max abs diff:", np.abs(a - b).max(), flush=True)

# correctness bwd
def loss_pal(t):
    return jnp.sum(f_pal(small, t) ** 2)
def loss_xla(t):
    return jnp.sum(f_xla(small, t) ** 2)
ga = np.asarray(jax.jit(jax.grad(loss_pal))(table))
gb = np.asarray(jax.jit(jax.grad(loss_xla))(table))
print("bwd max abs diff:", np.abs(ga - gb).max(), "scale", np.abs(gb).max(), flush=True)

# speed fwd
r = f_pal(x, table); s = float(jnp.sum(r))
t0 = time.perf_counter()
for _ in range(5):
    r = f_pal(x, table)
s = float(jnp.sum(r))
d = (time.perf_counter() - t0) / 5
print(f"pallas fwd encode: {d*1e3:.1f} ms for {Q} pts x16 lvls ({Q*16/d/1e6:.0f}M rows/s)", flush=True)

# speed fwd+bwd
gfn = jax.jit(jax.grad(lambda t: jnp.sum(f_pal(x, t) ** 2)))
g = gfn(table); s = float(jnp.sum(g))
t0 = time.perf_counter()
for _ in range(3):
    g = gfn(table)
s = float(jnp.sum(g))
d = (time.perf_counter() - t0) / 3
print(f"pallas fwd+bwd: {d*1e3:.1f} ms", flush=True)
