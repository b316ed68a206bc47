"""Experiment (round 5): Pallas scalar-fetch kernel for the occ-grid bin
lookup - measured MARGINAL, not wired in.

The --fast step's occ_bin_pdf spends ~5.8 ms in the [4096x128] jnp.take
from the 128^3 occupancy grid (TPU gather ~90M elem/s; the dilation is
free). This kernel replaces it with the block-hash-style scalar fetch: one
VMEM row fetch per query (row = cell >> 7), lane extract + static-lane
placement as masked vector ops, dual accumulator chains, packed SMEM
index. Measured on v5e at training scale (524k lookups): bit-exact,
3.88 ms vs 5.93 ms XLA take - only 1.5x, because ~6 vector ops per single
fetch do NOT ride free (unlike the encode kernel's 1-fetch-1-store loop),
leaving ~2 ms (1.5%) of the 136 ms step. Not worth the dispatch/test
surface; kept as the measured record.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_occ_lookup.py
"""

import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 128
CHUNK = 4096
GROUP = 128


def lookup_pallas(idx, grid2d):
    """idx: [Qp] i32 packed cell index; grid2d: [G*G, G] f32."""
    Qp = idx.shape[0]
    nchunks = Qp // CHUNK

    def kernel(idx_ref, grid_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)

        def body(g, _):
            acc0 = jnp.zeros((1, G), jnp.float32)
            acc1 = jnp.zeros((1, G), jnp.float32)
            for u in range(0, GROUP, 2):
                q = g * GROUP + u
                i0 = idx_ref[q]
                i1 = idx_ref[q + 1]
                row0 = grid_ref[i0 >> 7, :].reshape(1, G)
                row1 = grid_ref[i1 >> 7, :].reshape(1, G)
                v0 = jnp.sum(jnp.where(iota == (i0 & 127), row0, 0.0))
                v1 = jnp.sum(jnp.where(iota == (i1 & 127), row1, 0.0))
                acc0 = acc0 + jnp.where(iota == u, v0, 0.0)
                acc1 = acc1 + jnp.where(iota == (u + 1), v1, 0.0)
            out_ref[g, :] = (acc0 + acc1)[0]
            return 0

        jax.lax.fori_loop(0, CHUNK // GROUP, body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((G * G, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK // GROUP, G), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Qp // GROUP, G), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(idx, grid2d)
    return out.reshape(Qp)


rng = np.random.RandomState(0)
N, K = 4096, 128
Qp = N * K
grid = jnp.asarray(rng.rand(G, G, G).astype(np.float32))
idx = rng.randint(0, G ** 3, size=Qp).astype(np.int32)
rows = jnp.asarray(idx // G)
lanes = jnp.asarray(idx % G)
grid2d = grid.reshape(G * G, G)
idx_d = jnp.asarray(idx)

f_pl = jax.jit(lambda i, g: lookup_pallas(i, g).sum())
f_xla = jax.jit(lambda i, g: jnp.take(g.reshape(-1), i).sum())

a = lookup_pallas(idx_d, grid2d)
b = jnp.take(grid.reshape(-1), idx_d)
print("max abs diff:", float(jnp.abs(a - b).max()), flush=True)


def t(fn, *args):
    for _ in range(2):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / 10 * 1e3


print(f"pallas: {t(f_pl, idx_d, grid2d):.2f} ms", flush=True)
print(f"xla take: {t(f_xla, idx_d, grid):.2f} ms", flush=True)
