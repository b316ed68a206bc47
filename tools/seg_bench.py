"""Time the landed segmented kernels vs the plain kernels on the real chip.

Coherent stream generated on-device (KITTI pano-ray geometry) to keep tunnel
transfers small. Run:
  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/seg_bench.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from lidarnerf_tpu.ops import block_hash as bh
from lidarnerf_tpu.ops import block_hash_pallas as bhp
from lidarnerf_tpu.dataset.convert import pano_dirs


def timeit(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    spec = bh.make_block_hash_spec(
        num_levels=16, base_resolution=16, log2_hashmap_size=19,
        desired_resolution=32768,
    )
    L = spec.num_levels
    N_RAYS, S = 4096, 832
    Q = N_RAYS * S
    scale = 0.009914

    H, W = 66, 1030
    dirs = pano_dirs(H, W, (2.0, 26.9)).reshape(-1, 3).astype(np.float32)
    sel = np.random.RandomState(0).choice(len(dirs), N_RAYS, replace=False)
    d_host = dirs[sel]  # 48 KB

    @jax.jit
    def build_x(d):
        o = jnp.zeros_like(d).at[:, 0].set(0.3)
        near, far = scale, scale * 81.0
        t = near + (far - near) * (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
        x = o[:, None, :] + d[:, None, :] * t[None, :, None]
        return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0).reshape(-1, 3)

    x = jax.block_until_ready(build_x(jnp.asarray(d_host)))
    print("x built on device", flush=True)
    key = jax.random.PRNGKey(0)
    table = jax.block_until_ready(
        jax.random.normal(key, (spec.table_rows, 128), jnp.float32) * 1e-4
    )
    g = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(1), (Q, spec.output_dim), jnp.float32)
    )
    print("table/g built on device", flush=True)

    rows, lf, _ = jax.jit(
        bhp.prep_inputs_padded, static_argnums=(1,)
    )(x, spec)
    jax.block_until_ready(lf)
    print("prep done", flush=True)
    Qp = lf.shape[-1]
    nxt, nseg = jax.jit(
        functools.partial(bhp.seg_next, L=L, Qp=Qp)
    )(rows)
    jax.block_until_ready(nxt)
    print("mean nseg/chunk per level:",
          " ".join(str(int(v)) for v in np.asarray(nseg).reshape(L, -1).mean(1)),
          flush=True)
    tprep = timeit(lambda: bhp.seg_next(rows, L, Qp)[0])
    print(f"seg_next_prep_ms {tprep:.1f}", flush=True)

    t = timeit(lambda: bhp._fwd_from_prep(rows, lf, table, Q, spec))
    print(f"fwd_plain_ms {t:.1f}", flush=True)
    ref_fwd = bhp._fwd_from_prep(rows, lf, table, Q, spec)

    print("compiling fwd_seg ...", flush=True)
    t = timeit(lambda: bhp._fwd_seg_from_prep(rows, lf, nxt, nseg, table, Q, spec))
    out = bhp._fwd_seg_from_prep(rows, lf, nxt, nseg, table, Q, spec)
    err = float(jnp.max(jnp.abs(out - ref_fwd)))
    print(f"fwd_seg_ms {t:.1f}  maxabs_err {err:.3e}", flush=True)

    t = timeit(lambda: bhp._bwd_from_prep(rows, lf, g, spec))
    print(f"bwd_plain_ms {t:.1f}", flush=True)
    ref_bwd = bhp._bwd_from_prep(rows, lf, g, spec)

    print("compiling bwd_seg ...", flush=True)
    t = timeit(lambda: bhp._bwd_seg_from_prep(rows, lf, nxt, nseg, g, spec))
    out = bhp._bwd_seg_from_prep(rows, lf, nxt, nseg, g, spec)
    err = float(jnp.max(jnp.abs(out - ref_bwd)))
    rel = err / (float(jnp.max(jnp.abs(ref_bwd))) + 1e-30)
    print(f"bwd_seg_ms {t:.1f}  maxabs_err {err:.3e} rel {rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
