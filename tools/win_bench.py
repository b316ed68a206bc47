"""Time the windowed (run-collapsing) kernels vs the plain kernels on chip.

Coherent stream generated on-device (KITTI pano-ray geometry). Run:
  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/win_bench.py
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
    key = jax.random.PRNGKey(0)
    table = jax.block_until_ready(
        jax.random.normal(key, (spec.table_rows, 128), jnp.float32) * 1e-4
    )
    g = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(1), (Q, spec.output_dim), jnp.float32)
    )
    print("inputs built on device", flush=True)

    rows, lf, _ = jax.jit(bhp.prep_inputs_padded, static_argnums=(1,))(x, spec)
    Qp = lf.shape[-1]
    flags = jax.jit(
        functools.partial(bhp.pack_win_flags, L=L, Qp=Qp)
    )(rows)
    jax.block_until_ready(flags)
    f = np.asarray(flags).reshape(L, -1)
    print("uniform-8 fraction per level:",
          " ".join(f"{(fl & 1).mean():.2f}" for fl in f), flush=True)
    tflags = timeit(lambda: bhp.pack_win_flags(rows, L, Qp))
    print(f"pack_win_flags_ms {tflags:.1f}", flush=True)

    t = timeit(lambda: bhp._fwd_from_prep(rows, lf, table, Q, spec))
    print(f"fwd_plain_ms {t:.1f}", flush=True)
    ref_fwd = bhp._fwd_from_prep(rows, lf, table, Q, spec)

    print("compiling fwd_win ...", flush=True)
    t = timeit(lambda: bhp._fwd_win_from_prep(rows, lf, flags, table, Q, spec))
    out = bhp._fwd_win_from_prep(rows, lf, flags, table, Q, spec)
    err = float(jnp.max(jnp.abs(out - ref_fwd)))
    print(f"fwd_win_ms {t:.1f}  maxabs_err {err:.3e}", flush=True)

    t = timeit(lambda: bhp._bwd_from_prep(rows, lf, g, spec))
    print(f"bwd_plain_ms {t:.1f}", flush=True)
    ref_bwd = bhp._bwd_from_prep(rows, lf, g, spec)

    print("compiling bwd_win ...", flush=True)
    t = timeit(lambda: bhp._bwd_win_from_prep(rows, lf, flags, g, spec))
    out = bhp._bwd_win_from_prep(rows, lf, flags, g, spec)
    err = float(jnp.max(jnp.abs(out - ref_bwd)))
    rel = err / (float(jnp.max(jnp.abs(ref_bwd))) + 1e-30)
    print(f"bwd_win_ms {t:.1f}  maxabs_err {err:.3e} rel {rel:.3e}", flush=True)

    # shuffled stream: degradation check
    perm = np.random.RandomState(4).permutation(Qp)
    rows_s = jnp.asarray(np.asarray(rows).reshape(L, Qp)[:, perm].reshape(-1))
    lf_s = jnp.asarray(np.asarray(lf)[:, :, perm])
    flags_s = jax.jit(functools.partial(bhp.pack_win_flags, L=L, Qp=Qp))(rows_s)
    jax.block_until_ready(flags_s)
    t = timeit(lambda: bhp._fwd_win_from_prep(rows_s, lf_s, flags_s, table, Q, spec))
    print(f"fwd_win_shuffled_ms {t:.1f}", flush=True)
    t = timeit(lambda: bhp._fwd_from_prep(rows_s, lf_s, table, Q, spec))
    print(f"fwd_plain_shuffled_ms {t:.1f}", flush=True)


if __name__ == "__main__":
    main()
