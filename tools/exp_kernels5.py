"""Experiment 5: MXU one-hot gather for dense coarse levels in the FORWARD.

Baseline after round 3 (v5e, Q=4096*832): fwd quad u8 151 ms, bwd 240 ms,
step 433 ms -> 7.87M composited samples/s/chip.

The backward already scatters its dense coarse pair (levels 0+1) via exact
one-hot matmuls on the MXU. The forward still fetches those levels with the
scalar core, which is the kernel's bottleneck resource (100% fetch-bound,
tools/exp_kernels2.py). Hypothesis: gathering levels 0+1 on the MXU
(rows = E[q, r] @ table_rows, E exact 0/1 in bf16, hi/lo split for f32
accuracy) frees 2 of group 0's 4 fetch streams; the matmul cost (~2 x
4096 x (256 + 768) x 128 MACs per chunk, ~17 ms total) hides behind the
remaining 2-stream scalar fetch (~19 ms) in the grid pipeline.

Variants:
  V0: landed quad kernel (control).
  V1: MXU gather for the eligible prefix within group 0 under budget
      FWD_MXU_COLS=1024 (levels 0, 1 at the flagship spec).
  V2: budget 3456 (also level 2, tiled at 512 cols) — the economics say
      this LOSES (~60 ms of matmul vs ~9.5 ms of fetch saved); measured to
      pin the dead end.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_kernels5.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidarnerf_tpu.ops import block_hash as bh
from lidarnerf_tpu.ops import block_hash_pallas as bhp

CHUNK = bhp.CHUNK
UNROLL = bhp.UNROLL
MXU_TILE = 512


def timeit(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def fwd_mxu_cols(spec, budget):
    """Per-level one-hot widths for the forward gather (dense prefix)."""
    cols = []
    for level in spec.levels:
        n = level.blocks_axis**3
        npad = -(-n // 128) * 128
        if level.dense and npad <= min(budget, spec.blocks_per_level):
            cols.append(npad)
        else:
            break
    return tuple(cols)


def make_fwd_mxu(spec, mxu_cols, interpret=False):
    """Quad forward with the first len(mxu_cols) levels gathered on the MXU."""
    L, B = spec.num_levels, spec.blocks_per_level
    group = 4 if L % 4 == 0 else 2
    n_mxu = len(mxu_cols)
    assert n_mxu <= group, "eligible prefix must sit inside group 0"

    def kernel(*refs):
        idx_refs = refs[:group]
        lf_ref, table_ref, out_ref, rows_scratch = refs[group:]
        p = pl.program_id(0)

        def fetch(streams):
            def body(b, _):
                q0 = b * UNROLL
                for u in range(UNROLL):
                    for k in streams:
                        rows_scratch[k, q0 + u, :] = table_ref[
                            idx_refs[k][q0 + u], :
                        ]
                return 0

            jax.lax.fori_loop(0, CHUNK // UNROLL, body, 0)

        if n_mxu:

            @pl.when(p == 0)
            def _():
                fetch(range(n_mxu, group))
                dn = (((1,), (0,)), ((), ()))
                for k in range(n_mxu):
                    n = mxu_cols[k]
                    ids = jnp.transpose(lf_ref[k, 3:4, :], (1, 0)).astype(
                        jnp.int32
                    )  # [CHUNK, 1]
                    acc = jnp.zeros((CHUNK, 128), jnp.float32)
                    for t0 in range(0, n, MXU_TILE):
                        tw = min(MXU_TILE, n - t0)
                        r = (
                            jax.lax.broadcasted_iota(jnp.int32, (CHUNK, tw), 1)
                            + t0
                        )
                        E = (r == ids).astype(jnp.bfloat16)  # exact 0/1
                        t = table_ref[k * B + t0 : k * B + t0 + tw, :]
                        thi = t.astype(jnp.bfloat16)
                        tlo = (t - thi.astype(jnp.float32)).astype(jnp.bfloat16)
                        acc = acc + jax.lax.dot_general(
                            E, thi, dn, preferred_element_type=jnp.float32
                        )
                        acc = acc + jax.lax.dot_general(
                            E, tlo, dn, preferred_element_type=jnp.float32
                        )
                    rows_scratch[k] = acc

            @pl.when(p != 0)
            def _():
                fetch(range(group))

        else:
            fetch(range(group))

        E = bhp._eo_selector()
        for lvl in range(group):
            lf = jnp.transpose(lf_ref[lvl], (1, 0))
            W = bhp._lane_weights(lf)
            prod = rows_scratch[lvl] * W
            feats = bhp._hilo_dot(prod, E)
            out_ref[lvl, :, :] = jnp.transpose(feats, (1, 0))

    @functools.partial(jax.jit, static_argnames=("Q",))
    def fwd(rows, lf, table, Q):
        Qp = lf.shape[-1]
        nchunks = Qp // CHUNK
        rows_g = bhp._offset_rows(rows, L, Qp, B, group)

        def idx_spec(k):
            return pl.BlockSpec(
                (CHUNK,),
                functools.partial(
                    lambda k, p, i: ((group * p + k) * nchunks + i,), k
                ),
                memory_space=pltpu.SMEM,
            )

        out = pl.pallas_call(
            kernel,
            grid=(L // group, nchunks),
            in_specs=[idx_spec(k) for k in range(group)]
            + [
                pl.BlockSpec(
                    (group, 4, CHUNK),
                    lambda p, i: (p, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (group * B, 128), lambda p, i: (p, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (group, 2, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((L, 2, Qp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((group, CHUNK, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
            interpret=interpret,
        )(*([rows_g] * group), lf, table)
        return jnp.transpose(out, (2, 0, 1)).reshape(Qp, L * 2)[:Q]

    return fwd


def main():
    from lidarnerf_tpu.dataset.convert import pano_dirs

    spec = bh.make_block_hash_spec(
        num_levels=16, base_resolution=16, log2_hashmap_size=19,
        desired_resolution=32768,
    )
    N_RAYS, S = 4096, 832
    Q = N_RAYS * S
    scale = 0.009914
    dirs = pano_dirs(66, 1030, (2.0, 26.9)).reshape(-1, 3).astype(np.float32)
    sel = np.random.RandomState(0).choice(len(dirs), N_RAYS, replace=False)

    @jax.jit
    def build_x(d):
        o = jnp.zeros_like(d).at[:, 0].set(0.3)
        near, far = scale, scale * 81.0
        t = near + (far - near) * (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
        x = o[:, None, :] + d[:, None, :] * t[None, :, None]
        return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0).reshape(-1, 3)

    x = jax.block_until_ready(build_x(jnp.asarray(dirs[sel])))
    table = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (spec.table_rows, 128)) * 1e-2
    )
    rows, lf, _ = jax.jit(bhp.prep_inputs_padded, static_argnums=(1,))(x, spec)
    jax.block_until_ready((rows, lf))
    print("inputs ready", flush=True)

    t = timeit(lambda: bhp._fwd_from_prep(rows, lf, table, Q, spec))
    ref = bhp._fwd_from_prep(rows, lf, table, Q, spec)
    print(f"V0 fwd_plain_ms {t:.1f}", flush=True)

    for name, budget in (("V1", 1024), ("V2", 3456)):
        cols = fwd_mxu_cols(spec, budget)
        fwd = make_fwd_mxu(spec, cols)
        print(f"{name} cols={cols}: compiling ...", flush=True)
        t = timeit(lambda: fwd(rows, lf, table, Q))
        out = fwd(rows, lf, table, Q)
        err = float(jnp.max(jnp.abs(out - ref)))
        rel = err / (float(jnp.max(jnp.abs(ref))) + 1e-30)
        print(f"{name} fwd_mxu_ms {t:.1f}  maxabs {err:.3e} rel {rel:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
