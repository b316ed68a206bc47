"""Experiment 3: post-quad forward/backward tuning toward 9M samples/s/chip.

Baseline after exp_kernels2 landed (v5e, Q=4096*832):
  fwd quad u8: 149.3 ms    bwd scratch-S8 + MXU pair 0: 236.2 ms
  step: 435.7 ms -> 7.87M composited samples/s/chip

Hypotheses:
  H1 (fwd group=8): eight independent fetch streams. 1->2 gave +16%, 2->4
     +10%; if the scalar loop is latency-bound there is more to take, if it
     is issue-bound this is a no-op. VMEM: 8*8192 rows table block = 32 MB
     + (8, CHUNK, 128) f32 scratch = 16 MB @ CHUNK 4096 — fits.
  H2 (fwd quad UNROLL=16): fewer loop-bookkeeping cycles per fetch.
  H3 (fwd quad CHUNK=8192): halves grid steps (3328 -> 1664); measures the
     per-grid-step overhead (pipeline refill + phase-2 serialization).
  H4 (bwd CHUNK=8192): same for backward (RMW loop dominates; overhead
     halves, hazard spacing unchanged).
  H5 (bwd phase ablation): grad-row build only (no RMW/MXU scatter) — is
     the backward's vector phase hidden like the forward's?

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_kernels3.py
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


def timeit(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def make_fwd(spec, group, unroll, chunk):
    L, B = spec.num_levels, spec.blocks_per_level
    assert L % group == 0

    def kernel(*refs):
        idx_refs = refs[:group]
        lf_ref, table_ref, out_ref, rows_scratch = refs[group:]

        def body(b, _):
            q0 = b * unroll
            for u in range(unroll):
                for k in range(group):
                    rows_scratch[k, q0 + u, :] = table_ref[idx_refs[k][q0 + u], :]
            return 0

        jax.lax.fori_loop(0, chunk // unroll, body, 0)
        E = bhp._eo_selector()
        for lvl in range(group):
            lf = jnp.transpose(lf_ref[lvl], (1, 0))
            W = bhp._lane_weights(lf)
            feats = bhp._hilo_dot(rows_scratch[lvl] * W, E)
            out_ref[lvl, :, :] = jnp.transpose(feats, (1, 0))

    @jax.jit
    def fwd(rows, lf, table):
        Qp = lf.shape[-1]
        nchunks = Qp // chunk
        rows_g = rows.reshape(L, Qp)
        rows_g = rows_g + (jnp.arange(L, dtype=jnp.int32) % group)[:, None] * np.int32(B)
        rows_g = rows_g.reshape(-1)
        specs = [
            pl.BlockSpec(
                (chunk,),
                functools.partial(lambda k, p, i: ((group * p + k) * nchunks + i,), k),
                memory_space=pltpu.SMEM,
            )
            for k in range(group)
        ]
        return pl.pallas_call(
            kernel,
            grid=(L // group, nchunks),
            in_specs=specs
            + [
                pl.BlockSpec(
                    (group, 4, chunk), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (group * B, 128), lambda p, i: (p, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (group, 2, chunk), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((L, 2, Qp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((group, chunk, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        )(*([rows_g] * group), lf, table)

    return fwd


def make_bwd(spec, shards, mxu_cols, chunk, rmw=True):
    """Paired-level backward, parameterized; rmw=False ablates to phase 1."""
    B = spec.blocks_per_level
    n_mxu_pairs = len(mxu_cols) // 2

    def kernel(idx0_ref, idx1_ref, lf_ref, g_ref, out_ref, rows_scratch, acc):
        p = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        ET = bhp._eo_selector(transposed=True)
        for lvl in range(2):
            lf = jnp.transpose(lf_ref[lvl, :4], (1, 0))
            W = bhp._lane_weights(lf)
            g = jnp.transpose(g_ref[lvl], (1, 0))
            g_lane = bhp._hilo_dot(g, ET)
            rows_scratch[lvl] = W * g_lane

        if rmw:
            for pp in range(n_mxu_pairs):

                @pl.when(p == pp)
                def _(pp=pp):
                    for lvl in range(2):
                        n = mxu_cols[2 * pp + lvl]
                        Eoh = bhp._onehot_T(lf_ref[lvl, 3, :], n)
                        gr = rows_scratch[lvl]
                        ghi = gr.astype(jnp.bfloat16)
                        glo = (gr - ghi.astype(jnp.float32)).astype(jnp.bfloat16)
                        dn = (((1,), (0,)), ((), ()))
                        upd = jax.lax.dot_general(
                            Eoh, ghi, dn, preferred_element_type=jnp.float32
                        ) + jax.lax.dot_general(
                            Eoh, glo, dn, preferred_element_type=jnp.float32
                        )
                        o = lvl * B
                        acc[0, o : o + n, :] = acc[0, o : o + n, :] + upd

            @pl.when(p >= n_mxu_pairs)
            def _():
                nbody = chunk // shards

                def body(b, _):
                    q0 = b * shards
                    for u in range(shards):
                        i0 = idx0_ref[q0 + u]
                        i1 = idx1_ref[q0 + u]
                        acc[u, i0, :] = acc[u, i0, :] + rows_scratch[0, q0 + u, :]
                        acc[u, i1, :] = acc[u, i1, :] + rows_scratch[1, q0 + u, :]
                    return 0

                jax.lax.fori_loop(0, nbody, body, 0)
                for u in range(chunk - (chunk // shards) * shards):
                    q = (chunk // shards) * shards + u
                    i0 = idx0_ref[q]
                    i1 = idx1_ref[q]
                    acc[u, i0, :] = acc[u, i0, :] + rows_scratch[0, q, :]
                    acc[u, i1, :] = acc[u, i1, :] + rows_scratch[1, q, :]

        else:
            # phase ablation: fold the grad rows into copy 0 without scatter
            acc[0, 0, :] = acc[0, 0, :] + jnp.sum(rows_scratch[0], axis=0)

        @pl.when(i == pl.num_programs(1) - 1)
        def _():
            total = acc[0]
            for u in range(1, shards):
                total = total + acc[u]
            out_ref[:] = total

    @jax.jit
    def bwd(rows, lf, g_levels):
        L = spec.num_levels
        Qp = lf.shape[-1]
        nchunks = Qp // chunk
        rows2 = rows.reshape(L, Qp)
        rows2 = rows2 + (jnp.arange(L, dtype=jnp.int32) % 2)[:, None] * np.int32(B)
        rows2 = rows2.reshape(-1)
        return pl.pallas_call(
            kernel,
            grid=(L // 2, nchunks),
            in_specs=[
                pl.BlockSpec(
                    (chunk,), lambda p, i: (2 * p * nchunks + i,), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    (chunk,),
                    lambda p, i: ((2 * p + 1) * nchunks + i,),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (2, 4, chunk), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (2, 2, chunk), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (2 * B, 128), lambda p, i: (p, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((L * B, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, chunk, 128), jnp.float32),
                pltpu.VMEM((shards, 2 * B, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )(rows2, rows2, lf, g_levels)

    return bwd


def main():
    spec = bh.make_block_hash_spec(
        num_levels=16, base_resolution=16, log2_hashmap_size=19,
        desired_resolution=32768,
    )
    Q = 4096 * 832
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(Q, 3).astype(np.float32))
    table = jnp.asarray(rng.randn(spec.table_rows, 128).astype(np.float32) * 1e-4)
    g = jnp.asarray(rng.randn(Q, spec.output_dim).astype(np.float32))
    rows, lf, _ = bhp.prep_inputs_padded(x, spec)
    Qp = lf.shape[-1]
    gp = jnp.pad(g, ((0, Qp - Q), (0, 0)))
    g_levels = jax.block_until_ready(
        gp.reshape(Qp, spec.num_levels, 2).transpose(1, 2, 0)
    )
    mxu_cols = bhp._mxu_cols(spec)
    print(f"mxu_cols {mxu_cols}  Qp {Qp}", flush=True)

    t = timeit(lambda: bhp._fwd_from_prep(rows, lf, table, Q, spec))
    print(f"fwd_current_ms {t:.1f}", flush=True)
    ref_fwd = bhp._fwd_from_prep(rows, lf, table, Q, spec)

    for name, (grp, unr, ch) in {
        "fwd_g8_u8_c4096": (8, 8, 4096),
        "fwd_g4_u16_c4096": (4, 16, 4096),
        "fwd_g4_u8_c8192": (4, 8, 8192),
        "fwd_g8_u8_c8192": (8, 8, 8192),
    }.items():
        try:
            f = make_fwd(spec, grp, unr, ch)
            t = timeit(lambda: f(rows, lf, table))
            out = f(rows, lf, table)
            out = jnp.transpose(out, (2, 0, 1)).reshape(-1, spec.output_dim)[:Q]
            err = float(jnp.max(jnp.abs(out - ref_fwd)))
            print(f"{name}_ms {t:.1f}  maxabs_err {err:.3e}", flush=True)
        except Exception as e:
            print(f"{name} FAILED: {str(e)[:200]}", flush=True)

    cur = functools.partial(bhp._bwd_from_prep, spec=spec)
    t = timeit(lambda: cur(rows, lf, g))
    print(f"bwd_current_S{bhp.SHARDS}_ms {t:.1f}", flush=True)
    ref_bwd = cur(rows, lf, g)

    for name, kw in {
        "bwd_S8_c8192": dict(shards=8, mxu_cols=mxu_cols, chunk=8192),
        "bwd_S8_c8192_mxuless": dict(shards=8, mxu_cols=(), chunk=8192),
        "bwd_phase1_only": dict(shards=8, mxu_cols=mxu_cols, chunk=4096, rmw=False),
    }.items():
        try:
            f = make_bwd(spec, **kw)
            t = timeit(lambda: f(rows, lf, g_levels))
            if kw.get("rmw", True):
                out = f(rows, lf, g_levels)
                err = float(jnp.max(jnp.abs(out - ref_bwd)))
                rel = err / (float(jnp.max(jnp.abs(ref_bwd))) + 1e-30)
                print(f"{name}_ms {t:.1f}  maxabs_err {err:.3e} rel {rel:.3e}", flush=True)
            else:
                print(f"{name}_ms {t:.1f}", flush=True)
        except Exception as e:
            print(f"{name} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
