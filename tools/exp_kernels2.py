"""Experiment 2: MXU paths for dense coarse levels + quad-level ILP.

Findings from exp_bwd.py (v5e, KITTI step scale Q=4096*832):
  - bwd current S6 (output-block shards): 283.6 ms
  - bwd scratch-accumulator S8: 249.4 ms  (S10 worse, S12 compile-OOM)
  - fwd 165-177 ms; fetch-only == full fwd -> 100% scalar-fetch bound

Hypotheses tested here:
  H1 (fwd_quad): 4 levels per grid step = 4 independent fetch streams hide
     more VMEM load latency than 2 (1->2 gave +16%% in round 1).
  H2 (fwd_mxu0): level pair 0 (dense, 216/729 rows) can gather rows as an
     exact one-hot matmul E[q,r] @ table  on the MXU instead of the scalar
     fetch loop (row ids ride in the spare lf[...,3,:] slot as f32).
  H3 (bwd_mxu0): same for backward scatter: grad_pair0 = E^T @ grad_rows,
     removing 2*4096 RMW ops per chunk AND the worst hazard chains (coarse
     levels are exactly where ray-coherent consecutive queries collide).
  H4 (fetch bf16): bf16 table rows halve fetched bytes; if the loop is
     issue-bound (not byte-bound) this is a no-op.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_kernels2.py
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

# dense-level one-hot column budgets (padded to 128) for pair 0 of the
# flagship spec: level 0 has 216 block rows, level 1 has 729
MXU_COLS = (256, 768)


def timeit(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def _prep(spec, Q, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(Q, 3).astype(np.float32))
    table = jnp.asarray(rng.randn(spec.table_rows, 128).astype(np.float32) * 1e-4)
    g = jnp.asarray(rng.randn(Q, spec.output_dim).astype(np.float32))
    rows, lf, _ = bhp.prep_inputs_padded(x, spec)
    Qp = lf.shape[-1]
    gp = jnp.pad(g, ((0, Qp - Q), (0, 0)))
    g_levels = gp.reshape(Qp, spec.num_levels, 2).transpose(1, 2, 0)
    # H2/H3: row ids (within level, pre-offset) ride in lf[:, 3, :]
    rows_l = rows.reshape(spec.num_levels, Qp).astype(jnp.float32)
    lf_rows = lf.at[:, 3, :].set(rows_l)
    return x, table, g, rows, lf, lf_rows, jax.block_until_ready(g_levels)


# ------------------------------------------------------------- H1: fwd quad


def make_fwd_quad(spec, unroll=4):
    L, B = spec.num_levels, spec.blocks_per_level
    assert L % 4 == 0

    def kernel(i0, i1, i2, i3, lf_ref, table_ref, out_ref, rows_scratch):
        def body(b, _):
            q0 = b * unroll
            for u in range(unroll):
                rows_scratch[0, q0 + u, :] = table_ref[i0[q0 + u], :]
                rows_scratch[1, q0 + u, :] = table_ref[i1[q0 + u], :]
                rows_scratch[2, q0 + u, :] = table_ref[i2[q0 + u], :]
                rows_scratch[3, q0 + u, :] = table_ref[i3[q0 + u], :]
            return 0

        jax.lax.fori_loop(0, CHUNK // unroll, body, 0)
        E = bhp._eo_selector()
        for lvl in range(4):
            lf = jnp.transpose(lf_ref[lvl], (1, 0))
            W = bhp._lane_weights(lf)
            feats = bhp._hilo_dot(rows_scratch[lvl] * W, E)
            out_ref[lvl, :, :] = jnp.transpose(feats, (1, 0))

    @jax.jit
    def fwd(rows, lf, table):
        Qp = lf.shape[-1]
        nchunks = Qp // CHUNK
        rows4 = rows.reshape(L, Qp)
        rows4 = rows4 + (jnp.arange(L, dtype=jnp.int32) % 4)[:, None] * np.int32(B)
        rows4 = rows4.reshape(-1)
        specs = [
            pl.BlockSpec(
                (CHUNK,),
                functools.partial(
                    lambda k, p, i: ((4 * p + k) * nchunks + i,), k
                ),
                memory_space=pltpu.SMEM,
            )
            for k in range(4)
        ]
        return pl.pallas_call(
            kernel,
            grid=(L // 4, nchunks),
            in_specs=specs
            + [
                pl.BlockSpec((4, 4, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * B, 128), lambda p, i: (p, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (4, 2, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((L, 2, Qp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((4, CHUNK, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        )(rows4, rows4, rows4, rows4, lf, table)

    return fwd


# ------------------------------------------------------- H2: fwd MXU pair 0


def _onehot_T(row_ids_f32, ncols):
    """E^T[r, q] = 1 iff rows[q] == r, exact bf16 0/1. row_ids: [CHUNK] f32."""
    r = jax.lax.broadcasted_iota(jnp.int32, (ncols, CHUNK), 0)
    ids = row_ids_f32[None, :].astype(jnp.int32)
    return (r == ids).astype(jnp.bfloat16)


def make_fwd_mxu0(spec):
    """Forward where grid step p=0 gathers level-0/1 rows on the MXU."""
    L, B = spec.num_levels, spec.blocks_per_level

    def kernel(idx0_ref, idx1_ref, lf_ref, table_ref, out_ref, rows_scratch):
        p = pl.program_id(0)

        @pl.when(p == 0)
        def _():
            for lvl in range(2):
                n = MXU_COLS[lvl]
                ET = _onehot_T(lf_ref[lvl, 3, :], n)  # [n, CHUNK]
                tb = table_ref[lvl * B : lvl * B + n, :]
                thi = tb.astype(jnp.bfloat16)
                tlo = (tb - thi.astype(jnp.float32)).astype(jnp.bfloat16)
                dn = (((0,), (0,)), ((), ()))  # contract over n
                rows = jax.lax.dot_general(
                    ET, thi, dn, preferred_element_type=jnp.float32
                ) + jax.lax.dot_general(
                    ET, tlo, dn, preferred_element_type=jnp.float32
                )
                rows_scratch[lvl] = rows  # [CHUNK, 128]

        @pl.when(p != 0)
        def _():
            def body(b, _):
                q0 = b * UNROLL
                for u in range(UNROLL):
                    rows_scratch[0, q0 + u, :] = table_ref[idx0_ref[q0 + u], :]
                    rows_scratch[1, q0 + u, :] = table_ref[idx1_ref[q0 + u], :]
                return 0

            jax.lax.fori_loop(0, CHUNK // UNROLL, body, 0)

        E = bhp._eo_selector()
        for lvl in range(2):
            lf = jnp.transpose(lf_ref[lvl, :4], (1, 0))
            W = bhp._lane_weights(lf)
            feats = bhp._hilo_dot(rows_scratch[lvl] * W, E)
            out_ref[lvl, :, :] = jnp.transpose(feats, (1, 0))

    @jax.jit
    def fwd(rows, lf_rows, table):
        Qp = lf_rows.shape[-1]
        nchunks = Qp // CHUNK
        rows2 = rows.reshape(L, Qp)
        rows2 = rows2 + (jnp.arange(L, dtype=jnp.int32) % 2)[:, None] * np.int32(B)
        rows2 = rows2.reshape(-1)
        return pl.pallas_call(
            kernel,
            grid=(L // 2, nchunks),
            in_specs=[
                pl.BlockSpec(
                    (CHUNK,), lambda p, i: (2 * p * nchunks + i,), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    (CHUNK,),
                    lambda p, i: ((2 * p + 1) * nchunks + i,),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec((2, 4, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * B, 128), lambda p, i: (p, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (2, 2, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((L, 2, Qp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, CHUNK, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        )(rows2, rows2, lf_rows, table)

    return fwd


# ------------------------------------------------------- H3: bwd MXU pair 0


def make_bwd_scratch_mxu0(spec, shards):
    L, B = spec.num_levels, spec.blocks_per_level

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

        @pl.when(p == 0)
        def _():
            # dense coarse pair: scatter = one-hot^T @ grad_rows on the MXU
            for lvl in range(2):
                n = MXU_COLS[lvl]
                Eoh = _onehot_T(lf_ref[lvl, 3, :], n)  # [n, CHUNK]
                gr = rows_scratch[lvl]  # [CHUNK, 128] f32
                ghi = gr.astype(jnp.bfloat16)
                glo = (gr - ghi.astype(jnp.float32)).astype(jnp.bfloat16)
                dn = (((1,), (0,)), ((), ()))
                upd = jax.lax.dot_general(
                    Eoh, ghi, dn, preferred_element_type=jnp.float32
                ) + jax.lax.dot_general(Eoh, glo, dn, preferred_element_type=jnp.float32)
                o = lvl * B
                acc[0, o : o + n, :] = acc[0, o : o + n, :] + upd

        @pl.when(p != 0)
        def _():
            nbody = CHUNK // shards

            def body(b, _):
                q0 = b * shards
                for u in range(shards):
                    i0 = idx0_ref[q0 + u]
                    i1 = idx1_ref[q0 + u]
                    acc[u, i0, :] = acc[u, i0, :] + rows_scratch[0, q0 + u, :]
                    acc[u, i1, :] = acc[u, i1, :] + rows_scratch[1, q0 + u, :]
                return 0

            jax.lax.fori_loop(0, nbody, body, 0)
            for u in range(CHUNK - (CHUNK // shards) * shards):
                q = (CHUNK // shards) * shards + u
                i0 = idx0_ref[q]
                i1 = idx1_ref[q]
                acc[u, i0, :] = acc[u, i0, :] + rows_scratch[0, q, :]
                acc[u, i1, :] = acc[u, i1, :] + rows_scratch[1, q, :]

        @pl.when(i == pl.num_programs(1) - 1)
        def _():
            total = acc[0]
            for u in range(1, shards):
                total = total + acc[u]
            out_ref[:] = total

    @jax.jit
    def bwd(rows, lf_rows, g_levels):
        Qp = lf_rows.shape[-1]
        nchunks = Qp // CHUNK
        rows2 = rows.reshape(L, Qp)
        rows2 = rows2 + (jnp.arange(L, dtype=jnp.int32) % 2)[:, None] * np.int32(B)
        rows2 = rows2.reshape(-1)
        return pl.pallas_call(
            kernel,
            grid=(L // 2, nchunks),
            in_specs=[
                pl.BlockSpec(
                    (CHUNK,), lambda p, i: (2 * p * nchunks + i,), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    (CHUNK,),
                    lambda p, i: ((2 * p + 1) * nchunks + i,),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec((2, 4, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 2, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (2 * B, 128), lambda p, i: (p, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((L * B, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, CHUNK, 128), jnp.float32),
                pltpu.VMEM((shards, 2 * B, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )(rows2, rows2, lf_rows, g_levels)

    return bwd


# ---------------------------------------------------------- H4: bf16 fetch


def make_fwd_fetch_bf16(spec):
    """bf16 rows packed as int32 [rows, 64]: halves fetched bytes per row."""
    L, B = spec.num_levels, spec.blocks_per_level

    def kernel(idx0_ref, idx1_ref, lf_ref, table_ref, out_ref, rows_scratch):
        def body(b, _):
            q0 = b * UNROLL
            for u in range(UNROLL):
                rows_scratch[0, q0 + u, :] = table_ref[idx0_ref[q0 + u], :]
                rows_scratch[1, q0 + u, :] = table_ref[idx1_ref[q0 + u], :]
            return 0

        jax.lax.fori_loop(0, CHUNK // UNROLL, body, 0)
        out_ref[0, :, :] = jnp.sum(rows_scratch[0], axis=-1)[None, :].astype(jnp.float32)
        out_ref[1, :, :] = jnp.sum(rows_scratch[1], axis=-1)[None, :].astype(jnp.float32)

    @jax.jit
    def fwd(rows, lf, table_bf16):
        Qp = lf.shape[-1]
        nchunks = Qp // CHUNK
        rows2 = rows.reshape(L, Qp)
        rows2 = rows2 + (jnp.arange(L, dtype=jnp.int32) % 2)[:, None] * np.int32(B)
        rows2 = rows2.reshape(-1)
        return pl.pallas_call(
            kernel,
            grid=(L // 2, nchunks),
            in_specs=[
                pl.BlockSpec(
                    (CHUNK,), lambda p, i: (2 * p * nchunks + i,), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    (CHUNK,),
                    lambda p, i: ((2 * p + 1) * nchunks + i,),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec((2, 4, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * B, 64), lambda p, i: (p, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (2, 1, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((L, 1, Qp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, CHUNK, 64), jnp.int32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        )(rows2, rows2, lf, table_bf16)

    return fwd


def main():
    spec = bh.make_block_hash_spec(
        num_levels=16, base_resolution=16, log2_hashmap_size=19,
        desired_resolution=32768,
    )
    # sanity: pair-0 levels really are dense and under the MXU col budget
    for lvl, ncols in zip(spec.levels[:2], MXU_COLS):
        assert lvl.dense and lvl.blocks_axis ** 3 <= ncols, (lvl, ncols)

    Q = 4096 * 832
    x, table, g, rows, lf, lf_rows, g_levels = _prep(spec, Q)

    t = timeit(lambda: bhp._fwd_from_prep(rows, lf, table, Q, spec))
    print(f"fwd_current_ms {t:.1f}", flush=True)
    ref_fwd = bhp._fwd_from_prep(rows, lf, table, Q, spec)

    for unroll in (4, 8):
        try:
            fq = make_fwd_quad(spec, unroll)
            t = timeit(lambda: fq(rows, lf, table))
            out = fq(rows, lf, table)
            out = jnp.transpose(out, (2, 0, 1)).reshape(-1, spec.output_dim)[:Q]
            err = float(jnp.max(jnp.abs(out - ref_fwd)))
            print(f"fwd_quad_u{unroll}_ms {t:.1f}  maxabs_err {err:.3e}", flush=True)
        except Exception as e:
            print(f"fwd_quad_u{unroll} FAILED: {str(e)[:200]}", flush=True)

    try:
        fm = make_fwd_mxu0(spec)
        t = timeit(lambda: fm(rows, lf_rows, table))
        out = fm(rows, lf_rows, table)
        out = jnp.transpose(out, (2, 0, 1)).reshape(-1, spec.output_dim)[:Q]
        err = float(jnp.max(jnp.abs(out - ref_fwd)))
        print(f"fwd_mxu0_ms {t:.1f}  maxabs_err {err:.3e}", flush=True)
    except Exception as e:
        print(f"fwd_mxu0 FAILED: {str(e)[:200]}", flush=True)

    cur = functools.partial(bhp._bwd_from_prep, spec=spec)
    t = timeit(lambda: cur(rows, lf, g))
    print(f"bwd_current_S{bhp.SHARDS}_ms {t:.1f}", flush=True)
    ref_bwd = cur(rows, lf, g)

    for S in (6, 8):
        try:
            fn = make_bwd_scratch_mxu0(spec, S)
            t = timeit(lambda: fn(rows, lf_rows, g_levels))
            out = fn(rows, lf_rows, g_levels)
            err = float(jnp.max(jnp.abs(out - ref_bwd)))
            rel = err / (float(jnp.max(jnp.abs(ref_bwd))) + 1e-30)
            print(f"bwd_mxu0_S{S}_ms {t:.1f}  maxabs_err {err:.3e} rel {rel:.3e}",
                  flush=True)
        except Exception as e:
            print(f"bwd_mxu0_S{S} FAILED: {str(e)[:200]}", flush=True)

    try:
        fb = make_fwd_fetch_bf16(spec)
        tb = jax.lax.bitcast_convert_type(
            table.astype(jnp.bfloat16).reshape(spec.table_rows, 64, 2), jnp.int32
        ).reshape(spec.table_rows, 64)
        t = timeit(lambda: fb(rows, lf, tb))
        print(f"fwd_fetch_bf16_ms {t:.1f}", flush=True)
    except Exception as e:
        print(f"fwd_fetch_bf16 FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
