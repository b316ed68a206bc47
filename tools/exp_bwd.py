"""Experiment: backward-kernel shard-count sweep with a scratch accumulator.

Hypothesis: the current backward keeps the SHARDS gradient copies in the
pallas OUTPUT block, which Mosaic double-buffers — so S=8 OOMs VMEM at f32
(2 x 67MB). Moving the copies into a persistent VMEM *scratch* accumulator
(zeroed at chunk 0, summed into the real output block at the last chunk)
needs only ONE copy of the shards, freeing room for S=12 at f32 — 24
independent RMW chains (12 shards x 2 levels/pair) vs today's 12, which
should push the latency-bound RMW loop toward the fetch loop's issue rate.

Also times the forward split (fetch loop vs phase-2 lerp/MXU) to direct
forward work.

Run: PYTHONPATH=/root/repo python tools/exp_bwd.py
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


def timeit(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def make_bwd_scratch(spec, shards):
    """Backward with persistent scratch accumulator, sweepable shard count."""
    L = spec.num_levels
    B = spec.blocks_per_level

    def kernel(idx0_ref, idx1_ref, lf_ref, g_ref, out_ref, rows_scratch, acc):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        ET = bhp._eo_selector(transposed=True)
        for lvl in range(2):
            lf = jnp.transpose(lf_ref[lvl], (1, 0))
            W = bhp._lane_weights(lf)
            g = jnp.transpose(g_ref[lvl], (1, 0))
            g_lane = bhp._hilo_dot(g, ET)
            rows_scratch[lvl] = W * g_lane

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
        for u in range(CHUNK - nbody * shards):
            q = nbody * shards + u
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

    @functools.partial(jax.jit, static_argnames=())
    def bwd(rows, lf, g_levels):
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
                    (CHUNK,),
                    lambda p, i: (2 * p * nchunks + i,),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (CHUNK,),
                    lambda p, i: ((2 * p + 1) * nchunks + i,),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (2, 4, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (2, 2, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
                ),
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
        )(rows2, rows2, lf, g_levels)

    return bwd


def make_fwd_fetch_only(spec):
    """Forward with phase 2 removed — isolates the scalar fetch loop cost."""
    L = spec.num_levels
    B = spec.blocks_per_level

    def kernel(idx0_ref, idx1_ref, lf_ref, table_ref, out_ref, rows_scratch):
        def body(b, _):
            q0 = b * bhp.UNROLL
            for u in range(bhp.UNROLL):
                rows_scratch[0, q0 + u, :] = table_ref[idx0_ref[q0 + u], :]
                rows_scratch[1, q0 + u, :] = table_ref[idx1_ref[q0 + u], :]
            return 0

        jax.lax.fori_loop(0, CHUNK // bhp.UNROLL, body, 0)
        # minimal use of the fetched rows so the loop isn't DCE'd
        out_ref[0, :, :] = jnp.sum(rows_scratch[0], axis=-1)[None, :]
        out_ref[1, :, :] = jnp.sum(rows_scratch[1], axis=-1)[None, :]

    @jax.jit
    def fwd(rows, lf, table):
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
                    (CHUNK,),
                    lambda p, i: (2 * p * nchunks + i,),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (CHUNK,),
                    lambda p, i: ((2 * p + 1) * nchunks + i,),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (2, 4, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((2 * B, 128), lambda p, i: (p, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (2, 1, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((L, 1, Qp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, CHUNK, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
        )(rows2, rows2, lf, table)

    return fwd


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
    rows = jax.block_until_ready(rows)
    Qp = lf.shape[-1]
    gp = jnp.pad(g, ((0, Qp - Q), (0, 0)))
    g_levels = gp.reshape(Qp, spec.num_levels, 2).transpose(1, 2, 0)
    g_levels = jax.block_until_ready(g_levels)

    # baseline: current kernel
    cur = functools.partial(bhp._bwd_from_prep, spec=spec)
    t = timeit(lambda: cur(rows, lf, g))
    print(f"bwd_current_S{bhp.SHARDS}_ms {t:.1f}", flush=True)
    ref_out = cur(rows, lf, g)

    for S in (8, 10, 12):
        try:
            fn = make_bwd_scratch(spec, S)
            t = timeit(lambda: fn(rows, lf, g_levels))
            out = fn(rows, lf, g_levels)
            err = float(jnp.max(jnp.abs(out - ref_out)))
            print(f"bwd_scratch_S{S}_ms {t:.1f}  maxabs_err {err:.3e}", flush=True)
        except Exception as e:
            print(f"bwd_scratch_S{S} FAILED: {str(e)[:200]}", flush=True)

    # forward split
    t = timeit(lambda: bhp._fwd_from_prep(rows, lf, table, Q, spec))
    print(f"fwd_current_ms {t:.1f}", flush=True)
    try:
        fo = make_fwd_fetch_only(spec)
        t = timeit(lambda: fo(rows, lf, table))
        print(f"fwd_fetch_only_ms {t:.1f}", flush=True)
    except Exception as e:
        print(f"fwd_fetch_only FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
