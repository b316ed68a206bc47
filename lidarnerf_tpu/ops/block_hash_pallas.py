"""Pallas TPU kernels for the block-hash grid encoder.

Two kernels, both iterating a (level-group, query-chunk) grid with the
group's table block resident in VMEM:

- forward (QUAD-level: four levels per grid step): phase 1 is a manually-
  unrolled scalar loop fetching each query's 128-float block row from VMEM —
  four independent fetch streams (one per level) interleave in the scalar
  pipeline to hide VMEM load latency (1 stream -> 2 gave +16%, 2 -> 4 a
  further +10%; measured 149 ms vs 165 ms at KITTI step scale, bit-exact);
  phase 2 contracts the fetched rows with the trilinear lane-weight rows and
  reduces the 128 lanes to the 2 per-level features on the MXU via a
  split-bf16 (hi + lo residual) matmul against a static even/odd selector.
  A fetch-only ablation times the same as the full forward: the kernel is
  100% scalar-fetch bound, so phase 2 rides along for free (tools/
  exp_kernels2.py) — which is also why fusing the sigma MLP into this kernel
  (round-2 TODO) was measured to be worthless and dropped.
- backward (paired-level): builds the [CHUNK, 128] gradient rows in-register
  from the upstream feature grads (same split-bf16 MXU trick to spread the 2
  feature grads across the 128 lanes), then accumulates them into SHARDS=8
  interleaved copies of the level-pair's gradient table held in a persistent
  VMEM *scratch* accumulator (zeroed at chunk 0 of each pair, reduced into
  the output block at the last chunk). The sharding breaks the store-to-load
  RMW hazard chain that otherwise serialises the loop; keeping the copies in
  scratch instead of the (double-buffered) output block is what makes S=8
  fit VMEM (the old output-block S8 variant compile-OOMed; scratch S10/S12
  measured slower/OOM). Dense coarse level pairs skip the scalar RMW loop
  entirely: their scatter is an exact one-hot matmul  E^T[r,q] @ grad_rows
  on the MXU (E 0/1 is exact in bf16; grad rows go through the hi/lo split),
  which also removes the worst RMW hazards — coarse levels are exactly where
  ray-coherent consecutive queries collide on the same block row. Measured:
  283.6 ms (round-2 S6) -> 236.2 ms (scratch S8 + MXU pair 0), max rel err
  2.8e-6 vs the exact scalar path.

Layout notes (learned the hard way): HBM-visible operands keep the QUERY axis
minor — f32[L, Qp, 8]-style arrays are tile-padded T(8,128) by XLA (16-64x
memory blowup), so per-query scalars travel as [L, k, Qp] and are transposed
to query-on-sublanes inside the kernel (Mosaic lowers these transposes
natively). Trilinear lane weights are built by comparing each lane's static
corner coordinate (sx = j>>5, sy = (j>>3)&3, sz = (j>>1)&3 for lane j)
against the query's local cell position — elementwise VPU work, no gather.
The within-level row id rides the spare lf[:, 3, :] slot as f32 (exact below
2^24) so the backward's one-hot compare can see it as a vector; bf16 table
rows were measured a no-op (the fetch loop is issue-bound, not byte-bound).
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidarnerf_tpu.ops import block_hash as bh

CHUNK = 4096
UNROLL = 8
SHARDS = 8  # hazard-chain interleaving width (scratch accumulator copies)
MXU_MAX_COLS = 1024  # one-hot scatter wins over scalar RMW up to ~1k rows

# Segment-skipping kernels (see "segmented" section below): do row work once
# per *run* of equal consecutive rows instead of once per query. Off until
# measured faster on hardware; flip with LIDARNERF_SEG_KERNELS=1/0.
SEGMENTED = os.environ.get("LIDARNERF_SEG_KERNELS", "0") == "1"
NSEG_DIV = 5  # per-chunk dynamic fallback: segment only if nseg < CHUNK/5
SEG_SCALE_MAX = 3000.0  # levels coarser than this can have runs >= 2

# Windowed (run-collapsing) kernels — see the "windowed" section: static
# per-level window sizes with precomputed uniformity flags; one branch per
# window, all loop bounds static. Flip with LIDARNERF_WIN_KERNELS=1/0.
WINDOWED = os.environ.get("LIDARNERF_WIN_KERNELS", "0") == "1"


def _eo_selector(transposed=False):
    """Static even/odd lane selector matrix for the MXU channel reduction.

    E[j, c] = 1 if lane j holds feature channel c (c = j & 1). Contracting a
    [CHUNK, 128] lane image with E on the MXU sums each query's even lanes
    into channel 0 and odd lanes into channel 1; the transpose broadcasts
    2 per-query feature grads back across the 128 lanes.
    """
    if transposed:
        r = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
        return (r == (c & 1)).astype(jnp.bfloat16)
    r = jax.lax.broadcasted_iota(jnp.int32, (128, 2), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (128, 2), 1)
    return ((r & 1) == c).astype(jnp.bfloat16)


def _hilo_dot(a, E):
    """f32 [N, K] @ bf16 selector [K, M] -> f32, via hi + lo-residual bf16 passes.

    Splitting a into bf16 hi and f32-residual-rounded-to-bf16 lo recovers
    ~2^-22 relative accuracy (measured 5e-6 max rel vs the exact VPU
    reduction) while keeping both passes on the MXU.
    """
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(
        hi, E, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(lo, E, dn, preferred_element_type=jnp.float32)


def _mxu_cols(spec):
    """Per-level one-hot column budget for the dense-level MXU scatter.

    Level l is MXU-eligible iff it is dense and its padded row count fits
    both the budget and the per-level table block. Eligibility is a PREFIX
    of the levels (scales grow monotonically), which lets the kernel branch
    on the pair index.
    """
    cols = []
    for level in spec.levels:
        n = level.blocks_axis**3
        npad = -(-n // 128) * 128
        if level.dense and npad <= min(MXU_MAX_COLS, spec.blocks_per_level):
            cols.append(npad)
        else:
            break
    return tuple(cols)


def _prep_inputs(x, spec):
    """XLA-side per-level prep.

    Returns:
        rows: [L * Q] int32 within-level block row ids (flat, chunk-indexed).
        locfrac: [L, 4, Q] float32 = (px, py, pz, row_id) per query — the
            in-block position plus the row id replicated as f32 (exact below
            2^24) for the backward's vector one-hot compare.
    """
    rows, lf = [], []
    for level in spec.levels:
        pos = x.astype(jnp.float32) * level.scale + 0.5
        cell = jnp.floor(pos)
        frac = pos - cell
        cell = jnp.clip(cell.astype(jnp.int32), 0, level.max_cell)
        block = cell // bh.CELLS_PER_BLOCK
        local = cell - block * bh.CELLS_PER_BLOCK
        if level.dense:
            nb = level.blocks_axis
            idx = ((block[:, 0] * nb + block[:, 1]) * nb + block[:, 2]).astype(
                jnp.uint32
            )
        else:
            b = block.astype(jnp.uint32)
            idx = (
                b[:, 0] * np.uint32(bh._HASH_PRIMES[0])
                ^ b[:, 1] * np.uint32(bh._HASH_PRIMES[1])
                ^ b[:, 2] * np.uint32(bh._HASH_PRIMES[2])
            )
        rid = (idx % np.uint32(spec.blocks_per_level)).astype(jnp.int32)
        rows.append(rid)
        # in-block continuous position p = local + frac; trilinear weight along
        # an axis is then simply relu(1 - |corner - p|)
        pos_in_block = local.astype(jnp.float32) + frac
        lf.append(
            jnp.concatenate(
                [pos_in_block.T, rid[None, :].astype(jnp.float32)], axis=0
            )
        )  # [4, Q]
    return jnp.concatenate(rows), jnp.stack(lf)


def _lane_weights(pos_in_block):
    """[CHUNK, 4] (px, py, pz, *) -> [CHUNK, 128] trilinear lane row.

    Per axis the weight of corner s for in-block position p is the tent
    function relu(1 - |s - p|): 1-frac at the floor corner, frac at the
    ceil corner, 0 elsewhere — one fused VPU expression per axis. Column 3
    (the row id) is ignored.
    """
    n = pos_in_block.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
    sx = (lane >> 5).astype(jnp.float32)
    sy = ((lane >> 3) & 3).astype(jnp.float32)
    sz = ((lane >> 1) & 3).astype(jnp.float32)
    w = jnp.ones((n, 128), jnp.float32)
    for a, s in ((0, sx), (1, sy), (2, sz)):
        p = pos_in_block[:, a : a + 1]
        w = w * jnp.maximum(1.0 - jnp.abs(s - p), 0.0)
    return w


def _onehot_T(row_ids_f32, ncols):
    """E^T[r, q] = 1 iff rows[q] == r — exact 0/1 in bf16. row_ids: [CHUNK] f32."""
    r = jax.lax.broadcasted_iota(jnp.int32, (ncols, row_ids_f32.shape[0]), 0)
    ids = row_ids_f32[None, :].astype(jnp.int32)
    return (r == ids).astype(jnp.bfloat16)


# ------------------------------------------------------------------ forward


def _fwd_kernel_group(group, idx_refs, lf_ref, table_ref, out_ref, rows_scratch):
    """GROUP-level forward body: one grid step serves `group` levels.

    The independent row fetches per loop iteration interleave in the scalar
    pipeline, amortising every loop/bookkeeping cycle over `group` rows.
    idx streams are pre-offset so each indexes its level within the
    group-level table block.
    """

    def body(b, _):
        q0 = b * UNROLL
        for u in range(UNROLL):
            for k in range(group):
                rows_scratch[k, q0 + u, :] = table_ref[idx_refs[k][q0 + u], :]
        return 0

    jax.lax.fori_loop(0, CHUNK // UNROLL, body, 0)

    E = _eo_selector()
    for lvl in range(group):
        lf = jnp.transpose(lf_ref[lvl], (1, 0))  # [CHUNK, 4]
        W = _lane_weights(lf)  # [CHUNK, 128]
        prod = rows_scratch[lvl] * W
        feats = _hilo_dot(prod, E)  # [CHUNK, 2] MXU lane reduction
        out_ref[lvl, :, :] = jnp.transpose(feats, (1, 0))  # [2, CHUNK]


@functools.partial(jax.jit, static_argnames=("spec",))
def encode_fwd_pallas(x, table, spec):
    """x: [Q, 3] in [0,1]; table: [L*B, 128] -> [Q, L*2] features."""
    rows, lf, Q = prep_inputs_padded(x, spec)
    return _fwd_from_prep(rows, lf, table, Q, spec)


def prep_inputs_padded(x, spec):
    """Public prep: pad to CHUNK and build (rows, lf) once for fwd + bwd."""
    Q = x.shape[0]
    pad = (-Q) % CHUNK
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    rows, lf = _prep_inputs(xp, spec)
    return rows, lf, Q


def _offset_rows(rows, L, Qp, B, group):
    """Pre-offset row ids so stream k of a group indexes level k's sub-table."""
    rows_g = rows.reshape(L, Qp)
    rows_g = rows_g + (jnp.arange(L, dtype=jnp.int32) % group)[:, None] * np.int32(B)
    return rows_g.reshape(-1)


@functools.partial(jax.jit, static_argnames=("Q", "spec", "interpret"))
def _fwd_from_prep(rows, lf, table, Q, spec, interpret=False):
    Qp = lf.shape[-1]
    L = spec.num_levels
    B = spec.blocks_per_level

    assert L % 2 == 0, "the grouped-level kernels require an even level count"
    group = 4 if L % 4 == 0 else 2
    nchunks = Qp // CHUNK
    rows_g = _offset_rows(rows, L, Qp, B, group)

    def idx_spec(k):
        return pl.BlockSpec(
            (CHUNK,),
            functools.partial(lambda k, p, i: ((group * p + k) * nchunks + i,), k),
            memory_space=pltpu.SMEM,
        )

    def kernel(*refs):
        idx_refs = refs[:group]
        lf_ref, table_ref, out_ref, rows_scratch = refs[group:]
        _fwd_kernel_group(group, idx_refs, lf_ref, table_ref, out_ref, rows_scratch)

    out = pl.pallas_call(
        kernel,
        grid=(L // group, nchunks),
        in_specs=[idx_spec(k) for k in range(group)]
        + [
            pl.BlockSpec(
                (group, 4, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((group * B, 128), lambda p, i: (p, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (group, 2, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, 2, Qp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((group, CHUNK, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*([rows_g] * group), lf, table)
    # [L, 2, Qp] -> [Qp, L*2]
    return jnp.transpose(out, (2, 0, 1)).reshape(Qp, L * 2)[:Q]


encode_fwd_from_prep = _fwd_from_prep


# ----------------------------------------------------------------- backward


def _make_bwd_kernel(spec, shards, mxu_cols):
    """Paired-level backward: grid step (p, i) accumulates levels (2p, 2p+1).

    Scalar path: two independent RMW chains per iteration (different level
    sub-tables) pipeline alongside the shard interleaving into the scratch
    accumulator. Dense coarse pairs (both levels in `mxu_cols`) instead
    scatter on the MXU via exact one-hot matmuls into shard copy 0.
    """
    B = spec.blocks_per_level
    # pairs whose BOTH levels are MXU-eligible (eligibility is a level prefix)
    n_mxu_pairs = len(mxu_cols) // 2

    def kernel(idx0_ref, idx1_ref, lf_ref, g_ref, out_ref, rows_scratch, acc):
        p = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        ET = _eo_selector(transposed=True)
        for lvl in range(2):
            lf = jnp.transpose(lf_ref[lvl, :4], (1, 0))  # [CHUNK, 4]
            W = _lane_weights(lf)  # [CHUNK, 128]
            g = jnp.transpose(g_ref[lvl], (1, 0))  # [CHUNK, 2]
            g_lane = _hilo_dot(g, ET)  # [CHUNK, 128] MXU lane broadcast
            rows_scratch[lvl] = W * g_lane

        for pp in range(n_mxu_pairs):

            @pl.when(p == pp)
            def _(pp=pp):
                for lvl in range(2):
                    n = mxu_cols[2 * pp + lvl]
                    Eoh = _onehot_T(lf_ref[lvl, 3, :], n)  # [n, CHUNK] 0/1
                    gr = rows_scratch[lvl]  # [CHUNK, 128] f32
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
            # CHUNK % shards leftover rows, statically unrolled (one per copy)
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

    return kernel


@functools.partial(jax.jit, static_argnames=("spec",))
def encode_bwd_pallas(x, g, spec):
    """x: [Q, 3]; g: [Q, L*2] feature grads -> grad table [L*B, 128]."""
    rows, lf, _ = prep_inputs_padded(x, spec)
    return _bwd_from_prep(rows, lf, g, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def _bwd_from_prep(rows, lf, g, spec):
    Qp = lf.shape[-1]
    Q = g.shape[0]
    gp = jnp.pad(g.astype(jnp.float32), ((0, Qp - Q), (0, 0)))
    L = spec.num_levels
    B = spec.blocks_per_level
    g_levels = gp.reshape(Qp, L, 2).transpose(1, 2, 0)  # [L, 2, Qp]

    assert L % 2 == 0, "the grouped-level kernels require an even level count"
    nchunks = Qp // CHUNK
    rows2 = _offset_rows(rows, L, Qp, B, 2)
    kernel = _make_bwd_kernel(spec, SHARDS, _mxu_cols(spec))
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
            pltpu.VMEM((SHARDS, 2 * B, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(rows2, rows2, lf, g_levels)


encode_bwd_from_prep = _bwd_from_prep


# ------------------------------------------------- segmented (run-skipping)
#
# Consecutive queries in the real workload are consecutive samples along a
# ray, so the same block row repeats for long runs at coarse/mid levels
# (measured avg run at KITTI parity: 305/174/100/60/36/23/13/8/5/3/2 for
# levels 0-10; tools/exp_kernels4.py). These kernels walk *segments* with
# dynamic-bound loops — one table fetch (fwd) or one accumulator RMW (bwd)
# per run, one store / in-register add per query — with a per-chunk dynamic
# fallback to the plain per-query loop when the chunk is incoherent
# (nseg > CHUNK // NSEG_DIV), so shuffled inputs degrade gracefully and
# never lose correctness. Numerics: fwd is bit-exact vs the plain kernel;
# bwd re-associates the per-row sum (measured 4.6e-7 rel vs plain).


def seg_next(rows, L, Qp):
    """rows: [L*Qp] int32 within-level row ids -> (next [L*C, CHUNK], nseg [L*C]).

    next[q] = first q' > q in the same chunk with rows[q'] != rows[q], else
    CHUNK. Built with a reverse cumulative min over flagged positions —
    vectorized, no scatter/sort. Uses the lax.cummin primitive: the
    equivalent associative_scan lowering hangs the TPU compiler on the
    tunneled backend (round-3 finding), and cummin also kills the flips.
    """
    C = Qp // CHUNK
    r = rows.reshape(L * C, CHUNK)
    flag = jnp.concatenate(
        [jnp.ones_like(r[:, :1], jnp.bool_), r[:, 1:] != r[:, :-1]], axis=1
    )
    q = jnp.arange(CHUNK, dtype=jnp.int32)
    c = jnp.where(flag, q[None, :], CHUNK)
    nxt = jax.lax.cummin(c, axis=1, reverse=True)
    nxt = jnp.concatenate([nxt[:, 1:], jnp.full_like(nxt[:, :1], CHUNK)], axis=1)
    nseg = jnp.sum(flag.astype(jnp.int32), axis=1)
    return nxt, nseg


def _seg_patterns(spec, group):
    """Static (seg-eligible?) pattern per level group, collapsed to classes."""
    seg_ok = tuple(lev.scale <= SEG_SCALE_MAX for lev in spec.levels)
    patterns = {}
    for g in range(spec.num_levels // group):
        pat = tuple(seg_ok[g * group + k] for k in range(group))
        patterns.setdefault(pat, []).append(g)
    return patterns


@functools.partial(jax.jit, static_argnames=("Q", "spec", "interpret"))
def _fwd_seg_from_prep(rows, lf, nxt, nseg, table, Q, spec, interpret=False):
    Qp = lf.shape[-1]
    L = spec.num_levels
    B = spec.blocks_per_level
    assert L % 2 == 0, "the grouped-level kernels require an even level count"
    group = 4 if L % 4 == 0 else 2
    nchunks = Qp // CHUNK
    rows_g = _offset_rows(rows, L, Qp, B, group)
    patterns = _seg_patterns(spec, group)

    def kernel(*refs, nchunks_s):
        idx_refs = refs[:group]
        next_refs = refs[group : 2 * group]
        nseg_ref, lf_ref, table_ref, out_ref, rows_scratch = refs[2 * group :]
        p = pl.program_id(0)
        i = pl.program_id(1)

        for pat, gs in patterns.items():
            cond = p == gs[0]
            for g2 in gs[1:]:
                cond = cond | (p == g2)

            @pl.when(cond)
            def _(pat=pat):
                seg_levels = [k for k in range(group) if pat[k]]
                plain_levels = [k for k in range(group) if not pat[k]]

                if plain_levels:

                    def body(b, _):
                        q0 = b * UNROLL
                        for u in range(UNROLL):
                            for k in plain_levels:
                                rows_scratch[k, q0 + u, :] = table_ref[
                                    idx_refs[k][q0 + u], :
                                ]
                        return 0

                    jax.lax.fori_loop(0, CHUNK // UNROLL, body, 0)

                for k in seg_levels:
                    nseg_k = nseg_ref[(group * p + k) * nchunks_s + i]

                    @pl.when(nseg_k <= CHUNK // NSEG_DIV)
                    def _(k=k):
                        def cond_s(s):
                            return s < CHUNK

                        def body_s(s):
                            e = next_refs[k][s]
                            r = table_ref[idx_refs[k][s], :]

                            def inner(qq, rr):
                                rows_scratch[k, qq, :] = rr
                                return rr

                            jax.lax.fori_loop(s, e, inner, r)
                            # forced progress: corrupt next[] may mis-time
                            # but must never hang the chip
                            return jnp.maximum(e, s + 1)

                        jax.lax.while_loop(cond_s, body_s, 0)

                    @pl.when(nseg_k > CHUNK // NSEG_DIV)
                    def _(k=k):
                        def body(b, _):
                            q0 = b * UNROLL
                            for u in range(UNROLL):
                                rows_scratch[k, q0 + u, :] = table_ref[
                                    idx_refs[k][q0 + u], :
                                ]
                            return 0

                        jax.lax.fori_loop(0, CHUNK // UNROLL, body, 0)

        E = _eo_selector()
        for lvl in range(group):
            lf_l = jnp.transpose(lf_ref[lvl, :4], (1, 0))
            W = _lane_weights(lf_l)
            feats = _hilo_dot(rows_scratch[lvl] * W, E)
            out_ref[lvl, :, :] = jnp.transpose(feats, (1, 0))

    def stream_spec(k, width, stride):
        return pl.BlockSpec(
            (width,),
            functools.partial(lambda k, p, i: ((stride * p + k) * nchunks + i,), k),
            memory_space=pltpu.SMEM,
        )

    out = pl.pallas_call(
        functools.partial(kernel, nchunks_s=nchunks),
        grid=(L // group, nchunks),
        in_specs=[stream_spec(k, CHUNK, group) for k in range(group)]
        + [stream_spec(k, CHUNK, group) for k in range(group)]
        + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (group, 4, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((group * B, 128), lambda p, i: (p, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (group, 2, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, 2, Qp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((group, CHUNK, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*([rows_g] * group), *([nxt.reshape(-1)] * group), nseg, lf, table)
    return jnp.transpose(out, (2, 0, 1)).reshape(Qp, L * 2)[:Q]


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def _bwd_seg_from_prep(rows, lf, nxt, nseg, g, spec, interpret=False):
    Qp = lf.shape[-1]
    Q = g.shape[0]
    gp = jnp.pad(g.astype(jnp.float32), ((0, Qp - Q), (0, 0)))
    L = spec.num_levels
    B = spec.blocks_per_level
    g_levels = gp.reshape(Qp, L, 2).transpose(1, 2, 0)
    assert L % 2 == 0, "the grouped-level kernels require an even level count"
    nchunks = Qp // CHUNK
    rows2 = _offset_rows(rows, L, Qp, B, 2)
    mxu_cols = _mxu_cols(spec)
    n_mxu_pairs = len(mxu_cols) // 2
    seg_ok = tuple(lev.scale <= SEG_SCALE_MAX for lev in spec.levels)
    shards = SHARDS

    bpatterns = {}
    for pair in range(n_mxu_pairs, L // 2):
        pat = (seg_ok[2 * pair], seg_ok[2 * pair + 1])
        bpatterns.setdefault(pat, []).append(pair)

    def kernel(idx0_ref, idx1_ref, next0_ref, next1_ref, nseg_ref, lf_ref, g_ref,
               out_ref, rows_scratch, acc, *, nchunks_s):
        p = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        ET = _eo_selector(transposed=True)
        for lvl in range(2):
            lf_l = jnp.transpose(lf_ref[lvl, :4], (1, 0))
            W = _lane_weights(lf_l)
            g_l = jnp.transpose(g_ref[lvl], (1, 0))
            g_lane = _hilo_dot(g_l, ET)
            rows_scratch[lvl] = W * g_lane

        for pp in range(n_mxu_pairs):

            @pl.when(p == pp)
            def _(pp=pp):
                for lvl in range(2):
                    n = mxu_cols[2 * pp + lvl]
                    Eoh = _onehot_T(lf_ref[lvl, 3, :], n)
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

        idx_r = (idx0_ref, idx1_ref)
        next_r = (next0_ref, next1_ref)
        for pat, prs in bpatterns.items():
            cond = p == prs[0]
            for p2 in prs[1:]:
                cond = cond | (p == p2)

            @pl.when(cond)
            def _(pat=pat):
                for lvl in range(2):
                    if not pat[lvl]:
                        continue
                    nseg_k = nseg_ref[(2 * p + lvl) * nchunks_s + i]

                    @pl.when(nseg_k <= CHUNK // NSEG_DIV)
                    def _(lvl=lvl):
                        def cond_s(s):
                            return s < CHUNK

                        def body_s(s):
                            e = next_r[lvl][s]

                            def inner(qq, a):
                                return a + rows_scratch[lvl, qq, :]

                            a = jax.lax.fori_loop(
                                s, e, inner, jnp.zeros((128,), jnp.float32)
                            )
                            r0 = idx_r[lvl][s]
                            acc[0, r0, :] = acc[0, r0, :] + a
                            return jnp.maximum(e, s + 1)

                        jax.lax.while_loop(cond_s, body_s, 0)

                    @pl.when(nseg_k > CHUNK // NSEG_DIV)
                    def _(lvl=lvl):
                        nbody = CHUNK // shards

                        def body(b, _):
                            q0 = b * shards
                            for u in range(shards):
                                i0 = idx_r[lvl][q0 + u]
                                acc[u, i0, :] = acc[u, i0, :] + rows_scratch[
                                    lvl, q0 + u, :
                                ]
                            return 0

                        jax.lax.fori_loop(0, nbody, body, 0)

                plain = [l for l in range(2) if not pat[l]]
                if plain:
                    nbody = CHUNK // shards

                    def body(b, _):
                        q0 = b * shards
                        for u in range(shards):
                            for l in plain:
                                ii = idx_r[l][q0 + u]
                                acc[u, ii, :] = acc[u, ii, :] + rows_scratch[
                                    l, q0 + u, :
                                ]
                        return 0

                    jax.lax.fori_loop(0, nbody, body, 0)

        @pl.when(i == pl.num_programs(1) - 1)
        def _():
            total = acc[0]
            for u in range(1, shards):
                total = total + acc[u]
            out_ref[:] = total

    def stream_spec(k, width):
        return pl.BlockSpec(
            (width,),
            functools.partial(lambda k, p, i: ((2 * p + k) * nchunks + i,), k),
            memory_space=pltpu.SMEM,
        )

    return pl.pallas_call(
        functools.partial(kernel, nchunks_s=nchunks),
        grid=(L // 2, nchunks),
        in_specs=[
            stream_spec(0, CHUNK),
            stream_spec(1, CHUNK),
            stream_spec(0, CHUNK),
            stream_spec(1, CHUNK),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 4, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * B, 128), lambda p, i: (p, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L * B, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, 128), jnp.float32),
            pltpu.VMEM((SHARDS, 2 * B, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(rows2, rows2, nxt.reshape(-1), nxt.reshape(-1), nseg, lf, g_levels)


# ------------------------------------------------- windowed (run-collapsing)
#
# Second attempt at exploiting ray coherence after the segmented kernels
# (above) measured 2x SLOWER on hardware: their data-dependent while/fori
# loop bounds do not pipeline on the in-order scalar core. The windowed
# kernels keep every loop trip-count STATIC and instead take one scalar
# branch per fixed window of w consecutive queries: a precomputed flag says
# whether all w queries hit the same block row, and if so the window's row
# work collapses to
#   forward:  1 fetch + one [w, 128] broadcast tile store   (vs w fetch+store)
#   backward: one [w, 128] tile load + sublane reduce + 1 RMW (vs w RMWs)
# with the plain per-query loop as the in-line else-branch, so shuffled
# streams degrade by one predictable branch per window and never lose
# correctness. Window sizes are chosen statically per level from the level
# scale (coarser level => longer expected run; measured mean runs at KITTI
# parity: 216/89/55/34/22/13/8/5/3/2 for levels 1..10): w=8 below scale
# 260, w=4 below 700, w=2 below 2700, else the plain loop. Flags for all
# three granularities are packed into one int32 per 8-query window (bit 0:
# uniform-8; bits 1-2: the two uniform-4 halves; bits 3-6: the four
# uniform-2 quarters), so a single SMEM stream per level serves every
# class. Numerics: forward is bit-exact (same fetched row); backward
# reassociates the per-window sum (tree reduce before the accumulate).

WIN_SCALE_8 = 260.0
WIN_SCALE_4 = 700.0
WIN_SCALE_2 = 2700.0
WB = 8  # flag-packing / body granularity (queries per scalar-loop body)


def _win_of_level(scale):
    if scale <= WIN_SCALE_8:
        return 8
    if scale <= WIN_SCALE_4:
        return 4
    if scale <= WIN_SCALE_2:
        return 2
    return 1


def pack_win_flags(rows, L, Qp):
    """rows: [L*Qp] int32 -> [L*Qp] int32 packed uniformity masks.

    flag[i] bits (the kernel reads the flag at the END of a window, index
    qs + w - 1):
      bit 0: the 8 queries ending at i share one block row (uniform-8)
      bit 1: the 4 queries ending at i are uniform          (uniform-4)
      bit 2: the 2 queries ending at i are uniform          (uniform-2)
    Built from lane-shifted ANDs of the adjacent-equality mask at FULL
    resolution: a [*, WB]-minor reshape layout tile-pads 16x and measured
    45.6 ms of XLA time, and a Qp/WB-wide SMEM stream violates the s32
    T(1024) layout Mosaic requires — full-width masks fix both for a
    handful of VPU passes.
    """
    r = rows.reshape(L * (Qp // CHUNK), CHUNK)
    e = jnp.concatenate(
        [jnp.zeros_like(r[:, :1], jnp.bool_), r[:, 1:] == r[:, :-1]], axis=1
    )  # e[i]: r[i] == r[i-1] (False at chunk start: windows never straddle)

    def sh(m, k):  # m[i-k], False-filled at the chunk start
        return jnp.concatenate([jnp.zeros_like(m[:, :k]), m[:, :-k]], axis=1)

    u2 = e
    u4 = e & sh(e, 1) & sh(e, 2)  # 3 adjacent eqs ending at i
    u8 = u4 & sh(e, 3) & sh(u4, 4)  # 7 adjacent eqs ending at i
    return (
        u8.astype(jnp.int32) + u4.astype(jnp.int32) * 2 + u2.astype(jnp.int32) * 4
    ).reshape(-1)


def _win_bit(w):
    """Flag bit for a uniform window of size w (read at index qs + w - 1)."""
    return {8: 1, 4: 2, 2: 4}[w]


def _wins_patterns(spec, group, skip_pairs=0):
    """Map pl.program_id(0) -> static per-level window tuple, collapsed to
    pattern classes so distinct tuples each get one specialized body."""
    patterns = {}
    for g in range(skip_pairs, spec.num_levels // group):
        pat = tuple(
            _win_of_level(spec.levels[g * group + k].scale) for k in range(group)
        )
        patterns.setdefault(pat, []).append(g)
    return patterns


def _fwd_win_body(group, wins, idx_refs, flag_refs, table_ref, rows_scratch):
    """Slot-interleaved windowed fetch phase for one level group."""

    def body(b, _):
        q0 = b * WB
        for j in range(WB):
            for k in range(group):
                w = wins[k]
                if w == 1:
                    rows_scratch[k, q0 + j, :] = table_ref[idx_refs[k][q0 + j], :]
                elif j % w == 0:
                    bit = _win_bit(w)
                    qs = q0 + j
                    f = flag_refs[k][qs + w - 1]

                    @pl.when((f & bit) != 0)
                    def _(k=k, qs=qs, w=w):
                        r = table_ref[idx_refs[k][qs], :]
                        rows_scratch[k, pl.ds(qs, w), :] = jnp.broadcast_to(
                            r[None, :], (w, 128)
                        )

                    @pl.when((f & bit) == 0)
                    def _(k=k, qs=qs, w=w):
                        for u in range(w):
                            rows_scratch[k, qs + u, :] = table_ref[
                                idx_refs[k][qs + u], :
                            ]
        return 0

    jax.lax.fori_loop(0, CHUNK // WB, body, 0)


@functools.partial(jax.jit, static_argnames=("Q", "spec", "interpret"))
def _fwd_win_from_prep(rows, lf, flags, table, Q, spec, interpret=False):
    Qp = lf.shape[-1]
    L = spec.num_levels
    B = spec.blocks_per_level
    assert L % 2 == 0, "the grouped-level kernels require an even level count"
    group = 4 if L % 4 == 0 else 2
    nchunks = Qp // CHUNK
    rows_g = _offset_rows(rows, L, Qp, B, group)
    patterns = _wins_patterns(spec, group)

    def kernel(*refs):
        idx_refs = refs[:group]
        flag_refs = refs[group : 2 * group]
        lf_ref, table_ref, out_ref, rows_scratch = refs[2 * group :]
        p = pl.program_id(0)

        for pat, gs in patterns.items():
            cond = p == gs[0]
            for g2 in gs[1:]:
                cond = cond | (p == g2)

            if all(w == 1 for w in pat):

                @pl.when(cond)
                def _():
                    # plain interleaved fetch loop (identical to the
                    # non-windowed kernel's phase 1)
                    def body(b, _):
                        q0 = b * UNROLL
                        for u in range(UNROLL):
                            for k in range(group):
                                rows_scratch[k, q0 + u, :] = table_ref[
                                    idx_refs[k][q0 + u], :
                                ]
                        return 0

                    jax.lax.fori_loop(0, CHUNK // UNROLL, body, 0)

            else:

                @pl.when(cond)
                def _(pat=pat):
                    _fwd_win_body(
                        group, pat, idx_refs, flag_refs, table_ref, rows_scratch
                    )

        E = _eo_selector()
        for lvl in range(group):
            lf_l = jnp.transpose(lf_ref[lvl], (1, 0))
            W = _lane_weights(lf_l)
            feats = _hilo_dot(rows_scratch[lvl] * W, E)
            out_ref[lvl, :, :] = jnp.transpose(feats, (1, 0))

    def stream_spec(k, width, stride):
        return pl.BlockSpec(
            (width,),
            functools.partial(lambda k, p, i: ((stride * p + k) * nchunks + i,), k),
            memory_space=pltpu.SMEM,
        )

    out = pl.pallas_call(
        kernel,
        grid=(L // group, nchunks),
        in_specs=[stream_spec(k, CHUNK, group) for k in range(group)]
        + [stream_spec(k, CHUNK, group) for k in range(group)]
        + [
            pl.BlockSpec(
                (group, 4, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((group * B, 128), lambda p, i: (p, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (group, 2, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, 2, Qp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((group, CHUNK, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*([rows_g] * group), *([flags] * group), lf, table)
    return jnp.transpose(out, (2, 0, 1)).reshape(Qp, L * 2)[:Q]


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def _bwd_win_from_prep(rows, lf, flags, g, spec, interpret=False):
    Qp = lf.shape[-1]
    Q = g.shape[0]
    gp = jnp.pad(g.astype(jnp.float32), ((0, Qp - Q), (0, 0)))
    L = spec.num_levels
    B = spec.blocks_per_level
    g_levels = gp.reshape(Qp, L, 2).transpose(1, 2, 0)
    assert L % 2 == 0, "the grouped-level kernels require an even level count"
    nchunks = Qp // CHUNK
    rows2 = _offset_rows(rows, L, Qp, B, 2)
    mxu_cols = _mxu_cols(spec)
    n_mxu_pairs = len(mxu_cols) // 2
    shards = SHARDS
    patterns = _wins_patterns(spec, 2, skip_pairs=n_mxu_pairs)

    def kernel(idx0_ref, idx1_ref, flag0_ref, flag1_ref, lf_ref, g_ref, out_ref,
               rows_scratch, acc):
        p = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        ET = _eo_selector(transposed=True)
        for lvl in range(2):
            lf_l = jnp.transpose(lf_ref[lvl], (1, 0))
            W = _lane_weights(lf_l)
            g_l = jnp.transpose(g_ref[lvl], (1, 0))
            g_lane = _hilo_dot(g_l, ET)
            rows_scratch[lvl] = W * g_lane

        for pp in range(n_mxu_pairs):

            @pl.when(p == pp)
            def _(pp=pp):
                for lvl in range(2):
                    n = mxu_cols[2 * pp + lvl]
                    Eoh = _onehot_T(lf_ref[lvl, 3, :], n)
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

        idx_r = (idx0_ref, idx1_ref)
        flag_r = (flag0_ref, flag1_ref)
        for pat, prs in patterns.items():
            cond = p == prs[0]
            for p2 in prs[1:]:
                cond = cond | (p == p2)

            if all(w == 1 for w in pat):

                @pl.when(cond)
                def _():
                    # plain shard-interleaved RMW loop
                    def body(b, _):
                        q0 = b * shards
                        for u in range(shards):
                            i0 = idx_r[0][q0 + u]
                            i1 = idx_r[1][q0 + u]
                            acc[u, i0, :] = acc[u, i0, :] + rows_scratch[0, q0 + u, :]
                            acc[u, i1, :] = acc[u, i1, :] + rows_scratch[1, q0 + u, :]
                        return 0

                    jax.lax.fori_loop(0, CHUNK // shards, body, 0)
                    for u in range(CHUNK - (CHUNK // shards) * shards):
                        q = (CHUNK // shards) * shards + u
                        i0 = idx_r[0][q]
                        i1 = idx_r[1][q]
                        acc[u, i0, :] = acc[u, i0, :] + rows_scratch[0, q, :]
                        acc[u, i1, :] = acc[u, i1, :] + rows_scratch[1, q, :]

            else:

                @pl.when(cond)
                def _(pat=pat):
                    def body(b, _):
                        q0 = b * WB
                        for j in range(WB):
                            for lvl in range(2):
                                w = pat[lvl]
                                # idx_r already carries the within-pair level
                                # offset (_offset_rows with group=2)
                                if w == 1:
                                    cu = (b + j) % shards
                                    ii = idx_r[lvl][q0 + j]
                                    acc[cu, ii, :] = acc[cu, ii, :] + rows_scratch[
                                        lvl, q0 + j, :
                                    ]
                                elif j % w == 0:
                                    s = j // w
                                    bit = _win_bit(w)
                                    qs = q0 + j
                                    f = flag_r[lvl][qs + w - 1]
                                    cu = (b + s) % shards

                                    @pl.when((f & bit) != 0)
                                    def _(lvl=lvl, qs=qs, w=w, cu=cu):
                                        tile = rows_scratch[lvl, pl.ds(qs, w), :]
                                        v = jnp.sum(tile, axis=0)
                                        ii = idx_r[lvl][qs]
                                        acc[cu, ii, :] = acc[cu, ii, :] + v

                                    @pl.when((f & bit) == 0)
                                    def _(lvl=lvl, qs=qs, w=w, j=j, b=b):
                                        for u in range(w):
                                            cu2 = (b + j + u) % shards
                                            ii = idx_r[lvl][qs + u]
                                            acc[cu2, ii, :] = acc[
                                                cu2, ii, :
                                            ] + rows_scratch[lvl, qs + u, :]
                        return 0

                    jax.lax.fori_loop(0, CHUNK // WB, body, 0)

        @pl.when(i == pl.num_programs(1) - 1)
        def _():
            total = acc[0]
            for u in range(1, shards):
                total = total + acc[u]
            out_ref[:] = total

    def stream_spec(k, width):
        return pl.BlockSpec(
            (width,),
            functools.partial(lambda k, p, i: ((2 * p + k) * nchunks + i,), k),
            memory_space=pltpu.SMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=(L // 2, nchunks),
        in_specs=[
            stream_spec(0, CHUNK),
            stream_spec(1, CHUNK),
            stream_spec(0, CHUNK),
            stream_spec(1, CHUNK),
            pl.BlockSpec((2, 4, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, CHUNK), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * B, 128), lambda p, i: (p, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L * B, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, 128), jnp.float32),
            pltpu.VMEM((SHARDS, 2 * B, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(rows2, rows2, flags, flags, lf, g_levels)
