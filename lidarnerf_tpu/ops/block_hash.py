"""Block-hash multiresolution grid encoder — the TPU-native hash grid.

This is the load-bearing TPU redesign of the instant-ngp hash encoding (the
role played by gridencoder.cu / tcnn's HashGrid in the reference). The
reference's layout — one table row per *corner*, 8 scattered 8-byte lookups
per (sample, level) — is built for GPU L2 caches; on TPU it compiles to
per-row gathers/scatters that run ~2 orders of magnitude below HBM speed
(measured: XLA gather 80M rows/s, scatter 9M rows/s).

Design (one lookup per sample per level, tile-shaped rows):

- Each level's corner grid is tiled into BLOCKS of 3x3x3 cells = 4x4x4 = 64
  corners. A block row stores its 64 corners x 2 channels = 128 float32 —
  exactly one TPU (1, 128) lane row.
- A cell's 8 trilinear corners always live inside its own block (cells
  [3b, 3b+3) use corners [3b, 3b+3]), so every (sample, level) needs exactly
  ONE row fetch.
- Coarse levels index blocks densely; fine levels hash the block coordinate
  with the same prime-XOR as the reference (gridencoder.cu:53-67) into a
  fixed budget of 2^log2_hashmap_size / 64 blocks per level, so the parameter
  budget matches the reference's.
- Trilinear interpolation becomes a dense contraction over the 128-lane row:
  W = repeat(wx,32) * tile(repeat(wy,8),4) * tile(repeat(wz,2),16) selects the
  8 corners via static lane patterns — pure VPU, no gather.

Tradeoffs vs the reference layout (documented, deliberate):
- corners shared by adjacent blocks are stored (and trained) independently, so
  the encoded field may be mildly discontinuous across block seams (the MLP
  absorbs this, like it absorbs the reference's hash collisions);
- hash collisions occur at block granularity.

The Pallas kernels (block_hash_pallas.py) stream query chunks against
VMEM-resident level tables: forward = quad-stream scalar row fetch +
vectorised lerp (~365M rows/s), backward = scratch-sharded accumulate with an
MXU one-hot scatter for dense coarse levels (~231M rows/s), ~300x the XLA
scatter path this replaces.
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

_HASH_PRIMES = (1, 2654435761, 805459861)

CELLS_PER_BLOCK = 3  # cells per block axis
CORNERS_PER_BLOCK = 4  # corners per block axis
ROW_WIDTH = 128  # 4^3 corners * 2 channels
LEVEL_DIM = 2


@dataclass(frozen=True)
class _Level:
    scale: float
    max_cell: int  # largest cell index reachable from x in [0, 1]
    blocks_axis: int  # dense block-grid extent
    dense: bool


@dataclass(frozen=True)
class BlockHashSpec:
    num_levels: int = 16
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    per_level_scale: float = 2.0
    levels: tuple = ()

    @property
    def blocks_per_level(self) -> int:
        # parameter budget matches the reference: 2^log2 corner entries/level
        return max(8, 2**self.log2_hashmap_size // (CORNERS_PER_BLOCK**3))

    @property
    def level_dim(self) -> int:
        return LEVEL_DIM

    @property
    def output_dim(self) -> int:
        return self.num_levels * LEVEL_DIM

    @property
    def table_rows(self) -> int:
        return self.num_levels * self.blocks_per_level


def make_block_hash_spec(
    num_levels=16,
    base_resolution=16,
    log2_hashmap_size=19,
    desired_resolution=None,
    per_level_scale=2.0,
) -> BlockHashSpec:
    if desired_resolution is not None:
        if num_levels > 1:
            per_level_scale = float(
                np.exp2(
                    np.log2(desired_resolution / base_resolution) / (num_levels - 1)
                )
            )
        else:
            per_level_scale = 1.0
    spec = BlockHashSpec(
        num_levels=num_levels,
        base_resolution=base_resolution,
        log2_hashmap_size=log2_hashmap_size,
        per_level_scale=per_level_scale,
    )
    S = np.log2(per_level_scale)
    levels = []
    for lvl in range(num_levels):
        # same per-level scale law as the reference kernel (gridencoder.cu:147)
        scale = float(np.exp2(lvl * S) * base_resolution - 1.0)
        max_cell = int(np.floor(scale + 0.5))
        blocks_axis = max_cell // CELLS_PER_BLOCK + 1
        dense = blocks_axis**3 <= spec.blocks_per_level
        levels.append(_Level(scale, max_cell, blocks_axis, dense))
    return BlockHashSpec(
        num_levels=num_levels,
        base_resolution=base_resolution,
        log2_hashmap_size=log2_hashmap_size,
        per_level_scale=per_level_scale,
        levels=tuple(levels),
    )


def block_hash_init(key, spec: BlockHashSpec, dtype=jnp.float32):
    """Uniform(-1e-4, 1e-4), matching the reference embedding init."""
    return jax.random.uniform(
        key, (spec.table_rows, ROW_WIDTH), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


# ---------------------------------------------------------------- indexing


def level_indices_and_weights(x01, level: _Level, level_idx: int, spec: BlockHashSpec):
    """Per-level row index + per-axis interpolation weight vectors.

    Args:
        x01: [Q, 3] in [0, 1].

    Returns:
        rows: [Q] int32 row index into the flat table.
        w: [Q, 12] = concat(wx4, wy4, wz4) per-axis 4-vectors whose outer
           product (restricted by the static lane patterns) is the 64-corner
           trilinear weight row.
    """
    pos = x01.astype(jnp.float32) * level.scale + 0.5
    cell = jnp.floor(pos)
    frac = pos - cell
    cell = cell.astype(jnp.int32)
    cell = jnp.clip(cell, 0, level.max_cell)
    block = cell // CELLS_PER_BLOCK
    local = cell - block * CELLS_PER_BLOCK  # in [0, 2]

    if level.dense:
        nb = level.blocks_axis
        idx = (block[:, 0] * nb + block[:, 1]) * nb + block[:, 2]
        idx = idx.astype(jnp.uint32)
    else:
        b = block.astype(jnp.uint32)
        idx = (
            b[:, 0] * np.uint32(_HASH_PRIMES[0])
            ^ b[:, 1] * np.uint32(_HASH_PRIMES[1])
            ^ b[:, 2] * np.uint32(_HASH_PRIMES[2])
        )
    idx = (idx % np.uint32(spec.blocks_per_level)).astype(jnp.int32)
    rows = idx + np.int32(level_idx * spec.blocks_per_level)

    # per-axis weight 4-vectors: nonzero at lanes local and local+1
    lanes = jnp.arange(CORNERS_PER_BLOCK, dtype=jnp.int32)[None, :]  # [1, 4]
    ws = []
    for a in range(3):
        lo = local[:, a : a + 1]
        f = frac[:, a : a + 1]
        w4 = jnp.where(lanes == lo, 1.0 - f, 0.0) + jnp.where(lanes == lo + 1, f, 0.0)
        ws.append(w4)
    return rows, jnp.concatenate(ws, axis=-1)  # [Q, 12]


def lane_weight_row(w12):
    """[Q, 12] per-axis weights -> [Q, 128] per-lane weight row.

    Lane j holds corner (sx, sy, sz) channel c with
    j = ((sx*4 + sy)*4 + sz)*2 + c, i.e. sx = j>>5, sy = (j>>3)&3,
    sz = (j>>1)&3 — which the static repeat/tile patterns below realise
    without any gather.
    """
    wx, wy, wz = w12[:, 0:4], w12[:, 4:8], w12[:, 8:12]
    wx_l = jnp.repeat(wx, 32, axis=1)  # j>>5
    wy_l = jnp.tile(jnp.repeat(wy, 8, axis=1), (1, 4))  # (j>>3)&3
    wz_l = jnp.tile(jnp.repeat(wz, 2, axis=1), (1, 16))  # (j>>1)&3
    return wx_l * wy_l * wz_l


def rows_to_features(rows128, w12):
    """Contract fetched block rows with trilinear weights -> [Q, 2]."""
    W = lane_weight_row(w12)  # [Q, 128]
    prod = rows128 * W
    even = prod[:, 0::2].sum(axis=1)
    odd = prod[:, 1::2].sum(axis=1)
    return jnp.stack([even, odd], axis=-1)


# ------------------------------------------------------------- XLA fallback


def _encode_xla(x01, table, spec: BlockHashSpec):
    feats = []
    for li, level in enumerate(spec.levels):
        rows_idx, w12 = level_indices_and_weights(x01, level, li, spec)
        rows = jnp.take(table, rows_idx, axis=0)  # [Q, 128]
        feats.append(rows_to_features(rows, w12))
    return jnp.concatenate(feats, axis=-1)


# ------------------------------------------------------------- public entry


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def block_hash_encode(x01, table, spec: BlockHashSpec, use_pallas: bool = True):
    """Encode [..., 3] points in [0, 1] -> [..., num_levels * 2] features.

    Differentiable w.r.t. the table only (positions receive zero gradient —
    the renderer never needs dx, matching how the reference trains).
    """
    return _encode_impl(x01, table, spec, use_pallas)


def _encode_impl(x01, table, spec, use_pallas):
    out, _ = _encode_with_residuals(x01, table, spec, use_pallas)
    return out


def _encode_with_residuals(x01, table, spec, use_pallas):
    prefix = x01.shape[:-1]
    x = x01.reshape(-1, 3)
    if use_pallas and _on_tpu():
        from lidarnerf_tpu.ops import block_hash_pallas as bhp

        rows, lf, Q = bhp.prep_inputs_padded(x, spec)
        if bhp.SEGMENTED:
            nxt, nseg = bhp.seg_next(rows, spec.num_levels, lf.shape[-1])
            out = bhp._fwd_seg_from_prep(rows, lf, nxt, nseg, table, Q, spec)
            res = (rows, lf, nxt, nseg)
        elif bhp.WINDOWED:
            flags = bhp.pack_win_flags(rows, spec.num_levels, lf.shape[-1])
            out = bhp._fwd_win_from_prep(rows, lf, flags, table, Q, spec)
            res = (rows, lf, flags)
        else:
            out = bhp.encode_fwd_from_prep(rows, lf, table, Q, spec)
            res = (rows, lf)
    else:
        out = _encode_xla(x, table, spec)
        res = None
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)
    out = jnp.where(oob, 0.0, out)
    return out.reshape(*prefix, spec.output_dim), res


def _encode_fwd(x01, table, spec, use_pallas):
    out, res = _encode_with_residuals(x01, table, spec, use_pallas)
    return out, (x01, res)


def _encode_bwd(spec, use_pallas, residuals, g):
    (x01, res) = residuals
    prefix = x01.shape[:-1]
    x = x01.reshape(-1, 3)
    g2 = g.reshape(-1, spec.output_dim).astype(jnp.float32)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)
    g2 = jnp.where(oob, 0.0, g2)

    if use_pallas and _on_tpu():
        from lidarnerf_tpu.ops import block_hash_pallas as bhp

        if len(res) == 4:
            rows, lf, nxt, nseg = res
            grad_table = bhp._bwd_seg_from_prep(rows, lf, nxt, nseg, g2, spec)
        elif len(res) == 3:
            rows, lf, flags = res
            grad_table = bhp._bwd_win_from_prep(rows, lf, flags, g2, spec)
        else:
            rows, lf = res
            grad_table = bhp.encode_bwd_from_prep(rows, lf, g2, spec)
    else:
        grad_table = jnp.zeros(
            (spec.table_rows, ROW_WIDTH), jnp.float32
        )
        for li, level in enumerate(spec.levels):
            rows_idx, w12 = level_indices_and_weights(x, level, li, spec)
            W = lane_weight_row(w12)  # [Q, 128]
            g_l = g2[:, 2 * li : 2 * li + 2]  # [Q, 2]
            # lane j holds channel c = j & 1 -> [g0, g1, g0, g1, ...]
            g_lane = jnp.tile(g_l, (1, 64))  # [Q, 128]
            grad_rows = W * g_lane
            grad_table = grad_table.at[rows_idx].add(grad_rows)
    return jnp.zeros_like(x01), grad_table


block_hash_encode.defvjp(_encode_fwd, _encode_bwd)


def _on_tpu():
    from lidarnerf_tpu.ops.dispatch import on_tpu

    return on_tpu()


# ------------------------------------------------- boundary-corner sharing


def tie_dense_seams(table, spec: BlockHashSpec):
    """Differentiable boundary-corner sharing for the DENSE levels.

    The block layout stores corners on block faces twice — block b's local
    corner 3 along an axis and block b+1's local corner 0 are the same
    global corner (module docstring, tradeoff #1). The reference never has
    this (per-corner storage, gridencoder.cu:53-67); measured at matched
    steps the duplication costs quality (VALIDATION.md encoder A/B), and the
    alpha_seam penalty was measured to HURT (round-4 sweep). This instead
    reparameterizes: the *effective* table used by the forward replaces both
    copies of every shared face corner with their mean, so the encoded field
    is exactly continuous across dense-level block seams and the two copies
    receive symmetric gradients — true corner sharing, not a loss.

    Dense levels index blocks lexicographically, so the copy pairing is pure
    static slicing on a [nb, nb, nb, 4, 4, 4, 2] view; averaging axis-by-
    axis equalizes 2-, 4- and 8-copy corners to their full mean. Hashed
    levels cannot be paired by slicing (block coords are hashed); see
    sync_hashed_seams for the stochastic projection used there.

    Cost: a few small-slice averages plus one table-buffer copy (~0.2 ms at
    the flagship 67 MB table) — rides inside the training jit.
    """
    out = table
    for li, level in enumerate(spec.levels):
        if not level.dense:
            continue
        nb = level.blocks_axis
        if nb < 2:
            continue
        n = nb**3
        off = li * spec.blocks_per_level
        t = table[off : off + n].reshape(nb, nb, nb, 4, 4, 4, 2)
        # x faces: block (bx,·,·) corner sx=3 == block (bx+1,·,·) corner sx=0
        m = 0.5 * (t[:-1, :, :, 3] + t[1:, :, :, 0])
        t = t.at[:-1, :, :, 3].set(m).at[1:, :, :, 0].set(m)
        # y faces (after x so edge/vertex corners converge to the full mean)
        m = 0.5 * (t[:, :-1, :, :, 3] + t[:, 1:, :, :, 0])
        t = t.at[:, :-1, :, :, 3].set(m).at[:, 1:, :, :, 0].set(m)
        # z faces
        m = 0.5 * (t[:, :, :-1, :, :, 3] + t[:, :, 1:, :, :, 0])
        t = t.at[:, :, :-1, :, :, 3].set(m).at[:, :, 1:, :, :, 0].set(m)
        out = out.at[off : off + n].set(t.reshape(n, ROW_WIDTH))
    return out


def sync_hashed_seams(table, spec: BlockHashSpec, key, n_per_axis=4096):
    """Stochastic hard-averaging projection of duplicated corners at HASHED
    levels (the counterpart of tie_dense_seams where the copy pairing cannot
    be enumerated: block coords are hashed, gridencoder.cu:53-67 prime-XOR).

    Samples boundary corners uniformly per (level, axis) like
    block_hash_seam_loss, then ASSIGNS both copies their mean — a projection
    onto the corner-consistent subspace the reference lives in permanently,
    with no gradient pressure against reconstruction (the round-4 sweep
    showed the penalty form hurts). Meant to be applied to the raw params
    every occupancy-update interval. Sampled-corner collisions are benign
    (last write wins; both writes are means of near-identical pairs).
    """
    flat = table.reshape(-1)
    keys = jax.random.split(key, spec.num_levels * 3)
    for li, level in enumerate(spec.levels):
        if level.dense:
            continue
        max_corner = level.max_cell + 1
        n_seams = min(max_corner // CELLS_PER_BLOCK, level.blocks_axis - 1)
        if n_seams < 1:
            continue
        for axis in range(3):
            k = keys[li * 3 + axis]
            km, ko = jax.random.split(k)
            m = jax.random.randint(km, (n_per_axis,), 1, n_seams + 1)
            other = jax.random.randint(ko, (n_per_axis, 3), 0, max_corner + 1)
            g = other.at[:, axis].set(m * CELLS_PER_BLOCK)
            blk_hi = jnp.clip(g // CELLS_PER_BLOCK, 0, level.blocks_axis - 1)
            blk_lo = blk_hi.at[:, axis].add(-1)
            row_a, lane_a = _corner_row_lane(g, blk_hi, level, li, spec)
            row_b, lane_b = _corner_row_lane(g, blk_lo, level, li, spec)
            ia = row_a * ROW_WIDTH + lane_a
            ib = row_b * ROW_WIDTH + lane_b
            for ch in range(LEVEL_DIM):
                mean = 0.5 * (jnp.take(flat, ia + ch) + jnp.take(flat, ib + ch))
                flat = flat.at[ia + ch].set(mean).at[ib + ch].set(mean)
    return flat.reshape(table.shape)


# --------------------------------------------------------------- seam tying


def _corner_row_lane(gcorner, block, level: _Level, level_idx, spec: BlockHashSpec):
    """(row, lane0) for a global corner coordinate stored in a given block.

    gcorner: [Q, 3] int32 global corner coords; block: [Q, 3] int32 block
    coords that must satisfy 3*block <= gcorner <= 3*block + 3. lane0 is the
    channel-0 lane; channel 1 is lane0 + 1.
    """
    local = gcorner - block * CELLS_PER_BLOCK  # in [0, 3]
    if level.dense:
        nb = level.blocks_axis
        idx = ((block[:, 0] * nb + block[:, 1]) * nb + block[:, 2]).astype(jnp.uint32)
    else:
        b = block.astype(jnp.uint32)
        idx = (
            b[:, 0] * np.uint32(_HASH_PRIMES[0])
            ^ b[:, 1] * np.uint32(_HASH_PRIMES[1])
            ^ b[:, 2] * np.uint32(_HASH_PRIMES[2])
        )
    row = (idx % np.uint32(spec.blocks_per_level)).astype(jnp.int32) + np.int32(
        level_idx * spec.blocks_per_level
    )
    lane0 = ((local[:, 0] * CORNERS_PER_BLOCK + local[:, 1]) * CORNERS_PER_BLOCK
             + local[:, 2]) * LEVEL_DIM
    return row, lane0


def block_hash_seam_loss(table, spec: BlockHashSpec, key, n_per_axis=512):
    """Stochastic seam-consistency regularizer.

    The block layout stores corners shared by adjacent blocks independently
    (module docstring, tradeoff #1): a global corner with coordinate g ≡ 0
    (mod 3) along axis a lives both in block g/3 (local corner 0) and block
    g/3 - 1 (local corner 3). This loss samples such duplicated corners
    uniformly per (level, axis) and penalises the squared difference of the
    two stored feature pairs, tying the copies together so the encoded field
    stays continuous across block seams. The reference needs no analogue
    (its corners are globally unique, gridencoder.cu:68-92); this is the
    TPU-layout counterpart of that uniqueness.

    Returns a scalar: mean squared copy-discrepancy over all sampled corners.
    """
    flat = table.reshape(-1)
    total = 0.0
    terms = 0
    keys = jax.random.split(key, spec.num_levels * 3)
    for li, level in enumerate(spec.levels):
        max_corner = level.max_cell + 1  # corner coords span [0, max_cell+1]
        # duplicated boundary coords g = 3*m need both block m-1 and block m
        # to exist: m in [1, blocks_axis - 1] (and g <= max_corner)
        n_seams = min(max_corner // CELLS_PER_BLOCK, level.blocks_axis - 1)
        if n_seams < 1:
            continue
        for axis in range(3):
            k = keys[li * 3 + axis]
            km, ko = jax.random.split(k)
            # boundary coordinate along `axis`: g = 3*m, m in [1, n_seams]
            m = jax.random.randint(km, (n_per_axis,), 1, n_seams + 1)
            other = jax.random.randint(ko, (n_per_axis, 3), 0, max_corner + 1)
            g = other.at[:, axis].set(m * CELLS_PER_BLOCK)
            blk_hi = jnp.clip(g // CELLS_PER_BLOCK, 0, level.blocks_axis - 1)
            blk_lo = blk_hi.at[:, axis].add(-1)
            row_a, lane_a = _corner_row_lane(g, blk_hi, level, li, spec)
            row_b, lane_b = _corner_row_lane(g, blk_lo, level, li, spec)
            fa0 = jnp.take(flat, row_a * ROW_WIDTH + lane_a)
            fa1 = jnp.take(flat, row_a * ROW_WIDTH + lane_a + 1)
            fb0 = jnp.take(flat, row_b * ROW_WIDTH + lane_b)
            fb1 = jnp.take(flat, row_b * ROW_WIDTH + lane_b + 1)
            total = total + jnp.mean((fa0 - fb0) ** 2 + (fa1 - fb1) ** 2)
            terms += 1
    if terms == 0:
        return jnp.zeros((), table.dtype)
    return total / terms
