"""Multiresolution hash-grid encoder (instant-ngp style), pure-JAX reference path.

TPU-native re-expression of the reference CUDA gridencoder
(/root/reference/lidarnerf/gridencoder/src/gridencoder.cu, grid.py). Exact
semantic parity with the CUDA kernel:

- per-level scale: ``exp2(level * log2(per_level_scale)) * base - 1`` with
  ``resolution = ceil(scale) + 1`` (gridencoder.cu:147-148),
- ``per_level_scale = exp2(log2(desired/base) / (L-1))`` when a desired finest
  resolution is given (grid.py:158-161),
- per-level table sizes ``min(2^log2_hashmap_size, (res+1)^D)`` rounded up to a
  multiple of 8, laid out contiguously with an offsets table (grid.py:179-195),
- voxel-corner indexing: dense strided index when the level fits its table,
  otherwise the prime-XOR ``fast_hash`` in uint32 arithmetic
  (gridencoder.cu:53-92),
- trilinear (or smoothstep) interpolation over the 2^D corners with
  ``pos = x*scale + 0.5`` for align_corners=False (gridencoder.cu:155-215),
- out-of-[0,1] inputs produce zero features (gridencoder.cu:120-144),
- parameters initialised uniform(-1e-4, 1e-4) (grid.py:202-204).

Unlike the CUDA version there is no hand-written backward: the forward is pure
gather + lerp, so JAX autodiff yields a deterministic XLA scatter-add for the
table gradient (the CUDA kernel's non-deterministic atomicAdd has no TPU
analogue — and doesn't need one).

The encode loop is unrolled over the (static) level count so XLA sees L
independent gather+fma chains it can fuse and overlap. The hot path uses the
block-hash layout instead (`ops/block_hash.py` + `ops/block_hash_pallas.py`);
this module is the reference-exact oracle and the `encoding="hashgrid"` /
`"tiledgrid"` backends.
"""

from dataclasses import dataclass, field
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# Matches fast_hash primes, gridencoder.cu:56-58.
_HASH_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


@dataclass(frozen=True)
class _Level:
    scale: float  # continuous grid scale (cells along one axis)
    resolution: int  # integer corner resolution = ceil(scale)+1
    size: int  # entries allocated for this level (multiple of 8)
    offset: int  # start row in the flat table
    n_dense_dims: int  # dims indexed densely before stride exceeds size


@dataclass(frozen=True)
class HashGridSpec:
    """Static description of a multiresolution hash grid (hashable jit static)."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    per_level_scale: float = 2.0
    gridtype: str = "hash"  # "hash" | "tiled"
    align_corners: bool = False
    interpolation: str = "linear"  # "linear" | "smoothstep"
    levels: tuple = field(default=())

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @property
    def table_rows(self) -> int:
        return self.levels[-1].offset + self.levels[-1].size


def make_hash_grid_spec(
    input_dim: int = 3,
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: int | None = None,
    per_level_scale: float = 2.0,
    gridtype: str = "hash",
    align_corners: bool = False,
    interpolation: str = "linear",
) -> HashGridSpec:
    if desired_resolution is not None:
        per_level_scale = float(
            np.exp2(np.log2(desired_resolution / base_resolution) / (num_levels - 1))
        )
    max_params = 2**log2_hashmap_size
    S = np.log2(per_level_scale)
    levels = []
    offset = 0
    for lvl in range(num_levels):
        # grid.py:183 allocates with ceil(base * pls**l); the kernel re-derives
        # resolution as ceil(exp2(l*S)*H - 1) + 1 (gridencoder.cu:147-148). The
        # two agree for integer-scale levels and differ by at most the +1 corner
        # row otherwise; we follow the *kernel* (it defines the actual lookups)
        # but allocate with the grid.py formula so table sizes match checkpoints.
        scale = float(np.exp2(lvl * S) * base_resolution - 1.0)
        resolution = int(np.ceil(scale)) + 1
        alloc_res = int(np.ceil(base_resolution * per_level_scale**lvl))
        corners = alloc_res if align_corners else alloc_res + 1
        params_in_level = min(max_params, corners**input_dim)
        params_in_level = int(np.ceil(params_in_level / 8) * 8)
        # How many dims the strided (dense/tiled) index covers before the
        # stride exceeds the level size (gridencoder.cu:78-83).
        stride = 1
        n_dense = 0
        kernel_corners = resolution if align_corners else resolution + 1
        for _ in range(input_dim):
            if stride > params_in_level:
                break
            n_dense += 1
            stride *= kernel_corners
        dense_fits = stride <= params_in_level
        if gridtype == "hash" and not dense_fits:
            n_dense = -1  # sentinel: use fast_hash
        levels.append(
            _Level(
                scale=scale,
                resolution=resolution,
                size=params_in_level,
                offset=offset,
                n_dense_dims=n_dense,
            )
        )
        offset += params_in_level
    return HashGridSpec(
        input_dim=input_dim,
        num_levels=num_levels,
        level_dim=level_dim,
        base_resolution=base_resolution,
        log2_hashmap_size=log2_hashmap_size,
        per_level_scale=per_level_scale,
        gridtype=gridtype,
        align_corners=align_corners,
        interpolation=interpolation,
        levels=tuple(levels),
    )


def hash_grid_init(key, spec: HashGridSpec, dtype=jnp.float32):
    """Uniform(-1e-4, 1e-4) init, matching grid.py:202-204."""
    return jax.random.uniform(
        key, (spec.table_rows, spec.level_dim), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


def _corner_offsets(input_dim: int) -> np.ndarray:
    """[2^D, D] binary corner offsets, corner idx bit d -> +1 along dim d."""
    idx = np.arange(2**input_dim)
    return np.stack([(idx >> d) & 1 for d in range(input_dim)], axis=-1).astype(
        np.uint32
    )


def _level_index(corners_u32, level: _Level, spec: HashGridSpec):
    """uint32 table row index for integer corner coords, one level.

    corners_u32: [..., D] uint32 grid coordinates.
    Replicates get_grid_index (gridencoder.cu:68-92) including uint32 wraparound.
    """
    D = spec.input_dim
    kernel_corners = level.resolution if spec.align_corners else level.resolution + 1
    if level.n_dense_dims >= 0:
        # dense / tiled strided index, truncated at n_dense_dims
        index = jnp.zeros(corners_u32.shape[:-1], jnp.uint32)
        stride = 1
        for d in range(level.n_dense_dims):
            index = index + corners_u32[..., d] * np.uint32(stride)
            stride = (stride * kernel_corners) & 0xFFFFFFFF  # wraps like CUDA uint32
    else:
        index = jnp.zeros(corners_u32.shape[:-1], jnp.uint32)
        for d in range(D):
            index = index ^ (corners_u32[..., d] * np.uint32(_HASH_PRIMES[d]))
    return index % np.uint32(level.size) + np.uint32(level.offset)


def hash_grid_total_variation(table, spec: HashGridSpec, key, n_samples=100000):
    """Stochastic total-variation regulariser over the grid.

    Functional equivalent of the reference's kernel_grad_tv
    (gridencoder.cu:696+, grid.py:239-277): sample random points, and for each
    level penalise squared differences between the corner entry and its +1
    neighbours along each axis. Returns a scalar loss (use jax.grad instead of
    the reference's direct grad-accumulation API).
    """
    x = jax.random.uniform(key, (n_samples, spec.input_dim))
    corners0 = _corner_offsets(spec.input_dim)[:1]  # base corner only
    loss = 0.0
    for level in spec.levels:
        pos = x * level.scale + (0.0 if spec.align_corners else 0.5)
        base = jnp.floor(pos).astype(jnp.uint32)[:, None, :]
        idx0 = _level_index(base + corners0, level, spec)[:, 0]
        f0 = jnp.take(table, idx0, axis=0)
        for d in range(spec.input_dim):
            nb = base.at[:, :, d].add(1)
            idx1 = _level_index(nb, level, spec)[:, 0]
            f1 = jnp.take(table, idx1, axis=0)
            loss = loss + jnp.mean((f1 - f0) ** 2)
    return loss


@partial(jax.jit, static_argnames=("spec",))
def hash_grid_encode(x01, table, spec: HashGridSpec):
    """Encode points through the multiresolution hash grid.

    Args:
        x01: [..., D] float coordinates in [0, 1] (the caller maps from
             [-bound, bound], mirroring grid.py:213).
        table: [table_rows, level_dim] feature table.
        spec: static HashGridSpec.

    Returns:
        [..., num_levels * level_dim] features (level-major within the last
        axis, matching the reference's [B, L*C] output layout).
    """
    prefix = x01.shape[:-1]
    x = x01.reshape(-1, spec.input_dim).astype(jnp.float32)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)  # [B, 1]
    corners = _corner_offsets(spec.input_dim)  # [2^D, D] uint32

    feats = []
    for level in spec.levels:
        pos = x * level.scale + (0.0 if spec.align_corners else 0.5)
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        if spec.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        base = pos_grid.astype(jnp.uint32)  # nonneg for in-range x
        cg = base[:, None, :] + corners[None, :, :]  # [B, 2^D, D]
        idx = _level_index(cg, level, spec)  # [B, 2^D]
        # corner weights: prod_d (frac if bit else 1-frac)
        bits = corners[None, :, :].astype(jnp.float32)  # [1, 2^D, D]
        w = jnp.prod(
            bits * frac[:, None, :] + (1.0 - bits) * (1.0 - frac[:, None, :]),
            axis=-1,
        )  # [B, 2^D]
        f = jnp.take(table, idx, axis=0)  # [B, 2^D, C]
        feats.append(jnp.sum(w[..., None] * f.astype(jnp.float32), axis=1))  # [B, C]

    out = jnp.concatenate(feats, axis=-1)
    out = jnp.where(oob, 0.0, out)
    return out.reshape(*prefix, spec.output_dim)


@partial(jax.jit, static_argnames=("spec", "chunk"))
def hash_grid_encode_chunked(x01, table, spec: HashGridSpec, chunk: int = 131072):
    """hash_grid_encode in fixed-size query chunks with rematerialisation.

    The plain encoder materialises [Q, 2^D] corner indices and [Q, 2^D, C]
    gathered features per level as autodiff residuals; at the flagship KITTI
    step scale (Q = 4096 x 832 = 3.4M) that is >20 GB of HBM and the train
    step compile-OOMs. Here the query axis is scanned in `chunk`-sized blocks
    with `jax.checkpoint`, so the backward recomputes each block's gathers
    instead of storing them: peak residual memory drops from O(Q * 2^D * L) to
    O(chunk * 2^D) + the table-gradient accumulator, making the exact encoder
    (the quality oracle for the block-hash redesign) trainable at the full
    4096x832 config. Numerics are unchanged — same gathers, same lerp, chunked.

    Matches the CUDA kernel exactly like hash_grid_encode (the reference never
    materialises these intermediates at all: gridencoder.cu:96-263 recomputes
    corner indices in the backward kernel — this is the XLA analogue).
    """
    prefix = x01.shape[:-1]
    x = x01.reshape(-1, spec.input_dim)
    Q = x.shape[0]
    if Q <= chunk:
        return hash_grid_encode(x01, table, spec)
    pad = (-Q) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xc = xp.reshape(-1, chunk, spec.input_dim)

    @jax.checkpoint
    def body(xb):
        return hash_grid_encode(xb, table, spec)

    out = jax.lax.map(body, xc)
    out = out.reshape(-1, spec.output_dim)[:Q]
    return out.reshape(*prefix, spec.output_dim)
