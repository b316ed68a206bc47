"""Morton (Z-order) encoding + occupancy bitfield packing.

Vectorized equivalents of the reference's CUDA utilities
(/root/reference/lidarnerf/raymarching/src/raymarching.cu kernel_morton3D
:237-263, kernel_morton3D_invert :265-285, kernel_packbits :287-330). The
occupancy-grid *marcher* that consumed these is deliberately not ported — the
TPU renderer uses static-shape stratified+importance sampling (SURVEY.md §7) —
but the utilities themselves remain available for occupancy-prior work.
"""

import jax.numpy as jnp


def _expand_bits(v):
    """Spread the low 10 bits of each int so they occupy every 3rd bit."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3D(coords):
    """[N, 3] int coords (< 1024) -> [N] int32 Morton codes."""
    c = coords.astype(jnp.uint32)
    code = (
        _expand_bits(c[..., 0])
        | (_expand_bits(c[..., 1]) << 1)
        | (_expand_bits(c[..., 2]) << 2)
    )
    return code.astype(jnp.int32)


def _compact_bits(v):
    v = v & jnp.uint32(0x49249249)
    v = (v | (v >> 2)) & jnp.uint32(0xC30C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0F00F00F)
    v = (v | (v >> 8)) & jnp.uint32(0xFF0000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x000003FF)
    return v


def morton3D_invert(codes):
    """[N] Morton codes -> [N, 3] int32 coords."""
    c = codes.astype(jnp.uint32)
    return jnp.stack(
        [_compact_bits(c), _compact_bits(c >> 1), _compact_bits(c >> 2)], axis=-1
    ).astype(jnp.int32)


def packbits(density_grid, density_thresh):
    """Pack density > thresh into a uint8 bitfield (8 cells per byte).

    density_grid: [..., N] with N % 8 == 0 (reference packs the flat
    cascade x grid_size^3 density grid).
    """
    occ = (density_grid > density_thresh).astype(jnp.uint8)
    occ = occ.reshape(*occ.shape[:-1], -1, 8)
    weights = (2 ** jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint8)
    return (occ * weights).sum(axis=-1).astype(jnp.uint8)
