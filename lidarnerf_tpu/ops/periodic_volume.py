"""Periodic-volume encoding — the reference's dormant PeriodicVolumeEncoding.

Functional JAX twin of /root/reference/lidarnerf/encoding.py:123-296
(user-selectable there via get_encoder(..., "ash"-adjacent research path; the
class itself is DORMANT but part of the reference's capability surface):

- L levels with scalings ``floor(min_res * growth**level)`` where
  ``growth = exp((ln max_res - ln min_res) / (L - 1))`` (encoding.py:156-158),
- each level owns a DENSE periodic volume of resolution
  ``R = 2**(log2_hashmap_size // 3)`` — integer corner coords are taken mod R
  before strided flat indexing (encoding.py:160, 186-198; requires
  ``log2_hashmap_size % 3 == 0``),
- trilinear interpolation over the 8 floor/ceil corners, optional smoothstep
  of the fractional offset (encoding.py:205-212),
- init ``uniform(-1, 1) * hash_init_scale`` (encoding.py:164-168),
- a total-variation loss over the [L, R, R, R, C] feature volume
  (encoding.py:278-296) — the periodic layout makes every level a true dense
  volume, so TV is exact (no hashing aliasing), which is this encoder's point.

Because every level is a dense mod-R volume, indexing is a pure strided
computation (no hash) and autodiff gives a deterministic scatter-add backward.
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class PeriodicVolumeSpec:
    num_levels: int = 16
    min_res: int = 16
    max_res: int = 1024
    log2_hashmap_size: int = 18  # must be divisible by 3
    features_per_level: int = 2
    hash_init_scale: float = 0.001
    smoothstep: bool = False
    scalings: tuple = ()

    @property
    def resolution(self) -> int:
        # encoding.py:160
        return 2 ** (self.log2_hashmap_size // 3)

    @property
    def level_size(self) -> int:
        return 2**self.log2_hashmap_size

    @property
    def table_rows(self) -> int:
        return self.num_levels * self.level_size

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.features_per_level


def make_periodic_volume_spec(
    num_levels=16,
    min_res=16,
    max_res=1024,
    log2_hashmap_size=18,
    features_per_level=2,
    hash_init_scale=0.001,
    smoothstep=False,
) -> PeriodicVolumeSpec:
    if log2_hashmap_size % 3 != 0:
        raise ValueError(
            "periodic_volume requires log2_hashmap_size % 3 == 0 "
            "(encoding.py:151 asserts the same)"
        )
    # encoding.py:156-158
    if num_levels > 1:
        growth = np.exp((np.log(max_res) - np.log(min_res)) / (num_levels - 1))
    else:
        growth = 1.0
    scalings = tuple(
        float(np.floor(min_res * growth**lvl)) for lvl in range(num_levels)
    )
    return PeriodicVolumeSpec(
        num_levels=num_levels,
        min_res=min_res,
        max_res=max_res,
        log2_hashmap_size=log2_hashmap_size,
        features_per_level=features_per_level,
        hash_init_scale=hash_init_scale,
        smoothstep=smoothstep,
        scalings=scalings,
    )


def periodic_volume_init(key, spec: PeriodicVolumeSpec, dtype=jnp.float32):
    """uniform(-1, 1) * hash_init_scale (encoding.py:164-168)."""
    return (
        jax.random.uniform(
            key,
            (spec.table_rows, spec.features_per_level),
            dtype=dtype,
            minval=-1.0,
            maxval=1.0,
        )
        * spec.hash_init_scale
    )


@partial(jax.jit, static_argnames=("spec",))
def periodic_volume_encode(x, table, spec: PeriodicVolumeSpec):
    """[..., 3] coords -> [..., L * C] features.

    The periodic (mod R) indexing means any real input is valid; the caller
    conventionally feeds [0, 1]-normalised positions like the other grids.
    """
    prefix = x.shape[:-1]
    xf = x.reshape(-1, 3).astype(jnp.float32)
    R = spec.resolution
    feats = []
    for lvl, scale in enumerate(spec.scalings):
        pos = xf * scale
        floor = jnp.floor(pos)
        offset = pos - floor
        if spec.smoothstep:
            offset = offset * offset * (3.0 - 2.0 * offset)
        base = floor.astype(jnp.int32)
        f = []
        for c in range(8):
            corner = base + jnp.array(
                [(c >> 2) & 1, (c >> 1) & 1, c & 1], jnp.int32
            )
            corner = jnp.mod(corner, R)
            idx = (
                (corner[:, 0] * R + corner[:, 1]) * R
                + corner[:, 2]
                + np.int32(lvl * spec.level_size)
            )
            f.append(jnp.take(table, idx, axis=0))  # [B, C]
        # trilinear: weight offset on the +1 corner per axis (encoding.py:255-270)
        w = jnp.ones((xf.shape[0], 1), jnp.float32)
        acc = 0.0
        for c in range(8):
            wc = w
            for a, bit in enumerate(((c >> 2) & 1, (c >> 1) & 1, c & 1)):
                oa = offset[:, a : a + 1]
                wc = wc * (oa if bit else 1.0 - oa)
            acc = acc + wc * f[c].astype(jnp.float32)
        feats.append(acc)
    return jnp.concatenate(feats, axis=-1).reshape(*prefix, spec.output_dim)


def periodic_volume_total_variation(table, spec: PeriodicVolumeSpec):
    """Exact TV loss over the dense feature volumes (encoding.py:278-296).

    Per level: mean |adjacent difference| along each axis, summed over axes,
    then averaged over levels (per_level_weights == 1.0 in the reference).
    """
    R = spec.resolution
    vol = table.reshape(spec.num_levels, R, R, R, spec.features_per_level)
    resx = jnp.abs(vol[:, 1:] - vol[:, :-1]).mean(axis=(1, 2, 3, 4))
    resy = jnp.abs(vol[:, :, 1:] - vol[:, :, :-1]).mean(axis=(1, 2, 3, 4))
    resz = jnp.abs(vol[:, :, :, 1:] - vol[:, :, :, :-1]).mean(axis=(1, 2, 3, 4))
    return (resx + resy + resz).mean()
