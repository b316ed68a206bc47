"""Occupancy-prior ray sampling: the TPU-native answer to the reference's
density grid.

The reference maintains a 128^3 ``density_grid`` + bitfield and uses it to
*compact* samples per ray with variable counts
(/root/reference/lidarnerf/raymarching/src/raymarching.cu
kernel_march_rays_train:332-575) — irregular shapes that are hostile to XLA.
This module keeps the same prior (an EMA-max-decayed coarse density grid,
refreshed from the live field like torch-ngp's ``update_extra_state``) but
uses it to **reweight a static-shape stratified CDF**: every ray still carries
exactly ``num_steps`` coarse samples, they are just drawn from a
piecewise-constant PDF that concentrates on occupied bins instead of
uniformly. SURVEY.md §6 notes most of the reference's 768 uniform samples land
in empty space; at equal quality this lets ``num_steps`` drop 3-4x, which
multiplies training throughput (the encoder's row-fetch cost is linear in
sample count).

Mechanics per ray:
  1. ``bins`` uniform depth bins over [near, far]; nearest-cell grid lookup at
     each bin midpoint.
  2. binary occupancy vs ``min(mean(grid), density_thresh)`` — the exact
     threshold law of the reference's bitfield packing (raymarching.py
     packbits call sites).
  3. PDF = (1 - floor) * normalized_occupancy + floor * uniform. The uniform
     floor keeps every region explorable: the grid refresh queries the field
     directly, so density that (re)appears anywhere is re-marked within one
     update interval even if sampling rarely visits it.
  4. ``num_steps`` samples by inverse-CDF with *stratified monotone* u — the
     output depths come out sorted, so the downstream importance upsampling /
     sort-merge / compositing pipeline is unchanged.

Cold start needs no special casing: a zero grid gives an all-zero bitfield and
the PDF degenerates to uniform — exactly the parity-mode stratified sampler.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


_INF = jnp.float32(jnp.inf)


@dataclass(frozen=True)
class OccConfig:
    grid_size: int = 128
    decay: float = 0.95  # torch-ngp update_extra_state decay law
    update_interval: int = 16  # steps between grid refreshes
    density_thresh: float = 10.0  # reference --density_thresh default
    floor: float = 0.05  # uniform mixture fraction of the sampling PDF
    bins: int = 128  # per-ray CDF bins
    dilate: int = 1  # binary-occupancy dilation radius (cells)


def init_occ_grid(cfg: OccConfig) -> jnp.ndarray:
    return jnp.zeros((cfg.grid_size,) * 3, jnp.float32)


@partial(jax.jit, static_argnames=("module", "cfg", "bound"))
def update_occ_grid(module, params, grid, key, cfg: OccConfig, bound: float):
    """EMA-max refresh from the current field.

    grid <- max(grid * decay, sigma(jittered cell point)) — the same law as
    the reference's update_extra_state; querying the field directly (rather
    than accumulating visited samples) means occupancy recovers even in
    regions the sampler currently avoids.
    """
    G = cfg.grid_size
    idx = jnp.arange(G, dtype=jnp.float32)
    ii, jj, kk = jnp.meshgrid(idx, idx, idx, indexing="ij")
    cell = jnp.stack([ii, jj, kk], axis=-1)  # [G,G,G,3]
    u = jax.random.uniform(key, (G, G, G, 3), dtype=jnp.float32)
    x = -bound + (cell + u) * (2.0 * bound / G)
    sigma, _ = module.apply(params, x.reshape(-1, 3), method=module.density)
    sigma = sigma.reshape(G, G, G).astype(jnp.float32)
    return jnp.maximum(grid * cfg.decay, sigma)


def occ_bin_pdf(grid, rays_o, rays_d, nears, fars, cfg: OccConfig, bound: float):
    """[N, bins] piecewise-constant sampling PDF along each ray.

    ``cfg.dilate`` max-pools the *binary* occupancy volume by that cell radius
    before the along-ray lookup. The un-dilated bitfield undersamples exactly
    where the --fast depth tail regressed (VALIDATION.md): surfaces within a
    cell of a bin midpoint's empty cell, and rays grazing an occupied cell
    between midpoints. One cell of dilation covers both (the cell edge
    2*bound/G exceeds the bin width (far-near)/bins for the KITTI constants)
    at the cost of a thin shell of extra samples around surfaces.
    """
    G = cfg.grid_size
    K = cfg.bins
    t = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
    z = nears + (fars - nears) * t[None, :]  # [N, K] bin midpoints
    x = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    gi = jnp.clip(
        jnp.floor((x + bound) * (G / (2.0 * bound))).astype(jnp.int32), 0, G - 1
    )
    flat = (gi[..., 0] * G + gi[..., 1]) * G + gi[..., 2]  # [N, K]
    thresh = jnp.minimum(jnp.mean(grid), cfg.density_thresh)
    occ3 = (grid > thresh).astype(jnp.float32)
    if cfg.dilate > 0:
        k = 2 * cfg.dilate + 1
        occ3 = jax.lax.reduce_window(
            occ3, 0.0, jax.lax.max, (k, k, k), (1, 1, 1), "SAME"
        )
    occ_b = jnp.take(occ3.reshape(-1), flat)
    w = occ_b + 1e-8  # all-empty rays degrade to uniform
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    return (1.0 - cfg.floor) * pdf + cfg.floor / K


def occ_z_vals(key, nears, fars, pdf, num_steps: int, perturb: bool):
    """Draw sorted depths from the per-ray bin PDF by stratified inverse-CDF.

    Stratified monotone u (one draw per 1/num_steps stratum) keeps the output
    sorted — the property the downstream sort-merge relies on — and gives
    lower-variance coverage than i.i.d. uniform u. With a uniform PDF the
    deterministic path (perturb=False, u = inclusive linspace) reproduces the
    parity-mode stratified law (renderer.py:149-161) up to float32 inverse-CDF
    arithmetic (cumsum + interpolation; tests assert rtol=1e-4/1e-5 agreement
    — close, not bitwise).
    """
    N, K = pdf.shape
    if perturb:
        xi = jax.random.uniform(key, (N, num_steps), dtype=jnp.float32)
        u = (jnp.arange(num_steps, dtype=jnp.float32)[None, :] + xi) / num_steps
    else:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, num_steps, dtype=jnp.float32)[None, :],
            (N, num_steps),
        )

    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, K+1]

    # GATHER-FREE inverse CDF (round-5): the searchsorted-then-gather form
    # (compare-sum inds + 4x take_along_axis) spent ~32 ms/step at training
    # scale — TPU gathers run ~80M rows/s. Because cdf is sorted along K,
    # cdf[below] is simply the masked MAX of cdf entries <= u and cdf[above]
    # the masked MIN of entries > u — the same broadcast compare the
    # searchsorted already does, with select+reduce instead of gather. The
    # uniform bin edges never need fetching at all: edge[below] is affine in
    # below. Values selected are identical to the gather form (strictly
    # increasing cdf: the floor/K mixture keeps every pdf entry positive).
    le = cdf[:, :, None] <= u[:, None, :]  # [N, K+1, T]
    # below = clip(#{cdf<=u} - 1, 0, K-1); the leading 0 always counts
    below_f = jnp.clip(
        jnp.sum(le[:, 1:, :], axis=1, dtype=jnp.float32), 0.0, float(K - 1)
    )  # [N, T]
    cdf_b = jnp.max(jnp.where(le[:, :K, :], cdf[:, :K, None], 0.0), axis=1)
    cdf_a = jnp.min(jnp.where(le[:, 1:, :], _INF, cdf[:, 1:, None]), axis=1)
    cdf_a = jnp.where(jnp.isinf(cdf_a), cdf[:, -1:], cdf_a)  # u beyond cdf[K]
    bin_w = (fars - nears) / K
    edge_b = nears + bin_w * below_f
    denom = jnp.where(cdf_a - cdf_b < 1e-12, 1.0, cdf_a - cdf_b)
    frac = jnp.clip((u - cdf_b) / denom, 0.0, 1.0)
    return edge_b + frac * bin_w
