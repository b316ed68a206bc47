"""Static-shape ray sampling: stratified coarse samples + inverse-CDF importance.

TPU-native replacement for both the reference's live LiDAR sampling path
(/root/reference/lidarnerf/nerf/renderer.py:149-231) and the dormant CUDA
occupancy-grid marcher (raymarching.cu kernel_march_rays_train): instead of
per-ray variable-count compacted sample lists (hostile to XLA), every ray
carries exactly ``num_steps + upsample_steps`` samples so the whole render is
one static-shape program. ``sample_pdf`` mirrors renderer.py:10-46 (NeRF
inverse-CDF sampling via searchsorted).
"""

from functools import partial

import jax
import jax.numpy as jnp


def stratified_z_vals(key, nears, fars, num_steps: int, perturb: bool):
    """Uniform depth samples in [near, far], optionally jittered.

    Mirrors renderer.py:149-161: linspace over [0,1] scaled into [near, far],
    then (if perturb) +/- half a bin of uniform noise, *without* clamping to
    the interval (the reference leaves out-of-range z after perturb).

    Args:
        key: PRNG key (unused when perturb=False).
        nears, fars: [N, 1] per-ray bounds.
        num_steps: static sample count T.

    Returns:
        z_vals: [N, T]
    """
    N = nears.shape[0]
    t = jnp.linspace(0.0, 1.0, num_steps, dtype=jnp.float32)[None, :]
    z_vals = nears + (fars - nears) * t  # [N, T]
    if perturb:
        sample_dist = (fars - nears) / num_steps
        noise = jax.random.uniform(key, (N, num_steps), dtype=jnp.float32) - 0.5
        z_vals = z_vals + noise * sample_dist
    return z_vals


@partial(jax.jit, static_argnames=("n_samples", "det"))
def sample_pdf(key, bins, weights, n_samples: int, det: bool):
    """Inverse-CDF sampling of new depths from bin weights (renderer.py:10-46).

    Args:
        bins: [B, T] bin centers (old z_vals midpoints).
        weights: [B, T-1] bin weights.
        n_samples: number of new samples per ray.
        det: deterministic (midpoint linspace) vs uniform-random u.

    Returns:
        samples: [B, n_samples]
    """
    B, T = bins.shape
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, T]

    if det:
        u = jnp.linspace(
            0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples, dtype=jnp.float32
        )
        u = jnp.broadcast_to(u, (B, n_samples))
    else:
        u = jax.random.uniform(key, (B, n_samples), dtype=jnp.float32)

    # GATHER-FREE batched searchsorted(side='right') + fetch (round-5): the
    # compare-sum searchsorted is pure VPU work (~200x a vmapped
    # jnp.searchsorted), but the four take_along_axis fetches it fed cost
    # ~15 ms/step at training scale (TPU gathers run ~80M rows/s). Both cdf
    # and bins are SORTED along T, so x[inds-1] is the masked MAX of entries
    # whose cdf <= u and x[inds] the masked MIN of the rest — the same
    # broadcast compare, select+reduce instead of gather. Selected values are
    # identical to the gather form (the +1e-5 keeps cdf strictly increasing,
    # so value-level selection equals index-level selection).
    le = cdf[:, :, None] <= u[:, None, :]  # [B, T, n]
    inf = jnp.float32(jnp.inf)
    cdf_below = jnp.max(jnp.where(le, cdf[:, :, None], 0.0), axis=1)
    cdf_above = jnp.min(jnp.where(le, inf, cdf[:, :, None]), axis=1)
    cdf_above = jnp.where(jnp.isinf(cdf_above), cdf[:, -1:], cdf_above)
    bins_below = jnp.max(jnp.where(le, bins[:, :, None], -inf), axis=1)
    bins_above = jnp.min(jnp.where(le, inf, bins[:, :, None]), axis=1)
    bins_above = jnp.where(jnp.isinf(bins_above), bins[:, -1:], bins_above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


@jax.custom_vjp
def permutation_gather(vals, order, inv_order):
    """take_along_axis(vals, order, axis=1) for a per-row PERMUTATION `order`.

    The VJP of a permutation gather is a gather by the inverse permutation —
    this wrapper tells JAX so, replacing the XLA scatter-add (which runs ~10x
    slower than gather on TPU) that autodiff would otherwise emit.

    Args:
        vals: [N, S] or [N, S, C]; order/inv_order: [N, S] int32 with
        inv_order = argsort(order).
    """
    idx = order[..., None] if vals.ndim == 3 else order
    return jnp.take_along_axis(vals, idx, axis=1)


def _perm_gather_fwd(vals, order, inv_order):
    return permutation_gather(vals, order, inv_order), (order, inv_order, vals.ndim)


def _perm_gather_bwd(res, g):
    order, inv_order, ndim = res
    idx = inv_order[..., None] if ndim == 3 else inv_order
    return jnp.take_along_axis(g, idx, axis=1), None, None


permutation_gather.defvjp(_perm_gather_fwd, _perm_gather_bwd)


def sort_merge_z(z_coarse, z_fine, *extras):
    """Merge coarse+fine depth samples, sorting each ray (renderer.py:217-231).

    All reordered arrays are fused into ONE [N, S, C] permutation gather:
    width-1 row gathers are the worst case for the TPU gather unit (~80M
    rows/s regardless of width), so three separate gathers of z/sigma/feat
    cost 3x what one fused 17-wide gather does — fwd and bwd.

    On TPU the gather runs as an MXU one-hot matmul (ops/perm_gather_pallas)
    — ~25x faster than the XLA gather unit at training scale, and bit-exact:
    each fp32 value is split into four 8-bit bit-pattern planes that pass
    through the bf16 MXU losslessly; elsewhere it falls back to
    `take_along_axis` with the inverse-permutation VJP.

    Args:
        z_coarse: [N, T], z_fine: [N, t].
        extras: additional per-sample arrays [N, T(, C)] / [N, t(, C)] pairs
            given as (coarse, fine) tuples to reorder alongside z.

    Returns:
        (z_sorted [N, T+t], order [N, T+t], *reordered_extras)
    """
    z_all = jnp.concatenate([z_coarse, z_fine], axis=1)
    order = jnp.argsort(z_all, axis=1)
    inv_order = jnp.argsort(order, axis=1)

    chans = [z_all[..., None]]
    splits = [1]
    for coarse, fine in extras:
        merged = jnp.concatenate([coarse, fine], axis=1)
        if merged.ndim == 2:
            merged = merged[..., None]
        chans.append(merged)
        splits.append(merged.shape[-1])
    fused = jnp.concatenate(chans, axis=-1)  # [N, S, 1 + sum(C_i)]
    from lidarnerf_tpu.ops.dispatch import on_tpu

    if on_tpu():
        from lidarnerf_tpu.ops.perm_gather_pallas import mxu_permutation_gather

        sorted_fused = mxu_permutation_gather(fused, inv_order)
    else:
        sorted_fused = permutation_gather(fused, order, inv_order)

    outs = []
    off = 1
    for (coarse, _), c in zip(extras, splits[1:]):
        part = sorted_fused[..., off : off + c]
        if coarse.ndim == 2:
            part = part[..., 0]
        outs.append(part)
        off += c
    return (sorted_fused[..., 0], order, *outs)
