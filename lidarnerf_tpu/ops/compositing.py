"""Alpha compositing of density samples along rays.

Replaces the reference's sequential CUDA transmittance kernels
(raymarching.cu kernel_composite_rays_train_*) and the torch cumprod path
(renderer.py:233-243) with vectorised log-space transmittance scans — a
bandwidth-bound VPU op XLA fuses with the surrounding arithmetic.

Numerics (round-4 hardening): the reference's cumprod(1 - alpha + 1e-15)
form is forward-stable but its BACKWARD divides cotangents by the per-step
factor — once a trained density saturates a step (alpha == 1.0 exactly in
f32, i.e. delta*sigma > ~17), that division is by 1e-15 and the sigma-path
gradients overflow to inf. The reference never sees this only because its
CUDA composite kernels hand-write the backward recurrence
(raymarching.cu:697-807) instead of differentiating the cumprod. Here the
log-transmittance per step is computed directly from x = delta*sigma as
logaddexp(-x, log(1e-15)) — identical forward value (it IS
log(1 - alpha + 1e-15)), but its gradient -exp(-x)/(exp(-x) + 1e-15) is
bounded in (-1, 0], so saturated steps send their transmittance gradient
smoothly to zero instead of to inf. Found by round-4 forensics
(tools/bisect_nonfinite.py): long-schedule runs skipped ~30% of steps from
step ~140 with finite losses and inf grads confined to the sigma path.
"""

import jax.numpy as jnp

# log(1e-15): the transmittance floor, matching the reference's "+ 1e-15"
_LOG_EPS = -34.538776394910684


def _excl_cumsum(x):
    c = jnp.cumsum(x, axis=-1)
    return jnp.concatenate([jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)


def composite_weights(sigmas, z_vals, sample_dist, density_scale=1.0):
    """Per-sample compositing weights.

    Matches renderer.py:233-243's values:
        deltas  = diff(z_vals) padded with sample_dist,
        alphas  = 1 - exp(-deltas * density_scale * sigma),
        weights = alpha * cumprod([1, 1-alpha+1e-15])[:-1]
    with the cumprod computed as exp(exclusive cumsum(logaddexp(-x, log eps)))
    so saturated alphas keep bounded gradients (module docstring).

    Args:
        sigmas: [N, S] densities.
        z_vals: [N, S] sorted sample depths.
        sample_dist: [N, 1] per-ray base bin width ((far-near)/num_steps).

    Returns:
        weights: [N, S]
    """
    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.broadcast_to(sample_dist, deltas[..., :1].shape)], axis=-1
    )
    x = deltas * density_scale * sigmas
    alphas = 1.0 - jnp.exp(-x)
    log_trans = jnp.logaddexp(-x, _LOG_EPS)  # == log(1 - alpha + 1e-15)
    # T_i = prod_{j<i} (1 - a_j)
    return alphas * jnp.exp(_excl_cumsum(log_trans))


_INF = jnp.float32(jnp.inf)


def merged_composite_weights(zA, sigA, zB, sigB, sample_dist, density_scale=1.0):
    """Compositing weights for the MERGE of two per-ray *sorted* sample lists,
    without ever materializing the merged order.

    Order-free equivalent of
        w = composite_weights(sort(concat(z)), sig[argsort], sample_dist)
    split back into the two lists — the TPU answer to the reference's
    sort-then-composite (renderer.py:217-243). Sorting two already-sorted
    lists is a merge, and everything compositing needs from the merged order
    decomposes into per-list scans plus cross-list masked reductions:

      * sorted-order delta of a sample = (value of its merge successor) - z,
        where the successor value is min(next within own list, first element
        of the other list placed after it) — a masked min, no gather;
      * log-transmittance at a sample = sum of log(1-alpha) over its merge
        predecessors = exclusive cumsum within its own list + a masked sum
        over the other list.

    Tie order matches jnp.argsort(concat([A, B])) (stable): equal values
    order A before B. The cumprod becomes exp(sum(log(...))) — identical
    math, ~1e-6 relative fp difference vs composite_weights.

    Every intermediate is an elementwise-compare + reduce over [N, TA, TB]
    that XLA fuses without materialization: at training scale (4096 x 768 x
    64) this replaces a 110 ms MXU permutation gather of the 17-wide
    (z, sigma, geo_feat) rows with ~1 ms of VPU work, and frees the color
    MLP to run on the unmerged lists in place.

    Args:
        zA, sigA: [N, TA] sorted depths + densities (coarse list).
        zB, sigB: [N, TB] sorted depths + densities (fine list).
        sample_dist: [N, 1] base bin width (the reference's last-delta pad).

    Returns:
        (wA [N, TA], wB [N, TB]) compositing weights.
    """
    # successor value of A[i] in the merge: next within A, or the first
    # B >= A[i] (equal B sorts after A)
    nextA = jnp.concatenate([zA[..., 1:], jnp.full_like(zA[..., :1], _INF)], axis=-1)
    minB_ge = jnp.min(
        jnp.where(zB[:, None, :] >= zA[:, :, None], zB[:, None, :], _INF), axis=-1
    )
    succA = jnp.minimum(nextA, minB_ge)
    deltaA = jnp.where(jnp.isinf(succA), sample_dist, succA - zA)

    # successor of B[j]: next within B, or the first A strictly greater
    nextB = jnp.concatenate([zB[..., 1:], jnp.full_like(zB[..., :1], _INF)], axis=-1)
    minA_gt = jnp.min(
        jnp.where(zA[:, None, :] > zB[:, :, None], zA[:, None, :], _INF), axis=-1
    )
    succB = jnp.minimum(nextB, minA_gt)
    deltaB = jnp.where(jnp.isinf(succB), sample_dist, succB - zB)

    xA = deltaA * density_scale * sigA
    xB = deltaB * density_scale * sigB
    aA = 1.0 - jnp.exp(-xA)
    aB = 1.0 - jnp.exp(-xB)
    # log(1 - a + 1e-15) with bounded gradients at saturation (module
    # docstring): d lA / d xA = -exp(-xA) / (exp(-xA) + 1e-15) in (-1, 0]
    lA = jnp.logaddexp(-xA, _LOG_EPS)
    lB = jnp.logaddexp(-xB, _LOG_EPS)

    # log T at A[i] = sum over predecessors: own-list exclusive cumsum plus
    # every B strictly before it (B < A); at B[j] the cross set is A <= B
    crossB_at_A = jnp.sum(
        jnp.where(zB[:, None, :] < zA[:, :, None], lB[:, None, :], 0.0), axis=-1
    )
    crossA_at_B = jnp.sum(
        jnp.where(zA[:, None, :] <= zB[:, :, None], lA[:, None, :], 0.0), axis=-1
    )
    wA = aA * jnp.exp(_excl_cumsum(lA) + crossB_at_A)
    wB = aB * jnp.exp(_excl_cumsum(lB) + crossA_at_B)
    return wA, wB
