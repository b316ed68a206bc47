"""Closed-form direction/position encoders (frequency, spherical harmonics).

TPU-native equivalents of the reference CUDA extensions:

- frequency encoder: /root/reference/lidarnerf/freqencoder/src/freqencoder.cu:34-63
  Output layout [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...] with the
  D input dims interleaved per block, C = D + 2*D*degree. The analytic CUDA
  backward (:68-101) is replaced by JAX autodiff of the same closed form.
- real spherical harmonics encoder:
  /root/reference/lidarnerf/shencoder/src/shencoder.cu:31-833 — hard-coded real
  SH polynomials. Degrees 1..4 cover every use in the reference (RGB direction
  branch uses degree 4 -> 16 dims).

Both are plain jitted functions: on TPU these fuse into the surrounding MLP
matmuls, so no Pallas kernel is needed.
"""

import jax.numpy as jnp


def frequency_encoding_dim(input_dim: int, degree: int) -> int:
    return input_dim + 2 * input_dim * degree


def frequency_encode(x, degree: int):
    """NeRF positional encoding, matching the reference CUDA output layout.

    Args:
        x: [..., D] input.
        degree: number of frequency octaves.

    Returns:
        [..., D + 2*D*degree] encoding
        = concat([x] + [sin(2^f x), cos(2^f x) for f in range(degree)], -1).
    """
    outs = [x]
    for f in range(degree):
        scaled = x * (2.0**f)
        outs.append(jnp.sin(scaled))
        outs.append(jnp.cos(scaled))
    return jnp.concatenate(outs, axis=-1)


def sh_encoding_dim(degree: int) -> int:
    return degree * degree


def sh_encode(d, degree: int = 4):
    """Real spherical harmonics of a direction vector, degrees 1..4.

    Coefficient table matches /root/reference/lidarnerf/shencoder/src/shencoder.cu:55-90.

    Args:
        d: [..., 3] directions (expected roughly unit-norm, like the reference).
        degree: SH degree in [1, 4]; output dim = degree**2.
    """
    if not 1 <= degree <= 4:
        raise NotImplementedError(
            f"sh_encode supports degree 1..4 (got {degree}); the reference only "
            "exercises degree 4"
        )
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z

    comps = [jnp.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        comps += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        comps += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree >= 4:
        comps += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(comps, axis=-1)
