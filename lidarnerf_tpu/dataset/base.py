"""Ray generation for LiDAR panos and pinhole cameras.

JAX re-implementation of /root/reference/lidarnerf/dataset/base_dataset.py:16-197.
Two call styles:

- `get_lidar_rays(...)` — host-facing, mirrors the reference API (random/patch
  pixel sampling then gather), for eval paths and parity tests.
- `lidar_ray_dirs(...)` + `sample_ray_indices(...)` — device-side pieces used
  *inside* the jitted train step, so ray generation never leaves the TPU.

All trig runs in float32 regardless of ambient precision (the reference pins
ray-gen to fp32 via @autocast(enabled=False), base_dataset.py:15).
"""



import numpy as np
import jax
import jax.numpy as jnp


def _pixel_dirs(i, j, intrinsics, H, W):
    """Spherical pano direction for (float) pixel coords i (col), j (row)."""
    fov_up, fov = intrinsics
    beta = -(i - W / 2) / W * 2 * jnp.pi
    alpha = (fov_up - j / H * fov) / 180 * jnp.pi
    return jnp.stack(
        [
            jnp.cos(alpha) * jnp.cos(beta),
            jnp.cos(alpha) * jnp.sin(beta),
            jnp.sin(alpha),
        ],
        axis=-1,
    )


def lidar_ray_dirs(H, W, intrinsics, dtype=jnp.float32):
    """[H*W, 3] sensor-frame ray directions of the full pano grid."""
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij"
    )
    return _pixel_dirs(i.reshape(-1), j.reshape(-1), intrinsics, H, W)


def sample_ray_indices(key, H, W, N, patch_size):
    """Flat pixel indices for one training step — static output shape [N].

    Matches get_lidar_rays' sampling (base_dataset.py:40-79): with patches,
    N // (px*py) random top-left corners each expanded to a px x py block;
    otherwise N independent random pixels (may duplicate).
    """
    if isinstance(patch_size, int):
        px, py = patch_size, patch_size
    elif len(patch_size) == 1:
        px, py = patch_size[0], patch_size[0]
    else:
        px, py = patch_size

    if px > 1 or py > 1:
        num_patch = N // (px * py)
        kx, ky = jax.random.split(key)
        ix = jax.random.randint(kx, (num_patch,), 0, H - px)
        iy = jax.random.randint(ky, (num_patch,), 0, W - py)
        pi, pj = jnp.meshgrid(jnp.arange(px), jnp.arange(py), indexing="ij")
        offs = jnp.stack([pi.reshape(-1), pj.reshape(-1)], axis=-1)  # [p², 2]
        inds = jnp.stack([ix, iy], axis=-1)[:, None, :] + offs[None, :, :]
        inds = inds.reshape(-1, 2)
        return inds[:, 0] * W + inds[:, 1]
    return jax.random.randint(key, (N,), 0, H * W)


def rays_from_indices(pose, inds, H, W, intrinsics):
    """World-frame rays for flat pixel indices under a lidar2world pose.

    Args:
        pose: [4, 4] float32 lidar2world.
        inds: [N] int32 flat pixel indices.

    Returns:
        (rays_o [N,3], rays_d [N,3])
    """
    i = (inds % W).astype(jnp.float32)
    j = (inds // W).astype(jnp.float32)
    dirs = _pixel_dirs(i, j, intrinsics, H, W)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_lidar_rays(poses, intrinsics, H, W, N=-1, patch_size=1, key=None):
    """Reference-API ray sampler (base_dataset.py:16-105).

    Args:
        poses: [B, 4, 4] lidar2world.
        N: rays per image (-1 = all pixels, row-major).

    Returns:
        dict(rays_o [B,N,3], rays_d [B,N,3], inds [B,N])
    """
    poses = jnp.asarray(poses, jnp.float32)
    B = poses.shape[0]
    if N > 0:
        N = min(N, H * W)
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        inds = sample_ray_indices(key, H, W, N, patch_size)
        inds = jnp.broadcast_to(inds, (B, inds.shape[0]))
    else:
        inds = jnp.broadcast_to(jnp.arange(H * W), (B, H * W))

    ro, rd = jax.vmap(lambda p, ix: rays_from_indices(p, ix, H, W, intrinsics))(
        poses, inds
    )
    return {"rays_o": ro, "rays_d": rd, "inds": inds}


def get_rays(poses, intrinsics, H, W, N=-1, patch_size=1, key=None):
    """Pinhole-camera rays (base_dataset.py:109-182)."""
    poses = jnp.asarray(poses, jnp.float32)
    B = poses.shape[0]
    fx, fy, cx, cy = intrinsics
    if N > 0:
        N = min(N, H * W)
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        inds = sample_ray_indices(key, H, W, N, patch_size)
        inds = jnp.broadcast_to(inds, (B, inds.shape[0]))
    else:
        inds = jnp.broadcast_to(jnp.arange(H * W), (B, H * W))

    i = (inds % W).astype(jnp.float32) + 0.5
    j = (inds // W).astype(jnp.float32) + 0.5
    zs = jnp.ones_like(i)
    xs = (i - cx) / fx * zs
    ys = (j - cy) / fy * zs
    dirs = jnp.stack([xs, ys, zs], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = jnp.einsum("bnc,brc->bnr", dirs, poses[:, :3, :3])
    rays_o = jnp.broadcast_to(poses[:, None, :3, 3], rays_d.shape)
    return {"rays_o": rays_o, "rays_d": rays_d, "inds": inds}


def nerf_matrix_to_ngp(pose, scale=0.33, offset=(0, 0, 0)):
    """Axis permutation to instant-ngp convention (base_dataset.py:186-197)."""
    return np.array(
        [
            [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3] * scale + offset[0]],
            [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3] * scale + offset[1]],
            [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3] * scale + offset[2]],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
