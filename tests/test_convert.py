"""Tests for pano<->pointcloud converters and ray generation."""

import numpy as np
import jax
import jax.numpy as jnp

from lidarnerf_tpu.dataset import convert
from lidarnerf_tpu.dataset import base


def _reference_lidar_to_pano(pts, H, W, K, max_depth=80):
    """Direct per-point port of convert.py:99-160 as the oracle."""
    fov_up, fov = K
    fov_down = fov - fov_up
    pano = np.zeros((H, W))
    inten = np.zeros((H, W))
    dists = np.linalg.norm(pts[:, :3], axis=1)
    for p, dist in zip(pts, dists):
        if dist >= max_depth:
            continue
        x, y, z = p[:3]
        beta = np.pi - np.arctan2(y, x)
        alpha = np.arctan2(z, np.sqrt(x**2 + y**2)) + fov_down / 180 * np.pi
        c = int(round(beta / (2 * np.pi / W)))
        r = int(round(H - alpha / (fov / 180 * np.pi / H)))
        if r >= H or r < 0 or c >= W or c < 0:
            continue
        if pano[r, c] == 0.0 or pano[r, c] > dist:
            pano[r, c] = dist
            inten[r, c] = p[3]
    return pano, inten


class TestLidarToPano:
    def test_matches_per_point_oracle(self):
        rng = np.random.RandomState(0)
        n = 2000
        pts = np.zeros((n, 4))
        d = rng.uniform(2, 60, n)
        az = rng.uniform(-np.pi, np.pi, n)
        el = rng.uniform(-0.3, 0.03, n)
        pts[:, 0] = d * np.cos(el) * np.cos(az)
        pts[:, 1] = d * np.cos(el) * np.sin(az)
        pts[:, 2] = d * np.sin(el)
        pts[:, 3] = rng.rand(n)
        H, W, K = 66, 1030, (2.0, 26.9)
        pano, inten = convert.lidar_to_pano_with_intensities(pts, H, W, K)
        want_pano, want_inten = _reference_lidar_to_pano(pts, H, W, K)
        np.testing.assert_allclose(pano, want_pano, rtol=1e-12)
        # intensity ties on exactly-equal depths can differ; depths equal =>
        # compare intensity only where a unique winner exists
        same = pano == want_pano
        np.testing.assert_allclose(inten[same], want_inten[same], rtol=1e-12)

    def test_round_trip(self):
        """pano -> points -> pano is the identity on the pano."""
        rng = np.random.RandomState(1)
        H, W, K = 32, 256, (15.0, 40.0)
        pano = np.zeros((H, W))
        mask = rng.rand(H, W) > 0.5
        pano[mask] = rng.uniform(2, 50, mask.sum())
        inten = np.where(mask, rng.rand(H, W), 0)
        pts = convert.pano_to_lidar_with_intensities(pano, inten, K)
        assert pts.shape == (mask.sum(), 4)
        pano2, inten2 = convert.lidar_to_pano_with_intensities(pts, H, W, K)
        # column 0 sits exactly on the azimuth-pi seam: float32 sin(pi) < 0
        # flips it to column W on re-projection, where it is dropped — the
        # reference's per-point loop (convert.py:143-150) behaves identically,
        # so the round-trip guarantee excludes the seam column.
        np.testing.assert_allclose(pano2[:, 1:], pano[:, 1:], atol=1e-5)
        np.testing.assert_allclose(inten2[:, 1:], inten[:, 1:], atol=1e-6)

    def test_padded_variant_consistent(self):
        rng = np.random.RandomState(2)
        H, W, K = 16, 64, (10.0, 30.0)
        pano = np.where(rng.rand(H, W) > 0.3, rng.uniform(1, 20, (H, W)), 0.0)
        pts, valid = convert.pano_to_lidar_padded(pano, K)
        assert pts.shape == (H * W, 3)
        ragged = convert.pano_to_lidar(pano, K)
        np.testing.assert_allclose(pts[valid], ragged, atol=1e-6)


class TestBboxMask:
    def test_outside_rect_is_minus_one(self):
        H, W, K = 32, 128, (15.0, 40.0)
        # bbox corners straight ahead (+x)
        corners = []
        for dx in (4, 6):
            for dy in (-1, 1):
                for dz in (-0.5, 0.5):
                    corners.append([dx, dy, dz, 1.0])
        bbox = np.array(corners)
        pts = np.array([[5.0, 0.0, 0.0, 0.7], [-5.0, 0.0, 0.0, 0.3]])
        pano, inten = convert.lidar_to_pano_with_intensities_with_bbox_mask(
            pts, H, W, K, bbox
        )
        assert (pano == -1).sum() > 0
        # the forward point lands inside the rect with its distance
        assert (pano == 5.0).sum() == 1
        # the backward point is outside the bbox rect -> masked away
        assert not (pano == 5.0 * 1.0000001).any()
        assert (inten == 0.3).sum() == 0


class TestLidarRays:
    def test_full_grid_dirs_match_pano_dirs(self):
        H, W, K = 8, 32, (2.0, 26.9)
        pose = np.eye(4, dtype=np.float32)[None]
        rays = base.get_lidar_rays(jnp.array(pose), K, H, W, N=-1)
        dirs = convert.pano_dirs(H, W, K).reshape(-1, 3)
        np.testing.assert_allclose(np.asarray(rays["rays_d"][0]), dirs, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rays["rays_o"][0]), 0.0, atol=1e-7)

    def test_pose_rotation_applied(self):
        H, W, K = 8, 32, (2.0, 26.9)
        theta = 0.3
        R = np.array(
            [
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1],
            ],
            np.float32,
        )
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = R
        pose[:3, 3] = [1, 2, 3]
        rays = base.get_lidar_rays(jnp.array(pose[None]), K, H, W, N=-1)
        dirs = convert.pano_dirs(H, W, K).reshape(-1, 3)
        np.testing.assert_allclose(
            np.asarray(rays["rays_d"][0]), dirs @ R.T, atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(rays["rays_o"][0, 0]), [1, 2, 3])

    def test_patch_sampling_shape_and_contiguity(self):
        H, W, K = 66, 1030, (2.0, 26.9)
        key = jax.random.PRNGKey(0)
        inds = np.asarray(base.sample_ray_indices(key, H, W, 4096, [2, 8]))
        assert inds.shape == (4096,)
        # each 16-block is a 2x8 patch: rows differ by W between halves
        blk = inds.reshape(-1, 16)
        np.testing.assert_array_equal(blk[:, 8] - blk[:, 0], W)
        np.testing.assert_array_equal(blk[:, 1] - blk[:, 0], 1)

    def test_random_sampling_in_range(self):
        inds = np.asarray(
            base.sample_ray_indices(jax.random.PRNGKey(1), 66, 1030, 4096, 1)
        )
        assert inds.min() >= 0 and inds.max() < 66 * 1030

    def test_rays_unit_norm(self):
        H, W, K = 16, 64, (15.0, 40.0)
        rays = base.get_lidar_rays(jnp.eye(4)[None], K, H, W, N=-1)
        norms = np.linalg.norm(np.asarray(rays["rays_d"][0]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
