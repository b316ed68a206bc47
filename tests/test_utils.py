"""Tests for SSIM, mesh extraction, geometry crops, and metrics."""

import numpy as np

from lidarnerf_tpu.utils.ssim import structural_similarity
from lidarnerf_tpu.utils.mesh import marching_tetrahedra, extract_geometry, export_ply
from lidarnerf_tpu.utils.geometry import filter_bbox_dataset, points_in_poly
from lidarnerf_tpu.nerf import metrics


class TestSSIM:
    def test_identical_is_one(self):
        x = np.random.RandomState(0).rand(32, 64)
        assert abs(structural_similarity(x, x, data_range=1.0) - 1.0) < 1e-9

    def test_noise_reduces_ssim(self):
        rng = np.random.RandomState(1)
        x = rng.rand(64, 64)
        y = x + rng.randn(64, 64) * 0.5
        s = structural_similarity(x, y, data_range=1.0)
        assert s < 0.5

    def test_matches_direct_window_computation(self):
        """Cross-check one window against the SSIM formula by hand."""
        rng = np.random.RandomState(2)
        x = rng.rand(7, 7)
        y = rng.rand(7, 7)
        got = structural_similarity(x, y, data_range=1.0, win_size=7)
        # single 7x7 window: the valid region is exactly the center pixel
        ux, uy = x.mean(), y.mean()
        vx = x.var(ddof=1)
        vy = y.var(ddof=1)
        vxy = ((x - ux) * (y - uy)).sum() / (49 - 1)
        C1, C2 = 0.01**2, 0.03**2
        want = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
            (ux**2 + uy**2 + C1) * (vx + vy + C2)
        )
        np.testing.assert_allclose(got, want, rtol=1e-10)


class TestMarchingTetrahedra:
    def test_sphere_surface(self):
        n = 24
        g = np.linspace(-1, 1, n)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        vol = 0.6 - np.sqrt(X**2 + Y**2 + Z**2)  # inside>0 within r=0.6
        verts, tris = marching_tetrahedra(vol, 0.0)
        assert len(verts) > 100
        # map index coords -> world
        world = verts / (n - 1) * 2 - 1
        r = np.linalg.norm(world, axis=1)
        assert np.abs(r - 0.6).max() < 0.1
        assert np.abs(r - 0.6).mean() < 0.03

    def test_empty_volume(self):
        vol = np.zeros((8, 8, 8))
        verts, tris = marching_tetrahedra(vol, 0.5)
        assert len(verts) == 0

    def test_extract_geometry_and_ply(self, tmp_path):
        def query(pts):
            return 1.0 - np.linalg.norm(pts, axis=1)  # sphere r=1 ... threshold .5

        verts, tris = extract_geometry(
            np.full(3, -1.0), np.full(3, 1.0), 16, 0.5, query
        )
        assert len(verts) > 0
        r = np.linalg.norm(verts, axis=1)
        assert np.abs(r - 0.5).max() < 0.15
        p = tmp_path / "m.ply"
        export_ply(str(p), verts, tris)
        head = p.read_text().splitlines()
        assert head[0] == "ply"
        assert any("element vertex" in line for line in head[:6])


class TestGeometry:
    def test_points_in_poly_square(self):
        poly = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
        inside = points_in_poly(
            np.array([1.0, 3.0, -1.0]), np.array([1.0, 1.0, 1.0]), poly
        )
        assert inside[0] and not inside[1] and not inside[2]

    def test_filter_bbox(self):
        # axis-aligned OBB [0,2]^3
        corners = np.array(
            [[x, y, z] for x in (0, 2) for y in (0, 2) for z in (0, 2)], float
        )
        pts = np.array([[1, 1, 1], [3, 1, 1], [1, 1, 5], [1.5, 0.5, 1.9]])
        out = filter_bbox_dataset(pts, corners)
        assert len(out) == 2
        assert ([1, 1, 1] == out).all(axis=1).any()


class TestMeters:
    def test_depth_meter_clamps_and_reports(self):
        m = metrics.DepthMeter(scale=0.5)
        pred = np.random.RandomState(0).rand(1, 16, 32) * 40
        gt = pred + 0.5
        m.update(pred, gt)
        rmse, a1, a2, a3, ssim = m.measure()
        assert 0 < rmse < 5
        assert 0.8 < a1 <= 1.0
        assert a1 <= a2 <= a3 <= 1.0

    def test_points_meter_chamfer_zero_for_identical(self):
        m = metrics.PointsMeter(scale=1.0, intrinsics=(2.0, 26.9))
        pano = np.random.RandomState(1).rand(1, 16, 32) * 50
        m.update(pano, pano.copy())
        cd, f = m.measure()
        assert cd < 1e-9
        assert f == 1.0

    def test_mae_meter_scaling(self):
        m = metrics.MAEMeter(intensity_inv_scale=255.0)
        a = np.zeros((1, 4, 4))
        b = np.full((1, 4, 4), 0.1)
        m.update(a, b)
        np.testing.assert_allclose(m.measure(), 25.5, rtol=1e-6)

    def test_rmse_psnr(self):
        r = metrics.RMSEMeter()
        p = metrics.PSNRMeter()
        a = np.zeros((1, 8, 8))
        b = np.full((1, 8, 8), 0.5)
        r.update(a, b)
        p.update(a, b)
        np.testing.assert_allclose(r.measure(), 0.5, rtol=1e-6)
        np.testing.assert_allclose(p.measure(), -10 * np.log10(0.25), rtol=1e-6)


class TestCheckpointRobustness:
    def test_corrupt_latest_falls_back(self, tmp_path):
        """A truncated latest ckpt must not break resume (atomic-write + skip)."""
        import pickle
        from types import SimpleNamespace

        from lidarnerf_tpu.models.network import NeRFNetwork
        from lidarnerf_tpu.nerf.trainer import Trainer

        opt = SimpleNamespace(
            alpha_d=1e3, alpha_r=1.0, alpha_i=1.0, alpha_grad_norm=1.0,
            alpha_spatial=0.1, alpha_tv=1.0, alpha_grad=1e2,
            depth_loss="l1", depth_grad_loss="l1", intensity_loss="mse",
            raydrop_loss="mse", spatial_smooth=False, grad_norm_smooth=False,
            tv_loss=False, grad_loss=False, sobel_grad=False, scale=0.05,
            num_rays_lidar=64, H_lidar=8, W_lidar=16,
            intrinsics_lidar=(10.0, 30.0), lr=1e-2, iters=10,
            num_steps=8, upsample_steps=2, min_near_lidar=0.05, min_near=0.05,
            bound=1.0, seed=0, max_ray_batch=64, patch_size_lidar=1,
            change_patch_size_lidar=[1, 1], change_patch_size_epoch=2,
            dataloader="kitti360", alpha_r_pos=True,
        )
        module = NeRFNetwork(desired_resolution=32, log2_hashmap_size=8, num_levels=2)
        tr = Trainer("t", opt, module, workspace=str(tmp_path), ema_decay=0.95,
                     use_checkpoint="scratch")
        tr.epoch = 3
        tr.save_checkpoint(full=True)
        tr.epoch = 4
        tr.save_checkpoint(full=True)
        # truncate the latest
        latest = sorted((tmp_path / "checkpoints").glob("t_ep*.ckpt"))[-1]
        data = latest.read_bytes()
        latest.write_bytes(data[: len(data) // 2])

        tr2 = Trainer("t", opt, module, workspace=str(tmp_path), ema_decay=0.95,
                      use_checkpoint="latest")
        assert tr2.epoch == 3  # fell back to the intact epoch-3 ckpt


class TestOrbaxCheckpoint:
    def _opt(self):
        from types import SimpleNamespace

        return SimpleNamespace(
            alpha_d=1e3, alpha_r=1.0, alpha_i=1.0, alpha_grad_norm=1.0,
            alpha_spatial=0.1, alpha_tv=1.0, alpha_grad=1e2,
            depth_loss="l1", depth_grad_loss="l1", intensity_loss="mse",
            raydrop_loss="mse", spatial_smooth=False, grad_norm_smooth=False,
            tv_loss=False, grad_loss=False, sobel_grad=False, scale=0.05,
            num_rays_lidar=64, H_lidar=8, W_lidar=16,
            intrinsics_lidar=(10.0, 30.0), lr=1e-2, iters=10,
            num_steps=8, upsample_steps=2, min_near_lidar=0.05, min_near=0.05,
            bound=1.0, seed=0, max_ray_batch=64, patch_size_lidar=1,
            change_patch_size_lidar=[1, 1], change_patch_size_epoch=2,
            dataloader="kitti360", alpha_r_pos=True,
        )

    def test_orbax_round_trip_and_keep2(self, tmp_path):
        """Orbax-format ckpts resume exactly (params/opt/rng) and honor keep-2."""
        import numpy as np
        import jax
        from lidarnerf_tpu.models.network import NeRFNetwork
        from lidarnerf_tpu.nerf.trainer import Trainer

        opt = self._opt()
        module = NeRFNetwork(desired_resolution=32, log2_hashmap_size=8, num_levels=2)
        tr = Trainer("t", opt, module, workspace=str(tmp_path), ema_decay=0.95,
                     use_checkpoint="scratch", ckpt_format="orbax")
        for ep in (1, 2, 3):
            tr.epoch = ep
            tr.global_step = ep * 7
            tr.save_checkpoint(full=True)
        ckpts = sorted((tmp_path / "checkpoints").glob("t_ep*.ckpt"))
        assert len(ckpts) == 2  # keep-2 ring removed the epoch-1 directory
        assert all(p.is_dir() for p in ckpts)

        tr2 = Trainer("t", opt, module, workspace=str(tmp_path), ema_decay=0.95,
                      use_checkpoint="latest", ckpt_format="orbax")
        assert tr2.epoch == 3 and tr2.global_step == 21
        for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(tr.opt_state), jax.tree.leaves(tr2.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(tr.rng), np.asarray(tr2.rng))

    def test_orbax_incomplete_dir_falls_back(self, tmp_path):
        """A half-written orbax dir (no arrays store) is skipped on resume."""
        import shutil
        from lidarnerf_tpu.models.network import NeRFNetwork
        from lidarnerf_tpu.nerf.trainer import Trainer

        opt = self._opt()
        module = NeRFNetwork(desired_resolution=32, log2_hashmap_size=8, num_levels=2)
        tr = Trainer("t", opt, module, workspace=str(tmp_path), ema_decay=0.95,
                     use_checkpoint="scratch", ckpt_format="orbax")
        tr.epoch = 3
        tr.save_checkpoint(full=True)
        tr.epoch = 4
        tr.save_checkpoint(full=True)
        latest = sorted((tmp_path / "checkpoints").glob("t_ep*.ckpt"))[-1]
        shutil.rmtree(latest / "arrays")  # simulate crash mid-save

        tr2 = Trainer("t", opt, module, workspace=str(tmp_path), ema_decay=0.95,
                      use_checkpoint="latest", ckpt_format="orbax")
        assert tr2.epoch == 3

    def test_orbax_overwrite_is_crash_safe(self, tmp_path):
        """Overwriting a ckpt never deletes-before-rename; .old recovers."""
        import os
        import numpy as np
        from lidarnerf_tpu.utils import checkpoint_io

        path = str(tmp_path / "best.ckpt")
        a = {"epoch": 1, "model": {"w": np.arange(4.0)}}
        b = {"epoch": 2, "model": {"w": np.arange(4.0) * 2}}
        checkpoint_io.dump_state(a, path, fmt="orbax")
        checkpoint_io.dump_state(b, path, fmt="orbax")  # overwrite in place
        assert checkpoint_io.load_state(path)["epoch"] == 2
        assert not os.path.exists(path + ".old")  # cleaned up after swap

        # simulate a crash landing between the two renames: only .old exists
        os.replace(path, path + ".old")
        state = checkpoint_io.load_state(path)
        assert state["epoch"] == 2
        np.testing.assert_array_equal(state["model"]["w"], b["model"]["w"])
