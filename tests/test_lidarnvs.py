"""Tests for the classical NVS baselines (PCGen, ray-drop nets, eval)."""

import numpy as np
import pytest

from lidarnerf_tpu.lidarnvs.pcgen import LidarNVSPCGen, generate_raydrop_data_pcgen, get_direction
from lidarnerf_tpu.lidarnvs.raydrop_pcgen import RayDropTrainer, get_embedder, pack_rays
from lidarnerf_tpu.lidarnvs.eval import eval_points_and_pano
from lidarnerf_tpu.dataset.convert import pano_dirs


class FakeDataset:
    """Minimal dataset: sensor at origin + sensor at (1,0,0), sphere world."""

    def __init__(self, n_frames=2, H=24, W=96):
        self.H_lidar = H
        self.W_lidar = W
        self.intrinsics_lidar = (10.0, 30.0)
        rng = np.random.RandomState(0)
        self.poses_lidar = []
        self.images_lidar = []
        dirs = pano_dirs(H, W, self.intrinsics_lidar).reshape(-1, 3)
        for i in range(n_frames):
            t = np.array([i * 0.5, 0.0, 0.0])
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = t
            o = np.broadcast_to(t, dirs.shape)
            b = 2 * np.sum(o * dirs, 1)
            c = np.sum(o * o, 1) - 64.0
            disc = b * b - 4 * c
            s = np.where(disc > 0, (-b + np.sqrt(np.maximum(disc, 0))) / 2, 0.0)
            depth = np.where(s > 0, s, 0.0).reshape(H, W)
            inten = np.where(depth > 0, 0.5, 0.0)
            self.poses_lidar.append(pose)
            self.images_lidar.append(
                np.stack([np.zeros_like(depth), inten, depth], -1).astype(np.float32)
            )

    def __len__(self):
        return len(self.poses_lidar)


class TestPCGen:
    def test_fit_and_predict_roundtrip(self):
        ds = FakeDataset()
        nvs = LidarNVSPCGen(raycasting="cp")
        nvs.fit(ds)
        assert len(nvs.points) > 1000
        pred = nvs.predict_frame(
            ds.intrinsics_lidar, ds.poses_lidar[0], ds.H_lidar, ds.W_lidar
        )
        gt_pano = ds.images_lidar[0][:, :, 2]
        # predicting the train view itself: depths should broadly agree
        both = (pred["pano"] > 0) & (gt_pano > 0)
        assert both.mean() > 0.5
        err = np.abs(pred["pano"][both] - gt_pano[both])
        assert np.median(err) < 0.5

    def test_fpa_raycasting(self):
        ds = FakeDataset()
        nvs = LidarNVSPCGen(raycasting="fpa")
        nvs.fit(ds)
        pred = nvs.predict_frame(
            ds.intrinsics_lidar, ds.poses_lidar[0], ds.H_lidar, ds.W_lidar
        )
        assert (pred["pano"] > 0).sum() > 100

    def test_generate_raydrop_data(self):
        ds = FakeDataset()
        nvs = LidarNVSPCGen(raycasting="cp")
        nvs.fit(ds)
        dirs, panos, intens, masks = generate_raydrop_data_pcgen(ds, nvs)
        assert len(dirs) == len(ds)
        rays = pack_rays(dirs, panos, intens, masks)
        assert rays.shape[1] == 6
        assert set(np.unique(rays[:, 5])) <= {0.0, 1.0}


class TestRayDropMLP:
    def test_embedder_dims(self):
        fn, dim = get_embedder(4, input_dims=1, i=0)
        assert dim == 1 + 2 * 4
        fn_id, dim_id = get_embedder(4, input_dims=3, i=-1)
        assert dim_id == 3
        import jax.numpy as jnp

        x = jnp.ones((5, 1))
        assert fn(x).shape == (5, 9)
        assert fn_id(jnp.ones((5, 3))).shape == (5, 3)

    def test_learns_separable_raydrop(self):
        """Rays pointing up are dropped; the MLP should learn that."""
        rng = np.random.RandomState(0)
        n = 4096
        dirs = rng.randn(n, 3)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        depth = rng.rand(n, 1) * 50
        inten = rng.rand(n, 1)
        target = (dirs[:, 2] < 0).astype(np.float32)
        rays = np.concatenate([dirs, depth, inten, target[:, None]], 1).astype(
            np.float32
        )
        tr = RayDropTrainer(netdepth=2, netwidth=32, i_embed=-1, lrate=5e-3, n_iters=300)
        tr.train(rays, N_rand=512, n_iters=300, verbose=False)
        probs = tr.predict(rays[:, :5])
        acc = ((probs > 0.5) == (target > 0.5)).mean()
        assert acc > 0.9, acc

    def test_checkpoint_roundtrip(self, tmp_path):
        tr = RayDropTrainer(netdepth=2, netwidth=16, basedir=str(tmp_path))
        path = tr.save_checkpoint(42)
        tr2 = RayDropTrainer(netdepth=2, netwidth=16, basedir=str(tmp_path))
        step = tr2.load_checkpoint(path)
        assert step == 42
        import jax

        for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEval:
    def test_identical_prediction_is_perfect(self):
        rng = np.random.RandomState(0)
        H, W = 16, 32
        pano = rng.uniform(1, 40, (H, W))
        inten = rng.rand(H, W)
        pts = rng.rand(500, 3).astype(np.float32) * 10
        m = eval_points_and_pano(pts, pts.copy(), inten, inten.copy(), pano, pano.copy())
        assert m["chamfer"] < 1e-9
        assert m["f_score"] == 1.0
        assert m["depth_rmse"] < 1e-9
        assert m["intensity_mae"] < 1e-12
        assert abs(m["depth_ssim"] - 1.0) < 1e-9
        assert m["depth_a1"] == 1.0

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            eval_points_and_pano(
                np.zeros((5, 2)), np.zeros((5, 3)),
                np.zeros((4, 4)), np.zeros((4, 4)),
                np.zeros((4, 4)), np.zeros((4, 4)),
            )


class TestUNetRaydrop:
    def test_unet_shapes_and_dice(self):
        import jax
        import jax.numpy as jnp
        from lidarnerf_tpu.lidarnvs.unet import UNet, dice_coeff

        net = UNet(n_channels=10, n_classes=1)
        x = jnp.zeros((1, 32, 64, 10))
        variables = net.init(jax.random.PRNGKey(0), x, train=False)
        y = net.apply(variables, x, train=False)
        assert y.shape == (1, 32, 64, 1)
        d = dice_coeff(jnp.ones((2, 8, 8)), jnp.ones((2, 8, 8)))
        np.testing.assert_allclose(float(d), 1.0, rtol=1e-5)

    def test_trainer_one_epoch(self, tmp_path):
        import pickle

        rng = np.random.RandomState(0)
        H, W = 16, 32

        def frame():
            return {
                "hit_masks": rng.rand(H, W),
                "hit_depths": rng.rand(H, W),
                "hit_normals": rng.rand(H, W, 3),
                "hit_incidences": rng.rand(H, W),
                "intensities": rng.rand(H, W),
                "rays_d": rng.rand(H, W, 3),
                "raydrop_masks": (rng.rand(H, W) > 0.5).astype(np.float32),
            }

        for split, n in [("train", 2), ("test", 1)]:
            with open(tmp_path / f"{split}_data.pkl", "wb") as f:
                pickle.dump([frame() for _ in range(n)], f)

        from lidarnerf_tpu.lidarnvs.raydrop_unet import UNetRaydropTrainer

        tr = UNetRaydropTrainer(learning_rate=1e-4)
        hist = tr.train(tmp_path, tmp_path / "ckpt", epochs=1, verbose=False)
        assert len(hist) == 1
        assert np.isfinite(hist[0]["loss"])
        assert (tmp_path / "ckpt" / "checkpoint_epoch1.ckpt").exists()

    def test_cli_smoke(self, tmp_path, monkeypatch):
        """lidarnvs/raydrop_train_poisson.py end to end on tiny pickles
        (reference CLI: raydrop_train_poisson.py:262-354). Runs main()
        in-process (test_e2e.py pattern) to share the compile cache."""
        import importlib
        import pickle
        import sys

        rng = np.random.RandomState(1)
        H, W = 16, 32

        def frame():
            return {
                "hit_masks": rng.rand(H, W),
                "hit_depths": rng.rand(H, W),
                "hit_normals": rng.rand(H, W, 3),
                "hit_incidences": rng.rand(H, W),
                "intensities": rng.rand(H, W),
                "rays_d": rng.rand(H, W, 3),
                "raydrop_masks": (rng.rand(H, W) > 0.5).astype(np.float32),
            }

        for split, n in [("train", 2), ("test", 1)]:
            with open(tmp_path / f"{split}_data.pkl", "wb") as f:
                pickle.dump([frame() for _ in range(n)], f)

        cli = importlib.import_module("lidarnvs.raydrop_train_poisson")
        argv = [
            "raydrop_train_poisson.py",
            "--data_dir", str(tmp_path), "--ckpt_dir", str(tmp_path / "ckpt"),
            "--epochs", "1", "--batch-size", "2", "--learning-rate", "1e-4",
        ]
        monkeypatch.setattr(sys, "argv", argv)
        cli.main()
        assert (tmp_path / "ckpt" / "checkpoint_epoch1.ckpt").exists()

        # --load resumes from the checkpoint it just wrote
        monkeypatch.setattr(
            sys, "argv",
            argv[:3] + ["--ckpt_dir", str(tmp_path / "ckpt2"), "--epochs", "1",
                        "--load", str(tmp_path / "ckpt" / "checkpoint_epoch1.ckpt")],
        )
        cli.main()
        assert (tmp_path / "ckpt2" / "checkpoint_epoch1.ckpt").exists()

        # reference guard: only the single-class pipeline is reachable
        monkeypatch.setattr(sys, "argv", argv + ["--classes", "2"])
        with pytest.raises(SystemExit):
            cli.main()


def _install_fake_open3d(monkeypatch, radius=8.0):
    """Numpy-only open3d stand-in covering exactly the API surface meshing.py
    touches (reference lidarnvs_meshing.py:55-334): PointCloud/KDTreeFlann/
    Poisson meshing/RaycastingScene. The raycaster intersects the same
    analytic sphere FakeDataset renders, so predicted panos are comparable
    to the ground truth."""
    import sys
    import types

    o3d = types.ModuleType("open3d")
    geometry = types.ModuleType("open3d.geometry")
    utility = types.ModuleType("open3d.utility")
    core = types.ModuleType("open3d.core")
    t_mod = types.ModuleType("open3d.t")
    t_geometry = types.ModuleType("open3d.t.geometry")

    class Vector3dVector:
        def __init__(self, arr):
            self.arr = np.asarray(arr, dtype=np.float64)

        def __array__(self, dtype=None, copy=None):
            return self.arr if dtype is None else self.arr.astype(dtype)

    class PointCloud:
        def __init__(self):
            self.points = None
            self.normals = None

        def estimate_normals(self):
            pts = np.asarray(self.points)
            self.normals = Vector3dVector(
                pts / (np.linalg.norm(pts, axis=1, keepdims=True) + 1e-9)
            )

    class FakeMesh:
        def __init__(self, vertices):
            self.vertices = vertices
            self.removed_mask = None

        def remove_vertices_by_mask(self, mask):
            self.removed_mask = np.asarray(mask)

    class TriangleMesh:
        def __init__(self, vertices=None, triangles=None):
            # constructible form used by the NKSR baseline
            # (meshing.py LidarNVSNKSR.meshing_func)
            self.vertices = vertices
            self.triangles = triangles
            self.removed_mask = None

        @staticmethod
        def create_from_point_cloud_poisson(pcd, depth=8):
            pts = np.asarray(pcd.points)
            densities = np.linspace(0.0, 1.0, len(pts))
            return FakeMesh(pts), densities

    class KDTreeFlann:
        def __init__(self, pcd):
            self.pts = np.asarray(pcd.points)

        def search_knn_vector_3d(self, p, k):
            d = np.linalg.norm(self.pts - np.asarray(p), axis=1)
            idx = np.argsort(d)[:k]
            return k, idx.tolist(), (d[idx] ** 2).tolist()

    class _T:
        def __init__(self, a):
            self._a = np.asarray(a)

        def numpy(self):
            return self._a

    class Tensor:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

    class RaycastingScene:
        def add_triangles(self, mesh):
            self.mesh = mesh

        def cast_rays(self, tensor):
            rays = np.asarray(tensor.arr)
            o, d = rays[:, :3], rays[:, 3:]
            b = 2 * np.sum(o * d, 1)
            c = np.sum(o * o, 1) - radius * radius
            disc = b * b - 4 * c
            t = np.where(disc > 0, (-b + np.sqrt(np.maximum(disc, 0))) / 2, np.inf)
            t = np.where(t > 1e-6, t, np.inf)
            hitp = o + d * np.where(np.isfinite(t), t, 0.0)[:, None]
            normals = -hitp / (np.linalg.norm(hitp, axis=1, keepdims=True) + 1e-9)
            return {
                "t_hit": _T(t.astype(np.float32)),
                "primitive_normals": _T(normals.astype(np.float32)),
            }

    class TTriangleMesh:
        @staticmethod
        def from_legacy(mesh):
            return mesh

    geometry.PointCloud = PointCloud
    geometry.TriangleMesh = TriangleMesh
    geometry.KDTreeFlann = KDTreeFlann
    utility.Vector3dVector = Vector3dVector
    utility.Vector3iVector = Vector3dVector
    core.Tensor = Tensor
    t_geometry.RaycastingScene = RaycastingScene
    t_geometry.TriangleMesh = TTriangleMesh
    t_mod.geometry = t_geometry
    o3d.geometry = geometry
    o3d.utility = utility
    o3d.core = core
    o3d.t = t_mod
    monkeypatch.setitem(sys.modules, "open3d", o3d)
    return o3d


class _ConstRaydrop:
    """Stands in for UNetRaydropTrainer.predict: keep every ray."""

    def predict(self, features):
        return np.ones(features.shape[:3], dtype=np.float32)


class TestMeshingBaselines:
    def test_poisson_full_flow(self, monkeypatch):
        """Executes fit -> predict_frame -> predict_frame_with_raydrop ->
        generate_raydrop_data_meshing (reference lidarnvs_meshing.py:55-435)
        against the numpy open3d stub."""
        _install_fake_open3d(monkeypatch)
        from lidarnerf_tpu.lidarnvs.meshing import (
            LidarNVSPoisson,
            generate_raydrop_data_meshing,
        )

        ds = FakeDataset()
        nvs = LidarNVSPoisson(depth=11, min_density=0.3, k=3)
        nvs.fit(ds)
        # density-quantile filter ran on the fake mesh
        assert nvs.mesh.removed_mask is not None
        assert nvs.mesh.removed_mask.mean() == pytest.approx(0.3, abs=0.02)

        pred = nvs.predict_frame(
            ds.intrinsics_lidar, ds.poses_lidar[0], ds.H_lidar, ds.W_lidar
        )
        gt_pano = ds.images_lidar[0][:, :, 2]
        both = (pred["pano"] > 0) & (gt_pano > 0)
        assert both.mean() > 0.5
        # analytic-sphere raycast reproduces the rendered sphere depths
        assert np.median(np.abs(pred["pano"][both] - gt_pano[both])) < 0.1
        # kNN intensity interpolation pulled from the constant-0.5 source
        assert pred["intensities"][both].mean() == pytest.approx(0.5, abs=0.05)

        nvs.raydrop = _ConstRaydrop()
        pred_rd = nvs.predict_frame_with_raydrop(
            ds.intrinsics_lidar, ds.poses_lidar[0], ds.H_lidar, ds.W_lidar
        )
        np.testing.assert_allclose(pred_rd["pano"], pred["pano"], atol=1e-6)

        data = generate_raydrop_data_meshing(ds, nvs)
        assert len(data) == len(ds)
        H, W = ds.H_lidar, ds.W_lidar
        for d in data:
            assert d["hit_masks"].shape == (H, W)
            assert d["hit_normals"].shape == (H, W, 3)
            assert d["rays_d"].shape == (H, W, 3)
            assert set(np.unique(d["raydrop_masks"])) <= {0.0, 1.0}

    def test_nksr_full_flow(self, monkeypatch):
        """Executes the NKSR fit -> predict_frame flow (reference
        lidarnvs_nksr.py:26-50) against the numpy open3d stub plus a fake
        `nksr` module, so API typos in LidarNVSNKSR cannot ship silently."""
        import sys
        import types

        import torch

        _install_fake_open3d(monkeypatch)
        calls = {}

        class _DualMesh:
            def __init__(self, pts):
                self.v = torch.from_numpy(pts[:8].copy())
                self.f = torch.zeros((4, 3), dtype=torch.int64)

        class _Field:
            def __init__(self, pts):
                self._pts = pts

            def extract_dual_mesh(self, mise_iter=0):
                calls["mise_iter"] = mise_iter
                return _DualMesh(self._pts)

        class _Reconstructor:
            def __init__(self, device):
                calls["device"] = device

            def reconstruct(self, pts, nrm):
                assert pts.shape == nrm.shape and pts.dtype == torch.float32
                calls["n_points"] = int(pts.shape[0])
                return _Field(pts.cpu().numpy())

        nksr = types.ModuleType("nksr")
        nksr.Reconstructor = _Reconstructor
        monkeypatch.setitem(sys.modules, "nksr", nksr)

        from lidarnerf_tpu.lidarnvs.meshing import LidarNVSNKSR

        ds = FakeDataset()
        nvs = LidarNVSNKSR(k=3)
        nvs.fit(ds)
        # the reconstructor saw every accumulated point + the reference's
        # mise_iter=1 dual-mesh extraction (lidarnvs_nksr.py:40-44)
        assert calls["n_points"] == len(nvs.points)
        assert calls["mise_iter"] == 1
        assert str(calls["device"]) == "cpu"

        pred = nvs.predict_frame(
            ds.intrinsics_lidar, ds.poses_lidar[0], ds.H_lidar, ds.W_lidar
        )
        gt_pano = ds.images_lidar[0][:, :, 2]
        both = (pred["pano"] > 0) & (gt_pano > 0)
        assert both.mean() > 0.5
        assert np.median(np.abs(pred["pano"][both] - gt_pano[both])) < 0.1

    def test_raydrop_requires_checkpoint(self, monkeypatch):
        _install_fake_open3d(monkeypatch)
        from lidarnerf_tpu.lidarnvs.meshing import LidarNVSPoisson

        nvs = LidarNVSPoisson()
        ds = FakeDataset()
        nvs.fit(ds)
        with pytest.raises(RuntimeError, match="ray-drop"):
            nvs.predict_frame_with_raydrop(
                ds.intrinsics_lidar, ds.poses_lidar[0], ds.H_lidar, ds.W_lidar
            )
