"""Tests for the offline preprocessing pipeline on synthetic raw data."""

import json
import os

import numpy as np

from lidarnerf_tpu.preprocess import rangeview as rv
from lidarnerf_tpu.preprocess.normalize import cal_centerpose_bound_scale
from lidarnerf_tpu.preprocess.kitti360_loader import (
    KITTI360Loader,
    _read_variable,
    load_perspective_intrinsics,
)
from lidarnerf_tpu.preprocess.to_nerf import write_nerfmvl_transforms, MVL_TRAIN_SPLIT


def _random_scan(rng, n=3000):
    d = rng.uniform(3, 40, n)
    az = rng.uniform(-np.pi, np.pi, n)
    el = rng.uniform(-0.4, 0.03, n)
    pts = np.stack(
        [
            d * np.cos(el) * np.cos(az),
            d * np.cos(el) * np.sin(az),
            d * np.sin(el),
            rng.rand(n),
        ],
        axis=1,
    )
    return pts.astype(np.float32)


class TestRangeview:
    def test_kitti_bin_to_npy(self, tmp_path):
        rng = np.random.RandomState(0)
        bins = []
        for i in range(2):
            pts = _random_scan(rng)
            p = tmp_path / f"{i:010d}.bin"
            pts.astype(np.float32).tofile(p)
            bins.append(str(p))
        out = tmp_path / "train"
        rv.generate_kitti_rangeviews(bins, out, points_dim=4, **rv.KITTI_RANGEVIEW)
        panos = sorted(os.listdir(out))
        assert panos == ["0000000000.npy", "0000000001.npy"]
        pano = np.load(out / panos[0])
        assert pano.shape == (66, 1030, 3)
        assert (pano[:, :, 2] > 0).sum() > 500  # depths landed
        assert pano[:, :, 0].max() == 0  # channel 0 unused

    def test_obb_covers_points(self):
        rng = np.random.RandomState(1)
        pts = rng.randn(500, 2) @ np.array([[2.0, 0.5], [0.0, 1.0]]) + 5
        obb = rv.oriented_bounding_box_xy(pts)
        assert obb.shape == (4, 2)
        from lidarnerf_tpu.utils.geometry import points_in_poly, sort_quadrilateral

        poly = sort_quadrilateral(obb)
        inside = points_in_poly(pts[:, 0], pts[:, 1], poly)
        assert inside.mean() > 0.99


class TestNormalize:
    def test_recover_scene_scale(self, tmp_path):
        rng = np.random.RandomState(0)
        paths, poses = [], []
        for i in range(3):
            pts = _random_scan(rng)
            pano = rv.lidar_to_rangeview_kitti(pts, **rv.KITTI_RANGEVIEW)
            p = tmp_path / f"{i}.npy"
            np.save(p, pano)
            paths.append(str(p))
            pose = np.eye(4)
            pose[:3, 3] = [i * 5.0, 0, 0]
            poses.append(pose)
        centerpose, scale, near, far = cal_centerpose_bound_scale(
            paths, poses, rv.KITTI_RANGEVIEW["intrinsics"]
        )
        assert 0 < scale < 1
        assert near > 0 and far < 80
        # rescaled extent must fit the unit bound
        assert scale * max(abs(c) + far for c in [0]) <= 1.0 + far * scale


class TestKITTI360Loader:
    def _make_fake_kitti(self, root):
        (root / "calibration").mkdir(parents=True)
        (root / "data_poses" / "seq_sync").mkdir(parents=True)
        (root / "data_3d_raw").mkdir(parents=True)
        with open(root / "calibration" / "perspective.txt", "w") as f:
            f.write("P_rect_00: 552 0 682 0 0 552 238 0 0 0 1 0\n")
            f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
            f.write("P_rect_01: 552 0 682 -329 0 552 238 0 0 0 1 0\n")
            f.write("R_rect_01: 1 0 0 0 1 0 0 0 1\n")
        with open(root / "calibration" / "calib_cam_to_pose.txt", "w") as f:
            for cam in ("image_00", "image_01", "image_02", "image_03"):
                f.write(f"{cam}: 1 0 0 0.5 0 1 0 0 0 0 1 -0.1\n")
        with open(root / "calibration" / "calib_cam_to_velo.txt", "w") as f:
            f.write("0 -1 0 0.2 0 0 -1 -0.3 1 0 0 -0.7\n")
        # poses: two frames, identity-ish imu_to_world
        with open(root / "data_poses" / "seq_sync" / "poses.txt", "w") as f:
            for fid in (5, 6):
                f.write(
                    f"{fid} 1 0 0 {fid * 2.0} 0 1 0 0 0 0 1 0\n"
                )
        # cam0_to_world gt consistent with the chain above
        cam_to_imu = np.array(
            [[1, 0, 0, 0.5], [0, 1, 0, 0], [0, 0, 1, -0.1], [0, 0, 0, 1]]
        )
        with open(root / "data_poses" / "seq_sync" / "cam0_to_world.txt", "w") as f:
            for fid in (5, 6):
                imu = np.eye(4)
                imu[0, 3] = fid * 2.0
                c2w = imu @ cam_to_imu  # rect = I
                f.write(str(fid) + " " + " ".join(map(str, c2w.flatten())) + "\n")

    def test_pose_chain_and_gt_check(self, tmp_path):
        root = tmp_path / "KITTI-360"
        self._make_fake_kitti(root)
        loader = KITTI360Loader(root)
        Ks, Ts = loader.load_cameras("cam_00", "seq", [5, 6])
        assert Ks.shape == (2, 3, 3)
        assert Ts.shape == (2, 4, 4)
        np.testing.assert_allclose(Ks[0][0, 0], 552.0)
        # world->cam inverse of cam->world: translation check
        c2w = np.linalg.inv(Ts[0])
        np.testing.assert_allclose(c2w[:3, 3], [10.5, 0.0, -0.1], atol=1e-9)

        velo = loader.load_lidars("seq", [5, 6])
        assert velo.shape == (2, 4, 4)
        # velo_to_world = imu@cam_to_imu@inv(cam_to_velo): orthonormal rotation
        R = velo[0][:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)

    def test_read_variable(self, tmp_path):
        p = tmp_path / "c.txt"
        p.write_text("foo: 1 2 3 4 5 6\nbar: 9 9\n")
        m = _read_variable(p, "foo", 2, 3)
        np.testing.assert_allclose(m, [[1, 2, 3], [4, 5, 6]])
        assert _read_variable(p, "baz", 1, 1) is None


class TestMVLTransforms:
    def test_write_nerfmvl_transforms(self, tmp_path):
        parent = tmp_path / "nerf_mvl"
        pano_root = parent / "nerf_mvl_7k_pano" / "car"
        pano_root.mkdir(parents=True)
        n = 6
        poses = np.stack([np.eye(4).flatten() for _ in range(n)])
        np.savetxt(pano_root / "lidar2world.txt", poses)
        for i in range(n):
            np.savez_compressed(
                pano_root / f"{i:010d}.npz", data=np.zeros((8, 16, 3))
            )
        write_nerfmvl_transforms(parent, classes=["car"])
        with open(parent / "transforms_car_train.json") as f:
            meta = json.load(f)
        assert meta["h_lidar"] == 8 and meta["w_lidar"] == 16
        assert len(meta["frames"]) == len(range(0, n, MVL_TRAIN_SPLIT["car"]))
        assert "lidar2world" in meta["frames"][0]
