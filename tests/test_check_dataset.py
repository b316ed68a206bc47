"""tools/check_dataset.py against a synthetic mini KITTI-360 raw tree.

Exercises the full real-data on-ramp (calibration cross-check, rangeview
generation, transforms writing, normalization, smoke train) so the day actual
KITTI-360 access exists the paper-parity run is one command (reference:
preprocess/generate_train_rangeview.py:225-258, kitti360_loader.py:144-227).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_dataset import check_dataset  # noqa: E402

SEQ = "1908"
WINDOW = range(1908, 1972)
CHECK_FRAMES = [1908, 1909, 1921, 1934, 1947, 1960]  # first 2 + the val frames


def _write_fake_kitti_tree(root):
    cal = root / "calibration"
    poses = root / "data_poses" / "2013_05_28_drive_0000_sync"
    velo = root / "data_3d_raw" / "2013_05_28_drive_0000_sync" / "velodyne_points" / "data"
    for d in (cal, poses, velo):
        d.mkdir(parents=True)

    with open(cal / "perspective.txt", "w") as f:
        f.write("P_rect_00: 552 0 682 0 0 552 238 0 0 0 1 0\n")
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write("P_rect_01: 552 0 682 -329 0 552 238 0 0 0 1 0\n")
        f.write("R_rect_01: 1 0 0 0 1 0 0 0 1\n")
    with open(cal / "calib_cam_to_pose.txt", "w") as f:
        for cam in ("image_00", "image_01", "image_02", "image_03"):
            f.write(f"{cam}: 1 0 0 0.5 0 1 0 0 0 0 1 -0.1\n")
    with open(cal / "calib_cam_to_velo.txt", "w") as f:
        f.write("0 -1 0 0.2 0 0 -1 -0.3 1 0 0 -0.7\n")

    cam_to_imu = np.array(
        [[1, 0, 0, 0.5], [0, 1, 0, 0], [0, 0, 1, -0.1], [0, 0, 0, 1]]
    )
    with open(poses / "poses.txt", "w") as fp, open(
        poses / "cam0_to_world.txt", "w"
    ) as fg:
        for fid in WINDOW:
            imu = np.eye(4)
            imu[0, 3] = (fid - 1908) * 0.5
            fp.write(f"{fid} " + " ".join(map(str, imu[:3].flatten())) + "\n")
            c2w = imu @ cam_to_imu  # rect = I
            fg.write(f"{fid} " + " ".join(map(str, c2w.flatten())) + "\n")

    # sphere-shell world: random directions x ranges in [3, 40] m
    rng = np.random.RandomState(0)
    for fid in CHECK_FRAMES:
        d = rng.randn(20000, 3)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        r = rng.uniform(3.0, 40.0, (20000, 1))
        pts = np.concatenate([d * r, rng.rand(20000, 1)], axis=1).astype(np.float32)
        pts.tofile(velo / f"{fid:010d}.bin")


@pytest.mark.slow
def test_check_dataset_end_to_end(tmp_path, monkeypatch):
    root = tmp_path / "KITTI-360"
    out = tmp_path / "nerf_data"
    _write_fake_kitti_tree(root)
    monkeypatch.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    res = check_dataset(
        str(root), str(out), sequence_id=SEQ, max_frames=2, train_steps=4,
        workspace=str(tmp_path / "ws"),
    )
    assert res["scale"] > 0
    assert 3.0 < res["near"] < res["far"] <= 45.0
    # all three splits written and non-empty after the window filter
    import json

    for split in ("train", "val", "test"):
        with open(out / f"transforms_{SEQ}_{split}.json") as f:
            d = json.load(f)
        assert len(d["frames"]) > 0
        assert d["h_lidar"] == 66 and d["w_lidar"] == 1030
    assert os.path.isfile(tmp_path / "ws" / "log_lidar_nerf.txt")


def test_check_dataset_catches_broken_calibration(tmp_path):
    """A truncated tree must fail loudly at stage 1, not crash later."""
    root = tmp_path / "KITTI-360"
    (root / "calibration").mkdir(parents=True)
    with pytest.raises(FileNotFoundError):
        check_dataset(str(root), str(tmp_path / "out"), sequence_id=SEQ)
