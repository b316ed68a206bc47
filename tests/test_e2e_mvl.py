"""End-to-end NeRF-MVL flow: synthetic npz dataset with OBB masks -> CLI."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lidarnerf_tpu.dataset.convert import pano_dirs

H, W = 16, 64
K_LIDAR = (15.0, 40.0)


def write_synthetic_mvl(root, cls="car", n_train=3, n_val=2):
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    dirs = pano_dirs(H, W, K_LIDAR).reshape(-1, 3)

    # object: a box of half-extent 1 at distance ~6 along +x
    center = np.array([6.0, 0.0, 0.0])
    obb = np.array(
        [center + [sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    np.save(
        os.path.join(root, "dataset_bbox_7k.npy"),
        {cls: obb},
        allow_pickle=True,
    )

    def make_frame(i):
        t = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5), 0.0])
        pose = np.eye(4)
        pose[:3, 3] = t
        # ray-sphere for a sphere of radius 1 at center (stand-in object)
        o = np.broadcast_to(t - center, dirs.shape)
        b = 2 * np.sum(o * dirs, 1)
        c = np.sum(o * o, 1) - 1.0
        disc = b * b - 4 * c
        s = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 0.0)
        hit = (disc > 0) & (s > 0)
        depth = np.where(hit, s, 0.0)
        inten = np.where(hit, 0.6, 0.0)
        # bbox mask: everything outside the projected object region is -1
        pano = np.where(hit, depth, -1.0)
        # open a rectangle of valid-but-empty pixels around the hits
        hm = hit.reshape(H, W)
        ys, xs = np.nonzero(hm)
        r0, r1 = max(ys.min() - 2, 0), min(ys.max() + 3, H)
        c0, c1 = max(xs.min() - 2, 0), min(xs.max() + 3, W)
        pano2d = pano.reshape(H, W).copy()
        rect = np.zeros((H, W), bool)
        rect[r0:r1, c0:c1] = True
        pano2d[rect & ~hm] = 0.0
        data = np.stack(
            [np.zeros((H, W)), inten.reshape(H, W), pano2d], axis=-1
        ).astype(np.float32)
        fn = f"{cls}/{i:010d}.npz"
        os.makedirs(os.path.join(root, cls), exist_ok=True)
        np.savez_compressed(os.path.join(root, fn), data=data)
        return {"lidar_file_path": fn, "lidar2world": pose.tolist()}

    idx = 0
    for split, n in [("train", n_train), ("val", n_val), ("test", n_val)]:
        frames = [make_frame(idx + k) for k in range(n)]
        idx += n
        meta = {"w_lidar": W, "h_lidar": H, "aabb_scale": 2, "frames": frames}
        with open(os.path.join(root, f"transforms_{cls}_{split}.json"), "w") as f:
            json.dump(meta, f)


@pytest.mark.slow
def test_mvl_cli_flow(tmp_path, monkeypatch):
    data_root = str(tmp_path / "data")
    workspace = str(tmp_path / "ws")
    write_synthetic_mvl(data_root)

    import main_lidarnerf as cli

    argv = [
        "main_lidarnerf.py",
        "--config", "configs/nerf_mvl.txt",
        "--path", data_root,
        "--workspace", workspace,
        "--iters", "24",
        "--num_steps", "32",
        "--upsample_steps", "8",
        "--num_rays_lidar", "256",
        "--desired_resolution", "128",
        "--log2_hashmap_size", "12",
        "--eval_interval", "8",
        "--max_ray_batch", "256",
        "--scale", "0.05",
        "--offset", "0", "0", "0",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cli.main()

    assert os.path.exists(os.path.join(workspace, "log_lidar_nerf.txt"))
    # MVL eval path ran (crop metrics + validation artifacts)
    vdir = os.path.join(workspace, "validation")
    assert os.path.isdir(vdir) and len(os.listdir(vdir)) > 0
    # test outputs include OBB-cropped predicted point clouds
    rdir = os.path.join(workspace, "results")
    assert any(n.endswith("_depth_lidar.npy") for n in os.listdir(rdir))


def test_mvl_dataset_masked_pools(tmp_path):
    data_root = str(tmp_path / "data")
    write_synthetic_mvl(data_root)
    from lidarnerf_tpu.dataset.nerfmvl import NeRFMVLDataset

    ds = NeRFMVLDataset(
        split="train", root_path=data_root, sequence_id="car", scale=0.05
    )
    idx, counts = ds.valid_indices_padded()
    assert idx.shape[0] == len(ds)
    assert (counts > 0).all()
    # every pooled index must point at a valid (mask > -1) pixel
    for n in range(len(ds)):
        flat = ds.images_lidar[n, :, :, 0].reshape(-1)
        assert (flat[idx[n, : counts[n]]] > -1).all()

    # collate in test mode exposes OBB_local
    ds_test = NeRFMVLDataset(
        split="test", root_path=data_root, sequence_id="car", scale=0.05
    )
    out = ds_test.collate([0])
    assert out["OBB_local"].shape == (8, 4)
    assert out["images_lidar"].shape == (1, H, W, 3)


def test_mvl_collate_rejects_batch_gt1(tmp_path):
    """Training collate uses the first frame's bbox mask for the whole batch,
    which is only correct at batch=1 (reference nerfmvl_dataset.py:153-168 has
    the same single-frame assumption via DataLoader batch_size=1)."""
    data_root = str(tmp_path / "data")
    write_synthetic_mvl(data_root)
    from lidarnerf_tpu.dataset.nerfmvl import NeRFMVLDataset

    ds = NeRFMVLDataset(
        split="train", root_path=data_root, sequence_id="car", scale=0.05
    )
    out = ds.collate([0])  # batch=1 works
    assert out["images_lidar"].shape[0] == 1
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="batch=1"):
        ds.collate([0, 1])
