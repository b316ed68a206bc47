"""End-to-end smoke: synthetic KITTI-style dataset on disk -> CLI train/eval/test.

Mirrors the reference's full experiment flow (SURVEY.md §3.1-3.3) on a tiny
analytic scene: generated pano npys + transforms_*.json -> main_lidarnerf
train -> checkpoints -> evaluate (full meter suite incl. Chamfer) -> test
outputs -> mesh export.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lidarnerf_tpu.dataset.convert import pano_dirs

H, W = 16, 64
K_LIDAR = (2.0, 26.9)


def write_synthetic_kitti(root, n_train=4, n_val=2, n_test=2):
    """Sphere-world panos in the transforms_{seq}_{split}.json schema."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    dirs = pano_dirs(H, W, K_LIDAR).reshape(-1, 3)

    def make_frame(i):
        t = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), 0.0]) * 2.0
        pose = np.eye(4)
        pose[:3, 3] = t
        o = np.broadcast_to(t, dirs.shape)
        b = 2 * np.sum(o * dirs, axis=1)
        c = np.sum(o * o, axis=1) - 64.0
        disc = b * b - 4 * c
        s = np.where(disc > 0, (-b + np.sqrt(np.maximum(disc, 0))) / 2, 0.0)
        hit = (disc > 0) & (s > 0)
        depth = np.where(hit, s, 0.0)
        inten = np.where(hit, 0.5, 0.0)
        pano = np.stack([np.zeros_like(depth), inten, depth], -1).reshape(H, W, 3)
        fn = f"frame_{i:04d}.npy"
        np.save(os.path.join(root, fn), pano.astype(np.float32))
        return {
            "file_path": fn,
            "lidar_file_path": fn,
            "transform_matrix": pose.tolist(),
            "lidar2world": pose.tolist(),
        }

    idx = 0
    for split, n in [("train", n_train), ("val", n_val), ("test", n_test)]:
        frames = [make_frame(idx + k) for k in range(n)]
        idx += n
        meta = {
            "w": W,
            "h": H,
            "w_lidar": W,
            "h_lidar": H,
            "aabb_scale": 2,
            "frames": frames,
        }
        with open(os.path.join(root, f"transforms_1908_{split}.json"), "w") as f:
            json.dump(meta, f)


def test_tiny_cli_flow(tmp_path, monkeypatch):
    """Non-slow tier e2e: the full CLI train->eval->test->mesh flow at the
    smallest shapes that still exercise every phase (VERDICT r2 #8: the
    end-to-end path must run on every push, not only under -m slow)."""
    data_root = str(tmp_path / "data")
    workspace = str(tmp_path / "ws")
    write_synthetic_kitti(data_root, n_train=2, n_val=1, n_test=1)

    import main_lidarnerf as cli

    argv = [
        "main_lidarnerf.py",
        "--config", "configs/kitti360_1908.txt",
        "--path", data_root,
        "--workspace", workspace,
        "--iters", "4",
        "--num_steps", "16",
        "--upsample_steps", "4",
        "--num_rays_lidar", "128",
        "--desired_resolution", "64",
        "--log2_hashmap_size", "10",
        "--eval_interval", "2",
        "--max_ray_batch", "512",
        "--mesh_resolution", "32",
        "--scale", "0.05",
        "--offset", "0", "0", "0",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cli.main()  # default path: fused-epoch lax.scan dispatch (--fuse_epoch 1)

    assert os.path.exists(os.path.join(workspace, "args.txt"))
    ckpts = os.listdir(os.path.join(workspace, "checkpoints"))
    assert any(c.endswith(".ckpt") for c in ckpts)
    vdir = os.path.join(workspace, "validation")
    assert os.path.isdir(vdir) and len(os.listdir(vdir)) > 0
    names = os.listdir(os.path.join(workspace, "results"))
    assert any(n.endswith("_depth_lidar.npy") for n in names)
    assert any(n.endswith(".ply") for n in os.listdir(os.path.join(workspace, "meshes")))


def test_tiny_cli_perstep_with_seam_options(tmp_path, monkeypatch):
    """Per-step trainer path + both seam options' wiring (the options are
    measured-negative quality-wise but the plumbing must stay alive; the
    hashed sync forces --fuse_epoch off, covering the per-step fallback)."""
    data_root = str(tmp_path / "data")
    workspace = str(tmp_path / "ws")
    write_synthetic_kitti(data_root, n_train=2, n_val=1, n_test=1)

    import main_lidarnerf as cli

    argv = [
        "main_lidarnerf.py",
        "--config", "configs/kitti360_1908.txt",
        "--path", data_root,
        "--workspace", workspace,
        "--iters", "2",
        "--num_steps", "16",
        "--upsample_steps", "4",
        "--num_rays_lidar", "128",
        "--desired_resolution", "64",
        "--log2_hashmap_size", "10",
        "--eval_interval", "1000",
        "--max_ray_batch", "512",
        "--mesh_resolution", "16",
        "--scale", "0.05",
        "--offset", "0", "0", "0",
        "--seam_tie", "1",
        "--seam_sync_hashed", "8",  # host-side projection -> per-step path
    ]
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cli.main()
    log = open(os.path.join(workspace, "log_lidar_nerf.txt")).read()
    assert "Finished Epoch 1" in log


@pytest.mark.slow
def test_full_cli_flow(tmp_path, monkeypatch):
    data_root = str(tmp_path / "data")
    workspace = str(tmp_path / "ws")
    write_synthetic_kitti(data_root)

    import main_lidarnerf as cli

    argv = [
        "main_lidarnerf.py",
        "--config", "configs/kitti360_1908.txt",
        "--path", data_root,
        "--workspace", workspace,
        "--iters", "40",
        "--num_steps", "32",
        "--upsample_steps", "8",
        "--num_rays_lidar", "256",
        "--desired_resolution", "128",
        "--log2_hashmap_size", "12",
        "--eval_interval", "10",
        "--max_ray_batch", "256",
        "--scale", "0.05",
        "--offset", "0", "0", "0",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cli.main()

    # workspace artifacts
    assert os.path.exists(os.path.join(workspace, "args.txt"))
    assert os.path.exists(os.path.join(workspace, "log_lidar_nerf.txt"))
    ckpts = os.listdir(os.path.join(workspace, "checkpoints"))
    assert any(c.endswith(".ckpt") for c in ckpts)
    # validation outputs (eval ran at eval_interval)
    vdir = os.path.join(workspace, "validation")
    assert os.path.isdir(vdir) and len(os.listdir(vdir)) > 0
    # test outputs: predicted point clouds + videos
    rdir = os.path.join(workspace, "results")
    names = os.listdir(rdir)
    assert any(n.endswith("_depth_lidar.npy") for n in names)
    # mesh
    mdir = os.path.join(workspace, "meshes")
    assert any(n.endswith(".ply") for n in os.listdir(mdir))

    # resume-from-latest works (idempotent restart contract, SURVEY §5)
    monkeypatch.setattr(sys, "argv", argv + ["--test_eval"])
    cli.main()


def test_config_parser_reads_reference_configs():
    import main_lidarnerf as cli

    parser = cli.get_arg_parser()
    opt = parser.parse_args(["--config", "configs/kitti360_1908.txt"])
    assert opt.sequence_id == "1908"
    assert opt.alpha_d == 1000.0
    assert opt.alpha_i == 10.0
    assert opt.grad_loss is True
    assert opt.desired_resolution == 32768
    assert opt.change_patch_size_lidar == [2, 8]
    assert opt.num_steps == 768
    assert abs(opt.scale - 0.010784853507573345) < 1e-12
    assert len(opt.offset) == 3

    opt2 = parser.parse_args(
        ["--config", "configs/kitti360_1908.txt", "--num_steps", "64"]
    )
    assert opt2.num_steps == 64  # CLI overrides config

    opt3 = parser.parse_args(["--config", "configs/nerf_mvl.txt"])
    assert opt3.dataloader == "nerf_mvl"
    assert opt3.intensity_inv_scale == 255.0
    assert opt3.grad_loss is False
    assert opt3.eval_interval == 5
