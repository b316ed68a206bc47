"""Generate a KITTI-scale synthetic drive dataset for integration runs.

Analytic street scene — ground plane, two building walls, pillars — rendered
to 66x1030 LiDAR panos from poses moving along +x, written in the exact
transforms_{seq}_{split}.json + pano-npy format the KITTI-360 pipeline
produces. Lets the full training stack run at real shapes without the
(license-gated) KITTI-360 download.

Usage: python tools/make_synth_drive.py [out_dir] [n_train]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lidarnerf_tpu.dataset.convert import pano_dirs

H, W = 66, 1030
K_LIDAR = (2.0, 26.9)
SENSOR_Z = 1.7  # sensor height above ground


def ray_scene_depth(origins, dirs, rng):
    """Closest hit among: ground plane z=0, walls y=+-12, pillars, far cap."""
    o, d = origins, dirs
    INF = 1e9
    depth = np.full(len(d), INF)

    # ground plane z = 0 (sensor at z = SENSOR_Z)
    tz = np.where(d[:, 2] < -1e-6, -(o[:, 2]) / np.where(d[:, 2] == 0, 1, d[:, 2]), INF)
    depth = np.minimum(depth, np.where(tz > 0, tz, INF))

    # building walls at y = +-12, 0 < z < 8
    for wy in (12.0, -12.0):
        t = (wy - o[:, 1]) / np.where(np.abs(d[:, 1]) < 1e-9, 1e-9, d[:, 1])
        z = o[:, 2] + t * d[:, 2]
        ok = (t > 0) & (z > 0) & (z < 8.0)
        depth = np.minimum(depth, np.where(ok, t, INF))

    # cylindrical pillars along the street
    for px, py, r in [(8, 4, 0.4), (16, -5, 0.5), (26, 3, 0.4), (36, -4, 0.6),
                      (47, 5, 0.5), (58, -3, 0.4)]:
        oc = o[:, :2] - np.array([px, py])
        b = 2 * np.sum(oc * d[:, :2], axis=1)
        a = np.sum(d[:, :2] ** 2, axis=1)
        c = np.sum(oc**2, axis=1) - r * r
        disc = b * b - 4 * a * c
        t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * np.maximum(a, 1e-9)), INF)
        z = o[:, 2] + t * d[:, 2]
        ok = (t > 0) & (z > 0) & (z < 6.0)
        depth = np.minimum(depth, np.where(ok, t, INF))

    hit = depth < 75.0
    return np.where(hit, depth, 0.0), hit


def intensity_model(origins, dirs, depth, hit, rng):
    """Range + incidence dependent reflectance with per-surface albedo."""
    p = origins + dirs * depth[:, None]
    albedo = np.where(p[:, 2] < 0.05, 0.25, 0.6)  # ground darker
    albedo = np.where(np.abs(p[:, 1]) > 11.5, 0.45, albedo)
    falloff = 1.0 / (1.0 + (depth / 40.0) ** 2)
    inten = albedo * falloff
    return np.where(hit, np.clip(inten, 0, 1), 0.0)


def main(out_dir="data_synth_drive", n_train=16, n_val=2):
    rng = np.random.RandomState(0)
    os.makedirs(out_dir, exist_ok=True)
    dirs0 = pano_dirs(H, W, K_LIDAR).reshape(-1, 3).astype(np.float64)

    n_total = n_train + 2 * n_val
    frames = []
    for i in range(n_total):
        t = np.array([i * 3.0, 0.3 * np.sin(i * 0.4), SENSOR_Z])
        yaw = 0.05 * np.sin(i * 0.3)
        Rz = np.array(
            [[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
        )
        pose = np.eye(4)
        pose[:3, :3] = Rz
        pose[:3, 3] = t
        d_world = dirs0 @ Rz.T
        o_world = np.broadcast_to(t, d_world.shape)
        depth, hit = ray_scene_depth(o_world, d_world, rng)
        # simulated ray-drop: distant/grazing returns sometimes lost
        drop_p = np.clip((depth - 40) / 80, 0, 0.35)
        dropped = hit & (rng.rand(len(depth)) < drop_p)
        hit = hit & ~dropped
        depth = np.where(hit, depth, 0.0)
        inten = intensity_model(o_world, d_world, depth, hit, rng)
        pano = np.stack(
            [np.zeros(H * W), inten, depth], axis=-1
        ).reshape(H, W, 3).astype(np.float32)
        fn = f"frame_{i:04d}.npy"
        np.save(os.path.join(out_dir, fn), pano)
        frames.append(
            {
                "file_path": fn,
                "lidar_file_path": fn,
                "transform_matrix": pose.tolist(),
                "lidar2world": pose.tolist(),
            }
        )

    val_ids = list(range(n_train, n_train + n_val))
    test_ids = list(range(n_train + n_val, n_total))
    splits = {
        "train": list(range(n_train)),
        "val": val_ids,
        "test": test_ids,
    }
    for split, ids in splits.items():
        meta = {
            "w": W, "h": H, "w_lidar": W, "h_lidar": H, "aabb_scale": 2,
            "frames": [frames[i] for i in ids],
        }
        with open(os.path.join(out_dir, f"transforms_1908_{split}.json"), "w") as f:
            json.dump(meta, f)

    # scene normalisation constants (what cal_centerpose_bound computes)
    all_pts = []
    for i in range(n_total):
        pano = np.load(os.path.join(out_dir, f"frame_{i:04d}.npy"))
        from lidarnerf_tpu.dataset.convert import pano_to_lidar

        pts = pano_to_lidar(pano[:, :, 2], K_LIDAR)
        pose = np.array(frames[i]["lidar2world"])
        ph = np.concatenate([pts, np.ones((len(pts), 1))], 1)
        all_pts.append((ph @ pose.T)[:, :3])
    pc = np.concatenate(all_pts)
    center = (pc.max(0) + pc.min(0)) / 2
    scale = 1.0 / np.abs(pc - center).max()
    print(f"offset = [{center[0]}, {center[1]}, {center[2]}]")
    print(f"scale = {scale}")
    with open(os.path.join(out_dir, "scene_constants.json"), "w") as f:
        json.dump({"offset": center.tolist(), "scale": float(scale)}, f)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(*([args[0]] if args else []), **({"n_train": int(args[1])} if len(args) > 1 else {}))
