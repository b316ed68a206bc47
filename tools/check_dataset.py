#!/usr/bin/env python
"""Real-data readiness harness for KITTI-360.

Given a raw KITTI-360 root (calibration/ + data_poses/ + data_3d_raw/, plus
optionally data_2d_raw/), runs the entire on-ramp the paper-parity run needs
(reference: preprocess/generate_train_rangeview.py:225-258,
kitti360_loader.py:144-227, kitti360_to_nerf.py:26-156):

  1. calibration + pose chains, including the cam0_to_world.txt cross-check;
  2. range-view generation for the sequence's frame window;
  3. transforms_{seq}_{train,val,test}.json writing;
  4. scene-normalization constants vs the baked config values;
  5. a short smoke train through the real CLI (``--train_steps`` iters).

Exit code 0 means "drop-in ready": the full run is then just
    python main_lidarnerf.py --config configs/kitti360_<seq>.txt \
        --path <out_dir> --workspace <ws> -L

Usage:
    python tools/check_dataset.py --kitti360_root /data/KITTI-360 \
        --sequence_id 1908 --out_dir /data/kitti360_nerf [--train_steps 10]
"""

import argparse
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lidarnerf_tpu.preprocess.kitti360_loader import KITTI360Loader
from lidarnerf_tpu.preprocess.rangeview import lidar_to_rangeview_kitti
from lidarnerf_tpu.preprocess.to_nerf import KITTI_SEQUENCES, write_kitti360_transforms
from lidarnerf_tpu.preprocess.normalize import cal_centerpose_bound_scale


def _stage(n, msg):
    print(f"[check {n}/5] {msg}", flush=True)


def check_dataset(
    kitti360_root,
    out_dir,
    sequence_id="1908",
    sequence_name="2013_05_28_drive_0000",
    max_frames=None,
    train_steps=10,
    config=None,
    workspace=None,
):
    seq = KITTI_SEQUENCES[sequence_id]
    frame_ids = list(range(seq["start"], seq["end"] + 1))
    if max_frames is not None:
        keep = set(frame_ids[:max_frames]) | set(seq["val"])
        frame_ids = [f for f in frame_ids if f in keep]

    # 1. calibration + pose chains (cross-checked against cam0_to_world.txt
    #    inside load_cameras, reference kitti360_loader.py:204-216)
    _stage(1, f"calibration + pose chains for {len(frame_ids)} frames")
    k3 = KITTI360Loader(kitti360_root)
    Ks, Ts = k3.load_cameras("cam_00", sequence_name, frame_ids)
    lidar2world = k3.load_lidars(sequence_name, frame_ids)
    assert Ks.shape == (len(frame_ids), 3, 3)
    assert lidar2world.shape == (len(frame_ids), 4, 4)
    print(f"    cam0_to_world cross-check passed; fl_x={Ks[0][0, 0]:.1f}")

    # 2. range-view panos (66x1030, intrinsics (2.0, 26.9), ref
    #    generate_train_rangeview.py:225-258)
    _stage(2, "range-view generation")
    rv_dir = os.path.join(out_dir, "train")
    os.makedirs(rv_dir, exist_ok=True)
    for f in frame_ids:
        pts = k3.load_lidar_points(sequence_name, f)
        pano = lidar_to_rangeview_kitti(pts)
        assert pano.shape == (66, 1030, 3), pano.shape
        np.save(os.path.join(rv_dir, f"{f:010d}.npy"), pano)
    nz = float((pano[:, :, 2] > 0).mean())
    print(f"    {len(frame_ids)} panos written; last frame fill rate {nz:.2f}")
    assert nz > 0.05, "suspiciously empty pano — wrong .bin layout?"

    # 3. transforms_{seq}_{split}.json (ref kitti360_to_nerf.py:26-156)
    _stage(3, "transforms json writing")
    write_kitti360_transforms(
        kitti360_root, out_dir, sequence_id=sequence_id,
        sequence_name=sequence_name, rangeview_dir=rv_dir,
    )
    import json

    for split in ("train", "val", "test"):
        p = os.path.join(out_dir, f"transforms_{sequence_id}_{split}.json")
        assert os.path.isfile(p), p
        if max_frames is not None:
            # reduced check window: keep only frames whose pano exists so the
            # smoke train below can load the split
            with open(p) as fh:
                d = json.load(fh)
            d["frames"] = [
                fr for fr in d["frames"]
                if os.path.isfile(os.path.join(out_dir, fr["lidar_file_path"]))
            ]
            assert d["frames"], f"no generated panos in {split} window"
            if split in ("val", "test"):
                # full-pano eval/test is the expensive part of the smoke
                # train — one frame proves the path
                d["frames"] = d["frames"][:1]
            with open(p, "w") as fh:
                json.dump(d, fh, indent=2)

    # 4. normalization constants vs the baked config (ref
    #    cal_centerpose_bound.py:10-64 produced configs/*.txt scale/offset)
    _stage(4, "scene normalization constants")
    rv_paths = [os.path.join(rv_dir, f"{f:010d}.npy") for f in frame_ids]
    centerpose, scale, near, far = cal_centerpose_bound_scale(
        rv_paths, lidar2world, (2.0, 26.9)
    )
    print(
        f"    offset={np.round(centerpose, 2).tolist()} scale={scale:.5f} "
        f"near={near:.2f} far={far:.2f}"
    )
    cfg = config or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", f"kitti360_{sequence_id}.txt",
    )
    if os.path.isfile(cfg):
        baked = {}
        with open(cfg) as fh:
            for line in fh:
                if "=" in line:
                    key, _, val = line.partition("=")
                    baked[key.strip()] = val.strip()
        if "scale" in baked and max_frames is None:
            ratio = scale / float(baked["scale"])
            print(f"    baked config scale={baked['scale']} (ratio {ratio:.2f})")
            if not 0.5 < ratio < 2.0:
                print("    WARNING: computed scale far from the baked config —"
                      " check the frame window / units")

    # 5. smoke train through the real CLI
    _stage(5, f"{train_steps}-step smoke train")
    ws = workspace or os.path.join(out_dir, "_check_ws")
    argv_save = sys.argv
    sys.argv = [
        "main_lidarnerf.py", "--config", cfg,
        "--path", out_dir, "--workspace", ws,
        "--sequence_id", sequence_id,
        "--iters", str(train_steps), "--eval_interval", "10000",
        "--num_rays_lidar", "512", "--num_steps", "64", "--upsample_steps", "8",
        "--desired_resolution", "512", "--log2_hashmap_size", "15",
        "--max_ray_batch", "512", "--mesh_resolution", "32",
    ]
    try:
        import main_lidarnerf as cli

        cli.main()
    finally:
        sys.argv = argv_save
    assert os.path.isfile(os.path.join(ws, "log_lidar_nerf.txt"))
    print("[check] dataset is drop-in ready — run the paper config next.")
    return {"scale": scale, "offset": centerpose, "near": near, "far": far}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kitti360_root", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--sequence_id", default="1908", choices=sorted(KITTI_SEQUENCES))
    ap.add_argument("--sequence_name", default="2013_05_28_drive_0000")
    ap.add_argument("--max_frames", type=int, default=None,
                    help="limit the frame window for a quicker check")
    ap.add_argument("--train_steps", type=int, default=10)
    ap.add_argument("--config", default=None)
    ap.add_argument("--workspace", default=None)
    args = ap.parse_args()
    try:
        check_dataset(
            args.kitti360_root, args.out_dir, args.sequence_id,
            args.sequence_name, args.max_frames, args.train_steps,
            args.config, args.workspace,
        )
    except Exception:
        traceback.print_exc()
        print("[check] FAILED — see the stage banner above for where.")
        sys.exit(1)


if __name__ == "__main__":
    main()
