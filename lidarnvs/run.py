"""Classical LiDAR-NVS baseline runner.

Surface-parity CLI for /root/reference/lidarnvs/run.py:18-286: fit a baseline
(poisson | nksr | pcgen) on the train split, then either (a) collect a
ray-drop training dataset (pickles) or (b) evaluate every test frame with
`eval_points_and_pano` and report mean metrics. The reference's committed
`exit(0)` after fit() (run.py:184) is a bug, not a feature — the eval loop
here actually runs.
"""

import argparse
import os
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

# Same explicit platform override as main_lidarnerf.py: hosted TPU
# environments force-register the TPU backend ahead of JAX_PLATFORMS.
if os.environ.get("LIDARNERF_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["LIDARNERF_PLATFORM"])

from lidarnerf_tpu.lidarnvs.eval import eval_points_and_pano
from lidarnerf_tpu.lidarnvs.loader import extract_dataset_frame
from lidarnerf_tpu.lidarnvs.pcgen import LidarNVSPCGen, generate_raydrop_data_pcgen

KITTI360_SEQUENCE_IDS = ["1538", "1728", "1908", "3353"]
NERF_MVL_SEQUENCE_IDS = [
    "bollard", "car", "pedestrian", "pier", "plant", "tire",
    "traffic_cone", "warning_sign", "water_safety_barrier",
]


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="kitti360",
                        choices=["kitti360", "nerf_mvl"])
    parser.add_argument("--method", type=str, default="poisson",
                        choices=["poisson", "nksr", "pcgen"])
    parser.add_argument("--raycasting", type=str, default="cp", choices=["cp", "fpa"])
    parser.add_argument("--path", type=str, default="data/kitti360")
    parser.add_argument("--sequence_id", type=str, default="1908")
    parser.add_argument("--num_rays_lidar", type=int, default=4096)
    parser.add_argument("--offset", type=float, nargs="*", default=[0, 0, 0])
    parser.add_argument("--enable_collect_raydrop_dataset", action="store_true")
    parser.add_argument("--raydrop_data_dir", type=str, default="data/raydrop")
    parser.add_argument("--ckpt_path", type=str, default="")
    parser.add_argument("--poisson_depth", type=int, default=11)
    parser.add_argument("--poisson_min_density", type=float, default=0.3)
    return parser


def build_datasets(args):
    kwargs = dict(
        root_path=args.path,
        offset=args.offset,
        num_rays_lidar=args.num_rays_lidar,
        sequence_id=args.sequence_id,
        preload=False,
        scale=1.0,
    )
    if args.dataset == "kitti360":
        from lidarnerf_tpu.dataset.kitti360 import KITTI360Dataset as DS
    else:
        from lidarnerf_tpu.dataset.nerfmvl import NeRFMVLDataset as DS
    return DS(split="train", **kwargs), DS(split="test", **kwargs)


def main():
    args = build_parser().parse_args()
    valid = (
        KITTI360_SEQUENCE_IDS if args.dataset == "kitti360" else NERF_MVL_SEQUENCE_IDS
    )
    if args.sequence_id not in valid:
        raise ValueError(f"Unknown sequence id {args.sequence_id} for {args.dataset}")

    print("[Config]===============================================")
    print(f"dataset             : {args.dataset}")
    print(f"method              : {args.method}")
    print(f"sequence_id         : {args.sequence_id}")
    print(f"dataset_collect_mode: {args.enable_collect_raydrop_dataset}")
    print("=======================================================")

    train_dataset, test_dataset = build_datasets(args)
    # baselines need per-image test collate disabled (they read raw arrays)
    train_dataset.training = True
    ckpt_path = args.ckpt_path or None

    if args.method == "pcgen":
        nvs = LidarNVSPCGen(raycasting=args.raycasting, ckpt_path=ckpt_path)
    elif args.method == "poisson":
        from lidarnerf_tpu.lidarnvs.meshing import LidarNVSPoisson

        nvs = LidarNVSPoisson(
            depth=args.poisson_depth,
            min_density=args.poisson_min_density,
            k=9,
            ckpt_path=ckpt_path,
        )
    else:
        from lidarnerf_tpu.lidarnvs.meshing import LidarNVSNKSR

        nvs = LidarNVSNKSR(ckpt_path=ckpt_path)

    nvs.fit(train_dataset)

    if args.enable_collect_raydrop_dataset:
        out_dir = Path(args.raydrop_data_dir) / args.method / (
            f"{args.dataset}_{args.sequence_id}"
        )
        os.makedirs(out_dir, exist_ok=True)
        if args.method == "pcgen":
            for split, ds in [("train", train_dataset), ("test", test_dataset)]:
                data = generate_raydrop_data_pcgen(ds, nvs)
                with open(out_dir / f"{split}_data.pkl", "wb") as f:
                    pickle.dump(data, f)
                print(f"Saved {out_dir / f'{split}_data.pkl'}")
        else:
            from lidarnerf_tpu.lidarnvs.meshing import generate_raydrop_data_meshing

            for split, ds in [("train", train_dataset), ("test", test_dataset)]:
                data = generate_raydrop_data_meshing(ds, nvs)
                with open(out_dir / f"{split}_data.pkl", "wb") as f:
                    pickle.dump(data, f)
                print(f"Saved {out_dir / f'{split}_data.pkl'}")
        return

    # Eval test frames (run.py:187-286 — minus the committed early exit).
    all_metrics = []
    for frame_idx in range(len(test_dataset)):
        gt = extract_dataset_frame(test_dataset, frame_idx=frame_idx)
        infer = nvs.predict_frame if ckpt_path is None else nvs.predict_frame_with_raydrop
        pd = infer(
            lidar_K=gt["lidar_K"],
            lidar_pose=gt["lidar_pose"],
            lidar_H=gt["lidar_H"],
            lidar_W=gt["lidar_W"],
        )
        if args.dataset == "nerf_mvl":
            mask = gt["pano_mask"]
            nz = np.array(np.nonzero(mask))
            new_h = nz[0].max() - nz[0].min() + 1
            new_w = nz[1].max() - nz[1].min() + 1
            metrics = eval_points_and_pano(
                gt_local_points=gt["local_points"],
                pd_local_points=pd["local_points"],
                gt_intensities=gt["intensities"][mask].reshape(new_h, new_w) * 255,
                pd_intensities=pd["intensities"][mask].reshape(new_h, new_w) * 255,
                gt_pano=gt["pano"][mask].reshape(new_h, new_w),
                pd_pano=pd["pano"][mask].reshape(new_h, new_w),
            )
        else:
            metrics = eval_points_and_pano(
                gt_local_points=gt["local_points"],
                pd_local_points=pd["local_points"],
                gt_intensities=gt["intensities"],
                pd_intensities=pd["intensities"],
                gt_pano=gt["pano"],
                pd_pano=pd["pano"],
            )
        all_metrics.append(metrics)
        print(f"frame {frame_idx}: {metrics}")

    mean_metrics = {
        k: float(np.mean([m[k] for m in all_metrics])) for k in all_metrics[0]
    }
    print("[Mean metrics]=========================================")
    for k, v in mean_metrics.items():
        print(f"{k}: {v:.6f}")
    return mean_metrics


if __name__ == "__main__":
    main()
