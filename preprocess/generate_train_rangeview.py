"""CLI: raw LiDAR -> range-view pano training data (KITTI-360 / NeRF-MVL).

Surface-parity wrapper over lidarnerf_tpu.preprocess.rangeview; mirrors
/root/reference/preprocess/generate_train_rangeview.py's entry points.
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from lidarnerf_tpu.preprocess import rangeview as rv


def create_kitti_rangeview(project_root=None, s_frame_id=1908, e_frame_id=1971):
    project_root = Path(project_root or Path(__file__).parent.parent)
    kitti_360_root = project_root / "data" / "kitti360" / "KITTI-360"
    out_dir = kitti_360_root.parent / "train"
    sequence_name = "2013_05_28_drive_0000"
    lidar_dir = (
        kitti_360_root / "data_3d_raw" / f"{sequence_name}_sync" / "velodyne_points" / "data"
    )
    lidar_paths = [
        os.path.join(lidar_dir, "%010d.bin" % f) for f in range(s_frame_id, e_frame_id + 1)
    ]
    rv.generate_kitti_rangeviews(lidar_paths, out_dir, points_dim=4, **rv.KITTI_RANGEVIEW)


def create_nerf_mvl_rangeview(project_root=None):
    project_root = Path(project_root or Path(__file__).parent.parent)
    nerf_mvl_root = project_root / "data" / "nerf_mvl" / "nerf_mvl_7k"
    parent = nerf_mvl_root.parent
    out_dir = parent / "nerf_mvl_7k_pano"
    bbox_path = parent / "dataset_bbox_7k.npy"
    if not bbox_path.exists():
        rv.compute_dataset_bbox(rv.ALL_MVL_CLASSES, nerf_mvl_root, parent)
    dataset_bbox = np.load(bbox_path, allow_pickle=True).item()
    rv.generate_mvl_rangeviews(rv.ALL_MVL_CLASSES, dataset_bbox, parent, out_dir)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="kitti360", choices=["kitti360", "nerf_mvl"])
    args = parser.parse_args()
    if args.dataset == "kitti360":
        create_kitti_rangeview()
    else:
        create_nerf_mvl_rangeview()


if __name__ == "__main__":
    main()
