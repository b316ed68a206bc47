"""CLI: compute scene centerpose/scale constants for configs/*.txt."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from lidarnerf_tpu.preprocess.normalize import (
    cal_centerpose_bound_scale,
    get_path_pose_from_json,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_path", type=str, default="data/kitti360")
    parser.add_argument("--sequence_id", type=str, default="1908")
    parser.add_argument("--fov_up", type=float, default=2.0)
    parser.add_argument("--fov", type=float, default=26.9)
    args = parser.parse_args()
    paths, poses = get_path_pose_from_json(args.root_path, args.sequence_id)
    centerpose, scale, near, far = cal_centerpose_bound_scale(
        paths, poses, (args.fov_up, args.fov)
    )
    print("near, far:", near, far)
    print("centerpose: ", centerpose)
    print("scale: ", scale)


if __name__ == "__main__":
    main()
