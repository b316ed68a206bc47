"""CLI: write KITTI-360 transforms_{seq}_{split}.json files."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from lidarnerf_tpu.preprocess.to_nerf import write_kitti360_transforms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sequence_id", type=str, default="1908")
    args = parser.parse_args()
    project_root = Path(__file__).parent.parent
    kitti_360_root = project_root / "data" / "kitti360" / "KITTI-360"
    write_kitti360_transforms(
        kitti_360_root, kitti_360_root.parent, sequence_id=args.sequence_id
    )


if __name__ == "__main__":
    main()
