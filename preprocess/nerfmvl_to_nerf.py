"""CLI: write NeRF-MVL transforms_{class}_{split}.json files."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from lidarnerf_tpu.preprocess.to_nerf import MVL_TRAIN_SPLIT, write_nerfmvl_transforms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--path",
        type=str,
        default=None,
        help="nerf_mvl parent dir (default: <repo>/data/nerf_mvl)",
    )
    parser.add_argument(
        "--classes", type=str, nargs="*", default=None,
        help=f"subset of classes (default: all of {list(MVL_TRAIN_SPLIT)})",
    )
    args = parser.parse_args()
    root = Path(args.path) if args.path else Path(__file__).parent.parent / "data" / "nerf_mvl"
    write_nerfmvl_transforms(root, classes=args.classes)


if __name__ == "__main__":
    main()
