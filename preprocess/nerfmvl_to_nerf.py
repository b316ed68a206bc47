"""CLI: write NeRF-MVL transforms_{class}_{split}.json files."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from lidarnerf_tpu.preprocess.to_nerf import write_nerfmvl_transforms


def main():
    project_root = Path(__file__).parent.parent
    write_nerfmvl_transforms(project_root / "data" / "nerf_mvl")


if __name__ == "__main__":
    main()
