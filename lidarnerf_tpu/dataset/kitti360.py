"""KITTI-360 LiDAR range-image dataset.

Numpy/JAX port of /root/reference/lidarnerf/dataset/kitti360_dataset.py:13-179.
Loads `transforms_{seq}_{split}.json` + pano `.npy`s into stacked arrays
[N, H, W, 3] = (ray_drop, intensity, depth*scale) and recentred/scaled poses.

Two consumption styles:
- `.collate(index)` / `.dataloader()` — reference-compatible host API.
- `.device_arrays()` — the TPU-first path: the full (tiny) frame stack is put
  on device once and ray sampling happens *inside* the jitted train step
  (see nerf/trainer.py), eliminating the per-step host collate entirely.
"""

import json
import os
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from lidarnerf_tpu.dataset.base import get_lidar_rays


class SimpleLoader:
    """Minimal stand-in for the reference's torch DataLoader(batch=1)."""

    def __init__(self, dataset, shuffle):
        self._data = dataset
        self.shuffle = shuffle
        self.batch_size = 1
        self.has_gt = dataset.images_lidar is not None
        self._rng = np.random.RandomState(0)

    def __len__(self):
        return len(self._data)

    def __iter__(self):
        order = np.arange(len(self._data))
        if self.shuffle:
            self._rng.shuffle(order)
        for idx in order:
            yield self._data.collate([int(idx)])


@dataclass
class KITTI360Dataset:
    device: str = "cpu"
    split: str = "train"
    root_path: str = "data/kitti360"
    sequence_id: str = "1908"
    preload: bool = True
    scale: float = 1.0
    offset: list = field(default_factory=lambda: [0, 0, 0])
    fp16: bool = True
    patch_size: int = 1
    patch_size_lidar: int = 1
    enable_lidar: bool = True
    num_rays: int = 4096
    num_rays_lidar: int = 4096

    def __post_init__(self):
        valid = {"1538", "1728", "1908", "3353"}
        if self.sequence_id not in valid:
            raise ValueError(f"Invalid sequence id: {self.sequence_id}")

        self.training = self.split in ["train", "all", "trainval"]
        self.num_rays = self.num_rays if self.training else -1
        self.num_rays_lidar = self.num_rays_lidar if self.training else -1

        with open(
            os.path.join(
                self.root_path, f"transforms_{self.sequence_id}_{self.split}.json"
            )
        ) as f:
            transform = json.load(f)

        self.H = int(transform["h"]) if "h" in transform else None
        self.W = int(transform["w"]) if "w" in transform else None
        self.H_lidar = int(transform["h_lidar"])
        self.W_lidar = int(transform["w_lidar"])

        poses, images = [], []
        for fr in transform["frames"]:
            pose = np.array(fr["lidar2world"], dtype=np.float32)
            pc = np.load(os.path.join(self.root_path, fr["lidar_file_path"]))
            # channels: (unused, intensity, depth) -> (ray_drop, intensity, depth*scale)
            ray_drop = np.where(pc.reshape(-1, 3)[:, 2] == 0.0, 0.0, 1.0).reshape(
                self.H_lidar, self.W_lidar, 1
            )
            image = np.concatenate(
                [ray_drop, pc[:, :, 1:2], pc[:, :, 2:3] * self.scale], axis=-1
            )
            poses.append(pose)
            images.append(image)

        self.poses_lidar = np.stack(poses, axis=0)
        self.poses_lidar[:, :3, -1] = (
            self.poses_lidar[:, :3, -1] - np.asarray(self.offset)
        ) * self.scale
        self.images_lidar = np.stack(images, axis=0).astype(np.float32)
        self.intrinsics_lidar = (2.0, 26.9)  # fov_up, fov (kitti360_dataset.py:121)
        self._device_cache = None

    def device_arrays(self):
        """(poses [N,4,4], images [N,H,W,3]) as device jnp arrays (cached)."""
        if self._device_cache is None:
            self._device_cache = (
                jnp.asarray(self.poses_lidar, jnp.float32),
                jnp.asarray(self.images_lidar, jnp.float32),
            )
        return self._device_cache

    def collate(self, index):
        B = len(index)
        results = {}
        if self.enable_lidar:
            poses = self.poses_lidar[index]
            rays = get_lidar_rays(
                poses,
                self.intrinsics_lidar,
                self.H_lidar,
                self.W_lidar,
                self.num_rays_lidar,
                self.patch_size_lidar,
            )
            results.update(
                {
                    "H_lidar": self.H_lidar,
                    "W_lidar": self.W_lidar,
                    "rays_o_lidar": rays["rays_o"],
                    "rays_d_lidar": rays["rays_d"],
                }
            )
            if self.images_lidar is not None:
                images = self.images_lidar[index]  # [B, H, W, 3]
                if self.training:
                    C = images.shape[-1]
                    flat = images.reshape(B, -1, C)
                    inds = np.asarray(rays["inds"])
                    images = np.take_along_axis(flat, inds[..., None], axis=1)
                results["images_lidar"] = jnp.asarray(images)
        return results

    def dataloader(self):
        return SimpleLoader(self, shuffle=self.training)

    def __len__(self):
        return len(self.poses_lidar)
