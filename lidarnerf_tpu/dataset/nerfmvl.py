"""NeRF-MVL object-level dataset.

Numpy/JAX port of /root/reference/lidarnerf/dataset/nerfmvl_dataset.py:13-192.
Panos come from `.npz` files with a bbox mask channel (-1 outside the object's
projected OBB rectangle). The reference's dynamic-shape collate (filter by
mask, then randperm-subsample) is replaced for training by *static-shape*
masked sampling: per-frame valid pixel indices are precomputed and padded, and
the train step samples a fixed `num_rays_lidar` of them (with replacement) —
same distribution family, XLA-friendly.
"""

import json
import os
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from lidarnerf_tpu.dataset.base import get_lidar_rays
from lidarnerf_tpu.dataset.kitti360 import SimpleLoader

SEQUENCE_IDS = [
    "bollard",
    "car",
    "pedestrian",
    "pier",
    "plant",
    "tire",
    "traffic_cone",
    "warning_sign",
    "water_safety_barrier",
]


@dataclass
class NeRFMVLDataset:
    device: str = "cpu"
    split: str = "train"
    root_path: str = "data/nerf_mvl"
    sequence_id: str = "car"
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
        self.class_name = self.sequence_id
        self.training = self.split in ["train", "all", "trainval"]
        self.testing = self.split == "test"
        self.num_rays = self.num_rays if self.training else -1
        self.num_rays_lidar = self.num_rays_lidar if self.training else -1

        with open(
            os.path.join(
                self.root_path, f"transforms_{self.class_name}_{self.split}.json"
            )
        ) as f:
            transform = json.load(f)

        self.H_lidar = int(transform["h_lidar"])
        self.W_lidar = int(transform["w_lidar"])

        poses, images = [], []
        have_images = True
        for fr in transform["frames"]:
            poses.append(np.array(fr["lidar2world"], dtype=np.float32))
            if "lidar_file_path" in fr:
                pc = np.load(os.path.join(self.root_path, fr["lidar_file_path"]))[
                    "data"
                ]
                # ray_drop: depth>0 -> 1, ==0 -> 0, -1 (masked) stays -1
                ray_drop = pc.reshape(-1, 3)[:, 2].copy()
                ray_drop[ray_drop > 0] = 1.0
                ray_drop = ray_drop.reshape(self.H_lidar, self.W_lidar, 1)
                images.append(
                    np.concatenate(
                        [ray_drop, pc[:, :, 1:2], pc[:, :, 2:3] * self.scale], -1
                    )
                )
            else:
                have_images = False

        dataset_bbox = np.load(
            os.path.join(self.root_path, "dataset_bbox_7k.npy"), allow_pickle=True
        ).item()
        self.OBB = dataset_bbox[self.class_name]
        self.offset = np.mean(self.OBB, axis=0)

        self.poses_lidar = np.stack(poses, axis=0)
        poses_wo = self.poses_lidar.copy()
        OBB_pad = np.concatenate([self.OBB, np.ones((8, 1))], axis=1)
        self.OBB_local = np.stack(
            [OBB_pad @ np.linalg.inv(p.reshape(4, 4)).T for p in poses_wo], axis=0
        )
        self.poses_lidar[:, :3, -1] = (
            self.poses_lidar[:, :3, -1] - self.offset
        ) * self.scale

        self.images_lidar = (
            np.stack(images, axis=0).astype(np.float32) if have_images else None
        )
        self.intrinsics_lidar = (15, 40)  # nerfmvl_dataset.py:114
        self._device_cache = None

    def valid_indices_padded(self):
        """Per-frame flat pixel indices where bbox mask > -1, padded.

        Returns (idx [N, P] int32, counts [N] int32) with P = max valid count;
        padding repeats index 0 (never sampled because draws are < count).
        """
        HW = self.H_lidar * self.W_lidar
        masks = self.images_lidar[..., 0].reshape(len(self), HW) > -1
        counts = masks.sum(axis=1).astype(np.int32)
        P = int(counts.max())
        idx = np.zeros((len(self), P), np.int32)
        for n in range(len(self)):
            v = np.nonzero(masks[n])[0]
            idx[n, : len(v)] = v
        return idx, counts

    def device_arrays(self):
        if self._device_cache is None:
            idx, counts = self.valid_indices_padded()
            self._device_cache = (
                jnp.asarray(self.poses_lidar, jnp.float32),
                jnp.asarray(self.images_lidar, jnp.float32),
                jnp.asarray(idx),
                jnp.asarray(counts),
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
                -1,
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
        if self.testing:
            results["OBB_local"] = self.OBB_local[index].reshape(8, 4)

        if self.images_lidar is not None and self.enable_lidar:
            images = self.images_lidar[index]  # [B, H, W, 3]
            if self.training:
                C = images.shape[-1]
                flat = images.reshape(B, -1, C)
                mask = flat[:, :, 0] > -1  # [B, HW]
                # nerfmvl_dataset.py:153-168: filter then subsample to num_rays.
                # The bbox-valid pixel set is per-frame, so a shared `sel`
                # is only correct for a single frame per batch (SimpleLoader
                # always uses batch=1, matching the reference's DataLoader).
                assert B == 1, "MVL collate supports batch=1 only (per-frame mask)"
                sel = np.nonzero(mask[0])[0]
                if len(sel) > self.num_rays_lidar:
                    sel = np.random.permutation(sel)[: self.num_rays_lidar]
                results["images_lidar"] = jnp.asarray(flat[:, sel, :])
                results["rays_o_lidar"] = results["rays_o_lidar"][:, sel, :]
                results["rays_d_lidar"] = results["rays_d_lidar"][:, sel, :]
            else:
                results["images_lidar"] = jnp.asarray(images)
        return results

    def dataloader(self):
        return SimpleLoader(self, shuffle=self.training)

    def __len__(self):
        return len(self.poses_lidar)
