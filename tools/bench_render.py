"""Sensor-rate rendering benchmark: full-pano LiDAR frames per second.

The stretch goal from BASELINE.json configs[4]: can the trained model render
novel 64-beam panos at sensor rate (10 Hz)? Measures staged full-frame
inference (KITTI 66x1030 = 67,980 rays x 832 samples) on the current device.

Prints one JSON line: {"metric": "pano_fps", ...}.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from lidarnerf_tpu.models.network import NeRFNetwork
from lidarnerf_tpu.models.renderer import RenderConfig, render_rays_staged
from lidarnerf_tpu.dataset.base import get_lidar_rays


def main(num_steps=768, upsample_steps=64):
    H, W = 66, 1030
    module = NeRFNetwork(
        encoding="blockhash",
        desired_resolution=32768,
        log2_hashmap_size=19,
        bound=1.0,
        compute_dtype=jnp.bfloat16,
    )
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    cfg = RenderConfig(
        num_steps=num_steps,
        upsample_steps=upsample_steps,
        min_near_lidar=0.01,
        bound=1.0,
    )
    pose = jnp.eye(4)[None]
    rays = get_lidar_rays(pose, (2.0, 26.9), H, W, N=-1)
    ro, rd = rays["rays_o"][0], rays["rays_d"][0]

    def frame():
        out = render_rays_staged(module, params, ro, rd, cfg, chunk=8192)
        return float(jnp.sum(out["depth"]))  # D2H completion barrier

    frame()  # compile
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        frame()
    dt = (time.perf_counter() - t0) / n
    print(
        json.dumps(
            {
                "metric": "pano_fps",
                "value": round(1.0 / dt, 3),
                "unit": "full 66x1030 panos/s",
                "vs_baseline": round((1.0 / dt) / 10.0, 3),  # 10 Hz sensor rate
                "samples_per_sec": round(H * W * (num_steps + upsample_steps) / dt),
            }
        )
    )


if __name__ == "__main__":
    main()
