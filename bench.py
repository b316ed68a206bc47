"""Benchmark: composited ray-samples/sec/chip on the real training step.

Runs the full KITTI-360-class training step (4096 rays x (768+64) samples,
hash grid desired_res=32768 / 2^19 table, bf16 matmuls, grad_loss patch
regularizer) on synthetic data and reports throughput against the driver
target of 5M composited ray-samples/sec/chip (BASELINE.md).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from lidarnerf_tpu.models.network import NeRFNetwork
    from lidarnerf_tpu.models.renderer import RenderConfig
    from lidarnerf_tpu.nerf.train_step import TrainConfig, make_optimizer, make_train_step

    H, W = 66, 1030
    NUM_RAYS = 4096
    NUM_STEPS, UPSAMPLE = 768, 64

    module = NeRFNetwork(
        encoding="blockhash",  # TPU-native block-hash grid (Pallas kernels)
        desired_resolution=32768,
        log2_hashmap_size=19,
        bound=1.0,
        compute_dtype=jnp.bfloat16,
    )
    tcfg = TrainConfig(
        alpha_d=1000.0,
        alpha_i=10.0,
        alpha_grad=100.0,
        grad_loss=True,
        scale=0.0108,
        num_rays_lidar=NUM_RAYS,
        H_lidar=H,
        W_lidar=W,
        intrinsics_lidar=(2.0, 26.9),
        iters=30000,
    )
    rcfg = RenderConfig(
        num_steps=NUM_STEPS, upsample_steps=UPSAMPLE, min_near_lidar=0.0108, bound=1.0
    )

    params = module.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    opt_state = make_optimizer(tcfg).init(params)

    rng = np.random.RandomState(0)
    F = 4
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (F, 4, 4)).copy()
    images = rng.rand(F, H, W, 3).astype(np.float32)
    images[..., 2] *= 0.6
    poses_d = jnp.asarray(poses)
    images_d = jnp.asarray(images)
    vi = jnp.zeros((F, 1), jnp.int32)
    vc = jnp.full((F,), H * W, jnp.int32)

    # alternate flat / [2,8]-patch steps like the real epoch schedule
    step_flat = make_train_step(module, tcfg, rcfg, patch_size=1)
    step_patch = make_train_step(module, tcfg, rcfg, patch_size=[2, 8])

    key = jax.random.PRNGKey(0)

    def run(n, t0=None):
        nonlocal params, opt_state, key
        for i in range(n):
            key, sub = jax.random.split(key)
            fn = step_patch if i % 2 else step_flat
            params, opt_state, m = fn(
                params, opt_state, poses_d, images_d, vi, vc, i % F, sub, i
            )
        # D2H fetch: the only reliable completion barrier on the tunneled
        # backend (block_until_ready returns before remote execution finishes)
        assert np.isfinite(float(m["loss"]))
        return m

    run(3)  # warmup/compile
    n_steps = 30
    t0 = time.perf_counter()
    m = run(n_steps)
    dt = time.perf_counter() - t0

    samples_per_step = NUM_RAYS * (NUM_STEPS + UPSAMPLE)
    n_chips = 1  # bench runs on the single tunneled chip
    value = n_steps * samples_per_step / dt / n_chips
    target = 5e6
    print(
        json.dumps(
            {
                "metric": "composited_ray_samples_per_sec_per_chip",
                "value": round(value),
                "unit": "samples/s/chip",
                "vs_baseline": round(value / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
