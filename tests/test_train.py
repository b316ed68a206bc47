"""Train-step smoke + convergence tests on a synthetic analytic scene."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarnerf_tpu.models.network import NeRFNetwork
from lidarnerf_tpu.models.renderer import RenderConfig, render_rays, render_rays_staged
from lidarnerf_tpu.nerf.train_step import (
    TrainConfig,
    ema_update,
    make_optimizer,
    make_train_step,
)
from lidarnerf_tpu.dataset.convert import pano_dirs

H, W = 16, 64
K_LIDAR = (10.0, 30.0)
SCALE = 0.05


def make_sphere_scene(n_frames=4):
    """Panos of a radius-8 sphere at the origin seen from nearby sensors."""
    rng = np.random.RandomState(0)
    poses, images = [], []
    dirs = pano_dirs(H, W, K_LIDAR).reshape(-1, 3)  # sensor frame
    for i in range(n_frames):
        t = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), 0.0]) * 2.0
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = t
        # ray-sphere intersection |o + s d| = 8
        o = np.broadcast_to(t, dirs.shape).astype(np.float64)
        b = 2 * np.sum(o * dirs, axis=1)
        c = np.sum(o * o, axis=1) - 64.0
        disc = b * b - 4 * c
        hit = disc > 0
        s = np.where(hit, (-b + np.sqrt(np.maximum(disc, 0))) / 2, 0.0)
        hit &= s > 0
        depth = np.where(hit, s, 0.0)
        p = o + s[:, None] * dirs
        normal = p / 8.0
        intensity = np.where(hit, 0.3 + 0.7 * np.abs(np.sum(normal * dirs, 1)), 0.0)
        img = np.stack(
            [hit.astype(np.float32), intensity, depth * SCALE], axis=-1
        ).reshape(H, W, 3)
        pose[:3, 3] = t * SCALE  # recentred/scaled pose, offset=0
        poses.append(pose)
        images.append(img.astype(np.float32))
    return np.stack(poses), np.stack(images)


def small_model(encoding="hashgrid"):
    return NeRFNetwork(
        encoding=encoding,
        desired_resolution=128,
        log2_hashmap_size=12,
        num_levels=8,
        bound=1.0,
    )


def small_cfgs(num_rays=512, iters=400, lr=5e-3, **kw):
    tcfg = TrainConfig(
        scale=SCALE,
        num_rays_lidar=num_rays,
        H_lidar=H,
        W_lidar=W,
        intrinsics_lidar=K_LIDAR,
        lr=lr,
        iters=iters,
        **kw,
    )
    rcfg = RenderConfig(
        num_steps=64,
        upsample_steps=16,
        min_near_lidar=SCALE,
        bound=1.0,
    )
    return tcfg, rcfg


def init_state(module, tcfg):
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.zeros((4, 3))
    )
    opt_state = make_optimizer(tcfg).init(params)
    return params, opt_state


class TestTrainStep:
    def test_smoke_and_params_change(self):
        poses, images = make_sphere_scene(2)
        module = small_model()
        tcfg, rcfg = small_cfgs()
        params, opt_state = init_state(module, tcfg)
        step = make_train_step(module, tcfg, rcfg)
        vi = jnp.zeros((2, 1), jnp.int32)
        vc = jnp.full((2,), H * W, jnp.int32)
        p0 = jax.tree.map(lambda x: x.copy(), params)
        params, opt_state, m = step(
            params, opt_state, jnp.array(poses), jnp.array(images), vi, vc, 0,
            jax.random.PRNGKey(1), 0,
        )
        assert np.isfinite(float(m["loss"]))
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p0, params)
        assert max(jax.tree.leaves(diffs)) > 0

    def test_patch_mode_with_grad_loss(self):
        poses, images = make_sphere_scene(2)
        module = small_model()
        tcfg, rcfg = small_cfgs(grad_loss=True)
        params, opt_state = init_state(module, tcfg)
        step = make_train_step(module, tcfg, rcfg, patch_size=[2, 8])
        vi = jnp.zeros((2, 1), jnp.int32)
        vc = jnp.full((2,), H * W, jnp.int32)
        params, opt_state, m = step(
            params, opt_state, jnp.array(poses), jnp.array(images), vi, vc, 1,
            jax.random.PRNGKey(2), 0,
        )
        assert np.isfinite(float(m["loss"]))

    def test_sobel_and_smoothers(self):
        poses, images = make_sphere_scene(1)
        module = small_model()
        tcfg, rcfg = small_cfgs(
            grad_loss=True, sobel_grad=True, spatial_smooth=True,
            grad_norm_smooth=True, tv_loss=True,
        )
        params, opt_state = init_state(module, tcfg)
        step = make_train_step(module, tcfg, rcfg, patch_size=4)
        vi = jnp.zeros((1, 1), jnp.int32)
        vc = jnp.full((1,), H * W, jnp.int32)
        params, _, m = step(
            params, opt_state, jnp.array(poses), jnp.array(images), vi, vc, 0,
            jax.random.PRNGKey(3), 0,
        )
        assert np.isfinite(float(m["loss"]))

    def test_masked_sampling(self):
        poses, images = make_sphere_scene(2)
        module = small_model()
        tcfg, rcfg = small_cfgs()
        params, opt_state = init_state(module, tcfg)
        step = make_train_step(module, tcfg, rcfg, masked_sampling=True)
        # valid indices: only the left half of the pano
        half = (H * W) // 2
        vi = jnp.broadcast_to(jnp.arange(half, dtype=jnp.int32), (2, half))
        vc = jnp.full((2,), half, jnp.int32)
        params, _, m = step(
            params, opt_state, jnp.array(poses), jnp.array(images), vi, vc, 0,
            jax.random.PRNGKey(4), 0,
        )
        assert np.isfinite(float(m["loss"]))


class TestEpochStep:
    """Fused-epoch lax.scan step (round 5, train_step.make_epoch_step)."""

    def _run(self, occ):
        from dataclasses import replace

        from lidarnerf_tpu.models.occupancy import OccConfig, init_occ_grid
        from lidarnerf_tpu.nerf.train_step import make_epoch_step

        poses, images = make_sphere_scene(3)
        module = small_model()
        tcfg, rcfg = small_cfgs()
        occ_cfg = None
        if occ:
            occ_cfg = OccConfig(grid_size=16, bins=16, update_interval=2)
            rcfg = replace(rcfg, occ=occ_cfg)
        params, opt_state = init_state(module, tcfg)
        epoch_fn = make_epoch_step(module, tcfg, rcfg)
        vi = jnp.zeros((3, 1), jnp.int32)
        vc = jnp.full((3,), H * W, jnp.int32)
        grid = (
            init_occ_grid(occ_cfg) if occ else jnp.zeros((1, 1, 1), jnp.float32)
        )
        K = 3
        keys = jax.random.split(jax.random.PRNGKey(0), K)
        okeys = jax.random.split(jax.random.PRNGKey(1), K)
        order = jnp.asarray([2, 0, 1], jnp.int32)
        p0 = jax.tree.map(lambda x: x.copy(), params)
        # donate_argnums invalidates the passed buffers — keep `grid` intact
        # for comparison by donating a copy
        params, opt_state, grid_out, ms = epoch_fn(
            params, opt_state, jnp.copy(grid), jnp.array(poses),
            jnp.array(images), vi, vc, order, keys, okeys, 0,
        )
        return p0, params, grid, grid_out, ms

    def test_scan_epoch_runs_and_updates(self):
        p0, params, _, _, ms = self._run(occ=False)
        assert ms["loss"].shape == (3,)
        assert np.isfinite(np.asarray(ms["loss"])).all()
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p0, params)
        assert max(jax.tree.leaves(diffs)) > 0

    def test_occ_grid_refreshes_inside_scan(self):
        # update_interval=2 with step0=0: refresh fires at steps 0 and 2
        _, _, grid_in, grid_out, ms = self._run(occ=True)
        assert grid_out.shape == grid_in.shape
        assert float(jnp.abs(grid_out - grid_in).max()) > 0
        assert np.isfinite(np.asarray(ms["loss"])).all()

    def test_deterministic(self):
        _, p1, _, _, ms1 = self._run(occ=False)
        _, p2, _, _, ms2 = self._run(occ=False)
        np.testing.assert_array_equal(
            np.asarray(ms1["loss"]), np.asarray(ms2["loss"])
        )
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestConvergence:
    @pytest.mark.slow
    @pytest.mark.parametrize("encoding", ["hashgrid", "blockhash"])
    def test_sphere_depth_converges(self, encoding):
        poses, images = make_sphere_scene(4)
        module = small_model(encoding)
        tcfg, rcfg = small_cfgs(num_rays=1024, iters=300)
        params, opt_state = init_state(module, tcfg)
        step = make_train_step(module, tcfg, rcfg)
        vi = jnp.zeros((4, 1), jnp.int32)
        vc = jnp.full((4,), H * W, jnp.int32)
        posesj, imagesj = jnp.array(poses), jnp.array(images)
        key = jax.random.PRNGKey(0)
        first_mae = None
        for it in range(300):
            key, sub = jax.random.split(key)
            params, opt_state, m = step(
                params, opt_state, posesj, imagesj, vi, vc, it % 4, sub, it
            )
            if it == 0:
                first_mae = float(m["depth_mae"])
        last_mae = float(m["depth_mae"])
        assert np.isfinite(last_mae)
        assert last_mae < first_mae * 0.2, (first_mae, last_mae)

        # full-frame eval: depth error in world units
        out = render_rays_staged(
            module, params,
            *(lambda r: (r["rays_o"][0], r["rays_d"][0]))(
                __import__("lidarnerf_tpu.dataset.base", fromlist=["get_lidar_rays"]).get_lidar_rays(
                    posesj[:1], K_LIDAR, H, W, N=-1
                )
            ),
            rcfg, chunk=256,
        )
        gt = images[0].reshape(-1, 3)
        mask = gt[:, 0] > 0.5
        depth_err = np.abs(np.asarray(out["depth"])[mask] - gt[mask, 2]) / SCALE
        assert np.median(depth_err) < 1.0, np.median(depth_err)  # < 1 world unit


class TestEMA:
    def test_torch_ema_semantics(self):
        p = {"w": jnp.ones(3)}
        e = {"w": jnp.zeros(3)}
        e1 = ema_update(e, p, 0.95, num_updates=0)
        # effective decay = min(0.95, 1/10) = 0.1
        np.testing.assert_allclose(np.asarray(e1["w"]), 0.9, rtol=1e-6)
        e2 = ema_update(e, p, 0.95, num_updates=1000)
        np.testing.assert_allclose(np.asarray(e2["w"]), 0.05, rtol=1e-5)


class TestOptimizer:
    def test_lr_schedule_decay(self):
        tcfg, _ = small_cfgs(iters=100, lr=1e-2)
        sched = lambda s: tcfg.lr * 0.1 ** min(s / tcfg.iters, 1.0)
        assert abs(sched(0) - 1e-2) < 1e-12
        assert abs(sched(100) - 1e-3) < 1e-12
        assert abs(sched(1000) - 1e-3) < 1e-12


class TestSamplingReplacement:
    """VERDICT r1 #10: show the with-replacement masked sampler (the static-
    shape default) is immaterial vs the reference's randperm-without-
    replacement semantics (nerfmvl_dataset.py:153-168) at matched budgets."""

    @pytest.mark.slow
    def test_with_vs_without_replacement_convergence(self):
        poses, images = make_sphere_scene(2)
        module = small_model()
        tcfg, rcfg = small_cfgs(num_rays=256, iters=150)
        half = (H * W) // 2  # masked pool: left half of the pano
        vi = jnp.broadcast_to(jnp.arange(half, dtype=jnp.int32), (2, half))
        vc = jnp.full((2,), half, jnp.int32)
        posesj, imagesj = jnp.array(poses), jnp.array(images)

        maes = {}
        for wo in (False, True):
            params, opt_state = init_state(module, tcfg)
            step = make_train_step(
                module, tcfg, rcfg, masked_sampling=True,
                sample_without_replacement=wo,
            )
            key = jax.random.PRNGKey(11)
            for it in range(150):
                key, sub = jax.random.split(key)
                params, opt_state, m = step(
                    params, opt_state, posesj, imagesj, vi, vc, it % 2, sub, it
                )
            maes[wo] = float(m["depth_mae"])
        assert np.isfinite(maes[False]) and np.isfinite(maes[True])
        # both samplers must land in the same quality regime
        lo, hi = sorted(maes.values())
        assert hi < 1.5 * lo + 1e-3, maes

    def test_without_replacement_single_step(self):
        poses, images = make_sphere_scene(2)
        module = small_model()
        tcfg, rcfg = small_cfgs(num_rays=64)
        params, opt_state = init_state(module, tcfg)
        step = make_train_step(
            module, tcfg, rcfg, masked_sampling=True,
            sample_without_replacement=True,
        )
        half = (H * W) // 2
        vi = jnp.broadcast_to(jnp.arange(half, dtype=jnp.int32), (2, half))
        vc = jnp.full((2,), half, jnp.int32)
        params, _, m = step(
            params, opt_state, jnp.array(poses), jnp.array(images), vi, vc, 0,
            jax.random.PRNGKey(5), 0,
        )
        assert np.isfinite(float(m["loss"]))


class TestNonFiniteGuard:
    """GradScaler-equivalent skip: a non-finite step must not poison params
    (reference AMP scaler.step skips on inf/nan grads, utils.py:1221-1223)."""

    def test_nan_batch_skips_update(self):
        poses, images = make_sphere_scene(2)
        images = np.asarray(images).copy()
        images[..., 2] = np.nan  # poisoned gt depths -> NaN loss/grads
        module = small_model()
        tcfg, rcfg = small_cfgs()
        params, opt_state = init_state(module, tcfg)
        step = make_train_step(module, tcfg, rcfg)
        vi = jnp.zeros((2, 1), jnp.int32)
        vc = jnp.full((2,), H * W, jnp.int32)
        p2, o2, m = step(
            jax.tree.map(jnp.copy, params), opt_state,
            jnp.array(poses), jnp.array(images), vi, vc, 0,
            jax.random.PRNGKey(0), 0,
        )
        assert float(m["skipped_nonfinite"]) == 1.0
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_healthy_batch_not_skipped(self):
        poses, images = make_sphere_scene(2)
        module = small_model()
        tcfg, rcfg = small_cfgs()
        params, opt_state = init_state(module, tcfg)
        step = make_train_step(module, tcfg, rcfg)
        vi = jnp.zeros((2, 1), jnp.int32)
        vc = jnp.full((2,), H * W, jnp.int32)
        p2, _, m = step(
            jax.tree.map(jnp.copy, params), opt_state,
            jnp.array(poses), jnp.array(images), vi, vc, 0,
            jax.random.PRNGKey(0), 0,
        )
        assert float(m["skipped_nonfinite"]) == 0.0
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2))
        )
