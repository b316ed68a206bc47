"""Occupancy-prior sampling tests (models/occupancy.py).

The module is the TPU-native, static-shape answer to the reference's
density_grid ray marching (/root/reference/lidarnerf/raymarching/src/
raymarching.cu kernel_march_rays_train:332-575): an EMA-max coarse grid
reweights the coarse stratified CDF instead of compacting samples.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lidarnerf_tpu.models.occupancy import (
    OccConfig,
    init_occ_grid,
    occ_bin_pdf,
    occ_z_vals,
    update_occ_grid,
)
from lidarnerf_tpu.models.network import NeRFNetwork
from lidarnerf_tpu.models.renderer import RenderConfig, render_rays
from lidarnerf_tpu.nerf.train_step import TrainConfig, make_optimizer, make_train_step
from lidarnerf_tpu.ops.sampling import stratified_z_vals


class SlabField:
    """Fake field: sigma = 50 inside the slab 0 < x0 < 0.5, else 0."""

    def apply(self, params, x, method=None):
        sigma = jnp.where((x[:, 0] > 0.0) & (x[:, 0] < 0.5), 50.0, 0.0)
        return sigma, None

    def density(self, x):  # only used as a method token by update_occ_grid
        raise NotImplementedError


# dilate=0 keeps the PDF bin-sharp for the exact-shape assertions below;
# TestDilate covers the default dilate=1 behavior (the --fast depth-tail fix)
CFG = OccConfig(grid_size=32, bins=64, floor=0.05, density_thresh=10.0, dilate=0)


class TestGrid:
    def test_init_zero(self):
        g = init_occ_grid(CFG)
        assert g.shape == (32, 32, 32)
        assert float(jnp.max(g)) == 0.0

    def test_update_marks_occupied_region(self):
        g = init_occ_grid(CFG)
        g = update_occ_grid(SlabField(), None, g, jax.random.PRNGKey(0), CFG, 1.0)
        g = np.asarray(g)
        # cells fully inside the slab (x0 in (0, 0.5) -> i in [17, 23] of 32
        # over [-1, 1]) must be hot; cells fully outside must be ~0
        assert g[18:23].min() >= 49.0
        assert g[:15].max() == 0.0
        assert g[25:].max() == 0.0

    def test_ema_decay_law(self):
        # a cell the field no longer supports decays by exactly `decay`
        g = jnp.full((32, 32, 32), 7.0)
        g2 = update_occ_grid(SlabField(), None, g, jax.random.PRNGKey(1), CFG, 1.0)
        g2 = np.asarray(g2)
        np.testing.assert_allclose(g2[:15], 7.0 * CFG.decay, rtol=1e-6)
        # supported cells take the fresh (larger) sigma, not the decayed value
        assert g2[18:23].min() >= 49.0


def slab_grid(hot=50.0):
    """Grid occupied only where x0 in (0, 0.5)."""
    g = np.zeros((32, 32, 32), np.float32)
    g[16:24] = hot
    return jnp.asarray(g)


class TestPdf:
    def test_empty_grid_gives_uniform(self):
        rays_o = jnp.zeros((4, 3))
        rays_d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (4, 1))
        nears = jnp.full((4, 1), 0.05)
        fars = jnp.full((4, 1), 2.0)
        pdf = occ_bin_pdf(init_occ_grid(CFG), rays_o, rays_d, nears, fars, CFG, 1.0)
        np.testing.assert_allclose(np.asarray(pdf), 1.0 / CFG.bins, rtol=1e-5)

    def test_concentrates_on_occupied_bins(self):
        # ray along +x0 from x0=-1: slab (0, 0.5) = t in (1, 1.5) of [0, 2]
        rays_o = jnp.array([[-1.0, 0.1, 0.1]])
        rays_d = jnp.array([[1.0, 0.0, 0.0]])
        nears = jnp.full((1, 1), 1e-3)
        fars = jnp.full((1, 1), 2.0)
        pdf = np.asarray(
            occ_bin_pdf(slab_grid(), rays_o, rays_d, nears, fars, CFG, 1.0)
        )[0]
        assert abs(pdf.sum() - 1.0) < 1e-5
        t = (np.arange(CFG.bins) + 0.5) / CFG.bins * 2.0
        inside = (t > 1.0) & (t < 1.5)
        # occupied bins carry (1 - floor) + their share of the floor
        assert pdf[inside].sum() > 1.0 - CFG.floor - 1e-4
        # floor keeps empty bins explorable (exactly floor/K each)
        np.testing.assert_allclose(pdf[~inside], CFG.floor / CFG.bins, rtol=1e-4)

    def test_all_empty_ray_degrades_to_uniform(self):
        # ray that never enters the slab
        rays_o = jnp.array([[-1.0, 0.9, 0.9]])
        rays_d = jnp.array([[0.0, 0.0, -1.0]])
        nears = jnp.full((1, 1), 1e-3)
        fars = jnp.full((1, 1), 0.5)
        pdf = np.asarray(
            occ_bin_pdf(slab_grid(), rays_o, rays_d, nears, fars, CFG, 1.0)
        )[0]
        np.testing.assert_allclose(pdf, 1.0 / CFG.bins, rtol=1e-4)


class TestDilate:
    def test_dilation_extends_occupancy_one_cell(self):
        # slab cells [16:24] -> dilated [15:25]: x0 in (-1/16, 9/16)
        cfg = OccConfig(grid_size=32, bins=64, floor=0.05, dilate=1)
        rays_o = jnp.array([[-1.0, 0.1, 0.1]])
        rays_d = jnp.array([[1.0, 0.0, 0.0]])
        nears = jnp.full((1, 1), 1e-3)
        fars = jnp.full((1, 1), 2.0)
        pdf = np.asarray(occ_bin_pdf(slab_grid(), rays_o, rays_d, nears, fars, cfg, 1.0))[0]
        t = (np.arange(cfg.bins) + 0.5) / cfg.bins * 2.0
        dilated = (t > 1.0 - 1.0 / 16) & (t < 1.5 + 1.0 / 16)
        assert pdf[dilated].sum() > 1.0 - cfg.floor - 1e-4
        np.testing.assert_allclose(pdf[~dilated], cfg.floor / cfg.bins, rtol=1e-4)

    def test_grazing_ray_covered_only_with_dilation(self):
        """A ray skimming one cell above an occupied wall: undilated occupancy
        sees nothing (the --fast boundary failure mode); dilate=1 covers it."""
        g = np.zeros((32, 32, 32), np.float32)
        g[16:24, :, 0:8] = 50.0  # wall below x2 = -0.5
        g = jnp.asarray(g)
        # ray along +x0 at x2 just above the wall (cell index 8)
        rays_o = jnp.array([[-1.0, 0.1, -0.47]])
        rays_d = jnp.array([[1.0, 0.0, 0.0]])
        nears = jnp.full((1, 1), 1e-3)
        fars = jnp.full((1, 1), 2.0)
        cfg0 = OccConfig(grid_size=32, bins=64, floor=0.05, dilate=0)
        cfg1 = OccConfig(grid_size=32, bins=64, floor=0.05, dilate=1)
        pdf0 = np.asarray(occ_bin_pdf(g, rays_o, rays_d, nears, fars, cfg0, 1.0))[0]
        pdf1 = np.asarray(occ_bin_pdf(g, rays_o, rays_d, nears, fars, cfg1, 1.0))[0]
        t = (np.arange(64) + 0.5) / 64 * 2.0
        near_wall = (t > 1.0) & (t < 1.5)
        # undilated: uniform (ray misses every occupied cell)
        np.testing.assert_allclose(pdf0, 1.0 / 64, rtol=1e-4)
        # dilated: mass concentrates over the wall span
        assert pdf1[near_wall].sum() > 0.7


class TestZVals:
    def test_sorted_and_bounded(self):
        rays_o = jnp.tile(jnp.array([[-1.0, 0.1, 0.1]]), (8, 1))
        rays_d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (8, 1))
        nears = jnp.full((8, 1), 0.05)
        fars = jnp.full((8, 1), 2.0)
        pdf = occ_bin_pdf(slab_grid(), rays_o, rays_d, nears, fars, CFG, 1.0)
        z = np.asarray(occ_z_vals(jax.random.PRNGKey(0), nears, fars, pdf, 96, True))
        assert z.shape == (8, 96)
        assert (np.diff(z, axis=-1) >= 0).all()
        assert (z >= 0.05 - 1e-6).all() and (z <= 2.0 + 1e-6).all()

    def test_uniform_pdf_matches_parity_linspace(self):
        """Deterministic inversion of a uniform CDF == the reference's
        inclusive-linspace stratified law (renderer.py:149-161)."""
        nears = jnp.full((3, 1), 0.1)
        fars = jnp.full((3, 1), 1.7)
        pdf = jnp.full((3, CFG.bins), 1.0 / CFG.bins)
        z = np.asarray(occ_z_vals(jax.random.PRNGKey(0), nears, fars, pdf, 32, False))
        expect = np.asarray(
            stratified_z_vals(jax.random.PRNGKey(0), nears, fars, 32, False)
        )
        np.testing.assert_allclose(z, expect, rtol=1e-5, atol=1e-6)

    def test_mass_lands_in_occupied_region(self):
        rays_o = jnp.array([[-1.0, 0.1, 0.1]])
        rays_d = jnp.array([[1.0, 0.0, 0.0]])
        nears = jnp.full((1, 1), 1e-3)
        fars = jnp.full((1, 1), 2.0)
        pdf = occ_bin_pdf(slab_grid(), rays_o, rays_d, nears, fars, CFG, 1.0)
        z = np.asarray(
            occ_z_vals(jax.random.PRNGKey(3), nears, fars, pdf, 128, True)
        )[0]
        inside = ((z > 1.0) & (z < 1.5)).mean()
        # ~95% of samples in the 25%-of-range occupied span
        assert inside > 0.85


class TestIntegration:
    def _setup(self, occ_cfg):
        module = NeRFNetwork(
            encoding="hashgrid",
            desired_resolution=64,
            log2_hashmap_size=10,
            num_levels=4,
            bound=1.0,
        )
        rcfg = RenderConfig(
            num_steps=32, upsample_steps=8, min_near_lidar=0.05, bound=1.0, occ=occ_cfg
        )
        params = module.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.zeros((4, 3)))
        return module, params, rcfg

    def test_render_rays_with_occ(self):
        occ_cfg = OccConfig(grid_size=16, bins=32)
        module, params, rcfg = self._setup(occ_cfg)
        grid = init_occ_grid(occ_cfg)
        rays_o = jnp.zeros((64, 3))
        rays_d = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        out = render_rays(module, params, rays_o, rays_d, jax.random.PRNGKey(2), rcfg, True, grid)
        assert np.isfinite(np.asarray(out["depth"])).all()
        assert np.isfinite(np.asarray(out["image"])).all()

    def test_zero_grid_matches_uniform_stats(self):
        """Cold start: zero grid == uniform PDF == parity stratified law."""
        occ_cfg = OccConfig(grid_size=16, bins=32)
        module, params, rcfg = self._setup(occ_cfg)
        rcfg_plain = RenderConfig(
            num_steps=32, upsample_steps=8, min_near_lidar=0.05, bound=1.0
        )
        rays_o = jnp.zeros((32, 3))
        rays_d = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (32, 1))
        # deterministic (train=False) renders must agree exactly: uniform CDF
        # inversion with centered u == stratified midpoints
        out_occ = render_rays(
            module, params, rays_o, rays_d, jax.random.PRNGKey(0), rcfg, False,
            init_occ_grid(occ_cfg),
        )
        out_plain = render_rays(
            module, params, rays_o, rays_d, jax.random.PRNGKey(0), rcfg_plain, False
        )
        np.testing.assert_allclose(
            np.asarray(out_occ["depth"]), np.asarray(out_plain["depth"]), rtol=1e-4
        )

    def test_train_step_with_occ_grid(self):
        from tests.test_train import make_sphere_scene, small_cfgs, init_state

        poses, images = make_sphere_scene(2)
        module = NeRFNetwork(
            encoding="hashgrid",
            desired_resolution=128,
            log2_hashmap_size=12,
            num_levels=8,
            bound=1.0,
        )
        occ_cfg = OccConfig(grid_size=16, bins=32)
        tcfg, rcfg = small_cfgs()
        rcfg = RenderConfig(
            num_steps=rcfg.num_steps,
            upsample_steps=rcfg.upsample_steps,
            min_near_lidar=rcfg.min_near_lidar,
            bound=rcfg.bound,
            occ=occ_cfg,
        )
        params, opt_state = init_state(module, tcfg)
        grid = update_occ_grid(
            module, params, init_occ_grid(occ_cfg), jax.random.PRNGKey(0), occ_cfg, 1.0
        )
        step = make_train_step(module, tcfg, rcfg)
        vi = jnp.zeros((2, 1), jnp.int32)
        vc = jnp.full((2,), images.shape[1] * images.shape[2], jnp.int32)
        params, opt_state, m = step(
            params, opt_state, jnp.array(poses), jnp.array(images), vi, vc, 0,
            jax.random.PRNGKey(1), 0, occ_grid=grid,
        )
        assert np.isfinite(float(m["loss"]))
