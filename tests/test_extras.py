"""Tests for SH degrees 5-8, morton utils, bg model, RGB render path."""

import numpy as np
import jax
import jax.numpy as jnp

from lidarnerf_tpu.ops.encoders import sh_encode
from lidarnerf_tpu.ops.morton import morton3D, morton3D_invert, packbits
from lidarnerf_tpu.ops import losses
from lidarnerf_tpu.models.network import NeRFNetwork
from lidarnerf_tpu.models.renderer import (
    RenderConfig,
    near_far_from_aabb,
    render_rays,
    sph_from_ray,
)


class TestHighDegreeSH:
    def test_degree8_orthonormality(self):
        rng = np.random.RandomState(0)
        v = rng.randn(200000, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        Y = np.asarray(sh_encode(jnp.array(v, jnp.float32), 8))
        assert Y.shape == (len(v), 64)
        gram = 4 * np.pi * (Y.T @ Y) / len(v)
        np.testing.assert_allclose(gram, np.eye(64), atol=0.06)

    def test_degree5_consistent_with_degree4_prefix(self):
        rng = np.random.RandomState(1)
        v = rng.randn(100, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        y4 = np.asarray(sh_encode(jnp.array(v, jnp.float32), 4))
        y5 = np.asarray(sh_encode(jnp.array(v, jnp.float32), 5))
        np.testing.assert_allclose(y5[:, :16], y4, rtol=1e-4, atol=1e-5)


class TestMorton:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        coords = rng.randint(0, 1024, (1000, 3)).astype(np.int32)
        codes = morton3D(jnp.array(coords))
        back = np.asarray(morton3D_invert(codes))
        np.testing.assert_array_equal(back, coords)

    def test_locality(self):
        """Adjacent cells differ in few morton bits (z-order property)."""
        a = morton3D(jnp.array([[0, 0, 0]]))
        b = morton3D(jnp.array([[1, 0, 0]]))
        assert int(a[0]) == 0 and int(b[0]) == 1

    def test_packbits(self):
        grid = jnp.array([0.0, 5.0, 0.0, 5.0, 0.0, 0.0, 0.0, 5.0])
        bits = packbits(grid, 1.0)
        assert bits.shape == (1,)
        assert int(bits[0]) == 0b10001010


class TestBackgroundModel:
    def test_sph_from_ray(self):
        # ray from origin along +y hits sphere pole: theta = 0
        o = jnp.zeros((1, 3))
        d = jnp.array([[0.0, 1.0, 0.0]])
        sph = np.asarray(sph_from_ray(o, d, 10.0))
        np.testing.assert_allclose(sph[0, 0], -1.0, atol=1e-5)  # 2*0/pi - 1
        # along +x: theta = pi/2 -> 0, phi = 0
        d = jnp.array([[1.0, 0.0, 0.0]])
        sph = np.asarray(sph_from_ray(o, d, 10.0))
        np.testing.assert_allclose(sph[0], [0.0, 0.0], atol=1e-5)

    def test_rgb_render_with_bg(self):
        module = NeRFNetwork(
            encoding="frequency", multires=6, bound=1.0, bg_radius=32.0
        )
        params = module.init(
            jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.zeros((4, 3))
        )
        cfg = RenderConfig(
            num_steps=16, upsample_steps=4, min_near=0.05, bound=1.0,
            cal_lidar_color=False, bg_radius=32.0,
        )
        rng = np.random.RandomState(0)
        d = rng.randn(8, 3)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        out = render_rays(
            module, params, jnp.zeros((8, 3)), jnp.asarray(d, jnp.float32),
            jax.random.PRNGKey(1), cfg, False,
        )
        img = np.asarray(out["image"])
        assert img.shape == (8, 3)
        assert np.isfinite(img).all()
        assert (img >= 0).all() and (img <= 1.0 + 1e-5).all()

    def test_near_far_from_aabb(self):
        o = jnp.array([[-2.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        near, far = near_far_from_aabb(
            o, d, jnp.full(3, -1.0), jnp.full(3, 1.0), 0.05
        )
        np.testing.assert_allclose(float(near[0, 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(float(far[0, 0]), 3.0, atol=1e-5)


class TestExtraLosses:
    def test_mape(self):
        p = jnp.array([1.1, 2.0])
        g = jnp.array([1.0, 2.0])
        m = np.asarray(losses.mape(p, g))
        np.testing.assert_allclose(m[0], 0.1 / 1.01, rtol=1e-5)
        assert m[1] == 0

    def test_eff_distloss_zero_for_point_mass(self):
        """All weight in a single sample -> distortion ~ interval/3 * w^2."""
        w = jnp.zeros((1, 8)).at[0, 3].set(1.0)
        mids = jnp.linspace(0.1, 0.8, 8)[None]
        ivals = jnp.full((1, 8), 0.1)
        val = float(losses.eff_distloss(w, mids, ivals)[0])
        np.testing.assert_allclose(val, 0.1 / 3, rtol=1e-5)


class TestEncoderFactory:
    def test_all_encodings(self):
        import jax
        from lidarnerf_tpu.ops.factory import get_encoder

        x = jnp.array(np.random.RandomState(0).rand(8, 3), jnp.float32)
        for name in ["None", "frequency", "sphere_harmonics", "hashgrid",
                     "tiledgrid", "blockhash"]:
            enc, init, dim = get_encoder(
                name, multires=6, degree=4, num_levels=4,
                log2_hashmap_size=10, desired_resolution=64,
            )
            params = init(jax.random.PRNGKey(0))
            out = enc(x, params)
            assert out.shape == (8, dim), name

    def test_unknown_raises(self):
        import pytest
        from lidarnerf_tpu.ops.factory import get_encoder

        with pytest.raises(NotImplementedError):
            get_encoder("ash")

    def test_tv_regularizer(self):
        import jax
        from lidarnerf_tpu.ops import hash_grid as hg

        spec = hg.make_hash_grid_spec(
            num_levels=2, base_resolution=4, log2_hashmap_size=8,
            desired_resolution=8,
        )
        table = hg.hash_grid_init(jax.random.PRNGKey(0), spec)
        loss = hg.hash_grid_total_variation(table, spec, jax.random.PRNGKey(1), 1000)
        assert float(loss) >= 0
        g = jax.grad(
            lambda t: hg.hash_grid_total_variation(t, spec, jax.random.PRNGKey(1), 1000)
        )(table)
        assert np.isfinite(np.asarray(g)).all()
