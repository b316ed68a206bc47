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


class TestPeriodicVolume:
    """The reference's dormant PeriodicVolumeEncoding (encoding.py:123-296)
    exposed as a first-class factory name."""

    def _spec(self, **kw):
        from lidarnerf_tpu.ops import periodic_volume as pv

        args = dict(num_levels=3, min_res=4, max_res=16, log2_hashmap_size=9,
                    features_per_level=2)
        args.update(kw)
        return pv.make_periodic_volume_spec(**args)

    def test_oracle_parity(self):
        """Match a direct per-point numpy port of encoding.py:201-273."""
        import jax
        from lidarnerf_tpu.ops import periodic_volume as pv

        spec = self._spec()
        table = pv.periodic_volume_init(jax.random.PRNGKey(0), spec)
        tab = np.asarray(table)
        R = spec.resolution
        x = np.random.RandomState(1).rand(16, 3).astype(np.float32)
        out = np.asarray(pv.periodic_volume_encode(jnp.asarray(x), table, spec))

        def hash_fn(c, lvl):
            c = np.mod(c, R)
            return (c[0] * R + c[1]) * R + c[2] + lvl * spec.level_size

        for i in range(x.shape[0]):
            for lvl, scale in enumerate(spec.scalings):
                pos = x[i] * scale
                f = np.floor(pos)
                cidx = np.ceil(pos)
                off = pos - f
                acc = np.zeros(2, np.float32)
                for c in range(8):
                    bits = np.array([(c >> 2) & 1, (c >> 1) & 1, c & 1])
                    corner = np.where(bits, cidx, f).astype(np.int64)
                    w = np.prod(np.where(bits, off, 1.0 - off))
                    acc += w * tab[hash_fn(corner, lvl)]
                np.testing.assert_allclose(
                    out[i, 2 * lvl : 2 * lvl + 2], acc, rtol=2e-5, atol=1e-7
                )

    def test_periodic_wraparound(self):
        """Coordinates differing by R/scale whole volumes encode identically."""
        import jax
        from lidarnerf_tpu.ops import periodic_volume as pv

        spec = self._spec(num_levels=1, min_res=8, max_res=8)
        table = pv.periodic_volume_init(jax.random.PRNGKey(0), spec)
        R = spec.resolution
        x = jnp.array([[0.11, 0.23, 0.37]], jnp.float32)
        shift = R / spec.scalings[0]
        a = pv.periodic_volume_encode(x, table, spec)
        b = pv.periodic_volume_encode(x + shift, table, spec)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)

    def test_tv_loss_and_grad(self):
        import jax
        from lidarnerf_tpu.ops import periodic_volume as pv

        spec = self._spec()
        table = pv.periodic_volume_init(jax.random.PRNGKey(0), spec)
        tv = pv.periodic_volume_total_variation(table, spec)
        assert float(tv) > 0
        g = jax.grad(lambda t: pv.periodic_volume_total_variation(t, spec))(table)
        assert np.isfinite(np.asarray(g)).all()
        # constant volume has zero TV
        flat = jnp.ones_like(table)
        assert float(pv.periodic_volume_total_variation(flat, spec)) == 0.0

    def test_factory_and_grad_flow(self):
        import jax
        from lidarnerf_tpu.ops.factory import get_encoder

        enc, init, dim = get_encoder(
            "periodic_volume", num_levels=2, base_resolution=4,
            desired_resolution=16, log2_hashmap_size=9,
        )
        params = init(jax.random.PRNGKey(0))
        x = jnp.array(np.random.RandomState(0).rand(8, 3), jnp.float32)
        out = enc(x, params)
        assert out.shape == (8, dim)
        g = jax.grad(lambda p: enc(x, p).sum())(params)
        assert float(jnp.abs(g).sum()) > 0

    def test_model_encoding(self):
        """NeRFNetwork accepts encoding='periodic_volume' (the reference's
        dormant PeriodicVolumeEncoding as a user-selectable model encoding;
        CLI --encoding choice wired in main_lidarnerf.py)."""
        import jax
        from lidarnerf_tpu.models.network import NeRFNetwork

        m = NeRFNetwork(
            encoding="periodic_volume", num_levels=2, base_resolution=4,
            desired_resolution=16, log2_hashmap_size=9,
        )
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.zeros((4, 3)))
        sigma, geo = m.apply(params, jnp.zeros((4, 3)), method=m.density)
        assert sigma.shape == (4,)
        g = jax.grad(
            lambda p: m.apply(p, jnp.zeros((4, 3)), method=m.density)[0].sum()
        )(params)
        leaves = jax.tree.leaves(g)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)

    def test_requires_log2_multiple_of_3(self):
        import pytest
        from lidarnerf_tpu.ops import periodic_volume as pv

        with pytest.raises(ValueError):
            pv.make_periodic_volume_spec(log2_hashmap_size=10)
