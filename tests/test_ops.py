"""Unit tests for core ops against closed-form / numpy / scipy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarnerf_tpu.ops import (
    trunc_exp,
    frequency_encode,
    frequency_encoding_dim,
    sh_encode,
    sample_pdf,
    composite_weights,
)
from lidarnerf_tpu.ops import hash_grid as hg
from lidarnerf_tpu.ops.chamfer import chamfer_and_fscore
from lidarnerf_tpu.ops import losses


class TestTruncExp:
    def test_forward(self):
        x = jnp.array([-1.0, 0.0, 2.0])
        np.testing.assert_allclose(trunc_exp(x), np.exp([-1.0, 0.0, 2.0]), rtol=1e-6)

    def test_grad_clamped(self):
        g = jax.grad(lambda x: trunc_exp(x))(20.0)
        assert np.isfinite(g)
        np.testing.assert_allclose(g, np.exp(15.0), rtol=1e-6)

    def test_grad_normal_range(self):
        g = jax.grad(lambda x: trunc_exp(x))(1.5)
        np.testing.assert_allclose(g, np.exp(1.5), rtol=1e-6)


class TestFrequencyEncode:
    def test_layout_matches_cuda_kernel(self):
        """Replicates freqencoder.cu:52-62 output ordering elementwise."""
        deg, D = 3, 3
        x = np.random.RandomState(0).randn(5, D).astype(np.float32)
        out = np.asarray(frequency_encode(jnp.array(x), deg))
        C = frequency_encoding_dim(D, deg)
        assert out.shape == (5, C)
        for b in range(5):
            for c in range(C):
                if c < D:
                    expected = x[b, c]
                else:
                    col = c // D - 1
                    d = c % D
                    freq = col // 2
                    phase = (col % 2) * (np.pi / 2)
                    expected = np.sin(np.ldexp(x[b, d], freq) + phase)
                np.testing.assert_allclose(out[b, c], expected, rtol=1e-5, atol=1e-6)


class TestSHEncode:
    def test_degree4_values(self):
        d = np.array([[0.0, 0.0, 1.0]], np.float32)  # +z
        out = np.asarray(sh_encode(jnp.array(d), 4))[0]
        assert out.shape == (16,)
        np.testing.assert_allclose(out[0], 0.28209479177387814, rtol=1e-6)
        np.testing.assert_allclose(out[2], 0.48860251190291987, rtol=1e-6)
        np.testing.assert_allclose(out[1], 0.0, atol=1e-7)
        np.testing.assert_allclose(out[3], 0.0, atol=1e-7)
        # l=2, m=0 at z: sqrt(5)/(4 sqrt(pi)) * (3-1)
        np.testing.assert_allclose(
            out[6], 0.94617469575755997 - 0.31539156525251999, rtol=1e-6
        )

    def test_orthonormality(self):
        """Monte-Carlo check: int Y_i Y_j over the sphere ~ delta_ij / (4pi norm)."""
        rng = np.random.RandomState(1)
        v = rng.randn(200000, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        Y = np.asarray(sh_encode(jnp.array(v, dtype=jnp.float32), 4))
        gram = 4 * np.pi * (Y.T @ Y) / len(v)
        np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def _hash_grid_oracle(x01, table, spec):
    """Numpy oracle re-deriving the CUDA gridencoder semantics independently."""
    B = x01.shape[0]
    out = np.zeros((B, spec.output_dim), np.float32)
    primes = np.array([1, 2654435761, 805459861], dtype=np.uint64)
    for b in range(B):
        if np.any(x01[b] < 0) or np.any(x01[b] > 1):
            continue
        for li, lvl in enumerate(spec.levels):
            pos = x01[b] * lvl.scale + 0.5
            pg = np.floor(pos).astype(np.uint64)
            frac = pos - np.floor(pos)
            acc = np.zeros(spec.level_dim, np.float32)
            for corner in range(8):
                w = 1.0
                coord = pg.copy()
                for d in range(3):
                    if (corner >> d) & 1:
                        w *= frac[d]
                        coord[d] += 1
                    else:
                        w *= 1 - frac[d]
                stride, index, nd = 1, 0, 0
                corners = lvl.resolution + 1
                while nd < 3 and stride <= lvl.size:
                    index += int(coord[nd]) * stride
                    stride *= corners
                    nd += 1
                if stride > lvl.size:  # hash fallback
                    index = 0
                    for d in range(3):
                        index ^= int((coord[d] * primes[d]) % (1 << 32))
                idx = (index % (1 << 32)) % lvl.size + lvl.offset
                acc += w * table[idx]
            out[b, li * spec.level_dim : (li + 1) * spec.level_dim] = acc
    return out


class TestHashGrid:
    def make(self, **kw):
        spec = hg.make_hash_grid_spec(
            num_levels=kw.pop("num_levels", 4),
            base_resolution=4,
            log2_hashmap_size=kw.pop("log2_hashmap_size", 7),
            desired_resolution=kw.pop("desired_resolution", 64),
            **kw,
        )
        table = np.asarray(hg.hash_grid_init(jax.random.PRNGKey(0), spec))
        return spec, table

    def test_matches_numpy_oracle(self):
        spec, table = self.make()
        x = np.random.RandomState(0).rand(32, 3).astype(np.float32)
        got = np.asarray(hg.hash_grid_encode(jnp.array(x), jnp.array(table), spec))
        want = _hash_grid_oracle(x, table, spec)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)

    def test_large_resolution_hashed_levels(self):
        spec, table = self.make(num_levels=8, desired_resolution=512, log2_hashmap_size=10)
        assert any(l.n_dense_dims == -1 for l in spec.levels), "expect hashed levels"
        x = np.random.RandomState(1).rand(16, 3).astype(np.float32)
        got = np.asarray(hg.hash_grid_encode(jnp.array(x), jnp.array(table), spec))
        want = _hash_grid_oracle(x, table, spec)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)

    def test_out_of_bounds_zero(self):
        spec, table = self.make()
        x = jnp.array([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.2]], jnp.float32)
        out = hg.hash_grid_encode(x, jnp.array(table), spec)
        np.testing.assert_allclose(out, 0.0)

    def test_gradient_flows_to_table(self):
        spec, table = self.make()
        x = jnp.array(np.random.RandomState(2).rand(8, 3), jnp.float32)

        def loss(t):
            return jnp.sum(hg.hash_grid_encode(x, t, spec) ** 2)

        g = jax.grad(loss)(jnp.array(table))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_gradient_vs_finite_difference(self):
        spec, table = self.make(num_levels=2, desired_resolution=8)
        x = jnp.array([[0.3, 0.6, 0.1]], jnp.float32)

        def loss(t):
            return jnp.sum(hg.hash_grid_encode(x, t, spec))

        g = np.asarray(jax.grad(loss)(jnp.array(table)))
        rng = np.random.RandomState(3)
        for _ in range(5):
            i = rng.randint(table.shape[0])
            j = rng.randint(table.shape[1])
            eps = 1e-3
            tp = table.copy()
            tp[i, j] += eps
            tm = table.copy()
            tm[i, j] -= eps
            fd = (
                float(loss(jnp.array(tp))) - float(loss(jnp.array(tm)))
            ) / (2 * eps)
            np.testing.assert_allclose(g[i, j], fd, rtol=1e-2, atol=1e-4)

    def test_grid_input_gradient(self):
        """Encoding should be differentiable w.r.t. inputs (for dy_dx parity)."""
        spec, table = self.make()
        g = jax.grad(
            lambda x: jnp.sum(hg.hash_grid_encode(x, jnp.array(table), spec))
        )(jnp.array([[0.31, 0.62, 0.13]], jnp.float32))
        assert np.isfinite(np.asarray(g)).all()

    def test_chunked_encode_matches_unchunked(self):
        """hash_grid_encode_chunked (the flagship-scale remat path) must be a
        pure memory-layout change: identical features AND identical table
        gradients, including the ragged final chunk and prefix-shaped input."""
        spec, table = self.make()
        t = jnp.array(table)
        x = jnp.array(np.random.RandomState(4).rand(7, 41, 3), jnp.float32)

        out_full = hg.hash_grid_encode(x, t, spec)
        out_chunk = hg.hash_grid_encode_chunked(x, t, spec, chunk=64)  # 287 = 4*64+31
        np.testing.assert_array_equal(np.asarray(out_full), np.asarray(out_chunk))

        g_full = jax.grad(lambda t: jnp.sum(hg.hash_grid_encode(x, t, spec) ** 2))(t)
        g_chunk = jax.grad(
            lambda t: jnp.sum(hg.hash_grid_encode_chunked(x, t, spec, chunk=64) ** 2)
        )(t)
        np.testing.assert_allclose(
            np.asarray(g_full), np.asarray(g_chunk), rtol=1e-6, atol=1e-9
        )


class TestSamplePDF:
    def test_det_uniform_weights(self):
        bins = jnp.linspace(0.0, 1.0, 9)[None, :].repeat(2, 0)  # [2, 9]
        weights = jnp.ones((2, 8))
        s = sample_pdf(jax.random.PRNGKey(0), bins, weights, 16, det=True)
        s = np.asarray(s)
        assert s.shape == (2, 16)
        assert (np.diff(s, axis=1) >= -1e-6).all()
        assert s.min() >= 0.0 and s.max() <= 1.0
        # uniform weights + det -> near-evenly spaced
        np.testing.assert_allclose(np.diff(s[0]).std(), 0.0, atol=1e-2)

    def test_concentrates_on_heavy_bins(self):
        bins = jnp.linspace(0.0, 1.0, 11)[None, :]
        w = np.zeros((1, 10), np.float32)
        w[0, 7] = 1.0  # all mass in bin [0.7, 0.8]
        s = np.asarray(sample_pdf(jax.random.PRNGKey(1), bins, jnp.array(w), 64, det=True))
        frac_in = ((s >= 0.69) & (s <= 0.81)).mean()
        assert frac_in > 0.9

    def test_random_mode_in_range(self):
        bins = jnp.linspace(2.0, 5.0, 17)[None, :].repeat(4, 0)
        w = jnp.array(np.random.RandomState(0).rand(4, 16), jnp.float32)
        s = np.asarray(sample_pdf(jax.random.PRNGKey(2), bins, w, 32, det=False))
        assert s.min() >= 2.0 - 1e-5 and s.max() <= 5.0 + 1e-5


class TestCompositing:
    def test_matches_reference_formula(self):
        rng = np.random.RandomState(0)
        z = np.sort(rng.rand(4, 16).astype(np.float32), axis=1)
        sig = rng.rand(4, 16).astype(np.float32) * 5
        sd = np.full((4, 1), 0.1, np.float32)
        w = np.asarray(composite_weights(jnp.array(sig), jnp.array(z), jnp.array(sd)))
        # direct numpy reference (renderer.py:233-243)
        deltas = np.concatenate([np.diff(z, axis=1), np.broadcast_to(sd, (4, 1))], 1)
        alphas = 1 - np.exp(-deltas * sig)
        shifted = np.concatenate([np.ones((4, 1)), 1 - alphas + 1e-15], axis=1)
        want = alphas * np.cumprod(shifted, axis=1)[:, :-1]
        np.testing.assert_allclose(w, want, rtol=1e-5, atol=1e-7)

    def test_opaque_wall(self):
        """A huge density at one sample should absorb ~all weight there."""
        z = jnp.linspace(1.0, 2.0, 32)[None, :]
        sig = jnp.zeros((1, 32)).at[0, 10].set(1e4)
        w = np.asarray(composite_weights(sig, z, jnp.full((1, 1), 1 / 32)))
        assert w[0, 10] > 0.99
        assert w[0, 11:].sum() < 1e-3


class TestMergedCompositing:
    """merged_composite_weights == sort-merge + composite_weights, split back."""

    def _oracle(self, zA, sigA, zB, sigB, sd):
        z = np.concatenate([zA, zB], axis=1)
        sig = np.concatenate([sigA, sigB], axis=1)
        order = np.argsort(z, axis=1, kind="stable")  # ties: A before B
        zs = np.take_along_axis(z, order, axis=1)
        ss = np.take_along_axis(sig, order, axis=1)
        w_sorted = np.asarray(
            composite_weights(jnp.array(ss), jnp.array(zs), jnp.array(sd))
        )
        w = np.empty_like(w_sorted)
        np.put_along_axis(w, order, w_sorted, axis=1)
        return w[:, : zA.shape[1]], w[:, zA.shape[1] :]

    def test_matches_sorted_oracle(self):
        from lidarnerf_tpu.ops.compositing import merged_composite_weights

        rng = np.random.RandomState(1)
        zA = np.sort(rng.rand(8, 48).astype(np.float32) * 2, axis=1)
        zB = np.sort(rng.rand(8, 16).astype(np.float32) * 2, axis=1)
        sigA = (rng.rand(8, 48) * 20).astype(np.float32)
        sigB = (rng.rand(8, 16) * 20).astype(np.float32)
        sd = np.full((8, 1), 2.0 / 48, np.float32)
        wA, wB = merged_composite_weights(
            jnp.array(zA), jnp.array(sigA), jnp.array(zB), jnp.array(sigB), jnp.array(sd)
        )
        oA, oB = self._oracle(zA, sigA, zB, sigB, sd)
        np.testing.assert_allclose(np.asarray(wA), oA, rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(wB), oB, rtol=2e-4, atol=1e-6)

    def test_exact_ties_across_lists(self):
        """Duplicated depths across lists: tie order is A-before-B (stable)."""
        from lidarnerf_tpu.ops.compositing import merged_composite_weights

        zA = np.array([[0.2, 0.5, 0.5, 1.0]], np.float32)
        zB = np.array([[0.5, 1.0]], np.float32)
        sigA = np.array([[3.0, 8.0, 2.0, 5.0]], np.float32)
        sigB = np.array([[6.0, 1.0]], np.float32)
        sd = np.full((1, 1), 0.25, np.float32)
        wA, wB = merged_composite_weights(
            jnp.array(zA), jnp.array(sigA), jnp.array(zB), jnp.array(sigB), jnp.array(sd)
        )
        oA, oB = self._oracle(zA, sigA, zB, sigB, sd)
        np.testing.assert_allclose(np.asarray(wA), oA, rtol=2e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(wB), oB, rtol=2e-4, atol=1e-7)

    def test_grad_matches_oracle(self):
        """d w / d sigma agrees with autodiff through the sort-merge oracle."""
        from lidarnerf_tpu.ops.compositing import merged_composite_weights

        rng = np.random.RandomState(3)
        zA = np.sort(rng.rand(2, 12).astype(np.float32), axis=1)
        zB = np.sort(rng.rand(2, 4).astype(np.float32), axis=1)
        sigA = (rng.rand(2, 12) * 10).astype(np.float32)
        sigB = (rng.rand(2, 4) * 10).astype(np.float32)
        sd = np.full((2, 1), 1 / 12, np.float32)
        cotA = rng.rand(2, 12).astype(np.float32)
        cotB = rng.rand(2, 4).astype(np.float32)

        def f_merged(sA, sB):
            wA, wB = merged_composite_weights(
                jnp.array(zA), sA, jnp.array(zB), sB, jnp.array(sd)
            )
            return jnp.sum(wA * cotA) + jnp.sum(wB * cotB)

        def f_oracle(sA, sB):
            z = jnp.concatenate([jnp.array(zA), jnp.array(zB)], axis=1)
            sig = jnp.concatenate([sA, sB], axis=1)
            order = jnp.argsort(z, axis=1, stable=True)
            zs = jnp.take_along_axis(z, order, axis=1)
            ss = jnp.take_along_axis(sig, order, axis=1)
            w_sorted = composite_weights(ss, zs, jnp.array(sd))
            cot = jnp.take_along_axis(
                jnp.concatenate([cotA, cotB], axis=1), order, axis=1
            )
            return jnp.sum(w_sorted * cot)

        gA, gB = jax.grad(f_merged, argnums=(0, 1))(jnp.array(sigA), jnp.array(sigB))
        oA, oB = jax.grad(f_oracle, argnums=(0, 1))(jnp.array(sigA), jnp.array(sigB))
        np.testing.assert_allclose(np.asarray(gA), np.asarray(oA), rtol=3e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gB), np.asarray(oB), rtol=3e-4, atol=1e-6)

    def test_saturated_alpha_grads_finite(self):
        """Regression (round 4): alpha == 1.0 exactly (delta*sigma > ~17, any
        trained density) must NOT blow the backward up to inf. The old
        cumprod/log(1-a+1e-15) forms amplified cotangents by 1e15 at
        saturation; the logaddexp transmittance keeps d w / d sigma bounded.
        Both compositing entry points, up to trunc_exp's max density e^80."""
        from lidarnerf_tpu.ops.compositing import merged_composite_weights

        for sat in (1e3, 1e9, 5.5e34):
            z = jnp.linspace(0.1, 1.0, 24)[None, :].repeat(2, 0)
            sig = jnp.full((2, 24), 3.0).at[:, 7].set(sat)
            sd = jnp.full((2, 1), 1 / 24, jnp.float32)

            g = jax.grad(
                lambda s: jnp.sum(composite_weights(s, z, sd) * z)
            )(sig)
            assert np.isfinite(np.asarray(g)).all(), f"sat={sat}"

            zB = jnp.linspace(0.15, 0.9, 8)[None, :].repeat(2, 0)
            sigB = jnp.full((2, 8), 2.0).at[:, 3].set(sat)

            def f(sA, sB):
                wA, wB = merged_composite_weights(z, sA, zB, sB, sd)
                return jnp.sum(wA * z) + jnp.sum(wB * zB)

            gA, gB = jax.grad(f, argnums=(0, 1))(sig, sigB)
            assert np.isfinite(np.asarray(gA)).all(), f"sat={sat}"
            assert np.isfinite(np.asarray(gB)).all(), f"sat={sat}"


class TestChamfer:
    def test_vs_scipy_kdtree(self):
        from scipy.spatial import cKDTree

        rng = np.random.RandomState(0)
        a = rng.rand(500, 3).astype(np.float32)
        b = rng.rand(700, 3).astype(np.float32) + 0.1
        cd, f = chamfer_and_fscore(a, b, threshold=0.05)
        d_ab = cKDTree(b).query(a)[0] ** 2
        d_ba = cKDTree(a).query(b)[0] ** 2
        want_cd = d_ab.mean() + d_ba.mean()
        np.testing.assert_allclose(cd, want_cd, rtol=1e-4)
        p1 = (d_ab < 0.05).mean()
        p2 = (d_ba < 0.05).mean()
        want_f = 2 * p1 * p2 / (p1 + p2)
        np.testing.assert_allclose(f, want_f, rtol=1e-4)

    def test_identical_clouds(self):
        a = np.random.RandomState(1).rand(256, 3).astype(np.float32)
        cd, f = chamfer_and_fscore(a, a.copy())
        assert cd < 1e-9
        np.testing.assert_allclose(f, 1.0)


class TestLosses:
    def test_bce_matches_torch_formula(self):
        import torch

        p = np.random.RandomState(0).randn(64).astype(np.float32)
        g = (np.random.RandomState(1).rand(64) > 0.5).astype(np.float32)
        want = torch.nn.BCEWithLogitsLoss(reduction="none")(
            torch.tensor(p), torch.tensor(g)
        ).numpy()
        got = np.asarray(losses.bce_with_logits(jnp.array(p), jnp.array(g)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_huber_matches_torch(self):
        import torch

        p = np.random.RandomState(0).randn(64).astype(np.float32)
        g = np.random.RandomState(1).randn(64).astype(np.float32)
        want = torch.nn.HuberLoss(reduction="none", delta=0.3)(
            torch.tensor(p), torch.tensor(g)
        ).numpy()
        got = np.asarray(losses.huber(jnp.array(p), jnp.array(g), delta=0.3))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_cos_matches_torch(self):
        import torch

        p = np.random.RandomState(0).randn(4, 64).astype(np.float32)
        g = np.random.RandomState(1).randn(4, 64).astype(np.float32)
        want = torch.nn.CosineSimilarity()(torch.tensor(p), torch.tensor(g)).numpy()
        got = np.asarray(losses.cosine_similarity(jnp.array(p), jnp.array(g)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestNaNHardening:
    """Full-config KITTI training NaN'd around step 170 when a density logit
    crossed exp-overflow (88.7) and a duplicate sample depth produced
    delta * sigma = 0 * inf in compositing. trunc_exp's forward is clipped at
    80 (alpha already saturates at 1.0 long before), so the whole chain
    stays finite."""

    def test_trunc_exp_forward_finite_at_overflow(self):
        from lidarnerf_tpu.ops.activation import trunc_exp

        y = trunc_exp(jnp.array([100.0, 89.0, 80.0, 15.0, -100.0]))
        assert np.all(np.isfinite(np.asarray(y)))
        np.testing.assert_allclose(float(y[2]), np.exp(80.0), rtol=1e-6)
        # gradient law unchanged: clamp(-15, 15) on the saved input
        g = jax.grad(lambda x: trunc_exp(x))(100.0)
        np.testing.assert_allclose(float(g), np.exp(15.0), rtol=1e-6)

    def test_composite_finite_with_saturated_sigma_and_duplicate_z(self):
        from lidarnerf_tpu.ops.activation import trunc_exp
        from lidarnerf_tpu.ops.compositing import (
            composite_weights,
            merged_composite_weights,
        )

        sig = trunc_exp(jnp.full((2, 4), 200.0))  # saturated, finite
        zA = jnp.array([[0.1, 0.2, 0.2, 0.3]] * 2)  # duplicate depths
        sd = jnp.full((2, 1), 0.05)
        w = composite_weights(sig, zA, sd)
        assert np.all(np.isfinite(np.asarray(w)))

        zB = jnp.array([[0.15, 0.2, 0.25, 0.3]] * 2)  # ties across lists too
        wA, wB = merged_composite_weights(zA, sig, zB, sig, sd)
        assert np.all(np.isfinite(np.asarray(wA)))
        assert np.all(np.isfinite(np.asarray(wB)))
        # gradients through the merged path stay finite as well
        def loss(s):
            a, b = merged_composite_weights(zA, s, zB, s, sd)
            return jnp.sum(a) + jnp.sum(b)

        g = jax.grad(loss)(sig)
        assert np.all(np.isfinite(np.asarray(g)))
