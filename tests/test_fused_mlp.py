"""Fused MLP kernel vs the plain-XLA reference chain."""

import numpy as np
import jax
import jax.numpy as jnp

from lidarnerf_tpu.ops.fused_mlp import fused_mlp, fused_mlp_inference, mlp_reference


def _weights(dims, seed=0):
    rng = np.random.RandomState(seed)
    return [
        jnp.asarray(rng.randn(a, b).astype(np.float32) / np.sqrt(a))
        for a, b in zip(dims[:-1], dims[1:])
    ]


class TestFusedMLP:
    def test_interpret_matches_reference(self):
        ws = _weights([32, 64, 64, 16])
        x = jnp.asarray(np.random.RandomState(1).randn(100, 32), jnp.float32)
        got = fused_mlp_inference(x, tuple(ws), "none", interpret=True)
        want = mlp_reference(x, ws, "none")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_sigmoid_head(self):
        ws = _weights([90, 64, 64, 2])
        x = jnp.asarray(np.random.RandomState(2).randn(64, 90), jnp.float32)
        got = fused_mlp_inference(x, tuple(ws), "sigmoid", interpret=True)
        want = mlp_reference(x, ws, "sigmoid")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)
        assert (np.asarray(got) >= 0).all() and (np.asarray(got) <= 1).all()

    def test_gradients_match_reference(self):
        ws = _weights([16, 32, 8])
        x = jnp.asarray(np.random.RandomState(3).randn(32, 16), jnp.float32)

        def loss_fused(ws_):
            return jnp.sum(fused_mlp(x, ws_, "none") ** 2)

        def loss_ref(ws_):
            return jnp.sum(mlp_reference(x, ws_, "none") ** 2)

        gf = jax.grad(loss_fused)(ws)
        gr = jax.grad(loss_ref)(ws)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
