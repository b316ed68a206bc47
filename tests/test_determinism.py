"""Determinism: the rebuild is bit-reproducible where the reference races.

The reference's hash-grid backward uses non-deterministic CUDA atomicAdd
(gridencoder.cu:343-360) — run-to-run gradients differ. XLA scatter-add and
the Pallas sharded accumulator are deterministic, so identical inputs must
produce bit-identical updates (SURVEY.md §5 race-detection row).
"""

import numpy as np
import jax
import jax.numpy as jnp

from lidarnerf_tpu.models.network import NeRFNetwork
from lidarnerf_tpu.models.renderer import RenderConfig, render_rays
from lidarnerf_tpu.ops import hash_grid as hg
from lidarnerf_tpu.ops import block_hash as bh


def test_hash_grid_gradient_bitwise_deterministic():
    spec = hg.make_hash_grid_spec(
        num_levels=4, base_resolution=4, log2_hashmap_size=8, desired_resolution=64
    )
    table = hg.hash_grid_init(jax.random.PRNGKey(0), spec)
    # duplicate indices on purpose: same point repeated -> racing adds in CUDA
    x = jnp.tile(jnp.array([[0.3, 0.5, 0.7]], jnp.float32), (1024, 1))
    g = jax.jit(jax.grad(lambda t: jnp.sum(hg.hash_grid_encode(x, t, spec) ** 2)))
    a = np.asarray(g(table))
    b = np.asarray(g(table))
    np.testing.assert_array_equal(a, b)


def test_block_hash_gradient_bitwise_deterministic():
    spec = bh.make_block_hash_spec(
        num_levels=4, base_resolution=4, log2_hashmap_size=10, desired_resolution=64
    )
    table = bh.block_hash_init(jax.random.PRNGKey(0), spec)
    x = jnp.tile(jnp.array([[0.3, 0.5, 0.7]], jnp.float32), (1024, 1))
    g = jax.jit(
        jax.grad(lambda t: jnp.sum(bh.block_hash_encode(x, t, spec, False) ** 2))
    )
    a = np.asarray(g(table))
    b = np.asarray(g(table))
    np.testing.assert_array_equal(a, b)


def test_render_bitwise_deterministic():
    module = NeRFNetwork(desired_resolution=64, log2_hashmap_size=10, num_levels=4)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.zeros((4, 3)))
    cfg = RenderConfig(num_steps=16, upsample_steps=4, min_near_lidar=0.05)
    d = np.random.RandomState(0).randn(64, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    args = (jnp.zeros((64, 3)), jnp.asarray(d, jnp.float32), jax.random.PRNGKey(7))
    r1 = render_rays(module, params, *args, cfg, True)
    r2 = render_rays(module, params, *args, cfg, True)
    for k in r1:
        np.testing.assert_array_equal(np.asarray(r1[k]), np.asarray(r2[k]))
