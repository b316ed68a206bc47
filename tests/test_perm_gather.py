"""MXU permutation-gather kernel vs take_along_axis oracle (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarnerf_tpu.ops.perm_gather_pallas import mxu_permutation_gather


def _random_case(rng, N, S, C, scale=1.0):
    vals = rng.randn(N, S, C).astype(np.float32) * scale
    order = np.stack([rng.permutation(S) for _ in range(N)]).astype(np.int32)
    inv = np.argsort(order, axis=1).astype(np.int32)
    return jnp.asarray(vals), jnp.asarray(order), jnp.asarray(inv)


@pytest.mark.parametrize("N,S,C", [(8, 32, 17), (5, 48, 3), (16, 832, 17)])
def test_forward_matches_gather(N, S, C):
    rng = np.random.RandomState(0)
    vals, order, inv = _random_case(rng, N, S, C)
    ref = jnp.take_along_axis(vals, order[..., None], axis=1)
    out = mxu_permutation_gather(vals, inv, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_large_dynamic_range_exact():
    """Bit-plane split must be exact across magnitudes."""
    rng = np.random.RandomState(1)
    vals, order, inv = _random_case(rng, 4, 64, 2)
    vals = vals * jnp.asarray([1e-6, 1e4])[None, None, :]
    ref = jnp.take_along_axis(vals, order[..., None], axis=1)
    out = mxu_permutation_gather(vals, inv, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_grad_is_inverse_gather():
    rng = np.random.RandomState(2)
    vals, order, inv = _random_case(rng, 6, 40, 5)
    cot = jnp.asarray(rng.randn(6, 40, 5).astype(np.float32))

    def f(v):
        return jnp.sum(mxu_permutation_gather(v, inv, True) * cot)

    g = jax.grad(f)(vals)
    # d/dvals of sum(gather(v) * cot) = scatter of cot = gather by inv perm
    ref = jnp.take_along_axis(cot, inv[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(ref))


def test_ray_block_padding():
    """N not divisible by RAY_BLOCK exercises the pad path."""
    rng = np.random.RandomState(3)
    vals, order, inv = _random_case(rng, 3, 24, 4)
    ref = jnp.take_along_axis(vals, order[..., None], axis=1)
    out = mxu_permutation_gather(vals, inv, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
