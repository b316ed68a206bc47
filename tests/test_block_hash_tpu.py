"""TPU-only: Pallas block-hash kernels vs the XLA fallback path.

Skipped on the CPU CI mesh (conftest forces cpu); run manually on TPU with
    JAX_PLATFORMS= python -m pytest tests/test_block_hash_tpu.py -q
(kernel-vs-fallback equality was also verified on v5e during development:
with the split-bf16 MXU lane reduction, fwd max rel ~5.6e-6 / bwd ~2.9e-6).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lidarnerf_tpu.ops import block_hash as bh

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas block-hash kernels need a TPU backend",
)


def test_pallas_matches_xla_fwd_and_bwd():
    spec = bh.make_block_hash_spec(
        num_levels=16, base_resolution=16, log2_hashmap_size=19,
        desired_resolution=32768,
    )
    table = bh.block_hash_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8192, 3))

    f_pal = jax.jit(lambda x, t: bh.block_hash_encode(x, t, spec, True))
    f_xla = jax.jit(lambda x, t: bh.block_hash_encode(x, t, spec, False))
    a = np.asarray(f_pal(x, table))
    b = np.asarray(f_xla(x, table))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)

    ga = jax.jit(jax.grad(lambda t: jnp.sum(f_pal(x, t) ** 2)))(table)
    gb = jax.jit(jax.grad(lambda t: jnp.sum(f_xla(x, t) ** 2)))(table)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-8)
