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


def _coherent_stream(spec, n_rays=64, s=128):
    """Ray-coherent query stream (segments exist), plus prep products."""
    from lidarnerf_tpu.ops import block_hash_pallas as bhp

    key = jax.random.PRNGKey(7)
    d = jax.random.normal(key, (n_rays, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = 0.01 + 0.79 * (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    x = jnp.clip((d[:, None, :] * t[None, :, None] + 1.0) / 2.0, 0.0, 1.0)
    x = x.reshape(-1, 3)
    Q = x.shape[0]
    rows, lf, _ = jax.jit(bhp.prep_inputs_padded, static_argnums=(1,))(x, spec)
    table = jax.random.normal(
        jax.random.PRNGKey(2), (spec.table_rows, 128), jnp.float32
    ) * 1e-2
    g = jax.random.normal(jax.random.PRNGKey(3), (Q, spec.output_dim), jnp.float32)
    return rows, lf, table, g, Q


def test_seg_kernels_match_plain_on_chip():
    """Gated segment-skipping family: bit-exact fwd, allclose bwd vs plain.

    The family is off by default (measured slower, TODO.md) but must not rot.
    """
    from lidarnerf_tpu.ops import block_hash_pallas as bhp

    spec = bh.make_block_hash_spec(
        num_levels=16, base_resolution=16, log2_hashmap_size=19,
        desired_resolution=32768,
    )
    rows, lf, table, g, Q = _coherent_stream(spec)
    Qp = lf.shape[-1]
    nxt, nseg = jax.jit(bhp.seg_next, static_argnums=(1, 2))(
        rows, spec.num_levels, Qp
    )

    ref = np.asarray(bhp._fwd_from_prep(rows, lf, table, Q, spec))
    out = np.asarray(bhp._fwd_seg_from_prep(rows, lf, nxt, nseg, table, Q, spec))
    np.testing.assert_array_equal(out, ref)

    bref = np.asarray(bhp._bwd_from_prep(rows, lf, g, spec))
    bout = np.asarray(bhp._bwd_seg_from_prep(rows, lf, nxt, nseg, g, spec))
    scale = np.abs(bref).max() + 1e-30
    np.testing.assert_allclose(bout / scale, bref / scale, atol=1e-5)


def test_win_kernels_match_plain_on_chip():
    """Gated windowed run-collapsing family: bit-exact fwd, allclose bwd."""
    import functools
    from lidarnerf_tpu.ops import block_hash_pallas as bhp

    spec = bh.make_block_hash_spec(
        num_levels=16, base_resolution=16, log2_hashmap_size=19,
        desired_resolution=32768,
    )
    rows, lf, table, g, Q = _coherent_stream(spec)
    Qp = lf.shape[-1]
    flags = jax.jit(
        functools.partial(bhp.pack_win_flags, L=spec.num_levels, Qp=Qp)
    )(rows)

    ref = np.asarray(bhp._fwd_from_prep(rows, lf, table, Q, spec))
    out = np.asarray(bhp._fwd_win_from_prep(rows, lf, flags, table, Q, spec))
    np.testing.assert_array_equal(out, ref)

    bref = np.asarray(bhp._bwd_from_prep(rows, lf, g, spec))
    bout = np.asarray(bhp._bwd_win_from_prep(rows, lf, flags, g, spec))
    scale = np.abs(bref).max() + 1e-30
    np.testing.assert_allclose(bout / scale, bref / scale, atol=1e-5)
