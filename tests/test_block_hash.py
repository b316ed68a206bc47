"""Tests for the TPU-native block-hash encoder (XLA fallback path, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from lidarnerf_tpu.ops import block_hash as bh


def _oracle(x01, table, spec):
    """Independent numpy re-derivation of the block-hash semantics."""
    Q = x01.shape[0]
    out = np.zeros((Q, spec.output_dim), np.float32)
    for q in range(Q):
        if np.any(x01[q] < 0) or np.any(x01[q] > 1):
            continue
        for li, lvl in enumerate(spec.levels):
            pos = x01[q] * lvl.scale + 0.5
            cell = np.clip(np.floor(pos).astype(np.int64), 0, lvl.max_cell)
            frac = pos - np.floor(pos)
            block = cell // 3
            local = cell - 3 * block
            if lvl.dense:
                idx = (block[0] * lvl.blocks_axis + block[1]) * lvl.blocks_axis + block[2]
            else:
                idx = 0
                for d, p in enumerate((1, 2654435761, 805459861)):
                    idx ^= int((np.uint32(block[d]) * np.uint32(p)))
                idx %= 1 << 32
            idx = idx % spec.blocks_per_level + li * spec.blocks_per_level
            row = table[idx]  # [128]
            feat = np.zeros(2)
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        w = (
                            (frac[0] if dx else 1 - frac[0])
                            * (frac[1] if dy else 1 - frac[1])
                            * (frac[2] if dz else 1 - frac[2])
                        )
                        slot = (
                            (local[0] + dx) * 16 + (local[1] + dy) * 4 + (local[2] + dz)
                        )
                        feat += w * row[2 * slot : 2 * slot + 2]
            out[q, 2 * li : 2 * li + 2] = feat
    return out


def make(num_levels=6, desired=128, log2=13):
    spec = bh.make_block_hash_spec(
        num_levels=num_levels,
        base_resolution=4,
        log2_hashmap_size=log2,
        desired_resolution=desired,
    )
    table = np.asarray(bh.block_hash_init(jax.random.PRNGKey(0), spec))
    return spec, table


class TestBlockHash:
    def test_spec_levels(self):
        spec, _ = make()
        assert spec.levels[0].dense
        # finest levels should be hashed once blocks exceed the budget
        assert any(not l.dense for l in spec.levels)
        assert spec.blocks_per_level == 2**13 // 64

    def test_matches_oracle(self):
        spec, table = make()
        x = np.random.RandomState(0).rand(64, 3).astype(np.float32)
        got = np.asarray(
            bh.block_hash_encode(jnp.array(x), jnp.array(table), spec, False)
        )
        want = _oracle(x, table, spec)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)

    def test_out_of_bounds_zero(self):
        spec, table = make()
        x = jnp.array([[1.2, 0.5, 0.5], [-0.5, 0.5, 0.5]])
        out = bh.block_hash_encode(x, jnp.array(table), spec, False)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_continuity_within_block(self):
        """Field is trilinear-continuous inside a block interior."""
        spec, table = make(num_levels=1, desired=4)
        # level 0: scale = 3, cells 0..3; sample inside cell 1
        eps = 1e-4
        x1 = jnp.array([[0.40, 0.40, 0.40]])
        x2 = x1 + eps
        f1 = bh.block_hash_encode(x1, jnp.array(table), spec, False)
        f2 = bh.block_hash_encode(x2, jnp.array(table), spec, False)
        assert float(jnp.abs(f1 - f2).max()) < 1e-2

    def test_table_gradient_matches_fd(self):
        spec, table = make(num_levels=2, desired=16, log2=10)
        x = jnp.array(np.random.RandomState(1).rand(8, 3), jnp.float32)

        def loss(t):
            return jnp.sum(bh.block_hash_encode(x, t, spec, False) ** 2)

        g = np.asarray(jax.grad(loss)(jnp.array(table)))
        rng = np.random.RandomState(2)
        checked = 0
        while checked < 5:
            i = rng.randint(table.shape[0])
            j = rng.randint(128)
            if abs(g[i, j]) < 1e-12:
                continue
            eps = 1e-3
            tp, tm = table.copy(), table.copy()
            tp[i, j] += eps
            tm[i, j] -= eps
            fd = (float(loss(jnp.array(tp))) - float(loss(jnp.array(tm)))) / (2 * eps)
            np.testing.assert_allclose(g[i, j], fd, rtol=1e-2, atol=1e-5)
            checked += 1

    def test_gradient_zero_for_oob_queries(self):
        spec, table = make(num_levels=2, desired=16, log2=10)
        x = jnp.array([[2.0, 2.0, 2.0]])

        def loss(t):
            return jnp.sum(bh.block_hash_encode(x, t, spec, False))

        g = jax.grad(loss)(jnp.array(table))
        np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_network_integration(self):
        """NeRFNetwork with encoding='blockhash' trains a step."""
        from lidarnerf_tpu.models.network import NeRFNetwork

        module = NeRFNetwork(
            encoding="blockhash", desired_resolution=64, log2_hashmap_size=12,
            num_levels=4,
        )
        params = module.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.zeros((4, 3)))
        sigma, col = module.apply(
            params, jnp.zeros((4, 3)), jnp.ones((4, 3)) / np.sqrt(3)
        )
        assert sigma.shape == (4,)
        assert col.shape == (4, 2)

        def loss(p):
            s, c = module.apply(p, jnp.zeros((4, 3)), jnp.ones((4, 3)))
            return jnp.sum(s) + jnp.sum(c)

        g = jax.grad(loss)(params)
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0
