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


class TestSeamTie:
    """tie_dense_seams: differentiable boundary-corner sharing (round 5)."""

    def test_copies_equal_after_tie(self):
        """Every duplicated dense-level corner's copies become their mean."""
        spec, table = make()
        tied = np.asarray(bh.tie_dense_seams(jnp.asarray(table), spec))
        rng = np.random.RandomState(0)
        checked = 0
        for li, lvl in enumerate(spec.levels):
            if not lvl.dense or lvl.blocks_axis < 2:
                continue
            max_corner = lvl.max_cell + 1
            n_seams = min(max_corner // 3, lvl.blocks_axis - 1)
            if n_seams < 1:
                continue
            for _ in range(50):
                axis = rng.randint(3)
                g = rng.randint(0, max_corner + 1, size=3)
                g[axis] = rng.randint(1, n_seams + 1) * 3
                blk_hi = np.clip(g // 3, 0, lvl.blocks_axis - 1)
                blk_lo = blk_hi.copy()
                blk_lo[axis] -= 1
                ra, la = bh._corner_row_lane(
                    jnp.asarray(g[None]), jnp.asarray(blk_hi[None]), lvl, li, spec
                )
                rb, lb = bh._corner_row_lane(
                    jnp.asarray(g[None]), jnp.asarray(blk_lo[None]), lvl, li, spec
                )
                ra, la, rb, lb = int(ra[0]), int(la[0]), int(rb[0]), int(lb[0])
                for ch in range(2):
                    assert tied[ra, la + ch] == tied[rb, lb + ch]
                checked += 1
        assert checked > 0

    def test_mean_preserved_for_pair(self):
        """A 2-copy face corner's tied value is the mean of the originals."""
        spec, table = make()
        lvl_i, lvl = next(
            (i, l) for i, l in enumerate(spec.levels)
            if l.dense and l.blocks_axis >= 2
        )
        g = np.array([3, 1, 1])  # face corner between blocks 0 and 1 along x
        blk_hi = g // 3
        blk_lo = blk_hi.copy()
        blk_lo[0] -= 1
        ra, la = bh._corner_row_lane(
            jnp.asarray(g[None]), jnp.asarray(blk_hi[None]), lvl, lvl_i, spec
        )
        rb, lb = bh._corner_row_lane(
            jnp.asarray(g[None]), jnp.asarray(blk_lo[None]), lvl, lvl_i, spec
        )
        tied = np.asarray(bh.tie_dense_seams(jnp.asarray(table), spec))
        ra, la, rb, lb = int(ra[0]), int(la[0]), int(rb[0]), int(lb[0])
        want = 0.5 * (table[ra, la] + table[rb, lb])
        np.testing.assert_allclose(tied[ra, la], want, rtol=1e-6)
        np.testing.assert_allclose(tied[rb, lb], want, rtol=1e-6)

    def test_field_continuous_across_dense_seam(self):
        """Encoded features are continuous across a dense-level block seam
        after tying, and generically NOT continuous before (raw layout)."""
        spec, table = make(num_levels=2, desired=8, log2=13)  # both levels dense
        lvl = spec.levels[-1]
        assert lvl.dense
        # seam plane at cell coordinate 3 of the finest level: x* solves
        # x * scale + 0.5 == 3
        xs = (3.0 - 0.5) / lvl.scale
        eps = 1e-6
        lo = jnp.asarray([[xs - eps, 0.31, 0.47]], jnp.float32)
        hi = jnp.asarray([[xs + eps, 0.31, 0.47]], jnp.float32)
        raw = jnp.asarray(table)
        f_lo = np.asarray(bh.block_hash_encode(lo, raw, spec, use_pallas=False))
        f_hi = np.asarray(bh.block_hash_encode(hi, raw, spec, use_pallas=False))
        gap_raw = np.abs(f_lo - f_hi).max()
        tied = bh.tie_dense_seams(raw, spec)
        t_lo = np.asarray(bh.block_hash_encode(lo, tied, spec, use_pallas=False))
        t_hi = np.asarray(bh.block_hash_encode(hi, tied, spec, use_pallas=False))
        gap_tied = np.abs(t_lo - t_hi).max()
        assert gap_raw > 1e-6  # the raw layout is measurably discontinuous
        assert gap_tied < 1e-6  # tying closes the seam

    def test_gradient_symmetric(self):
        """Both copies of a shared corner receive equal gradient."""
        spec, table = make()
        lvl_i, lvl = next(
            (i, l) for i, l in enumerate(spec.levels)
            if l.dense and l.blocks_axis >= 2
        )
        g = np.array([3, 1, 1])
        blk_hi = g // 3
        blk_lo = blk_hi.copy()
        blk_lo[0] -= 1
        ra, la = bh._corner_row_lane(
            jnp.asarray(g[None]), jnp.asarray(blk_hi[None]), lvl, lvl_i, spec
        )
        rb, lb = bh._corner_row_lane(
            jnp.asarray(g[None]), jnp.asarray(blk_lo[None]), lvl, lvl_i, spec
        )
        ra, la, rb, lb = int(ra[0]), int(la[0]), int(rb[0]), int(lb[0])

        def loss(t):
            tied = bh.tie_dense_seams(t, spec)
            return tied[ra, la] * 2.0  # pull only on copy A's tied value

        grad = np.asarray(jax.grad(loss)(jnp.asarray(table)))
        assert grad[ra, la] == grad[rb, lb] == 1.0  # 2.0 split across copies

    def test_idempotent(self):
        spec, table = make()
        once = bh.tie_dense_seams(jnp.asarray(table), spec)
        twice = bh.tie_dense_seams(once, spec)
        np.testing.assert_allclose(np.asarray(once), np.asarray(twice), atol=1e-7)


class TestSyncHashedSeams:
    def test_sampled_copies_converge(self):
        """After the projection, freshly sampled hashed boundary corners have
        (mostly) equal copies — sampling with the same corner distribution."""
        spec, table = make(num_levels=6, desired=512, log2=10)
        hashed = [l for l in spec.levels if not l.dense]
        assert hashed, "fixture must include hashed levels"
        t1 = bh.sync_hashed_seams(
            jnp.asarray(table), spec, jax.random.PRNGKey(1), n_per_axis=2048
        )
        # measure discrepancy with the seam loss (same duplicated-corner law)
        before = float(bh.block_hash_seam_loss(jnp.asarray(table), spec,
                                               jax.random.PRNGKey(2)))
        after = float(bh.block_hash_seam_loss(t1, spec, jax.random.PRNGKey(2)))
        assert after < before

    def test_preserves_shape_and_finite(self):
        spec, table = make()
        out = bh.sync_hashed_seams(
            jnp.asarray(table), spec, jax.random.PRNGKey(0), n_per_axis=64
        )
        assert out.shape == table.shape
        assert np.isfinite(np.asarray(out)).all()


class TestSeamLoss:
    """block_hash_seam_loss ties the independently-stored copies of
    block-boundary corners (the layout tradeoff documented in the module
    docstring; VERDICT r1 #4 follow-up)."""

    def _consistent_table(self, spec):
        """Table where every stored corner holds f(global corner coord) —
        duplicated boundary corners agree by construction (dense levels)."""
        tab = np.zeros((spec.table_rows, bh.ROW_WIDTH), np.float32)
        for li, level in enumerate(spec.levels):
            assert level.dense, "test spec must be all-dense"
            nb = level.blocks_axis
            for bx in range(nb):
                for by in range(nb):
                    for bz in range(nb):
                        row = (bx * nb + by) * nb + bz + li * spec.blocks_per_level
                        for lx in range(4):
                            for ly in range(4):
                                for lz in range(4):
                                    g = np.array([3 * bx + lx, 3 * by + ly, 3 * bz + lz])
                                    v = np.sin(0.7 * g[0] + 1.3 * g[1] + 2.1 * g[2] + li)
                                    lane0 = ((lx * 4 + ly) * 4 + lz) * 2
                                    tab[row, lane0] = v
                                    tab[row, lane0 + 1] = -v
        return jnp.asarray(tab)

    def test_zero_for_consistent_table(self):
        spec, _ = make(num_levels=2, desired=32, log2=17)
        table = self._consistent_table(spec)
        loss = bh.block_hash_seam_loss(table, spec, jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-12)

    def test_positive_for_random_table(self):
        spec, _ = make(num_levels=2, desired=32, log2=17)
        table = jax.random.normal(jax.random.PRNGKey(1), (spec.table_rows, 128))
        loss = bh.block_hash_seam_loss(table, spec, jax.random.PRNGKey(0))
        assert float(loss) > 0.01

    def test_grad_reduces_discrepancy(self):
        """A few gradient steps on the loss alone shrink seam discrepancies."""
        spec, _ = make(num_levels=2, desired=32, log2=17)
        table = jax.random.normal(jax.random.PRNGKey(1), (spec.table_rows, 128))
        g_fn = jax.jit(jax.grad(
            lambda t, k: bh.block_hash_seam_loss(t, spec, k)
        ))
        l0 = float(bh.block_hash_seam_loss(table, spec, jax.random.PRNGKey(9)))
        # the loss is a MEAN over 512 sampled pairs x 6 (level, axis) terms
        # and coarse levels resample the same few pairs many times per batch,
        # so large raw-SGD steps diverge; this is a direction check (real
        # training uses Adam), not a rate check
        for i in range(20):
            table = table - 2.0 * g_fn(table, jax.random.PRNGKey(i))
        l1 = float(bh.block_hash_seam_loss(table, spec, jax.random.PRNGKey(9)))
        assert l1 < 0.7 * l0, (l0, l1)

    def test_train_step_integration(self):
        """alpha_seam wires through TrainConfig into the jitted step."""
        from lidarnerf_tpu.models.network import NeRFNetwork
        from lidarnerf_tpu.models.renderer import RenderConfig
        from lidarnerf_tpu.nerf.train_step import (
            TrainConfig, make_optimizer, make_train_step,
        )

        module = NeRFNetwork(
            encoding="blockhash", desired_resolution=64, log2_hashmap_size=12,
            num_levels=4,
        )
        tcfg = TrainConfig(
            num_rays_lidar=64, H_lidar=8, W_lidar=16, iters=10, alpha_seam=0.1
        )
        rcfg = RenderConfig(num_steps=16, upsample_steps=4, min_near_lidar=0.05)
        params = module.init(
            jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.zeros((4, 3))
        )
        opt_state = make_optimizer(tcfg).init(params)
        step = make_train_step(module, tcfg, rcfg, patch_size=1)
        poses = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
        images = jnp.ones((1, 8, 16, 3)) * 0.5
        vi = jnp.zeros((1, 1), jnp.int32)
        vc = jnp.full((1,), 8 * 16, jnp.int32)
        params, opt_state, m = step(
            params, opt_state, poses, images, vi, vc, 0, jax.random.PRNGKey(1), 0
        )
        assert np.isfinite(float(m["loss"]))
