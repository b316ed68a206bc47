"""Windowed (run-collapsing) block-hash kernels vs the XLA oracle.

The windowed kernels (ops/block_hash_pallas.py, "windowed" section) take one
static branch per fixed window of consecutive queries and collapse the
window's row work when a precomputed flag says all queries share a block
row. Interpret mode executes the exact kernel program on CPU, covering: the
packed multi-granularity flags, the uniform broadcast-store / tile-reduce
branches, the per-query fallback branch (shuffled stream), the plain-loop
pattern for incoherent fine levels, and the MXU pair-0 scatter.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lidarnerf_tpu.ops import block_hash as bh
from lidarnerf_tpu.ops import block_hash_pallas as bhp


# log2 17 -> blocks_per_level 2048: dense pair (216, 729 rows) exercises the
# MXU scatter; scales 15..4096 span every window class (8/4/2/1)
SPEC = bh.make_block_hash_spec(
    num_levels=8, base_resolution=16, log2_hashmap_size=17,
    desired_resolution=4096,
)


def coherent_x(n_rays=6, S=832):
    """Ray-ordered stream: consecutive queries are consecutive ray samples."""
    rng = np.random.RandomState(0)
    d = rng.randn(n_rays, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.full((n_rays, 3), 0.5, np.float32)
    t = np.linspace(0.01, 0.49, S, dtype=np.float32)
    x = o[:, None, :] + d[:, None, :] * t[None, :, None]
    return jnp.asarray(np.clip(x, 0.0, 1.0).reshape(-1, 3))


def _prep(x):
    rows, lf, Q = bhp.prep_inputs_padded(x, SPEC)
    flags = bhp.pack_win_flags(rows, SPEC.num_levels, lf.shape[-1])
    return rows, lf, flags, Q


class TestPackWinFlags:
    def test_bits(self):
        # stream: [5]*8 ++ [5,5,5,5,9,9,9,9] ++ [5,9,9,9,9,9,9,2] ++ 0s
        # flags are read at the END index of a window (qs + w - 1)
        rows = jnp.asarray(
            np.concatenate([
                np.array([5] * 8, np.int32),
                np.array([5, 5, 5, 5, 9, 9, 9, 9], np.int32),
                np.array([5, 9, 9, 9, 9, 9, 9, 2], np.int32),
                np.zeros(bhp.CHUNK - 24, np.int32),
            ])
        )
        f = np.asarray(bhp.pack_win_flags(rows, 1, bhp.CHUNK))
        # window 0 ([5]*8): uniform at every granularity
        assert f[7] & 1 and f[3] & 2 and f[7] & 2 and f[1] & 4
        # window 1 (5,5,5,5,9,9,9,9): u8 clear, both u4 halves + all u2 set
        assert not (f[15] & 1)
        assert f[11] & 2 and f[15] & 2
        assert f[9] & 4 and f[11] & 4 and f[13] & 4 and f[15] & 4
        # window 2 (5,9,9,9,9,9,9,2): the 6-run of 9s is not 4-aligned, so
        # both u4 halves clear; u2 quarters: (5,9) no, (9,9) yes, (9,9) yes,
        # (9,2) no
        assert not (f[23] & 1)
        assert not (f[19] & 2) and not (f[23] & 2)
        assert not (f[17] & 4)
        assert f[19] & 4 and f[21] & 4 and not (f[23] & 4)
        # chunk boundary: a run crossing the start of the stream can't claim
        # uniformity through position 0
        assert not (f[0] & 4)

    def test_window_classes_cover_all(self):
        ws = [bhp._win_of_level(lev.scale) for lev in SPEC.levels]
        assert set(ws) == {8, 4, 2, 1}


@pytest.mark.parametrize("stream", ["coherent", "shuffled"])
def test_fwd_win_matches_oracle(stream):
    x = coherent_x()
    if stream == "shuffled":
        x = x[np.random.RandomState(1).permutation(x.shape[0])]
    rows, lf, flags, Q = _prep(x)
    table = jnp.asarray(
        np.random.RandomState(2).randn(SPEC.table_rows, 128).astype(np.float32)
        * 1e-2
    )
    if stream == "coherent":
        # the stream must actually exercise the uniform-window branches
        assert int(jnp.sum(flags & 1)) > 0
    out = bhp._fwd_win_from_prep(rows, lf, flags, table, Q, SPEC,
                                 interpret=True)
    ref = bh._encode_xla(x, table, SPEC)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-7)


def test_fwd_win_bit_exact_vs_plain():
    x = coherent_x()
    rows, lf, flags, Q = _prep(x)
    table = jnp.asarray(
        np.random.RandomState(2).randn(SPEC.table_rows, 128).astype(np.float32)
    )
    win = bhp._fwd_win_from_prep(rows, lf, flags, table, Q, SPEC,
                                 interpret=True)
    plain = bhp._fwd_from_prep(rows, lf, table, Q, SPEC, interpret=True)
    assert (np.asarray(win) == np.asarray(plain)).all()


@pytest.mark.parametrize("stream", ["coherent", "shuffled"])
def test_bwd_win_matches_oracle(stream):
    x = coherent_x()
    if stream == "shuffled":
        x = x[np.random.RandomState(1).permutation(x.shape[0])]
    rows, lf, flags, Q = _prep(x)
    g = jnp.asarray(
        np.random.RandomState(3).rand(Q, SPEC.output_dim).astype(np.float32) - 0.5
    )
    grad = bhp._bwd_win_from_prep(rows, lf, flags, g, SPEC, interpret=True)

    table0 = jnp.zeros((SPEC.table_rows, 128), jnp.float32)
    ref = jax.grad(lambda t: jnp.sum(bh._encode_xla(x, t, SPEC) * g))(table0)
    # atol absorbs the split-bf16 lane-broadcast noise plus the window-sum
    # reassociation (tree reduce before the accumulate)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)
