"""Segment-skipping block-hash kernels vs the XLA oracle (interpret mode).

The segmented kernels (ops/block_hash_pallas.py, "segmented" section) walk
runs of equal consecutive rows with dynamic-bound loops. Interpret mode
executes the exact kernel program on CPU, covering: the per-chunk dynamic
choice (coherent stream -> segmented path, shuffled stream -> plain
fallback), the MXU pair-0 scatter, and the forced-progress guard's
correctness on both stream kinds.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lidarnerf_tpu.ops import block_hash as bh
from lidarnerf_tpu.ops import block_hash_pallas as bhp


# log2 17 -> blocks_per_level 2048, so the dense pair (216, 729 rows) is
# MXU-eligible and the one-hot-scatter branch is exercised alongside the
# segmented and plain branches
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
    nxt, nseg = bhp.seg_next(rows, SPEC.num_levels, lf.shape[-1])
    return rows, lf, nxt, nseg, Q


class TestSegNext:
    def test_next_and_nseg(self):
        rows = jnp.asarray(
            np.tile(
                np.repeat(np.array([5, 5, 5, 9, 9, 2, 2, 2], np.int32),
                          bhp.CHUNK // 8),
                1,
            )
        )
        nxt, nseg = bhp.seg_next(rows, 1, bhp.CHUNK)
        nxt = np.asarray(nxt)[0]
        k = bhp.CHUNK // 8
        assert int(nseg[0]) == 3
        assert (nxt[: 3 * k] == 3 * k).all()
        assert (nxt[3 * k : 5 * k] == 5 * k).all()
        assert (nxt[5 * k :] == bhp.CHUNK).all()

    def test_chunk_boundary_resets(self):
        rows = jnp.zeros((2 * bhp.CHUNK,), jnp.int32)  # one giant run
        nxt, nseg = bhp.seg_next(rows, 1, 2 * bhp.CHUNK)
        assert nxt.shape == (2, bhp.CHUNK)
        assert (np.asarray(nseg) == 1).all()  # each chunk restarts its run
        assert (np.asarray(nxt) == bhp.CHUNK).all()


@pytest.mark.parametrize("stream", ["coherent", "shuffled"])
def test_fwd_seg_matches_oracle(stream):
    x = coherent_x()
    if stream == "shuffled":
        x = x[np.random.RandomState(1).permutation(x.shape[0])]
    rows, lf, nxt, nseg, Q = _prep(x)
    table = jnp.asarray(
        np.random.RandomState(2).randn(SPEC.table_rows, 128).astype(np.float32)
        * 1e-2
    )
    if stream == "coherent":
        # the stream must actually exercise the segmented path somewhere
        assert int(jnp.min(nseg)) <= bhp.CHUNK // bhp.NSEG_DIV
    out = bhp._fwd_seg_from_prep(rows, lf, nxt, nseg, table, Q, SPEC,
                                 interpret=True)
    ref = bh._encode_xla(x, table, SPEC)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-7)


@pytest.mark.parametrize("stream", ["coherent", "shuffled"])
def test_bwd_seg_matches_oracle(stream):
    x = coherent_x()
    if stream == "shuffled":
        x = x[np.random.RandomState(1).permutation(x.shape[0])]
    rows, lf, nxt, nseg, Q = _prep(x)
    g = jnp.asarray(
        np.random.RandomState(3).rand(Q, SPEC.output_dim).astype(np.float32) - 0.5
    )
    grad = bhp._bwd_seg_from_prep(rows, lf, nxt, nseg, g, SPEC, interpret=True)

    table0 = jnp.zeros((SPEC.table_rows, 128), jnp.float32)
    ref = jax.grad(lambda t: jnp.sum(bh._encode_xla(x, t, SPEC) * g))(table0)
    # atol absorbs the split-bf16 lane-broadcast noise (~1e-5 abs on O(1) rows)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)
