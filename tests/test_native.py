"""Native C++ rangeview kernels vs the numpy reference implementations."""

import numpy as np
import pytest

from lidarnerf_tpu import native
from lidarnerf_tpu.dataset import convert

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for native extension"
)


def _scan(n=5000, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.uniform(2, 70, n)
    az = rng.uniform(-np.pi, np.pi, n)
    el = rng.uniform(-0.4, 0.03, n)
    return np.stack(
        [
            d * np.cos(el) * np.cos(az),
            d * np.cos(el) * np.sin(az),
            d * np.sin(el),
            rng.rand(n),
        ],
        axis=1,
    ).astype(np.float32)


class TestNativeRangeview:
    def test_lidar_to_pano_matches_numpy(self):
        pts = _scan()
        H, W, K = 66, 1030, (2.0, 26.9)
        pano_n, inten_n = native.lidar_to_pano_with_intensities(pts, H, W, K)
        pano_p, inten_p = convert.lidar_to_pano_with_intensities(pts, H, W, K)
        np.testing.assert_allclose(pano_n, pano_p, rtol=1e-6, atol=1e-9)
        same = pano_n == pano_p
        np.testing.assert_allclose(inten_n[same], inten_p[same], rtol=1e-6)

    def test_pano_to_lidar_matches_numpy(self):
        pts = _scan(seed=1)
        H, W, K = 32, 256, (15.0, 40.0)
        pano, inten = convert.lidar_to_pano_with_intensities(pts, H, W, K)
        got = native.pano_to_lidar_with_intensities(pano, inten, K)
        want = convert.pano_to_lidar_with_intensities(pano, inten, K)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_max_depth_filtering(self):
        pts = np.array([[100.0, 0, 0, 1.0], [10.0, 0, 0, 0.5]], np.float32)
        pano, _ = native.lidar_to_pano_with_intensities(pts, 16, 64, (10.0, 30.0))
        assert (pano == 100.0).sum() == 0
        assert (pano == 10.0).sum() == 1
