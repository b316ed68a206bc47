// Native range-view projection kernels (host-side data loading).
//
// C++ counterpart of lidarnerf_tpu/dataset/convert.py's hot loops — the
// role the reference fills with per-point Python loops (convert.py:99-160)
// and that production data pipelines need at sensor rate: raw LiDAR scans
// (~120k points) -> pano range images via scatter-min, and the inverse
// pano -> compacted point list. Built JIT by native/build.py (g++ -O3) and
// bound via ctypes; dataset/convert.py transparently falls back to the
// vectorized numpy implementation when the toolchain is unavailable.
//
// Projection convention (matches convert.py:140-146):
//   beta  = pi - atan2(y, x);  alpha = atan2(z, sqrt(x^2+y^2)) + fov_down
//   c = round(beta / (2 pi / W));  r = round(H - alpha / (fov / H))

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {
constexpr double kPi = 3.14159265358979323846;
}

extern "C" {

// points: [n, 4] (x, y, z, intensity) float32 -> pano/inten [H, W] float64
void lidar_to_pano_with_intensities(const float* points, int64_t n, int H,
                                    int W, double fov_up, double fov,
                                    double max_depth, double* pano,
                                    double* inten) {
  const double fov_down = fov - fov_up;
  const double col_scale = W / (2.0 * kPi);
  const double row_scale = H / (fov / 180.0 * kPi);
  std::memset(pano, 0, sizeof(double) * H * W);
  std::memset(inten, 0, sizeof(double) * H * W);
  for (int64_t i = 0; i < n; ++i) {
    const double x = points[i * 4 + 0];
    const double y = points[i * 4 + 1];
    const double z = points[i * 4 + 2];
    const double val = points[i * 4 + 3];
    const double dist = std::sqrt(x * x + y * y + z * z);
    if (dist >= max_depth) continue;
    const double beta = kPi - std::atan2(y, x);
    const double alpha =
        std::atan2(z, std::sqrt(x * x + y * y)) + fov_down / 180.0 * kPi;
    const int64_t c = std::llround(beta * col_scale);
    const int64_t r = std::llround(H - alpha * row_scale);
    if (r < 0 || r >= H || c < 0 || c >= W) continue;
    double& cell = pano[r * W + c];
    if (cell == 0.0 || cell > dist) {
      cell = dist;
      inten[r * W + c] = val;
    }
  }
}

// pano/inten: [H, W] float64 -> out [n_valid, 4]; returns n_valid.
// out must have room for H*W rows.
int64_t pano_to_lidar_with_intensities(const double* pano, const double* inten,
                                       int H, int W, double fov_up, double fov,
                                       float* out) {
  int64_t count = 0;
  for (int r = 0; r < H; ++r) {
    const double alpha = (fov_up - (double)r / H * fov) / 180.0 * kPi;
    const double ca = std::cos(alpha), sa = std::sin(alpha);
    for (int c = 0; c < W; ++c) {
      const double d = pano[r * W + c];
      if (d == 0.0) continue;
      // match numpy float32 direction math bit-for-bit (convert.py uses
      // float32 dirs): compute beta per-pixel in float32 like pano_dirs
      const float betaf =
          -((float)c - (float)W / 2.0f) / (float)W * 2.0f * (float)kPi;
      const float alphaf = (float)alpha;
      const float dx = std::cos(alphaf) * std::cos(betaf);
      const float dy = std::cos(alphaf) * std::sin(betaf);
      const float dz = std::sin(alphaf);
      (void)ca;
      (void)sa;
      out[count * 4 + 0] = dx * (float)d;
      out[count * 4 + 1] = dy * (float)d;
      out[count * 4 + 2] = dz * (float)d;
      out[count * 4 + 3] = (float)inten[r * W + c];
      ++count;
    }
  }
  return count;
}

// Batch .bin scan -> pano conversion (the offline preprocess inner loop):
// scans: concatenated float32 [total_pts, 4]; offsets: [n_scans + 1].
void scans_to_panos(const float* scans, const int64_t* offsets,
                    int64_t n_scans, int H, int W, double fov_up, double fov,
                    double max_depth, double* panos, double* intens) {
  for (int64_t s = 0; s < n_scans; ++s) {
    const int64_t a = offsets[s], b = offsets[s + 1];
    lidar_to_pano_with_intensities(scans + a * 4, b - a, H, W, fov_up, fov,
                                   max_depth, panos + s * H * W,
                                   intens + s * H * W);
  }
}

}  // extern "C"
