// Native host-side preprocessing for the eval data pipeline.
//
// The TPU program consumes normalized CHW float32 tensors; at >20x the
// reference's throughput the Python/numpy preprocessing (uint8 HWC ->
// normalized float CHW, plus tile extraction for conversion tooling)
// becomes the host bottleneck. These are memory-bound transforms, so an
// OpenMP C++ implementation saturates host bandwidth where numpy runs a
// single core. Built by rs_ov/native/build.py (g++ -O3 -fopenmp), bound via
// ctypes — no pybind11 dependency.

#include <cstdint>
#include <cstring>

extern "C" {

// dst[c][y][x] = (src[y][x][c] - mean[c]) * inv_std[c]
void normalize_hwc_to_chw(const uint8_t* src, float* dst,
                          int64_t h, int64_t w,
                          const float* mean, const float* inv_std) {
  const int64_t plane = h * w;
#pragma omp parallel for schedule(static)
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* row = src + y * w * 3;
    float* d0 = dst + 0 * plane + y * w;
    float* d1 = dst + 1 * plane + y * w;
    float* d2 = dst + 2 * plane + y * w;
    const float m0 = mean[0], m1 = mean[1], m2 = mean[2];
    const float s0 = inv_std[0], s1 = inv_std[1], s2 = inv_std[2];
    for (int64_t x = 0; x < w; ++x) {
      d0[x] = (static_cast<float>(row[3 * x + 0]) - m0) * s0;
      d1[x] = (static_cast<float>(row[3 * x + 1]) - m1) * s1;
      d2[x] = (static_cast<float>(row[3 * x + 2]) - m2) * s2;
    }
  }
}

// float32 variant (already-decoded float HWC images)
void normalize_hwc_to_chw_f32(const float* src, float* dst,
                              int64_t h, int64_t w,
                              const float* mean, const float* inv_std) {
  const int64_t plane = h * w;
#pragma omp parallel for schedule(static)
  for (int64_t y = 0; y < h; ++y) {
    const float* row = src + y * w * 3;
    float* d0 = dst + 0 * plane + y * w;
    float* d1 = dst + 1 * plane + y * w;
    float* d2 = dst + 2 * plane + y * w;
    const float m0 = mean[0], m1 = mean[1], m2 = mean[2];
    const float s0 = inv_std[0], s1 = inv_std[1], s2 = inv_std[2];
    for (int64_t x = 0; x < w; ++x) {
      d0[x] = (row[3 * x + 0] - m0) * s0;
      d1[x] = (row[3 * x + 1] - m1) * s1;
      d2[x] = (row[3 * x + 2] - m2) * s2;
    }
  }
}

// Extract T overlapping crops from a CHW image into [T, C, th, tw].
// coords: T x 4 int64 (y1, x1, y2, x2), all crops (y2-y1)==th, (x2-x1)==tw.
void extract_tiles_chw(const float* img, float* tiles,
                       int64_t c, int64_t h, int64_t w,
                       const int64_t* coords, int64_t t,
                       int64_t th, int64_t tw) {
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t ti = 0; ti < t; ++ti) {
    for (int64_t ci = 0; ci < c; ++ci) {
      const int64_t y1 = coords[ti * 4 + 0];
      const int64_t x1 = coords[ti * 4 + 1];
      const float* src_plane = img + ci * h * w;
      float* dst_plane = tiles + (ti * c + ci) * th * tw;
      for (int64_t y = 0; y < th; ++y) {
        std::memcpy(dst_plane + y * tw,
                    src_plane + (y1 + y) * w + x1,
                    sizeof(float) * tw);
      }
    }
  }
}

}  // extern "C"
