// cpu_nms — classic O(N^2) greedy NMS, C shared-library parity oracle.
//
// Role of the reference's Cython cpu_nms (lib/nms/cpu_nms.pyx:17-68): a
// host-side exact oracle for validating the on-device NMS kernels.  Exposed
// with a plain C ABI for ctypes (no pybind11 in this image).
//
// greedy_nms(dets[N*5] row-major x1 y1 x2 y2 score, N, thresh, shift,
//            keep_out[N]) -> number kept; keep_out holds kept indices in
// score order.  `shift` is the legacy +1 inclusive-pixel area convention.

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

int32_t greedy_nms(const float* dets, int32_t n, float thresh, float shift,
                   int32_t* keep_out) {
  std::vector<int32_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    return dets[a * 5 + 4] > dets[b * 5 + 4];
  });

  std::vector<char> suppressed(n, 0);
  int32_t n_keep = 0;
  for (int32_t oi = 0; oi < n; ++oi) {
    const int32_t i = order[oi];
    if (suppressed[i]) continue;
    keep_out[n_keep++] = i;
    const float ix1 = dets[i * 5 + 0], iy1 = dets[i * 5 + 1];
    const float ix2 = dets[i * 5 + 2], iy2 = dets[i * 5 + 3];
    const float iarea = (ix2 - ix1 + shift) * (iy2 - iy1 + shift);
    for (int32_t oj = oi + 1; oj < n; ++oj) {
      const int32_t j = order[oj];
      if (suppressed[j]) continue;
      const float xx1 = std::max(ix1, dets[j * 5 + 0]);
      const float yy1 = std::max(iy1, dets[j * 5 + 1]);
      const float xx2 = std::min(ix2, dets[j * 5 + 2]);
      const float yy2 = std::min(iy2, dets[j * 5 + 3]);
      const float w = std::max(0.0f, xx2 - xx1 + shift);
      const float h = std::max(0.0f, yy2 - yy1 + shift);
      const float inter = w * h;
      const float jarea = (dets[j * 5 + 2] - dets[j * 5 + 0] + shift) *
                          (dets[j * 5 + 3] - dets[j * 5 + 1] + shift);
      if (inter / (iarea + jarea - inter) > thresh) suppressed[j] = 1;
    }
  }
  return n_keep;
}

}  // extern "C"
