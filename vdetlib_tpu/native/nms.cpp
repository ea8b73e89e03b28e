// Native host-side greedy NMS — the rebuild's equivalent of the reference's
// vdetlib/utils/cython_nms.pyx (Fast R-CNN NMS, Cython->C). Used on the pure
// CPU path (config 1: per-frame NMS on precomputed det_protos) where no TPU
// is involved; the device path is the XLA/Pallas kernel in kernels/nms.py.
//
// Semantics contract (shared with tests/oracle/nms.py): visit boxes by
// (score desc, original index asc); suppress when IoU with any kept box is
// strictly greater than `thresh`; areas use `w = x2 - x1 + offset`.
//
// Build: make -C vdetlib_tpu/native  ->  libvdet_native.so (ctypes).

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// dets: n rows of (x1, y1, x2, y2, score), float32, C-contiguous.
// keep_out: caller-allocated buffer of n int32s; returns number kept.
// Kept indices are written in visit order (ranked by score).
int32_t vdet_nms(const float* dets, int32_t n, float thresh, float offset,
                 int32_t* keep_out) {
  if (n <= 0) return 0;
  std::vector<int32_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    return dets[a * 5 + 4] > dets[b * 5 + 4];
  });

  std::vector<double> area(n);
  for (int32_t i = 0; i < n; ++i) {
    const float* d = dets + i * 5;
    area[i] = (double)(d[2] - d[0] + offset) * (double)(d[3] - d[1] + offset);
  }

  std::vector<uint8_t> suppressed(n, 0);
  int32_t n_keep = 0;
  for (int32_t oi = 0; oi < n; ++oi) {
    const int32_t i = order[oi];
    if (suppressed[i]) continue;
    keep_out[n_keep++] = i;
    const float* di = dets + i * 5;
    for (int32_t oj = oi + 1; oj < n; ++oj) {
      const int32_t j = order[oj];
      if (suppressed[j]) continue;
      const float* dj = dets + j * 5;
      const double ix1 = std::max(di[0], dj[0]);
      const double iy1 = std::max(di[1], dj[1]);
      const double ix2 = std::min(di[2], dj[2]);
      const double iy2 = std::min(di[3], dj[3]);
      const double iw = std::max(ix2 - ix1 + offset, 0.0);
      const double ih = std::max(iy2 - iy1 + offset, 0.0);
      const double inter = iw * ih;
      const double uni = area[i] + area[j] - inter;
      const double iou = uni > 0.0 ? inter / uni : 0.0;
      if (iou > thresh) suppressed[j] = 1;
    }
  }
  return n_keep;
}

// Pairwise IoU matrix: out[na*nb], row-major over (a, b).
void vdet_iou_matrix(const float* boxes_a, int32_t na, const float* boxes_b,
                     int32_t nb, float offset, float* out) {
  for (int32_t i = 0; i < na; ++i) {
    const float* a = boxes_a + i * 4;
    const double area_a =
        (double)(a[2] - a[0] + offset) * (double)(a[3] - a[1] + offset);
    for (int32_t j = 0; j < nb; ++j) {
      const float* b = boxes_b + j * 4;
      const double ix1 = std::max(a[0], b[0]);
      const double iy1 = std::max(a[1], b[1]);
      const double ix2 = std::min(a[2], b[2]);
      const double iy2 = std::min(a[3], b[3]);
      const double iw = std::max(ix2 - ix1 + offset, 0.0);
      const double ih = std::max(iy2 - iy1 + offset, 0.0);
      const double inter = iw * ih;
      const double area_b =
          (double)(b[2] - b[0] + offset) * (double)(b[3] - b[1] + offset);
      const double uni = area_a + area_b - inter;
      out[i * nb + j] = uni > 0.0 ? (float)(inter / uni) : 0.0f;
    }
  }
}

}  // extern "C"
