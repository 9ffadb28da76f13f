// Exact brute-force k-nearest-neighbor reference implementation.
//
// Plays the role the reference's DenseFusion/lib/knn/src/cpu/knn_cpu.cpp plays
// for its CUDA kernel: an independent, trivially-correct native implementation
// used as the golden oracle for the TPU (Pallas/XLA) nearest-neighbor ops.
// Built with `g++ -O3 -shared -fPIC` and loaded via ctypes (see
// autoposeestimation_tpu/ops/native.py). Plain C ABI, float32/int32 buffers.
//
// knn_search: for each of n query points (xyz, row-major) find the k nearest
// of m reference points; writes indices (n*k, int32, nearest-first) and
// squared distances (n*k, float32). O(n*m) distance + per-query partial sort.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

void knn_search(const float* query, int64_t n,
                const float* ref, int64_t m,
                int32_t k,
                const uint8_t* ref_valid,  // may be null = all valid
                int32_t* out_idx, float* out_dist2) {
  std::vector<std::pair<float, int32_t>> heap;
  for (int64_t i = 0; i < n; ++i) {
    const float qx = query[i * 3 + 0];
    const float qy = query[i * 3 + 1];
    const float qz = query[i * 3 + 2];
    heap.clear();
    heap.reserve(m);
    for (int64_t j = 0; j < m; ++j) {
      if (ref_valid && !ref_valid[j]) continue;
      const float dx = qx - ref[j * 3 + 0];
      const float dy = qy - ref[j * 3 + 1];
      const float dz = qz - ref[j * 3 + 2];
      heap.emplace_back(dx * dx + dy * dy + dz * dz,
                        static_cast<int32_t>(j));
    }
    const int32_t kk = std::min<int64_t>(k, heap.size());
    std::partial_sort(heap.begin(), heap.begin() + kk, heap.end());
    for (int32_t t = 0; t < k; ++t) {
      if (t < kk) {
        out_idx[i * k + t] = heap[t].second;
        out_dist2[i * k + t] = heap[t].first;
      } else {
        out_idx[i * k + t] = -1;
        out_dist2[i * k + t] = -1.0f;
      }
    }
  }
}

}  // extern "C"
