// Exact CPU reference implementations of the point-cloud ops.
//
// Golden oracles for the TPU ops in autoposeestimation_tpu/ops/pointcloud.py
// (voxel-grid downsampling with per-voxel means, radius outlier counting,
// mean-kNN distances for statistical outlier removal). Same role the
// reference's knn_cpu.cpp plays for its CUDA kernel: an independent,
// trivially-correct native implementation. Built with g++ -O3 -shared; plain
// C ABI loaded via ctypes (autoposeestimation_tpu/ops/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <map>
#include <tuple>
#include <vector>

extern "C" {

// Voxel-grid downsample: voxel id = floor((p - min) / voxel); output = mean
// of each voxel's points ordered by (i, j, k). Returns the voxel count;
// out_points must hold up to n rows.
int64_t voxel_downsample(const float* points, int64_t n, float voxel,
                         float* out_points) {
  if (n == 0) return 0;
  float lo[3] = {points[0], points[1], points[2]};
  for (int64_t i = 1; i < n; ++i)
    for (int d = 0; d < 3; ++d) lo[d] = std::min(lo[d], points[i * 3 + d]);

  std::map<std::tuple<int64_t, int64_t, int64_t>,
           std::pair<double[3], int64_t>> cells;
  for (int64_t i = 0; i < n; ++i) {
    std::tuple<int64_t, int64_t, int64_t> key(
        static_cast<int64_t>(std::floor((points[i * 3 + 0] - lo[0]) / voxel)),
        static_cast<int64_t>(std::floor((points[i * 3 + 1] - lo[1]) / voxel)),
        static_cast<int64_t>(std::floor((points[i * 3 + 2] - lo[2]) / voxel)));
    auto& cell = cells[key];
    for (int d = 0; d < 3; ++d) cell.first[d] += points[i * 3 + d];
    cell.second += 1;
  }
  int64_t k = 0;
  for (const auto& [key, cell] : cells) {
    for (int d = 0; d < 3; ++d)
      out_points[k * 3 + d] = static_cast<float>(cell.first[d] / cell.second);
    ++k;
  }
  return k;
}

// Number of neighbors (including self) within `radius` of each point.
void radius_neighbor_counts(const float* points, int64_t n, float radius,
                            int32_t* out_counts) {
  const float r2 = radius * radius;
  for (int64_t i = 0; i < n; ++i) {
    int32_t count = 0;
    for (int64_t j = 0; j < n; ++j) {
      const float dx = points[i * 3] - points[j * 3];
      const float dy = points[i * 3 + 1] - points[j * 3 + 1];
      const float dz = points[i * 3 + 2] - points[j * 3 + 2];
      if (dx * dx + dy * dy + dz * dz <= r2) ++count;
    }
    out_counts[i] = count;
  }
}

// Mean distance of each point to its k nearest neighbors (excluding self).
void mean_knn_dists(const float* points, int64_t n, int32_t k,
                    float* out_means) {
  std::vector<float> d2(n);
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < n; ++j) {
      const float dx = points[i * 3] - points[j * 3];
      const float dy = points[i * 3 + 1] - points[j * 3 + 1];
      const float dz = points[i * 3 + 2] - points[j * 3 + 2];
      d2[j] = dx * dx + dy * dy + dz * dz;
    }
    d2[i] = std::numeric_limits<float>::infinity();  // exclude self
    const int32_t kk = std::min<int64_t>(k, n - 1);
    std::partial_sort(d2.begin(), d2.begin() + kk, d2.end());
    double acc = 0.0;
    for (int32_t t = 0; t < kk; ++t) acc += std::sqrt(d2[t]);
    out_means[i] = static_cast<float>(acc / std::max(kk, 1));
    // restore is unnecessary: d2 rewritten next iteration
  }
}

}  // extern "C"
