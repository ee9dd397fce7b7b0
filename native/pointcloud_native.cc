// Native point-cloud utilities.
//
// Replaces the reference's absent C++ PCL sampler binary
// (third_party/mesh_sampling/build/pcsample, referenced by
// prepare_data/data_prep_util.py:9) and provides the farthest-point sampling
// the reference prototyped via dgl (test.ipynb cell 4).  Exposed both as a
// shared library (ctypes, see dgcnn_tpu/native_ext.py) and as the `pcsample`
// CLI (OBJ mesh -> uniformly sampled PLY point cloud).
//
// Build: make -C native   (produces build/libpointcloud_native.so + pcsample)

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <unordered_map>
#include <vector>

extern "C" {

// Uniform area-weighted sampling of `n_samples` points on a triangle mesh.
// vertices: n_vertices x 3, faces: n_faces x 3 (int32 indices).
// out: n_samples x 3.  Returns 0 on success.
int sample_mesh(const float* vertices, int64_t n_vertices,
                const int32_t* faces, int64_t n_faces,
                int64_t n_samples, uint64_t seed, float* out) {
  if (n_faces <= 0 || n_samples <= 0) return 1;
  std::vector<double> cum_area(n_faces);
  double total = 0.0;
  for (int64_t f = 0; f < n_faces; ++f) {
    const float* a = vertices + 3 * faces[3 * f + 0];
    const float* b = vertices + 3 * faces[3 * f + 1];
    const float* c = vertices + 3 * faces[3 * f + 2];
    double ux = b[0] - a[0], uy = b[1] - a[1], uz = b[2] - a[2];
    double vx = c[0] - a[0], vy = c[1] - a[1], vz = c[2] - a[2];
    double cx = uy * vz - uz * vy;
    double cy = uz * vx - ux * vz;
    double cz = ux * vy - uy * vx;
    total += 0.5 * std::sqrt(cx * cx + cy * cy + cz * cz);
    cum_area[f] = total;
  }
  if (total <= 0.0) return 2;
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  for (int64_t s = 0; s < n_samples; ++s) {
    double r = uni(rng) * total;
    int64_t f = std::lower_bound(cum_area.begin(), cum_area.end(), r) -
                cum_area.begin();
    if (f >= n_faces) f = n_faces - 1;
    const float* a = vertices + 3 * faces[3 * f + 0];
    const float* b = vertices + 3 * faces[3 * f + 1];
    const float* c = vertices + 3 * faces[3 * f + 2];
    double u = uni(rng), v = uni(rng);
    if (u + v > 1.0) { u = 1.0 - u; v = 1.0 - v; }
    for (int d = 0; d < 3; ++d) {
      out[3 * s + d] = static_cast<float>(
          a[d] + u * (b[d] - a[d]) + v * (c[d] - a[d]));
    }
  }
  return 0;
}

// Voxel-grid downsample: keep the centroid of each `leaf`-sized voxel.
// Returns the number of output points written to `out` (capacity n_points).
int64_t voxel_downsample(const float* points, int64_t n_points, float leaf,
                         float* out) {
  if (leaf <= 0.f) {
    std::memcpy(out, points, sizeof(float) * 3 * n_points);
    return n_points;
  }
  struct Acc { double x = 0, y = 0, z = 0; int64_t n = 0; };
  std::unordered_map<uint64_t, Acc> cells;
  cells.reserve(static_cast<size_t>(n_points));
  float mn[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
  for (int64_t i = 0; i < n_points; ++i)
    for (int d = 0; d < 3; ++d) mn[d] = std::min(mn[d], points[3 * i + d]);
  for (int64_t i = 0; i < n_points; ++i) {
    uint64_t key = 0;
    for (int d = 0; d < 3; ++d) {
      uint64_t c = static_cast<uint64_t>(
          (points[3 * i + d] - mn[d]) / leaf);
      key = key * 73856093ULL + c * 19349663ULL + d;
    }
    Acc& a = cells[key];
    a.x += points[3 * i + 0];
    a.y += points[3 * i + 1];
    a.z += points[3 * i + 2];
    a.n += 1;
  }
  int64_t m = 0;
  for (const auto& kv : cells) {
    const Acc& a = kv.second;
    out[3 * m + 0] = static_cast<float>(a.x / a.n);
    out[3 * m + 1] = static_cast<float>(a.y / a.n);
    out[3 * m + 2] = static_cast<float>(a.z / a.n);
    ++m;
  }
  return m;
}

// Farthest-point sampling: pick m indices maximizing pairwise coverage.
// points: n x 3; out_idx: m int32 indices.  O(n*m), cache-friendly.
int farthest_point_sample(const float* points, int64_t n, int64_t m,
                          int32_t start, int32_t* out_idx) {
  if (m <= 0 || n <= 0 || m > n) return 1;
  std::vector<float> dist(n, FLT_MAX);
  int64_t cur = start % n;
  for (int64_t s = 0; s < m; ++s) {
    out_idx[s] = static_cast<int32_t>(cur);
    const float* p = points + 3 * cur;
    float best = -1.f;
    int64_t best_i = 0;
    for (int64_t i = 0; i < n; ++i) {
      float dx = points[3 * i] - p[0];
      float dy = points[3 * i + 1] - p[1];
      float dz = points[3 * i + 2] - p[2];
      float d = dx * dx + dy * dy + dz * dz;
      if (d < dist[i]) dist[i] = d;
      if (dist[i] > best) { best = dist[i]; best_i = i; }
    }
    cur = best_i;
  }
  return 0;
}

// Exact k-nearest-neighbour indices on host (reference semantics: negative
// squared distance, self first; ties by lower index).  For ETL-time use and
// as an oracle for device kernels.  points: n x c; out: n x k.
int knn_host(const float* points, int64_t n, int64_t c, int64_t k,
             int32_t* out) {
  if (k > n) return 1;
  std::vector<std::pair<float, int32_t>> d(n);
  for (int64_t i = 0; i < n; ++i) {
    const float* pi = points + c * i;
    for (int64_t j = 0; j < n; ++j) {
      const float* pj = points + c * j;
      float acc = 0.f;
      for (int64_t t = 0; t < c; ++t) {
        float diff = pi[t] - pj[t];
        acc += diff * diff;
      }
      d[j] = {acc, static_cast<int32_t>(j)};
    }
    std::partial_sort(d.begin(), d.begin() + k, d.end());
    for (int64_t s = 0; s < k; ++s) out[i * k + s] = d[s].second;
  }
  return 0;
}

}  // extern "C"
