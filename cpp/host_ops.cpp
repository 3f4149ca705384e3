// Native host-side preprocessing kernels for buffer_tpu.
//
// TPU-native counterpart of the reference's cpp_wrappers/ (grid
// subsampling: cpp_subsampling/grid_subsampling/grid_subsampling.cpp;
// radius neighbors: cpp_neighbors/neighbors/neighbors.cpp).  The device
// (XLA) implementations are the hot path; these C++ kernels serve the
// host data pipeline (dataset preprocessing on a 1-core host) and provide
// an exact ragged-semantics oracle.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C cpp   ->  cpp/libbufferhost.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>
#include <algorithm>

extern "C" {

// Barycenter grid subsampling (reference semantics: voxel key from
// floor((p - floor(min/dl)*dl)/dl), output = per-voxel mean; iteration
// order here is first-seen order, callers shuffle afterwards anyway).
// Returns the number of voxels written (<= max_out).
int buffer_grid_subsample(const float* pts, int64_t n, float cell,
                          float* out, int64_t max_out) {
  if (n <= 0) return 0;
  float mn[3] = {pts[0], pts[1], pts[2]};
  float mx[3] = {pts[0], pts[1], pts[2]};
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      float v = pts[3 * i + d];
      mn[d] = std::min(mn[d], v);
      mx[d] = std::max(mx[d], v);
    }
  }
  float origin[3];
  for (int d = 0; d < 3; ++d) origin[d] = std::floor(mn[d] / cell) * cell;
  const int64_t nx = (int64_t)std::floor((mx[0] - origin[0]) / cell) + 1;
  const int64_t ny = (int64_t)std::floor((mx[1] - origin[1]) / cell) + 1;

  struct Acc { double s[3]; int64_t c; int64_t slot; };
  std::unordered_map<int64_t, Acc> grid;
  grid.reserve((size_t)std::min<int64_t>(n, max_out) * 2);

  int64_t next_slot = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + 3 * i;
    int64_t ix = (int64_t)std::floor((p[0] - origin[0]) / cell);
    int64_t iy = (int64_t)std::floor((p[1] - origin[1]) / cell);
    int64_t iz = (int64_t)std::floor((p[2] - origin[2]) / cell);
    int64_t key = ix + nx * iy + nx * ny * iz;
    auto it = grid.find(key);
    if (it == grid.end()) {
      if (next_slot >= max_out) continue;  // overflow: drop extra voxels
      it = grid.emplace(key, Acc{{0, 0, 0}, 0, next_slot++}).first;
    }
    for (int d = 0; d < 3; ++d) it->second.s[d] += p[d];
    it->second.c += 1;
  }
  for (auto& kv : grid) {
    float* o = out + 3 * kv.second.slot;
    for (int d = 0; d < 3; ++d)
      o[d] = (float)(kv.second.s[d] / (double)kv.second.c);
  }
  return (int)next_slot;
}

// Radius neighbor search via a uniform spatial hash grid (cell = radius).
// For each query, writes up to k neighbor indices sorted by ascending
// distance into idx[q*k..] and the count into counts[q]; unused slots get
// n_support (the reference's shadow index, neighbors.cpp:319-325).
void buffer_radius_neighbors(const float* queries, int64_t nq,
                             const float* support, int64_t ns,
                             float radius, int32_t k,
                             int32_t* idx, int32_t* counts) {
  const float cell = radius;
  const float r2 = radius * radius;
  // hash grid over support
  auto cell_of = [&](const float* p, int64_t& cx, int64_t& cy, int64_t& cz) {
    cx = (int64_t)std::floor(p[0] / cell);
    cy = (int64_t)std::floor(p[1] / cell);
    cz = (int64_t)std::floor(p[2] / cell);
  };
  // exact packed key (21 bits/axis, offset to stay positive) — collisions
  // between distinct cells would duplicate candidates and inflate counts
  auto hash3 = [](int64_t x, int64_t y, int64_t z) -> int64_t {
    const int64_t B = 1 << 20;
    return ((x + B) << 42) | ((y + B) << 21) | (z + B);
  };
  std::unordered_map<int64_t, std::vector<int32_t>> grid;
  grid.reserve((size_t)ns);
  for (int64_t i = 0; i < ns; ++i) {
    int64_t cx, cy, cz;
    cell_of(support + 3 * i, cx, cy, cz);
    grid[hash3(cx, cy, cz)].push_back((int32_t)i);
  }

  std::vector<std::pair<float, int32_t>> cand;
  for (int64_t q = 0; q < nq; ++q) {
    cand.clear();
    const float* Q = queries + 3 * q;
    int64_t cx, cy, cz;
    cell_of(Q, cx, cy, cz);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          auto it = grid.find(hash3(cx + dx, cy + dy, cz + dz));
          if (it == grid.end()) continue;
          for (int32_t j : it->second) {
            const float* S = support + 3 * j;
            float d0 = Q[0] - S[0], d1 = Q[1] - S[1], d2v = Q[2] - S[2];
            float d = d0 * d0 + d1 * d1 + d2v * d2v;
            if (d <= r2) cand.emplace_back(d, j);
          }
        }
    int32_t cnt = (int32_t)std::min<size_t>(cand.size(), (size_t)k);
    std::partial_sort(cand.begin(), cand.begin() + cnt, cand.end());
    counts[q] = cnt;
    for (int32_t s = 0; s < k; ++s)
      idx[q * k + s] = s < cnt ? cand[s].second : (int32_t)ns;
  }
}

// k-nearest neighbors via an expanding-shell search over a uniform hash
// grid (cell size chosen by the caller, ~ the expected kth-NN distance).
// Writes up to k indices sorted by ascending distance (shadow = ns when
// fewer than k support points exist) and the found count.
void buffer_knn(const float* queries, int64_t nq, const float* support,
                int64_t ns, float cell, int32_t k,
                int32_t* idx, int32_t* counts) {
  auto hash3 = [](int64_t x, int64_t y, int64_t z) -> int64_t {
    const int64_t B = 1 << 20;
    return ((x + B) << 42) | ((y + B) << 21) | (z + B);
  };
  std::unordered_map<int64_t, std::vector<int32_t>> grid;
  grid.reserve((size_t)ns);
  for (int64_t i = 0; i < ns; ++i) {
    const float* p = support + 3 * i;
    grid[hash3((int64_t)std::floor(p[0] / cell),
               (int64_t)std::floor(p[1] / cell),
               (int64_t)std::floor(p[2] / cell))].push_back((int32_t)i);
  }
  std::vector<std::pair<float, int32_t>> cand;
  for (int64_t q = 0; q < nq; ++q) {
    const float* Q = queries + 3 * q;
    int64_t cx = (int64_t)std::floor(Q[0] / cell);
    int64_t cy = (int64_t)std::floor(Q[1] / cell);
    int64_t cz = (int64_t)std::floor(Q[2] / cell);
    cand.clear();
    // expand shells until k found at shell R, then one more shell (a point
    // in shell R can be farther than one in shell R+1; the extra shell
    // covers every point within the current kth distance bound because
    // the shell-R guarantee distance is (R)*cell >= kth best).
    int32_t have_at = -1;
    for (int R = 0;; ++R) {
      for (int dx = -R; dx <= R; ++dx)
        for (int dy = -R; dy <= R; ++dy)
          for (int dz = -R; dz <= R; ++dz) {
            if (std::max(std::abs(dx), std::max(std::abs(dy), std::abs(dz)))
                != R)
              continue;  // shell only
            auto it = grid.find(hash3(cx + dx, cy + dy, cz + dz));
            if (it == grid.end()) continue;
            for (int32_t j : it->second) {
              const float* S = support + 3 * j;
              float d0 = Q[0] - S[0], d1 = Q[1] - S[1], d2v = Q[2] - S[2];
              cand.emplace_back(d0 * d0 + d1 * d1 + d2v * d2v, j);
            }
          }
      if (have_at >= 0 && R >= have_at + 1) break;
      if (have_at < 0 && (int64_t)cand.size() >= k) have_at = R;
      if ((int64_t)cand.size() >= ns) break;  // exhausted
      if (R > 2048) break;                    // degenerate safety
    }
    int32_t cnt = (int32_t)std::min<size_t>(cand.size(), (size_t)k);
    std::partial_sort(cand.begin(), cand.begin() + cnt, cand.end());
    counts[q] = cnt;
    for (int32_t s = 0; s < k; ++s)
      idx[q * k + s] = s < cnt ? cand[s].second : (int32_t)ns;
  }
}

// PCA surface normals from precomputed kNN tables (Open3D
// estimate_normals + orient_normals_towards_camera_location(origin)
// semantics: covariance centered on the neighborhood mean, smallest
// eigenvector, flipped toward the origin).  idx rows may contain the
// shadow index n (ignored via counts).
void buffer_normals(const float* pts, int64_t n, const int32_t* idx,
                    const int32_t* counts, int32_t k, float* normals) {
  for (int64_t q = 0; q < n; ++q) {
    int32_t c = counts[q];
    float nx = 0.f, ny = 0.f, nz = 1.f;  // degenerate fallback: +z
    if (c >= 3) {
      double m[3] = {0, 0, 0};
      for (int32_t s = 0; s < c; ++s) {
        const float* p = pts + 3 * idx[q * k + s];
        m[0] += p[0]; m[1] += p[1]; m[2] += p[2];
      }
      m[0] /= c; m[1] /= c; m[2] /= c;
      double a00 = 0, a01 = 0, a02 = 0, a11 = 0, a12 = 0, a22 = 0;
      for (int32_t s = 0; s < c; ++s) {
        const float* p = pts + 3 * idx[q * k + s];
        double x = p[0] - m[0], y = p[1] - m[1], z = p[2] - m[2];
        a00 += x * x; a01 += x * y; a02 += x * z;
        a11 += y * y; a12 += y * z; a22 += z * z;
      }
      // closed-form symmetric 3x3 smallest eigenpair (Cardano)
      double qq = (a00 + a11 + a22) / 3.0;
      double p1 = a01 * a01 + a02 * a02 + a12 * a12;
      double d0 = a00 - qq, d1 = a11 - qq, d2 = a22 - qq;
      double p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1;
      double pp = std::sqrt(std::max(p2 / 6.0, 1e-30));
      double b00 = d0 / pp, b01 = a01 / pp, b02 = a02 / pp;
      double b11 = d1 / pp, b12 = a12 / pp, b22 = d2 / pp;
      double detB = b00 * (b11 * b22 - b12 * b12)
                  - b01 * (b01 * b22 - b12 * b02)
                  + b02 * (b01 * b12 - b11 * b02);
      double r = std::min(1.0, std::max(-1.0, detB / 2.0));
      double phi = std::acos(r) / 3.0;
      double lam1 = qq + 2.0 * pp * std::cos(phi);
      double lam3 = qq + 2.0 * pp * std::cos(phi + 2.0 * M_PI / 3.0);
      // rows of (A - lam1 I)(A - lam2 I) span the lam3 eigenvector
      double lam2 = 3.0 * qq - lam1 - lam3;
      double A1[9] = {a00 - lam1, a01, a02, a01, a11 - lam1, a12,
                      a02, a12, a22 - lam1};
      double A2[9] = {a00 - lam2, a01, a02, a01, a11 - lam2, a12,
                      a02, a12, a22 - lam2};
      double best = -1.0;
      double v[3] = {0, 0, 1};
      for (int row = 0; row < 3; ++row) {
        double rv[3] = {0, 0, 0};
        for (int ccol = 0; ccol < 3; ++ccol)
          for (int t = 0; t < 3; ++t)
            rv[ccol] += A1[row * 3 + t] * A2[t * 3 + ccol];
        double nn = rv[0] * rv[0] + rv[1] * rv[1] + rv[2] * rv[2];
        if (nn > best) { best = nn; v[0] = rv[0]; v[1] = rv[1]; v[2] = rv[2]; }
      }
      double nn = std::sqrt(std::max(best, 1e-30));
      if (best > 1e-20) {
        nx = (float)(v[0] / nn); ny = (float)(v[1] / nn);
        nz = (float)(v[2] / nn);
      }
    }
    // orient toward the origin (camera location (0,0,0))
    const float* P = pts + 3 * q;
    if (nx * (-P[0]) + ny * (-P[1]) + nz * (-P[2]) < 0.f) {
      nx = -nx; ny = -ny; nz = -nz;
    }
    normals[3 * q + 0] = nx;
    normals[3 * q + 1] = ny;
    normals[3 * q + 2] = nz;
  }
}

// Farthest point sampling (reference: pointnet2 furthest_point_sample).
// Writes num_samples indices; starts from index 0.
void buffer_fps(const float* pts, int64_t n, int32_t num_samples,
                int32_t* out_idx) {
  if (n <= 0 || num_samples <= 0) return;
  std::vector<float> mind((size_t)n, 1e30f);
  int32_t cur = 0;
  out_idx[0] = 0;
  for (int32_t s = 1; s < num_samples; ++s) {
    const float* c = pts + 3 * cur;
    float best = -1.0f;
    int32_t besti = 0;
    for (int64_t i = 0; i < n; ++i) {
      const float* p = pts + 3 * i;
      float d0 = p[0] - c[0], d1 = p[1] - c[1], d2 = p[2] - c[2];
      float d = d0 * d0 + d1 * d1 + d2 * d2;
      if (d < mind[i]) mind[i] = d;
      if (mind[i] > best) { best = mind[i]; besti = (int32_t)i; }
    }
    out_idx[s] = besti;
    cur = besti;
  }
}

}  // extern "C"
