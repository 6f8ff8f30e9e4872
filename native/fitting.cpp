// Native geometry kernels for the object-fitting / scene-assembly pipeline.
//
// Replaces the open3d / sklearn C++ paths the reference leans on for host
// post-processing (SURVEY.md §2.9): DBSCAN clustering
// (fit_best_obj.py:143,190), voxel-grid downsampling (fit_best_obj.py:129),
// and nearest-point queries used by the F1/consistency metrics.  Exposed via
// ctypes (lsdm_tpu/fitting/native.py).
//
// DBSCAN uses a spatial hash grid with cell size = eps so region queries
// touch at most 27 cells; BFS cluster expansion, labels: -1 noise, else
// cluster id (same contract as open3d cluster_dbscan / sklearn DBSCAN).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct CellKey {
  int64_t x, y, z;
  bool operator==(const CellKey& o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};

struct CellHash {
  size_t operator()(const CellKey& k) const {
    return (size_t)(k.x * 73856093LL ^ k.y * 19349663LL ^ k.z * 83492791LL);
  }
};

using Grid = std::unordered_map<CellKey, std::vector<int>, CellHash>;

Grid build_grid(const float* pts, long n, float cell) {
  Grid g;
  g.reserve((size_t)n);
  for (long i = 0; i < n; i++) {
    CellKey k{(int64_t)std::floor(pts[3 * i] / cell),
              (int64_t)std::floor(pts[3 * i + 1] / cell),
              (int64_t)std::floor(pts[3 * i + 2] / cell)};
    g[k].push_back((int)i);
  }
  return g;
}

void neighbors(const Grid& g, const float* pts, long i, float eps,
               float cell, std::vector<int>* out) {
  out->clear();
  float px = pts[3 * i], py = pts[3 * i + 1], pz = pts[3 * i + 2];
  float eps2 = eps * eps;
  int64_t cx = (int64_t)std::floor(px / cell);
  int64_t cy = (int64_t)std::floor(py / cell);
  int64_t cz = (int64_t)std::floor(pz / cell);
  for (int64_t dx = -1; dx <= 1; dx++)
    for (int64_t dy = -1; dy <= 1; dy++)
      for (int64_t dz = -1; dz <= 1; dz++) {
        auto it = g.find(CellKey{cx + dx, cy + dy, cz + dz});
        if (it == g.end()) continue;
        for (int j : it->second) {
          float ddx = pts[3 * j] - px, ddy = pts[3 * j + 1] - py,
                ddz = pts[3 * j + 2] - pz;
          if (ddx * ddx + ddy * ddy + ddz * ddz <= eps2) out->push_back(j);
        }
      }
}

}  // namespace

extern "C" {

// DBSCAN: labels[i] = cluster id >= 0, or -1 for noise. Returns #clusters.
long dbscan(const float* pts, long n, float eps, long min_pts,
            int* labels) {
  const float cell = eps;
  Grid g = build_grid(pts, n, cell);
  std::vector<int> nbr, nbr2;
  const int UNVISITED = -2;
  for (long i = 0; i < n; i++) labels[i] = UNVISITED;
  long cluster = 0;
  for (long i = 0; i < n; i++) {
    if (labels[i] != UNVISITED) continue;
    neighbors(g, pts, i, eps, cell, &nbr);
    if ((long)nbr.size() < min_pts) {
      labels[i] = -1;
      continue;
    }
    labels[i] = (int)cluster;
    std::queue<int> q;
    for (int j : nbr)
      if (j != i) q.push(j);
    while (!q.empty()) {
      int j = q.front();
      q.pop();
      if (labels[j] == -1) labels[j] = (int)cluster;  // noise -> border
      if (labels[j] != UNVISITED) continue;
      labels[j] = (int)cluster;
      neighbors(g, pts, j, eps, cell, &nbr2);
      if ((long)nbr2.size() >= min_pts)
        for (int k : nbr2) {
          if (labels[k] == UNVISITED || labels[k] == -1) q.push(k);
        }
    }
    cluster++;
  }
  return cluster;
}

// Voxel-grid downsample: average points per voxel. Returns #output points.
long voxel_downsample(const float* pts, long n, float voxel, float* out,
                      long max_out) {
  Grid g = build_grid(pts, n, voxel);
  long m = 0;
  for (const auto& kv : g) {
    if (m >= max_out) break;
    double sx = 0, sy = 0, sz = 0;
    for (int i : kv.second) {
      sx += pts[3 * i];
      sy += pts[3 * i + 1];
      sz += pts[3 * i + 2];
    }
    double c = (double)kv.second.size();
    out[3 * m] = (float)(sx / c);
    out[3 * m + 1] = (float)(sy / c);
    out[3 * m + 2] = (float)(sz / c);
    m++;
  }
  return m;
}

// For each query point, squared distance to the nearest reference point.
// Brute force with threads — used by host-side F1 / consistency checks on
// small clouds.
void nearest_sqdist(const float* query, long nq, const float* ref, long nr,
                    float* out, int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads > nq) n_threads = (int)(nq > 0 ? nq : 1);
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; t++) {
    threads.emplace_back([=]() {
      for (long i = t; i < nq; i += n_threads) {
        float best = 1e30f;
        float qx = query[3 * i], qy = query[3 * i + 1], qz = query[3 * i + 2];
        for (long j = 0; j < nr; j++) {
          float dx = ref[3 * j] - qx, dy = ref[3 * j + 1] - qy,
                dz = ref[3 * j + 2] - qz;
          float d = dx * dx + dy * dy + dz * dz;
          if (d < best) best = d;
        }
        out[i] = best;
      }
    });
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
