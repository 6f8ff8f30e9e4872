// Signed-distance-field generation from a surface point set.
//
// Replaces the reference's mesh_to_sdf dependency (utils.py:242-275, used
// to build the 256^3 human SDF for penetration losses).  Pipeline, all
// native:
//   1. rasterize surface samples into a dim^3 occupancy grid;
//   2. exact squared Euclidean distance transform (Felzenszwalb-Huttenlocher
//      lower-envelope method, separable: 3 passes) -> |d| in voxels;
//   3. BFS flood fill from the grid boundary across non-surface voxels ->
//      outside mask; unreached voxels are inside -> negative sign.
//
// O(dim^3) total; a 256^3 grid takes ~1s single-threaded vs minutes for
// ray-based mesh_to_sdf.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

// 1-D squared distance transform (Felzenszwalb & Huttenlocher 2004).
void dt1d(const float* f, float* d, int n, int* v, float* z) {
  int k = 0;
  v[0] = 0;
  z[0] = -1e20f;
  z[1] = 1e20f;
  for (int q = 1; q < n; q++) {
    float s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k]);
    while (s <= z[k]) {
      k--;
      s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k]);
    }
    k++;
    v[k] = q;
    z[k] = s;
    z[k + 1] = 1e20f;
  }
  k = 0;
  for (int q = 0; q < n; q++) {
    while (z[k + 1] < q) k++;
    d[q] = (q - v[k]) * (q - v[k]) + f[v[k]];
  }
}

}  // namespace

extern "C" {

// points: (n, 3) world coords; grid params: min corner + voxel size.
// out_sdf: dim^3 floats (world units), negative inside.
void generate_sdf(const float* points, long n, long dim, const float* grid_min,
                  float voxel, float* out_sdf) {
  const long WALL_R = 2;  // flood-fill wall dilation radius (voxels)
  const long D = dim;
  const long D3 = D * D * D;
  std::vector<float> dist(D3, 1e20f);
  std::vector<uint8_t> occupied(D3, 0);

  auto idx = [D](long x, long y, long z) { return (x * D + y) * D + z; };

  // 1. rasterize; the flood-fill wall is the occupancy dilated by one voxel
  // so sub-voxel sampling holes in the surface do not leak the outside in.
  std::vector<uint8_t> wall(D3, 0);
  for (long i = 0; i < n; i++) {
    long x = (long)std::floor((points[3 * i] - grid_min[0]) / voxel);
    long y = (long)std::floor((points[3 * i + 1] - grid_min[1]) / voxel);
    long z = (long)std::floor((points[3 * i + 2] - grid_min[2]) / voxel);
    if (x < 0 || y < 0 || z < 0 || x >= D || y >= D || z >= D) continue;
    dist[idx(x, y, z)] = 0.0f;
    occupied[idx(x, y, z)] = 1;
    for (long ddx = -WALL_R; ddx <= WALL_R; ddx++)
      for (long ddy = -WALL_R; ddy <= WALL_R; ddy++)
        for (long ddz = -WALL_R; ddz <= WALL_R; ddz++) {
          long nx = x + ddx, ny = y + ddy, nz = z + ddz;
          if (nx < 0 || ny < 0 || nz < 0 || nx >= D || ny >= D || nz >= D)
            continue;
          wall[idx(nx, ny, nz)] = 1;
        }
  }

  // 2. separable EDT over each axis
  std::vector<float> f(D), dcol(D);
  std::vector<int> v(D);
  std::vector<float> z(D + 1);
  // along z (contiguous)
  for (long x = 0; x < D; x++)
    for (long y = 0; y < D; y++) {
      float* col = &dist[idx(x, y, 0)];
      dt1d(col, dcol.data(), (int)D, v.data(), z.data());
      memcpy(col, dcol.data(), D * sizeof(float));
    }
  // along y
  for (long x = 0; x < D; x++)
    for (long zz = 0; zz < D; zz++) {
      for (long y = 0; y < D; y++) f[y] = dist[idx(x, y, zz)];
      dt1d(f.data(), dcol.data(), (int)D, v.data(), z.data());
      for (long y = 0; y < D; y++) dist[idx(x, y, zz)] = dcol[y];
    }
  // along x
  for (long y = 0; y < D; y++)
    for (long zz = 0; zz < D; zz++) {
      for (long x = 0; x < D; x++) f[x] = dist[idx(x, y, zz)];
      dt1d(f.data(), dcol.data(), (int)D, v.data(), z.data());
      for (long x = 0; x < D; x++) dist[idx(x, y, zz)] = dcol[x];
    }

  // 3. flood fill from boundary over non-occupied voxels
  std::vector<uint8_t> outside(D3, 0);
  std::queue<long> q;
  auto push = [&](long x, long y, long zz) {
    long i = idx(x, y, zz);
    if (!outside[i] && !wall[i]) {
      outside[i] = 1;
      q.push(i);
    }
  };
  for (long a = 0; a < D; a++)
    for (long b = 0; b < D; b++) {
      push(0, a, b);
      push(D - 1, a, b);
      push(a, 0, b);
      push(a, D - 1, b);
      push(a, b, 0);
      push(a, b, D - 1);
    }
  const long dx[6] = {1, -1, 0, 0, 0, 0};
  const long dy[6] = {0, 0, 1, -1, 0, 0};
  const long dz[6] = {0, 0, 0, 0, 1, -1};
  while (!q.empty()) {
    long i = q.front();
    q.pop();
    long x = i / (D * D), y = (i / D) % D, zz = i % D;
    for (int d6 = 0; d6 < 6; d6++) {
      long nx = x + dx[d6], ny = y + dy[d6], nz = zz + dz[d6];
      if (nx < 0 || ny < 0 || nz < 0 || nx >= D || ny >= D || nz >= D) continue;
      push(nx, ny, nz);
    }
  }

  // 4. signed world-unit output
  for (long i = 0; i < D3; i++) {
    float d = std::sqrt(dist[i]) * voxel;
    out_sdf[i] = (occupied[i] || outside[i]) ? d : -d;
  }
}

}  // extern "C"
