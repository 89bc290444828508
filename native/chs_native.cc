// Native runtime helpers for casualhdrsplat_tpu (host-side, C++17).
//
// TPU-native counterpart of the reference lineage's host/CUDA extensions
// (SURVEY.md C7 `simple_knn`, C19 COLMAP parsing): the TPU compute path is
// JAX/Pallas, but one-shot host work — nearest-neighbor scale init over
// millions of SfM points and parsing multi-hundred-MB points3D.bin files —
// is faster and leaner in C++ than in Python.  Loaded via ctypes
// (casualhdrsplat_tpu/data/_native.py); every caller has a Python
// fallback, so the shared library is optional.
//
// Build: make -C native   (produces native/libchs_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// k-NN mean distance (Gaussian scale init, SURVEY.md C7).
//
// Uniform-grid spatial hash: O(M) build, ~O(M * k) query for well-spread
// SfM clouds — replaces the reference's `simple_knn` CUDA kernel with a
// cache-friendly host implementation (init-time only, not a hot path).
// ---------------------------------------------------------------------------

static inline int64_t cell_key(int ix, int iy, int iz, int nx, int ny) {
  return (static_cast<int64_t>(iz) * ny + iy) * nx + ix;
}

int chs_knn_mean_dist(const float* pts, long long m_ll, int k, float* out) {
  const size_t m = static_cast<size_t>(m_ll);
  if (m == 0) return 0;
  if (m == 1) {
    out[0] = 0.01f;
    return 0;
  }
  const int kk = std::min<int>(k, static_cast<int>(m) - 1);

  float lo[3] = {pts[0], pts[1], pts[2]};
  float hi[3] = {pts[0], pts[1], pts[2]};
  for (size_t i = 0; i < m; ++i) {
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], pts[3 * i + d]);
      hi[d] = std::max(hi[d], pts[3 * i + d]);
    }
  }
  // target ~2 points per cell
  const double vol = std::max(1e-12,
      double(hi[0] - lo[0]) * double(hi[1] - lo[1]) * double(hi[2] - lo[2]));
  double cell = std::cbrt(vol * 2.0 / double(m));
  if (!(cell > 0)) cell = 1.0;
  int nx = std::max(1, int((hi[0] - lo[0]) / cell) + 1);
  int ny = std::max(1, int((hi[1] - lo[1]) / cell) + 1);
  int nz = std::max(1, int((hi[2] - lo[2]) / cell) + 1);
  // cap the grid so degenerate clouds do not explode memory
  const int64_t max_cells = 1 << 24;
  while (static_cast<int64_t>(nx) * ny * nz > max_cells) {
    nx = std::max(1, nx / 2);
    ny = std::max(1, ny / 2);
    nz = std::max(1, nz / 2);
    cell *= 2.0;
  }
  const double inv_cell = 1.0 / cell;
  const int64_t ncells = static_cast<int64_t>(nx) * ny * nz;

  std::vector<int32_t> counts(ncells + 1, 0);
  std::vector<int32_t> cix(m), ciy(m), ciz(m);
  for (size_t i = 0; i < m; ++i) {
    int ix = std::min(nx - 1, std::max(0, int((pts[3 * i] - lo[0]) * inv_cell)));
    int iy = std::min(ny - 1, std::max(0, int((pts[3 * i + 1] - lo[1]) * inv_cell)));
    int iz = std::min(nz - 1, std::max(0, int((pts[3 * i + 2] - lo[2]) * inv_cell)));
    cix[i] = ix; ciy[i] = iy; ciz[i] = iz;
    counts[cell_key(ix, iy, iz, nx, ny) + 1]++;
  }
  for (int64_t c = 0; c < ncells; ++c) counts[c + 1] += counts[c];
  std::vector<int32_t> order(m);
  {
    std::vector<int32_t> cursor(counts.begin(), counts.end() - 1);
    for (size_t i = 0; i < m; ++i) {
      const int64_t key = cell_key(cix[i], ciy[i], ciz[i], nx, ny);
      order[cursor[key]++] = static_cast<int32_t>(i);
    }
  }

  std::vector<float> best(kk);
  for (size_t i = 0; i < m; ++i) {
    const float px = pts[3 * i], py = pts[3 * i + 1], pz = pts[3 * i + 2];
    int found = 0;
    std::fill(best.begin(), best.end(), INFINITY);
    // expand rings of cells until the kk-th best distance is safely inside
    const int max_ring = nx + ny + nz;  // corner points need > max(n*)
    for (int ring = 0; ring <= max_ring; ++ring) {
      // after completing rings 0..ring-1, every unvisited point is at
      // least (ring-1)*cell away (query may sit at its cell's edge)
      const float safe = float((ring - 1) * cell);
      if (ring >= 1 && found >= kk && best[kk - 1] <= safe * safe) break;
      // shell membership on UNCLAMPED Chebyshev distance — clamped bounds
      // would re-visit boundary cells across rings and insert duplicate
      // neighbors into the k-best list
      for (int iz = ciz[i] - ring; iz <= ciz[i] + ring; ++iz) {
        if (iz < 0 || iz >= nz) continue;
        for (int iy = ciy[i] - ring; iy <= ciy[i] + ring; ++iy) {
          if (iy < 0 || iy >= ny) continue;
          for (int ix = cix[i] - ring; ix <= cix[i] + ring; ++ix) {
            if (ix < 0 || ix >= nx) continue;
            const int cheb = std::max(
                {std::abs(ix - cix[i]), std::abs(iy - ciy[i]),
                 std::abs(iz - ciz[i])});
            if (cheb != ring) continue;
            const int64_t key = cell_key(ix, iy, iz, nx, ny);
            for (int32_t s = counts[key]; s < counts[key + 1]; ++s) {
              const int32_t j = order[s];
              if (static_cast<size_t>(j) == i) continue;
              const float dx = pts[3 * j] - px, dy = pts[3 * j + 1] - py,
                          dz = pts[3 * j + 2] - pz;
              const float d2 = dx * dx + dy * dy + dz * dz;
              if (d2 < best[kk - 1]) {
                // insertion sort into the k-best list
                int p = kk - 1;
                while (p > 0 && best[p - 1] > d2) {
                  best[p] = best[p - 1];
                  --p;
                }
                best[p] = d2;
                if (found < kk) ++found;
              }
            }
          }
        }
      }
      const bool whole_grid =
          cix[i] - ring <= 0 && cix[i] + ring >= nx - 1 &&
          ciy[i] - ring <= 0 && ciy[i] + ring >= ny - 1 &&
          ciz[i] - ring <= 0 && ciz[i] + ring >= nz - 1;
      if (whole_grid) break;  // searched everything
    }
    double acc = 0.0;
    int cnt = 0;
    for (int t = 0; t < kk; ++t)
      if (std::isfinite(best[t])) {
        acc += std::sqrt(double(best[t]));
        ++cnt;
      }
    out[i] = cnt ? float(acc / cnt) : 0.01f;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// COLMAP points3D.bin fast path (SURVEY.md C19).
// Format per record: uint64 id; 3x double xyz; 3x uint8 rgb; double error;
// uint64 track_len; track_len x (int32, int32).
// ---------------------------------------------------------------------------

long long chs_read_points3d_count(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint64_t num = 0;
  const size_t got = std::fread(&num, sizeof(num), 1, f);
  std::fclose(f);
  return got == 1 ? static_cast<long long>(num) : -1;
}

int chs_read_points3d(const char* path, float* xyz, float* rgb, long long n) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  uint64_t num = 0;
  if (std::fread(&num, sizeof(num), 1, f) != 1 ||
      static_cast<long long>(num) != n) {
    std::fclose(f);
    return 2;
  }
#pragma pack(push, 1)
  struct Head {
    uint64_t id;
    double x, y, z;
    uint8_t r, g, b;
    double err;
    uint64_t track_len;
  };
#pragma pack(pop)
  static_assert(sizeof(Head) == 8 + 24 + 3 + 8 + 8, "packing");
  Head h;
  for (long long i = 0; i < n; ++i) {
    if (std::fread(&h, sizeof(h), 1, f) != 1) {
      std::fclose(f);
      return 3;
    }
    xyz[3 * i] = float(h.x);
    xyz[3 * i + 1] = float(h.y);
    xyz[3 * i + 2] = float(h.z);
    rgb[3 * i] = float(h.r) / 255.0f;
    rgb[3 * i + 1] = float(h.g) / 255.0f;
    rgb[3 * i + 2] = float(h.b) / 255.0f;
    if (std::fseek(f, long(h.track_len) * 8, SEEK_CUR) != 0) {
      std::fclose(f);
      return 4;
    }
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
