// Native scene-preprocessing kernels (C API, loaded via ctypes).
//
// The reference's native tier is the Vulkan engine + GLSL kernels; on TPU the
// device tier is Pallas/XLA, and THIS file is the host-side native tier
// (SURVEY.md §2.4 note): heavy once-per-scene preprocessing that would be
// slow in Python — Morton ordering of multi-million-Gaussian clouds and
// uniform-grid binning for secondary-ray traversal. Single translation unit,
// no external deps, built with `g++ -O3 -march=native -shared -fPIC`.
#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---- Morton codes ---------------------------------------------------------

static inline uint32_t expand_bits_3(uint32_t v) {
  v = (v | (v << 16)) & 0x030000FFu;
  v = (v | (v << 8)) & 0x0300F00Fu;
  v = (v | (v << 4)) & 0x030C30C3u;
  v = (v | (v << 2)) & 0x09249249u;
  return v;
}

// 30-bit 3D Morton codes for n points, normalized into [lo, hi].
void morton3d(const float* pts, int64_t n, const float* lo, const float* hi,
              uint32_t* out) {
  float ext[3];
  for (int k = 0; k < 3; ++k) {
    ext[k] = hi[k] - lo[k];
    if (ext[k] < 1e-12f) ext[k] = 1e-12f;
  }
  for (int64_t i = 0; i < n; ++i) {
    uint32_t q[3];
    for (int k = 0; k < 3; ++k) {
      float t = (pts[i * 3 + k] - lo[k]) / ext[k] * 1024.0f;
      if (t < 0.0f) t = 0.0f;
      if (t > 1023.0f) t = 1023.0f;
      q[k] = (uint32_t)t;
    }
    out[i] = expand_bits_3(q[0]) | (expand_bits_3(q[1]) << 1) |
             (expand_bits_3(q[2]) << 2);
  }
}

// ---- Radix argsort (uint32 keys) ------------------------------------------

// LSD radix sort of (key, index) pairs, 4 passes of 8 bits. out_idx gets the
// permutation that sorts keys ascending (stable).
void radix_argsort_u32(const uint32_t* keys, int64_t n, int32_t* out_idx) {
  std::vector<uint32_t> k0(keys, keys + n), k1(n);
  std::vector<int32_t> i0(n), i1(n);
  for (int64_t i = 0; i < n; ++i) i0[i] = (int32_t)i;
  for (int pass = 0; pass < 4; ++pass) {
    int shift = pass * 8;
    int64_t count[256] = {0};
    for (int64_t i = 0; i < n; ++i) ++count[(k0[i] >> shift) & 0xFF];
    int64_t offs[256];
    int64_t run = 0;
    for (int b = 0; b < 256; ++b) {
      offs[b] = run;
      run += count[b];
    }
    for (int64_t i = 0; i < n; ++i) {
      int64_t dst = offs[(k0[i] >> shift) & 0xFF]++;
      k1[dst] = k0[i];
      i1[dst] = i0[i];
    }
    k0.swap(k1);
    i0.swap(i1);
  }
  std::memcpy(out_idx, i0.data(), n * sizeof(int32_t));
}

// ---- Uniform grid binning -------------------------------------------------

// Bin n spheres (center + radius: the 3-sigma bound of each Gaussian) into a
// gx*gy*gz world grid over [lo, hi]. Each cell keeps up to max_per_cell
// indices (padded with -1); counts report the untruncated totals.
// Multi-threaded over Gaussians with per-cell atomic cursors.
void grid_bin(const float* centers, const float* radii, int64_t n,
              const float* lo, const float* hi, int32_t gx, int32_t gy,
              int32_t gz, int32_t max_per_cell, int32_t* cell_indices,
              int32_t* cell_counts) {
  const int64_t n_cells = (int64_t)gx * gy * gz;
  std::vector<std::atomic<int32_t>> cursors(n_cells);
  for (auto& c : cursors) c.store(0, std::memory_order_relaxed);
  for (int64_t i = 0; i < n_cells * max_per_cell; ++i) cell_indices[i] = -1;

  float ext[3], inv_cell[3];
  int32_t dims[3] = {gx, gy, gz};
  for (int k = 0; k < 3; ++k) {
    ext[k] = hi[k] - lo[k];
    if (ext[k] < 1e-12f) ext[k] = 1e-12f;
    inv_cell[k] = dims[k] / ext[k];
  }

  int n_threads = (int)std::max(1u, std::thread::hardware_concurrency());
  if (n < 10000) n_threads = 1;
  std::vector<std::thread> workers;
  auto work = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      const float* c = centers + i * 3;
      float r = radii[i];
      int32_t c0[3], c1[3];
      for (int k = 0; k < 3; ++k) {
        c0[k] = (int32_t)std::floor((c[k] - r - lo[k]) * inv_cell[k]);
        c1[k] = (int32_t)std::floor((c[k] + r - lo[k]) * inv_cell[k]);
        c0[k] = std::max(0, std::min(dims[k] - 1, c0[k]));
        c1[k] = std::max(0, std::min(dims[k] - 1, c1[k]));
      }
      for (int32_t z = c0[2]; z <= c1[2]; ++z)
        for (int32_t y = c0[1]; y <= c1[1]; ++y)
          for (int32_t x = c0[0]; x <= c1[0]; ++x) {
            int64_t cell = ((int64_t)z * gy + y) * gx + x;
            int32_t slot =
                cursors[cell].fetch_add(1, std::memory_order_relaxed);
            if (slot < max_per_cell)
              cell_indices[cell * max_per_cell + slot] = (int32_t)i;
          }
    }
  };
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t b = t * chunk, e = std::min(n, b + chunk);
    if (b >= e) break;
    workers.emplace_back(work, b, e);
  }
  for (auto& w : workers) w.join();
  for (int64_t i = 0; i < n_cells; ++i)
    cell_counts[i] = cursors[i].load(std::memory_order_relaxed);
}

// Bin n axis-aligned boxes (center +- ext per axis: the 3-sigma AABB of each
// Gaussian, which for flat surfels is far tighter than the bounding sphere)
// into a gx*gy*gz world grid over [lo, hi]. Each cell keeps up to
// max_per_cell indices; when a cell overflows, the LOWEST-priority entry is
// evicted (priority = peak alpha), so truncation degrades gracefully instead
// of dropping arbitrary late arrivals. counts report untruncated totals.
void grid_bin_aniso(const float* centers, const float* exts,
                    const float* priority, int64_t n, const float* lo,
                    const float* hi, int32_t gx, int32_t gy, int32_t gz,
                    int32_t max_per_cell, int32_t* cell_indices,
                    int32_t* cell_counts) {
  const int64_t n_cells = (int64_t)gx * gy * gz;
  std::memset(cell_counts, 0, n_cells * sizeof(int32_t));
  for (int64_t i = 0; i < n_cells * max_per_cell; ++i) cell_indices[i] = -1;
  std::vector<float> prio(n_cells * (int64_t)max_per_cell);

  float ext[3], inv_cell[3];
  int32_t dims[3] = {gx, gy, gz};
  for (int k = 0; k < 3; ++k) {
    ext[k] = hi[k] - lo[k];
    if (ext[k] < 1e-12f) ext[k] = 1e-12f;
    inv_cell[k] = dims[k] / ext[k];
  }
  for (int64_t i = 0; i < n; ++i) {
    const float* c = centers + i * 3;
    const float* e = exts + i * 3;
    float p = priority ? priority[i] : 1.0f;
    int32_t c0[3], c1[3];
    for (int k = 0; k < 3; ++k) {
      c0[k] = (int32_t)std::floor((c[k] - e[k] - lo[k]) * inv_cell[k]);
      c1[k] = (int32_t)std::floor((c[k] + e[k] - lo[k]) * inv_cell[k]);
      c0[k] = std::max(0, std::min(dims[k] - 1, c0[k]));
      c1[k] = std::max(0, std::min(dims[k] - 1, c1[k]));
    }
    for (int32_t z = c0[2]; z <= c1[2]; ++z)
      for (int32_t y = c0[1]; y <= c1[1]; ++y)
        for (int32_t x = c0[0]; x <= c1[0]; ++x) {
          int64_t cell = ((int64_t)z * gy + y) * gx + x;
          int32_t cnt = cell_counts[cell];
          cell_counts[cell] = cnt + 1;
          int32_t* row = cell_indices + cell * max_per_cell;
          float* prow = prio.data() + cell * max_per_cell;
          if (cnt < max_per_cell) {
            row[cnt] = (int32_t)i;
            prow[cnt] = p;
          } else {
            int32_t lo_slot = 0;
            for (int32_t s = 1; s < max_per_cell; ++s)
              if (prow[s] < prow[lo_slot]) lo_slot = s;
            if (p > prow[lo_slot]) {
              row[lo_slot] = (int32_t)i;
              prow[lo_slot] = p;
            }
          }
        }
  }
}

// Exact chessboard (chebyshev) distance transform of a 3D occupancy grid,
// two-pass chamfer scan. dist[i] = 0 for occupied cells, else chebyshev
// distance to the nearest occupied cell, saturated at cap. Feeds the ray
// marcher's empty-space jumps (a ray in a cell with distance d can safely
// advance d-1 cells in one step).
void chebyshev_dist(const uint8_t* occupied, int32_t gx, int32_t gy,
                    int32_t gz, int32_t cap, uint8_t* dist) {
  const int64_t n = (int64_t)gx * gy * gz;
  const int32_t big = cap;
  std::vector<int32_t> d(n);
  for (int64_t i = 0; i < n; ++i) d[i] = occupied[i] ? 0 : big;
  auto at = [&](int32_t x, int32_t y, int32_t z) -> int32_t& {
    return d[((int64_t)z * gy + y) * gx + x];
  };
  // forward pass: neighbors with lower scan order
  for (int32_t z = 0; z < gz; ++z)
    for (int32_t y = 0; y < gy; ++y)
      for (int32_t x = 0; x < gx; ++x) {
        int32_t& v = at(x, y, z);
        if (v == 0) continue;
        for (int32_t dz = -1; dz <= 0; ++dz)
          for (int32_t dy = -1; dy <= 1; ++dy)
            for (int32_t dx = -1; dx <= 1; ++dx) {
              if (dz == 0 && (dy > 0 || (dy == 0 && dx >= 0))) continue;
              int32_t nx = x + dx, ny = y + dy, nz = z + dz;
              if (nx < 0 || ny < 0 || nz < 0 || nx >= gx || ny >= gy ||
                  nz >= gz)
                continue;
              int32_t c = at(nx, ny, nz) + 1;
              if (c < v) v = c;
            }
      }
  // backward pass
  for (int32_t z = gz - 1; z >= 0; --z)
    for (int32_t y = gy - 1; y >= 0; --y)
      for (int32_t x = gx - 1; x >= 0; --x) {
        int32_t& v = at(x, y, z);
        if (v == 0) continue;
        for (int32_t dz = 0; dz <= 1; ++dz)
          for (int32_t dy = -1; dy <= 1; ++dy)
            for (int32_t dx = -1; dx <= 1; ++dx) {
              if (dz == 0 && (dy < 0 || (dy == 0 && dx <= 0))) continue;
              int32_t nx = x + dx, ny = y + dy, nz = z + dz;
              if (nx < 0 || ny < 0 || nz < 0 || nx >= gx || ny >= gy ||
                  nz >= gz)
                continue;
              int32_t c = at(nx, ny, nz) + 1;
              if (c < v) v = c;
            }
      }
  for (int64_t i = 0; i < n; ++i)
    dist[i] = (uint8_t)std::min(d[i], big);
}

// ---- Fast ascii point-cloud PLY writer ------------------------------------

// Formats rows "x y z nx ny nz r g b\n" into caller buffer; returns bytes
// written or -1 if the buffer is too small. (The %g formatting loop was the
// Python bottleneck when exporting 1M-point clouds.)
int64_t format_ply_rows(const float* pos, const float* nrm,
                        const uint8_t* rgb, int64_t n, char* out,
                        int64_t capacity) {
  int64_t w = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (capacity - w < 160) return -1;
    int written = snprintf(
        out + w, (size_t)(capacity - w), "%g %g %g %g %g %g %u %u %u\n",
        pos[i * 3], pos[i * 3 + 1], pos[i * 3 + 2], nrm[i * 3],
        nrm[i * 3 + 1], nrm[i * 3 + 2], rgb[i * 3], rgb[i * 3 + 1],
        rgb[i * 3 + 2]);
    if (written <= 0) return -1;
    w += written;
  }
  return w;
}

}  // extern "C"
