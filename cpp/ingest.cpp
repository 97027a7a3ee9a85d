// Host-side ingest kernels (C++17, no external deps).
//
// TPU-native replacement for the reference's native CPU preprocessing tier:
//   * lib/cpp_wrappers/cpp_subsampling (barycenter grid subsampling,
//     grid_subsampling.h:40-52) -> grid_subsample / grid_subsample_labels
//   * util/voxelize.py FNV64-1A hashing (voxelize.py:46-58) -> voxel_hash +
//     voxel_select (random-point-per-voxel train mode / sorted-count val
//     mode), an order of magnitude faster than the numpy path on large
//     rooms
//   * torch_points_kernels.ball_query CPU usage (train.py:324-329) ->
//     radius_neighbors via a uniform-grid spatial hash (O(N) for
//     room-scale clouds; the reference ecosystem uses a KD-tree)
//
// Exposed as a flat C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <random>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

// Worker count for the query-parallel neighbor kernels. The loader thread
// calls these through ctypes (GIL released), so threads here use real cores
// alongside the driver's device wait. Override: ST_INGEST_THREADS.
int ingest_threads() {
  if (const char* env = std::getenv("ST_INGEST_THREADS")) {
    const int v = std::atoi(env);
    if (v > 0) return std::min(v, 64);
  }
  const unsigned hc = std::thread::hardware_concurrency();
  return hc ? static_cast<int>(std::min(hc, 16u)) : 2;
}

// Split [begin, end) across workers and run fn(thread_id, lo, hi).
template <typename Fn>
void parallel_ranges(int64_t begin, int64_t end, Fn fn) {
  const int64_t n = end - begin;
  int t = ingest_threads();
  if (n < 2048 || t <= 1) {  // below this, thread spawn beats the win
    fn(0, begin, end);
    return;
  }
  t = static_cast<int>(std::min<int64_t>(t, (n + 2047) / 2048));
  std::vector<std::thread> pool;
  pool.reserve(t);
  const int64_t chunk = (n + t - 1) / t;
  for (int i = 0; i < t; ++i) {
    const int64_t lo = begin + i * chunk;
    const int64_t hi = std::min(end, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=] { fn(i, lo, hi); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// FNV64-1A over floored voxel coordinates; mirrors util/voxelize.py:46-58.
// coords: [n,3] float32; out_keys: [n] uint64.
void voxel_hash(const float* coords, int64_t n, float voxel_size,
                uint64_t* out_keys) {
  const uint64_t kBasis = 14695981039346656037ull;
  const uint64_t kPrime = 1099511628211ull;
  for (int64_t i = 0; i < n; ++i) {
    uint64_t h = kBasis;
    for (int d = 0; d < 3; ++d) {
      const double c = std::floor(coords[i * 3 + d] / voxel_size);
      // match numpy uint64 conversion semantics for negatives
      const uint64_t u = static_cast<uint64_t>(static_cast<int64_t>(c));
      h *= kPrime;
      h ^= u;
    }
    out_keys[i] = h;
  }
}

// Random-point-per-voxel selection (train mode, voxelize.py:90-93).
// Returns number of selected indices written to out_idx (capacity n).
int64_t voxel_select_random(const uint64_t* keys, int64_t n, uint64_t seed,
                            int64_t* out_idx) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return keys[a] < keys[b]; });
  std::mt19937_64 rng(seed);
  int64_t out = 0;
  int64_t start = 0;
  for (int64_t i = 1; i <= n; ++i) {
    if (i == n || keys[order[i]] != keys[order[start]]) {
      const int64_t count = i - start;
      std::uniform_int_distribution<int64_t> pick(0, count - 1);
      out_idx[out++] = order[start + pick(rng)];
      start = i;
    }
  }
  return out;
}

// Sorted order + per-voxel counts (val mode, voxelize.py:94-95).
// out_sorted: [n] indices; out_counts: [n] (first n_voxels entries valid).
// Returns n_voxels.
int64_t voxel_sort_counts(const uint64_t* keys, int64_t n,
                          int64_t* out_sorted, int64_t* out_counts) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return keys[a] < keys[b]; });
  int64_t nv = 0;
  int64_t start = 0;
  for (int64_t i = 1; i <= n; ++i) {
    if (i == n || keys[order[i]] != keys[order[start]]) {
      out_counts[nv++] = i - start;
      start = i;
    }
  }
  std::memcpy(out_sorted, order.data(), n * sizeof(int64_t));
  return nv;
}

// ---------------------------------------------------------------------------
// Barycenter grid subsampling (lib/cpp_wrappers semantics: average point,
// average features, majority label per cell).
// points [n,3], features [n,c] (c may be 0), labels [n] (or null).
// out_* buffers sized for worst case n cells. Returns cell count.
int64_t grid_subsample(const float* points, const float* features,
                       const int32_t* labels, int64_t n, int64_t c,
                       float cell, float* out_points, float* out_features,
                       int32_t* out_labels) {
  struct Cell {
    double px = 0, py = 0, pz = 0;
    std::vector<double> feat;
    std::unordered_map<int32_t, int32_t> label_hist;
    int64_t count = 0;
  };
  std::unordered_map<uint64_t, Cell> cells;
  cells.reserve(static_cast<size_t>(n / 4 + 16));

  float minx = 1e30f, miny = 1e30f, minz = 1e30f;
  for (int64_t i = 0; i < n; ++i) {
    minx = std::min(minx, points[i * 3 + 0]);
    miny = std::min(miny, points[i * 3 + 1]);
    minz = std::min(minz, points[i * 3 + 2]);
  }
  for (int64_t i = 0; i < n; ++i) {
    const uint64_t cx =
        static_cast<uint64_t>((points[i * 3 + 0] - minx) / cell);
    const uint64_t cy =
        static_cast<uint64_t>((points[i * 3 + 1] - miny) / cell);
    const uint64_t cz =
        static_cast<uint64_t>((points[i * 3 + 2] - minz) / cell);
    const uint64_t key = (cx << 42) | (cy << 21) | cz;
    Cell& cl = cells[key];
    if (cl.count == 0 && c > 0) cl.feat.assign(c, 0.0);
    cl.px += points[i * 3 + 0];
    cl.py += points[i * 3 + 1];
    cl.pz += points[i * 3 + 2];
    for (int64_t j = 0; j < c; ++j) cl.feat[j] += features[i * c + j];
    if (labels) cl.label_hist[labels[i]]++;
    cl.count++;
  }
  int64_t out = 0;
  for (auto& kv : cells) {
    const Cell& cl = kv.second;
    const double inv = 1.0 / static_cast<double>(cl.count);
    out_points[out * 3 + 0] = static_cast<float>(cl.px * inv);
    out_points[out * 3 + 1] = static_cast<float>(cl.py * inv);
    out_points[out * 3 + 2] = static_cast<float>(cl.pz * inv);
    for (int64_t j = 0; j < c; ++j)
      out_features[out * c + j] = static_cast<float>(cl.feat[j] * inv);
    if (labels) {
      int32_t best = 0, best_cnt = -1;
      for (auto& lh : cl.label_hist) {
        if (lh.second > best_cnt) {
          best_cnt = lh.second;
          best = lh.first;
        }
      }
      out_labels[out] = best;
    }
    ++out;
  }
  return out;
}

// ---------------------------------------------------------------------------
// Radius neighbors via uniform-grid spatial hash.
// Per-scene segments given by offsets (cumulative, like the framework's
// convention). out_idx [n,k] (filled with -1 when absent).
void radius_neighbors(const float* points, const int64_t* offsets,
                      int64_t n_scenes, float radius, int64_t k,
                      int32_t* out_idx) {
  const float cell = radius;
  const float r2 = radius * radius;
  int64_t start = 0;
  for (int64_t s = 0; s < n_scenes; ++s) {
    const int64_t end = offsets[s];
    std::unordered_map<uint64_t, std::vector<int32_t>> grid;
    grid.reserve(static_cast<size_t>((end - start) / 2 + 16));
    auto key_of = [&](float x, float y, float z) -> uint64_t {
      const int64_t cx = static_cast<int64_t>(std::floor(x / cell)) + (1 << 20);
      const int64_t cy = static_cast<int64_t>(std::floor(y / cell)) + (1 << 20);
      const int64_t cz = static_cast<int64_t>(std::floor(z / cell)) + (1 << 20);
      return (static_cast<uint64_t>(cx) << 42) |
             (static_cast<uint64_t>(cy) << 21) | static_cast<uint64_t>(cz);
    };
    for (int64_t i = start; i < end; ++i) {
      grid[key_of(points[i * 3], points[i * 3 + 1], points[i * 3 + 2])]
          .push_back(static_cast<int32_t>(i));
    }
    parallel_ranges(start, end, [&](int, int64_t lo, int64_t hi) {
      std::vector<std::pair<float, int32_t>> cand;
      for (int64_t i = lo; i < hi; ++i) {
        cand.clear();
        const float x = points[i * 3], y = points[i * 3 + 1],
                    z = points[i * 3 + 2];
        for (int dx = -1; dx <= 1; ++dx)
          for (int dy = -1; dy <= 1; ++dy)
            for (int dz = -1; dz <= 1; ++dz) {
              auto it = grid.find(key_of(x + dx * cell, y + dy * cell,
                                         z + dz * cell));
              if (it == grid.end()) continue;
              for (int32_t j : it->second) {
                const float ddx = points[j * 3] - x;
                const float ddy = points[j * 3 + 1] - y;
                const float ddz = points[j * 3 + 2] - z;
                const float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                if (d2 <= r2) cand.emplace_back(d2, j);
              }
            }
        const int64_t kk = std::min<int64_t>(k, cand.size());
        std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
        for (int64_t j = 0; j < k; ++j)
          out_idx[i * k + j] = j < kk ? cand[j].second : -1;
      }
    });
    start = end;
  }
}



// Exact k-nearest-neighbors: query points against reference points, per
// scene (offsets cumulative over both sets). Uniform-grid hash with ring
// expansion: rings grow until k found AND the closed ring lower-bound
// exceeds the current k-th distance. out_idx [nq, k] (-1 pad),
// out_d2 optional squared distances (may be null).
void knn_grid(const float* qpts, const int64_t* q_offsets,
              const float* rpts, const int64_t* r_offsets,
              int64_t n_scenes, int64_t k, float cell,
              int32_t* out_idx, float* out_d2) {
  int64_t qs = 0, rs = 0;
  for (int64_t s = 0; s < n_scenes; ++s) {
    const int64_t qe = q_offsets[s];
    const int64_t re = r_offsets[s];
    if (cell <= 0.f) {
      // heuristic: ~2 average point spacings from the scene bounding box
      float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
      for (int64_t i = rs; i < re; ++i)
        for (int d = 0; d < 3; ++d) {
          mn[d] = std::min(mn[d], rpts[i * 3 + d]);
          mx[d] = std::max(mx[d], rpts[i * 3 + d]);
        }
      const double vol =
          std::max(1e-9, double(mx[0] - mn[0]) * double(mx[1] - mn[1]) *
                             double(mx[2] - mn[2]));
      cell = 2.f * float(std::cbrt(vol / std::max<int64_t>(re - rs, 1)));
    }
    std::unordered_map<uint64_t, std::vector<int32_t>> grid;
    grid.reserve(static_cast<size_t>((re - rs) / 2 + 16));
    auto cell_of = [&](float v) {
      return static_cast<int64_t>(std::floor(v / cell)) + (1 << 20);
    };
    auto key3 = [&](int64_t cx, int64_t cy, int64_t cz) -> uint64_t {
      return (static_cast<uint64_t>(cx) << 42) |
             (static_cast<uint64_t>(cy) << 21) | static_cast<uint64_t>(cz);
    };
    for (int64_t i = rs; i < re; ++i)
      grid[key3(cell_of(rpts[i * 3]), cell_of(rpts[i * 3 + 1]),
                cell_of(rpts[i * 3 + 2]))]
          .push_back(static_cast<int32_t>(i));

    parallel_ranges(qs, qe, [&](int, int64_t q_lo, int64_t q_hi) {
    std::vector<std::pair<float, int32_t>> heap;  // max-heap of k best
    for (int64_t i = q_lo; i < q_hi; ++i) {
      const float x = qpts[i * 3], y = qpts[i * 3 + 1], z = qpts[i * 3 + 2];
      const int64_t cx = cell_of(x), cy = cell_of(y), cz = cell_of(z);
      heap.clear();
      bool exact = false;
      const size_t want =
          static_cast<size_t>(std::min<int64_t>(k, re - rs));
      for (int ring = 0; ring < 64; ++ring) {
        // visit only the shell of the ring (interior already visited)
        for (int64_t dx = -ring; dx <= ring; ++dx)
          for (int64_t dy = -ring; dy <= ring; ++dy)
            for (int64_t dz = -ring; dz <= ring; ++dz) {
              if (std::max({std::abs(dx), std::abs(dy), std::abs(dz)}) !=
                  ring)
                continue;
              auto it = grid.find(key3(cx + dx, cy + dy, cz + dz));
              if (it == grid.end()) continue;
              for (int32_t j : it->second) {
                const float ddx = rpts[j * 3] - x;
                const float ddy = rpts[j * 3 + 1] - y;
                const float ddz = rpts[j * 3 + 2] - z;
                const float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                if (heap.size() < static_cast<size_t>(k)) {
                  heap.emplace_back(d2, j);
                  std::push_heap(heap.begin(), heap.end());
                } else if (d2 < heap.front().first) {
                  std::pop_heap(heap.begin(), heap.end());
                  heap.back() = {d2, j};
                  std::push_heap(heap.begin(), heap.end());
                }
              }
            }
        // closed-ring lower bound: any point beyond ring `ring` is at
        // least ring*cell away from the query's cell
        const float lb = ring * cell;
        if (heap.size() >= want &&
            (want == static_cast<size_t>(re - rs) ||
             heap.front().first <= lb * lb)) {
          exact = true;
          break;
        }
        if (ring * cell > 1e4f) break;  // degenerate scenes
      }
      if (!exact) {
        // Ring cap hit before the exactness bound was proven (clustered
        // scene + underestimated cell): fall back to a brute-force scan
        // so the advertised exact-kNN contract always holds.
        heap.clear();
        for (int64_t j = rs; j < re; ++j) {
          const float ddx = rpts[j * 3] - x;
          const float ddy = rpts[j * 3 + 1] - y;
          const float ddz = rpts[j * 3 + 2] - z;
          const float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
          if (heap.size() < static_cast<size_t>(k)) {
            heap.emplace_back(d2, static_cast<int32_t>(j));
            std::push_heap(heap.begin(), heap.end());
          } else if (d2 < heap.front().first) {
            std::pop_heap(heap.begin(), heap.end());
            heap.back() = {d2, static_cast<int32_t>(j)};
            std::push_heap(heap.begin(), heap.end());
          }
        }
      }
      std::sort_heap(heap.begin(), heap.end());  // ascending by d2
      for (int64_t j = 0; j < k; ++j) {
        const bool ok = j < static_cast<int64_t>(heap.size());
        out_idx[i * k + j] = ok ? heap[j].second : -1;
        if (out_d2) out_d2[i * k + j] = ok ? heap[j].first : 1e10f;
      }
    }
    });
    qs = qe;
    rs = re;
  }
}

}  // extern "C"
