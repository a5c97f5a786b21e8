// Host-side event voxelization + normalization (C ABI, loaded via ctypes).
//
// The reference's hot CPU loop is np.add.at scatter voxelization
// (RAM_Net/data_loader/dataset_asynchronous.py:253-298, ~1 Mev/s here).
// This native implementation keeps identical semantics (bilinear time
// interpolation, polarity 0 -> -1, bin-bound drops) at memory speed, and
// fuses the nonzero mean/std normalization pass
// (event_dataset.py:144-151).  It serves the host data path (DataLoader
// workers); the TPU path uses the Pallas kernel.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libramnet_host.so host_voxelize.cc

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Core scatter of events [lo, hi) into a caller-zeroed grid.
inline void scatter_range(const float* events, int64_t lo, int64_t hi,
                          double first, double scale, int num_bins,
                          int width, int64_t plane, float* out) {
  for (int64_t i = lo; i < hi; ++i) {
    const float* e = events + i * 4;
    const double ts = (e[0] - first) * scale;
    const int64_t x = (int64_t)e[1];
    const int64_t y = (int64_t)e[2];
    float pol = e[3];
    if (pol == 0.0f) pol = -1.0f;
    const int64_t ti = (int64_t)ts;  // ts >= 0: trunc == floor
    const float dtf = (float)(ts - (double)ti);
    const int64_t base = x + y * width;
    if (ti < num_bins) out[base + ti * plane] += pol * (1.0f - dtf);
    if (ti + 1 < num_bins) out[base + (ti + 1) * plane] += pol * dtf;
  }
}

}  // namespace

extern "C" {

// events: [n, 4] float32 rows (t, x, y, pol); out: [num_bins*height*width]
// float32 (caller-zeroed or not; we zero it here).  Returns 0 on success.
int ramnet_voxelize_f32(const float* events, int64_t n, int num_bins,
                        int height, int width, float* out) {
  const int64_t cells = (int64_t)num_bins * height * width;
  std::memset(out, 0, cells * sizeof(float));
  if (n <= 0) return 0;

  const double first = events[0];
  const double last = events[(n - 1) * 4];
  double dt = last - first;
  if (dt == 0.0) dt = 1.0;
  const double scale = (num_bins - 1) / dt;
  const int64_t plane = (int64_t)width * height;

  scatter_range(events, 0, n, first, scale, num_bins, width, plane, out);
  return 0;
}

// Multi-threaded variant: threads scatter disjoint event ranges into
// private grids (scatter collisions make shared writes racy), then the
// partials are reduced in parallel over disjoint CELL slices.  Grids are
// small (5 x 260 x 346 x 4B = 1.8 MB), so partials fit comfortably in LLC
// and the reduction is a fraction of the scatter cost.  Exact same
// accumulation values as the serial kernel; float summation ORDER within a
// cell differs (partials sum in thread order) — bit-differences bounded by
// ordinary float reassociation, same as np.add.at vs any other order.
int ramnet_voxelize_f32_mt(const float* events, int64_t n, int num_bins,
                           int height, int width, float* out,
                           int num_threads) {
  const int64_t cells = (int64_t)num_bins * height * width;
  if (num_threads <= 0) {
    num_threads = (int)std::thread::hardware_concurrency();
    if (num_threads <= 0) num_threads = 1;
  }
  // below ~128K events the thread spawn + reduce overheads dominate
  if (num_threads == 1 || n < (1 << 17))
    return ramnet_voxelize_f32(events, n, num_bins, height, width, out);

  std::memset(out, 0, cells * sizeof(float));
  if (n <= 0) return 0;
  const double first = events[0];
  const double last = events[(n - 1) * 4];
  double dt = last - first;
  if (dt == 0.0) dt = 1.0;
  const double scale = (num_bins - 1) / dt;
  const int64_t plane = (int64_t)width * height;

  const int nt = std::min<int64_t>(num_threads, (n + (1 << 16)) >> 16);
  std::vector<std::vector<float>> partials(nt - 1);
  std::vector<std::thread> threads;
  const int64_t chunk = (n + nt - 1) / nt;
  // thread 0's partial IS `out`; the rest get private zeroed grids
  for (int t = 1; t < nt; ++t) {
    partials[t - 1].assign(cells, 0.0f);
    float* grid = partials[t - 1].data();
    const int64_t lo = t * chunk;
    const int64_t hi = std::min<int64_t>(n, lo + chunk);
    threads.emplace_back([=] {
      scatter_range(events, lo, hi, first, scale, num_bins, width, plane,
                    grid);
    });
  }
  scatter_range(events, 0, std::min<int64_t>(n, chunk), first, scale,
                num_bins, width, plane, out);
  for (auto& th : threads) th.join();

  // parallel reduce: each thread sums all partials over a disjoint slice
  threads.clear();
  const int64_t cslice = (cells + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int64_t lo = t * cslice;
    const int64_t hi = std::min<int64_t>(cells, lo + cslice);
    if (lo >= hi) break;
    threads.emplace_back([=, &partials] {
      for (const auto& part : partials) {
        const float* src = part.data();
        for (int64_t i = lo; i < hi; ++i) out[i] += src[i];
      }
    });
  }
  for (auto& th : threads) th.join();
  return 0;
}

// In-place nonzero mean/std normalization (population std), matching
// event_dataset.py:144-151: no-op when no nonzeros or zero std.
int ramnet_normalize_nonzero_f32(float* grid, int64_t n) {
  double sum = 0.0, sum2 = 0.0;
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float v = grid[i];
    if (v != 0.0f) {
      sum += v;
      sum2 += (double)v * v;
      ++count;
    }
  }
  if (count == 0) return 0;
  const double mean = sum / count;
  const double var = sum2 / count - mean * mean;
  if (var <= 0.0) return 0;
  const float inv_std = (float)(1.0 / std::sqrt(var));
  const float fmean = (float)mean;
  for (int64_t i = 0; i < n; ++i) {
    if (grid[i] != 0.0f) grid[i] = (grid[i] - fmean) * inv_std;
  }
  return 0;
}

// Parse "t x y p" text rows into a [n, 4] float32 buffer.  Returns the
// number of parsed rows (<= max_rows), -1 on error.  Fast path for the
// streaming demo's FixedSize/FixedDuration readers.
int64_t ramnet_parse_events_txt(const char* buf, int64_t len, float* out,
                                int64_t max_rows) {
  int64_t rows = 0;
  const char* p = buf;
  const char* end = buf + len;
  while (p < end && rows < max_rows) {
    // skip leading whitespace/newlines
    while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t')) ++p;
    if (p >= end) break;
    char* next = nullptr;
    double vals[4];
    bool ok = true;
    for (int k = 0; k < 4; ++k) {
      vals[k] = std::strtod(p, &next);
      if (next == p) { ok = false; break; }
      p = next;
    }
    if (!ok) break;
    float* row = out + rows * 4;
    row[0] = (float)vals[0];
    row[1] = (float)vals[1];
    row[2] = (float)vals[2];
    row[3] = (float)vals[3];
    ++rows;
    // skip to end of line
    while (p < end && *p != '\n') ++p;
  }
  return rows;
}

}  // extern "C"
