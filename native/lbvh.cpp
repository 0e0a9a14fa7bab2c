// Native LBVH builder — C++ fast path for tracer.accel.lbvh.
//
// The reference builds its HLBVH in native Rust with rayon + rdst
// (/root/reference/src/data_structures/hlbvh.rs:36-239): parallel Morton
// codes, parallel radix sort, lock-free treelet emit, sequential upper tree.
// This implementation produces the same *kind* of structure through the
// Karras 2012 parallel radix tree (matching tracer/accel/lbvh.py's layout:
// SoA nodes with explicit left/right links, collapsed leaves of up to
// max_prims primitives) with OpenMP parallel stages:
//   morton (par) -> 64-bit LSD radix sort (par histogram) ->
//   radix tree ranges/splits (par, per-node independent) ->
//   collapse + renumber (par + prefix sums) -> bbox refit (par, atomics).
//
// Exposed via a C ABI consumed with ctypes (tracer/accel/native.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

static inline uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

static inline uint32_t morton3(uint32_t x, uint32_t y, uint32_t z) {
  return (expand_bits(x) << 2) | (expand_bits(y) << 1) | expand_bits(z);
}

static inline int clz64(uint64_t x) {
  return x ? __builtin_clzll(x) : 64;
}

struct Builder {
  int64_t n;
  const uint64_t* keys;  // sorted (morton << 32) | rank

  inline int delta(int64_t i, int64_t j) const {
    if (j < 0 || j >= n) return -1;
    uint64_t x = keys[i] ^ keys[j];
    return x ? clz64(x) : 64;
  }
};

}  // namespace

extern "C" {

// Build an LBVH.
//  prim_lo/prim_hi: (n,3) row-major float32 AABBs
//  max_prims: leaf collapse threshold
// Outputs (caller-allocated, capacity cap = 2n):
//  node_min/node_max: (cap,3) f32; left/right/first/count: (cap,) i32
//  prim_ids: (n,) i32
// Returns M = number of nodes actually written, or -1 on error.
int64_t lbvh_build(const float* prim_lo, const float* prim_hi, int64_t n,
                   int32_t max_prims, float* node_min, float* node_max,
                   int32_t* left, int32_t* right, int32_t* first,
                   int32_t* count, int32_t* prim_ids, double* stage_ms) {
  if (n <= 0) return -1;

  // --- stage: morton ------------------------------------------------------
#ifdef _OPENMP
  double t0 = omp_get_wtime();
#endif
  float lo[3] = {1e38f, 1e38f, 1e38f}, hi[3] = {-1e38f, -1e38f, -1e38f};
#pragma omp parallel
  {
    float llo[3] = {1e38f, 1e38f, 1e38f}, lhi[3] = {-1e38f, -1e38f, -1e38f};
#pragma omp for nowait
    for (int64_t i = 0; i < n; ++i) {
      for (int k = 0; k < 3; ++k) {
        float c = 0.5f * (prim_lo[i * 3 + k] + prim_hi[i * 3 + k]);
        if (c < llo[k]) llo[k] = c;
        if (c > lhi[k]) lhi[k] = c;
      }
    }
#pragma omp critical
    for (int k = 0; k < 3; ++k) {
      if (llo[k] < lo[k]) lo[k] = llo[k];
      if (lhi[k] > hi[k]) hi[k] = lhi[k];
    }
  }
  float ext[3];
  for (int k = 0; k < 3; ++k) {
    ext[k] = hi[k] - lo[k];
    if (ext[k] < 1e-30f) ext[k] = 1e-30f;
  }
  std::vector<uint64_t> keyed(n);
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) {
    uint32_t m[3];
    for (int k = 0; k < 3; ++k) {
      float c = 0.5f * (prim_lo[i * 3 + k] + prim_hi[i * 3 + k]);
      float s = (c - lo[k]) / ext[k] * 1024.0f;
      int32_t v = (int32_t)s;
      if (v < 0) v = 0;
      if (v > 1023) v = 1023;
      m[k] = (uint32_t)v;
    }
    keyed[i] = ((uint64_t)morton3(m[0], m[1], m[2]) << 32) | (uint64_t)i;
  }
#ifdef _OPENMP
  if (stage_ms) stage_ms[0] = (omp_get_wtime() - t0) * 1e3;
  t0 = omp_get_wtime();
#endif

  // --- stage: radix sort (LSD over the 30 morton bits + 32 index bits; the
  // low 32 bits are already unique & increasing so 3 passes over bits 32..61
  // after one identity pass suffice — but do a clean 8x8-bit LSD for
  // robustness on the high 32 bits only, since low 32 start sorted).
  {
    std::vector<uint64_t> tmp(n);
    uint64_t* src = keyed.data();
    uint64_t* dst = tmp.data();
    for (int pass = 0; pass < 4; ++pass) {  // 4 x 8 bits covers bits 32..63
      int shift = 32 + pass * 8;
      int64_t hist[256] = {0};
      for (int64_t i = 0; i < n; ++i) ++hist[(src[i] >> shift) & 0xFF];
      int64_t sum = 0;
      for (int b = 0; b < 256; ++b) {
        int64_t c = hist[b];
        hist[b] = sum;
        sum += c;
      }
      for (int64_t i = 0; i < n; ++i) dst[hist[(src[i] >> shift) & 0xFF]++] = src[i];
      std::swap(src, dst);
    }
    if (src != keyed.data()) std::memcpy(keyed.data(), src, n * sizeof(uint64_t));
  }
  std::vector<int32_t> order(n);
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) order[i] = (int32_t)(keyed[i] & 0xFFFFFFFFull);
  // Re-key with rank for uniqueness in the tree build.
  std::vector<uint64_t> keys(n);
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i)
    keys[i] = (keyed[i] & 0xFFFFFFFF00000000ull) | (uint64_t)i;
#ifdef _OPENMP
  if (stage_ms) stage_ms[1] = (omp_get_wtime() - t0) * 1e3;
  t0 = omp_get_wtime();
#endif

  if (n <= max_prims) {
    // Single-leaf tree.
    float bmin[3] = {1e38f, 1e38f, 1e38f}, bmax[3] = {-1e38f, -1e38f, -1e38f};
    for (int64_t i = 0; i < n; ++i)
      for (int k = 0; k < 3; ++k) {
        if (prim_lo[i * 3 + k] < bmin[k]) bmin[k] = prim_lo[i * 3 + k];
        if (prim_hi[i * 3 + k] > bmax[k]) bmax[k] = prim_hi[i * 3 + k];
      }
    for (int k = 0; k < 3; ++k) {
      node_min[k] = bmin[k];
      node_max[k] = bmax[k];
    }
    left[0] = right[0] = -1;
    first[0] = 0;
    count[0] = (int32_t)n;
    for (int64_t i = 0; i < n; ++i) prim_ids[i] = order[i];
    return 1;
  }

  // --- stage: radix tree (Karras) ----------------------------------------
  const int64_t ni = n - 1;  // internal nodes
  Builder B{n, keys.data()};
  std::vector<int64_t> lchild(ni), rchild(ni), lo_r(ni), hi_r(ni);
  std::vector<uint8_t> lleaf(ni), rleaf(ni);
#pragma omp parallel for schedule(dynamic, 4096)
  for (int64_t i = 0; i < ni; ++i) {
    int d = (B.delta(i, i + 1) > B.delta(i, i - 1)) ? 1 : -1;
    int dmin = B.delta(i, i - d);
    int64_t lmax = 2;
    while (B.delta(i, i + lmax * d) > dmin) lmax <<= 1;
    int64_t l = 0;
    for (int64_t t = lmax >> 1; t >= 1; t >>= 1)
      if (B.delta(i, i + (l + t) * d) > dmin) l += t;
    int64_t j = i + l * d;
    int dnode = B.delta(i, j);
    int64_t s = 0;
    int64_t t = (l + 1) >> 1;
    while (true) {
      if (B.delta(i, i + (s + t) * d) > dnode) s += t;
      if (t <= 1) break;
      t = (t + 1) >> 1;
    }
    int64_t gamma = i + s * d + (d < 0 ? -1 : 0);
    int64_t a = i < j ? i : j, b = i > j ? i : j;
    lo_r[i] = a;
    hi_r[i] = b;
    lchild[i] = gamma;
    rchild[i] = gamma + 1;
    lleaf[i] = (a == gamma);
    rleaf[i] = (b == gamma + 1);
  }
#ifdef _OPENMP
  if (stage_ms) stage_ms[2] = (omp_get_wtime() - t0) * 1e3;
  t0 = omp_get_wtime();
#endif

  // --- stage: collapse ----------------------------------------------------
  std::vector<int64_t> parent(ni, -1);
#pragma omp parallel for
  for (int64_t i = 0; i < ni; ++i) {
    if (!lleaf[i]) parent[lchild[i]] = i;
    if (!rleaf[i]) parent[rchild[i]] = i;
  }
  std::vector<uint8_t> small(ni), cut(ni), keep(ni);
#pragma omp parallel for
  for (int64_t i = 0; i < ni; ++i)
    small[i] = (hi_r[i] - lo_r[i] + 1) <= max_prims;
#pragma omp parallel for
  for (int64_t i = 0; i < ni; ++i) {
    uint8_t psmall = parent[i] >= 0 ? small[parent[i]] : 0;
    cut[i] = small[i] && !psmall;
    keep[i] = !small[i];
  }
  // Prefix sums for renumbering.
  std::vector<int64_t> keep_id(ni), cut_id(ni);
  int64_t n_keep = 0, n_cut = 0;
  for (int64_t i = 0; i < ni; ++i) {
    keep_id[i] = n_keep;
    if (keep[i]) ++n_keep;
    cut_id[i] = n_cut;
    if (cut[i]) ++n_cut;
  }
  // Count single-prim leaves under kept parents; assign ids.
  std::vector<int64_t> sl_id(ni, -1), sr_id(ni, -1);
  int64_t n_single = 0;
  for (int64_t i = 0; i < ni; ++i) {
    if (keep[i] && lleaf[i]) sl_id[i] = n_single++;
  }
  for (int64_t i = 0; i < ni; ++i) {
    if (keep[i] && rleaf[i]) sr_id[i] = n_single++;
  }
  const int64_t M = n_keep + n_cut + n_single;
  const int64_t base_cut = n_keep, base_single = n_keep + n_cut;

#pragma omp parallel for
  for (int64_t i = 0; i < M; ++i) {
    left[i] = right[i] = -1;
    first[i] = count[i] = 0;
  }
#pragma omp parallel for
  for (int64_t i = 0; i < ni; ++i) {
    if (keep[i]) {
      int64_t me = keep_id[i];
      int64_t lc, rc;
      if (lleaf[i]) {
        lc = base_single + sl_id[i];
        first[lc] = (int32_t)lchild[i];
        count[lc] = 1;
      } else {
        int64_t c = lchild[i];
        lc = keep[c] ? keep_id[c] : base_cut + cut_id[c];
      }
      if (rleaf[i]) {
        rc = base_single + sr_id[i];
        first[rc] = (int32_t)rchild[i];
        count[rc] = 1;
      } else {
        int64_t c = rchild[i];
        rc = keep[c] ? keep_id[c] : base_cut + cut_id[c];
      }
      left[me] = (int32_t)lc;
      right[me] = (int32_t)rc;
    } else if (cut[i]) {
      int64_t me = base_cut + cut_id[i];
      first[me] = (int32_t)lo_r[i];
      count[me] = (int32_t)(hi_r[i] - lo_r[i] + 1);
    }
  }
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) prim_ids[i] = order[i];
#ifdef _OPENMP
  if (stage_ms) stage_ms[3] = (omp_get_wtime() - t0) * 1e3;
  t0 = omp_get_wtime();
#endif

  // --- stage: bboxes ------------------------------------------------------
  // Leaves: direct reduction over their sorted range.
#pragma omp parallel for schedule(dynamic, 1024)
  for (int64_t i = 0; i < M; ++i) {
    if (count[i] > 0) {
      float bmin[3] = {1e38f, 1e38f, 1e38f};
      float bmax[3] = {-1e38f, -1e38f, -1e38f};
      for (int32_t k = first[i]; k < first[i] + count[i]; ++k) {
        int32_t p = prim_ids[k];
        for (int c = 0; c < 3; ++c) {
          if (prim_lo[p * 3 + c] < bmin[c]) bmin[c] = prim_lo[p * 3 + c];
          if (prim_hi[p * 3 + c] > bmax[c]) bmax[c] = prim_hi[p * 3 + c];
        }
      }
      for (int c = 0; c < 3; ++c) {
        node_min[i * 3 + c] = bmin[c];
        node_max[i * 3 + c] = bmax[c];
      }
    }
  }
  // Internal: bottom-up refit with atomic arrival counters (Karras-style).
  std::vector<int32_t> new_parent(M, -1);
#pragma omp parallel for
  for (int64_t i = 0; i < n_keep; ++i) {
    new_parent[left[i]] = (int32_t)i;
    new_parent[right[i]] = (int32_t)i;
  }
  std::vector<std::atomic<int>> arrived(n_keep);
  for (int64_t i = 0; i < n_keep; ++i) arrived[i].store(0);
#pragma omp parallel for schedule(dynamic, 1024)
  for (int64_t i = n_keep; i < M; ++i) {
    int32_t node = new_parent[i];
    while (node >= 0) {
      if (arrived[node].fetch_add(1) == 0) break;  // first child: stop
      int32_t lc = left[node], rc = right[node];
      for (int c = 0; c < 3; ++c) {
        float a = node_min[lc * 3 + c], b = node_min[rc * 3 + c];
        node_min[node * 3 + c] = a < b ? a : b;
        float x = node_max[lc * 3 + c], y = node_max[rc * 3 + c];
        node_max[node * 3 + c] = x > y ? x : y;
      }
      node = new_parent[node];
    }
  }
#ifdef _OPENMP
  if (stage_ms) stage_ms[4] = (omp_get_wtime() - t0) * 1e3;
#endif
  return M;
}

}  // extern "C"
