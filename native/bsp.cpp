// Native BSP-tree builder — the compiled counterpart of
// tracer/accel/bsp.py::build, mirroring the reference's Rust builder
// (/root/reference/src/data_structures/bsp_tree.rs:45-323) semantics:
// per node, a cost loop over 3 axes x (TESTS-1) candidate planes with
// count*half-area SAH-like cost, empty-side rescue shifting the plane past
// the extreme object by size/8 (min eps 1e-6), leaf when <= max_objects or
// depth == max_depth. Objects straddling the plane go to both children.
//
// Two-phase C API (result sizes are data dependent):
//   bsp_build(...)            -> handle (>=0) building into internal store
//   bsp_counts(h, &nodes, &prims)
//   bsp_copy(h, axis, plane, left, right, first, count, prim_ids)
//   bsp_release(h)
//
// Float arithmetic follows the NumPy reference implementation: f32 boxes,
// f32 plane/area math, accumulation order left-to-right, so both builders
// produce identical trees on identical input.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

constexpr int TESTS = 4;
constexpr int NODE_LEAF = 3;
constexpr float F_EPS = 1e-6f;

struct Result {
  std::vector<int32_t> axis, left, right, first, count, prim_ids;
  std::vector<float> plane;
  float bbox_lo[3], bbox_hi[3];
};

std::unordered_map<int64_t, Result*> g_results;
std::mutex g_mu;
int64_t g_next = 1;

inline float area(const float lo[3], const float hi[3]) {
  float d0 = hi[0] - lo[0], d1 = hi[1] - lo[1], d2 = hi[2] - lo[2];
  if (d0 < 0) d0 = 0;
  if (d1 < 0) d1 = 0;
  if (d2 < 0) d2 = 0;
  return 2.0f * (d0 * d1 + d1 * d2 + d2 * d0);
}

struct Builder {
  const float* lo;  // (n, 3)
  const float* hi;
  int max_depth, max_objects;
  Result* out;

  int emit() {
    out->axis.push_back(0);
    out->plane.push_back(0.0f);
    out->left.push_back(-1);
    out->right.push_back(-1);
    out->first.push_back(0);
    out->count.push_back(0);
    return (int)out->axis.size() - 1;
  }

  int subdivide(std::vector<int32_t>& ids, float blo[3], float bhi[3],
                int depth) {
    int me = emit();
    if ((int)ids.size() <= max_objects || depth == max_depth) {
      out->axis[me] = NODE_LEAF;
      out->first[me] = (int)out->prim_ids.size();
      out->count[me] = (int)ids.size();
      out->prim_ids.insert(out->prim_ids.end(), ids.begin(), ids.end());
      return me;
    }
    // Float semantics mirror the NumPy builder exactly (so both produce
    // bit-identical trees): the candidate plane, comparisons, and child
    // box areas are all computed in float. On the NumPy side this relies
    // on NEP 50 weak promotion (NumPy >= 2.0): `(bhi-blo) * (k/TESTS)`
    // keeps float32 because the Python float is a weak scalar. Under
    // NumPy 1.x the Python side would promote to float64 and the
    // bit-identical contract (test_native_bsp_matches_numpy) can fail.
    float best_cost = std::numeric_limits<float>::infinity();
    int best_ax = 0;
    float best_center = 0.0f;
    int best_l = 0, best_r = 0;
    for (int ax = 0; ax < 3; ++ax) {
      for (int k = 1; k < TESTS; ++k) {
        float center =
            (bhi[ax] - blo[ax]) * ((float)k / TESTS) + blo[ax];
        int lcnt = 0, rcnt = 0;
        for (int32_t id : ids) {
          if (lo[3 * id + ax] <= center) ++lcnt;
          if (hi[3 * id + ax] >= center) ++rcnt;
        }
        float l_hi[3] = {bhi[0], bhi[1], bhi[2]};
        l_hi[ax] = center;
        float r_lo[3] = {blo[0], blo[1], blo[2]};
        r_lo[ax] = center;
        float cost = lcnt * area(blo, l_hi) + rcnt * area(r_lo, bhi);
        if (cost < best_cost) {
          best_cost = cost;
          best_ax = ax;
          best_center = center;
          best_l = lcnt;
          best_r = rcnt;
        }
      }
    }
    int ax = best_ax;
    float center = best_center;
    float size = bhi[ax] - blo[ax];
    float diff = size / 8.0f > F_EPS ? size / 8.0f : F_EPS;
    if (best_l == 0) {
      float mn = std::numeric_limits<float>::infinity();
      for (int32_t id : ids) mn = std::min(mn, lo[3 * id + ax]);
      center = mn - diff;
    }
    if (best_r == 0) {
      float mx = -std::numeric_limits<float>::infinity();
      for (int32_t id : ids) mx = std::max(mx, hi[3 * id + ax]);
      center = mx + diff;
    }
    std::vector<int32_t> lids, rids;
    lids.reserve(ids.size());
    rids.reserve(ids.size());
    for (int32_t id : ids) {
      if (lo[3 * id + ax] <= center) lids.push_back(id);
      if (hi[3 * id + ax] >= center) rids.push_back(id);
    }
    out->axis[me] = ax;
    out->plane[me] = center;
    ids.clear();
    ids.shrink_to_fit();
    float l_hi[3] = {bhi[0], bhi[1], bhi[2]};
    l_hi[ax] = center;
    float r_lo[3] = {blo[0], blo[1], blo[2]};
    r_lo[ax] = center;
    out->left[me] = subdivide(lids, blo, l_hi, depth + 1);
    out->right[me] = subdivide(rids, r_lo, bhi, depth + 1);
    return me;
  }
};

}  // namespace

extern "C" {

int64_t bsp_build(const float* prim_lo, const float* prim_hi, int64_t n,
                  int32_t max_depth, int32_t max_objects) {
  if (n <= 0 || max_depth <= 0 || max_depth >= 32) return -1;
  auto* res = new Result();
  float rlo[3], rhi[3];
  for (int a = 0; a < 3; ++a) {
    rlo[a] = std::numeric_limits<float>::infinity();
    rhi[a] = -std::numeric_limits<float>::infinity();
  }
  for (int64_t i = 0; i < n; ++i) {
    for (int a = 0; a < 3; ++a) {
      rlo[a] = std::min(rlo[a], prim_lo[3 * i + a]);
      rhi[a] = std::max(rhi[a], prim_hi[3 * i + a]);
    }
  }
  std::memcpy(res->bbox_lo, rlo, sizeof rlo);
  std::memcpy(res->bbox_hi, rhi, sizeof rhi);
  std::vector<int32_t> ids(n);
  for (int64_t i = 0; i < n; ++i) ids[i] = (int32_t)i;
  Builder b{prim_lo, prim_hi, max_depth, max_objects, res};
  b.subdivide(ids, rlo, rhi, 0);
  std::lock_guard<std::mutex> g(g_mu);
  int64_t h = g_next++;
  g_results[h] = res;
  return h;
}

void bsp_counts(int64_t h, int64_t* nodes, int64_t* prims) {
  std::lock_guard<std::mutex> g(g_mu);
  auto it = g_results.find(h);
  if (it == g_results.end()) {
    *nodes = -1;
    *prims = -1;
    return;
  }
  *nodes = (int64_t)it->second->axis.size();
  *prims = (int64_t)it->second->prim_ids.size();
}

void bsp_copy(int64_t h, int32_t* axis, float* plane, int32_t* left,
              int32_t* right, int32_t* first, int32_t* count,
              int32_t* prim_ids, float* bbox_lo, float* bbox_hi) {
  Result* r;
  {
    std::lock_guard<std::mutex> g(g_mu);
    auto it = g_results.find(h);
    if (it == g_results.end()) return;
    r = it->second;
  }
  std::memcpy(axis, r->axis.data(), r->axis.size() * 4);
  std::memcpy(plane, r->plane.data(), r->plane.size() * 4);
  std::memcpy(left, r->left.data(), r->left.size() * 4);
  std::memcpy(right, r->right.data(), r->right.size() * 4);
  std::memcpy(first, r->first.data(), r->first.size() * 4);
  std::memcpy(count, r->count.data(), r->count.size() * 4);
  std::memcpy(prim_ids, r->prim_ids.data(), r->prim_ids.size() * 4);
  std::memcpy(bbox_lo, r->bbox_lo, 12);
  std::memcpy(bbox_hi, r->bbox_hi, 12);
}

void bsp_release(int64_t h) {
  std::lock_guard<std::mutex> g(g_mu);
  auto it = g_results.find(h);
  if (it != g_results.end()) {
    delete it->second;
    g_results.erase(it);
  }
}

}  // extern "C"
