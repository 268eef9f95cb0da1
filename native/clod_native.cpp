// Native core of the cluster-LOD builder: quadric edge-collapse
// simplification and Morton-order meshlet partitioning.
//
// TPU-native rebuild of the reference's offline geometry pipeline
// (reference: BasicRenderer/src/Mesh/ClusterLODUtilities.cpp — meshlet
// build via meshoptimizer, iterative simplify-merge with quadric error
// metrics, BuildClusterLODArtifactsFromGeometry :5325). This is a compact
// reimplementation of the same algorithms, exposed over a C ABI consumed
// via ctypes (models/clusters.py).
//
// Build: g++ -O2 -shared -fPIC -o libclod.so clod_native.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Quadric {
  // Symmetric 4x4 error quadric, upper triangle + d terms. `wsum` tracks
  // the accumulated plane weight so eval() can be normalized to an RMS
  // point-to-plane DISTANCE (a length): raw quadric cost is sum of
  // w * dist^2 with w = face area, so sqrt(cost) scales with the sqrt of
  // the accumulated area — it GROWS as collapses merge quadrics even when
  // the geometric deviation doesn't, which inflated deep-LOD errors ~40x
  // and pinned the runtime cut at fine levels. The runtime projects
  // object-space LENGTHS to screen pixels (ops/clod.py
  // _screen_error_factor), so the normalized metric is the correct one.
  double a00 = 0, a01 = 0, a02 = 0, a03 = 0;
  double a11 = 0, a12 = 0, a13 = 0;
  double a22 = 0, a23 = 0;
  double a33 = 0;
  double wsum = 0;
  void add_plane(double nx, double ny, double nz, double d, double w) {
    a00 += w * nx * nx; a01 += w * nx * ny; a02 += w * nx * nz; a03 += w * nx * d;
    a11 += w * ny * ny; a12 += w * ny * nz; a13 += w * ny * d;
    a22 += w * nz * nz; a23 += w * nz * d;
    a33 += w * d * d;
    wsum += w;
  }
  void add(const Quadric& q) {
    a00 += q.a00; a01 += q.a01; a02 += q.a02; a03 += q.a03;
    a11 += q.a11; a12 += q.a12; a13 += q.a13;
    a22 += q.a22; a23 += q.a23; a33 += q.a33;
    wsum += q.wsum;
  }
  double eval(double x, double y, double z) const {
    return a00 * x * x + 2 * a01 * x * y + 2 * a02 * x * z + 2 * a03 * x
         + a11 * y * y + 2 * a12 * y * z + 2 * a13 * y
         + a22 * z * z + 2 * a23 * z + a33;
  }
  // RMS point-to-plane distance of x against the accumulated planes.
  double rms(double x, double y, double z) const {
    return std::sqrt(std::max(0.0, eval(x, y, z)) / std::max(wsum, 1e-30));
  }
  // Optimal collapse position: minimize the quadratic form (solve the
  // 3x3 normal system by Cramer's rule). Returns false when the system
  // is near-singular (flat/colinear neighborhoods) — caller falls back
  // to midpoint-or-endpoint. (Garland-Heckbert optimal placement; the
  // round-2 midpoint variant cost ~2-4x in per-collapse error.)
  bool optimal(double* ox, double* oy, double* oz) const {
    double det = a00 * (a11 * a22 - a12 * a12)
               - a01 * (a01 * a22 - a12 * a02)
               + a02 * (a01 * a12 - a11 * a02);
    double scale = std::max({std::fabs(a00), std::fabs(a11), std::fabs(a22),
                             1e-30});
    if (std::fabs(det) < 1e-10 * scale * scale * scale) return false;
    double bx = -a03, by = -a13, bz = -a23;
    *ox = (bx * (a11 * a22 - a12 * a12)
         - a01 * (by * a22 - a12 * bz)
         + a02 * (by * a12 - a11 * bz)) / det;
    *oy = (a00 * (by * a22 - a12 * bz)
         - bx * (a01 * a22 - a12 * a02)
         + a02 * (a01 * bz - by * a02)) / det;
    *oz = (a00 * (a11 * bz - by * a12)
         - a01 * (a01 * bz - by * a02)
         + bx * (a01 * a12 - a11 * a02)) / det;
    return true;
  }
};

struct Edge {
  int v0, v1;
  double cost;
  uint64_t stamp;  // validity stamp (lazy deletion)
  bool operator<(const Edge& o) const { return cost > o.cost; }  // min-heap
};

inline uint64_t ekey(int a, int b) {
  if (a > b) std::swap(a, b);
  return (uint64_t(a) << 32) | uint64_t(b);
}

uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

}  // namespace

extern "C" {

// Quadric edge-collapse simplification.
//  positions: (nv, 3) float32; indices: (nt, 3) int32
//  locked: (nv,) uint8 — vertices that must not move (cluster-group
//  boundaries, the key CLod constraint so neighboring groups stay sealed)
//  target_tris: stop when at/below this count
//  out_positions/out_indices: caller-allocated, same capacity as inputs
//  out_src: (nv,) int32 — provenance: for each OUTPUT vertex, the INPUT
//  vertex id it descended from (collapses keep the surviving endpoint's
//  id), so the caller can carry attributes (UVs, normals) through LOD
//  levels (reference: attribute-preserving simplify,
//  ClusterLODUtilities.cpp meshopt_simplifyWithAttributes call sites).
//  out_counts: int32[2] = {result_nv, result_nt}
//  returns max collapse error as an RMS point-to-plane DISTANCE (object-
//  space length — the unit ops/clod.py projects to screen pixels)
float simplify_qem(const float* positions, int nv, const int* indices, int nt,
                   const uint8_t* locked, int target_tris,
                   float* out_positions, int* out_indices, int* out_src,
                   int* out_counts) {
  std::vector<double> px(nv), py(nv), pz(nv);
  for (int i = 0; i < nv; i++) {
    px[i] = positions[i * 3 + 0];
    py[i] = positions[i * 3 + 1];
    pz[i] = positions[i * 3 + 2];
  }
  std::vector<Quadric> q(nv);
  std::vector<std::vector<int>> vtris(nv);
  std::vector<int> tri(indices, indices + size_t(nt) * 3);
  std::vector<uint8_t> tri_dead(nt, 0);

  // Face quadrics (+ boundary edge constraint planes).
  std::unordered_map<uint64_t, int> edge_count;
  for (int t = 0; t < nt; t++) {
    int a = tri[t * 3], b = tri[t * 3 + 1], c = tri[t * 3 + 2];
    if (a == b || b == c || a == c) { tri_dead[t] = 1; continue; }
    double ux = px[b] - px[a], uy = py[b] - py[a], uz = pz[b] - pz[a];
    double vx = px[c] - px[a], vy = py[c] - py[a], vz = pz[c] - pz[a];
    double nx = uy * vz - uz * vy, ny = uz * vx - ux * vz, nz = ux * vy - uy * vx;
    double len = std::sqrt(nx * nx + ny * ny + nz * nz);
    if (len < 1e-20) { tri_dead[t] = 1; continue; }
    double area = 0.5 * len;
    nx /= len; ny /= len; nz /= len;
    double d = -(nx * px[a] + ny * py[a] + nz * pz[a]);
    Quadric fq;
    fq.add_plane(nx, ny, nz, d, area);
    q[a].add(fq); q[b].add(fq); q[c].add(fq);
    vtris[a].push_back(t); vtris[b].push_back(t); vtris[c].push_back(t);
    edge_count[ekey(a, b)]++; edge_count[ekey(b, c)]++; edge_count[ekey(a, c)]++;
  }
  // Open-boundary constraint quadrics (perpendicular planes, high weight).
  for (int t = 0; t < nt; t++) {
    if (tri_dead[t]) continue;
    int vs[3] = {tri[t * 3], tri[t * 3 + 1], tri[t * 3 + 2]};
    for (int e = 0; e < 3; e++) {
      int a = vs[e], b = vs[(e + 1) % 3], c = vs[(e + 2) % 3];
      if (edge_count[ekey(a, b)] != 1) continue;
      double exv[3] = {px[b] - px[a], py[b] - py[a], pz[b] - pz[a]};
      double to_c[3] = {px[c] - px[a], py[c] - py[a], pz[c] - pz[a]};
      // Normal of the constraint plane: component of to_c perpendicular to e.
      double el2 = exv[0] * exv[0] + exv[1] * exv[1] + exv[2] * exv[2] + 1e-30;
      double proj = (to_c[0] * exv[0] + to_c[1] * exv[1] + to_c[2] * exv[2]) / el2;
      double nx = to_c[0] - proj * exv[0], ny = to_c[1] - proj * exv[1],
             nz = to_c[2] - proj * exv[2];
      double len = std::sqrt(nx * nx + ny * ny + nz * nz);
      if (len < 1e-20) continue;
      nx /= len; ny /= len; nz /= len;
      double d = -(nx * px[a] + ny * py[a] + nz * pz[a]);
      Quadric bq;
      bq.add_plane(nx, ny, nz, d, 4.0 * std::sqrt(el2));
      q[a].add(bq); q[b].add(bq);
    }
  }

  // Edge heap.
  std::vector<uint64_t> vstamp(nv, 0);
  std::priority_queue<Edge> heap;
  std::unordered_set<uint64_t> edges;
  // Shared candidate-position pick: locked endpoint wins; else the
  // quadric-optimal point (guarded to stay within ~the edge's own span —
  // near-singular systems can shoot the solution far off), else best of
  // midpoint/endpoints.
  auto place = [&](const Quadric& sum, int a, int b,
                   double* cx, double* cy, double* cz) {
    if (locked[a]) { *cx = px[a]; *cy = py[a]; *cz = pz[a]; return; }
    if (locked[b]) { *cx = px[b]; *cy = py[b]; *cz = pz[b]; return; }
    double mx = 0.5 * (px[a] + px[b]), my = 0.5 * (py[a] + py[b]),
           mz = 0.5 * (pz[a] + pz[b]);
    double dx = px[b] - px[a], dy = py[b] - py[a], dz = pz[b] - pz[a];
    double el2 = dx * dx + dy * dy + dz * dz;
    double ox, oy, oz;
    if (sum.optimal(&ox, &oy, &oz)) {
      double gx = ox - mx, gy = oy - my, gz = oz - mz;
      if (gx * gx + gy * gy + gz * gz <= 4.0 * el2 + 1e-12) {
        *cx = ox; *cy = oy; *cz = oz; return;
      }
    }
    double em = sum.eval(mx, my, mz), ea = sum.eval(px[a], py[a], pz[a]),
           eb = sum.eval(px[b], py[b], pz[b]);
    if (em <= ea && em <= eb) { *cx = mx; *cy = my; *cz = mz; }
    else if (ea <= eb) { *cx = px[a]; *cy = py[a]; *cz = pz[a]; }
    else { *cx = px[b]; *cy = py[b]; *cz = pz[b]; }
  };
  auto push_edge = [&](int a, int b) {
    if (locked[a] && locked[b]) return;
    Quadric sum = q[a];
    sum.add(q[b]);
    double cx, cy, cz;
    place(sum, a, b, &cx, &cy, &cz);
    double cost = std::max(0.0, sum.eval(cx, cy, cz));
    heap.push({a, b, cost, vstamp[a] + vstamp[b]});
  };
  for (int t = 0; t < nt; t++) {
    if (tri_dead[t]) continue;
    int a = tri[t * 3], b = tri[t * 3 + 1], c = tri[t * 3 + 2];
    for (auto [x, y] : {std::pair{a, b}, {b, c}, {a, c}}) {
      uint64_t k = ekey(x, y);
      if (edges.insert(k).second) push_edge(x, y);
    }
  }

  std::vector<int> remap(nv);
  for (int i = 0; i < nv; i++) remap[i] = i;
  auto find = [&](int v) {
    while (remap[v] != v) { remap[v] = remap[remap[v]]; v = remap[v]; }
    return v;
  };

  int live_tris = 0;
  for (int t = 0; t < nt; t++) live_tris += !tri_dead[t];
  double max_err = 0.0;

  while (live_tris > target_tris && !heap.empty()) {
    Edge e = heap.top();
    heap.pop();
    int a = find(e.v0), b = find(e.v1);
    if (a == b) continue;
    if (vstamp[e.v0] + vstamp[e.v1] != e.stamp) continue;  // stale
    if (locked[a] && locked[b]) continue;
    // Collapse b into a (a keeps/receives position).
    int keep = a, gone = b;
    if (locked[b]) { keep = b; gone = a; }
    Quadric sum = q[keep];
    sum.add(q[gone]);
    double cx, cy, cz;
    place(sum, keep, gone, &cx, &cy, &cz);
    max_err = std::max(max_err, sum.rms(cx, cy, cz));
    px[keep] = cx; py[keep] = cy; pz[keep] = cz;
    q[keep] = sum;
    remap[gone] = keep;
    vstamp[keep]++;
    vstamp[gone]++;
    // Rewrite/remove triangles touching `gone`.
    for (int t : vtris[gone]) {
      if (tri_dead[t]) continue;
      int* tv = &tri[t * 3];
      int r0 = find(tv[0]), r1 = find(tv[1]), r2 = find(tv[2]);
      if (r0 == r1 || r1 == r2 || r0 == r2) {
        tri_dead[t] = 1;
        live_tris--;
      } else {
        vtris[keep].push_back(t);
      }
    }
    // Refresh edges around `keep`.
    std::unordered_set<int> nbrs;
    for (int t : vtris[keep]) {
      if (tri_dead[t]) continue;
      for (int e2 = 0; e2 < 3; e2++) {
        int v = find(tri[t * 3 + e2]);
        if (v != keep) nbrs.insert(v);
      }
    }
    for (int v : nbrs) push_edge(keep, v);
  }

  // Compact output.
  std::vector<int> vmap(nv, -1);
  int out_nv = 0, out_nt = 0;
  for (int t = 0; t < nt; t++) {
    if (tri_dead[t]) continue;
    int r[3] = {find(tri[t * 3]), find(tri[t * 3 + 1]), find(tri[t * 3 + 2])};
    if (r[0] == r[1] || r[1] == r[2] || r[0] == r[2]) continue;
    for (int k = 0; k < 3; k++) {
      if (vmap[r[k]] < 0) {
        vmap[r[k]] = out_nv;
        out_positions[out_nv * 3 + 0] = float(px[r[k]]);
        out_positions[out_nv * 3 + 1] = float(py[r[k]]);
        out_positions[out_nv * 3 + 2] = float(pz[r[k]]);
        out_src[out_nv] = r[k];
        out_nv++;
      }
      out_indices[out_nt * 3 + k] = vmap[r[k]];
    }
    out_nt++;
  }
  out_counts[0] = out_nv;
  out_counts[1] = out_nt;
  return float(max_err);  // already an RMS distance (Quadric::rms)
}

// Morton-order meshlet partition: assigns each triangle a cluster id such
// that clusters hold <= max_tris spatially-coherent triangles.
// centroids: (nt, 3) float32; out_cluster: (nt,) int32. Returns cluster count.
int partition_meshlets(const float* centroids, int nt, int max_tris,
                       int* out_cluster) {
  if (nt == 0) return 0;
  float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
  for (int i = 0; i < nt; i++)
    for (int k = 0; k < 3; k++) {
      mn[k] = std::min(mn[k], centroids[i * 3 + k]);
      mx[k] = std::max(mx[k], centroids[i * 3 + k]);
    }
  std::vector<std::pair<uint64_t, int>> order(nt);
  for (int i = 0; i < nt; i++) {
    uint32_t c[3];
    for (int k = 0; k < 3; k++) {
      float ext = std::max(mx[k] - mn[k], 1e-20f);
      float t = (centroids[i * 3 + k] - mn[k]) / ext;
      c[k] = uint32_t(std::min(1023.0f, t * 1023.0f));
    }
    uint64_t code = (uint64_t(expand_bits(c[0])) << 2)
                  | (uint64_t(expand_bits(c[1])) << 1)
                  | uint64_t(expand_bits(c[2]));
    order[i] = {code, i};
  }
  std::sort(order.begin(), order.end());
  int nclusters = (nt + max_tris - 1) / max_tris;
  for (int i = 0; i < nt; i++)
    out_cluster[order[i].second] = std::min(i / max_tris, nclusters - 1);
  return nclusters;
}

}  // extern "C"
