// Native mesh topology & geometry kernels.
//
// The host-side analogue of what the reference delegates to PETSc's C
// layer (DMPlex FV geometry: DMPlexComputeCellGeometryFVM, face
// extraction/orientation, mesh.F90:340+, dm_utils.F90): cell
// centroids/volumes, polygon face geometry, lexicographic face-key
// sorting for shared-face dedup, reverse Cuthill-McKee ordering and a
// greedy graph partitioner. Exposed with a C ABI and driven from
// Python via ctypes (waiwera_tpu.native); the numpy implementations in
// mesh/core.py remain as the portable fallback and as the reference
// for the unit tests.
//
// All kernels are deterministic and bit-compatible with the numpy
// path up to floating-point reassociation (we keep the same operation
// order as the numpy code so results match exactly on IEEE doubles).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <numeric>
#include <vector>
#include <queue>

extern "C" {

// ---------------------------------------------------------------------
// 3-D cell geometry: tet-fan decomposition around the vertex mean,
// matching mesh/core.py build_mesh (dim==3 branch).
//
// conn: [nc, kv] vertex ids; verts: [nv, 3] doubles.
// templates: flattened face templates with sizes (e.g. hexahedron:
// sizes = {4,4,4,4,4,4}, flat = {0,3,2,1, 4,5,6,7, ...}).
// out: centroid [nc, 3], volume [nc].
void ww_cell_geom_3d(int64_t nc, int64_t kv, const int64_t* conn,
                     const double* verts, int64_t ntmpl,
                     const int64_t* tmpl_sizes, const int64_t* tmpl_flat,
                     double* centroid, double* volume) {
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < nc; ++c) {
    const int64_t* cv = conn + c * kv;
    double vmean[3] = {0, 0, 0};
    for (int64_t i = 0; i < kv; ++i) {
      const double* p = verts + cv[i] * 3;
      vmean[0] += p[0]; vmean[1] += p[1]; vmean[2] += p[2];
    }
    vmean[0] /= kv; vmean[1] /= kv; vmean[2] /= kv;

    double vol = 0.0, cent[3] = {0, 0, 0};
    const int64_t* t = tmpl_flat;
    for (int64_t f = 0; f < ntmpl; ++f) {
      int64_t k = tmpl_sizes[f];
      double fmean[3] = {0, 0, 0};
      for (int64_t i = 0; i < k; ++i) {
        const double* p = verts + cv[t[i]] * 3;
        fmean[0] += p[0]; fmean[1] += p[1]; fmean[2] += p[2];
      }
      fmean[0] /= k; fmean[1] /= k; fmean[2] /= k;
      for (int64_t i = 0; i < k; ++i) {
        const double* a = verts + cv[t[i]] * 3;
        const double* b = verts + cv[t[(i + 1) % k]] * 3;
        double d1[3] = {fmean[0] - vmean[0], fmean[1] - vmean[1],
                        fmean[2] - vmean[2]};
        double d2[3] = {a[0] - vmean[0], a[1] - vmean[1], a[2] - vmean[2]};
        double d3[3] = {b[0] - vmean[0], b[1] - vmean[1], b[2] - vmean[2]};
        double cx = d2[1] * d3[2] - d2[2] * d3[1];
        double cy = d2[2] * d3[0] - d2[0] * d3[2];
        double cz = d2[0] * d3[1] - d2[1] * d3[0];
        double tv = (d1[0] * cx + d1[1] * cy + d1[2] * cz) / 6.0;
        vol += tv;
        for (int d = 0; d < 3; ++d) {
          double tc = (vmean[d] + fmean[d] + a[d] + b[d]) / 4.0;
          cent[d] += tv * tc;
        }
      }
      t += k;
    }
    double safe = (vol != 0.0) ? vol : 1.0;
    centroid[c * 3 + 0] = cent[0] / safe;
    centroid[c * 3 + 1] = cent[1] / safe;
    centroid[c * 3 + 2] = cent[2] / safe;
    volume[c] = std::fabs(vol);
  }
}

// 2-D cell geometry: shoelace fan around the vertex mean (signed
// weights for the centroid), matching mesh/core.py dim==2 branch.
// verts: [nv, 2] doubles. out centroid is [nc, 3] (z = 0).
void ww_cell_geom_2d(int64_t nc, int64_t kv, const int64_t* conn,
                     const double* verts, double* centroid,
                     double* volume) {
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < nc; ++c) {
    const int64_t* cv = conn + c * kv;
    double mx = 0, my = 0;
    for (int64_t i = 0; i < kv; ++i) {
      mx += verts[cv[i] * 2];
      my += verts[cv[i] * 2 + 1];
    }
    mx /= kv; my /= kv;
    double area = 0, cx = 0, cy = 0;
    for (int64_t i = 0; i < kv; ++i) {
      const double* a = verts + cv[i] * 2;
      const double* b = verts + cv[(i + 1) % kv] * 2;
      double ax = a[0] - mx, ay = a[1] - my;
      double bx = b[0] - mx, by = b[1] - my;
      double tri = 0.5 * (ax * by - ay * bx);
      area += tri;
      cx += tri * (a[0] + b[0] + mx) / 3.0;
      cy += tri * (a[1] + b[1] + my) / 3.0;
    }
    double safe = (area != 0.0) ? area : 1.0;
    centroid[c * 3 + 0] = cx / safe;
    centroid[c * 3 + 1] = cy / safe;
    centroid[c * 3 + 2] = 0.0;
    volume[c] = std::fabs(area);
  }
}

// Polygon face geometry: fan triangulation around the vertex mean
// with |area|-weighted centroid, matching _polygon_geometry.
// fv: [n, kmax] vertex ids with -1 padding at the FRONT;
// verts: [nv, 3]. out: area_normal [n, 3], centroid [n, 3].
void ww_polygon_geom(int64_t n, int64_t kmax, const int64_t* fv,
                     const double* verts, double* area_normal,
                     double* centroid) {
#pragma omp parallel for schedule(static)
  for (int64_t f = 0; f < n; ++f) {
    const int64_t* row = fv + f * kmax;
    int64_t start = 0;
    while (start < kmax && row[start] < 0) ++start;
    int64_t k = kmax - start;
    const int64_t* v = row + start;
    double mean[3] = {0, 0, 0};
    for (int64_t i = 0; i < k; ++i) {
      const double* p = verts + v[i] * 3;
      mean[0] += p[0]; mean[1] += p[1]; mean[2] += p[2];
    }
    mean[0] /= k; mean[1] /= k; mean[2] /= k;
    double an[3] = {0, 0, 0}, cen[3] = {0, 0, 0}, total = 0;
    for (int64_t i = 0; i < k; ++i) {
      const double* a = verts + v[i] * 3;
      const double* b = verts + v[(i + 1) % k] * 3;
      double ax = a[0] - mean[0], ay = a[1] - mean[1], az = a[2] - mean[2];
      double bx = b[0] - mean[0], by = b[1] - mean[1], bz = b[2] - mean[2];
      double nx = 0.5 * (ay * bz - az * by);
      double ny = 0.5 * (az * bx - ax * bz);
      double nz = 0.5 * (ax * by - ay * bx);
      double ta = std::sqrt(nx * nx + ny * ny + nz * nz);
      an[0] += nx; an[1] += ny; an[2] += nz;
      for (int d = 0; d < 3; ++d)
        cen[d] += ta * (a[d] + b[d] + mean[d]) / 3.0;
      total += ta;
    }
    if (total <= 0) total = 1.0;
    for (int d = 0; d < 3; ++d) {
      area_normal[f * 3 + d] = an[d];
      centroid[f * 3 + d] = cen[d] / total;
    }
  }
}

// Lexicographic argsort of integer key rows [n, k] (face-key dedup;
// replaces np.lexsort on wide keys). Stable.
void ww_sort_rows(int64_t n, int64_t k, const int64_t* keys,
                  int64_t* order) {
  std::iota(order, order + n, int64_t(0));
  std::stable_sort(order, order + n, [&](int64_t a, int64_t b) {
    const int64_t* ra = keys + a * k;
    const int64_t* rb = keys + b * k;
    for (int64_t i = 0; i < k; ++i) {
      if (ra[i] != rb[i]) return ra[i] < rb[i];
    }
    return false;
  });
}

// Reverse Cuthill-McKee ordering of an undirected CSR graph
// (bandwidth reduction: improves SpMV gather locality on
// unstructured meshes). perm[i] = old index of new position i.
void ww_rcm(int64_t n, const int64_t* indptr, const int64_t* indices,
            int64_t* perm) {
  std::vector<int64_t> deg(n);
  for (int64_t i = 0; i < n; ++i) deg[i] = indptr[i + 1] - indptr[i];
  std::vector<char> seen(n, 0);
  std::vector<int64_t> out;
  out.reserve(n);
  std::vector<int64_t> nbrs;
  for (;;) {
    // lowest-degree unseen vertex as the next component's seed
    int64_t seed = -1, best = INT64_MAX;
    for (int64_t i = 0; i < n; ++i)
      if (!seen[i] && deg[i] < best) { best = deg[i]; seed = i; }
    if (seed < 0) break;
    seen[seed] = 1;
    std::queue<int64_t> q;
    q.push(seed);
    while (!q.empty()) {
      int64_t u = q.front(); q.pop();
      out.push_back(u);
      nbrs.clear();
      for (int64_t p = indptr[u]; p < indptr[u + 1]; ++p) {
        int64_t v = indices[p];
        if (!seen[v]) { seen[v] = 1; nbrs.push_back(v); }
      }
      std::sort(nbrs.begin(), nbrs.end(), [&](int64_t a, int64_t b) {
        return deg[a] < deg[b] || (deg[a] == deg[b] && a < b);
      });
      for (int64_t v : nbrs) q.push(v);
    }
  }
  // reverse
  for (int64_t i = 0; i < n; ++i) perm[i] = out[n - 1 - i];
}

// Greedy graph-growing partitioner: grow nparts parts by BFS from
// spread seeds, bounded at ceil(n/nparts) cells each, then one
// boundary-refinement sweep moving cells to the neighbouring part
// with the largest edge-cut gain (respecting balance). An in-tree
// alternative to RCB (parallel/partition.py) that tracks the actual
// connectivity graph, like the reference's parmetis/chaco options
// (mesh.F90:946-947).
void ww_partition_graph(int64_t n, const int64_t* indptr,
                        const int64_t* indices, int64_t nparts,
                        int64_t* part) {
  const int64_t cap = (n + nparts - 1) / nparts;
  std::fill(part, part + n, int64_t(-1));
  std::vector<int64_t> size(nparts, 0);
  std::vector<int64_t> deg(n);
  for (int64_t i = 0; i < n; ++i) deg[i] = indptr[i + 1] - indptr[i];

  int64_t next_seed = 0;
  for (int64_t p = 0; p < nparts; ++p) {
    // skip the assigned prefix so each seed search starts at the
    // first unassigned vertex rather than rescanning from 0
    while (next_seed < n && part[next_seed] >= 0) ++next_seed;
    // seed: unassigned vertex of minimum degree (peripheral-ish)
    int64_t seed = -1, best = INT64_MAX;
    for (int64_t i = next_seed; i < n; ++i)
      if (part[i] < 0 && deg[i] < best) { best = deg[i]; seed = i; }
    if (seed < 0) break;
    std::queue<int64_t> q;
    q.push(seed);
    part[seed] = p;
    ++size[p];
    while (!q.empty() && size[p] < cap) {
      int64_t u = q.front(); q.pop();
      for (int64_t e = indptr[u]; e < indptr[u + 1] && size[p] < cap;
           ++e) {
        int64_t v = indices[e];
        if (part[v] < 0) { part[v] = p; ++size[p]; q.push(v); }
      }
    }
  }
  // sweep leftovers (disconnected remainders) onto the smallest part
  for (int64_t i = 0; i < n; ++i) {
    if (part[i] < 0) {
      int64_t p = int64_t(
          std::min_element(size.begin(), size.end()) - size.begin());
      part[i] = p;
      ++size[p];
    }
  }
  // one refinement sweep: move boundary cells to reduce edge cut
  for (int64_t u = 0; u < n; ++u) {
    int64_t pu = part[u];
    if (size[pu] <= 1) continue;
    // count neighbour parts
    int64_t best_p = pu, best_gain = 0;
    for (int64_t e = indptr[u]; e < indptr[u + 1]; ++e) {
      int64_t pv = part[indices[e]];
      if (pv == pu) continue;
      if (size[pv] >= cap) continue;
      int64_t gain = 0;
      for (int64_t e2 = indptr[u]; e2 < indptr[u + 1]; ++e2) {
        int64_t pw = part[indices[e2]];
        if (pw == pv) ++gain;
        else if (pw == pu) --gain;
      }
      if (gain > best_gain) { best_gain = gain; best_p = pv; }
    }
    if (best_p != pu) {
      --size[pu];
      ++size[best_p];
      part[u] = best_p;
    }
  }
}

}  // extern "C"
