// Native 3-D convex hull (incremental quickhull) + mesh mass-property
// integrals for the mesh-utility apps.
//
// Mirrors the role of the reference's qhull-backed CompGeom::calc_convex_hull
// (reference src/CompGeom.cpp, used by programs/convexify.cpp) and
// CompGeom::calc_centroid_3D (programs/center.cpp) — implemented natively
// (no qhull dependency) with the classic quickhull outside-set algorithm.
//
// C ABI for ctypes (see moby_tpu/native/__init__.py).

#include <cmath>
#include <cstring>
#include <vector>
#include <array>
#include <algorithm>

namespace {

struct V3 {
  double x, y, z;
  V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator*(double s) const { return {x * s, y * s, z * s}; }
};
static inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline double dot(const V3& a, const V3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
static inline double norm(const V3& a) { return std::sqrt(dot(a, a)); }

struct Face {
  int v[3];
  V3 n;        // unit normal (outward)
  double d;    // plane offset: dot(n, p) = d
  std::vector<int> outside;
  bool alive = true;
};

struct Hull {
  const V3* pts;
  int n;
  double eps;
  std::vector<Face> faces;

  void make_face(int a, int b, int c, const V3& inside) {
    Face f;
    f.v[0] = a; f.v[1] = b; f.v[2] = c;
    V3 nn = cross(pts[b] - pts[a], pts[c] - pts[a]);
    double ln = norm(nn);
    if (ln < 1e-300) ln = 1.0;
    f.n = nn * (1.0 / ln);
    f.d = dot(f.n, pts[a]);
    if (dot(f.n, inside) - f.d > 0) {  // flip outward
      std::swap(f.v[1], f.v[2]);
      f.n = f.n * -1.0;
      f.d = -f.d;
    }
    faces.push_back(std::move(f));
  }

  double dist(const Face& f, int p) const { return dot(f.n, pts[p]) - f.d; }

  bool build() {
    if (n < 4) return false;
    // initial extremes
    int ix0 = 0, ix1 = 0;
    for (int i = 1; i < n; ++i) {
      if (pts[i].x < pts[ix0].x) ix0 = i;
      if (pts[i].x > pts[ix1].x) ix1 = i;
    }
    if (ix0 == ix1) return false;
    // furthest from the line
    int ix2 = -1; double best = eps;
    V3 d01 = pts[ix1] - pts[ix0];
    for (int i = 0; i < n; ++i) {
      double a = norm(cross(d01, pts[i] - pts[ix0]));
      if (a > best) { best = a; ix2 = i; }
    }
    if (ix2 < 0) return false;
    // furthest from the plane
    V3 nn = cross(d01, pts[ix2] - pts[ix0]);
    double ln = norm(nn);
    nn = nn * (1.0 / ln);
    int ix3 = -1; best = eps;
    for (int i = 0; i < n; ++i) {
      double a = std::fabs(dot(nn, pts[i] - pts[ix0]));
      if (a > best) { best = a; ix3 = i; }
    }
    if (ix3 < 0) return false;

    V3 centroid = (pts[ix0] + pts[ix1] + pts[ix2] + pts[ix3]) * 0.25;
    make_face(ix0, ix1, ix2, centroid);
    make_face(ix0, ix1, ix3, centroid);
    make_face(ix0, ix2, ix3, centroid);
    make_face(ix1, ix2, ix3, centroid);

    // assign outside sets
    for (int i = 0; i < n; ++i) {
      for (auto& f : faces) {
        if (dist(f, i) > eps) { f.outside.push_back(i); break; }
      }
    }

    for (size_t iter = 0; iter < size_t(16) * n + 64; ++iter) {
      // pick a live face with a non-empty outside set
      int fi = -1;
      for (size_t k = 0; k < faces.size(); ++k)
        if (faces[k].alive && !faces[k].outside.empty()) { fi = int(k); break; }
      if (fi < 0) break;  // done

      // furthest outside point
      Face& f = faces[fi];
      int p = -1; double bd = -1.0;
      for (int q : f.outside) {
        double dd = dist(f, q);
        if (dd > bd) { bd = dd; p = q; }
      }

      // visible faces
      std::vector<int> visible;
      for (size_t k = 0; k < faces.size(); ++k)
        if (faces[k].alive && dist(faces[k], p) > eps) visible.push_back(int(k));

      // horizon edges: edges of visible faces shared with <2 visible faces
      struct Edge { int a, b; };
      std::vector<Edge> horizon;
      auto edge_visible_count = [&](int a, int b) {
        int c = 0;
        for (int vi : visible) {
          const Face& g = faces[vi];
          for (int e = 0; e < 3; ++e) {
            int ea = g.v[e], eb = g.v[(e + 1) % 3];
            if ((ea == a && eb == b) || (ea == b && eb == a)) ++c;
          }
        }
        return c;
      };
      for (int vi : visible) {
        const Face& g = faces[vi];
        for (int e = 0; e < 3; ++e) {
          int a = g.v[e], b = g.v[(e + 1) % 3];
          if (edge_visible_count(a, b) == 1) horizon.push_back({a, b});
        }
      }

      // collect orphaned outside points, kill visible faces
      std::vector<int> orphans;
      for (int vi : visible) {
        for (int q : faces[vi].outside)
          if (q != p) orphans.push_back(q);
        faces[vi].alive = false;
        faces[vi].outside.clear();
      }

      // interior reference for orientation: centroid of current hull verts
      V3 inref = {0, 0, 0};
      int cnt = 0;
      for (const auto& g : faces)
        if (g.alive) {
          for (int e = 0; e < 3; ++e) { inref = inref + pts[g.v[e]]; ++cnt; }
        }
      if (cnt) inref = inref * (1.0 / cnt);

      size_t first_new = faces.size();
      for (const auto& e : horizon) make_face(e.a, e.b, p, inref);

      // redistribute orphans
      std::sort(orphans.begin(), orphans.end());
      orphans.erase(std::unique(orphans.begin(), orphans.end()), orphans.end());
      for (int q : orphans) {
        for (size_t k = first_new; k < faces.size(); ++k) {
          if (faces[k].alive && dist(faces[k], q) > eps) {
            faces[k].outside.push_back(q);
            break;
          }
        }
      }
    }
    return true;
  }
};

}  // namespace

extern "C" {

// Convex hull of n points (pts: n*3 doubles, xyz interleaved).
// Outputs triangle faces as indices into the ORIGINAL point array.
// Returns the number of faces written (<= max_faces), 0 on degenerate
// input, -1 when max_faces is too small.
int moby_convex_hull(const double* pts_in, int n, int* out_faces,
                     int max_faces) {
  if (n < 4) return 0;
  std::vector<V3> pts(n);
  double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
  for (int i = 0; i < n; ++i) {
    pts[i] = {pts_in[3 * i], pts_in[3 * i + 1], pts_in[3 * i + 2]};
    const double* p = pts_in + 3 * i;
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], p[k]);
      hi[k] = std::max(hi[k], p[k]);
    }
  }
  double diag = std::sqrt((hi[0] - lo[0]) * (hi[0] - lo[0]) +
                          (hi[1] - lo[1]) * (hi[1] - lo[1]) +
                          (hi[2] - lo[2]) * (hi[2] - lo[2]));
  Hull h{pts.data(), n, std::max(1e-12, 1e-10 * diag), {}};
  if (!h.build()) return 0;

  int nf = 0;
  for (const auto& f : h.faces) {
    if (!f.alive) continue;
    if (nf >= max_faces) return -1;
    out_faces[3 * nf] = f.v[0];
    out_faces[3 * nf + 1] = f.v[1];
    out_faces[3 * nf + 2] = f.v[2];
    ++nf;
  }
  return nf;
}

// Volume-weighted center of mass of a closed triangle mesh via signed
// tetrahedra (divergence theorem); falls back to the area centroid when the
// volume is ~0 (open/flat meshes). out: com[3]; returns signed volume.
double moby_mesh_com(const double* verts, int nv, const int* tris, int nt,
                     double* com) {
  (void)nv;
  double vol = 0.0;
  double cx = 0, cy = 0, cz = 0;
  double area = 0.0, ax = 0, ay = 0, az = 0;
  for (int t = 0; t < nt; ++t) {
    const double* a = verts + 3 * tris[3 * t];
    const double* b = verts + 3 * tris[3 * t + 1];
    const double* c = verts + 3 * tris[3 * t + 2];
    V3 A{a[0], a[1], a[2]}, B{b[0], b[1], b[2]}, C{c[0], c[1], c[2]};
    double v6 = dot(A, cross(B, C));  // 6x signed tet volume
    vol += v6;
    cx += v6 * (A.x + B.x + C.x);
    cy += v6 * (A.y + B.y + C.y);
    cz += v6 * (A.z + B.z + C.z);
    double ar = 0.5 * norm(cross(B - A, C - A));
    area += ar;
    ax += ar * (A.x + B.x + C.x) / 3.0;
    ay += ar * (A.y + B.y + C.y) / 3.0;
    az += ar * (A.z + B.z + C.z) / 3.0;
  }
  if (std::fabs(vol) > 1e-12) {
    // tet centroid = (0 + A + B + C)/4; weight v6/6 -> com = sum/(4*vol)
    com[0] = cx / (4.0 * vol);
    com[1] = cy / (4.0 * vol);
    com[2] = cz / (4.0 * vol);
  } else if (area > 1e-300) {
    com[0] = ax / area;
    com[1] = ay / area;
    com[2] = az / area;
  } else {
    com[0] = com[1] = com[2] = 0.0;
  }
  return vol / 6.0;
}

}  // extern "C"
