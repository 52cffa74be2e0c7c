"""Computational-geometry toolkit: the 2D subset of the reference's
`CompGeom` (src/CompGeom.cpp — qhull-backed 2D/3D hulls, polygon ops,
triangulation).

3D convex hulls are the native quickhull (`moby_tpu.native.convex_hull`,
replacing the reference's qhull dependency); this module adds the 2D pieces:
convex hull (Andrew's monotone chain), polygon area/centroid/ccw, point-in-
polygon, segment intersection, and ear-clipping triangulation for simple
polygons. All build-time numpy (scene-construction helpers, like the
reference's use sites).
"""

from __future__ import annotations

import numpy as np


def ccw(a, b, c) -> float:
    """Twice the signed area of triangle (a, b, c); > 0 for a left turn
    (CompGeom::area / ccw tests)."""
    return float(
        (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    )


def convex_hull_2d(points) -> np.ndarray:
    """Indices of the convex hull of 2D points, CCW order starting from the
    lexicographic minimum (CompGeom::calc_convex_hull 2D)."""
    pts = np.asarray(points, np.float64)
    n = len(pts)
    if n < 3:
        return np.arange(n)
    order = np.lexsort((pts[:, 1], pts[:, 0]))

    def half(idx_iter):
        out = []
        for i in idx_iter:
            while len(out) >= 2 and ccw(pts[out[-2]], pts[out[-1]], pts[i]) <= 0:
                out.pop()
            out.append(i)
        return out

    lower = half(order)
    upper = half(order[::-1])
    return np.array(lower[:-1] + upper[:-1], np.int64)


def polygon_area(poly) -> float:
    """Signed area (shoelace); positive for CCW (CompGeom::area)."""
    p = np.asarray(poly, np.float64)
    x, y = p[:, 0], p[:, 1]
    return 0.5 * float(
        np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    )


def polygon_centroid(poly) -> np.ndarray:
    p = np.asarray(poly, np.float64)
    x, y = p[:, 0], p[:, 1]
    cr = x * np.roll(y, -1) - np.roll(x, -1) * y
    a = 0.5 * np.sum(cr)
    cx = np.sum((x + np.roll(x, -1)) * cr) / (6 * a)
    cy = np.sum((y + np.roll(y, -1)) * cr) / (6 * a)
    return np.array([cx, cy])


def point_in_polygon(q, poly) -> bool:
    """Crossing-number test (CompGeom::polygon_location)."""
    p = np.asarray(poly, np.float64)
    x, y = float(q[0]), float(q[1])
    inside = False
    j = len(p) - 1
    for i in range(len(p)):
        xi, yi = p[i]
        xj, yj = p[j]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return inside


def seg_seg_intersect_2d(a1, a2, b1, b2):
    """Proper segment-segment intersection point, or None
    (CompGeom::intersect_segs)."""
    a1 = np.asarray(a1, np.float64)
    a2 = np.asarray(a2, np.float64)
    b1 = np.asarray(b1, np.float64)
    b2 = np.asarray(b2, np.float64)
    r = a2 - a1
    s = b2 - b1
    denom = r[0] * s[1] - r[1] * s[0]
    if abs(denom) < 1e-300:
        return None
    q = b1 - a1
    t = (q[0] * s[1] - q[1] * s[0]) / denom
    u = (q[0] * r[1] - q[1] * r[0]) / denom
    if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
        return a1 + t * r
    return None


def triangulate_polygon(poly) -> np.ndarray:
    """Ear-clipping triangulation of a simple polygon (any winding).
    Returns (N-2, 3) index triangles (CompGeom::triangulate_polygon_2D).
    """
    p = np.asarray(poly, np.float64)
    n = len(p)
    if n < 3:
        raise ValueError("polygon needs >= 3 vertices")
    idx = list(range(n))
    if polygon_area(p) < 0:
        idx = idx[::-1]
    tris = []
    guard = 0
    while len(idx) > 3 and guard < 10 * n:
        guard += 1
        m = len(idx)
        clipped = False
        for k in range(m):
            i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            a, b, c = p[i0], p[i1], p[i2]
            if ccw(a, b, c) <= 1e-14:
                continue  # reflex or degenerate
            # no other vertex inside the candidate ear
            ok = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                q = p[j]
                if (
                    ccw(a, b, q) >= -1e-14
                    and ccw(b, c, q) >= -1e-14
                    and ccw(c, a, q) >= -1e-14
                ):
                    ok = False
                    break
            if ok:
                tris.append((i0, i1, i2))
                idx.pop(k)
                clipped = True
                break
        if not clipped:
            raise ValueError("polygon is not simple (no ear found)")
    tris.append(tuple(idx))
    return np.array(tris, np.int64)


# --------------------------------------------------------------- 3D subset
# The reference's CompGeom 3D entry points beyond hulls
# (src/CompGeom.cpp: coplanarity tests, segment/triangle intersection,
# triangle/triangle intersection, 3D polygon clipping & intersection of
# coplanar polygons). Build-time numpy, same as the 2D subset above.

def coplanar(points, tol: float = 1e-8) -> bool:
    """True when all points lie in one plane (CompGeom::coplanar)."""
    pts = np.asarray(points, np.float64)
    if len(pts) <= 3:
        return True
    c = pts.mean(axis=0)
    # smallest singular value of the centered cloud = distance scale off
    # the best plane
    s = np.linalg.svd(pts - c, compute_uv=False)
    scale = max(s[0], 1.0)
    return bool(s[-1] <= tol * scale)


def segment_triangle_intersection(p, q, a, b, c, tol: float = 1e-12):
    """Intersection of segment [p, q] with triangle (a, b, c)
    (CompGeom::intersect_seg_tri). Returns the intersection point (3,) or
    None. Segments in the triangle's plane are rejected (degenerate case —
    the reference routes those to its coplanar-segment logic)."""
    p = np.asarray(p, np.float64)
    q = np.asarray(q, np.float64)
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    c = np.asarray(c, np.float64)
    ab = b - a
    ac = c - a
    n = np.cross(ab, ac)
    d = q - p
    denom = -np.dot(d, n)
    if abs(denom) <= tol * max(np.linalg.norm(n), 1.0):
        return None  # parallel / coplanar
    ap = p - a
    t = np.dot(ap, n) / denom
    if t < -tol or t > 1.0 + tol:
        return None
    # barycentric via scalar triple products
    e = np.cross(-d, ap)
    v = np.dot(ac, e) / denom
    w = -np.dot(ab, e) / denom
    if v < -tol or w < -tol or v + w > 1.0 + tol:
        return None
    return p + np.clip(t, 0.0, 1.0) * d


def triangles_intersect(t1, t2, tol: float = 1e-12) -> bool:
    """True when triangles t1, t2 ((3, 3) each) intersect
    (CompGeom::query_intersect_tri_tri): edge-vs-triangle tests both ways
    plus the containment case."""
    t1 = np.asarray(t1, np.float64)
    t2 = np.asarray(t2, np.float64)
    for (tri_a, tri_b) in ((t1, t2), (t2, t1)):
        for i in range(3):
            p, q = tri_a[i], tri_a[(i + 1) % 3]
            if segment_triangle_intersection(
                p, q, tri_b[0], tri_b[1], tri_b[2], tol
            ) is not None:
                return True
    # containment (coplanar overlap without edge crossings): test a vertex
    # of each inside the other after projecting to the shared plane
    n = np.cross(t1[1] - t1[0], t1[2] - t1[0])
    nl = np.linalg.norm(n)
    if nl > tol:
        n = n / nl
        d2 = (t2 - t1[0]) @ n
        if np.max(np.abs(d2)) <= 1e-9:
            ax = _plane_axes(n)
            poly1 = (t1 - t1[0]) @ ax.T
            poly2 = (t2 - t1[0]) @ ax.T
            if point_in_polygon(poly2[0], poly1) or point_in_polygon(
                poly1[0], poly2
            ):
                return True
    return False


def _plane_axes(n) -> np.ndarray:
    """(2, 3) orthonormal in-plane axes for unit normal n."""
    ref = np.array([1.0, 0.0, 0.0]) if abs(n[0]) < 0.9 else np.array(
        [0.0, 1.0, 0.0]
    )
    t1 = np.cross(n, ref)
    t1 /= np.linalg.norm(t1)
    t2 = np.cross(n, t1)
    return np.stack([t1, t2])


def clip_polygon_halfspace(poly, n, d, tol: float = 1e-12) -> np.ndarray:
    """Clip a 3D polygon ((N, 3), in order) against the halfspace
    n·x <= d (one Sutherland–Hodgman step; the primitive under
    CompGeom's polygon intersection)."""
    poly = np.asarray(poly, np.float64)
    n = np.asarray(n, np.float64)
    out = []
    N = len(poly)
    for i in range(N):
        cur, nxt = poly[i], poly[(i + 1) % N]
        dc = np.dot(n, cur) - d
        dn = np.dot(n, nxt) - d
        if dc <= tol:
            out.append(cur)
        if (dc <= tol) != (dn <= tol) and abs(dn - dc) > tol:
            t = dc / (dc - dn)
            out.append(cur + t * (nxt - cur))
    return np.asarray(out).reshape(-1, 3)


def intersect_coplanar_polygons(P, Q, tol: float = 1e-9) -> np.ndarray:
    """Intersection of two convex coplanar 3D polygons (vertices in order):
    the reference's CompGeom::intersect_polygons. Returns the intersection
    polygon ((M, 3), possibly empty). Q is clipped against P's edge
    halfspaces in P's plane."""
    P = np.asarray(P, np.float64)
    Q = np.asarray(Q, np.float64)
    n = np.cross(P[1] - P[0], P[2] - P[0])
    nl = np.linalg.norm(n)
    if nl < tol:
        return np.zeros((0, 3))
    n = n / nl
    # ensure P is CCW as seen along +n
    ax = _plane_axes(n)
    p2 = (P - P[0]) @ ax.T
    if polygon_area(p2) < 0:
        P = P[::-1]
    out = Q
    NP_ = len(P)
    for i in range(NP_):
        if len(out) == 0:
            break
        a, b = P[i], P[(i + 1) % NP_]
        edge_n = np.cross(n, b - a)   # inward normal of edge halfspace
        # keep x with edge_n·(x - a) >= 0  <=>  (-edge_n)·x <= -edge_n·a
        out = clip_polygon_halfspace(out, -edge_n, -np.dot(edge_n, a))
    return out
