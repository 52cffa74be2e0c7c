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
