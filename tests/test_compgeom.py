"""CompGeom 2D toolkit (reference src/CompGeom.cpp 2D subset)."""

import numpy as np
import pytest

from moby_tpu.geometry import compgeom as cg
from moby_tpu.geometry import trimesh as tm


class TestHull2D:
    def test_square_with_interior(self):
        pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1],
                        [0.5, 0.5], [0.2, 0.8]])
        h = cg.convex_hull_2d(pts)
        assert sorted(h.tolist()) == [0, 1, 2, 3]
        assert cg.polygon_area(pts[h]) > 0  # CCW

    def test_collinear(self):
        pts = np.array([[0, 0], [1, 0], [2, 0], [2, 1], [0, 1]])
        h = cg.convex_hull_2d(pts)
        assert 1 not in h.tolist()  # interior collinear point dropped


class TestPolygonOps:
    def test_area_centroid(self):
        sq = [(0, 0), (2, 0), (2, 2), (0, 2)]
        assert abs(cg.polygon_area(sq) - 4.0) < 1e-12
        np.testing.assert_allclose(cg.polygon_centroid(sq), [1, 1])

    def test_point_in_polygon(self):
        L = [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]
        assert cg.point_in_polygon((0.5, 0.5), L)
        assert cg.point_in_polygon((0.5, 1.5), L)
        assert not cg.point_in_polygon((1.5, 1.5), L)

    def test_seg_intersection(self):
        p = cg.seg_seg_intersect_2d((0, 0), (2, 2), (0, 2), (2, 0))
        np.testing.assert_allclose(p, [1, 1])
        assert cg.seg_seg_intersect_2d((0, 0), (1, 0), (0, 1), (1, 1)) is None


class TestTriangulation:
    def test_nonconvex_polygon(self):
        L = [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]
        tris = cg.triangulate_polygon(L)
        assert len(tris) == len(L) - 2
        area = sum(abs(cg.ccw(*[np.array(L[i]) for i in t])) / 2 for t in tris)
        assert abs(area - 3.0) < 1e-12  # L-shape area

    def test_cw_input(self):
        sq = [(0, 0), (0, 1), (1, 1), (1, 0)]  # CW
        tris = cg.triangulate_polygon(sq)
        assert len(tris) == 2

    def test_matches_extrusion_volume(self):
        # triangulated caps consistent with the prism extrusion volume
        poly = [(0.0, -0.3), (1.0, 0.5), (1.0, -0.8), (-1.0, -0.8),
                (-1.0, 0.5)]
        tris = cg.triangulate_polygon(poly)
        area = sum(abs(cg.ccw(*[np.array(poly[i]) for i in t])) / 2
                   for t in tris)
        v, f = tm.extrude_polygon(poly, 0, 1, apex=0)
        vol, _, _, _ = tm.mesh_mass_properties(v, f)
        assert abs(area - vol) < 1e-12


class Test3DSubset:
    """The 3D CompGeom entry points (reference src/CompGeom.cpp beyond
    hulls): coplanarity, segment/triangle + triangle/triangle intersection,
    3D polygon clipping / coplanar-polygon intersection."""

    def test_coplanar(self):
        sq = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
        assert cg.coplanar(sq)
        assert not cg.coplanar(np.vstack([sq, [0.5, 0.5, 0.3]]))
        # tilted plane
        R = np.array([[1, 0, 0], [0, 0.8, -0.6], [0, 0.6, 0.8]])
        assert cg.coplanar(sq @ R.T)

    def test_segment_triangle(self):
        a, b, c = np.eye(3, 3) * 0 + np.array(
            [[0, 0, 0], [2, 0, 0], [0, 2, 0]], float)
        # crossing segment
        p = cg.segment_triangle_intersection(
            [0.5, 0.5, -1], [0.5, 0.5, 1], a, b, c)
        np.testing.assert_allclose(p, [0.5, 0.5, 0.0], atol=1e-12)
        # missing segment
        assert cg.segment_triangle_intersection(
            [3, 3, -1], [3, 3, 1], a, b, c) is None
        # parallel segment
        assert cg.segment_triangle_intersection(
            [0.1, 0.1, 1], [0.5, 0.5, 1], a, b, c) is None
        # stops short of the plane
        assert cg.segment_triangle_intersection(
            [0.5, 0.5, -2], [0.5, 0.5, -1], a, b, c) is None

    def test_triangles_intersect(self):
        t1 = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], float)
        # crossing through t1's plane
        t2 = np.array([[0.5, 0.5, -1], [0.5, 0.5, 1], [1.5, 0.5, 0.5]],
                      float)
        assert cg.triangles_intersect(t1, t2)
        # far away
        t3 = t2 + np.array([10.0, 0, 0])
        assert not cg.triangles_intersect(t1, t3)
        # coplanar containment (small triangle inside big one)
        t4 = np.array([[0.2, 0.2, 0], [0.6, 0.2, 0], [0.2, 0.6, 0]], float)
        assert cg.triangles_intersect(t1, t4)

    def test_clip_polygon_halfspace(self):
        sq = np.array([[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0]], float)
        out = cg.clip_polygon_halfspace(sq, np.array([1.0, 0, 0]), 1.0)
        # clipped to x <= 1: a 1x2 rectangle
        assert abs(cg.polygon_area(out[:, :2])) - 2.0 < 1e-9
        assert out[:, 0].max() <= 1.0 + 1e-12

    def test_intersect_coplanar_polygons(self):
        P = np.array([[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0]], float)
        Q = P + np.array([1.0, 1.0, 0.0])
        out = cg.intersect_coplanar_polygons(P, Q)
        # unit square overlap
        assert abs(abs(cg.polygon_area(out[:, :2])) - 1.0) < 1e-9
        # disjoint
        out2 = cg.intersect_coplanar_polygons(P, P + np.array([5.0, 0, 0]))
        assert len(out2) == 0
        # works in a tilted plane too
        R = np.array([[1, 0, 0], [0, 0.8, -0.6], [0, 0.6, 0.8]])
        out3 = cg.intersect_coplanar_polygons(P @ R.T, Q @ R.T)
        c3 = out3 @ R  # rotate back
        assert abs(abs(cg.polygon_area(c3[:, :2])) - 1.0) < 1e-9
