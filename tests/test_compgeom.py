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
