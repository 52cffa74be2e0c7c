"""Native convex hull + mesh utility CLIs (reference programs/convexify.cpp,
center.cpp, adjust-center.cpp)."""

import os

import numpy as np
import pytest

from moby_tpu import native
from moby_tpu.cli import meshutil

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _hull_volume(verts, faces):
    v = verts[faces]
    return np.abs(np.einsum("fi,fi->f", v[:, 0], np.cross(v[:, 1], v[:, 2])).sum()) / 6.0


def test_hull_of_cube_with_interior_points():
    rng = np.random.default_rng(0)
    corners = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], float
    )
    interior = rng.uniform(-0.9, 0.9, size=(200, 3))
    pts = np.concatenate([corners, interior])
    hv, hf = native.convex_hull(pts)
    assert len(hv) == 8  # only the corners survive
    assert len(hf) == 12  # cube hull triangulation
    assert _hull_volume(hv, hf) == pytest.approx(8.0, rel=1e-9)
    # all input points inside or on the hull
    for f in hf:
        a, b, c = hv[f]
        n = np.cross(b - a, c - a)
        n /= np.linalg.norm(n)
        assert (pts @ n - a @ n).max() < 1e-9  # outward normals


def test_hull_of_random_sphere_points():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(500, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    hv, hf = native.convex_hull(pts)
    # Euler: V - E + F = 2 with E = 3F/2 -> F = 2V - 4
    assert len(hf) == 2 * len(hv) - 4
    vol = _hull_volume(hv, hf)
    assert 0.9 * 4.18879 < vol < 4.18879  # slightly under the unit ball


def test_mesh_com_of_shifted_cube():
    verts = np.array(
        [[x, y, z] for x in (0, 2) for y in (0, 2) for z in (0, 2)], float
    )
    _, faces = native.convex_hull(verts)
    hv, hf = native.convex_hull(verts)
    com, vol = native.mesh_com(hv, hf)
    np.testing.assert_allclose(com, [1.0, 1.0, 1.0], atol=1e-12)
    assert abs(abs(vol) - 8.0) < 1e-9


def test_convexify_and_center_cli(tmp_path):
    rng = np.random.default_rng(2)
    pts = rng.uniform(0.0, 1.0, size=(60, 3)) + np.array([3.0, 0.0, 0.0])
    src = tmp_path / "blob.obj"
    meshutil.write_obj(src, pts, np.zeros((0, 3), np.int32))
    out = tmp_path / "hull.obj"
    assert meshutil.convexify_main([str(src), str(out)]) == 0
    hv, hf = meshutil.read_obj(out)
    assert len(hf) == 2 * len(hv) - 4

    assert meshutil.center_main([str(out)]) == 0
    cv, cf = meshutil.read_obj(tmp_path / "centered.hull.obj")
    com, _ = native.mesh_com(cv, cf)
    np.testing.assert_allclose(com, 0.0, atol=1e-9)

    assert meshutil.adjust_center_main([str(out), "1.0", "-2.0", "0.5"]) == 0
    av, _ = meshutil.read_obj(tmp_path / "adjusted.hull.obj")
    np.testing.assert_allclose(av, hv + np.array([1.0, -2.0, 0.5]), atol=1e-12)


def test_objwrl_cli(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    faces = np.array([[0, 1, 2]], np.int32)
    src = tmp_path / "tri.obj"
    meshutil.write_obj(src, verts, faces)
    out = tmp_path / "tri.wrl"
    assert meshutil.objwrl_main([str(src), str(out)]) == 0
    txt = out.read_text()
    assert txt.startswith("#VRML V2.0 utf8")
    assert "IndexedFaceSet" in txt and "0 1 2 -1," in txt
