"""Exact face-clipping manifolds in the generic support kernel (VERDICT r3
missing #4): flat-feature contacts must carry exact depths (the tilted
support approximation had ~r*delta^2/2 depth error), and a support-kernel
box-box run must agree with the dedicated K_BOX_BOX manifold.

Reference: find_contacts_face_face polygon clipping,
/root/reference/include/Moby/CCD.inl:599-648.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from moby_tpu.core import scene as sc
from moby_tpu.geometry import narrowphase as nph
from moby_tpu.geometry.support import get_support_kernel
from moby_tpu.math import quaternion as quat


def two_body_scene(gtype_a, params_a, pos_a, quat_a, gtype_b, params_b,
                   pos_b=None):
    b = sc.SceneBuilder()
    b.add_body("a", mass=1.0, inertia=np.eye(3), pos=np.asarray(pos_a))
    b.add_geom("a", gtype_a, params_a, quat=quat_a)
    b.add_body("b", mass=1.0, inertia=np.eye(3),
               pos=np.zeros(3) if pos_b is None else np.asarray(pos_b))
    b.add_geom("b", gtype_b, params_b)
    return b.compile()


class TestFlatFeatureDepth:
    def test_cylinder_side_on_box_face(self):
        # cylinder (R=0.5, H=2) lying with its axis along world x, resting
        # gap g above a box top face at z=1: every line-manifold point must
        # carry sd = g exactly
        g = 1e-3
        qg = np.asarray(quat.from_rpy(jnp.array([0.0, 0.0, np.pi / 2])))
        # local axis y -> world x via rz(90)
        scene, st = two_body_scene(
            sc.CYLINDER, [0.5, 2.0], [0, 0, 1.5 + g], qg,
            sc.BOX, [2.0, 2.0, 1.0],
        )
        pd, con = nph.narrow_phase(scene, st.pos, st.quat, 5e-3)
        sd = np.asarray(con.depth)[np.asarray(con.active)]
        pts = np.asarray(con.point)[np.asarray(con.active)]
        assert len(sd) >= 2, "line contact needs >= 2 manifold points"
        np.testing.assert_allclose(sd, g, atol=1e-9)
        # the two contact points span the cylinder's length along x
        assert pts[:, 0].max() - pts[:, 0].min() > 1.8
        # depth error bound of the old tilted-support path was
        # ~R*delta^2/2 = 2.2e-6; exact clipping must beat 1e-6
        assert np.abs(sd - g).max() < 1e-6

    def test_cone_base_on_box_face(self):
        g = 2e-3
        # cone apex +y local; flip upside-down so the BASE faces -z...
        # local y -> world z via rx(90); base (at local -H/2) faces -z
        qg = np.asarray(quat.from_rpy(jnp.array([np.pi / 2, 0.0, 0.0])))
        scene, st = two_body_scene(
            sc.CONE, [0.6, 1.2], [0, 0, 1.6 + g], qg,
            sc.BOX, [2.0, 2.0, 1.0],
        )
        pd, con = nph.narrow_phase(scene, st.pos, st.quat, 5e-3)
        sd = np.asarray(con.depth)[np.asarray(con.active)]
        pts = np.asarray(con.point)[np.asarray(con.active)]
        assert len(sd) >= 3, "base-face contact needs a polygon manifold"
        np.testing.assert_allclose(sd, g, atol=1e-9)
        assert np.abs(sd - g).max() < 1e-6
        # manifold points lie on the base rim circle (radius 0.6)
        r = np.hypot(pts[:, 0], pts[:, 1])
        np.testing.assert_allclose(r, 0.6, atol=1e-7)

    def test_cylinder_cap_on_box_face(self):
        g = 5e-4
        qg = np.asarray(quat.from_rpy(jnp.array([np.pi / 2, 0.0, 0.0])))
        # local y -> world z: cap faces down
        scene, st = two_body_scene(
            sc.CYLINDER, [0.5, 1.0], [0.3, -0.2, 1.5 + g], qg,
            sc.BOX, [2.0, 2.0, 1.0],
        )
        pd, con = nph.narrow_phase(scene, st.pos, st.quat, 5e-3)
        sd = np.asarray(con.depth)[np.asarray(con.active)]
        assert len(sd) >= 4
        np.testing.assert_allclose(sd, g, atol=1e-9)


class TestSupportBoxBoxMatchesDedicated:
    def test_small_box_on_big_box(self):
        g = 1e-3
        scene, st = two_body_scene(
            sc.BOX, [0.5, 0.5, 0.5], [0.2, 0.1, 1.5 + g], None,
            sc.BOX, [2.0, 2.0, 1.0],
        )
        # dedicated kernel (the compiled route for BOX-BOX)
        pd, con = nph.narrow_phase(scene, st.pos, st.quat, 5e-3)
        act = np.asarray(con.active)
        pts_ded = np.asarray(con.point)[act]
        sd_ded = np.asarray(con.depth)[act]

        # generic support kernel run on the same pair
        kern = get_support_kernel(sc.BOX, sc.BOX)
        d, pa, pb, pts, nrm, sd = kern(
            scene, st.pos, st.quat, jnp.array([0]))
        sd = np.asarray(sd)[0]
        pts = np.asarray(pts)[0]
        keep = np.isfinite(sd) & (sd < 1.0)
        pts_sup = pts[keep]
        sd_sup = sd[keep]

        # same depths
        np.testing.assert_allclose(sd_sup, g, atol=1e-9)
        np.testing.assert_allclose(sd_ded, g, atol=1e-9)
        # the support manifold covers the dedicated one: every dedicated
        # contact point (small-box corner) appears in the clipped set.
        # Kernels differ in the along-normal placement convention (surface
        # vs mid-gap point — both in use across the built-in kernels), so
        # allow the g/2 offset along z while requiring exact tangentials.
        for p in pts_ded:
            d_tan = np.abs(pts_sup[:, :2] - p[None, :2]).sum(axis=1)
            d_z = np.abs(pts_sup[:, 2] - p[2])
            assert ((d_tan < 1e-6) & (d_z <= g)).any(), (p, pts_sup)
