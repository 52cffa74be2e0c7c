"""GJK distance tests against analytic cases."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moby_tpu.core.scene import box_vertices
from moby_tpu.geometry import gjk


def pad(v, n=16):
    out = np.zeros((n, 3))
    out[: len(v)] = v
    return jnp.array(out), jnp.int32(len(v))


class TestGJK:
    def test_separated_boxes(self):
        a, na = pad(box_vertices(1, 1, 1))
        bverts = box_vertices(1, 1, 1) + np.array([5.0, 0, 0])
        b, nb = pad(bverts)
        r = gjk.gjk(a, na, b, nb)
        np.testing.assert_allclose(float(r.dist), 3.0, atol=1e-6)
        assert not bool(r.intersecting)
        np.testing.assert_allclose(np.asarray(r.pa)[0], 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(r.pb)[0], 4.0, atol=1e-6)

    def test_diagonal_offset(self):
        a, na = pad(box_vertices(0.5, 0.5, 0.5))
        bv = box_vertices(0.5, 0.5, 0.5) + np.array([2.0, 2.0, 0.0])
        b, nb = pad(bv)
        r = gjk.gjk(a, na, b, nb)
        # corner-to-corner distance sqrt(2)*(2-1) = sqrt(2)
        np.testing.assert_allclose(float(r.dist), np.sqrt(2.0), atol=1e-6)

    def test_intersecting(self):
        a, na = pad(box_vertices(1, 1, 1))
        bv = box_vertices(1, 1, 1) + np.array([0.5, 0.0, 0.0])
        b, nb = pad(bv)
        r = gjk.gjk(a, na, b, nb)
        assert bool(r.intersecting) or float(r.dist) < 1e-6

    def test_tetra_vs_point(self):
        tetra = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]]
        ) + np.array([3.0, 0, 0])
        a, na = pad(np.array([[0.0, 0.0, 0.0]]))
        b, nb = pad(tetra)
        r = gjk.gjk(a, na, b, nb)
        np.testing.assert_allclose(float(r.dist), 3.0, atol=1e-6)

    def test_vmap(self):
        a, na = pad(box_vertices(1, 1, 1))
        offs = jnp.array([[3.0, 0, 0], [0, 4.0, 0], [0, 0, 5.0], [10.0, 0, 0]])
        bset = jnp.stack(
            [jnp.array(box_vertices(1, 1, 1)) + o for o in offs]
        )
        bpad = jnp.zeros((4, 16, 3)).at[:, :8].set(bset)
        nb = jnp.full(4, 8, jnp.int32)
        r = jax.vmap(lambda vb, n: gjk.gjk(a, na, vb, n))(bpad, nb)
        np.testing.assert_allclose(
            np.asarray(r.dist), [1.0, 2.0, 3.0, 8.0], atol=1e-6
        )


class TestConvexSimulation:
    def test_octahedron_rests_on_box(self):
        from moby_tpu.core import scene as sc
        from moby_tpu.sim import stepper

        b = sc.SceneBuilder()
        b.set_gravity([0, 0, -9.81])
        octa = np.array(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1.0]]
        ) * 0.4
        b.add_body("octa", mass=1.0, inertia=np.eye(3) * 0.05,
                   pos=np.array([0, 0, 1.0]))
        b.add_geom("octa", sc.POLYHEDRON, [0.0], verts=octa)
        b.add_body("plat", enabled=False)
        b.add_geom("plat", sc.BOX, [2.0, 2.0, 0.25])
        b.set_contact_params(
            "octa", "plat", sc.ContactParams(epsilon=0.0, mu_coulomb=0.0, nk=4)
        )
        scene, st = b.compile()
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.005))
        for _ in range(200):
            st = step_j(st)
        # tip of the octahedron resting on the platform top face
        assert abs(float(st.pos[0, 2]) - 0.65) < 1e-3
        assert abs(float(st.vel[0, 2])) < 1e-8
