"""Convex-convex manifolds + sampled-MTV penetration (EPA stand-in).

Reference: polyhedral contact via V-Clip / Polyhedron signed distance
produces multi-contact manifolds; GJK handles the separated case
(src/Polyhedron.cpp, src/GJK.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from moby_tpu.core import scene as sc
from moby_tpu.geometry import gjk
from moby_tpu.sim import stepper


def cube_verts(h):
    return np.array(
        [[sx * h, sy * h, sz * h] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float64,
    )


class TestMTV:
    def test_overlapping_cubes_depth(self):
        # unit cubes with centers 1.5 apart along x -> overlap 0.5 along x
        va = jnp.asarray(cube_verts(1.0))
        vb = jnp.asarray(cube_verts(1.0) + np.array([1.5, 0, 0]))
        depth, n = gjk.mtv(va, 8, vb, 8)
        assert abs(float(depth) - 0.5) < 0.03
        # B is +x of A: normal B->A is -x
        assert float(n[0]) < -0.95

    def test_mostly_contained_sphere_cloud(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(30, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        va = jnp.asarray(pts * 2.0)            # big hull
        vb = jnp.asarray(pts * 0.5 + np.array([1.6, 0, 0.0]))
        depth, n = gjk.mtv(va, 30, vb, 30)
        assert float(depth) > 0.0


class TestManifoldRest:
    def test_poly_cube_rests_on_poly_slab(self):
        b = sc.SceneBuilder()
        b.set_gravity([0, 0, -9.81])
        b.add_body(
            "cube",
            mass=1.0,
            inertia=sc.box_inertia(1.0, 0.5, 0.5, 0.5),
            pos=np.array([0.0, 0.0, 1.62]),
        )
        b.add_body("slab", enabled=False)
        b.add_geom("cube", sc.POLYHEDRON, [0.0], verts=cube_verts(0.5))
        b.add_geom(
            "slab", sc.POLYHEDRON, [0.0],
            verts=cube_verts(1.0) * np.array([4.0, 4.0, 1.0]),
        )
        b.set_contact_params(
            "cube", "slab", sc.ContactParams(epsilon=0.0, mu_coulomb=0.5)
        )
        scene, st = b.compile()
        assert scene.n_contacts >= 8
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.01))
        for _ in range(80):
            st = step_j(st)
        # rests flat on the slab top (z = 1 + 0.5), no tipping
        assert abs(float(st.pos[0, 2]) - 1.5) < 2e-2
        q = np.asarray(st.quat[0])
        assert abs(q[3]) > 0.9999, f"tipped: {q}"
        assert np.linalg.norm(np.asarray(st.vel[0])) < 1e-2
