"""Triangle-mesh primitive: mass properties, narrow phase, and simulation.

Parity target: the reference's `TriangleMeshPrimitive`
(src/TriangleMeshPrimitive.cpp) — non-convex meshes simulate as first-class
collision geometry (vs plane / sphere / box / other meshes), with
divergence-theorem mass properties (`TessellatedPolyhedron`).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from moby_tpu.core import scene as sc
from moby_tpu.geometry import narrowphase as nph
from moby_tpu.geometry import trimesh as tm
from moby_tpu.math import quaternion as quat
from moby_tpu.sim import stepper


def cube_mesh(h=0.5):
    v = np.array([
        [-h, -h, -h], [h, -h, -h], [h, h, -h], [-h, h, -h],
        [-h, -h, h], [h, -h, h], [h, h, h], [-h, h, h]])
    f = np.array([
        [0, 2, 1], [0, 3, 2],
        [4, 5, 6], [4, 6, 7],
        [0, 1, 5], [0, 5, 4],
        [2, 3, 7], [2, 7, 6],
        [1, 2, 6], [1, 6, 5],
        [3, 0, 4], [3, 4, 7]], np.int32)
    return v, f


def _ground_plane(b):
    b.add_body("ground", enabled=False)
    pq = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))
    b.add_geom("ground", sc.PLANE, [0.0], quat=pq)


def _rollout(scene, st, dt, n):
    @jax.jit
    def run(s):
        def f(s, _):
            s2 = stepper.step(scene, s, dt)
            return s2, s2.pos
        return jax.lax.scan(f, s, None, length=n)

    return run(st)


class TestMassProperties:
    def test_cube_inertia(self):
        v, f = cube_mesh(0.5)
        vol, com, J, mass = tm.mesh_mass_properties(v, f, density=3.0)
        assert abs(vol - 1.0) < 1e-12
        np.testing.assert_allclose(com, 0.0, atol=1e-12)
        assert abs(mass - 3.0) < 1e-12
        np.testing.assert_allclose(J, np.eye(3) * 3.0 / 6.0, atol=1e-12)

    def test_extrusion_nonconvex(self):
        # L-shaped prism: area 3, extruded thickness 1 -> volume 3
        poly = [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]
        v, f = tm.extrude_polygon(poly, -0.5, 0.5, apex=0)
        vol, com, J, _ = tm.mesh_mass_properties(v, f)
        assert abs(vol - 3.0) < 1e-12
        # centroid of the L: ((1.5*2*0.5? ) use known: areas 2x1 @ (1,0.5)
        # and 1x1 @ (0.5,1.5)) -> (2*1 + 1*0.5)/3, (2*0.5 + 1*1.5)/3
        np.testing.assert_allclose(com[0], (2 * 1 + 1 * 0.5) / 3, atol=1e-12)
        np.testing.assert_allclose(com[2], (2 * 0.5 + 1 * 1.5) / 3, atol=1e-12)

    def test_obj_roundtrip(self, tmp_path):
        v, f = cube_mesh(0.5)
        p = os.path.join(tmp_path, "cube.obj")
        with open(p, "w") as fh:
            for x, y, z in v:
                fh.write(f"v {x} {y} {z}\n")
            # write two triangles as one quad to exercise fan triangulation
            fh.write("f 1 3 2\n")
            for a, b, c in f[1:]:
                fh.write(f"f {a+1} {b+1} {c+1}\n")
        v2, f2 = tm.load_obj(p)
        np.testing.assert_allclose(v2, v)
        assert f2.shape == (12, 3)


class TestNarrowPhase:
    def test_sphere_mesh_distance(self):
        """Sphere above a mesh cube: analytic distance."""
        b = sc.SceneBuilder()
        b.set_gravity([0, 0, -9.81])
        v, f = cube_mesh(0.5)
        b.add_body("mesh", enabled=False)
        b.add_geom("mesh", sc.TRIMESH, [0.0], verts=v, faces=f)
        b.add_body("ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.25),
                   pos=np.array([0.1, 0.0, 1.0]))
        b.add_geom("ball", sc.SPHERE, [0.25])
        b.set_contact_params("mesh", "ball", sc.ContactParams())
        scene, st = b.compile()
        from moby_tpu.sim import kinematics
        pt = kinematics.compute(scene, st)
        pd, con = nph.narrow_phase(scene, pt.pos, pt.quat, 0.05)
        # center z=1.0, cube top z=0.5, r=0.25 -> dist 0.25
        np.testing.assert_allclose(float(pd.dist[0]), 0.25, atol=1e-6)

    def test_mesh_box_distance(self):
        """Mesh cube vs analytic box: resting gap."""
        b = sc.SceneBuilder()
        v, f = cube_mesh(0.5)
        b.add_body("mesh", mass=1.0,
                   inertia=tm.mesh_inertia(1.0, v, f)[0],
                   pos=np.array([0.0, 0.0, 1.2]))
        b.add_geom("mesh", sc.TRIMESH, [0.0], verts=v, faces=f)
        b.add_body("box", enabled=False)
        b.add_geom("box", sc.BOX, [0.5, 0.5, 0.5])
        b.set_contact_params("mesh", "box", sc.ContactParams())
        scene, st = b.compile()
        from moby_tpu.sim import kinematics
        pt = kinematics.compute(scene, st)
        pd, con = nph.narrow_phase(scene, pt.pos, pt.quat, 0.05)
        # mesh bottom z=0.7, box top z=0.5 -> gap 0.2
        np.testing.assert_allclose(float(pd.dist[0]), 0.2, atol=1e-6)


class TestSimulation:
    def test_nonconvex_mesh_rests_on_plane(self):
        """The L-prism (genuinely non-convex) sits stably on the ground."""
        poly = [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]
        v, f = tm.extrude_polygon(poly, -0.5, 0.5, apex=0)
        J, com, vol = tm.mesh_inertia(2.0, v, f)
        b = sc.SceneBuilder()
        b.set_gravity([0, 0, -9.81])
        z0 = float(com[2]) + 0.02   # bottom hovers 2 cm up
        b.add_body("L", mass=2.0, inertia=J, pos=np.array([0, 0, z0]))
        b.add_geom("L", sc.TRIMESH, [0.0], verts=v - com, faces=f)
        _ground_plane(b)
        b.set_contact_params("ground", "L",
                             sc.ContactParams(epsilon=0.0, mu_coulomb=0.5))
        scene, st = b.compile()
        final, traj = _rollout(scene, st, 0.01, 120)
        z = float(final.pos[0, 2])
        # resting: body COM height = com_z above the plane
        assert abs(z - float(com[2])) < 5e-3, f"L-prism COM height {z}"
        # did not topple or wander
        assert float(jnp.max(jnp.abs(final.vel))) < 0.15
        q = np.asarray(final.quat[0])
        assert abs(abs(q[3]) - 1.0) < 1e-2  # orientation ~ identity

    def test_sphere_settles_in_mesh_groove(self):
        """Sphere dropped off-center into a V-notch channel slides to the
        groove bottom (two simultaneous mesh contacts)."""
        poly = [(0.0, -0.3), (1.0, 0.5), (1.0, -0.8), (-1.0, -0.8),
                (-1.0, 0.5)]
        v, f = tm.extrude_polygon(poly, -1.0, 1.0, apex=0)
        b = sc.SceneBuilder()
        b.set_gravity([0, 0, -9.81])
        b.add_body("channel", enabled=False)
        b.add_geom("channel", sc.TRIMESH, [0.0], verts=v, faces=f)
        r = 0.3
        b.add_body("ball", mass=1.0, inertia=sc.sphere_inertia(1.0, r),
                   pos=np.array([0.15, 0.0, 0.4]))
        b.add_geom("ball", sc.SPHERE, [r])
        b.set_contact_params("channel", "ball",
                             sc.ContactParams(epsilon=0.0, mu_coulomb=0.0))
        scene, st = b.compile()
        final, traj = _rollout(scene, st, 0.01, 250)
        x, y, z = np.asarray(final.pos[1])   # body 1 = ball
        assert abs(x) < 0.02, f"ball did not settle at groove bottom: x={x}"
        # slope line 0.8x - z - 0.3 = 0: center (0, zc) at distance r
        # => zc = r*sqrt(1 + 0.8^2) - 0.3
        z_exp = r * np.sqrt(1.0 + 0.8 ** 2) - 0.3
        assert abs(z - z_exp) < 0.02, f"z={z} expected {z_exp}"

    def test_mesh_on_box_rests(self):
        """Mesh cube resting on an analytic box."""
        v, f = cube_mesh(0.4)
        J, com, _ = tm.mesh_inertia(1.0, v, f)
        b = sc.SceneBuilder()
        b.set_gravity([0, 0, -9.81])
        b.add_body("box", enabled=False, pos=np.array([0, 0, 0.0]))
        b.add_geom("box", sc.BOX, [1.0, 1.0, 0.5])
        b.add_body("mesh", mass=1.0, inertia=J,
                   pos=np.array([0.0, 0.0, 0.92]))
        b.add_geom("mesh", sc.TRIMESH, [0.0], verts=v, faces=f)
        b.set_contact_params("box", "mesh",
                             sc.ContactParams(epsilon=0.0, mu_coulomb=0.5))
        scene, st = b.compile()
        final, _ = _rollout(scene, st, 0.01, 120)
        z = float(final.pos[1, 2])
        assert abs(z - 0.9) < 5e-3, f"mesh cube height {z}"

    def test_mesh_stack(self):
        """Two mesh cubes stack (trimesh-trimesh contacts)."""
        v, f = cube_mesh(0.4)
        J, com, _ = tm.mesh_inertia(1.0, v, f)
        b = sc.SceneBuilder()
        b.set_gravity([0, 0, -9.81])
        _ground_plane(b)
        b.add_body("m1", mass=1.0, inertia=J, pos=np.array([0, 0, 0.42]))
        b.add_geom("m1", sc.TRIMESH, [0.0], verts=v, faces=f)
        b.add_body("m2", mass=1.0, inertia=J, pos=np.array([0, 0, 1.24]))
        b.add_geom("m2", sc.TRIMESH, [0.0], verts=v, faces=f)
        cp = sc.ContactParams(epsilon=0.0, mu_coulomb=0.5)
        b.set_contact_params("ground", "m1", cp)
        b.set_contact_params("m1", "m2", cp)
        scene, st = b.compile()
        final, _ = _rollout(scene, st, 0.01, 150)
        z = np.asarray(final.pos[1:3, 2])   # bodies 1, 2 = m1, m2
        np.testing.assert_allclose(z, [0.4, 1.2], atol=8e-3)


class TestTrimeshVsPolyhedron:
    def test_mesh_rests_on_convex_slab(self):
        """TRIMESH vs POLYHEDRON pairs route through the mesh-mesh kernel
        (the convex cloud gets compile-time hull triangles)."""
        v, f = cube_mesh(0.3)
        J, com, _ = tm.mesh_inertia(1.0, v, f)
        slab = np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
             for sz in (-0.2, 0.2)])
        b = sc.SceneBuilder()
        b.set_gravity([0, 0, -9.81])
        b.add_body("slab", enabled=False)
        b.add_geom("slab", sc.POLYHEDRON, [0.0], verts=slab)
        b.add_body("m", mass=1.0, inertia=J, pos=np.array([0, 0, 0.52]))
        b.add_geom("m", sc.TRIMESH, [0.0], verts=v, faces=f)
        b.set_contact_params("slab", "m",
                             sc.ContactParams(epsilon=0.0, mu_coulomb=0.5))
        scene, st = b.compile()
        assert scene.n_pairs == 1
        final, _ = _rollout(scene, st, 0.01, 100)
        z = float(final.pos[1, 2])
        assert abs(z - 0.5) < 8e-3, f"mesh height {z}"
