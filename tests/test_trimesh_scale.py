"""Large-mesh scaling: the contact-slot cap (scene.VSLOT_CAP deepest
vertices) and the face-tiled `points_vs_mesh` must let a ~1k-face mesh
simulate with a bounded LCP and bounded memory (VERDICT r2 weak #7/#8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moby_tpu.core import scene as sc
from moby_tpu.geometry import trimesh as tmesh
from moby_tpu.sim import stepper


def icosphere(subdiv=2, r=0.5):
    """Subdivided icosahedron: 20*4^subdiv faces (subdiv=3 -> 1280)."""
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    v = []
    for s1 in (-1, 1):
        for s2 in (-1, 1):
            v += [(0, s1, s2 * phi), (s1, s2 * phi, 0), (s2 * phi, 0, s1)]
    v = np.array(v, float)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    from moby_tpu import native

    hv, hf = native.convex_hull(v)
    verts, faces = hv, hf
    for _ in range(subdiv):
        edge_mid = {}
        new_faces = []
        vlist = list(verts)

        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in edge_mid:
                m = vlist[i] + vlist[j]
                m = m / np.linalg.norm(m)
                edge_mid[key] = len(vlist)
                vlist.append(m)
            return edge_mid[key]

        for (a, b, c) in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c],
                          [ab, bc, ca]]
        verts = np.array(vlist)
        faces = np.array(new_faces, np.int32)
    return verts * r, faces


class TestLargeMesh:
    def test_1k_face_mesh_rests_on_plane(self):
        verts, faces = icosphere(subdiv=3, r=0.5)
        assert len(faces) >= 1000 and len(verts) > sc.VSLOT_CAP
        b = sc.SceneBuilder()
        b.set_gravity([0, -9.81, 0])
        b.add_body("ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.5),
                   pos=np.array([0.0, 0.55, 0.0]))
        b.add_geom("ball", sc.TRIMESH, [0], verts=verts, faces=faces)
        b.add_body("ground", enabled=False)
        b.add_geom("ground", sc.PLANE, [0.0])
        b.set_contact_params("ground", "ball",
                             sc.ContactParams(epsilon=0.0, mu_coulomb=0.5))
        scene, st = b.compile()
        # contact slots are capped, not per-vertex
        assert scene.n_contacts <= sc.VSLOT_CAP
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.005))
        for _ in range(80):
            st = step_j(st)
        # rests at the mesh radius
        assert abs(float(st.pos[0, 1]) - 0.5) < 5e-3
        assert abs(float(st.vel[0, 1])) < 1e-3

    def test_1k_face_mesh_on_mesh_slab(self):
        """Mesh-vs-mesh with F > FACE_CHUNK exercises the face-tiled
        points_vs_mesh scan."""
        verts, faces = icosphere(subdiv=2, r=0.4)
        assert len(faces) > tmesh.FACE_CHUNK
        slab_v, slab_f = tmesh.extrude_polygon(
            np.array([[-2.0, -2.0], [2.0, -2.0], [2.0, 2.0], [-2.0, 2.0]]),
            -0.25, 0.25,
        )
        b = sc.SceneBuilder()
        b.set_gravity([0, -9.81, 0])
        b.add_body("slab", enabled=False)
        b.add_geom("slab", sc.TRIMESH, [0], verts=slab_v, faces=slab_f)
        b.add_body("ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.4),
                   pos=np.array([0.0, 0.7, 0.0]))
        b.add_geom("ball", sc.TRIMESH, [0], verts=verts, faces=faces)
        b.set_contact_params("slab", "ball",
                             sc.ContactParams(epsilon=0.0, mu_coulomb=0.5))
        scene, st = b.compile()
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.005))
        for _ in range(60):
            st = step_j(st)
        # rests on the slab top (0.25 + 0.4)
        assert abs(float(st.pos[1, 1]) - 0.65) < 8e-3
        assert np.all(np.isfinite(np.asarray(st.pos)))

    def test_chunked_points_vs_mesh_matches_unchunked(self):
        """The face-tiled scan must return the identical closest faces."""
        verts, faces = icosphere(subdiv=2, r=0.5)
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(1, 64, 3)) * 0.8)
        vw = jnp.asarray(verts)[None]
        tv = tmesh.gather_triangles(vw, jnp.asarray(faces)[None])
        fv = jnp.ones((1, len(faces)), bool)
        sd1, q1, n1 = tmesh.points_vs_mesh(pts, tv, fv)  # chunked (F>256)
        old = tmesh.FACE_CHUNK
        try:
            tmesh.FACE_CHUNK = 10 ** 9                   # force unchunked
            sd2, q2, n2 = tmesh.points_vs_mesh(pts, tv, fv)
        finally:
            tmesh.FACE_CHUNK = old
        np.testing.assert_allclose(np.asarray(sd1), np.asarray(sd2),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2),
                                   atol=1e-12)
