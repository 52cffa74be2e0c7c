"""IO subsystem tests: checkpointing, logging, XML/SDF readers."""

import os

import numpy as np
import jax
import pytest

from moby_tpu.io import checkpoint, mobyxml
from moby_tpu.sim import stepper
from moby_tpu.utils import log as mlog


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        scene, st, _ = mobyxml.load(
            "/root/reference/example/stacks/sphere-stack.xml"
        )
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.001))
        for _ in range(5):
            st = step_j(st)
        p = str(tmp_path / "ck.npz")
        checkpoint.save(p, st, {"note": "test"})
        st2, meta = checkpoint.load(p, st)
        assert meta["note"] == "test"
        np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st2.pos))
        np.testing.assert_array_equal(np.asarray(st.zlast), np.asarray(st2.zlast))
        # resuming gives identical trajectories
        a = step_j(st)
        b = step_j(st2)
        np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


class TestLog:
    def test_bitmask(self, tmp_path, capsys):
        mlog.set_reporting_level("simulator,constraint")
        assert mlog.logging(mlog.LOG_SIMULATOR)
        assert mlog.logging(mlog.LOG_CONSTRAINT)
        assert not mlog.logging(mlog.LOG_COLDET)
        p = str(tmp_path / "log.txt")
        mlog.set_output(p)
        mlog.log(mlog.LOG_SIMULATOR, "hello %d", 42)
        mlog.log(mlog.LOG_COLDET, "hidden")
        mlog.set_output(None)
        mlog.set_reporting_level(0)
        text = open(p).read()
        assert "hello 42" in text
        assert "hidden" not in text


class TestReaders:
    def test_driver_options(self):
        _, _, opts = mobyxml.load(
            "/root/reference/example/bouncing-ball/bouncing-ball.xml"
        )
        assert abs(opts.step_size - 0.025) < 1e-12

    def test_urdf_pendulum_scene(self):
        # URDF via the Moby-XML wrapper (RCArticulatedBody urdf-filename)
        scene, st, _ = mobyxml.load(
            "/root/reference/example/urdf/pendulum-urdf.xml"
        )
        assert scene.nv_art == 1
        assert scene.n_contacts > 0  # pendulum sphere/cylinder vs ground plane


class TestMeshSceneTags:
    """Heightmap / Polyhedron / TriangleMesh XML tags
    (reference XMLReader.cpp:151-160 registry)."""

    def _write_obj(self, path, verts, faces):
        with open(path, "w") as fh:
            for x, y, z in verts:
                fh.write(f"v {x} {y} {z}\n")
            for a, b, c in faces:
                fh.write(f"f {a+1} {b+1} {c+1}\n")

    def test_heightmap_tag(self, tmp_path):
        import numpy as np

        hm = tmp_path / "terrain.dat"
        rows, cols = 3, 3
        heights = np.zeros((rows, cols))
        hm.write_text("3 3\n" + "\n".join(
            " ".join(str(h) for h in row) for row in heights))
        xml = tmp_path / "scene.xml"
        xml.write_text(f"""<XML><MOBY>
  <Heightmap id="hm" filename="{hm}" width="10" depth="10"
             rpy="1.5707963267949 0 0"/>
  <Sphere id="ball" radius="0.5" mass="1.0"/>
  <GravityForce id="g" accel="0 0 -9.81"/>
  <RigidBody id="terrain" enabled="false" position="0 0 0">
    <CollisionGeometry primitive-id="hm"/>
  </RigidBody>
  <RigidBody id="b" position="0 0 2">
    <CollisionGeometry primitive-id="ball"/>
    <InertiaFromPrimitive primitive-id="ball"/>
  </RigidBody>
  <TimeSteppingSimulator id="sim">
    <DynamicBody dynamic-body-id="terrain"/>
    <DynamicBody dynamic-body-id="b"/>
    <RecurrentForce recurrent-force-id="g"/>
  </TimeSteppingSimulator>
</MOBY></XML>""")
        scene, st, opts = mobyxml.load(str(xml))
        import jax
        from moby_tpu.sim import stepper

        @jax.jit
        def roll3(s):
            def f(s, _):
                return stepper.step(scene, s, 0.01), None
            return jax.lax.scan(f, s, None, length=3)[0]

        st2 = roll3(st)
        assert float(st2.pos[1, 2]) < 2.0  # ball falling toward the grid

    def test_trianglemesh_tag(self, tmp_path):
        import numpy as np
        from tests.test_trimesh import cube_mesh

        v, f = cube_mesh(0.4)
        obj = tmp_path / "cube.obj"
        self._write_obj(obj, v, f)
        xml = tmp_path / "scene.xml"
        xml.write_text(f"""<XML><MOBY>
  <TriangleMesh id="tm" filename="{obj}" mass="1.0" center="true"/>
  <Plane id="gp" rpy="1.5707963267949 0 0"/>
  <GravityForce id="g" accel="0 0 -9.81"/>
  <RigidBody id="ground" enabled="false">
    <CollisionGeometry primitive-id="gp"/>
  </RigidBody>
  <RigidBody id="m" position="0 0 0.45">
    <CollisionGeometry primitive-id="tm"/>
    <InertiaFromPrimitive primitive-id="tm"/>
  </RigidBody>
  <TimeSteppingSimulator id="sim">
    <DynamicBody dynamic-body-id="ground"/>
    <DynamicBody dynamic-body-id="m"/>
    <RecurrentForce recurrent-force-id="g"/>
  </TimeSteppingSimulator>
</MOBY></XML>""")
        scene, st, opts = mobyxml.load(str(xml))
        assert scene.geom_nfaces is not None
        import numpy as np
        assert int(np.asarray(scene.geom_nfaces).max()) == 12
        import jax
        from moby_tpu.sim import stepper

        @jax.jit
        def roll(s):
            def step1(s, _):
                return stepper.step(scene, s, 0.01), None
            return jax.lax.scan(step1, s, None, length=40)[0]

        fin = roll(st)
        assert abs(float(fin.pos[1, 2]) - 0.4) < 8e-3  # rests on the plane

    def test_polyhedron_tag(self, tmp_path):
        import numpy as np
        from tests.test_trimesh import cube_mesh

        v, f = cube_mesh(0.3)
        obj = tmp_path / "poly.obj"
        self._write_obj(obj, v, f)
        xml = tmp_path / "scene.xml"
        xml.write_text(f"""<XML><MOBY>
  <Polyhedron id="poly" filename="{obj}" mass="1.0"/>
  <Plane id="gp" rpy="1.5707963267949 0 0"/>
  <GravityForce id="g" accel="0 0 -9.81"/>
  <RigidBody id="ground" enabled="false">
    <CollisionGeometry primitive-id="gp"/>
  </RigidBody>
  <RigidBody id="p" position="0 0 0.5">
    <CollisionGeometry primitive-id="poly"/>
    <InertiaFromPrimitive primitive-id="poly"/>
  </RigidBody>
  <TimeSteppingSimulator id="sim">
    <DynamicBody dynamic-body-id="ground"/>
    <DynamicBody dynamic-body-id="p"/>
    <RecurrentForce recurrent-force-id="g"/>
  </TimeSteppingSimulator>
</MOBY></XML>""")
        scene, st, opts = mobyxml.load(str(xml))
        assert scene.n_pairs == 1

    def test_tetramesh_warns(self, tmp_path):
        import warnings

        xml = tmp_path / "scene.xml"
        xml.write_text("""<XML><MOBY>
  <TetraMesh id="t" filename="none.tetra"/>
  <TimeSteppingSimulator id="sim"/>
</MOBY></XML>""")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            mobyxml.load(str(xml))
        assert any("TetraMesh" in str(x.message) for x in w)
