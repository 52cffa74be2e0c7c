"""SDF reader: universal joints, surface->ContactParameters, multi-model
worlds (reference SDFReader, src/SDFReader.cpp:160-479, 464 universal,
1130-1171 surface, 331-350 pair combination)."""

import numpy as np
import jax

from moby_tpu.core import scene as sc
from moby_tpu.dynamics import model as amdl
from moby_tpu.io import sdfio
from moby_tpu.sim import stepper


UNIVERSAL_SDF = """<sdf version="1.5"><model name="upend">
  <link name="base">
    <pose>0 0 1 0 0 0</pose>
    <inertial><mass>1.0</mass>
      <inertia><ixx>0.1</ixx><iyy>0.1</iyy><izz>0.1</izz></inertia>
    </inertial>
  </link>
  <link name="bob">
    <pose>0 0 0.5 0 0 0</pose>
    <inertial><mass>1.0</mass>
      <inertia><ixx>0.01</ixx><iyy>0.01</iyy><izz>0.01</izz></inertia>
    </inertial>
    <collision name="c"><geometry><sphere><radius>0.1</radius></sphere></geometry>
      <surface>
        <bounce><restitution_coefficient>0.4</restitution_coefficient></bounce>
        <friction><moby><mu_coulomb>0.7</mu_coulomb>
          <num_friction_edges>8</num_friction_edges></moby></friction>
      </surface>
    </collision>
  </link>
  <joint name="uj" type="universal">
    <parent>base</parent><child>bob</child>
    <pose>0 0 0.5 0 0 0</pose>
    <axis><xyz>1 0 0</xyz></axis>
    <axis2><xyz>0 1 0</xyz></axis2>
  </joint>
  <joint name="anchor" type="fixed">
    <parent>world</parent><child>base</child>
  </joint>
</model></sdf>"""


class TestUniversalJoint:
    def test_loads_and_swings(self, tmp_path):
        p = tmp_path / "upend.sdf"
        p.write_text(UNIVERSAL_SDF)
        scene, st, opts = sdfio.load(str(p))
        m = scene.arts[0].model
        assert amdl.UNIVERSAL in list(np.asarray(m.jtype))
        assert scene.nq_art == 2 and scene.nv_art == 2
        # kick both dofs and integrate: both angles move
        st = st.replace(qd_art=st.qd_art + np.array([0.5, -0.3]))

        @jax.jit
        def roll(s):
            def f(s, _):
                return stepper.step(scene, s, 0.01), None
            return jax.lax.scan(f, s, None, length=20)[0]

        fin = roll(st)
        q = np.asarray(fin.q_art)
        assert abs(q[0]) > 1e-3 and abs(q[1]) > 1e-3
        assert np.all(np.isfinite(np.asarray(fin.qd_art)))


class TestSurfaceParams:
    def test_pairwise_combination(self, tmp_path):
        """Two single-link models with surfaces: contact params are the
        reference's averages (epsilon, mu) and max (NK)."""
        sdf = """<sdf version="1.5"><world name="w">
  <model name="a">
    <link name="l">
      <pose>0 0 1 0 0 0</pose>
      <inertial><mass>1.0</mass>
        <inertia><ixx>0.1</ixx><iyy>0.1</iyy><izz>0.1</izz></inertia>
      </inertial>
      <collision name="c"><geometry><sphere><radius>0.5</radius></sphere></geometry>
        <surface>
          <bounce><restitution_coefficient>0.2</restitution_coefficient></bounce>
          <friction><moby><mu_coulomb>0.4</mu_coulomb>
            <num_friction_edges>4</num_friction_edges></moby></friction>
        </surface>
      </collision>
    </link>
  </model>
  <model name="b">
    <link name="l">
      <pose>0 0 3 0 0 0</pose>
      <inertial><mass>1.0</mass>
        <inertia><ixx>0.1</ixx><iyy>0.1</iyy><izz>0.1</izz></inertia>
      </inertial>
      <collision name="c"><geometry><sphere><radius>0.5</radius></sphere></geometry>
        <surface>
          <bounce><restitution_coefficient>0.6</restitution_coefficient></bounce>
          <friction><moby><mu_coulomb>0.8</mu_coulomb>
            <num_friction_edges>16</num_friction_edges></moby></friction>
        </surface>
      </collision>
    </link>
  </model>
</world></sdf>"""
        p = tmp_path / "world.sdf"
        p.write_text(sdf)
        scene, st, opts = sdfio.load(str(p))
        assert scene.n_pairs >= 1
        mu = np.asarray(scene.slot_mu_c)
        eps = np.asarray(scene.slot_eps)
        # averages: mu = (0.4+0.8)/2 = 0.6, eps = (0.2+0.6)/2 = 0.4
        assert np.any(np.isclose(mu, 0.6)), mu
        assert np.any(np.isclose(eps, 0.4)), eps

    def test_surface_defaults(self, tmp_path):
        """A collision without <surface> gets the reference defaults
        (mu_c = 0.2, eps = 0, NK = 4)."""
        sdf = UNIVERSAL_SDF.replace(
            "<surface>", "<ignored-surface>"
        ).replace("</surface>", "</ignored-surface>")
        p = tmp_path / "d.sdf"
        p.write_text(sdf)
        scene, st, opts = sdfio.load(str(p))
        assert scene is not None


class TestFloatingBase:
    def test_nonstatic_model_falls(self, tmp_path):
        """SDF: a non-static model with no world joint is free-floating and
        falls under gravity (reference SDFReader model base handling)."""
        sdf = """<sdf version="1.5"><model name="ball">
  <link name="l">
    <pose>0 0 2 0 0 0</pose>
    <inertial><mass>1.0</mass>
      <inertia><ixx>0.1</ixx><iyy>0.1</iyy><izz>0.1</izz></inertia>
    </inertial>
    <collision name="c"><geometry><sphere><radius>0.3</radius></sphere></geometry></collision>
  </link>
</model></sdf>"""
        p = tmp_path / "ball.sdf"
        p.write_text(sdf)
        scene, st, opts = sdfio.load(str(p))

        @jax.jit
        def roll(s):
            def f(s, _):
                return stepper.step(scene, s, 0.01), None
            return jax.lax.scan(f, s, None, length=30)[0]

        fin = roll(st)
        # base link height came down from 2.0
        from moby_tpu.sim import kinematics
        pt = kinematics.compute(scene, fin)
        import numpy as np
        z = float(np.asarray(pt.pos)[-1, 2])
        assert z < 1.99, f"model did not fall: z={z}"

    def test_static_model_stays(self, tmp_path):
        sdf = """<sdf version="1.5"><model name="wall">
  <static>true</static>
  <link name="l">
    <pose>0 0 2 0 0 0</pose>
    <inertial><mass>1.0</mass>
      <inertia><ixx>0.1</ixx><iyy>0.1</iyy><izz>0.1</izz></inertia>
    </inertial>
    <collision name="c"><geometry><sphere><radius>0.3</radius></sphere></geometry></collision>
  </link>
</model></sdf>"""
        p = tmp_path / "wall.sdf"
        p.write_text(sdf)
        scene, st, opts = sdfio.load(str(p))

        @jax.jit
        def roll(s):
            def f(s, _):
                return stepper.step(scene, s, 0.01), None
            return jax.lax.scan(f, s, None, length=10)[0]

        fin = roll(st)
        from moby_tpu.sim import kinematics
        pt = kinematics.compute(scene, fin)
        import numpy as np
        z = float(np.asarray(pt.pos)[-1, 2])
        assert abs(z - 2.0) < 1e-9
