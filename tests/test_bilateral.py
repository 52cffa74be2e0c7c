"""Bilateral implicit-constraint tests: gears coupling, point (loop) joints."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moby_tpu.core import scene as sc
from moby_tpu.sim import stepper


class TestGears:
    def test_pendulum_gears_xml(self):
        # the reference's example/gears/pendulum-gears.xml: pendulum joint q
        # drives joint q2 through a 10:1 gear
        from moby_tpu.io import mobyxml

        scene, st, opts = mobyxml.load(
            "/root/reference/example/gears/pendulum-gears.xml"
        )
        assert len(scene.bilaterals) == 1
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.001))
        for _ in range(300):
            st = step_j(st)
        qd = np.asarray(st.qd_art)
        # the pendulum swings, slowed by the reflected gear inertia:
        # I_eff = I_pivot + ratio^2 I_l2 ~ 102, so qdd ~ g/102 ~ 0.096,
        # giving qd ~ 0.029 after 0.3 s
        assert 0.02 < abs(qd[0]) < 0.05
        # gear constraint: qd_l2 = 10 * qd_l1 (inboard l2 col has +1,
        # outboard l1 has -ratio: qd_a - ratio*qd_b = 0)
        b = scene.bilaterals[0]
        resid = qd[b.col_a - 6 * scene.nb] - b.ratio * qd[b.col_b - 6 * scene.nb]
        assert abs(resid) < 1e-8 * max(1.0, np.abs(qd).max())
        # energy: gears add inertia coupling; motion stays bounded
        assert np.all(np.isfinite(qd))


class TestPointJoint:
    def test_two_body_chain(self):
        # two free spheres linked by a point constraint: pendulum-like swing
        # of the second body about the first (which is pinned to the world)
        b = sc.SceneBuilder()
        b.set_gravity([0, -9.81, 0])
        b.add_body("a", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.2),
                   pos=np.array([0.0, 0.0, 0.0]))
        b.add_body("anchor", enabled=False)
        b.add_body("c", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.2),
                   pos=np.array([1.0, 0.0, 0.0]))
        b.add_point_constraint("a", [0, 0, 0], "anchor", [0, 0, 0])
        b.add_point_constraint("a", [0.5, 0, 0], "c", [-0.5, 0, 0])
        scene, st = b.compile()
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.002))
        for _ in range(400):
            st = step_j(st)
        pa = np.asarray(st.pos[0])
        pc = np.asarray(st.pos[2])
        # body a stays pinned at the origin
        assert np.linalg.norm(pa) < 1e-3
        # the link distance is preserved
        d = np.linalg.norm(
            (pa + _rot(st.quat[0], [0.5, 0, 0])) - (pc + _rot(st.quat[2], [-0.5, 0, 0]))
        )
        assert d < 1e-3
        # it actually swings (c dropped below its start height)
        assert pc[1] < -0.3


def _rot(q, v):
    from moby_tpu.math import quaternion as quat

    return np.asarray(quat.rotate(q, jnp.asarray(v, q.dtype)))
