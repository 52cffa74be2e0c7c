"""Full-stepper tests with articulated bodies: pendulum in the scene pipeline,
joint limits, articulated-vs-free-body contact coupling."""

import numpy as np
import jax
import jax.numpy as jnp

from moby_tpu.core import scene as sc
from moby_tpu.dynamics import model as mdl
from moby_tpu.sim import stepper
from moby_tpu.math import quaternion as quat


def pendulum_model(lo=None, hi=None):
    j = mdl.JointDef(
        jtype=mdl.REVOLUTE,
        Xt_E=np.eye(3),
        Xt_r=np.zeros(3),
        axis=np.array([0.0, 0, 1]),
        lo=np.array([lo]) if lo is not None else None,
        hi=np.array([hi]) if hi is not None else None,
    )
    link = mdl.LinkDef(
        name="rod",
        mass=1.0,
        com=np.array([0.0, -0.5, 0.0]),
        inertia_com=np.diag([1.0 / 12, 1e-12, 1.0 / 12]),
        joint=j,
    )
    m = mdl.ArticulatedModel([link], floating=False)
    m.set_parents([-1])
    return m


class TestPendulumScene:
    def test_swing_energy(self):
        b = sc.SceneBuilder()
        b.set_gravity([0, -9.81, 0])
        b.add_articulated("pend", pendulum_model(), q0=np.array([1.0]))
        scene, st = b.compile()
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.001))

        def energy(s):
            I = 1.0 / 12 + 0.25
            ke = 0.5 * I * float(s.qd_art[0]) ** 2
            pe = -9.81 * 0.5 * np.cos(float(s.q_art[0]))
            return ke + pe

        e0 = energy(st)
        for _ in range(500):
            st = step_j(st)
        assert abs(energy(st) - e0) < 5e-3
        # it actually swings
        assert abs(float(st.q_art[0]) - 1.0) > 0.1

    def test_joint_limit_stops(self):
        # pendulum released from q=1 with a hard lower limit at q=0.5
        b = sc.SceneBuilder()
        b.set_gravity([0, -9.81, 0])
        b.add_articulated("pend", pendulum_model(lo=0.5, hi=3.0), q0=np.array([1.0]))
        scene, st = b.compile()
        assert scene.n_limits == 2
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.001))
        qs = []
        for _ in range(800):
            st = step_j(st)
            qs.append(float(st.q_art[0]))
        qs = np.array(qs)
        # never (meaningfully) below the stop, and it reached the stop
        assert qs.min() > 0.5 - 1e-3
        assert qs.min() < 0.52

    def test_pendulum_hits_ball(self):
        # articulated pendulum with a sphere on its tip strikes a free ball
        # (zero gravity): momentum transfer through the mixed
        # articulated/free contact solver
        b = sc.SceneBuilder()
        b.set_gravity([0, 0, 0])
        m = pendulum_model()
        # swinging from horizontal (+x side) toward hanging (q: pi/2 -> 0)
        b.add_articulated(
            "pend", m, q0=np.array([np.pi / 2]), qd0=np.array([-2.0])
        )
        b.add_geom("pend/rod", sc.SPHERE, [0.1], pos=np.array([0, -1.0, 0]))
        b.add_body(
            "ball",
            mass=0.1,
            inertia=sc.sphere_inertia(0.1, 0.1),
            pos=np.array([0.15, -1.1, 0.0]),
        )
        b.add_geom("ball", sc.SPHERE, [0.1])
        b.set_contact_params(
            "pend", "ball", sc.ContactParams(epsilon=0.5, mu_coulomb=0.0, nk=4)
        )
        scene, st = b.compile()
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.002))
        hit = False
        for _ in range(500):
            st = step_j(st)
            if np.linalg.norm(np.asarray(st.vel[0])) > 0.1:
                hit = True
                break
        assert hit, "ball was never struck"
        # ball knocked along the tip's direction of motion (-x-ish, -y-ish)
        v = np.asarray(st.vel[0])
        assert v[0] < 0.0
        # pendulum lost angular speed
        assert float(st.qd_art[0]) > -2.0
