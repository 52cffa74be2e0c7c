"""Compliant (penalty) contact tests: spring-damper settling."""

import numpy as np
import jax
import pytest

from moby_tpu.core import scene as sc
from moby_tpu.math import quaternion as quat
from moby_tpu.sim import stepper
import jax.numpy as jnp


def build_compliant_ball(kp=5000.0, kv=50.0):
    b = sc.SceneBuilder()
    b.set_gravity([0, 0, -9.81])
    b.add_body(
        "ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.5),
        pos=np.array([0.0, 0.0, 0.6]), compliant=True,
    )
    b.add_body("ground", enabled=False)
    b.add_geom("ball", sc.SPHERE, [0.5])
    pq = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))
    b.add_geom("ground", sc.PLANE, [0.0], quat=pq)
    b.set_contact_params(
        "ground", "ball",
        sc.ContactParams(penalty_kp=kp, penalty_kv=kv, mu_viscous=0.0),
    )
    # compliant scenes run with stabilization off (the reference idiom:
    # constraint-stabilization-max-iterations="0", e.g. ur10.xml)
    b.stab_max_iters = 0
    return b.compile()


class TestPenaltyContact:
    def test_settles_at_spring_compression(self):
        kp = 5000.0
        scene, st = build_compliant_ball(kp=kp, kv=100.0)
        assert scene.has_compliant
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.001))
        for _ in range(1500):
            st = step_j(st)
        z = float(st.pos[0, 2])
        # equilibrium: kp * depth = m g -> depth = 9.81/5000
        depth = 9.81 / kp
        assert abs(z - (0.5 - depth)) < 5e-4, f"z={z}, expected {0.5 - depth}"
        assert abs(float(st.vel[0, 2])) < 1e-3

    def test_no_rigid_impulses(self):
        # compliant contacts must not enter the rigid impact LCP: normal
        # velocity crosses zero smoothly (spring), no instantaneous stops
        scene, st = build_compliant_ball(kp=2000.0, kv=0.0)
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.001))
        vz_prev = 0.0
        max_jump = 0.0
        for _ in range(400):
            st = step_j(st)
            vz = float(st.vel[0, 2])
            max_jump = max(max_jump, abs(vz - vz_prev))
            vz_prev = vz
        # with dt=1e-3, accelerations bound velocity changes per step
        assert max_jump < 0.1, f"impulsive jump {max_jump}"
