"""Cone-plane narrow phase (reference ConePrimitive: axis local Y, apex at
+H/2, base radius R at -H/2; src/ConePrimitive.cpp:110-150)."""

import numpy as np
import jax
import jax.numpy as jnp

from moby_tpu.core import scene as sc
from moby_tpu.sim import stepper
from moby_tpu.math import quaternion as quat

UP_XZ = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))


def build_cone(pos, q=None, vel=(0, 0, 0), mu=0.0, eps=0.0):
    b = sc.SceneBuilder()
    b.set_gravity([0, 0, -9.81])
    r, h, m = 0.5, 1.0, 1.0
    iy = m * r * r / 3.0
    ix = 0.1 * m * h * h + 3.0 / 20.0 * m * r * r
    b.add_body(
        "cone",
        mass=m,
        inertia=np.diag([ix, iy, ix]),
        pos=np.array(pos, float),
        quat=np.array(q if q is not None else [0, 0, 0, 1.0]),
        lin_vel=np.array(vel, float),
    )
    b.add_body("ground", enabled=False)
    b.add_geom("cone", sc.CONE, [r, h])
    b.add_geom("ground", sc.PLANE, [0.0], quat=UP_XZ)
    b.set_contact_params(
        "ground", "cone", sc.ContactParams(epsilon=eps, mu_coulomb=mu)
    )
    return b.compile()


def run(scene, st, dt, n):
    step_j = jax.jit(lambda s: stepper.step(scene, s, dt))
    for _ in range(n):
        st = step_j(st)
    return st


class TestConePlane:
    def test_base_down_rests(self):
        # base faces the plane: local +Y (apex) must point up = world +Z
        q = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))
        scene, st = build_cone([0, 0, 0.7], q=q, mu=0.5)
        st = run(scene, st, 0.01, 60)
        # rests with base at z=0 -> center at H/2 = 0.5
        assert abs(float(st.pos[0, 2]) - 0.5) < 2e-2
        assert abs(float(st.vel[0, 2])) < 1e-4

    def test_apex_down_point_contact(self):
        # apex faces the plane (local +Y points down)
        q = np.asarray(quat.from_rpy(jnp.array([-1.5707963267949, 0, 0])))
        scene, st = build_cone([0, 0, 0.8], q=q, mu=0.0)
        st = run(scene, st, 0.01, 40)
        # apex at z=0 -> center at +0.5; frictionless point balance is
        # unstable but short horizon keeps it near
        assert float(st.pos[0, 2]) > 0.45
        assert float(st.pos[0, 2]) < 0.65

    def test_no_tunneling(self):
        q = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))
        scene, st = build_cone([0, 0, 2.0], q=q, vel=(0, 0, -20.0))
        st = run(scene, st, 0.01, 30)
        assert float(st.pos[0, 2]) > 0.45
