"""Behavioral dynamics tests: falling, impacting, bouncing, resting."""

import numpy as np
import jax
import jax.numpy as jnp

from moby_tpu.core import scene as sc
from moby_tpu.sim import stepper
from moby_tpu.math import quaternion as quat


def build_ball(z0=1.5, eps=0.0, vz=0.0, plane_up="z"):
    b = sc.SceneBuilder()
    if plane_up == "z":
        g = [0, 0, -9.81]
        pos = np.array([0, 0, z0])
        pq = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))
    else:
        g = [0, -9.81, 0]
        pos = np.array([0, z0, 0])
        pq = np.array([0, 0, 0, 1.0])
    b.set_gravity(g)
    b.add_body("ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 1.0), pos=pos,
               lin_vel=np.array([0, 0, vz]) if plane_up == "z" else np.array([0, vz, 0]))
    b.add_body("ground", enabled=False)
    b.add_geom("ball", sc.SPHERE, [1.0])
    b.add_geom("ground", sc.PLANE, [0.0], quat=pq)
    b.set_contact_params("ground", "ball", sc.ContactParams(epsilon=eps, nk=4))
    return b.compile()


def run(scene, st, dt, n):
    step_j = jax.jit(lambda s: stepper.step(scene, s, dt))
    hist = []
    for _ in range(n):
        st = step_j(st)
        hist.append(np.asarray(st.pos[0]))
    return st, np.stack(hist)


class TestFallingBall:
    def test_falls_lands_rests(self):
        scene, st = build_ball(z0=1.5, eps=0.0)
        st, hist = run(scene, st, 0.01, 60)
        z = hist[:, 2]
        # ball falls then rests at z = 1 (on top of the plane), no penetration
        assert z.min() > 1.0 - 1e-6
        assert abs(z[-1] - 1.0) < 1e-6
        assert abs(float(st.vel[0, 2])) < 1e-8

    def test_no_tunneling_fast_drop(self):
        # high speed into the plane, step large enough to tunnel without CA
        scene, st = build_ball(z0=2.0, eps=0.0, vz=-50.0)
        st, hist = run(scene, st, 0.01, 30)
        z = hist[:, 2]
        assert z.min() > 1.0 - 1e-6

    def test_bounce_restitution_one(self):
        # eps=1: elastic bounce, returns near initial height
        scene, st = build_ball(z0=2.0, eps=1.0)
        st, hist = run(scene, st, 0.005, 250)
        z = hist[:, 2]
        assert z.min() > 1.0 - 1e-6
        # after bouncing it should get back close to its drop height
        assert z.max() > 1.9

    def test_y_up_plane_unrotated(self):
        # Moby's Plane primitive is y=0 with +y normal when unrotated
        scene, st = build_ball(z0=1.2, eps=0.0, plane_up="y")
        st, hist = run(scene, st, 0.01, 40)
        y = hist[:, 1]
        assert y.min() > 1.0 - 1e-6
        assert abs(y[-1] - 1.0) < 1e-6


class TestEnergy:
    def test_free_flight_energy_conserved(self):
        scene, st = build_ball(z0=50.0, eps=0.0)
        dt = 0.01
        step_j = jax.jit(lambda s: stepper.step(scene, s, dt))
        e0 = 9.81 * float(st.pos[0, 2])
        for _ in range(50):
            st = step_j(st)
        # semi-implicit Euler conserves energy to O(h) per step here
        e1 = 9.81 * float(st.pos[0, 2]) + 0.5 * float(jnp.sum(st.vel[0] ** 2))
        assert abs(e1 - e0) / e0 < 0.01

    def test_spinning_sphere_keeps_omega(self):
        # frictionless contact: spin is unaffected
        scene, st = build_ball(z0=1.0, eps=0.0)
        st = st.replace(omega=st.omega.at[0, 1].set(10.0))
        st, _ = run(scene, st, 0.01, 20)
        np.testing.assert_allclose(float(st.omega[0, 1]), 10.0, atol=1e-9)
