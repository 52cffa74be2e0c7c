"""Articulated dynamics tests: ABA vs CRB cross-check (mirroring the
reference's fsab/crb switch), analytic pendulum, energy conservation."""

import numpy as np
import jax.numpy as jnp
import pytest

from moby_tpu.dynamics import model as mdl
from moby_tpu.dynamics import aba


def make_pendulum(length=1.0, mass=1.0, axis=(0, 0, 1)):
    """Single revolute joint about `axis` at origin; rod COM at (-l/2? )...
    Link frame at the joint; COM offset l/2 along -y (hanging down at q=0)."""
    j = mdl.JointDef(
        jtype=mdl.REVOLUTE,
        Xt_E=np.eye(3),
        Xt_r=np.zeros(3),
        axis=np.asarray(axis, float),
    )
    link = mdl.LinkDef(
        name="rod",
        mass=mass,
        com=np.array([0.0, -length / 2, 0.0]),
        inertia_com=np.diag([mass * length**2 / 12, 1e-12, mass * length**2 / 12]),
        joint=j,
    )
    m = mdl.ArticulatedModel([link], floating=False)
    m.set_parents([-1])
    return m


def make_double_pendulum(l1=1.0, l2=1.0, m1=1.0, m2=1.0):
    j1 = mdl.JointDef(
        jtype=mdl.REVOLUTE, Xt_E=np.eye(3), Xt_r=np.zeros(3), axis=np.array([0.0, 0, 1])
    )
    link1 = mdl.LinkDef(
        name="l1",
        mass=m1,
        com=np.array([0.0, -l1 / 2, 0.0]),
        inertia_com=np.diag([m1 * l1**2 / 12, 1e-12, m1 * l1**2 / 12]),
        joint=j1,
    )
    j2 = mdl.JointDef(
        jtype=mdl.REVOLUTE,
        Xt_E=np.eye(3),
        Xt_r=np.array([0.0, -l1, 0.0]),
        axis=np.array([0.0, 0, 1]),
    )
    link2 = mdl.LinkDef(
        name="l2",
        mass=m2,
        com=np.array([0.0, -l2 / 2, 0.0]),
        inertia_com=np.diag([m2 * l2**2 / 12, 1e-12, m2 * l2**2 / 12]),
        joint=j2,
    )
    m = mdl.ArticulatedModel([link1, link2], floating=False)
    m.set_parents([-1, 0])
    return m


GRAV = jnp.array([0.0, -9.81, 0.0])


class TestPendulum:
    def test_equilibrium(self):
        m = make_pendulum()
        qdd = aba.aba(m, jnp.zeros(1), jnp.zeros(1), jnp.zeros(1), GRAV)
        np.testing.assert_allclose(qdd, 0.0, atol=1e-12)

    def test_small_angle_accel(self):
        # qdd = -(m g l/2 sinq) / (I_com + m l^2/4)
        m = make_pendulum()
        q = jnp.array([0.3])
        qdd = aba.aba(m, q, jnp.zeros(1), jnp.zeros(1), GRAV)
        I = 1.0 / 12 + 0.25
        expected = -9.81 * 0.5 * np.sin(0.3) / I
        np.testing.assert_allclose(qdd[0], expected, rtol=1e-10)

    def test_aba_equals_crb(self):
        m = make_double_pendulum()
        rng = np.random.default_rng(0)
        for _ in range(5):
            q = jnp.array(rng.normal(size=2))
            qd = jnp.array(rng.normal(size=2))
            tau = jnp.array(rng.normal(size=2))
            a1 = aba.aba(m, q, qd, tau, GRAV)
            a2 = aba.fwd_dyn_crb(m, q, qd, tau, GRAV)
            np.testing.assert_allclose(a1, a2, atol=1e-9)

    def test_rnea_inverse_of_aba(self):
        m = make_double_pendulum()
        rng = np.random.default_rng(1)
        q = jnp.array(rng.normal(size=2))
        qd = jnp.array(rng.normal(size=2))
        tau = jnp.array(rng.normal(size=2))
        qdd = aba.aba(m, q, qd, tau, GRAV)
        tau2 = aba.rnea(m, q, qd, qdd, GRAV)
        np.testing.assert_allclose(tau, tau2, atol=1e-9)

    def test_energy_conservation(self):
        # symplectic Euler, small step: energy drift bounded
        m = make_pendulum()
        q = jnp.array([1.0])
        qd = jnp.array([0.0])
        h = 1e-3

        def energy(q, qd):
            I = 1.0 / 12 + 0.25
            ke = 0.5 * I * float(qd[0]) ** 2
            pe = -9.81 * 0.5 * np.cos(float(q[0]))
            return ke + pe

        e0 = energy(q, qd)
        for _ in range(2000):
            qdd = aba.aba(m, q, qd, jnp.zeros(1), GRAV)
            qd = qd + h * qdd
            q = q + h * qd
        assert abs(energy(q, qd) - e0) < 5e-3

    def test_double_pendulum_vs_lagrangian(self):
        # compare accelerations against the closed-form double-pendulum
        # equations (point-mass form) by using near-point-mass links
        l1 = l2 = 1.0
        m1 = m2 = 1.0
        j1 = mdl.JointDef(jtype=mdl.REVOLUTE, Xt_E=np.eye(3), Xt_r=np.zeros(3), axis=np.array([0.0, 0, 1]))
        link1 = mdl.LinkDef("p1", m1, np.array([0.0, -l1, 0.0]), np.eye(3) * 1e-12, j1)
        j2 = mdl.JointDef(jtype=mdl.REVOLUTE, Xt_E=np.eye(3), Xt_r=np.array([0.0, -l1, 0.0]), axis=np.array([0.0, 0, 1]))
        link2 = mdl.LinkDef("p2", m2, np.array([0.0, -l2, 0.0]), np.eye(3) * 1e-12, j2)
        m = mdl.ArticulatedModel([link1, link2], floating=False)
        m.set_parents([-1, 0])

        g = 9.81
        rng = np.random.default_rng(3)
        for _ in range(4):
            t1, t2 = rng.normal(size=2) * 0.8
            w1, w2 = rng.normal(size=2)
            q = jnp.array([t1, t2])
            qd = jnp.array([w1, w2])
            qdd = aba.aba(m, q, qd, jnp.zeros(2), GRAV)

            # standard double pendulum ODE (absolute angles a1, a2)
            a1, a2 = t1, t2 + t1
            ad1, ad2 = w1, w1 + w2
            d = a2 - a1
            M = np.array(
                [
                    [(m1 + m2) * l1, m2 * l2 * np.cos(d)],
                    [l1 * np.cos(d), l2],
                ]
            )
            rhs = np.array(
                [
                    m2 * l2 * ad2**2 * np.sin(d) - (m1 + m2) * g * np.sin(a1),
                    -l1 * ad1**2 * np.sin(d) - g * np.sin(a2),
                ]
            )
            add = np.linalg.solve(M, rhs)  # [a1dd, a2dd]
            expected = np.array([add[0], add[1] - add[0]])
            np.testing.assert_allclose(np.asarray(qdd), expected, rtol=1e-6, atol=1e-8)
