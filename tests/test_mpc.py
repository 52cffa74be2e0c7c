"""MPC layer tests: differentiability of the contact step and iLQR tasks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moby_tpu.core import scene as sc
from moby_tpu.math import quaternion as quat
from moby_tpu.mpc import contact_mpc, diffstep, ilqr


def build_ball_on_plane():
    b = sc.SceneBuilder()
    b.set_gravity([0, 0, -9.81])
    b.add_body(
        "ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.5),
        pos=np.array([0.0, 0.0, 0.5]),
    )
    b.add_body("ground", enabled=False)
    b.add_geom("ball", sc.SPHERE, [0.5])
    pq = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))
    b.add_geom("ground", sc.PLANE, [0.0], quat=pq)
    b.set_contact_params(
        "ground", "ball", sc.ContactParams(epsilon=0.0, mu_coulomb=0.0, nk=4)
    )
    return b.compile()


class TestDiffStep:
    def test_gradient_matches_finite_difference(self):
        scene, st = build_ball_on_plane()
        dt = 0.01
        f = contact_mpc.make_dynamics(scene, st, dt)
        x0 = contact_mpc.pack(scene, st)
        nu = scene.ngc

        # objective: x position of the ball after 5 steps under constant force
        def obj(u):
            x = x0
            for _ in range(5):
                x = f(x, u)
            return x[0]  # ball pos x

        u = jnp.zeros(nu).at[0].set(1.0)  # push +x while resting on the plane
        g = jax.grad(obj)(u)
        # finite difference on the force component
        eps = 1e-5
        for idx in [0, 2]:  # fx (free) and fz (into the contact)
            up = u.at[idx].add(eps)
            um = u.at[idx].add(-eps)
            fd = (obj(up) - obj(um)) / (2 * eps)
            np.testing.assert_allclose(g[idx], fd, rtol=1e-4, atol=1e-7)

    def test_contact_blocks_downward_force(self):
        # pressing into the plane does not accelerate the resting ball
        scene, st = build_ball_on_plane()
        dt = 0.01
        u = jnp.zeros(scene.ngc).at[2].set(-50.0)  # push down
        s = st
        for _ in range(5):
            s = diffstep.dstep(scene, s, dt, u)
        assert abs(float(s.pos[0, 2]) - 0.5) < 1e-6
        assert abs(float(s.vel[0, 2])) < 1e-8


class TestILQR:
    def test_double_integrator(self):
        # sanity: classic LQR-style problem
        dt = 0.1

        def f(x, u):
            return jnp.array([x[0] + dt * x[1], x[1] + dt * u[0]])

        def cost(x, u):
            return 0.01 * u[0] ** 2

        def cost_final(x):
            return 100.0 * ((x[0] - 1.0) ** 2 + x[1] ** 2)

        res = ilqr.ilqr(
            f, cost, cost_final, jnp.zeros(2), jnp.zeros((20, 1)), n_iters=15
        )
        assert abs(float(res.xs[-1, 0]) - 1.0) < 1e-2
        assert abs(float(res.xs[-1, 1])) < 5e-2

    def test_ball_push_to_target(self):
        # contact-MPC: slide a resting ball to x=0.5 with planar forces
        scene, st = build_ball_on_plane()
        prob = contact_mpc.MPCProblem(
            scene=scene, template=st, dt=0.02, horizon=25
        )
        target = jnp.array([0.5, 0.0])

        def cost(x, u):
            return 1e-4 * jnp.sum(u[:6] ** 2)

        def cost_final(x):
            # ball xy at target, low velocity
            return 50.0 * jnp.sum((x[0:2] - target) ** 2) + 1.0 * jnp.sum(
                x[7 * 1 : 7 * 1 + 3][:2] ** 2
            )

        res = contact_mpc.solve(prob, st, cost, cost_final, n_iters=12)
        xT = res.xs[-1]
        assert abs(float(xT[0]) - 0.5) < 0.05, f"final x = {float(xT[0])}"
        # stays on the plane throughout
        zs = res.xs[:, 2]
        assert float(jnp.min(zs)) > 0.5 - 1e-5
