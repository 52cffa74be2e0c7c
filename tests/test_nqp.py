"""True-friction-cone (NQP) impact model tests.

Reference semantics: contact_NK == UINF routes the whole impact problem to
`solve_nqp` (ImpactConstraintHandler.cpp:629-640, 562-567); the NQP minimizes
the same KE objective under the exact Coulomb cone
cs^2 + ct^2 <= mu^2 cn^2 (NQP_IPOPT::eval_g, src/NQP_IPOPT.cpp:419)."""

import numpy as np
import jax
import jax.numpy as jnp

from moby_tpu.core import scene as sc
from moby_tpu.sim import stepper
from moby_tpu.math import quaternion as quat


def build_ball(z0=1.5, eps=0.0, vel=(0.0, 0.0, 0.0), mu=0.5, nk=0):
    b = sc.SceneBuilder()
    b.set_gravity([0, 0, -9.81])
    pq = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))
    b.add_body(
        "ball",
        mass=1.0,
        inertia=sc.sphere_inertia(1.0, 1.0),
        pos=np.array([0, 0, z0]),
        lin_vel=np.array(vel),
    )
    b.add_body("ground", enabled=False)
    b.add_geom("ball", sc.SPHERE, [1.0])
    b.add_geom("ground", sc.PLANE, [0.0], quat=pq)
    b.set_contact_params(
        "ground", "ball", sc.ContactParams(epsilon=eps, mu_coulomb=mu, nk=nk)
    )
    return b.compile()


def run(scene, st, dt, n):
    step_j = jax.jit(lambda s: stepper.step(scene, s, dt))
    for _ in range(n):
        st = step_j(st)
    return st


class TestDispatch:
    def test_nk_zero_selects_nqp(self):
        scene, _ = build_ball(nk=0)
        assert scene.use_nqp and not scene.use_noslip

    def test_nk_four_selects_qp(self):
        scene, _ = build_ball(nk=4)
        assert not scene.use_nqp


class TestRest:
    def test_ball_rests_on_plane(self):
        scene, st = build_ball(z0=1.5, nk=0)
        st = run(scene, st, 0.01, 60)
        assert float(st.pos[0, 2]) > 1.0 - 1e-5
        assert abs(float(st.pos[0, 2]) - 1.0) < 1e-3
        assert abs(float(st.vel[0, 2])) < 1e-5


class TestTrueCone:
    def test_sliding_decelerates_isotropically(self):
        """A ball sliding diagonally must decelerate along -v with
        |dv_t| ~ mu*g*dt per resting step; the true cone applies the same
        friction in every tangent direction (no polygonal bias)."""
        mu = 0.3
        v0 = np.array([1.0, 1.0, 0.0]) / np.sqrt(2.0) * 2.0
        scene, st = build_ball(z0=1.0, vel=tuple(v0), mu=mu, nk=0)
        dt = 0.01
        step_j = jax.jit(lambda s: stepper.step(scene, s, dt))
        dirs = []
        for _ in range(30):
            st = step_j(st)
            vt = np.asarray(st.vel[0, :2])
            if np.linalg.norm(vt) > 0.2:
                dirs.append(vt / np.linalg.norm(vt))
        v1 = np.asarray(st.vel[0, :2])
        # decelerated roughly by mu*g*t (ball may also trade slip for spin,
        # so only require a meaningful bite and direction preservation)
        assert np.linalg.norm(v1) < np.linalg.norm(v0[:2]) - 0.2
        d0 = v0[:2] / np.linalg.norm(v0[:2])
        for d in dirs:
            assert float(np.dot(d, d0)) > 0.999, "lateral deflection"

    def test_friction_magnitude_matches_cone(self):
        """Tangential impulse saturates at mu * cn during slide (not the
        sqrt(2)-inflated polygon corner)."""
        mu = 0.4
        scene, st = build_ball(z0=1.0, vel=(3.0, 0.0, 0.0), mu=mu, nk=0)
        dt = 0.01
        step_j = jax.jit(lambda s: stepper.step(scene, s, dt))
        st1 = step_j(st)
        dvx = float(st1.vel[0, 0] - st.vel[0, 0])
        # expected tangential slow-down <= mu * (g*dt + settle impulse);
        # must be within a factor, and nonzero
        assert dvx < 0.0
        assert abs(dvx) <= mu * 9.81 * dt * 3.0 + 1e-3

    def test_matches_fine_polygonal_qp(self):
        """NK -> infinity limit: the NQP solution should approach the
        polygonal QP with many cone edges."""
        mu = 0.3
        v0 = (1.2, 0.7, 0.0)
        sc_nqp, st_nqp = build_ball(z0=1.0, vel=v0, mu=mu, nk=0)
        sc_qp, st_qp = build_ball(z0=1.0, vel=v0, mu=mu, nk=32)
        dt = 0.01
        st_nqp = run(sc_nqp, st_nqp, dt, 20)
        st_qp = run(sc_qp, st_qp, dt, 20)
        v_a = np.asarray(st_nqp.vel[0])
        v_b = np.asarray(st_qp.vel[0])
        assert np.linalg.norm(v_a - v_b) < 0.08, (v_a, v_b)


class TestRestitution:
    def test_bounce_eps_one(self):
        scene, st = build_ball(z0=2.0, eps=1.0, nk=0)
        dt = 0.01
        step_j = jax.jit(lambda s: stepper.step(scene, s, dt))
        hmax = 0.0
        bounced = False
        for _ in range(120):
            st = step_j(st)
            if float(st.vel[0, 2]) > 0.1:
                bounced = True
            hmax = max(hmax, float(st.pos[0, 2]))
        assert bounced
        assert hmax > 1.7  # near-elastic return
        assert float(st.pos[0, 2]) > 1.0 - 1e-5
