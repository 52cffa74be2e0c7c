"""Behavior tests over the reference's example scenes (those without golden
trajectories): spinning boxes, ramp, reduced-coords pendulum, bouncing ball.
Each asserts the physically-expected qualitative outcome."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moby_tpu.io import mobyxml
from moby_tpu.sim import stepper

EX = "/root/reference/example"


def run(scene, st, dt, n):
    step_j = jax.jit(lambda s: stepper.step(scene, s, dt))
    for _ in range(n):
        st = step_j(st)
    return st


class TestSpinningBoxes:
    def test_frictionless_keeps_spinning(self):
        scene, st, opts = mobyxml.load(f"{EX}/simple-contact/spinning-box-frictionless.xml")
        w0 = np.asarray(st.omega).copy()
        box = int(np.argmax(np.asarray(scene.enabled)))
        st = run(scene, st, opts.step_size, 100)
        w1 = np.asarray(st.omega)
        # frictionless contact: spin about the vertical axis is preserved
        np.testing.assert_allclose(w1[box, 1], w0[box, 1], rtol=1e-6)

    def test_frictional_spin_decays(self):
        # note: the Drumwright–Shell KE-minimizing QP trades normal impulse
        # for friction saturation on fast-spinning contacts, so the box
        # "skitters" (small hops) while the spin brakes — a property of the
        # reference's model itself, not an artifact of this implementation.
        # Invariants: spin decays, energy never grows, hops stay small.
        scene, st, opts = mobyxml.load(f"{EX}/simple-contact/spinning-box-frictional.xml")
        box = int(np.argmax(np.asarray(scene.enabled)))
        w0 = abs(float(st.omega[box, 1]))

        def energy(s):
            I = 1.0 / 6.0
            return (
                9.81 * float(s.pos[box, 1])
                + 0.5 * float(jnp.sum(s.vel[box] ** 2))
                + 0.5 * I * float(jnp.sum(s.omega[box] ** 2))
            )

        e0 = energy(st)
        step_j = jax.jit(lambda s: stepper.step(scene, s, opts.step_size))
        ymax = 0.0
        for _ in range(150):
            st = step_j(st)
            ymax = max(ymax, float(st.pos[box, 1]))
        w1 = abs(float(st.omega[box, 1]))
        assert w1 < w0 * 0.9, f"spin {w0} -> {w1} did not decay"
        assert energy(st) < e0 + 1e-6, "energy grew"
        assert ymax < 0.56, f"hops too large: {ymax}"
        assert float(st.pos[box, 1]) > 0.5 - 1e-6


class TestRamp:
    def test_box_rests_on_plane(self):
        scene, st, opts = mobyxml.load(f"{EX}/simple-contact/ramp.xml")
        box = int(np.argmax(np.asarray(scene.enabled)))
        y0 = float(st.pos[box, 1])
        st = run(scene, st, opts.step_size, 100)
        # the tilted-plane box creeps slightly (solver-tolerance-level slip
        # per impact accumulates); bound the drift, require no blow-up
        assert abs(float(st.pos[box, 1]) - y0) < 5e-2
        assert np.all(np.isfinite(np.asarray(st.pos)))


class TestReducedCoordsPendulum:
    def test_fast_spin_hits_upper_limit(self):
        # qd=100 rad/s revolute with limits [-10, 3.14], restitution 0.9:
        # the joint must stop at/bounce off the upper limit
        scene, st, opts = mobyxml.load(f"{EX}/reduced-coords/pendulum.xml")
        assert scene.n_limits == 2
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.001))
        qmax = -np.inf
        for _ in range(120):
            st = step_j(st)
            qmax = max(qmax, float(st.q_art[0]))
        assert qmax < 3.15, f"blew through the joint limit: {qmax}"
        assert qmax > 3.0, f"never reached the limit: {qmax}"
        # restitution bounced it back
        assert float(st.qd_art[0]) < 0.0


class TestBouncingBall:
    def test_loses_no_energy_with_eps_one(self):
        scene, st, opts = mobyxml.load(f"{EX}/bouncing-ball/bouncing-ball.xml")
        ball = int(np.argmax(np.asarray(scene.enabled)))
        e0 = 9.81 * float(st.pos[ball, 1]) + 0.5 * float(jnp.sum(st.vel[ball] ** 2))
        hmax = 0.0
        step_j = jax.jit(lambda s: stepper.step(scene, s, opts.step_size))
        bounced = False
        for i in range(100):
            st = step_j(st)
            vy = float(st.vel[ball, 1])
            if vy > 0.1:
                bounced = True
            hmax = max(hmax, float(st.pos[ball, 1]))
        assert bounced, "ball never bounced"
        # eps=1: returns near the initial height
        assert hmax > 1.35
        assert float(st.pos[ball, 1]) > 1.0 - 1e-6


class TestJointLimitChain:
    def test_five_link_chain_respects_limits(self):
        scene, st, opts = mobyxml.load(f"{EX}/joint-limits/chain.xml")
        assert scene.nv_art == 5 and scene.n_limits == 10
        # kick the first joint; tight limits on the others must hold
        st = st.replace(qd_art=st.qd_art.at[0].set(2.0))
        step_j = jax.jit(lambda s: stepper.step(scene, s, opts.step_size))
        lo = np.array([-1, -0.1, -0.5, -0.5, -0.5])
        hi = np.array([3.14, 0.1, 0.5, 0.5, 0.5])
        for _ in range(200):
            st = step_j(st)
            q = np.asarray(st.q_art)
            assert np.all(q >= lo - 2e-2) and np.all(q <= hi + 2e-2), q
        # the kick actually moved the chain
        assert abs(float(st.q_art[0]) - 1.5708) > 0.1


class TestPlanarJoint:
    def test_constraint_holds_while_sliding(self):
        """example/planar-joint/constrained.xml: the box spins at omega_x=100
        but the planar ImplicitConstraint forbids it — the spin is removed,
        y stays pinned, and tilted gravity slides the box in-plane."""
        scene, st, opts = mobyxml.load(f"{EX}/planar-joint/constrained.xml")
        assert len(scene.bilaterals) == 1
        step_j = jax.jit(lambda s: stepper.step(scene, s, 1e-3))
        for _ in range(500):
            st = step_j(st)
        assert abs(float(st.pos[0, 1]) - 0.5) < 1e-6        # pinned in y
        assert np.linalg.norm(np.asarray(st.omega[0])) < 1e-6  # spin killed
        # slides under the in-plane gravity components (1, ., 1): v = g*t
        assert abs(float(st.vel[0, 0]) - 0.5) < 5e-3
        assert abs(float(st.vel[0, 2]) - 0.5) < 5e-3


class TestFixedJointTable:
    def test_spinning_table_comes_to_rest(self):
        """example/fixed-joint/fixed-articulated-table.xml: a table of
        FixedJoint-welded parts initially rotating on the plane 'should come
        to rest' (scene header comment)."""
        scene, st, opts = mobyxml.load(
            f"{EX}/fixed-joint/fixed-articulated-table.xml"
        )
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.01))
        w0 = float(np.abs(np.asarray(st.qd_art)).max()) if scene.nv_art \
            else float(np.abs(np.asarray(st.omega)).max())
        for _ in range(150):
            st = step_j(st)
        qd = np.asarray(st.qd_art)
        assert np.all(np.isfinite(qd))
        assert np.abs(qd).max() < 0.5 * max(w0, 1.0)  # friction slows it


class TestMrobot:
    def test_pioneer_settles_on_wheels(self):
        """example/mrobot/mrobot.xml (SDF-embedded Pioneer 2dx): loads
        through the <SDF> tag and settles on the ground without falling
        through or blowing up."""
        scene, st, opts = mobyxml.load(f"{EX}/mrobot/mrobot.xml")
        assert scene.nv_art >= 6  # floating base + wheels
        step_j = jax.jit(lambda s: stepper.step(scene, s, 2e-3))
        for _ in range(150):
            st = step_j(st)
        q = np.asarray(st.q_art)
        assert np.all(np.isfinite(q))
        # base height bounded (started near the ground; must not tunnel)
        assert -0.05 < float(q[2]) < 0.5


class TestPartsFeeder:
    def test_part_rides_the_feeder(self):
        """example/parts-feeder/feeder.xml: a thin part rests on the tilted
        feeder tray (plane geometry on an articulated link vs box part)."""
        scene, st, opts = mobyxml.load(f"{EX}/parts-feeder/feeder.xml")
        step_j = jax.jit(lambda s: stepper.step(scene, s, 1e-3))
        for _ in range(200):
            st = step_j(st)
        assert np.all(np.isfinite(np.asarray(st.pos)))
        # the part must not fall through the tray (tray near z ~ 0)
        assert float(st.pos[0, 2]) > -0.2
