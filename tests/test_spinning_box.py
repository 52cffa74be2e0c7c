"""Spinning-box friction validation (the reference's spinning-boxes regress
scenario: example/simple-contact/spinning-box-frictional.xml at the
regress/spinning-boxes.setup step size -s=0.01).

No golden .dat ships in the reference tree, so the oracle is invariants:
Coulomb friction at the four corner contacts must dissipate the spin
(KE non-increasing, |omega| monotonically decaying to rest), oppose slip
(no secular wander or lift), and the frictionless variant must conserve the
spin.
"""

import numpy as np
import jax
import jax.numpy as jnp

from moby_tpu.core import scene as sc
from moby_tpu.math import quaternion as quat
from moby_tpu.sim import stepper


def _spinning_box(mu, nk=8, omega=10.0):
    b = sc.SceneBuilder()
    b.set_gravity([0, 0, -9.81])
    b.add_body(
        "box", mass=1.0, inertia=sc.box_inertia(1.0, 0.5, 0.5, 0.5),
        pos=np.array([0, 0, 0.5]),
        ang_vel=np.array([0.0, 0.0, omega]),   # spin about the vertical
    )
    b.add_body("ground", enabled=False)
    b.add_geom("box", sc.BOX, [0.5, 0.5, 0.5])
    pq = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))
    b.add_geom("ground", sc.PLANE, [0.0], quat=pq)
    b.set_contact_params(
        "ground", "box",
        sc.ContactParams(epsilon=0.0, mu_coulomb=mu, mu_viscous=0.0, nk=nk),
    )
    return b.compile()


def _run(scene, st, n, dt=0.01):
    @jax.jit
    def roll(s):
        def f(s, _):
            s2 = stepper.step(scene, s, dt)
            ke = 0.5 * jnp.sum(s2.vel ** 2) + 0.5 * jnp.einsum(
                "bi,bij,bj->", s2.omega, scene.inertia, s2.omega
            )
            return s2, (s2.pos, s2.omega, ke)
        return jax.lax.scan(f, s, None, length=n)

    return roll(st)


class TestSpinningBox:
    def test_friction_dissipates_spin(self):
        scene, st = _spinning_box(mu=0.1)
        final, (pos, omega, ke) = _run(scene, st, 150)
        wz = np.asarray(omega[:, 0, 2])
        # spin monotonically non-increasing under friction (slip opposition)
        assert np.all(np.diff(wz) <= 1e-8), f"spin gained {np.max(np.diff(wz))}"
        assert wz[-1] < wz[0] - 5.0, f"spin barely decayed: {wz[-1]}"
        # no secular wander, no lift beyond the bounce band
        assert float(np.max(np.abs(np.asarray(pos)[:, 0, :2]))) < 1e-3
        assert abs(float(final.pos[0, 2]) - 0.5) < 1e-2

    def test_energy_never_exceeds_initial(self):
        scene, st = _spinning_box(mu=0.1)
        final, (pos, omega, ke) = _run(scene, st, 150)
        # total mechanical energy (KE + m g z) bounded by the initial value
        e = np.asarray(ke) + 9.81 * np.asarray(pos)[:, 0, 2]
        e0 = 0.5 * (1.0 / 6.0) * 10.0 ** 2 + 9.81 * 0.5
        assert e.max() <= e0 + 1e-6, f"energy gain {e.max() - e0}"

    def test_frictionless_conserves_spin(self):
        scene, st = _spinning_box(mu=0.0)
        final, (pos, omega, ke) = _run(scene, st, 100)
        wz = np.asarray(omega[:, 0, 2])
        np.testing.assert_allclose(wz, 10.0, atol=1e-6)

    def test_decay_rate_matches_corner_friction(self):
        """All four corner contacts at radius r = half-diagonal = 0.7071:
        friction torque mu*m*g*r, alpha = mu*m*g*r/Izz with Izz = 1/6
        => alpha = 0.1*9.81*0.7071*6 = 4.162 rad/s^2. Assert the measured
        mean decay rate within 15%."""
        scene, st = _spinning_box(mu=0.1)
        final, (pos, omega, ke) = _run(scene, st, 150)
        wz = np.asarray(omega[:, 0, 2])
        rate = (wz[0] - wz[-1]) / (0.01 * (len(wz) - 1))
        alpha = 0.1 * 9.81 * np.sqrt(0.5) * 6.0
        assert abs(rate - alpha) / alpha < 0.15, (
            f"decay rate {rate} vs analytic {alpha}")
