"""Enabled-but-massless (kinematic) bodies in the impact path.

ADVICE r4 (medium): the live-compressed Jr_live fast path masked bodies on
`enabled & mass>0`, so a moving kinematic body (enabled=True, mass=0 — the
BodyDef defaults) contacting a dynamic body contributed zero relative
velocity to bv, silently changing impulses vs the dense path. The fast path
is now gated on every enabled body being massive; kinematic scenes take the
dense path, where bv = Jall @ v includes kinematic velocities (their Minv
blocks stay zero, so they absorb no impulse — infinite mass).

Reference semantics: a fixed/kinematic body in Moby is simply a body whose
generalized inertia is not inverted into the problem (disabled bodies,
src/ConstraintSimulator.cpp contact-parameter path); a *moving* kinematic
pusher still drives contacts through its velocity.
"""

import numpy as np
import jax.numpy as jnp

from moby_tpu.core import scene as sc
from moby_tpu.sim import stepper


def kinematic_pusher_scene():
    b = sc.SceneBuilder()
    b.set_gravity([0, 0, 0])
    # kinematic pusher: enabled (moves) but massless (infinite inertia)
    b.add_body("pusher", mass=0.0, pos=np.array([-1.05, 0.0, 0.0]),
               lin_vel=np.array([1.0, 0.0, 0.0]))
    b.add_body("ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.5),
               pos=np.array([0.0, 0.0, 0.0]))
    b.add_geom("pusher", sc.SPHERE, [0.5])
    b.add_geom("ball", sc.SPHERE, [0.5])
    b.set_contact_params(
        "pusher", "ball", sc.ContactParams(epsilon=0.0, mu_coulomb=0.0, nk=4)
    )
    return b.compile()


class TestKinematicPusher:
    def test_fast_path_gated_off(self):
        """Scenes with an enabled massless body must not build Jr_live."""
        from moby_tpu.sim import impact

        scene, st = kinematic_pusher_scene()
        il = impact._live_free_idx(scene)
        # the pusher (enabled, mass=0) is not "live" by the old mask --
        # precisely the hazard: the gate must reject the fast path
        assert len(il) == 1
        enabled = np.asarray(scene.enabled)
        mass = np.asarray(scene.mass)
        assert not ((mass > 0) | ~enabled).all()

    def test_pusher_transfers_momentum(self):
        """The moving kinematic sphere must push the resting ball: its
        velocity enters bv through the dense path. Before the r5 gate the
        live-compressed bv dropped it and the ball never moved."""
        scene, st = kinematic_pusher_scene()
        dt = 0.01
        for _ in range(30):
            st = stepper.step(scene, st, dt)
        vel = np.asarray(st.vel)
        # ball picked up forward velocity from the impact
        assert vel[1, 0] > 0.5, f"ball vel {vel[1]}"
        # kinematic pusher keeps its velocity (infinite mass: no recoil)
        np.testing.assert_allclose(vel[0], [1.0, 0.0, 0.0], atol=1e-9)

    def test_massive_scene_still_uses_fast_path(self):
        from moby_tpu.sim import impact, kinematics
        from moby_tpu.geometry import narrowphase as nph
        from moby_tpu import config as cfg

        b = sc.SceneBuilder()
        b.set_gravity([0, 0, -9.81])
        b.add_body("ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.5),
                   pos=np.array([0.0, 0.0, 0.45]))
        b.add_body("ground", enabled=False)
        b.add_geom("ball", sc.SPHERE, [0.5])
        b.add_geom("ground", sc.PLANE, [0.0])
        b.set_contact_params(
            "ground", "ball",
            sc.ContactParams(epsilon=0.0, mu_coulomb=0.5, nk=4))
        scene, st = b.compile()
        pt = kinematics.compute(scene, st)
        _, con = nph.narrow_phase(
            scene, pt.pos, pt.quat, scene.contact_dist_thresh)
        nz = cfg.near_zero(st.pos.dtype)
        act, act_lim, _, _ = impact._active(scene, st, pt, con, nz)
        p = impact.assemble_problem(scene, st, pt, con, act, act_lim)
        assert p.Jr_live is not None
