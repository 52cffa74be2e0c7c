"""Passive-walker parity (BASELINE configs row 3; reference
example/passive-walker/): scene structure, the hybrid swing -> heel-strike
event sequence of the shipped (fixed-base) config, and a floating-base
smoke test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moby_tpu.core import scene as sc
from moby_tpu.plugins import passive_walker
from moby_tpu.sim import stepper, kinematics
from moby_tpu.geometry import narrowphase as nph


def _foot_dists(scene, st):
    pt = kinematics.compute(scene, st)
    pd, _ = nph.narrow_phase(scene, pt.pos, pt.quat,
                             scene.contact_dist_thresh)
    return np.asarray(pd.dist)


def _chunked_rollout(scene, st, dt, n_chunks, chunk=50):
    """scan-rollout in chunks, sampling (hip q, hip qd, RLEG-ground dist)."""

    @jax.jit
    def run(s):
        def f(s_, _):
            return stepper.step(scene, s_, dt), None

        out, _ = jax.lax.scan(f, s, None, length=chunk)
        return out

    qs, qds, dists = [], [], []
    for _ in range(n_chunks):
        st = run(st)
        d = _foot_dists(scene, st)
        qs.append(float(st.q_art[0]))
        qds.append(float(st.qd_art[0]))
        dists.append(float(d[-1]))  # RLEG vs ground pair (last pair)
    return st, np.array(qs), np.array(qds), np.array(dists)


class TestPassiveWalker:
    def test_structure(self):
        scene, st = passive_walker.build()
        ent = scene.arts[0]
        assert ent.model.nl == 2
        assert ent.model.nv == 1  # fixed base + 1 hip dof (init.cpp:328)
        names = [lk.name for lk in ent.model.links]
        assert names == ["LLEG", "RLEG"]
        # both ring feet start exactly at the ground (base z = R = 0.1236)
        d = _foot_dists(scene, st)
        assert abs(d[-1]) < 1e-9 and abs(d[-2]) < 1e-9

    def test_swing_and_heel_strike(self):
        """The hybrid gait event sequence of the shipped config: the swing
        foot LIFTS off the ground, swings under the slope gravity, returns,
        and the eps=0 heel strike removes the approach velocity (the impact
        map of the walking cycle)."""
        scene, st = passive_walker.build(hip_qd0=-0.8)
        st, qs, qds, dists = _chunked_rollout(scene, st, 2e-3, 40)

        # (a) lift-off: the swing foot genuinely leaves the ground
        assert dists.max() > 0.05, f"foot never lifted: {dists.max()}"
        # (b) heel strike: it comes back to contact
        lifted = int(np.argmax(dists > 0.05))
        back = np.nonzero(dists[lifted:] < 1e-4)[0]
        assert back.size, "foot never struck the ground again"
        strike = lifted + int(back[0])
        # (c) plastic impact (eps=0): post-strike the hip rate is far below
        # the peak swing rate, and the foot stays in contact
        assert abs(qds[strike]) < 0.5 * np.abs(qds).max()
        assert np.all(dists[strike:] < 1e-3)
        # (d) no deep penetration anywhere
        assert dists.min() > -5e-3
        assert np.all(np.isfinite(qs))

    def test_floating_base_smoke(self):
        scene, st = passive_walker.build(floating=True)

        @jax.jit
        def run(s):
            def f(s_, _):
                return stepper.step(scene, s_, 1e-3), None

            out, _ = jax.lax.scan(f, s, None, length=400)
            return out

        st = run(st)
        q = np.asarray(st.q_art)
        assert np.all(np.isfinite(q))
        # base stays at ring height (feet on the ground, no fall-through)
        assert 0.08 < float(q[2]) < 0.2
