"""Example-tree tail: the ellipse coldet-plugin scene and the q-tare
pendulum (VERDICT r3 missing #6).

Reference: example/ellipse/ellipse2D.xml + ellipse-plane-coldet-plugin.cpp
(grid-search/Newton supporting point -> closed-form support here) and
example/tare/pendulum.xml (q-tare joint-zero offset, src/Joint.cpp:239-247).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moby_tpu.io import mobyxml
from moby_tpu.plugins import ellipse2d
from moby_tpu.sim import stepper, kinematics


class TestEllipse:
    def test_support_point_is_exact(self):
        # closed-form support vs dense direction sampling of the surface
        a = np.array(ellipse2d.AXES)
        rng = np.random.RandomState(0)
        d = rng.randn(3)
        d /= np.linalg.norm(d)
        p = a ** 2 * d / np.linalg.norm(a * d)
        # p lies on the surface and maximizes d.x over a dense sample
        assert abs(np.sum((p / a) ** 2) - 1.0) < 1e-12
        th = np.linspace(0, 2 * np.pi, 200)
        ph = np.linspace(0, np.pi, 100)
        T, P = np.meshgrid(th, ph)
        xs = np.stack([
            a[0] * np.cos(T) * np.sin(P),
            a[1] * np.sin(T) * np.sin(P),
            a[2] * np.cos(P),
        ], axis=-1).reshape(-1, 3)
        assert d @ p >= (xs @ d).max() - 1e-3

    def test_bounces_and_stays_between_walls(self):
        scene, st = ellipse2d.build()
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.005))
        min_y, max_y_after_first_hit = np.inf, -np.inf
        hit = False
        for i in range(700):
            st = step_j(st)
            y = float(st.pos[0, 1])
            z = float(st.pos[0, 2])
            min_y = min(min_y, y)
            if y < 2.05:
                hit = True
            if hit:
                max_y_after_first_hit = max(max_y_after_first_hit, y)
            assert -1.05 < z < 1.05          # walls hold
        assert hit                           # reached the ground
        assert min_y > 1.0                   # never tunnels (semi-minor 1,
                                             # touching upright at y=2)
        # restitution 0.6: rebounds meaningfully above the resting height
        assert max_y_after_first_hit > 2.3


TARE_XML = "/root/reference/example/tare/pendulum.xml"


class TestTarePendulum:
    @staticmethod
    def _l1_com_world(scene, st):
        from moby_tpu.math import quaternion as quat

        pt = kinematics.compute(scene, st)
        i = scene.nb + 1                     # link frame sits at the joint
        com = jnp.asarray(scene.arts[0].model.links[1].com)
        return np.asarray(pt.pos[i] + quat.rotate(pt.quat[i], com))

    def test_loads_and_zero_is_lowest(self):
        scene, st, _ = mobyxml.load(TARE_XML)
        # reported q starts at the XML's q = pi/2 (tare NOT folded in)
        assert abs(float(st.q_art[0]) - np.pi / 2) < 1e-12
        # effective angle q + tare = 0 -> l1's COM at its configured world
        # position (1, 0, 0): horizontal, ready to swing
        np.testing.assert_allclose(
            self._l1_com_world(scene, st), [1.0, 0.0, 0.0], atol=1e-9
        )

    def test_swings_toward_tared_zero(self):
        scene, st, _ = mobyxml.load(TARE_XML)
        # pendulum starts horizontal (effective 0 with z-axis joint at
        # origin, l1 com toward +x): gravity (0,-9.81,0) swings it down;
        # q decreases from pi/2 toward 0 = lowest position
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.005))
        for _ in range(100):
            st = step_j(st)
        q = float(st.q_art[0])
        assert q < np.pi / 2 - 0.05
        # the COM keeps pivoting on the unit circle about the joint origin
        r = float(np.linalg.norm(self._l1_com_world(scene, st)))
        assert abs(r - 1.0) < 1e-6
