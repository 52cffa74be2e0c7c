"""Torus and cylinder contact kernels driven by the reference example scenes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moby_tpu.io import mobyxml
from moby_tpu.sim import stepper

EX = "/root/reference/example"


class TestRollingTorus:
    def test_rolls_without_sinking(self):
        scene, st, opts = mobyxml.load(f"{EX}/rolling-torus/torus.xml")
        torus = int(np.argmax(np.asarray(scene.enabled)))
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.01))
        for _ in range(100):
            st = step_j(st)
        # stays on the plane (R + r = 1.0), moves forward
        assert abs(float(st.pos[torus, 1]) - 1.0) < 5e-3
        assert float(st.pos[torus, 0]) > 0.3
        assert np.all(np.isfinite(np.asarray(st.pos)))


class TestCylinder:
    def test_sliding_cylinder_stays_on_plane(self):
        # side-lying cylinder (axis along z after the rpy) sliding
        # frictionlessly in +x at the reference scene's v=10
        scene, st, opts = mobyxml.load(f"{EX}/simple-contact/cylinder.xml")
        cyl = int(np.argmax(np.asarray(scene.enabled)))
        step_j = jax.jit(lambda s: stepper.step(scene, s, opts.step_size))
        for _ in range(80):
            st = step_j(st)
        assert abs(float(st.pos[cyl, 1]) - 0.5) < 5e-3
        # frictionless: keeps sliding at ~10
        assert float(st.vel[cyl, 0]) > 9.5
