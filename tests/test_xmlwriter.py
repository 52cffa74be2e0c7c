"""XMLWriter round-trip tests (reference XMLWriter::serialize_to_xml):
load -> save -> load must reproduce the same compiled scene and the same
trajectory."""

import numpy as np
import jax
import pytest

from moby_tpu.io import mobyxml, xmlwriter
from moby_tpu.sim import stepper

EX = "/root/reference/example"


def roundtrip(path, tmp_path, steps=20, dt=None):
    cap = {}
    scene, st, opts = mobyxml.load(path, post_build=lambda b: cap.update(b=b))
    out = str(tmp_path / "rt.xml")
    xmlwriter.save(cap["b"], out, step_size=opts.step_size)
    scene2, st2, opts2 = mobyxml.load(out)
    h = dt or opts.step_size
    step1 = jax.jit(lambda s: stepper.step(scene, s, h))
    step2 = jax.jit(lambda s: stepper.step(scene2, s, h))
    for _ in range(steps):
        st = step1(st)
        st2 = step2(st2)
    return st, st2, opts, opts2


class TestRoundTrip:
    def test_sphere_stack(self, tmp_path):
        st, st2, opts, opts2 = roundtrip(
            f"{EX}/stacks/sphere-stack.xml", tmp_path
        )
        assert opts2.step_size == opts.step_size
        np.testing.assert_allclose(
            np.asarray(st2.pos), np.asarray(st.pos), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(st2.vel), np.asarray(st.vel), atol=1e-12
        )

    def test_sitting_box_contact_params(self, tmp_path):
        st, st2, _, _ = roundtrip(
            "/root/repo/scenes/sitting-box.xml", tmp_path, steps=10
        )
        np.testing.assert_allclose(
            np.asarray(st2.pos), np.asarray(st.pos), atol=1e-10
        )

    def test_articulated_pendulum(self, tmp_path):
        st, st2, _, _ = roundtrip(
            f"{EX}/reduced-coords/pendulum.xml", tmp_path, steps=30, dt=0.001
        )
        np.testing.assert_allclose(
            np.asarray(st2.q_art), np.asarray(st.q_art), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(st2.qd_art), np.asarray(st.qd_art), atol=1e-7
        )

    def test_state_injection(self, tmp_path):
        """Saving mid-trajectory state must resume identically."""
        cap = {}
        scene, st, opts = mobyxml.load(
            f"{EX}/stacks/sphere-stack.xml",
            post_build=lambda b: cap.update(b=b),
        )
        h = opts.step_size
        step_j = jax.jit(lambda s: stepper.step(scene, s, h))
        for _ in range(10):
            st = step_j(st)
        out = str(tmp_path / "mid.xml")
        xmlwriter.save(cap["b"], out, state=st, step_size=h)
        scene2, st2, _ = mobyxml.load(out)
        a = step_j(st)
        step2 = jax.jit(lambda s: stepper.step(scene2, s, h))
        b2 = step2(st2)
        np.testing.assert_allclose(
            np.asarray(b2.pos), np.asarray(a.pos), atol=1e-9
        )
