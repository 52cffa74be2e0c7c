"""IO subsystem tests: checkpointing, logging, XML/SDF readers."""

import os

import numpy as np
import jax
import pytest

from moby_tpu.io import checkpoint, mobyxml
from moby_tpu.sim import stepper
from moby_tpu.utils import log as mlog


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        scene, st, _ = mobyxml.load(
            "/root/reference/example/stacks/sphere-stack.xml"
        )
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.001))
        for _ in range(5):
            st = step_j(st)
        p = str(tmp_path / "ck.npz")
        checkpoint.save(p, st, {"note": "test"})
        st2, meta = checkpoint.load(p, st)
        assert meta["note"] == "test"
        np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st2.pos))
        np.testing.assert_array_equal(np.asarray(st.zlast), np.asarray(st2.zlast))
        # resuming gives identical trajectories
        a = step_j(st)
        b = step_j(st2)
        np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


class TestLog:
    def test_bitmask(self, tmp_path, capsys):
        mlog.set_reporting_level("simulator,constraint")
        assert mlog.logging(mlog.LOG_SIMULATOR)
        assert mlog.logging(mlog.LOG_CONSTRAINT)
        assert not mlog.logging(mlog.LOG_COLDET)
        p = str(tmp_path / "log.txt")
        mlog.set_output(p)
        mlog.log(mlog.LOG_SIMULATOR, "hello %d", 42)
        mlog.log(mlog.LOG_COLDET, "hidden")
        mlog.set_output(None)
        mlog.set_reporting_level(0)
        text = open(p).read()
        assert "hello 42" in text
        assert "hidden" not in text


class TestReaders:
    def test_driver_options(self):
        _, _, opts = mobyxml.load(
            "/root/reference/example/bouncing-ball/bouncing-ball.xml"
        )
        assert abs(opts.step_size - 0.025) < 1e-12

    def test_urdf_pendulum_scene(self):
        # URDF via the Moby-XML wrapper (RCArticulatedBody urdf-filename)
        scene, st, _ = mobyxml.load(
            "/root/reference/example/urdf/pendulum-urdf.xml"
        )
        assert scene.nv_art == 1
        assert scene.n_contacts > 0  # pendulum sphere/cylinder vs ground plane
