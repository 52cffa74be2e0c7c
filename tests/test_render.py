"""Trajectory rendering CLIs (the reference's moby-render / moby-view
analogs): HTML viewer + PNG movie-frame sequence."""

import os
import subprocess
import sys

import pytest


SCENE = os.path.join(os.path.dirname(__file__), "..", "scenes",
                     "sitting-box.xml")


@pytest.fixture(scope="module")
def traj(tmp_path_factory):
    d = tmp_path_factory.mktemp("render")
    out = str(d / "traj.dat")
    r = subprocess.run(
        [sys.executable, "-m", "moby_tpu.cli.regress", "--cpu", "-s=0.01",
         "-mt=0.03", SCENE, out],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]
    return out


class TestRender:
    def test_html_viewer(self, traj, tmp_path):
        out = str(tmp_path / "viewer.html")
        r = subprocess.run(
            [sys.executable, "-m", "moby_tpu.cli.render", "--cpu", SCENE,
             traj, out],
            capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-500:]
        html = open(out).read()
        assert "canvas" in html and "frames" in html

    def test_movie_frames(self, traj, tmp_path):
        frames = str(tmp_path / "frames")
        r = subprocess.run(
            [sys.executable, "-m", "moby_tpu.cli.render", "--cpu", "--movie",
             frames, SCENE, traj],
            capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-500:]
        pngs = [f for f in os.listdir(frames) if f.endswith(".png")]
        assert len(pngs) >= 3
