"""Passive-dynamic-walker scene plugin (BASELINE configs row 3).

Python reimplementation of the reference's passive-walker example
(`/root/reference/example/passive-walker/`): the Coleman/Ruina two-leg
walker on a virtual slope, composed of

* the SDF model (`walker.sdf`): links LLEG/RLEG joined by the revolute
  `hip`, loaded through `io.sdfio.add_model`;
* the collision-detection plugin (`coldet-plugin.cpp`): each foot is a
  circular RING of radius R = 0.1236, tube radius r = 0 — a degenerate
  torus lying in the link's x-z plane — colliding with the ground plane.
  The plugin's hand-written ring/plane signed distance (aligned, edge-on,
  tilted branches, coldet-plugin.cpp:116-280) is exactly our `_torus_plane`
  kernel with params (Rmaj=0.1236, rmin=0), so the feet compile to TORUS
  geometries whose local +z (torus axis) maps onto the link's +y via a
  -90 deg x-rotation (the plugin's hardcoded `Matrix3d(1,0,0,0,0,-1,0,1,0)`
  re-orientation, :137-144). Where the plugin picks a RANDOM point on the
  aligned contact ring (fRand, :186), our kernel emits 4 deterministic ring
  points — a strict improvement it documents;
* the initializer (`init.cpp`): slope gravity
  g = (0.07014235613, 0, -0.99753699173) (alpha = 0.0702 virtual slope,
  walker.xml:20), base pose z = 0.1236 (ring exactly touching) with a 10 deg
  yaw (quat (0,0,0.0871557,0.9961947), init.cpp:278-281), hip angle
  theta_sw = 2*pi == 0, zero initial velocity, and — as shipped —
  `walker->set_floating_base(false)` (init.cpp:328): the stance leg is
  WELDED and the scene exercises the swing-leg + ring-foot impact dynamics.
  `build(floating=True)` lifts that to the full floating-base walker;
* contact parameters from walker.xml: epsilon = 0, mu_coulomb = 99.9
  (just under the no-slip threshold -> the QP friction model).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

from ..core import scene as sc
from ..io import sdfio

R_FOOT = 0.1236          # ring radius (coldet-plugin.cpp:122)
GRAVITY = np.array([0.07014235613, 0.0, -0.99753699173])
BASE_Z = 0.1236          # init.cpp:233 x[3]
BASE_QUAT = np.array([0.0, 0.0, 0.0871557427476582, 0.9961946980917456])
SDF = "/root/reference/example/passive-walker/walker.sdf"


def build(floating: bool = False, hip_q0: float = 0.0, hip_qd0: float = 0.0,
          dtype=None):
    """Build the walker scene. Returns (scene, state).

    floating=False matches the shipped reference config (init.cpp fixes the
    base); floating=True is the full 3-D passive walker.
    """
    b = sc.SceneBuilder(dtype=dtype) if dtype else sc.SceneBuilder()
    b.set_gravity(GRAVITY)

    root = ET.parse(SDF).getroot()
    model = root.find("model")
    # base pose from init.cpp: z = 0.1236, 10 deg yaw (pose injected at the
    # model level so LLEG — the tree base — lands exactly there)
    yaw = 2.0 * np.arcsin(BASE_QUAT[2])
    pose_el = ET.SubElement(model, "pose")
    pose_el.text = f"0 0 {BASE_Z} 0 0 {yaw}"
    if not floating:
        static_el = ET.SubElement(model, "static")
        static_el.text = "true"

    # inject the plugin's ring feet as collision geometry: a degenerate
    # torus at each SDF link origin, ring in the link x-z plane (same 90 deg
    # x-rotation as the foot visuals; torus axis = SDF z -> link y)
    for lel in model.findall("link"):
        cel = ET.SubElement(lel, "collision")
        cel.set("name", "foot_ring")
        pel = ET.SubElement(cel, "pose")
        pel.text = "0 0 0 1.5707963267949 0 0"
        gel = ET.SubElement(cel, "geometry")
        tel = ET.SubElement(gel, "torus")
        ET.SubElement(tel, "major_radius").text = str(R_FOOT)
        ET.SubElement(tel, "tube_radius").text = "0"

    mname, _, _ = sdfio.add_model(
        b, model, os.path.dirname(os.path.abspath(SDF))
    )

    # ground plane, z-up (walker.xml: Plane rpy="1.570796326949 0 0")
    b.add_body("GROUND", enabled=False)
    pq = np.array([np.sin(np.pi / 4), 0.0, 0.0, np.cos(np.pi / 4)])
    b.add_geom("GROUND", sc.PLANE, [0.0], quat=pq)

    b.set_contact_params(
        "GROUND", mname,
        sc.ContactParams(epsilon=0.0, mu_coulomb=99.9, nk=4),
    )

    scene, st = b.compile()

    if hip_q0 or hip_qd0:
        # hip is the only (fixed-base) articulated dof after the base
        ent = scene.arts[0]
        m = ent.model
        hip_li = [i for i, lk in enumerate(m.links)
                  if lk.joint is not None and m.jtype[i] == 1]  # REVOLUTE
        import jax.numpy as jnp

        qi = ent.q_off + m.q_off[hip_li[-1]]
        vi = ent.v_off + m.v_off[hip_li[-1]]
        st = st.replace(
            q_art=st.q_art.at[qi].set(hip_q0),
            qd_art=st.qd_art.at[vi].set(hip_qd0),
        )
    return scene, st
