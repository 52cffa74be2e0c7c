"""Contact-constrained pendulum plugin.

Python reimplementation of the reference's custom collision plugin
(example/contact-constrained-pendulum/contact-constrained-pendulum-coldet-plugin.cpp):
a free rigid body "l1" is pinned to the world origin by SIX contact
constraints at the midpoint between the body's anchor point (0,1,0 local) and
the world origin, with normals ±x, ±y, ±z — a ball joint built from
unilateral contacts. The pair's signed distance is −|anchor|, so the
constraints are always active.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..core import scene as sc
from ..io import mobyxml

XML = "/root/reference/example/contact-constrained-pendulum/contact-constrained-pendulum.xml"

_NORMALS = np.array(
    [
        [0.0, 1.0, 0.0],
        [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, -1.0],
        [1.0, 0.0, 0.0],
        [-1.0, 0.0, 0.0],
    ]
)


def _kernel(scene, pos, quat_t, pairs):
    """6 fixed-normal contacts pinning l1's local (0,1,0) to the origin."""
    from ..math import quaternion as quat

    g1 = scene.pair_g1[pairs]
    s1 = scene.geom_slot[g1]              # l1's pose slot
    dtype = pos.dtype
    anchor_local = jnp.array([0.0, 1.0, 0.0], dtype)
    p = pos[s1] + quat.rotate(quat_t[s1], anchor_local)   # (P, 3) anchor world
    dist = -jnp.linalg.norm(p, axis=-1)
    point = 0.5 * p                        # midpoint to the world origin
    P = pairs.shape[0]
    pts = jnp.broadcast_to(point[:, None, :], (P, 6, 3))
    nrm = jnp.broadcast_to(
        jnp.asarray(_NORMALS, dtype)[None, :, :], (P, 6, 3)
    )
    sdepth = jnp.minimum(0.0, -p[:, 1])
    sd = jnp.broadcast_to(sdepth[:, None], (P, 6))
    pa = p
    pb = jnp.zeros_like(p)
    return dist, pa, pb, pts, nrm, sd


def build():
    def post_build(b: sc.SceneBuilder):
        b.add_custom_pair("l1", "world", _kernel, 6)
        # The golden trajectory (regress/contact-constrained-pendulum.dat)
        # was produced by a legacy velocity-first stepper (v updated and
        # impacts resolved at q_k, THEN q integrated with v+): its first line
        # after t=0 already carries one projected gravity impulse
        # (y = -g·h²·(m r²/(m r² + I)) = -4.905e-6). Use the matching
        # integration ordering (`stepper.step_legacy_vf`).
        b.legacy_velocity_first = True

    scene, st, opts = mobyxml.load(XML, post_build=post_build)
    return scene, st, opts
