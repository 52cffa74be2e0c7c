"""Reduced-coordinate articulated body model (the reference's
`RCArticulatedBody` + Ravelin's spatial-dynamics layer, rebuilt natively).

A robot is a tree compiled host-side into static arrays:

* ``parent[i]`` — parent link index (-1 = world/base attachment),
* joint ``i`` connects ``parent[i]`` -> link ``i`` with a fixed tree transform
  (pose of the joint frame in the parent frame) and a typed motion subspace,
* per-link spatial inertia (6x6, link frame, [ω; v] Featherstone layout).

Joint types mirror the reference's concrete joints
(include/Moby/RevoluteJoint.h etc.): fixed, revolute, prismatic, spherical,
universal, planar; a floating base is joint type FLOATING on link 0.

Generalized coordinates (Euler): revolute/prismatic 1; universal 2; planar 3;
spherical 4 (unit quaternion, xyzw); floating 7 (xyz + quaternion).
Velocities: 1/1/2/3/3/6.

All functions are pure and trace-friendly; the per-link loops are Python
(static, unrolled) since robot trees are short; batching comes from `vmap`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..math import quaternion as quat
from ..math import spatial as sp
from ..math.so3 import hat

# joint types
FIXED = 0
REVOLUTE = 1
PRISMATIC = 2
SPHERICAL = 3
UNIVERSAL = 4
PLANAR = 5
FLOATING = 6

NQ = {FIXED: 0, REVOLUTE: 1, PRISMATIC: 1, SPHERICAL: 4, UNIVERSAL: 2, PLANAR: 3, FLOATING: 7}
NV = {FIXED: 0, REVOLUTE: 1, PRISMATIC: 1, SPHERICAL: 3, UNIVERSAL: 2, PLANAR: 3, FLOATING: 6}


@dataclass
class JointDef:
    jtype: int
    # pose of the joint frame in the parent link's frame
    Xt_E: np.ndarray = None      # (3,3) rotation parent->joint coords
    Xt_r: np.ndarray = None      # (3,) joint origin in parent coords
    axis: np.ndarray = None      # (3,) axis in joint frame (rev/prism)
    axis2: np.ndarray = None     # (3,) second axis (universal)
    lo: np.ndarray = None        # lower limit(s)
    hi: np.ndarray = None        # upper limit(s)
    restitution: float = 0.0     # limit restitution (Moby `restitution-coeff`)
    # constant offset added to q inside the joint transform, so the REPORTED
    # q keeps the user's chosen zero (Moby `q-tare`: every Ravelin joint
    # evaluates at q + _q_tare, e.g. ScrewJoint.cpp:166; read at
    # src/Joint.cpp:239-247; example/tare/pendulum.xml documents the idiom)
    tare: np.ndarray = None
    name: str = ""


@dataclass
class LinkDef:
    name: str
    mass: float
    com: np.ndarray              # (3,) in link frame
    inertia_com: np.ndarray      # (3,3) about COM
    joint: JointDef = None


class ArticulatedModel:
    """Host-compiled model. Arrays are numpy; converted lazily by jnp ops."""

    def __init__(self, links: List[LinkDef], floating: bool):
        self.nl = len(links)
        self.links = links
        self.floating = floating
        self.parent: List[int] = []
        self.jtype: List[int] = []
        self.q_off: List[int] = []
        self.v_off: List[int] = []
        q = v = 0
        for i, lk in enumerate(links):
            self.jtype.append(lk.joint.jtype)
            self.q_off.append(q)
            self.v_off.append(v)
            q += NQ[lk.joint.jtype]
            v += NV[lk.joint.jtype]
        self.nq = q
        self.nv = v
        self.I_link = np.stack(
            [
                np.asarray(
                    sp.inertia_matrix(lk.mass, lk.com, lk.inertia_com)
                )
                for lk in links
            ]
        )

    def set_parents(self, parent: List[int]):
        self.parent = list(parent)

    def neutral_q(self, dtype=np.float64):
        q = np.zeros(self.nq, dtype)
        for i, lk in enumerate(self.links):
            t = self.jtype[i]
            off = self.q_off[i]
            if t == SPHERICAL:
                q[off + 3] = 1.0
            elif t == FLOATING:
                q[off + 6] = 1.0
        return jnp.array(q)


def jcalc(jd: JointDef, jtype: int, q_j):
    """Joint transform X_J (child <- joint frame) and motion subspace S (6, nv)
    expressed in the child (outboard) frame."""
    dtype = q_j.dtype if hasattr(q_j, "dtype") else jnp.float64
    if jd.tare is not None and jtype in (REVOLUTE, PRISMATIC, UNIVERSAL,
                                         PLANAR):
        q_j = q_j + jnp.asarray(np.asarray(jd.tare).ravel()[: q_j.shape[0]],
                                dtype)
    if jtype == FIXED:
        E = jnp.eye(3, dtype=dtype)
        r = jnp.zeros(3, dtype)
        S = jnp.zeros((6, 0), dtype)
        return sp.Transform(E, r), S
    if jtype == REVOLUTE:
        axis = jnp.asarray(jd.axis, dtype)
        th = q_j[0]
        E = _axis_angle_matrix(axis, th).T  # parent->child coords
        S = jnp.concatenate([axis, jnp.zeros(3, dtype)])[:, None]
        return sp.Transform(E, jnp.zeros(3, dtype)), S
    if jtype == PRISMATIC:
        axis = jnp.asarray(jd.axis, dtype)
        E = jnp.eye(3, dtype=dtype)
        r = axis * q_j[0]
        S = jnp.concatenate([jnp.zeros(3, dtype), axis])[:, None]
        return sp.Transform(E, r), S
    if jtype == SPHERICAL:
        qq = q_j[:4]
        E = quat.to_matrix(qq).T
        S = jnp.concatenate(
            [jnp.eye(3, dtype=dtype), jnp.zeros((3, 3), dtype)], axis=0
        )
        return sp.Transform(E, jnp.zeros(3, dtype)), S
    if jtype == UNIVERSAL:
        a1 = jnp.asarray(jd.axis, dtype)
        a2_0 = jnp.asarray(jd.axis2, dtype)
        R1 = _axis_angle_matrix(a1, q_j[0])
        R2 = _axis_angle_matrix(R1 @ a2_0, q_j[1])
        E = (R2 @ R1).T
        # subspace: first axis rotated into child frame, second axis in child
        s1 = E @ a1
        s2 = E @ (R1 @ a2_0)
        S = jnp.stack(
            [
                jnp.concatenate([s1, jnp.zeros(3, dtype)]),
                jnp.concatenate([s2, jnp.zeros(3, dtype)]),
            ],
            axis=1,
        )
        return sp.Transform(E, jnp.zeros(3, dtype)), S
    if jtype == PLANAR:
        # translation in joint x-y plane + rotation about joint z
        x, y, th = q_j[0], q_j[1], q_j[2]
        Ez = _axis_angle_matrix(jnp.array([0.0, 0.0, 1.0], dtype), th)
        E = Ez.T
        r = jnp.stack([x, y, jnp.zeros((), dtype)])
        ex = jnp.array([1.0, 0, 0], dtype)
        ey = jnp.array([0.0, 1, 0], dtype)
        ez = jnp.array([0.0, 0, 1], dtype)
        S = jnp.stack(
            [
                jnp.concatenate([jnp.zeros(3, dtype), E @ ex]),
                jnp.concatenate([jnp.zeros(3, dtype), E @ ey]),
                jnp.concatenate([ez, jnp.zeros(3, dtype)]),
            ],
            axis=1,
        )
        return sp.Transform(E, r), S
    if jtype == FLOATING:
        pos = q_j[:3]
        qq = q_j[3:7]
        E = quat.to_matrix(qq).T
        S = jnp.eye(6, dtype=dtype)
        return sp.Transform(E, pos), S
    raise ValueError(f"bad joint type {jtype}")


def _axis_angle_matrix(axis, th):
    """Rotation matrix about unit axis by angle th (Rodrigues)."""
    K = hat(axis)
    c = jnp.cos(th)
    s = jnp.sin(th)
    return jnp.eye(3, dtype=K.dtype) + s * K + (1 - c) * (K @ K)


def joint_transforms(model: ArticulatedModel, q):
    """Per-link (X_up, S): X_up maps parent-frame spatial vectors to link frame;
    S is the motion subspace in the link frame."""
    Xs, Ss = [], []
    for i, lk in enumerate(model.links):
        jd = lk.joint
        t = model.jtype[i]
        qi = jax_dynamic_slice(q, model.q_off[i], NQ[t])
        XJ, S = jcalc(jd, t, qi)
        Xt = sp.Transform(
            jnp.asarray(jd.Xt_E, q.dtype), jnp.asarray(jd.Xt_r, q.dtype)
        )
        # X_up = XJ ∘ Xt  (parent coords -> joint frame -> child frame)
        X_up = compose(XJ, Xt)
        Xs.append(X_up)
        Ss.append(S)
    return Xs, Ss


def compose(X2: sp.Transform, X1: sp.Transform) -> sp.Transform:
    """(X2 ∘ X1): apply X1 (outer/parent first), then X2."""
    E = X2.E @ X1.E
    r = X1.r + X1.E.T @ X2.r
    return sp.Transform(E, r)


def jax_dynamic_slice(q, off, n):
    return q[off : off + n]


def link_world_poses(model: ArticulatedModel, q):
    """Forward kinematics: world pose (R_wl (3,3), p_wl (3,)) of each link."""
    Xs, _ = joint_transforms(model, q)
    Rs, ps = [], []
    for i in range(model.nl):
        X = Xs[i]
        # X: parent->link; world pose accumulates inverse transforms
        if model.parent[i] < 0:
            R = X.E.T
            p = X.r
        else:
            Rp = Rs[model.parent[i]]
            pp = ps[model.parent[i]]
            R = Rp @ X.E.T
            p = pp + Rp @ X.r
        Rs.append(R)
        ps.append(p)
    return Rs, ps
