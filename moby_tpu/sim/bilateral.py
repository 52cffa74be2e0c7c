"""Bilateral (implicit) constraints: gears and loop/point joints.

The reference handles implicit bilateral joints in three places, all mirrored
here over the global generalized coordinates:

* forward dynamics solves the island KKT [M J'; J 0][a; λ] = [f; -J̇q̇]
  (`Simulator::solve`, src/Simulator.cpp:604-805);
* the impact handler replaces inv(M) by the constraint-projected
  X = iM − iM·J'·(J·iM·J')⁻¹·J·iM (`compute_X`,
  src/ImpactConstraintHandler.cpp:1590 — its iM − 2G + G'MG reduces to this
  projection) and subtracts the λ-correction removing any pre-impact
  constraint-velocity violation (`update_from_stacked` :355-379);
* constraint stabilization projects the position-level violation C(q)
  (`ConstraintStabilization::evaluate_bilateral_constraints`).

Constraint types:
* GEAR — joint-velocity ratio coupling inside an articulated body
  (`Moby::Gears`, include/Moby/Gears.h:40-45): q̇_a − ratio·q̇_b = 0,
  position form (q_a − q_a0) − ratio·(q_b − q_b0) = 0. Constant rows.
* POINT — ball joint pinning anchor points of two bodies (3 equations),
  the loop-closure primitive for simulator-level implicit joints.
  J from current poses; J̇q̇ obtained by jax.jvp through the row builder.
* PLANAR — planar joint between two bodies (`Moby::PlanarJoint`,
  example/planar-joint/constrained.xml): body A may translate in B's plane
  and rotate about its normal; 3 equations — relative velocity along the
  normal, relative angular velocity along both tangents. Position form:
  normal offset drift + small-angle tilt of the relative rotation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core import scene as sc
from ..math import quaternion as quat

GEAR = 0
POINT = 1
PLANAR = 2


@dataclass(frozen=True)
class Bilateral:
    btype: int
    # GEAR: gc columns and ratio
    col_a: int = 0
    col_b: int = 0
    ratio: float = 1.0
    q_idx_a: int = 0
    q_idx_b: int = 0
    q0_a: float = 0.0
    q0_b: float = 0.0
    # POINT: pose slots + local anchors; PLANAR reuses the slots
    slot_a: int = 0
    slot_b: int = 0
    anchor_a: tuple = (0.0, 0.0, 0.0)
    anchor_b: tuple = (0.0, 0.0, 0.0)
    # PLANAR: plane normal in body B's (inboard) frame + initial offsets
    normal: tuple = (0.0, 1.0, 0.0)
    offset0: float = 0.0          # initial n·(p_a − p_b)
    qrel0: tuple = (0.0, 0.0, 0.0, 1.0)  # initial q_a ⊗ q_b⁻¹ (xyzw)

    @property
    def n_rows(self):
        return 1 if self.btype == GEAR else 3


def total_rows(scene: sc.Scene) -> int:
    return sum(b.n_rows for b in scene.bilaterals)


def constraint_rows(scene: sc.Scene, st: sc.State, pt):
    """(J (NR, ngc), C (NR,)) at the current configuration."""
    dtype = st.pos.dtype
    NR = total_rows(scene)
    J = jnp.zeros((NR, scene.ngc), dtype)
    C = jnp.zeros(NR, dtype)
    r = 0
    for b in scene.bilaterals:
        if b.btype == GEAR:
            J = J.at[r, b.col_a].set(1.0)
            J = J.at[r, b.col_b].set(-b.ratio)
            # position-level C is identically zero for gears
            # (Gears::evaluate_constraints, src/Gears.cpp:34-38)
            r += 1
        elif b.btype == POINT:
            aa = jnp.asarray(b.anchor_a, dtype)
            ab = jnp.asarray(b.anchor_b, dtype)
            pa = pt.pos[b.slot_a] + quat.rotate(pt.quat[b.slot_a], aa)
            pb = pt.pos[b.slot_b] + quat.rotate(pt.quat[b.slot_b], ab)
            # d/dt (pa - pb) = [I, -hat(ra)]·W_a - [I, -hat(rb)]·W_b
            ra = pa - pt.pos[b.slot_a]
            rb = pb - pt.pos[b.slot_b]
            Wa = pt.W[b.slot_a]  # (6, ngc): [v; ω]
            Wb = pt.W[b.slot_b]
            from ..math.so3 import hat

            Ja = Wa[:3] - hat(ra) @ Wa[3:]
            Jb = Wb[:3] - hat(rb) @ Wb[3:]
            J = jax.lax.dynamic_update_slice(J, Ja - Jb, (r, 0))
            C = jax.lax.dynamic_update_slice(C, pa - pb, (r,))
            r += 3
        elif b.btype == PLANAR:
            from ..math.so3 import orthonormal_basis

            n_w = quat.rotate(pt.quat[b.slot_b], jnp.asarray(b.normal, dtype))
            t1, t2 = orthonormal_basis(n_w)
            Wa = pt.W[b.slot_a]
            Wb = pt.W[b.slot_b]
            rows = jnp.stack([
                n_w @ (Wa[:3] - Wb[:3]),     # no relative motion along n
                t1 @ (Wa[3:] - Wb[3:]),      # no tilt rate about t1
                t2 @ (Wa[3:] - Wb[3:]),      # no tilt rate about t2
            ])
            # position drift: normal offset + small-angle tilt of the
            # relative rotation vs its initial value
            c_n = n_w @ (pt.pos[b.slot_a] - pt.pos[b.slot_b]) - b.offset0
            q_rel = quat.mul(
                pt.quat[b.slot_a], quat.conj(pt.quat[b.slot_b])
            )
            q_err = quat.mul(
                q_rel, quat.conj(jnp.asarray(b.qrel0, dtype))
            )
            tilt = 2.0 * q_err[:3] * jnp.sign(q_err[3])
            cs = jnp.stack([c_n, t1 @ tilt, t2 @ tilt])
            J = jax.lax.dynamic_update_slice(J, rows, (r, 0))
            C = jax.lax.dynamic_update_slice(C, cs, (r,))
            r += 3
    return J, C


def jdot_qd(scene: sc.Scene, st: sc.State):
    """J̇·q̇ for the acceleration-level KKT, via forward-mode AD through the
    configuration-dependent rows along the current velocity."""
    from . import kinematics

    NR = total_rows(scene)
    if NR == 0:
        return jnp.zeros(0, st.pos.dtype)

    def Jv_of_config(pos, quat_b, q_art):
        s = st.replace(pos=pos, quat=quat_b, q_art=q_art)
        pt = kinematics.compute(scene, s)
        J, _ = constraint_rows(scene, s, pt)
        v = kinematics.gc_velocity(scene, st)
        return J @ v

    qdot = quat.deriv(st.quat, st.omega)
    dq_art = _qdot_art(scene, st)
    _, out = jax.jvp(
        Jv_of_config,
        (st.pos, st.quat, st.q_art),
        (st.vel, qdot, dq_art),
    )
    return out


def _qdot_art(scene, st):
    """d(q_art)/dt from qd_art (per joint type)."""
    from ..dynamics import model as amdl

    if scene.nq_art == 0:
        return jnp.zeros(0, st.pos.dtype)
    out = jnp.zeros_like(st.q_art)
    for ent in scene.arts:
        m = ent.model
        for i in range(m.nl):
            t = m.jtype[i]
            qo = ent.q_off + m.q_off[i]
            vo = ent.v_off + m.v_off[i]
            if t in (amdl.REVOLUTE, amdl.PRISMATIC):
                out = out.at[qo].set(st.qd_art[vo])
            elif t == amdl.UNIVERSAL:
                out = out.at[qo : qo + 2].set(st.qd_art[vo : vo + 2])
            elif t == amdl.PLANAR:
                out = out.at[qo : qo + 3].set(st.qd_art[vo : vo + 3])
            elif t == amdl.SPHERICAL:
                qq = st.q_art[qo : qo + 4]
                out = out.at[qo : qo + 4].set(
                    quat.deriv(qq, st.qd_art[vo : vo + 3])
                )
            elif t == amdl.FLOATING:
                qq = st.q_art[qo + 3 : qo + 7]
                Rb = quat.to_matrix(qq)
                w_w = Rb @ st.qd_art[vo : vo + 3]
                v_w = Rb @ st.qd_art[vo + 3 : vo + 6]
                out = out.at[qo : qo + 3].set(v_w)
                out = out.at[qo + 3 : qo + 7].set(quat.deriv(qq, w_w))
    return out


def project_inv_inertia(Minv, J, reg=1e-12):
    """X = iM − iM·J'·(J·iM·J')⁻¹·J·iM (compute_X's projection)."""
    if J.shape[0] == 0:
        return Minv
    JM = J @ Minv
    G = JM @ J.T
    G = G + reg * jnp.eye(G.shape[0], dtype=G.dtype)
    Y = jnp.linalg.inv(G)
    return Minv - JM.T @ Y @ JM


def velocity_correction(Minv, J, v, reg=1e-12):
    """Δv removing the bilateral constraint-velocity violation:
    −iM·J'·(J·iM·J')⁻¹·J·v (update_from_stacked's λ step)."""
    if J.shape[0] == 0:
        return jnp.zeros_like(v)
    JM = J @ Minv
    G = JM @ J.T + reg * jnp.eye(J.shape[0], dtype=J.dtype)
    lam = jnp.linalg.solve(G, J @ v)
    return -JM.T @ lam


def acceleration_correction(Minv, J, a_free, jd_qd, reg=1e-12):
    """KKT acceleration: a = a_free − iM·J'·(J·iM·J')⁻¹·(J·a_free + J̇q̇)."""
    if J.shape[0] == 0:
        return a_free
    JM = J @ Minv
    G = JM @ J.T + reg * jnp.eye(J.shape[0], dtype=J.dtype)
    lam = jnp.linalg.solve(G, J @ a_free + jd_qd)
    return a_free - JM.T @ lam
