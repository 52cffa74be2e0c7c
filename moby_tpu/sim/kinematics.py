"""Pose-slot kinematics: world poses, velocities, and generalized-coordinate
Jacobians for every rigid body / articulated link in the scene.

The global generalized-velocity vector v_gc (scene.ngc) is laid out as the
reference's eSpatial coordinates: [v; ω] per free body (6 each), then each
articulated body's joint velocities. `PoseTable.W` maps v_gc to each pose
slot's world spatial velocity ([v at slot origin; ω]) — the bridge that lets
one contact-Jacobian assembly serve free bodies and articulated links alike
(the reference does this with per-body virtuals + `RCArticulatedBodyd::calc_jacobian`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import scene as sc
from ..dynamics import model as amdl
from ..math import quaternion as quat


class PoseTable(NamedTuple):
    pos: jnp.ndarray    # (ns, 3) slot origin, world
    quat: jnp.ndarray   # (ns, 4)
    vel: jnp.ndarray    # (ns, 3) linear velocity of slot origin, world
    omega: jnp.ndarray  # (ns, 3)
    W: jnp.ndarray      # (ns, 6, ngc): v_gc -> [v; ω] at slot origin (world)


def _free_body_W(scene: sc.Scene, dtype):
    """Constant (nb, 6, ngc) jacobian rows of the free bodies: identity
    blocks masked by enabled (disabled bodies have no gc in the reference;
    zero rows keep them immovable). Built host-side — it depends only on
    static scene structure, so the compiled step carries it as a constant
    instead of per-step scatter ops."""
    import numpy as np

    nb, ngc = scene.nb, scene.ngc
    W0 = np.zeros((nb, 6, ngc), np.dtype(dtype))
    enabled = np.asarray(scene.slot_enabled)[:nb]
    for b in range(nb):
        if enabled[b]:
            W0[b, :, 6 * b : 6 * b + 6] = np.eye(6)
    return jnp.asarray(W0)


def compute(scene: sc.Scene, st: sc.State) -> PoseTable:
    ns = scene.n_pose_slots
    nb = scene.nb
    ngc = scene.ngc
    dtype = st.pos.dtype

    if not scene.arts:
        # free bodies only: the state IS the pose table; W is a constant
        return PoseTable(
            pos=st.pos, quat=st.quat, vel=st.vel, omega=st.omega,
            W=_free_body_W(scene, dtype),
        )

    # slot tables assemble by concatenation (free bodies, then each AB's
    # links in slot order) — per-slot .at[s].set writes were real
    # dynamic-update-slice device time in the articulated MPC profile
    pos_parts = [st.pos] if nb else []
    quat_parts = [st.quat] if nb else []
    vel_parts = [st.vel] if nb else []
    omega_parts = [st.omega] if nb else []
    W_parts = [_free_body_W(scene, dtype)] if nb else []

    for ent in scene.arts:
        m: amdl.ArticulatedModel = ent.model
        q = st.q_art[ent.q_off : ent.q_off + m.nq]
        qd = st.qd_art[ent.v_off : ent.v_off + m.nv]
        Xs, Ss = amdl.joint_transforms(m, q)

        Rs, ps = [], []
        Wl = []  # per-link (6=[v,ω], nv) world jacobian at link origin
        vs, ws = [], []
        for i in range(m.nl):
            X = Xs[i]
            p_par = m.parent[i]
            if p_par < 0:
                R = X.E.T
                p = X.r
                Wp = jnp.zeros((6, m.nv), dtype)
            else:
                Rp, pp = Rs[p_par], ps[p_par]
                R = Rp @ X.E.T
                p = pp + Rp @ X.r
                Wpar = Wl[p_par]
                # shift the parent jacobian from the parent origin to this
                # link origin: v_col_new = v_col + ω_col × r
                r = p - ps[p_par]
                Wp_v = Wpar[:3] + jnp.cross(Wpar[3:].T, r[None, :]).T
                Wp = jnp.concatenate([Wp_v, Wpar[3:]], axis=0)
            # add this joint's own columns: S expressed in link frame
            S = Ss[i]
            nvi = S.shape[1]
            if nvi:
                Sw_ang = R @ S[:3]          # (3, nvi) world angular
                Sw_lin = R @ S[3:]          # linear at link origin
                cols = jnp.concatenate([Sw_lin, Sw_ang], axis=0)
                vo = m.v_off[i]
                Wp = Wp.at[:, vo : vo + nvi].add(cols)
            Wl.append(Wp)
            Rs.append(R)
            ps.append(p)
            sv = Wp @ qd
            vs.append(sv[:3])
            ws.append(sv[3:])

        pos_parts.append(jnp.stack(ps))
        quat_parts.append(jnp.stack([quat.from_matrix(R) for R in Rs]))
        vel_parts.append(jnp.stack(vs))
        omega_parts.append(jnp.stack(ws))
        W_parts.append(
            jnp.pad(
                jnp.stack(Wl),
                ((0, 0), (0, 0),
                 (ent.gc_off, ngc - ent.gc_off - m.nv)),
            )
        )

    return PoseTable(
        pos=jnp.concatenate(pos_parts, axis=0),
        quat=jnp.concatenate(quat_parts, axis=0),
        vel=jnp.concatenate(vel_parts, axis=0),
        omega=jnp.concatenate(omega_parts, axis=0),
        W=jnp.concatenate(W_parts, axis=0),
    )


def gc_velocity(scene: sc.Scene, st: sc.State):
    """Assemble the global generalized velocity vector."""
    dtype = st.pos.dtype
    parts = []
    if scene.nb:
        parts.append(jnp.concatenate([st.vel, st.omega], axis=-1).reshape(-1))
    if scene.nv_art:
        parts.append(st.qd_art)
    if not parts:
        return jnp.zeros(0, dtype)
    return jnp.concatenate(parts)


def apply_gc_velocity_delta(scene: sc.Scene, st: sc.State, dv):
    """Scatter a gc-velocity delta back into the state."""
    nb = scene.nb
    if nb:
        dvb = dv[: 6 * nb].reshape(nb, 6)
        st = st.replace(vel=st.vel + dvb[:, :3], omega=st.omega + dvb[:, 3:])
    if scene.nv_art:
        st = st.replace(qd_art=st.qd_art + dv[6 * nb :])
    return st
