"""Featherstone articulated-body algorithm (ABA) and RNEA.

The native replacement for Ravelin's `RCArticulatedBodyd` forward dynamics
(the reference's `fdyn-algorithm fsab` path, src/RCArticulatedBody.cpp:178-193;
the actual algorithm lives outside the reference repo in Ravelin —
`src/RCArticulatedBodyFwdDynAlgo.cpp` is an empty stub).

O(n) forward dynamics over the static link tree; Python loops unroll at trace
time (trees are short); `vmap` provides batching.

Conventions: [ω; v] spatial vectors in link frames; gravity enters through a
fictitious base acceleration a0 = -g (standard Featherstone trick).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp

from ..math import spatial as sp
from .model import ArticulatedModel, NV, joint_transforms


def _gravity_accel(model, gravity, dtype):
    return jnp.concatenate([jnp.zeros(3, dtype), -jnp.asarray(gravity, dtype)])


def link_velocities(model: ArticulatedModel, Xs, Ss, qd):
    """Spatial velocity of each link in its own frame."""
    vs = []
    for i in range(model.nl):
        vo = model.v_off[i]
        nvi = NV[model.jtype[i]]
        vJ = Ss[i] @ qd[vo : vo + nvi] if nvi else jnp.zeros(6, qd.dtype)
        if model.parent[i] < 0:
            v = vJ
        else:
            v = sp.xform_motion(Xs[i], vs[model.parent[i]]) + vJ
        vs.append(v)
    return vs


def aba(model: ArticulatedModel, q, qd, tau, gravity, f_ext: Optional[list] = None):
    """Forward dynamics: qdd from applied joint torques + external link forces.

    f_ext: optional list of spatial forces (6,) on each link, expressed in the
    link's own frame.
    """
    dtype = q.dtype
    Xs, Ss = joint_transforms(model, q)
    nl = model.nl

    # pass 1: velocities and bias
    v = link_velocities(model, Xs, Ss, qd)
    c = []
    for i in range(nl):
        vo = model.v_off[i]
        nvi = NV[model.jtype[i]]
        vJ = Ss[i] @ qd[vo : vo + nvi] if nvi else jnp.zeros(6, dtype)
        c.append(sp.cross_motion(v[i], vJ))

    IA = [jnp.asarray(model.I_link[i], dtype) for i in range(nl)]
    pA = []
    for i in range(nl):
        bias = sp.cross_force(v[i], IA[i] @ v[i])
        if f_ext is not None and f_ext[i] is not None:
            bias = bias - f_ext[i]
        pA.append(bias)

    # pass 2: articulated inertia backward
    U = [None] * nl
    D_inv = [None] * nl
    u = [None] * nl
    order = list(range(nl - 1, -1, -1))
    for i in order:
        S = Ss[i]
        nvi = S.shape[1]
        vo = model.v_off[i]
        if nvi:
            U[i] = IA[i] @ S                       # (6, nvi)
            D = S.T @ U[i]                         # (nvi, nvi)
            D_inv[i] = jnp.linalg.inv(D)
            u[i] = tau[vo : vo + nvi] - S.T @ pA[i]
        p = model.parent[i]
        if p >= 0:
            if nvi:
                Ia = IA[i] - U[i] @ D_inv[i] @ U[i].T
                pa = pA[i] + Ia @ c[i] + U[i] @ (D_inv[i] @ u[i])
            else:
                Ia = IA[i]
                pa = pA[i] + Ia @ c[i]
            Xm = sp.motion_matrix(Xs[i])           # parent -> child
            IA[p] = IA[p] + Xm.T @ Ia @ Xm
            pA[p] = pA[p] + sp.xform_force(Xs[i].inv(), pa)

    # pass 3: accelerations forward
    a0 = _gravity_accel(model, gravity, dtype)
    a = [None] * nl
    qdd = jnp.zeros(model.nv, dtype)
    for i in range(nl):
        p = model.parent[i]
        a_par = sp.xform_motion(Xs[i], a0 if p < 0 else a[p]) + c[i]
        S = Ss[i]
        nvi = S.shape[1]
        vo = model.v_off[i]
        if nvi:
            qdd_i = D_inv[i] @ (u[i] - U[i].T @ a_par)
            qdd = qdd.at[vo : vo + nvi].set(qdd_i)
            a[i] = a_par + S @ qdd_i
        else:
            a[i] = a_par
    return qdd


def rnea(model: ArticulatedModel, q, qd, qdd, gravity, f_ext: Optional[list] = None):
    """Inverse dynamics: joint forces realizing qdd (used for the CRB bias
    C(q,qd) with qdd=0 and for cross-checks)."""
    dtype = q.dtype
    Xs, Ss = joint_transforms(model, q)
    nl = model.nl
    a0 = _gravity_accel(model, gravity, dtype)

    v = [None] * nl
    a = [None] * nl
    f = [None] * nl
    for i in range(nl):
        vo = model.v_off[i]
        nvi = NV[model.jtype[i]]
        S = Ss[i]
        vJ = S @ qd[vo : vo + nvi] if nvi else jnp.zeros(6, dtype)
        aJ = S @ qdd[vo : vo + nvi] if nvi else jnp.zeros(6, dtype)
        p = model.parent[i]
        v_par = jnp.zeros(6, dtype) if p < 0 else v[p]
        a_par = a0 if p < 0 else a[p]
        v[i] = sp.xform_motion(Xs[i], v_par) + vJ
        a[i] = sp.xform_motion(Xs[i], a_par) + aJ + sp.cross_motion(v[i], vJ)
        I = jnp.asarray(model.I_link[i], dtype)
        f[i] = I @ a[i] + sp.cross_force(v[i], I @ v[i])
        if f_ext is not None and f_ext[i] is not None:
            f[i] = f[i] - f_ext[i]

    tau = jnp.zeros(model.nv, dtype)
    for i in range(nl - 1, -1, -1):
        S = Ss[i]
        nvi = S.shape[1]
        vo = model.v_off[i]
        if nvi:
            tau = tau.at[vo : vo + nvi].set(S.T @ f[i])
        p = model.parent[i]
        if p >= 0:
            f[p] = f[p] + sp.xform_force(Xs[i].inv(), f[i])
    return tau


def crb(model: ArticulatedModel, q):
    """Composite-rigid-body mass matrix H(q) (the reference's `crb` fdyn path)."""
    dtype = q.dtype
    Xs, Ss = joint_transforms(model, q)
    nl = model.nl
    nv = model.nv
    Ic = [jnp.asarray(model.I_link[i], dtype) for i in range(nl)]
    H = jnp.zeros((nv, nv), dtype)

    for i in range(nl - 1, -1, -1):
        p = model.parent[i]
        if p >= 0:
            Xm = sp.motion_matrix(Xs[i])
            Ic[p] = Ic[p] + Xm.T @ Ic[i] @ Xm

    for i in range(nl):
        S = Ss[i]
        nvi = S.shape[1]
        if not nvi:
            continue
        vo = model.v_off[i]
        F = Ic[i] @ S                      # (6, nvi)
        H = H.at[vo : vo + nvi, vo : vo + nvi].set(S.T @ F)
        j = i
        while model.parent[j] >= 0:
            Xm = sp.motion_matrix(Xs[j])
            F = Xm.T @ F
            j = model.parent[j]
            Sj = Ss[j]
            nvj = Sj.shape[1]
            if nvj:
                vj = model.v_off[j]
                blk = Sj.T @ F             # (nvj, nvi)
                H = H.at[vj : vj + nvj, vo : vo + nvi].set(blk)
                H = H.at[vo : vo + nvi, vj : vj + nvj].set(blk.T)
    return H


def fwd_dyn_crb(model: ArticulatedModel, q, qd, tau, gravity, f_ext=None):
    """Forward dynamics via H qdd = tau - C (the reference's `crb` option)."""
    H = crb(model, q)
    C = rnea(model, q, qd, jnp.zeros(model.nv, q.dtype), gravity, f_ext)
    return jnp.linalg.solve(H, tau - C)
