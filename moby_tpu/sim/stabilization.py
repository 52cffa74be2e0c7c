"""Post-step constraint stabilization (position projection).

Mirrors `ConstraintStabilization::stabilize` (src/ConstraintStabilization.cpp:167):
while the minimum pairwise signed distance is below eps (= NEAR_ZERO), solve a
position-level LCP over the contact-normal Jacobians

    Cn·inv(M)·Cn' z + (dist - |eps| - NEAR_ZERO) >= 0,  z >= 0

(the reference's `determine_dq`, :932) and move the configuration by the
resulting generalized displacement. The reference guards the update with a
Ridders'-rootfinding line search so no *new* violation is introduced
(`update_q`, :1056); our contact displacements are ~NEAR_ZERO-scale so a full
step is taken (t=1), matching the benign-case behavior. Iteration-capped.

Velocities are untouched (the reference zeroes and restores them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config as cfg
from ..core import scene as sc
from ..geometry import narrowphase as nph
from ..math import quaternion as quat
from ..solvers import lcp
from . import impact

MAX_STAB_ITERS = 4


def stabilize(scene: sc.Scene, st: sc.State) -> sc.State:
    dtype = st.pos.dtype
    nz = cfg.near_zero(dtype)
    if scene.n_contacts == 0:
        return st

    def min_dist(pos, quat_b):
        pd, _ = nph.narrow_phase(scene, pos, quat_b, jnp.asarray(nz, dtype))
        return jnp.min(
            jnp.concatenate([pd.dist, jnp.array([jnp.inf], dtype)])
        )

    def cond(carry):
        pos, quat_b, it = carry
        return (min_dist(pos, quat_b) < nz) & (it < MAX_STAB_ITERS)

    def body(carry):
        pos, quat_b, it = carry
        # contacts with an "infinite" activation tolerance: every slot with a
        # finite signed distance participates; impulses only flow where
        # dist < 2*NEAR_ZERO through the LCP q-vector
        _, con = nph.narrow_phase(scene, pos, quat_b, jnp.asarray(jnp.inf, dtype))
        act = con.active & jnp.isfinite(con.depth)

        zeros = jnp.zeros_like(st.vel)
        p = impact.assemble_problem(scene, pos, quat_b, zeros, zeros, con, act)
        qq = con.depth - jnp.abs(nz) - nz
        z, ok = lcp.lcp_fast(p.Ann, qq, act)
        z2, ok2 = lcp.lcp_lemke_regularized(p.Ann, qq, act)
        z = jnp.where(ok, z, z2)

        # generalized displacement dq = inv(M) Cn' z
        wrench = jnp.einsum("kbi,k->bi", p.Jn, z)
        dv6 = jnp.einsum("bij,bj->bi", p.Minv, wrench)
        newpos = pos + dv6[:, 0:3]
        newquat = quat.normalize(quat_b + quat.deriv(quat_b, dv6[:, 3:6]))
        return newpos, newquat, it + 1

    pos, quat_b, _ = jax.lax.while_loop(
        cond, body, (st.pos, st.quat, jnp.array(0, jnp.int32))
    )
    return st.replace(pos=pos, quat=quat_b)
