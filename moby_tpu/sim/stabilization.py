"""Post-step constraint stabilization (position projection).

Mirrors `ConstraintStabilization::stabilize` (src/ConstraintStabilization.cpp:167):
while the minimum pairwise signed distance is below eps (= NEAR_ZERO), solve a
position-level LCP over the contact-normal Jacobians

    Cn·inv(M)·Cn' z + (dist - |eps| - NEAR_ZERO) >= 0,  z >= 0

(the reference's `determine_dq`, :932) and move the configuration by the
resulting generalized displacement. The reference guards the update with a
Ridders'-rootfinding line search so no *new* violation is introduced
(`update_q`, :1056 / `ridders_unilateral`, :1322); here the guard is a
fixed-candidate backtracking select (t in {1, 1/2, 1/4}, keep the step with
the largest post-step violation slack, largest t on ties) — fixed iteration
count instead of dynamic rootfinding, same no-new-violation invariant. The
loop is violation-driven with a deep safety cap (the reference's
`max_iterations`); resting scenes exit after one distance check.
Velocities untouched.
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
from . import kinematics

MAX_STAB_ITERS = 50   # safety cap; the loop is violation-driven (cond)


def _limit_violation(scene, s):
    """Signed joint-limit slack (>= 0 when satisfied): hi - q / q - lo."""
    if scene.n_limits == 0:
        return jnp.zeros(0, s.pos.dtype)
    q = s.q_art[scene.lim_q_idx]
    return jnp.where(scene.lim_upper, scene.lim_value - q, q - scene.lim_value)


def stabilize(scene: sc.Scene, st: sc.State) -> sc.State:
    dtype = st.pos.dtype
    nz = cfg.near_zero(dtype)
    if scene.n_contacts == 0 and scene.n_limits == 0 and not scene.bilaterals:
        return st
    if scene.stab_max_iters == 0:
        # disabled (XML constraint-stabilization-max-iterations="0",
        # used by compliant-contact scenes like ur10.xml)
        return st

    def min_dist(s):
        vals = [jnp.array([jnp.inf], dtype), _limit_violation(scene, s)]
        if scene.n_pairs:
            pt = kinematics.compute(scene, s)
            pd, _ = nph.narrow_phase(
                scene, pt.pos, pt.quat, jnp.asarray(nz, dtype)
            )
            vals.append(pd.dist)
        return jnp.min(jnp.concatenate(vals))

    def bilateral_vio(s):
        if not scene.bilaterals:
            return jnp.zeros((), dtype)
        from . import bilateral as bil

        pt = kinematics.compute(scene, s)
        _, C = bil.constraint_rows(scene, s, pt)
        return jnp.max(jnp.abs(C))

    def cond(carry):
        s, it = carry
        # while (max_uvio < eps || max_bvio > bilateral_eps), :197
        return ((min_dist(s) < nz) | (bilateral_vio(s) > 1e-6)) & (
            it < min(MAX_STAB_ITERS, scene.stab_max_iters)
        )

    def body(carry):
        s, it = carry
        pt = kinematics.compute(scene, s)
        if scene.n_contacts or scene.n_limits:
            _, con = nph.narrow_phase(
                scene, pt.pos, pt.quat, jnp.asarray(jnp.inf, dtype)
            )
            act = con.active & jnp.isfinite(con.depth)
            all_lim = (
                jnp.ones(scene.n_limits, bool)
                if scene.n_limits
                else jnp.zeros(0, bool)
            )

            p = impact.assemble_problem(scene, s, pt, con, act, all_lim)
            # stacked [contacts; limits] position LCP (determine_dq:932)
            MM = jnp.block([[p.Ann, p.Anl], [p.Anl.T, p.All]])
            qq = jnp.concatenate(
                [
                    con.depth - jnp.abs(nz) - nz,
                    _limit_violation(scene, s) - jnp.abs(nz) - nz,
                ]
            )
            mact = jnp.concatenate([act, all_lim])
            z, _ok = lcp.solve_lcp_fast_lemke(MM, qq, mact)
            zc = z[: scene.n_contacts]
            zl = z[scene.n_contacts :]

            # generalized displacement dq = inv(M) [Cn' L'] z
            dv = p.Minv @ (p.Jn.T @ zc + p.Jl.T @ zl)
        else:
            dv = jnp.zeros(scene.ngc, dtype)
        if scene.bilaterals:
            # Newton projection of the bilateral violation C(q) -> 0
            from . import bilateral as bil
            from . import impact as imp

            Jb, C = bil.constraint_rows(scene, s, pt)
            Minv_raw = imp.gc_inv_inertia(scene, s, s.quat)
            JM = Jb @ Minv_raw
            G = JM @ Jb.T + 1e-12 * jnp.eye(Jb.shape[0], dtype=dtype)
            dv = dv - JM.T @ jnp.linalg.solve(G, C)
        nb = scene.nb

        def apply_dq(s0, t):
            s2 = s0
            if nb:
                dvb = dv[: 6 * nb].reshape(nb, 6) * t
                newpos = s0.pos + dvb[:, :3]
                newquat = quat.normalize(
                    s0.quat + quat.deriv(s0.quat, dvb[:, 3:])
                )
                s2 = s2.replace(pos=newpos, quat=newquat)
            if scene.nv_art:
                from .stepper import integrate_art_q

                s2 = s2.replace(
                    q_art=integrate_art_q(scene, s2.q_art, dv[6 * nb :], t)
                )
            return s2

        def slack(s2):
            # violation slack: min signed distance, netted against bilateral
            # drift (both are the quantities the reference's loop monitors)
            return jnp.minimum(min_dist(s2), nz - bilateral_vio(s2))

        # backtracking guard (Ridders analog): try the full projection step
        # first, halve while it makes the worst violation worse
        cands = [apply_dq(s, jnp.asarray(t, dtype)) for t in (1.0, 0.5, 0.25)]
        scores = jnp.stack([slack(c) for c in cands])
        best = jnp.argmax(scores)   # first (largest t) wins ties
        s = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs)[best], *cands
        )
        return s, it + 1

    st_f, _ = jax.lax.while_loop(cond, body, (st, jnp.array(0, jnp.int32)))
    return st_f
