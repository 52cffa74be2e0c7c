"""Impact/impulse resolution: the Drumwright–Shell QP-as-LCP model.

Mirrors the reference's live solver path
(`ImpactConstraintHandler::apply_model`, src/ImpactConstraintHandler.cpp:96):

1. connected constraint groups over enabled bodies (islands), dropping groups
   with no impacting (`eNegative`) constraint
   (`UnilateralConstraint::determine_connected_constraints` +
   `remove_inactive_groups`, src/UnilateralConstraint.cpp:940-1220);
2. contact/limit Jacobians and Delassus blocks
   (`compute_problem_data`, src/ImpactConstraintHandler.cpp:1898+);
3. the QP stacked as a monolithic KKT LCP `[[H, -M'], [M, 0]]`
   (`setup_QP` + `solve_qp_work`, src/ImpactConstraintHandlerQP.cpp:94-499)
   solved by `lcp_fast_regularized(-20,4,-8)` with Lemke fallback, warm-started
   from the previous step's solution (`_zlast`);
4. Poisson restitution with the conditional second impact solve
   (`apply_restitution` + re-solve, src/ImpactConstraintHandler.cpp:577-602).

TPU design: one *joint* LCP over all islands instead of per-island solves.
For the (convex) QP model the two are trajectory-equivalent: the joint system
is block-diagonal across islands, and although degenerate problems admit many
impulse distributions, the per-body wrench (hence the velocity update) is
unique, so trajectories match. Inactive islands are masked out exactly as
`remove_inactive_groups` drops them.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import config as cfg
from ..core import scene as sc
from ..geometry.narrowphase import Contacts
from ..math import quaternion as quat
from ..solvers import lcp


class ImpactResult(NamedTuple):
    vel: jnp.ndarray
    omega: jnp.ndarray
    zlast: jnp.ndarray
    zlast_active: jnp.ndarray
    impulses_n: jnp.ndarray  # (K,) final normal impulse magnitudes (diagnostics)


def contact_velocities(scene: sc.Scene, pos, vel, omega, con: Contacts):
    """Per-slot relative velocity of body1's material point minus body2's,
    projected on (n, t1, t2). (reference UnilateralConstraint::calc_constraint_vel)."""
    b1, b2 = scene.slot_b1, scene.slot_b2
    r1 = con.point - pos[b1]
    r2 = con.point - pos[b2]
    vp1 = vel[b1] + jnp.cross(omega[b1], r1)
    vp2 = vel[b2] + jnp.cross(omega[b2], r2)
    rv = vp1 - vp2
    return (
        jnp.sum(rv * con.normal, axis=-1),
        jnp.sum(rv * con.tan1, axis=-1),
        jnp.sum(rv * con.tan2, axis=-1),
    )


def island_labels(scene: sc.Scene, active):
    """Connected components over *enabled* bodies through active contacts
    (disabled bodies are not nodes: src/UnilateralConstraint.cpp:958-975).

    Returns (labels (nb,), n iterations run). Min-label propagation for nb
    rounds (an upper bound on graph diameter)."""
    nb = scene.nb
    labels0 = jnp.arange(nb, dtype=jnp.int32)
    b1, b2 = scene.slot_b1, scene.slot_b2
    both = scene.enabled[b1] & scene.enabled[b2] & active

    def body(_, labels):
        l1 = labels[b1]
        l2 = labels[b2]
        m = jnp.minimum(l1, l2)
        big = jnp.int32(nb)
        upd1 = jnp.where(both, m, big)
        upd2 = jnp.where(both, m, big)
        labels = labels.at[b1].min(upd1)
        labels = labels.at[b2].min(upd2)
        return labels

    return jax.lax.fori_loop(0, nb, body, labels0)


def active_solve_mask(scene: sc.Scene, con: Contacts, cn_vel, near_zero):
    """Constraints that actually get solved: active slots whose island has at
    least one impacting (vel < -tol) constraint (`remove_inactive_groups`)."""
    labels = island_labels(scene, con.active)
    b1, b2 = scene.slot_b1, scene.slot_b2
    # a constraint's island: via an enabled endpoint
    lab1 = jnp.where(scene.enabled[b1], labels[b1], jnp.int32(scene.nb))
    lab2 = jnp.where(scene.enabled[b2], labels[b2], jnp.int32(scene.nb))
    slot_lab = jnp.minimum(lab1, lab2)
    neg = con.active & (cn_vel < -near_zero)
    # scatter-or: which labels have an impacting constraint
    has_neg = jnp.zeros(scene.nb + 1, bool).at[slot_lab].max(neg)
    return con.active & has_neg[slot_lab], slot_lab


class Problem(NamedTuple):
    Jn: jnp.ndarray   # (K, nb, 6) rows in [v; ω] layout
    Js: jnp.ndarray
    Jt: jnp.ndarray
    Minv: jnp.ndarray  # (nb, 6, 6)
    Ann: jnp.ndarray  # Delassus blocks (Cn_X_CnT etc.)
    Ans: jnp.ndarray
    Ant: jnp.ndarray
    Ass: jnp.ndarray
    Ast: jnp.ndarray
    Att: jnp.ndarray
    Cn_v: jnp.ndarray
    Cs_v: jnp.ndarray
    Ct_v: jnp.ndarray


def _contact_jacobian(scene, pos, con, act, d_vec):
    """(K, nb, 6) Jacobian for direction array d_vec (K,3): +d on body1,
    -d on body2, with moment arms about each COM
    (reference add_contact_dir_to_Jacobian, src/ImpactConstraintHandler.cpp:1857)."""
    K, nb = scene.n_contacts, scene.nb
    dtype = pos.dtype
    b1, b2 = scene.slot_b1, scene.slot_b2
    r1 = con.point - pos[b1]
    r2 = con.point - pos[b2]
    J = jnp.zeros((K, nb, 6), dtype)
    dm = jnp.where(act[:, None], d_vec, 0.0)
    rows = jnp.arange(K)
    J = J.at[rows, b1, 0:3].add(dm)
    J = J.at[rows, b1, 3:6].add(jnp.cross(r1, dm))
    J = J.at[rows, b2, 0:3].add(-dm)
    J = J.at[rows, b2, 3:6].add(-jnp.cross(r2, dm))
    # disabled bodies have no generalized coordinates in the reference; zero
    # their columns (their inverse inertia is zero anyway)
    J = J * scene.enabled[None, :, None]
    return J


def body_inv_inertia_world(scene, quat_b):
    """Block-diagonal spatial inverse inertia (nb, 6, 6), [v; ω] layout."""
    R = quat.to_matrix(quat_b)
    Iinv_w = R @ scene.inv_inertia @ jnp.swapaxes(R, -1, -2)
    nb = scene.nb
    dtype = quat_b.dtype
    Minv = jnp.zeros((nb, 6, 6), dtype)
    eye = jnp.eye(3, dtype=dtype)
    Minv = Minv.at[:, 0:3, 0:3].set(scene.inv_mass[:, None, None] * eye)
    Minv = Minv.at[:, 3:6, 3:6].set(Iinv_w)
    return Minv


def assemble_problem(scene, pos, quat_b, vel, omega, con: Contacts, act) -> Problem:
    Jn = _contact_jacobian(scene, pos, con, act, con.normal)
    Js = _contact_jacobian(scene, pos, con, act, con.tan1)
    Jt = _contact_jacobian(scene, pos, con, act, con.tan2)
    Minv = body_inv_inertia_world(scene, quat_b)

    # W = inv(M) J' per direction: (K, nb, 6)
    Wn = jnp.einsum("kbi,bij->kbj", Jn, Minv)
    Ws = jnp.einsum("kbi,bij->kbj", Js, Minv)
    Wt = jnp.einsum("kbi,bij->kbj", Jt, Minv)

    def dele(Ja, Wb):
        return jnp.einsum("kbi,lbi->kl", Ja, Wb)

    v6 = jnp.concatenate([vel, omega], axis=-1)  # (nb, 6)
    return Problem(
        Jn=Jn, Js=Js, Jt=Jt, Minv=Minv,
        Ann=dele(Jn, Wn), Ans=dele(Jn, Ws), Ant=dele(Jn, Wt),
        Ass=dele(Js, Ws), Ast=dele(Js, Wt), Att=dele(Jt, Wt),
        Cn_v=jnp.einsum("kbi,bi->k", Jn, v6),
        Cs_v=jnp.einsum("kbi,bi->k", Js, v6),
        Ct_v=jnp.einsum("kbi,bi->k", Jt, v6),
    )


def build_qp_lcp(scene: sc.Scene, p: Problem, act):
    """Stack the QP into the monolithic KKT LCP (setup_QP + solve_qp_work).

    Variables x = [cn, cs, ct, ncs, nct, l]; inequalities ordered
    [Cn·v+ >= 0 (K)] , [L·v+ >= 0 (NL)], [friction rows (NF)].
    MM = [[H, -M'], [M, 0]],  qq = [c, Cn_v, L_v, mu_visc*|v_t|].
    """
    K = scene.n_contacts
    NV = scene.n_vars
    NI = scene.n_ineq
    dtype = p.Ann.dtype

    Ann, Ans, Ant = p.Ann, p.Ans, p.Ant
    Ass, Ast, Att = p.Ass, p.Ast, p.Att

    # H row blocks (contact part; no limits yet)
    row_n = jnp.concatenate([Ann, Ans, Ant, -Ans, -Ant], axis=1)
    row_s = jnp.concatenate([Ans.T, Ass, Ast, -Ass, -Ast], axis=1)
    row_t = jnp.concatenate([Ant.T, Ast.T, Att, -Ast.T, -Att], axis=1)
    H = jnp.concatenate([row_n, row_s, row_t, -row_s, -row_t], axis=0)
    # contact compliance on the cn diagonal (setup_QP:446-448)
    H = H + jnp.diag(
        jnp.concatenate([scene.slot_compliance, jnp.zeros(4 * K, dtype)])
    )

    c = jnp.concatenate([p.Cn_v, p.Cs_v, p.Ct_v, -p.Cs_v, -p.Ct_v])

    # inequality rows
    Mn = row_n                                  # Cn * iM * [all]
    # friction rows
    NF = scene.n_friction_rows
    fr = scene.fr_con
    Mf = jnp.zeros((NF, NV), dtype)
    rows = jnp.arange(NF)
    Mf = Mf.at[rows, fr].set(scene.slot_mu_c[fr])
    Mf = Mf.at[rows, K + fr].set(-scene.fr_cos)
    Mf = Mf.at[rows, 3 * K + fr].set(-scene.fr_cos)
    Mf = Mf.at[rows, 2 * K + fr].set(-scene.fr_sin)
    Mf = Mf.at[rows, 4 * K + fr].set(-scene.fr_sin)

    Mineq = jnp.concatenate([Mn, Mf], axis=0)
    tvel = jnp.sqrt(p.Cs_v ** 2 + p.Ct_v ** 2)
    q_low = jnp.concatenate([p.Cn_v, scene.slot_mu_v[fr] * tvel[fr]])

    MM = jnp.zeros((NV + NI, NV + NI), dtype)
    MM = MM.at[:NV, :NV].set(H)
    MM = MM.at[:NV, NV:].set(-Mineq.T)
    MM = MM.at[NV:, :NV].set(Mineq)
    qq = jnp.concatenate([c, q_low])

    # variable/row activity mask
    var_act = jnp.concatenate([act] * 5)
    row_act = jnp.concatenate([act, act[fr]])
    mask = jnp.concatenate([var_act, row_act])
    return MM, qq, mask


def unstack_impulses(scene: sc.Scene, z):
    K = scene.n_contacts
    cn = z[:K]
    cs = z[K : 2 * K] - z[3 * K : 4 * K]
    ct = z[2 * K : 3 * K] - z[4 * K : 5 * K]
    return cn, cs, ct


def apply_impulses(scene, p: Problem, vel, omega, cn, cs, ct):
    """dv = inv(M) (Jn' cn + Js' cs + Jt' ct) (update_from_stacked)."""
    wrench = (
        jnp.einsum("kbi,k->bi", p.Jn, cn)
        + jnp.einsum("kbi,k->bi", p.Js, cs)
        + jnp.einsum("kbi,k->bi", p.Jt, ct)
    )
    dv6 = jnp.einsum("bij,bj->bi", p.Minv, wrench)
    return vel + dv6[:, 0:3], omega + dv6[:, 3:6]


def _min_constraint_vel(Cn_v, act):
    return jnp.min(jnp.where(act, Cn_v, jnp.inf))


def resolve_impacts(
    scene: sc.Scene, pos, quat_b, vel, omega, con: Contacts, zlast, zlast_active
) -> ImpactResult:
    """The full impact pipeline for one step (QP model).

    No-op when no constraint is impacting (`calc_impacting_unilateral_constraint_forces`
    returns early when none are eNegative, src/ConstraintSimulator.cpp:310-325).
    """
    dtype = pos.dtype
    nz = cfg.near_zero(dtype)
    K = scene.n_contacts

    cn_vel, _, _ = contact_velocities(scene, pos, vel, omega, con)
    act, slot_lab = active_solve_mask(scene, con, cn_vel, nz)
    any_impact = jnp.any(act)

    p = assemble_problem(scene, pos, quat_b, vel, omega, con, act)
    MM, qq, mask = build_qp_lcp(scene, p, act)

    # warm start only if the active set is unchanged (Moby warm-starts when
    # the z vector size matches, i.e. same constraint counts)
    same = jnp.all(zlast_active == act) & jnp.any(zlast_active)
    z0 = jnp.where(same, zlast, jnp.zeros_like(zlast))

    z, ok = lcp.solve_lcp(MM, qq, mask, z0=z0)
    cn1, cs1, ct1 = unstack_impulses(scene, z)
    vel1, om1 = apply_impulses(scene, p, vel, omega, cn1, cs1, ct1)

    # track post-impulse normal velocities (update_constraint_velocities_from_impulses)
    Cn_v1 = p.Cn_v + p.Ann @ cn1 + p.Ans @ cs1 + p.Ant @ ct1
    minv = _min_constraint_vel(Cn_v1, act)

    # Poisson restitution: scale the cn part of the stacked z by epsilon
    # (apply_restitution(q, z): only CN and L segments scale; tangential
    # segments stay — mirrored faithfully)
    eps = scene.slot_eps
    zr = z.at[:K].multiply(eps)
    changed = jnp.any(zr[:K] > nz)

    cn2, cs2, ct2 = unstack_impulses(scene, zr)
    vel2, om2 = apply_impulses(scene, p, vel1, om1, cn2, cs2, ct2)
    Cn_v2 = Cn_v1 + p.Ann @ cn2 + p.Ans @ cs2 + p.Ant @ ct2
    minv_plus = _min_constraint_vel(Cn_v2, act)

    # conditionally solve a second impact problem from the post-restitution
    # velocities (src/ImpactConstraintHandler.cpp:592-602)
    need_resolve = changed & (minv_plus < 0.0) & (minv_plus < minv - nz)

    p2 = Problem(
        Jn=p.Jn, Js=p.Js, Jt=p.Jt, Minv=p.Minv,
        Ann=p.Ann, Ans=p.Ans, Ant=p.Ant, Ass=p.Ass, Ast=p.Ast, Att=p.Att,
        Cn_v=Cn_v2,
        Cs_v=p.Cs_v + p.Ans.T @ (cn1 + cn2) + p.Ass @ (cs1 + cs2) + p.Ast @ (ct1 + ct2),
        Ct_v=p.Ct_v + p.Ant.T @ (cn1 + cn2) + p.Ast.T @ (cs1 + cs2) + p.Att @ (ct1 + ct2),
    )
    MM2, qq2, _ = build_qp_lcp(scene, p2, act)
    z3, ok3 = lcp.solve_lcp(MM2, qq2, mask, z0=z)
    cn3, cs3, ct3 = unstack_impulses(scene, z3)
    vel3, om3 = apply_impulses(scene, p2, vel2, om2, cn3, cs3, ct3)

    vel_f = jnp.where(need_resolve, vel3, jnp.where(changed, vel2, vel1))
    om_f = jnp.where(need_resolve, om3, jnp.where(changed, om2, om1))
    z_f = jnp.where(need_resolve, z3, z)

    # no impacting constraints at all -> untouched state
    vel_out = jnp.where(any_impact, vel_f, vel)
    om_out = jnp.where(any_impact, om_f, omega)
    z_out = jnp.where(any_impact, z_f, zlast)
    za_out = jnp.where(any_impact, act, zlast_active)
    cn_total = jnp.where(
        any_impact,
        cn1 + jnp.where(changed, cn2, 0.0) + jnp.where(need_resolve, cn3, 0.0),
        jnp.zeros(K, dtype),
    )
    return ImpactResult(vel_out, om_out, z_out, za_out, cn_total)
