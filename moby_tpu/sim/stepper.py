"""The time-stepping simulator core.

Pure-functional, jittable mirror of the reference's live stepper
(`TimeSteppingSimulator::step` -> `step_si_Euler` -> `do_mini_step`,
src/TimeSteppingSimulator.cpp:52-222):

  step(dt):
    while h < dt:  do_mini_step(dt-h)           [lax.while_loop]
    constraint stabilization                    [see stabilization.py]

  do_mini_step(Δ):
    save q
    while h < Δ:                                [lax.while_loop]
      CA = conservative advancement bound       (CCD::calc_CA_Euler_step +
      if CA <= 0: break                          joint-limit ETAs,
      tc = min(Δ-h, max(min_step_size, CA))      TimeSteppingSimulator:272-331)
      q  = qsave + qd_euler·(h+tc)              (position from saved coords,
      h += tc                                    Euler velocity at qsave)
    a = fwd_dyn(q, v)                           (free bodies: Newton-Euler;
    v += a·h ;  dissipation                      articulated: Featherstone ABA)
    find contacts at q;  impact handler         [impact.resolve_impacts]

Everything is fixed-shape; the two while loops have data-dependent trip counts
exactly like the reference (safety-capped). Batch scenarios with `jax.vmap`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import config as cfg
from ..core import scene as sc
from ..dynamics import aba as art_dyn
from ..dynamics import model as amdl
from ..geometry import narrowphase as nph
from ..math import quaternion as quat
from . import impact
from . import kinematics
from . import stabilization

MAX_MINI_STEPS = 64
MAX_CA_ITERS = 32


def forward_dynamics_free(scene: sc.Scene, quat_b, omega, vel=None):
    """Free-body accelerations: gravity + gyroscopic moment + drag forces
    (Ravelin RigidBodyd::calc_fwd_dyn + StokesDragForce/DampingForce).

    The rotation/inertia chain runs only over the statically-live bodies
    (enabled & massive): disabled fixtures' rows are exact zeros anyway,
    and under the MPC linearizers every op here fans out over nx+nu
    tangents — trimming dead rows at trace time halves that for scenes
    with a ground fixture."""
    import numpy as _np

    live_np = _np.asarray(scene.enabled) & (_np.asarray(scene.mass) > 0)
    live = jnp.asarray(live_np)
    a_lin = jnp.where(live[:, None], scene.gravity[None, :], 0.0)
    if vel is not None:
        # F = -b v (src/StokesDragForce.cpp:33-62)
        a_lin = a_lin - scene.inv_mass[:, None] * scene.drag_lin[:, None] * vel
    il = _np.nonzero(live_np)[0]
    nb = scene.nb
    if len(il) == 0:
        return a_lin, jnp.zeros_like(omega)
    gather = len(il) < nb
    q_l = quat_b[il] if gather else quat_b
    w_l = omega[il] if gather else omega
    R = quat.to_matrix(q_l)
    Iw = R @ scene.inertia[il] @ jnp.swapaxes(R, -1, -2)
    Iw_inv = R @ scene.inv_inertia[il] @ jnp.swapaxes(R, -1, -2)
    gyro = -jnp.cross(w_l, jnp.einsum("bij,bj->bi", Iw, w_l))
    if vel is not None:
        # τ = -b_ang ω
        gyro = gyro - scene.drag_ang[il, None] * w_l
    a_ang_l = jnp.einsum("bij,bj->bi", Iw_inv, gyro)
    if not gather:
        return a_lin, jnp.where(live[:, None], a_ang_l, 0.0)
    a_ang = jnp.zeros_like(omega).at[il].set(a_ang_l)
    return a_lin, a_ang


def penalty_forces(scene: sc.Scene, pt, con):
    """Compliant (penalty) contact forces: spring-damper on the deepest
    compliant contact per pair (PenaltyConstraintHandler.cpp:79-205).
    Returns a gc force vector."""
    dtype = pt.pos.dtype
    f_gc = jnp.zeros(scene.ngc, dtype)
    if scene.n_contacts == 0:
        return f_gc
    compl_slots = scene.slot_compliant & (con.depth < 0.0)
    # deepest per pair
    pair_min = jnp.full(scene.n_pairs, jnp.inf, dtype).at[con.pair].min(
        jnp.where(compl_slots, con.depth, jnp.inf)
    )
    deepest = compl_slots & (con.depth <= pair_min[con.pair] + 0.0)

    cnv, csv, ctv = impact.contact_velocities(scene, pt, con)
    fN = jnp.maximum(
        0.0, -con.depth * scene.slot_kp - cnv * scene.slot_kv
    )
    fN = jnp.where(deepest, fN, 0.0)
    # viscous sliding friction
    fs = -jnp.sign(csv) * fN * scene.slot_mu_v
    ft = -jnp.sign(ctv) * fN * scene.slot_mu_v
    # force on body1 along +n (+tangential), reaction on body2
    s1, s2 = con.s1, con.s2
    fvec = (
        fN[:, None] * con.normal + fs[:, None] * con.tan1 + ft[:, None] * con.tan2
    )
    r1 = con.point - pt.pos[s1]
    r2 = con.point - pt.pos[s2]
    w1 = jnp.concatenate([fvec, jnp.cross(r1, fvec)], axis=-1)
    w2 = jnp.concatenate([fvec, jnp.cross(r2, fvec)], axis=-1)
    f_gc = jnp.einsum("ki,kij->j", w1, pt.W[s1]) - jnp.einsum(
        "ki,kij->j", w2, pt.W[s2]
    )
    return f_gc


def articulated_qdd(scene: sc.Scene, st: sc.State, tau=None):
    """Joint accelerations of every articulated body (`fdyn-algorithm fsab`)."""
    if scene.nv_art == 0:
        return jnp.zeros(0, st.pos.dtype)
    parts = []
    for ent in scene.arts:
        m = ent.model
        q = st.q_art[ent.q_off : ent.q_off + m.nq]
        qd = st.qd_art[ent.v_off : ent.v_off + m.nv]
        t = (
            tau[ent.v_off : ent.v_off + m.nv]
            if tau is not None
            else jnp.zeros(m.nv, q.dtype)
        )
        parts.append(art_dyn.aba(m, q, qd, t, scene.gravity))
    return jnp.concatenate(parts)


def integrate_art_q(scene: sc.Scene, q_art, qd_art, h):
    """Euler-coordinate position integration per joint type (the reference's
    eEuler coordinates: quaternion joints integrate via quaternion derivative)."""
    if scene.nq_art == 0:
        return q_art
    out = q_art
    for ent in scene.arts:
        m = ent.model
        for i in range(m.nl):
            t = m.jtype[i]
            qo = ent.q_off + m.q_off[i]
            vo = ent.v_off + m.v_off[i]
            if t in (amdl.REVOLUTE, amdl.PRISMATIC):
                out = out.at[qo].add(qd_art[vo] * h)
            elif t == amdl.UNIVERSAL:
                out = out.at[qo : qo + 2].add(qd_art[vo : vo + 2] * h)
            elif t == amdl.PLANAR:
                out = out.at[qo : qo + 3].add(qd_art[vo : vo + 3] * h)
            elif t == amdl.SPHERICAL:
                qq = q_art[qo : qo + 4]
                w = qd_art[vo : vo + 3]
                qq2 = quat.normalize(qq + quat.deriv(qq, w) * h)
                out = out.at[qo : qo + 4].set(qq2)
            elif t == amdl.FLOATING:
                pos = q_art[qo : qo + 3]
                qq = q_art[qo + 3 : qo + 7]
                # floating joint qd: [ω_base; v_base] in base coords -> world
                wv = qd_art[vo : vo + 6]
                Rb = quat.to_matrix(qq)
                w_w = Rb @ wv[:3]
                v_w = Rb @ wv[3:]
                out = out.at[qo : qo + 3].set(pos + v_w * h)
                qq2 = quat.normalize(qq + quat.deriv(qq, w_w) * h)
                out = out.at[qo + 3 : qo + 7].set(qq2)
    return out


def _slot_dir_speed(scene, pt, n, s):
    """Max surface speed of pose slot s along direction n:
    n·v + ||ω × n||·rmax (CCD::calc_max_dist, src/CCD.cpp:585-607)."""
    sp = jnp.sum(n * pt.vel[s], axis=-1) + jnp.linalg.norm(
        jnp.cross(pt.omega[s], n), axis=-1
    ) * scene.slot_rmax[s]
    return jnp.where(scene.slot_enabled[s], sp, 0.0)


def ca_euler_step(scene: sc.Scene, st, pt, min_dist_obs):
    """Conservative-advancement bound over all pairs + joint-limit ETAs
    (calc_next_CA_Euler_step, TimeSteppingSimulator.cpp:272-331;
    CCD::calc_CA_Euler_step, src/CCD.cpp:122-236)."""
    dtype = pt.pos.dtype
    nz = cfg.near_zero(dtype)
    INF = jnp.inf

    if scene.n_pairs == 0:
        min_step = jnp.asarray(INF, dtype)
        return _limit_eta(scene, st, min_step), min_dist_obs

    # touch band: constraint stabilization parks separated bodies at
    # dist = 2·NEAR_ZERO (signed_violation − |eps| − NEAR_ZERO with
    # eps = NEAR_ZERO, ConstraintStabilization.cpp:431), which sits just
    # above the reference's `dist > NEAR_ZERO -> generic CA` gate
    # (CCD.cpp:147) — a rolling sphere parked there makes the reference's
    # uncapped mini-step loop grind at ~dist/speed s per iteration. The
    # resting shortcuts below treat the parking band as touching instead.
    touch_band = 4.0 * nz
    pd, con = nph.narrow_phase(
        scene, pt.pos, pt.quat, jnp.asarray(touch_band, dtype)
    )
    dist = pd.dist

    mdo = jnp.where(dist >= 0.0, 0.0, jnp.minimum(min_dist_obs, dist))

    g1s = scene.geom_slot[scene.pair_g1]
    g2s = scene.geom_slot[scene.pair_g2]

    d0 = pd.pa - pd.pb
    d0n = jnp.linalg.norm(d0, axis=-1)
    n0 = d0 / jnp.maximum(d0n, 1e-30)[..., None]
    dist_eff = jnp.where(dist < 0.0, nz + (dist - mdo), dist)
    spA = _slot_dir_speed(scene, pt, -n0, g1s)
    spB = _slot_dir_speed(scene, pt, n0, g2s)
    total = jnp.maximum(spA + spB, 0.0)
    step_generic = jnp.where(total > 0.0, dist_eff / total, INF)

    cnv, _, _ = impact.contact_velocities(scene, pt, con)
    slot_pair = con.pair
    slot_touch = con.active
    approaching = jnp.zeros(scene.n_pairs, bool).at[slot_pair].max(
        slot_touch & (cnv < -nz)
    )
    ncon = jnp.zeros(scene.n_pairs, jnp.int32).at[slot_pair].add(
        slot_touch.astype(jnp.int32)
    )
    max_abs_cvel = jnp.zeros(scene.n_pairs, dtype).at[slot_pair].max(
        jnp.where(slot_touch, jnp.abs(cnv), 0.0)
    )

    kind = scene.pair_kind
    is_sphereish = (
        (kind == sc.K_SPHERE_SPHERE)
        | (kind == sc.K_SPHERE_PLANE)
        | (kind == sc.K_BOX_SPHERE)
    )
    sphere_rest = (
        is_sphereish
        & (dist <= touch_band)
        & (ncon == 1)
        & (max_abs_cvel < nz * 10)
    )
    face_rest = (
        (~is_sphereish) & (dist <= touch_band) & (ncon >= 3) & ~approaching
    )

    step_pair = step_generic
    step_pair = jnp.where((dist <= 0.0) & approaching, 0.0, step_pair)
    step_pair = jnp.where(sphere_rest | face_rest, INF, step_pair)
    # touching non-sphere pair with < 3 contacts (edge/vertex support, e.g. a
    # box tipping on an edge): the reference routes this through the generic
    # estimator, which for plane-vs-polyhedron pairs returns the vertex-sweep
    # bound (calc_next_CA_Euler_step_polyhedron_plane) — the time before any
    # currently-separated vertex can reach the contact plane — and INF for
    # shapes it has no estimator for
    vsweep = nph.plane_generic_sweep_bound(scene, pt, nz)
    step_pair = jnp.where(
        (~is_sphereish) & (dist <= 0.0) & ~approaching & (ncon < 3),
        jnp.where(step_pair <= 0.0, vsweep, jnp.minimum(step_pair, vsweep)),
        step_pair,
    )
    sphere_touch_rec = is_sphereish & (dist <= 0.0) & ~sphere_rest & ~approaching
    step_pair = jnp.where(sphere_touch_rec, INF, step_pair)

    # compliant pairs are not CA-limited (reference skips eCompliant bodies
    # in calc_next_CA_Euler_step, TimeSteppingSimulator.cpp:313-320)
    if scene.has_compliant:
        pair_compliant = jnp.zeros(scene.n_pairs, bool).at[
            scene.slot_pair
        ].max(scene.slot_compliant)
        step_pair = jnp.where(pair_compliant, INF, step_pair)

    min_step = jnp.min(jnp.concatenate([step_pair, jnp.array([INF], dtype)]))
    return _limit_eta(scene, st, min_step), mdo


def _limit_eta(scene, st, min_step):
    """Joint-limit ETAs (TimeSteppingSimulator::calc_next_CA_Euler_step:280-307)."""
    if scene.n_limits == 0:
        return min_step
    INF = jnp.inf
    q = st.q_art[scene.lim_q_idx]
    qd = st.qd_art[scene.lim_gc_col - 6 * scene.nb]
    up = scene.lim_upper
    t_up = jnp.where(
        up & (q < scene.lim_value) & (qd > 0.0),
        (scene.lim_value - q) / jnp.where(qd != 0, qd, 1.0),
        INF,
    )
    t_lo = jnp.where(
        (~up) & (q > scene.lim_value) & (qd < 0.0),
        (scene.lim_value - q) / jnp.where(qd != 0, qd, 1.0),
        INF,
    )
    return jnp.minimum(min_step, jnp.min(jnp.minimum(t_up, t_lo)))


class MiniCarry(NamedTuple):
    pos: jnp.ndarray
    quat: jnp.ndarray
    q_art: jnp.ndarray
    h: jnp.ndarray
    brk: jnp.ndarray
    mdo: jnp.ndarray
    iters: jnp.ndarray


def do_mini_step(scene: sc.Scene, st: sc.State, dt_rem, controller=None,
                 tc_floor=None):
    """One `do_mini_step` (src/TimeSteppingSimulator.cpp:114-222).

    `tc_floor` raises the reference's `min_step_size` floor
    (TimeSteppingSimulator.cpp:149, `tc = max(min_step_size, CA_step)`) so a
    crawling conservative-advancement bound cannot stall the fixed iteration
    budget: the default NEAR_ZERO floor lets a settling contact pin CA at
    ~1e-8 s, where the reference's uncapped loops grind ~1e6 iterations and
    our capped loops would silently drop simulated time. The floor only
    engages when CA < tc_floor (the regime where reference users must set the
    `min-step-size` XML attribute by hand).
    """
    dtype = st.pos.dtype
    pos0, quat0, qart0 = st.pos, st.quat, st.q_art

    qdot = quat.deriv(quat0, st.omega)

    def ca_cond(c: MiniCarry):
        return (~c.brk) & (c.h < dt_rem) & (c.iters < MAX_CA_ITERS)

    def ca_body(c: MiniCarry):
        st_c = st.replace(pos=c.pos, quat=c.quat, q_art=c.q_art)
        pt = kinematics.compute(scene, st_c)
        ca, mdo = ca_euler_step(scene, st_c, pt, c.mdo)
        brk = ca <= 0.0
        floor = scene.min_step_size
        if tc_floor is not None:
            floor = jnp.maximum(floor, tc_floor)
        tc = jnp.maximum(floor, ca)
        tc = jnp.minimum(dt_rem - c.h, tc)
        newpos = pos0 + st.vel * (c.h + tc)
        newquat = quat.normalize(quat0 + qdot * (c.h + tc))
        newq = integrate_art_q(scene, qart0, st.qd_art, c.h + tc)
        return MiniCarry(
            pos=jnp.where(brk, c.pos, newpos),
            quat=jnp.where(brk, c.quat, newquat),
            q_art=jnp.where(brk, c.q_art, newq),
            h=jnp.where(brk, c.h, c.h + tc),
            brk=brk,
            mdo=mdo,
            iters=c.iters + 1,
        )

    init = MiniCarry(
        pos=pos0, quat=quat0, q_art=qart0,
        h=jnp.zeros((), dtype), brk=jnp.array(False),
        mdo=st.min_dist_obs, iters=jnp.array(0, jnp.int32),
    )
    c = jax.lax.while_loop(ca_cond, ca_body, init)
    st2 = st.replace(pos=c.pos, quat=c.quat, q_art=c.q_art, min_dist_obs=c.mdo)
    h = c.h

    # forward dynamics + semi-implicit velocity update
    # controller hook (ControlledBody::controller, src/Simulator.cpp:339-348):
    # returns a generalized-force vector over the gc layout — per-free-body
    # wrenches [f; τ] followed by articulated joint torques
    tau = None
    u_free = None
    if controller is not None:
        u = controller(scene, st2)
        nb6 = 6 * scene.nb
        if scene.nb:
            u_free = u[:nb6].reshape(scene.nb, 6)
        if scene.nv_art:
            tau = u[nb6:]
    a_lin, a_ang = forward_dynamics_free(scene, st2.quat, st2.omega, st2.vel)
    if u_free is not None:
        a_lin = a_lin + scene.inv_mass[:, None] * u_free[:, :3]
        Rc = quat.to_matrix(st2.quat)
        Iinv_w = Rc @ scene.inv_inertia @ jnp.swapaxes(Rc, -1, -2)
        a_ang = a_ang + jnp.einsum("bij,bj->bi", Iinv_w, u_free[:, 3:])
    qdd = articulated_qdd(scene, st2, tau)

    if scene.has_compliant:
        # compliant (penalty) contact forces applied before the velocity
        # update (calc_compliant_unilateral_constraint_forces)
        pt_c = kinematics.compute(scene, st2)
        _, con_c = nph.narrow_phase(
            scene, pt_c.pos, pt_c.quat, scene.contact_dist_thresh
        )
        f_gc = penalty_forces(scene, pt_c, con_c)
        Minv_c = impact.gc_inv_inertia(scene, st2, st2.quat)
        a_pen = Minv_c @ f_gc
        nb_ = scene.nb
        if nb_:
            ap6 = a_pen[: 6 * nb_].reshape(nb_, 6)
            a_lin = a_lin + ap6[:, :3]
            a_ang = a_ang + ap6[:, 3:]
        if scene.nv_art:
            qdd = qdd + a_pen[6 * nb_ :]

    if scene.bilaterals:
        # acceleration-level KKT for implicit bilateral constraints
        # (Simulator::solve, src/Simulator.cpp:604-805)
        from . import bilateral
        from . import impact as imp

        pt0 = kinematics.compute(scene, st2)
        J, _C = bilateral.constraint_rows(scene, st2, pt0)
        jd = bilateral.jdot_qd(scene, st2)
        Minv = imp.gc_inv_inertia(scene, st2, st2.quat)
        nb = scene.nb
        a_gc = jnp.concatenate(
            ([jnp.concatenate([a_lin, a_ang], axis=-1).reshape(-1)] if nb else [])
            + ([qdd] if scene.nv_art else [])
        )
        a_gc = bilateral.acceleration_correction(Minv, J, a_gc, jd)
        if nb:
            ab6 = a_gc[: 6 * nb].reshape(nb, 6)
            a_lin, a_ang = ab6[:, :3], ab6[:, 3:]
        if scene.nv_art:
            qdd = a_gc[6 * nb :]

    vel = st2.vel + a_lin * h
    omega = st2.omega + a_ang * h
    qd_art = st2.qd_art + qdd * h

    # dissipation (src/Dissipation.cpp:30-55)
    lam = scene.dissipation_lambda[:, None]
    vel = vel * lam
    omega = omega * lam

    st2 = st2.replace(vel=vel, omega=omega, qd_art=qd_art)

    # contacts at the new configuration + impact resolution
    if scene.n_contacts or scene.n_limits:
        pt = kinematics.compute(scene, st2)
        _, con = nph.narrow_phase(
            scene, pt.pos, pt.quat, scene.contact_dist_thresh
        )
        if scene.has_compliant:
            # compliant contacts are handled by the penalty forces, not the
            # rigid impact LCP (find_unilateral_constraints' rigid/compliant
            # split, ConstraintSimulator.cpp:510-520)
            con = con._replace(active=con.active & ~scene.slot_compliant)
        # model dispatch order matches apply_model: all-infinite-mu no-slip
        # first (:123-131), then NQP when any true cone (use_qp_solver :563).
        # Scenes whose contact slots disagree on the model route *per island*
        # (the reference's per-connected-group dispatch, :113-151): each model
        # solves only its islands' constraints (act filters) and the velocity
        # deltas sum — islands are decoupled, so this equals per-group solves.
        if scene.mixed_models:
            from . import noslip

            (f_ns, l_ns), (f_nqp, l_nqp), (f_qp, l_qp) = impact.model_masks(
                scene, con
            )
            res = impact.resolve_impacts(
                scene, st2, pt, con, st.zlast, st.zlast_active,
                act_filter=f_qp, lim_filter=l_qp,
            )
            res_ns = noslip.resolve_impacts_noslip(
                scene, st2, pt, con, st.zlast, st.zlast_active,
                act_filter=f_ns, lim_filter=l_ns,
            )
            dv = res.dv + res_ns.dv
            imp_n = res.impulses_n + res_ns.impulses_n

            def _opt_sum(a, b):
                # pivot/fallback counters may be absent on a path; summing
                # what exists keeps `-stats` truthful on mixed-model scenes
                if a is None:
                    return b
                if b is None:
                    return a
                return a + b

            piv = _opt_sum(res.pivots, res_ns.pivots)
            fb = _opt_sum(res.fallbacks, res_ns.fallbacks)
            if scene.use_nqp:
                from . import nqp

                res_nqp = nqp.resolve_impacts_nqp(
                    scene, st2, pt, con, st.zlast, st.zlast_active,
                    act_filter=f_nqp, lim_filter=l_nqp,
                )
                dv = dv + res_nqp.dv
                imp_n = imp_n + res_nqp.impulses_n
                piv = _opt_sum(piv, res_nqp.pivots)
                fb = _opt_sum(fb, res_nqp.fallbacks)
            res = impact.ImpactResult(
                dv, res.zlast, res.zlast_active, imp_n, piv, fb
            )
        elif scene.use_noslip:
            from . import noslip

            res = noslip.resolve_impacts_noslip(
                scene, st2, pt, con, st.zlast, st.zlast_active
            )
        elif scene.use_nqp:
            from . import nqp

            res = nqp.resolve_impacts_nqp(
                scene, st2, pt, con, st.zlast, st.zlast_active
            )
        else:
            res = impact.resolve_impacts(
                scene, st2, pt, con, st.zlast, st.zlast_active
            )
        st2 = kinematics.apply_gc_velocity_delta(scene, st2, res.dv)
        st2 = st2.replace(zlast=res.zlast, zlast_active=res.zlast_active)
        if res.pivots is not None and st2.solver_pivots is not None:
            # solver-effort observability (reference pivot counters,
            # include/Moby/LCP.h:30) accumulated across mini-steps
            st2 = st2.replace(
                solver_pivots=st2.solver_pivots + res.pivots,
                solver_fallbacks=st2.solver_fallbacks + res.fallbacks,
            )

    st2 = st2.replace(time=st.time + h)
    return st2, h


def step_legacy_vf(scene: sc.Scene, st: sc.State, dt, controller=None) -> sc.State:
    """Legacy velocity-first step (the integration ordering of the older
    event-driven stepper that generated some reference golden trajectories,
    e.g. regress/contact-constrained-pendulum.dat): forward dynamics and the
    impact solve are evaluated at the *current* configuration q_k, the
    velocity is updated first, and the position then integrates with the
    post-impact velocity:

        v_{k+1} = impact( v_k + a(q_k, v_k) * h )   [contacts at q_k]
        q_{k+1} = q_k + \\dot q(q_k, v_{k+1}) * h

    No CA sub-stepping, no post-step stabilization (neither existed in that
    architecture). Selected by `Scene.legacy_velocity_first`.
    """
    dtype = st.pos.dtype
    h = jnp.asarray(dt, dtype)

    tau = None
    u_free = None
    if controller is not None:
        u = controller(scene, st)
        nb6 = 6 * scene.nb
        if scene.nb:
            u_free = u[:nb6].reshape(scene.nb, 6)
        if scene.nv_art:
            tau = u[nb6:]
    a_lin, a_ang = forward_dynamics_free(scene, st.quat, st.omega, st.vel)
    if u_free is not None:
        a_lin = a_lin + scene.inv_mass[:, None] * u_free[:, :3]
        Rc = quat.to_matrix(st.quat)
        Iinv_w = Rc @ scene.inv_inertia @ jnp.swapaxes(Rc, -1, -2)
        a_ang = a_ang + jnp.einsum("bij,bj->bi", Iinv_w, u_free[:, 3:])
    qdd = articulated_qdd(scene, st, tau)

    st2 = st.replace(
        vel=st.vel + a_lin * h,
        omega=st.omega + a_ang * h,
        qd_art=st.qd_art + qdd * h,
    )

    if scene.n_contacts or scene.n_limits:
        pt = kinematics.compute(scene, st2)
        _, con = nph.narrow_phase(
            scene, pt.pos, pt.quat, scene.contact_dist_thresh
        )
        res = impact.resolve_impacts(
            scene, st2, pt, con, st.zlast, st.zlast_active
        )
        st2 = kinematics.apply_gc_velocity_delta(scene, st2, res.dv)
        st2 = st2.replace(zlast=res.zlast, zlast_active=res.zlast_active)

    qdot = quat.deriv(st.quat, st2.omega)
    return st2.replace(
        pos=st.pos + st2.vel * h,
        quat=quat.normalize(st.quat + qdot * h),
        q_art=integrate_art_q(scene, st.q_art, st2.qd_art, h),
        time=st.time + h,
    )


def step(scene: sc.Scene, st: sc.State, dt, controller=None) -> sc.State:
    """One full simulator step (TimeSteppingSimulator::step)."""
    if scene.legacy_velocity_first:
        return step_legacy_vf(scene, st, dt, controller)
    dtype = st.pos.dtype
    dt = jnp.asarray(dt, dtype)

    def cond(carry):
        st_c, h_total, iters = carry
        return (h_total < dt) & (iters < MAX_MINI_STEPS)

    if st.solver_pivots is not None:
        # per-step counters: reset at step entry
        st = st.replace(
            solver_pivots=jnp.zeros((), jnp.int32),
            solver_fallbacks=jnp.zeros((), jnp.int32),
        )

    # progress floor: the (MAX_MINI_STEPS x MAX_CA_ITERS) iteration budget
    # must always be able to cover dt, so a crawling CA bound cannot drop
    # simulated time (see do_mini_step docstring). 2x headroom for the
    # budget spent on genuine impact mini-steps (h = 0 break iterations).
    tc_floor = dt / (MAX_MINI_STEPS * MAX_CA_ITERS // 2)

    def body(carry):
        st_c, h_total, iters = carry
        st_n, h = do_mini_step(
            scene, st_c, dt - h_total, controller, tc_floor=tc_floor
        )
        return st_n, h_total + h, iters + 1

    st_f, h_total, _ = jax.lax.while_loop(
        cond, body, (st, jnp.zeros((), dtype), jnp.array(0, jnp.int32))
    )

    st_f = stabilization.stabilize(scene, st_f)
    return st_f


def rollout(scene: sc.Scene, st: sc.State, dt, n_steps: int, controller=None):
    """scan a trajectory; returns (final state, stacked (pos, quat, q_art))."""

    def f(s, _):
        s2 = step(scene, s, dt, controller)
        return s2, (s2.pos, s2.quat, s2.q_art)

    return jax.lax.scan(f, st, None, length=n_steps)
