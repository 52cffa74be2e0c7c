"""Contact-MPC harness: scene-level state packing + iLQR solves.

`make_dynamics` closes a compiled Scene over `diffstep.dstep` as a pure
vector-space dynamics f(x, u); `solve` runs iLQR for one scenario; batches of
scenarios vmap/shard over the leading axis (parallel.mesh helpers).

The optimization state covers ENABLED bodies only: disabled bodies (ground
planes, fixtures) are constants of the scene, so packing them would double
nx/nu with dead coordinates — for the 1-ball benchmark scene that halves the
Riccati dimension and the number of dstep pullbacks per linearization.
Their state comes from the template at unpack.
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import scene as sc
from . import diffstep, ilqr


def _enabled_idx(scene: sc.Scene) -> np.ndarray:
    """Static indices of the enabled (dynamic) free bodies."""
    return np.nonzero(np.asarray(scene.enabled))[0]


def n_controls(scene: sc.Scene) -> int:
    """Control dimension: wrenches on enabled free bodies + joint forces."""
    return 6 * len(_enabled_idx(scene)) + scene.nv_art


def state_sizes(scene: sc.Scene):
    ne = len(_enabled_idx(scene))
    return (3 * ne, 4 * ne, 3 * ne, 3 * ne, scene.nq_art, scene.nv_art)


def pack(scene: sc.Scene, st: sc.State):
    idx = _enabled_idx(scene)
    parts = []
    if len(idx):
        parts += [
            st.pos[idx].ravel(), st.quat[idx].ravel(),
            st.vel[idx].ravel(), st.omega[idx].ravel(),
        ]
    parts += [st.q_art, st.qd_art]
    return jnp.concatenate(parts)


def _merge_bodies(scene, template_arr, idx, new_vals):
    """Replace rows `idx` of template_arr with new_vals via a static
    concat+permutation gather (no scatter on the hot path)."""
    nb = scene.nb
    if len(idx) == nb:
        return new_vals
    other = np.setdiff1d(np.arange(nb), idx)
    perm = np.argsort(np.concatenate([idx, other]))
    return jnp.concatenate([new_vals, template_arr[other]], axis=0)[perm]


def unpack(scene: sc.Scene, template: sc.State, x):
    idx = _enabled_idx(scene)
    ne = len(idx)
    o = 0
    st = template
    if ne:
        pos = x[o : o + 3 * ne].reshape(ne, 3)
        quat = x[o + 3 * ne : o + 7 * ne].reshape(ne, 4)
        vel = x[o + 7 * ne : o + 10 * ne].reshape(ne, 3)
        omega = x[o + 10 * ne : o + 13 * ne].reshape(ne, 3)
        st = st.replace(
            pos=_merge_bodies(scene, template.pos, idx, pos),
            quat=_merge_bodies(scene, template.quat, idx, quat),
            vel=_merge_bodies(scene, template.vel, idx, vel),
            omega=_merge_bodies(scene, template.omega, idx, omega),
        )
        o += 13 * ne
    if scene.nq_art:
        st = st.replace(q_art=x[o : o + scene.nq_art])
        o += scene.nq_art
    if scene.nv_art:
        st = st.replace(qd_art=x[o : o + scene.nv_art])
    return st


def make_dynamics(scene: sc.Scene, template: sc.State, dt) -> Callable:
    """f(x_vec, u) -> x_vec' through the differentiable contact step.

    The LCP warm-start bookkeeping is pinned (cold start) so x fully
    determines the next state. u spans enabled bodies' wrenches + joint
    forces (`n_controls`); disabled gc columns receive zero.
    """
    cold = template.replace(
        zlast=jnp.zeros_like(template.zlast),
        zlast_active=jnp.zeros_like(template.zlast_active),
    )
    idx = _enabled_idx(scene)
    gc_cols = np.concatenate(
        [6 * i + np.arange(6) for i in idx]
        + [6 * scene.nb + np.arange(scene.nv_art)]
    ).astype(np.int64) if (len(idx) or scene.nv_art) else np.zeros(0, np.int64)
    full = len(gc_cols) == scene.ngc
    if not full:
        # static expansion permutation: u_full = concat(u, 0)[perm]
        other = np.setdiff1d(np.arange(scene.ngc), gc_cols)
        perm = np.argsort(np.concatenate([gc_cols, other]))

    def f(x, u):
        st = unpack(scene, cold, x)
        if full:
            u_full = u
        else:
            u_full = jnp.concatenate(
                [u, jnp.zeros(scene.ngc - len(gc_cols), u.dtype)]
            )[perm]
        st2 = diffstep.dstep(scene, st, dt, u_full)
        return pack(scene, st2)

    return f


def make_dynamics_rr(scene: sc.Scene, template: sc.State, dt):
    """(f, f_record, f_replay) for the record/replay linearization path.

    f_record(x, u, aux) -> (x', z, aux'): the step plus the LCP solution
    it used, where aux = (zlast, zlast_active) WARM-STARTS the pivoting
    solve from the previous rollout step — the reference's own zlast
    machinery (ImpactConstraintHandler warm start, `_zlast`), which
    collapses the pivot iterations of persistent resting contacts to ~1.
    The recorded z is the actual converged solution, so the backward
    replay stays exact regardless of seeding.
    f_replay(x, u, z) -> x': the identical step with the pivoting solve
    replaced by `solve_lcp_given(z)` — same primal, same IFT gradients,
    zero pivot iterations. The iLQR backward pass linearizes at rollout
    states, so replaying the rollout's own z there removes every BPP
    while-loop from the (dispatch-bound) backward sweep.

    Returns (f, None, None) when the scene has no single-solve guarantee
    (`diffstep.replay_ok`) or no contacts at all.
    """
    f = make_dynamics(scene, template, dt)
    has_lcp = bool(scene.n_contacts or scene.n_limits)
    if not has_lcp or not diffstep.replay_ok(scene):
        return f, None, None

    cold = template.replace(
        zlast=jnp.zeros_like(template.zlast),
        zlast_active=jnp.zeros_like(template.zlast_active),
    )
    idx = _enabled_idx(scene)
    gc_cols = np.concatenate(
        [6 * i + np.arange(6) for i in idx]
        + [6 * scene.nb + np.arange(scene.nv_art)]
    ).astype(np.int64) if (len(idx) or scene.nv_art) else np.zeros(0, np.int64)
    full = len(gc_cols) == scene.ngc
    if not full:
        other = np.setdiff1d(np.arange(scene.ngc), gc_cols)
        perm = np.argsort(np.concatenate([gc_cols, other]))

    def expand(u):
        if full:
            return u
        return jnp.concatenate(
            [u, jnp.zeros(scene.ngc - len(gc_cols), u.dtype)]
        )[perm]

    def aux_init():
        return (jnp.zeros_like(template.zlast),
                jnp.zeros_like(template.zlast_active))

    def f_record(x, u, aux):
        st = unpack(scene, cold, x)
        st = st.replace(zlast=aux[0], zlast_active=aux[1])
        st2, z_step = diffstep.dstep(scene, st, dt, expand(u),
                                     return_z=True)
        return pack(scene, st2), z_step, (st2.zlast, st2.zlast_active)

    def f_replay(x, u, z):
        st = unpack(scene, cold, x)
        st2 = diffstep.dstep(scene, st, dt, expand(u), lcp_given=z)
        return pack(scene, st2)

    def f_replay_fwd(x, u, z):
        st = unpack(scene, cold, x)
        st2 = diffstep.dstep(scene, st, dt, expand(u), lcp_given=z,
                             lcp_fwd=True)
        return pack(scene, st2)

    # ---- block-sparse analytic-chain linearizer -------------------------
    # The step factors as x' = [pp; vl + T dv(pp, vl, z)] with
    #   (pp, vl) = smooth_pre(x, u)   (pose-integrated state, pre-contact
    #                                  velocities — diffstep.dstep_pre)
    #   dv       = contact delta      (diffstep.contact_dv_replay)
    # and the contact half's Jacobian is block-sparse: the geometry-heavy
    # path (narrow phase, contact Jacobians, Delassus) depends ONLY on the
    # n_pose pose dims, while velocity/control tangents reach dv only
    # through the LCP rhs — the cheap custom-JVP path. Forward-mode AD
    # prunes tangent ops along unreached paths, so differentiating the two
    # blocks SEPARATELY pushes 7·ne+nq tangents through the expensive graph
    # instead of nx+nu (19 for ball-push: a ~2.7x cut of what dominated the
    # backward sweep's device profile), then chains the blocks with a
    # handful of small matmuls.
    ne = len(idx)
    n_pose = 7 * ne + scene.nq_art
    n_vel = 6 * ne + scene.nv_art
    # rows of [pp; vl] in pack() order (pose dims first, then vel dims)
    pose_rows = np.concatenate([
        np.arange(7 * ne),
        13 * ne + np.arange(scene.nq_art),
    ]).astype(np.int64)
    vel_rows_x = np.concatenate([
        7 * ne + np.arange(6 * ne),
        13 * ne + scene.nq_art + np.arange(scene.nv_art),
    ]).astype(np.int64)
    perm_to_x = np.argsort(np.concatenate([pose_rows, vel_rows_x]))
    # gc rows of dv feeding the packed velocity coords
    # (pack order: all enabled vels (ne,3) then all omegas (ne,3) then qd_art)
    idx64 = idx.astype(np.int64)
    dv_rows = np.concatenate([
        (6 * idx64[:, None] + np.arange(3)[None]).reshape(-1)
        if ne else np.zeros(0, np.int64),
        (6 * idx64[:, None] + 3 + np.arange(3)[None]).reshape(-1)
        if ne else np.zeros(0, np.int64),
        6 * scene.nb + np.arange(scene.nv_art, dtype=np.int64),
    ])

    def _pack_pv(st2):
        pose_parts, vel_parts = [], []
        if ne:
            pose_parts += [st2.pos[idx].ravel(), st2.quat[idx].ravel()]
            vel_parts += [st2.vel[idx].ravel(), st2.omega[idx].ravel()]
        pose_parts.append(st2.q_art)
        vel_parts.append(st2.qd_art)
        return jnp.concatenate(pose_parts), jnp.concatenate(vel_parts)

    def _unpack_pv(pp, vl):
        st2 = cold
        if ne:
            st2 = st2.replace(
                pos=_merge_bodies(scene, cold.pos, idx,
                                  pp[: 3 * ne].reshape(ne, 3)),
                quat=_merge_bodies(scene, cold.quat, idx,
                                   pp[3 * ne : 7 * ne].reshape(ne, 4)),
                vel=_merge_bodies(scene, cold.vel, idx,
                                  vl[: 3 * ne].reshape(ne, 3)),
                omega=_merge_bodies(scene, cold.omega, idx,
                                    vl[3 * ne : 6 * ne].reshape(ne, 3)),
            )
        if scene.nq_art:
            st2 = st2.replace(q_art=pp[7 * ne :])
        if scene.nv_art:
            st2 = st2.replace(qd_art=vl[6 * ne :])
        return st2

    # u never moves the pose half of the pre-contact step, and for pure
    # free-body scenes its velocity block is known in closed form:
    #   ∂vel/∂u_lin = dt·m⁻¹·λ·I₃,  ∂ω/∂u_ang = dt·λ·I⁻¹_w(quat')
    # so stage 1 only jacfwd's over x (13 tangents instead of 19) and the
    # u-columns cost two tiny block writes. Articulated scenes keep the
    # jacfwd over u (∂q̇'/∂τ needs H(q)⁻¹).
    analytic_u = not scene.arts
    dt_c = float(dt)

    def f_jac(x, u, z):
        """(A, B) = (df/dx, df/du) of the replay step — identical values to
        jacfwd(f_replay_fwd) assembled blockwise (see comment above)."""
        dtype = x.dtype
        if analytic_u:
            def s1(x_):
                st = unpack(scene, cold, x_)
                st2 = diffstep.dstep_pre(scene, st, dt, expand(u))
                pv = _pack_pv(st2)
                return pv, pv

            (J1p_x, J1v_x), (pp, vl) = jax.jacfwd(s1, has_aux=True)(x)
            nu = u.shape[0]
            J1p_u = jnp.zeros((n_pose, nu), dtype)
            q2 = pp[3 * ne : 7 * ne].reshape(ne, 4)
            from ..math import quaternion as quat_m

            R = quat_m.to_matrix(q2)
            Iinv_w = R @ scene.inv_inertia[idx] @ jnp.swapaxes(R, -1, -2)
            lam = scene.dissipation_lambda[idx]
            J1v_u = jnp.zeros((n_vel, nu), dtype)
            eye3 = jnp.eye(3, dtype=dtype)
            for j in range(ne):
                c = dt_c * lam[j]
                J1v_u = J1v_u.at[3 * j : 3 * j + 3, 6 * j : 6 * j + 3].set(
                    c * scene.inv_mass[idx[j]] * eye3)
                J1v_u = J1v_u.at[
                    3 * ne + 3 * j : 3 * ne + 3 * j + 3,
                    6 * j + 3 : 6 * j + 6,
                ].set(c * Iinv_w[j])
        else:
            def s1(x_, u_):
                st = unpack(scene, cold, x_)
                st2 = diffstep.dstep_pre(scene, st, dt, expand(u_))
                pv = _pack_pv(st2)
                return pv, pv

            (J1, aux) = jax.jacfwd(s1, argnums=(0, 1), has_aux=True)(x, u)
            (J1p_x, J1p_u), (J1v_x, J1v_u) = J1
            pp, vl = aux

        def s2(pp_, vl_):
            st2 = _unpack_pv(pp_, vl_)
            return diffstep.contact_dv_replay(scene, st2, z)[dv_rows]

        # two SEPARATE jacfwd calls so forward AD sees the block sparsity:
        # pose tangents alone reach the geometry graph; velocity tangents
        # alone reach only the LCP-rhs path. XLA CSE merges the duplicated
        # primal subgraphs.
        Dp = jax.jacfwd(s2, argnums=0)(pp, vl)      # (n_vel, n_pose)
        Dv = jax.jacfwd(s2, argnums=1)(pp, vl)      # (n_vel, n_vel)

        vx = J1v_x + Dp @ J1p_x + Dv @ J1v_x
        vu = J1v_u + Dp @ J1p_u + Dv @ J1v_u
        A = jnp.concatenate([J1p_x, vx], axis=0)[perm_to_x]
        B = jnp.concatenate([J1p_u, vu], axis=0)[perm_to_x]
        return A, B

    f_record.aux_init = aux_init
    f_replay.fwd = f_replay_fwd
    if os.environ.get("MOBY_MPC_BLOCK_JAC", "1") == "1":
        f_replay.jac = f_jac
    return f, f_record, f_replay


class MPCProblem(NamedTuple):
    scene: sc.Scene
    template: sc.State
    dt: float
    horizon: int


def solve(
    prob: MPCProblem,
    st: sc.State,
    cost,
    cost_final,
    us0=None,
    n_iters: int = 10,
    parallel_line_search: bool = True,
) -> ilqr.ILQRResult:
    """One contact-MPC solve (the unit of the solves/s benchmark).

    Use `parallel_line_search=False` when vmapping large scenario batches
    (the alpha fan-out multiplies the working set; see ilqr.ilqr).
    """
    scene = prob.scene
    f = make_dynamics(scene, prob.template, prob.dt)
    x0 = pack(scene, st)
    nu = n_controls(scene)
    us0 = (
        us0
        if us0 is not None
        else jnp.zeros((prob.horizon, nu), x0.dtype)
    )
    return ilqr.ilqr(
        f, cost, cost_final, x0, us0, n_iters=n_iters,
        parallel_line_search=parallel_line_search,
    )


def solve_batch(
    prob: MPCProblem,
    states,
    cost,
    cost_final,
    us0=None,
    n_iters: int = 10,
    record_replay: bool = True,
    hoist_linearization: bool = False,
    linearize_fwd: bool = False,
    rr_warm_start: bool = True,
    mu_init: float = 1e-6,
) -> ilqr.ILQRResult:
    """Batched contact-MPC solve through `ilqr.ilqr_batched`: identical
    per-scenario semantics to `vmap(solve)` but with the batch-voted
    early-exit line search (most members accept alpha=1 near convergence,
    so the 8-alpha lock-step fan-out is skipped when unanimous).

    record_replay: rollouts record their LCP solutions and the backward
    pass replays them through the IFT pullback instead of re-running the
    pivoting solve (identical Jacobians; see ilqr.ilqr_batched). Auto-off
    for scenes where a step can solve twice (nonzero restitution).
    hoist_linearization: batch all H step Jacobians in one jacrev before
    the Riccati scan (wins for dispatch-bound articulated steps).
    linearize_fwd: jacfwd through the custom-JVP replay (identical
    Jacobians, no reverse-mode transpose machinery); needs record/replay,
    silently falls back to jacrev when replay is unavailable.
    rr_warm_start: thread (zlast, zlast_active) across rollout steps —
    the reference's `_zlast` warm start
    (/root/reference/src/ImpactConstraintHandlerQP.cpp:111-162). Warm-
    started pivoting takes a different pivot path and converges to the
    same solution only up to the LCP termination tolerance (~1e-8
    relative), so rollouts drift at that level vs the cold-start path.
    Set False for bit-exact parity with record_replay=False (used by the
    parity oracle in tests/test_mpc_rr.py)."""
    import os

    scene = prob.scene
    f, f_rec, f_rep = make_dynamics_rr(scene, prob.template, prob.dt)
    if not record_replay:
        f_rec = f_rep = None
    if f_rec is not None and not rr_warm_start:
        f_rec_warm = f_rec

        def f_rec(x, u, aux):
            xp, z, _ = f_rec_warm(x, u, f_rec_warm.aux_init())
            return xp, z, aux

        f_rec.aux_init = f_rec_warm.aux_init
    if f_rep is None:
        linearize_fwd = False
    x0s = jax.vmap(lambda s: pack(scene, s))(states)
    nu = n_controls(scene)
    us0 = (
        us0
        if us0 is not None
        else jnp.zeros((prob.horizon, nu), x0s.dtype)
    )
    return ilqr.ilqr_batched(
        f, cost, cost_final, x0s, us0, n_iters=n_iters, mu_init=mu_init,
        f_record=f_rec, f_replay=f_rep,
        hoist_linearization=hoist_linearization,
        linearize_fwd=(
            linearize_fwd
            or os.environ.get("MOBY_MPC_LIN_FWD", "0") == "1"
        ) and f_rep is not None,
        riccati_bf16=os.environ.get("MOBY_MPC_RICCATI_BF16", "0") == "1",
        line_search_steps=int(os.environ.get("MOBY_MPC_LS_STEPS", "8")),
    )
