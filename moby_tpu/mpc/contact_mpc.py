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

    f_record.aux_init = aux_init
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
    the Riccati scan (wins for dispatch-bound articulated steps)."""
    import os

    scene = prob.scene
    f, f_rec, f_rep = make_dynamics_rr(scene, prob.template, prob.dt)
    if not record_replay:
        f_rec = f_rep = None
    x0s = jax.vmap(lambda s: pack(scene, s))(states)
    nu = n_controls(scene)
    us0 = (
        us0
        if us0 is not None
        else jnp.zeros((prob.horizon, nu), x0s.dtype)
    )
    return ilqr.ilqr_batched(
        f, cost, cost_final, x0s, us0, n_iters=n_iters,
        f_record=f_rec, f_replay=f_rep,
        hoist_linearization=hoist_linearization,
        riccati_bf16=os.environ.get("MOBY_MPC_RICCATI_BF16", "0") == "1",
        line_search_steps=int(os.environ.get("MOBY_MPC_LS_STEPS", "8")),
    )
