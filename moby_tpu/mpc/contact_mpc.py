"""Contact-MPC harness: scene-level state packing + iLQR solves.

`make_dynamics` closes a compiled Scene over `diffstep.dstep` as a pure
vector-space dynamics f(x, u); `solve` runs iLQR for one scenario; batches of
scenarios vmap/shard over the leading axis (parallel.mesh helpers).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core import scene as sc
from . import diffstep, ilqr


def state_sizes(scene: sc.Scene):
    nb = scene.nb
    return (3 * nb, 4 * nb, 3 * nb, 3 * nb, scene.nq_art, scene.nv_art)


def pack(scene: sc.Scene, st: sc.State):
    parts = []
    if scene.nb:
        parts += [st.pos.ravel(), st.quat.ravel(), st.vel.ravel(), st.omega.ravel()]
    parts += [st.q_art, st.qd_art]
    return jnp.concatenate(parts)


def unpack(scene: sc.Scene, template: sc.State, x):
    nb = scene.nb
    o = 0
    st = template
    if nb:
        st = st.replace(
            pos=x[o : o + 3 * nb].reshape(nb, 3),
            quat=x[o + 3 * nb : o + 7 * nb].reshape(nb, 4),
            vel=x[o + 7 * nb : o + 10 * nb].reshape(nb, 3),
            omega=x[o + 10 * nb : o + 13 * nb].reshape(nb, 3),
        )
        o += 13 * nb
    if scene.nq_art:
        st = st.replace(q_art=x[o : o + scene.nq_art])
        o += scene.nq_art
    if scene.nv_art:
        st = st.replace(qd_art=x[o : o + scene.nv_art])
    return st


def make_dynamics(scene: sc.Scene, template: sc.State, dt) -> Callable:
    """f(x_vec, u) -> x_vec' through the differentiable contact step.

    The LCP warm-start bookkeeping is pinned (cold start) so x fully
    determines the next state.
    """
    cold = template.replace(
        zlast=jnp.zeros_like(template.zlast),
        zlast_active=jnp.zeros_like(template.zlast_active),
    )

    def f(x, u):
        st = unpack(scene, cold, x)
        st2 = diffstep.dstep(scene, st, dt, u)
        return pack(scene, st2)

    return f


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
    nu = scene.ngc
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
) -> ilqr.ILQRResult:
    """Batched contact-MPC solve through `ilqr.ilqr_batched`: identical
    per-scenario semantics to `vmap(solve)` but with the batch-voted
    early-exit line search (most members accept alpha=1 near convergence,
    so the 8-alpha lock-step fan-out is skipped when unanimous)."""
    scene = prob.scene
    f = make_dynamics(scene, prob.template, prob.dt)
    x0s = jax.vmap(lambda s: pack(scene, s))(states)
    nu = scene.ngc
    us0 = (
        us0
        if us0 is not None
        else jnp.zeros((prob.horizon, nu), x0s.dtype)
    )
    return ilqr.ilqr_batched(
        f, cost, cost_final, x0s, us0, n_iters=n_iters
    )
