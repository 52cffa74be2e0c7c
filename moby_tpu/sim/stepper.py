"""The time-stepping simulator core.

Pure-functional, jittable mirror of the reference's live stepper
(`TimeSteppingSimulator::step` -> `step_si_Euler` -> `do_mini_step`,
src/TimeSteppingSimulator.cpp:52-222):

  step(dt):
    pairwise distances
    while h < dt:  do_mini_step(dt-h)           [lax.while_loop]
    constraint stabilization                    [see stabilization.py]

  do_mini_step(Δ):
    save q
    while h < Δ:                                [lax.while_loop]
      CA = conservative advancement bound       (CCD::calc_CA_Euler_step)
      if CA <= 0: break
      tc = min(Δ-h, max(min_step_size, CA))
      q  = qsave + qd_euler·(h+tc)              (position from saved coords,
      h += tc                                    Euler velocity at qsave)
    a = fwd_dyn(q, v)                           (gravity + gyroscopic)
    v += a·h ;  dissipation
    find contacts at q;  impact handler         [impact.resolve_impacts]

Everything is fixed-shape; the dynamic trip counts of the two while loops are
data-dependent exactly like the reference (bounded by iteration caps for
safety). Scenario batching: `jax.vmap(lambda s: step(scene, s, dt))`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import config as cfg
from ..core import scene as sc
from ..geometry import narrowphase as nph
from ..math import quaternion as quat
from . import impact
from . import stabilization

MAX_MINI_STEPS = 64
MAX_CA_ITERS = 32


def forward_dynamics(scene: sc.Scene, quat_b, omega):
    """Accelerations from gravity + gyroscopic moment (Newton-Euler in the
    world-aligned COM frame; Ravelin RigidBodyd::calc_fwd_dyn equivalent).
    """
    live = scene.enabled & (scene.mass > 0)
    a_lin = jnp.where(live[:, None], scene.gravity[None, :], 0.0)
    R = quat.to_matrix(quat_b)
    Iw = R @ scene.inertia @ jnp.swapaxes(R, -1, -2)
    Iw_inv = R @ scene.inv_inertia @ jnp.swapaxes(R, -1, -2)
    gyro = -jnp.cross(omega, jnp.einsum("bij,bj->bi", Iw, omega))
    a_ang = jnp.einsum("bij,bj->bi", Iw_inv, gyro)
    a_ang = jnp.where(live[:, None], a_ang, 0.0)
    return a_lin, a_ang


def _body_dir_speed(scene, vel, omega, n, b):
    """Max speed of body b's surface along direction n:
    n·v + ||ω × n||·rmax (reference CCD::calc_max_dist, src/CCD.cpp:585-607)."""
    v = vel[b]
    w = omega[b]
    sp = jnp.sum(n * v, axis=-1) + jnp.linalg.norm(
        jnp.cross(w, n), axis=-1
    ) * scene.rmax[b]
    return jnp.where(scene.enabled[b], sp, 0.0)


def ca_euler_step(scene: sc.Scene, pos, quat_b, vel, omega, min_dist_obs):
    """Conservative-advancement bound over all pairs
    (CCD::calc_CA_Euler_step, src/CCD.cpp:122-236) and the per-pair worst
    penetration bookkeeping (_min_dist_observed).

    Returns (min step, updated min_dist_obs).
    """
    dtype = pos.dtype
    nz = cfg.near_zero(dtype)
    INF = jnp.inf

    pd, con = nph.narrow_phase(scene, pos, quat_b, jnp.asarray(nz, dtype))
    dist = pd.dist

    # update worst observed penetration (reset when separated)
    mdo = jnp.where(dist >= 0.0, 0.0, jnp.minimum(min_dist_obs, dist))

    g1b = scene.geom_body[scene.pair_g1]
    g2b = scene.geom_body[scene.pair_g2]

    # ---- generic bound for separated pairs
    d0 = pd.pa - pd.pb
    d0n = jnp.linalg.norm(d0, axis=-1)
    n0 = d0 / jnp.maximum(d0n, 1e-30)[..., None]
    dist_eff = jnp.where(dist < 0.0, nz + (dist - mdo), dist)
    spA = _body_dir_speed(scene, vel, omega, -n0, g1b)
    spB = _body_dir_speed(scene, vel, omega, n0, g2b)
    total = jnp.maximum(spA + spB, 0.0)
    step_generic = jnp.where(total > 0.0, dist_eff / total, INF)

    # ---- touching-pair logic (dist <= 0): contact-point normal velocities
    # per-slot normal velocity
    cnv, _, _ = impact.contact_velocities(scene, pos, vel, omega, con)
    slot_pair = scene.slot_pair
    touch_tol = nz
    slot_touch = con.active  # slots with sdist <= NEAR_ZERO for this purpose
    # per-pair: any touching contact approaching (cvel < -NEAR_ZERO) -> 0 step
    approaching = jnp.zeros(scene.n_pairs, bool).at[slot_pair].max(
        slot_touch & (cnv < -touch_tol)
    )
    # per-pair contact count and |cvel| of the first contact (sphere shortcut)
    ncon = jnp.zeros(scene.n_pairs, jnp.int32).at[slot_pair].add(
        slot_touch.astype(jnp.int32)
    )
    max_abs_cvel = jnp.zeros(scene.n_pairs, dtype).at[slot_pair].max(
        jnp.where(slot_touch, jnp.abs(cnv), 0.0)
    )

    # sphere-involved pairs (kinds SS, SP, BS): resting single contact -> INF
    kind = scene.pair_kind
    is_sphereish = (
        (kind == sc.K_SPHERE_SPHERE)
        | (kind == sc.K_SPHERE_PLANE)
        | (kind == sc.K_BOX_SPHERE)
    )
    sphere_rest = (
        is_sphereish & (dist <= nz) & (ncon == 1) & (max_abs_cvel < nz * 10)
    )

    # non-sphere touching pairs: >=3 touching contacts (a face) and none
    # approaching -> INF (calc_next_CA_Euler_step_generic 2-simplex test)
    face_rest = (~is_sphereish) & (dist <= 0.0) & (ncon >= 3) & ~approaching

    step_pair = step_generic
    # dist <= 0 and approaching -> 0
    step_pair = jnp.where((dist <= 0.0) & approaching, 0.0, step_pair)
    # resting cases -> INF
    step_pair = jnp.where(sphere_rest | face_rest, INF, step_pair)
    # touching non-sphere, not approaching, <3 contacts: vertex-sweep bound
    # (calc_next_CA_Euler_step_polyhedron_plane) — conservatively INF for now
    step_pair = jnp.where(
        (~is_sphereish) & (dist <= 0.0) & ~approaching & (ncon < 3),
        jnp.where(step_pair <= 0.0, INF, step_pair),
        step_pair,
    )
    # sphere pairs touching, not resting, not approaching (receding): generic
    sphere_touch_rec = (
        is_sphereish & (dist <= 0.0) & ~sphere_rest & ~approaching
    )
    step_pair = jnp.where(sphere_touch_rec, INF, step_pair)

    return jnp.min(jnp.concatenate([step_pair, jnp.array([INF], dtype)])), mdo


class MiniStepCarry(NamedTuple):
    pos: jnp.ndarray
    quat: jnp.ndarray
    h: jnp.ndarray
    brk: jnp.ndarray
    mdo: jnp.ndarray
    iters: jnp.ndarray


def do_mini_step(scene: sc.Scene, st: sc.State, dt_rem):
    """One `do_mini_step` (src/TimeSteppingSimulator.cpp:114-222). Returns the
    advanced state and the stepped time h."""
    dtype = st.pos.dtype
    pos0, quat0 = st.pos, st.quat
    vel, omega = st.vel, st.omega

    # Euler-coordinate velocity at the saved coords (qdot at qsave)
    qdot = quat.deriv(quat0, omega)

    def ca_cond(c: MiniStepCarry):
        return (~c.brk) & (c.h < dt_rem) & (c.iters < MAX_CA_ITERS)

    def ca_body(c: MiniStepCarry):
        ca, mdo = ca_euler_step(scene, c.pos, c.quat, vel, omega, c.mdo)
        brk = ca <= 0.0
        tc = jnp.maximum(scene.min_step_size, ca)
        tc = jnp.minimum(dt_rem - c.h, tc)
        newpos = pos0 + vel * (c.h + tc)
        newquat = quat.normalize(quat0 + qdot * (c.h + tc))
        return MiniStepCarry(
            pos=jnp.where(brk, c.pos, newpos),
            quat=jnp.where(brk, c.quat, newquat),
            h=jnp.where(brk, c.h, c.h + tc),
            brk=brk,
            mdo=mdo,
            iters=c.iters + 1,
        )

    init = MiniStepCarry(
        pos=pos0,
        quat=quat0,
        h=jnp.zeros((), dtype),
        brk=jnp.array(False),
        mdo=st.min_dist_obs,
        iters=jnp.array(0, jnp.int32),
    )
    c = jax.lax.while_loop(ca_cond, ca_body, init)
    pos, quat_b, h = c.pos, c.quat, c.h

    # forward dynamics + semi-implicit velocity update
    a_lin, a_ang = forward_dynamics(scene, quat_b, omega)
    vel = vel + a_lin * h
    omega = omega + a_ang * h

    # dissipation (src/Dissipation.cpp:30-55): velocity decay per body
    lam = scene.dissipation_lambda[:, None]
    vel = vel * lam
    omega = omega * lam

    # contacts at the new configuration
    _, con = nph.narrow_phase(scene, pos, quat_b, scene.contact_dist_thresh)

    res = impact.resolve_impacts(
        scene, pos, quat_b, vel, omega, con, st.zlast, st.zlast_active
    )

    new_state = sc.State(
        pos=pos,
        quat=quat_b,
        vel=res.vel,
        omega=res.omega,
        time=st.time + h,
        zlast=res.zlast,
        zlast_active=res.zlast_active,
        min_dist_obs=c.mdo,
    )
    return new_state, h


def step(scene: sc.Scene, st: sc.State, dt) -> sc.State:
    """One full simulator step of size dt (TimeSteppingSimulator::step)."""
    dtype = st.pos.dtype
    dt = jnp.asarray(dt, dtype)

    def cond(carry):
        st_c, h_total, iters = carry
        return (h_total < dt) & (iters < MAX_MINI_STEPS)

    def body(carry):
        st_c, h_total, iters = carry
        st_n, h = do_mini_step(scene, st_c, dt - h_total)
        # guard: a zero mini-step that failed to resolve would spin forever;
        # force the remaining time on the last allowed iteration
        return st_n, h_total + h, iters + 1

    st_f, h_total, _ = jax.lax.while_loop(
        cond, body, (st, jnp.zeros((), dtype), jnp.array(0, jnp.int32))
    )

    st_f = stabilization.stabilize(scene, st_f)
    return st_f


def rollout(scene: sc.Scene, st: sc.State, dt, n_steps: int):
    """scan a trajectory; returns (final state, stacked states)."""

    def f(s, _):
        s2 = step(scene, s, dt)
        return s2, (s2.pos, s2.quat)

    return jax.lax.scan(f, st, None, length=n_steps)
