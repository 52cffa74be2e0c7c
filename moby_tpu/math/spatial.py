"""Spatial (6-D) vector algebra — the native replacement for the reference's
external Ravelin layer (SURVEY.md L0; Moby inherits `Ravelin::RigidBodyd`,
`SVelocityd`, `SpatialRBInertiad`, etc. which live outside its repo).

Conventions (Featherstone):
  * spatial motion vectors  v = [ω; v_lin]  (angular on top)
  * spatial force vectors   f = [τ; f_lin]
  * a coordinate transform from frame A to frame B located at r (B's origin
    expressed in A) with rotation E (maps A-vectors to B-vectors) acts on
    motion vectors as  X = [[E, 0], [-E·hat(r), E]].

A `Transform` is stored as (E, r): rotation ``E`` (3,3) mapping parent->child
coordinates and origin offset ``r`` (3,) of the child frame in parent coords.
All ops broadcast over leading batch dimensions.

At the *generalized coordinate* boundary (contact Jacobians, generalized
velocities exposed to the solvers) we use the reference's layout
``[linear; angular]`` (reference: ImpactConstraintHandler.cpp:1817+
`add_contact_dir_to_Jacobian` writes columns 0-2 = direction, 3-5 = moment).
Use :func:`to_moby_gc` / :func:`from_moby_gc` to convert.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .so3 import hat


class Transform(NamedTuple):
    """Plücker coordinate transform child_X_parent as (E, r)."""

    E: jnp.ndarray  # (..., 3, 3) rotation: parent coords -> child coords
    r: jnp.ndarray  # (..., 3) child origin in parent coords

    def inv(self) -> "Transform":
        ET = jnp.swapaxes(self.E, -1, -2)
        return Transform(ET, -jnp.einsum("...ij,...j->...i", self.E, self.r))

    def compose(self, other: "Transform") -> "Transform":
        """X_self · X_other (apply `other` first, then `self`)."""
        E = self.E @ other.E
        r = other.r + jnp.einsum("...ji,...j->...i", other.E, self.r)
        return Transform(E, r)


def xform_motion(X: Transform, v):
    """Apply child_X_parent to a motion vector [ω; v]."""
    w, vl = v[..., :3], v[..., 3:]
    Ew = jnp.einsum("...ij,...j->...i", X.E, w)
    vl2 = jnp.einsum("...ij,...j->...i", X.E, vl - jnp.cross(X.r, w))
    return jnp.concatenate([Ew, vl2], axis=-1)


def xform_force(X: Transform, f):
    """Apply child_X_parent to a force vector [τ; f] (dual transform)."""
    t, fl = f[..., :3], f[..., 3:]
    Efl = jnp.einsum("...ij,...j->...i", X.E, fl)
    t2 = jnp.einsum("...ij,...j->...i", X.E, t - jnp.cross(X.r, fl))
    return jnp.concatenate([t2, Efl], axis=-1)


def crm(v):
    """Spatial motion cross-product matrix (v ×)."""
    w, vl = v[..., :3], v[..., 3:]
    hw, hv = hat(w), hat(vl)
    z = jnp.zeros_like(hw)
    top = jnp.concatenate([hw, z], axis=-1)
    bot = jnp.concatenate([hv, hw], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crf(v):
    """Spatial force cross-product matrix (v ×*) = -crm(v)^T."""
    m = crm(v)
    return -jnp.swapaxes(m, -1, -2)


def cross_motion(v, m):
    """v × m for motion vectors."""
    w, vl = v[..., :3], v[..., 3:]
    mw, ml = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, ml) + jnp.cross(vl, mw)], axis=-1
    )


def cross_force(v, f):
    """v ×* f for a force vector."""
    w, vl = v[..., :3], v[..., 3:]
    ft, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, ft) + jnp.cross(vl, fl), jnp.cross(w, fl)], axis=-1
    )


def inertia_matrix(mass, com, I_com):
    """6x6 spatial inertia from mass, COM offset c (in the frame), and rotational
    inertia about the COM:  [[I_com + m·hat(c)hat(c)', m·hat(c)], [m·hat(c)', m·1]].
    """
    mass = jnp.asarray(mass)
    c = jnp.asarray(com)
    hc = hat(c)
    m3 = mass[..., None, None] * jnp.eye(3, dtype=hc.dtype)
    mhc = mass[..., None, None] * hc
    top = jnp.concatenate([I_com + mhc @ jnp.swapaxes(hc, -1, -2), mhc], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(mhc, -1, -2), m3], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def xform_inertia(X: Transform, I6):
    """Transform a 6x6 spatial inertia: I_child = X^{-T} I X^{-1} (motion X)."""
    Xi = motion_matrix(X.inv())
    return jnp.swapaxes(Xi, -1, -2) @ I6 @ Xi


def motion_matrix(X: Transform):
    """Dense 6x6 matrix of the motion transform."""
    E = X.E
    z = jnp.zeros_like(E)
    top = jnp.concatenate([E, z], axis=-1)
    bot = jnp.concatenate([-E @ hat(X.r), E], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def to_moby_gc(v6):
    """[ω; v] (Featherstone) -> [v; ω] (reference generalized-coordinate layout)."""
    return jnp.concatenate([v6[..., 3:], v6[..., :3]], axis=-1)


def from_moby_gc(v6):
    """[v; ω] -> [ω; v]."""
    return jnp.concatenate([v6[..., 3:], v6[..., :3]], axis=-1)
