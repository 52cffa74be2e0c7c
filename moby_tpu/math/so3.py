"""SO(3) helpers: skew matrices, rpy, deterministic tangent bases."""

from __future__ import annotations

import jax.numpy as jnp


def hat(v):
    """Skew-symmetric cross-product matrix: hat(v) @ u == cross(v, u)."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def rpy_to_matrix(rpy):
    """R = Rz(yaw) @ Ry(pitch) @ Rx(roll) (URDF / Moby fixed-axis rpy)."""
    r, p, y = jnp.moveaxis(jnp.asarray(rpy), -1, 0)
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    m = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def orthonormal_basis(n):
    """Two unit tangents (t1, t2) completing normal n to a right-handed frame.

    Mirrors Ravelin's `Vector3d::determine_orthonormal_basis` (used for the
    deterministic contact tangent frame, reference:
    src/UnilateralConstraint.cpp:1427): pick the coordinate axis least aligned
    with n, make t1 = normalize(axis × n)?  Ravelin constructs v2 by zeroing
    the dominant component pattern; we reproduce the standard construction
      |n.x| > |n.y|  ->  t1 ∝ (-n.z, 0, n.x)
      else           ->  t1 ∝ (0,  n.z, -n.y)
    then t2 = n × t1.
    """
    x, y, z = jnp.moveaxis(n, -1, 0)
    use_x = jnp.abs(x) > jnp.abs(y)
    t1 = jnp.where(
        use_x[..., None],
        jnp.stack([-z, jnp.zeros_like(x), x], axis=-1),
        jnp.stack([jnp.zeros_like(x), z, -y], axis=-1),
    )
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-30)
    t2 = jnp.cross(n, t1)
    t2 = t2 / jnp.maximum(jnp.linalg.norm(t2, axis=-1, keepdims=True), 1e-30)
    return t1, t2
