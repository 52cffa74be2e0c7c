"""Quaternion operations (xyzw storage order).

Storage matches the reference's Euler-parameter trajectory output
(`programs/regress.cpp` emits position then quaternion as ``x y z qx qy qz qw``
per body — see the identity quats ``0 0 0 1`` in `regress/sphere-stack.dat:1`).

All functions are shape-polymorphic over leading batch dims: quaternions are
``(..., 4)``, vectors ``(..., 3)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def identity(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def mul(q1, q2):
    """Hamilton product q1 ⊗ q2 (both xyzw)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def conj(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def normalize(q, eps=1e-30):
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def rotate(q, v):
    """Rotate vector v by quaternion q (active rotation, body->world)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def inverse_rotate(q, v):
    """Rotate v by q^{-1} (world->body)."""
    return rotate(conj(q), v)


def to_matrix(q):
    """Rotation matrix R with R @ v_body = v_world. Shape (..., 3, 3)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def from_matrix(R):
    """Quaternion (xyzw) from rotation matrix. Shepperd's method, branchless.

    The sqrt arguments are floored at 1e-12 instead of 0: all four
    candidates are computed and only the max-pivot one is selected, but
    reverse-mode AD still pulls (zero) cotangents through the UNSELECTED
    branches — sqrt(0) there has an infinite derivative and 0*inf = NaN
    poisons every gradient that touches FK (the bug that silently zeroed
    the whole articulated-MPC backward pass through round 4: iLQR rejected
    every NaN-gain step, so ur10 "solves" never moved the controls). The
    floor is inert for values: the selected candidate's argument is
    always >= 1."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate constructions; pick the numerically best by max pivot
    qw0 = jnp.sqrt(jnp.maximum(1e-12, 1.0 + tr)) / 2
    qx0 = (m21 - m12) / jnp.maximum(4 * qw0, 1e-30)
    qy0 = (m02 - m20) / jnp.maximum(4 * qw0, 1e-30)
    qz0 = (m10 - m01) / jnp.maximum(4 * qw0, 1e-30)

    qx1 = jnp.sqrt(jnp.maximum(1e-12, 1.0 + m00 - m11 - m22)) / 2
    qw1 = (m21 - m12) / jnp.maximum(4 * qx1, 1e-30)
    qy1 = (m01 + m10) / jnp.maximum(4 * qx1, 1e-30)
    qz1 = (m02 + m20) / jnp.maximum(4 * qx1, 1e-30)

    qy2 = jnp.sqrt(jnp.maximum(1e-12, 1.0 - m00 + m11 - m22)) / 2
    qw2 = (m02 - m20) / jnp.maximum(4 * qy2, 1e-30)
    qx2 = (m01 + m10) / jnp.maximum(4 * qy2, 1e-30)
    qz2 = (m12 + m21) / jnp.maximum(4 * qy2, 1e-30)

    qz3 = jnp.sqrt(jnp.maximum(1e-12, 1.0 - m00 - m11 + m22)) / 2
    qw3 = (m10 - m01) / jnp.maximum(4 * qz3, 1e-30)
    qx3 = (m02 + m20) / jnp.maximum(4 * qz3, 1e-30)
    qy3 = (m12 + m21) / jnp.maximum(4 * qz3, 1e-30)

    cand = jnp.stack(
        [
            jnp.stack([qx0, qy0, qz0, qw0], axis=-1),
            jnp.stack([qx1, qy1, qz1, qw1], axis=-1),
            jnp.stack([qx2, qy2, qz2, qw2], axis=-1),
            jnp.stack([qx3, qy3, qz3, qw3], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4)
    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, axis=-1), axis=-2)
    return normalize(q[..., 0, :])


def deriv(q, omega):
    """Quaternion time derivative for angular velocity omega (world frame).

    qdot = 0.5 * quat(omega) ⊗ q  — matches Ravelin's Quatd::deriv used by
    `get_generalized_velocity(eEuler)` for the position-integration step
    (reference: src/TimeSteppingSimulator.cpp:159-163).
    """
    ow = jnp.concatenate([omega, jnp.zeros_like(omega[..., :1])], axis=-1)
    return 0.5 * mul(ow, q)


def from_rpy(rpy):
    """Quaternion from fixed-axis roll-pitch-yaw (X, then Y, then Z world axes).

    Matches URDF/Moby `rpy` convention: R = Rz(yaw) Ry(pitch) Rx(roll).
    """
    r, p, y = jnp.moveaxis(jnp.asarray(rpy), -1, 0)
    hr, hp, hy = r / 2, p / 2, y / 2
    cr, sr = jnp.cos(hr), jnp.sin(hr)
    cp, sp = jnp.cos(hp), jnp.sin(hp)
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def from_axis_angle(axis, angle):
    axis = jnp.asarray(axis)
    angle = jnp.asarray(angle)
    half = angle / 2
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )
