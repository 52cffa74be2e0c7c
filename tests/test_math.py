import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moby_tpu.math import quaternion as quat
from moby_tpu.math import so3, spatial, linalg


def rng(seed=0):
    return np.random.default_rng(seed)


class TestQuaternion:
    def test_identity_rotate(self):
        q = quat.identity(jnp.float64)
        v = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(quat.rotate(q, v), v, atol=1e-14)

    def test_mul_matches_matrix(self):
        r = rng(1)
        for _ in range(10):
            q1 = quat.normalize(jnp.array(r.normal(size=4)))
            q2 = quat.normalize(jnp.array(r.normal(size=4)))
            q12 = quat.mul(q1, q2)
            R12 = quat.to_matrix(q1) @ quat.to_matrix(q2)
            np.testing.assert_allclose(quat.to_matrix(q12), R12, atol=1e-12)

    def test_rotate_matches_matrix(self):
        r = rng(2)
        q = quat.normalize(jnp.array(r.normal(size=4)))
        v = jnp.array(r.normal(size=3))
        np.testing.assert_allclose(
            quat.rotate(q, v), quat.to_matrix(q) @ v, atol=1e-12
        )

    def test_from_matrix_roundtrip(self):
        r = rng(3)
        for _ in range(20):
            q = quat.normalize(jnp.array(r.normal(size=4)))
            q2 = quat.from_matrix(quat.to_matrix(q))
            # sign ambiguity
            s = jnp.sign(jnp.vdot(q, q2))
            np.testing.assert_allclose(q, s * q2, atol=1e-10)

    def test_deriv_integrates_rotation(self):
        # integrate qdot = 0.5 * w ⊗ q for constant w; compare to axis-angle
        w = jnp.array([0.0, 0.0, 2.0])
        q = quat.identity(jnp.float64)
        h = 1e-4
        for _ in range(1000):
            q = quat.normalize(q + h * quat.deriv(q, w))
        expected = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 2.0 * 0.1)
        np.testing.assert_allclose(q, expected, atol=1e-4)

    def test_rpy(self):
        rpy = jnp.array([0.1, -0.2, 0.3])
        np.testing.assert_allclose(
            quat.to_matrix(quat.from_rpy(rpy)), so3.rpy_to_matrix(rpy), atol=1e-12
        )


class TestSO3:
    def test_hat(self):
        a = jnp.array([1.0, 2.0, 3.0])
        b = jnp.array([-4.0, 5.0, 0.5])
        np.testing.assert_allclose(so3.hat(a) @ b, jnp.cross(a, b), atol=1e-14)

    def test_orthonormal_basis(self):
        r = rng(4)
        for _ in range(20):
            n = jnp.array(r.normal(size=3))
            n = n / jnp.linalg.norm(n)
            t1, t2 = so3.orthonormal_basis(n)
            np.testing.assert_allclose(jnp.dot(t1, n), 0.0, atol=1e-12)
            np.testing.assert_allclose(jnp.dot(t2, n), 0.0, atol=1e-12)
            np.testing.assert_allclose(jnp.dot(t1, t2), 0.0, atol=1e-12)
            np.testing.assert_allclose(jnp.linalg.norm(t1), 1.0, atol=1e-12)
            np.testing.assert_allclose(jnp.cross(n, t1), t2, atol=1e-12)


class TestSpatial:
    def test_transform_roundtrip(self):
        r = rng(5)
        E = np.asarray(so3.rpy_to_matrix(jnp.array(r.normal(size=3))))
        X = spatial.Transform(jnp.array(E), jnp.array(r.normal(size=3)))
        v = jnp.array(r.normal(size=6))
        v2 = spatial.xform_motion(X.inv(), spatial.xform_motion(X, v))
        np.testing.assert_allclose(v2, v, atol=1e-12)

    def test_force_motion_duality(self):
        # power f·v is invariant under coordinate change
        r = rng(6)
        E = np.asarray(so3.rpy_to_matrix(jnp.array(r.normal(size=3))))
        X = spatial.Transform(jnp.array(E), jnp.array(r.normal(size=3)))
        v = jnp.array(r.normal(size=6))
        f = jnp.array(r.normal(size=6))
        p1 = jnp.dot(f, v)
        p2 = jnp.dot(spatial.xform_force(X, f), spatial.xform_motion(X, v))
        np.testing.assert_allclose(p1, p2, atol=1e-12)

    def test_motion_matrix_consistency(self):
        r = rng(7)
        E = np.asarray(so3.rpy_to_matrix(jnp.array(r.normal(size=3))))
        X = spatial.Transform(jnp.array(E), jnp.array(r.normal(size=3)))
        v = jnp.array(r.normal(size=6))
        np.testing.assert_allclose(
            spatial.motion_matrix(X) @ v, spatial.xform_motion(X, v), atol=1e-12
        )

    def test_crm_crf(self):
        r = rng(8)
        v = jnp.array(r.normal(size=6))
        m = jnp.array(r.normal(size=6))
        np.testing.assert_allclose(
            spatial.crm(v) @ m, spatial.cross_motion(v, m), atol=1e-12
        )
        np.testing.assert_allclose(
            spatial.crf(v) @ m, spatial.cross_force(v, m), atol=1e-12
        )

    def test_inertia_kinetic_energy(self):
        # KE of a point mass offset from frame origin
        m = 2.0
        c = jnp.array([0.5, 0.0, 0.0])
        I6 = spatial.inertia_matrix(m, c, jnp.zeros((3, 3)))
        # pure rotation about z at frame origin: point speed = |w||c|
        v = jnp.array([0.0, 0.0, 3.0, 0.0, 0.0, 0.0])
        ke = 0.5 * v @ I6 @ v
        np.testing.assert_allclose(ke, 0.5 * m * (3.0 * 0.5) ** 2, atol=1e-12)


class TestLinalg:
    def test_masked_solve(self):
        r = rng(9)
        n = 6
        A = jnp.array(r.normal(size=(n, n))) + 3 * jnp.eye(n)
        b = jnp.array(r.normal(size=n))
        mask = jnp.array([True, False, True, True, False, True])
        x, ok = linalg.masked_solve(A, b, mask)
        assert bool(ok)
        idx = np.where(np.asarray(mask))[0]
        x_ref = np.linalg.solve(np.asarray(A)[np.ix_(idx, idx)], np.asarray(b)[idx])
        np.testing.assert_allclose(np.asarray(x)[idx], x_ref, atol=1e-10)
        np.testing.assert_allclose(np.asarray(x)[~np.asarray(mask)], 0.0)

    def test_masked_solve_singular(self):
        A = jnp.zeros((3, 3))
        b = jnp.ones(3)
        x, ok = linalg.masked_solve(A, b, jnp.array([True, True, False]))
        assert not bool(ok)

    def test_cholesky_ok(self):
        r = rng(10)
        B = jnp.array(r.normal(size=(4, 4)))
        spd = B @ B.T + 1e-3 * jnp.eye(4)
        assert bool(linalg.cholesky_ok(spd))
        # rank-1 matrix fails on the full mask, passes on a single index
        v = jnp.array([1.0, 2.0, 3.0, 4.0])
        rank1 = jnp.outer(v, v)
        assert not bool(linalg.cholesky_ok(rank1))
        assert bool(
            linalg.cholesky_ok(rank1, mask=jnp.array([True, False, False, False]))
        )

    def test_solve_spd_masked(self):
        r = rng(11)
        B = jnp.array(r.normal(size=(5, 5)))
        A = B @ B.T + jnp.eye(5)
        b = jnp.array(r.normal(size=5))
        mask = jnp.array([True, True, False, True, False])
        x = linalg.solve_spd_masked(A, b, mask)
        idx = np.where(np.asarray(mask))[0]
        x_ref = np.linalg.solve(np.asarray(A)[np.ix_(idx, idx)], np.asarray(b)[idx])
        np.testing.assert_allclose(np.asarray(x)[idx], x_ref, atol=1e-10)
