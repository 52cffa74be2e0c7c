"""Box-constrained gradient-projection QP (reference QP::qp_gradproj,
include/Moby/QP.h, live use: box-box closest point BoxPrimitive.cpp:222)."""

import numpy as np
import jax
import jax.numpy as jnp

from moby_tpu.solvers.qp import qp_gradproj


class TestGradProjQP:
    def test_unconstrained_interior(self):
        G = jnp.array([[2.0, 0.0], [0.0, 4.0]])
        c = jnp.array([-2.0, -4.0])   # min at (1, 1)
        l = jnp.full(2, -10.0)
        u = jnp.full(2, 10.0)
        x, it = qp_gradproj(G, c, l, u, max_iters=200, tol=1e-12)
        np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-8)

    def test_active_bounds(self):
        G = jnp.eye(2)
        c = jnp.array([-5.0, -5.0])   # unconstrained min (5, 5)
        l = jnp.zeros(2)
        u = jnp.array([1.0, 2.0])
        x, it = qp_gradproj(G, c, l, u, max_iters=100, tol=1e-12)
        np.testing.assert_allclose(np.asarray(x), [1.0, 2.0], atol=1e-10)

    def test_box_box_closest_point(self):
        """The reference's live use: closest point between two boxes as a
        box-constrained QP over the 6 local coordinates."""
        # box A: [-1,1]^3 at origin; box B: unit box centered at (3, 0.5, 0)
        # min |a - b|^2 over a in A, b in B -> a=(1,0.5,0), b=(2.5,0.5,0)
        cB = np.array([3.0, 0.5, 0.0])
        G = np.zeros((6, 6))
        G[:3, :3] = 2 * np.eye(3)
        G[3:, 3:] = 2 * np.eye(3)
        G[:3, 3:] = -2 * np.eye(3)
        G[3:, :3] = -2 * np.eye(3)
        c = np.concatenate([-2 * -cB, 2 * -cB]) * 0  # build from |a-(b+cB)|^2
        # x = [a, b_local]; distance^2 = |a - b_local - cB|^2
        c = np.concatenate([-2 * cB, 2 * cB])
        l = np.concatenate([-np.ones(3), -0.5 * np.ones(3)])
        u = np.concatenate([np.ones(3), 0.5 * np.ones(3)])
        x, it = qp_gradproj(jnp.array(G), jnp.array(c), jnp.array(l),
                            jnp.array(u), max_iters=500, tol=1e-12)
        a = np.asarray(x[:3])
        b = np.asarray(x[3:]) + cB
        # the optimum pair is non-unique in y/z (faces slide); the
        # separation vector and distance are unique
        np.testing.assert_allclose(a - b, [-1.5, 0.0, 0.0], atol=1e-6)
        assert abs(np.linalg.norm(a - b) - 1.5) < 1e-6

    def test_vmap(self):
        G = jnp.eye(3)[None].repeat(4, 0)
        c = -jnp.arange(12.0).reshape(4, 3)
        l = jnp.zeros((4, 3))
        u = jnp.full((4, 3), 2.0)
        xs, _ = jax.vmap(lambda g, cc: qp_gradproj(g, cc, l[0], u[0], tol=1e-12))(G, c)
        np.testing.assert_allclose(np.asarray(xs), np.clip(-np.asarray(c), 0, 2), atol=1e-8)
