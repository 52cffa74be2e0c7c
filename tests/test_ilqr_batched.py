"""Batch-level iLQR (early-exit line search) vs vmapped per-scenario iLQR."""

import numpy as np
import jax
import jax.numpy as jnp

from moby_tpu.mpc import ilqr


def _problem():
    # double integrator: x = [p, v], u scalar
    dt = 0.1

    def f(x, u):
        return jnp.array([x[0] + dt * x[1], x[1] + dt * u[0]])

    def cost(x, u):
        return 0.01 * jnp.sum(u ** 2)

    def cost_final(x):
        return 10.0 * (x[0] - 1.0) ** 2 + x[1] ** 2

    return f, cost, cost_final


class TestIlqrBatched:
    def test_matches_vmapped_ilqr(self):
        f, cost, cost_final = _problem()
        B, H = 5, 12
        key = jax.random.PRNGKey(0)
        x0s = jax.random.uniform(key, (B, 2), dtype=jnp.float64) * 0.4
        us0 = jnp.zeros((H, 1), jnp.float64)

        res_v = jax.vmap(
            lambda x0: ilqr.ilqr(f, cost, cost_final, x0, us0, n_iters=6,
                                 parallel_line_search=False)
        )(x0s)
        res_b = ilqr.ilqr_batched(f, cost, cost_final, x0s, us0, n_iters=6)

        np.testing.assert_allclose(
            np.asarray(res_b.cost), np.asarray(res_v.cost), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(res_b.us), np.asarray(res_v.us), atol=1e-6
        )

    def test_converges_to_target(self):
        f, cost, cost_final = _problem()
        x0s = jnp.zeros((3, 2), jnp.float64)
        us0 = jnp.zeros((15, 1), jnp.float64)
        res = ilqr.ilqr_batched(f, cost, cost_final, x0s, us0, n_iters=25)
        # final position near the target 1.0
        np.testing.assert_allclose(
            np.asarray(res.xs[:, -1, 0]), 1.0, atol=0.05
        )
