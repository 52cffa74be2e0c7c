"""Cross-validation: the batched JAX LCP cascade vs the independent native
(C++) implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from moby_tpu import native
from moby_tpu.solvers import lcp

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_native_matches_jax_on_spd():
    rng = np.random.default_rng(0)
    for seed in range(10):
        n = 10
        A = rng.normal(size=(n, n))
        M = A @ A.T + 0.5 * np.eye(n)
        q = rng.normal(size=n)
        z_nat, ok = native.lcp_solve(M, q)
        assert ok
        z_jax, ok2 = lcp.solve_lcp(jnp.array(M), jnp.array(q), jnp.ones(n, bool))
        assert bool(ok2)
        # strictly monotone -> unique solution
        np.testing.assert_allclose(z_nat, np.asarray(z_jax), atol=1e-7)


def test_native_complementarity():
    rng = np.random.default_rng(1)
    for seed in range(5):
        n = 12
        A = rng.normal(size=(n, n))
        M = A @ A.T  # PSD
        q = rng.normal(size=n)
        z, ok = native.lcp_solve(M, q)
        assert ok
        w = M @ z + q
        assert z.min() > -1e-7
        assert w.min() > -1e-6
        assert abs(z @ w) < 1e-5


def test_traj_linf():
    a = np.arange(12.0).reshape(3, 4)
    b = a.copy()
    b[1, 2] += 0.5
    assert abs(native.traj_linf(a, b) - 0.5) < 1e-15
