"""Pallas batched-LCP kernel: correctness in interpret mode (CPU CI).

On TPU hardware the same kernel compiles through Mosaic and runs ~2x faster
than the vmapped XLA pivoting solver at B=1024, n=66 (see commit notes);
these tests validate the branchless mask-algebra implementation against the
reference XLA solver.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moby_tpu.solvers import lcp
from moby_tpu.solvers.pallas_lcp import ppm_lcp_batched


def make_problems(B, n, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(B, n, n)).astype(dtype)
    Ms = np.einsum("bij,bkj->bik", A, A) + 0.5 * np.eye(n, dtype=dtype)
    qs = rng.normal(size=(B, n)).astype(dtype)
    return jnp.array(Ms), jnp.array(qs)


class TestPallasLCP:
    def test_matches_xla_solver(self):
        B, n = 8, 12
        Ms, qs = make_problems(B, n)
        masks = jnp.ones((B, n), bool)
        z, ok = ppm_lcp_batched(Ms, qs, masks, interpret=True)
        assert bool(jnp.all(ok))
        z_ref, ok_ref = jax.vmap(lambda M, q, m: lcp.lcp_fast(M, q, m))(
            Ms.astype(jnp.float64) if jax.config.jax_enable_x64 else Ms,
            qs.astype(jnp.float64) if jax.config.jax_enable_x64 else qs,
            masks,
        )
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(z_ref), atol=2e-4, rtol=1e-3
        )

    def test_complementarity(self):
        B, n = 6, 20
        Ms, qs = make_problems(B, n, seed=3)
        masks = jnp.ones((B, n), bool)
        z, ok = ppm_lcp_batched(Ms, qs, masks, interpret=True)
        assert bool(jnp.all(ok))
        for b in range(B):
            zb = np.asarray(z[b], np.float64)
            w = np.asarray(Ms[b], np.float64) @ zb + np.asarray(qs[b], np.float64)
            assert zb.min() > -1e-4
            assert w.min() > -1e-3
            assert abs(zb * w).max() < 1e-2

    def test_masked_padding(self):
        B, n, n_true = 4, 16, 9
        Ms, qs = make_problems(B, n, seed=5)
        masks = jnp.zeros((B, n), bool).at[:, :n_true].set(True)
        z, ok = ppm_lcp_batched(Ms, qs, masks, interpret=True)
        assert bool(jnp.all(ok))
        np.testing.assert_allclose(np.asarray(z)[:, n_true:], 0.0)
        z_ref, _ = jax.vmap(lambda M, q, m: lcp.lcp_fast(M, q, m))(Ms, qs, masks)
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(z_ref), atol=2e-4, rtol=1e-3
        )
