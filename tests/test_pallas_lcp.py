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


from moby_tpu.solvers.pallas_lcp import bpp_lcp_batched


class TestPallasBPP:
    def test_matches_xla_solver(self):
        B, n = 8, 12
        Ms, qs = make_problems(B, n)
        masks = jnp.ones((B, n), bool)
        z, ok = bpp_lcp_batched(Ms, qs, masks, interpret=True)
        assert bool(jnp.all(ok))
        z_ref, ok_ref = jax.vmap(lambda M, q, m: lcp.lcp_fast(M, q, m))(
            Ms, qs, masks
        )
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(z_ref), atol=2e-4, rtol=1e-3
        )

    def test_complementarity_and_verify(self):
        B, n = 6, 20
        Ms, qs = make_problems(B, n, seed=3)
        masks = jnp.ones((B, n), bool)
        z, ok = bpp_lcp_batched(Ms, qs, masks, interpret=True)
        assert bool(jnp.all(ok))
        for b in range(B):
            zb = np.asarray(z[b], np.float64)
            w = np.asarray(Ms[b], np.float64) @ zb + np.asarray(qs[b], np.float64)
            assert zb.min() > -1e-4
            assert w.min() > -1e-3
            assert abs(zb * w).max() < 1e-2

    def test_masked_padding_and_warmstart(self):
        B, n, n_true = 4, 16, 9
        Ms, qs = make_problems(B, n, seed=5)
        masks = jnp.zeros((B, n), bool).at[:, :n_true].set(True)
        z_cold, ok = bpp_lcp_batched(Ms, qs, masks, interpret=True)
        assert bool(jnp.all(ok))
        np.testing.assert_allclose(np.asarray(z_cold)[:, n_true:], 0.0)
        # warm start from the solution must reproduce it
        z_warm, ok_w = bpp_lcp_batched(Ms, qs, masks, z0s=z_cold, interpret=True)
        assert bool(jnp.all(ok_w))
        np.testing.assert_allclose(
            np.asarray(z_warm), np.asarray(z_cold), atol=2e-4, rtol=1e-3
        )

    def test_empty_mask_is_trivial(self):
        B, n = 3, 8
        Ms, qs = make_problems(B, n, seed=7)
        masks = jnp.zeros((B, n), bool)
        z, ok = bpp_lcp_batched(Ms, qs, masks, interpret=True)
        assert bool(jnp.all(ok))
        np.testing.assert_allclose(np.asarray(z), 0.0)

    def test_trivial_q_positive(self):
        B, n = 3, 8
        Ms, _ = make_problems(B, n, seed=9)
        qs = jnp.ones((B, n), jnp.float32)
        masks = jnp.ones((B, n), bool)
        z, ok = bpp_lcp_batched(Ms, qs, masks, interpret=True)
        assert bool(jnp.all(ok))
        np.testing.assert_allclose(np.asarray(z), 0.0)


from moby_tpu.solvers.pallas_lcp import ppm_lcp_one


class TestPPMWarmOne:
    def test_vmap_matches_and_warm(self):
        B, n = 6, 20
        Ms, qs = make_problems(B, n, seed=11)
        masks = jnp.ones((B, n), bool).at[:, 17:].set(False)
        z, done = jax.vmap(
            lambda M, q, m: ppm_lcp_one(M, q, m, interpret=True)
        )(Ms, qs, masks)
        assert bool(jnp.all(done))
        z_ref, _ = jax.vmap(lambda M, q, m: lcp.lcp_fast(M, q, m))(Ms, qs, masks)
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(z_ref), atol=2e-4, rtol=1e-3
        )
        # warm start from the solution reproduces it
        z_w, done_w = jax.vmap(
            lambda M, q, m, z0: ppm_lcp_one(M, q, m, z0=z0, interpret=True)
        )(Ms, qs, masks, z)
        assert bool(jnp.all(done_w))
        np.testing.assert_allclose(
            np.asarray(z_w), np.asarray(z), atol=2e-4, rtol=1e-3
        )


class TestDispatchedAccel:
    def test_solve_accel_matches_xla(self, monkeypatch):
        """The production accelerator cascade (BPP-GJ -> pallas PPM -> XLA),
        forced on via MOBY_PALLAS_LCP=1 (interpret mode on CPU), must agree
        with the pure-XLA cascade."""
        monkeypatch.setenv("MOBY_PALLAS_LCP", "1")
        B, n = 5, 16
        Ms, qs = make_problems(B, n, seed=13)
        Ms, qs = Ms.astype(jnp.float32), qs.astype(jnp.float32)
        masks = jnp.ones((B, n), bool).at[:, 13:].set(False)
        z0 = jnp.zeros((B, n), jnp.float32)
        skip = jnp.zeros(B, bool)
        z, ok = jax.vmap(
            lambda M, q, m, z_, s: lcp.solve_lcp(M, q, m, z0=z_, skip=s)
        )(Ms, qs, masks, z0, skip)
        assert bool(jnp.all(ok))
        z_ref, ok_ref = jax.vmap(
            lambda M, q, m, z_, s: lcp._solve_lcp_xla(M, q, m, z0=z_, skip=s)
        )(Ms.astype(jnp.float64), qs.astype(jnp.float64), masks,
          z0.astype(jnp.float64), skip)
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(z_ref), atol=5e-4, rtol=1e-3
        )

    def test_skip_yields_zero(self, monkeypatch):
        monkeypatch.setenv("MOBY_PALLAS_LCP", "1")
        B, n = 3, 8
        Ms, qs = make_problems(B, n, seed=17)
        Ms, qs = Ms.astype(jnp.float32), qs.astype(jnp.float32)
        masks = jnp.ones((B, n), bool)
        z0 = jnp.zeros((B, n), jnp.float32)
        skip = jnp.ones(B, bool)
        z, ok = jax.vmap(
            lambda M, q, m, z_, s: lcp.solve_lcp(M, q, m, z0=z_, skip=s)
        )(Ms, qs, masks, z0, skip)
        np.testing.assert_allclose(np.asarray(z), 0.0)
