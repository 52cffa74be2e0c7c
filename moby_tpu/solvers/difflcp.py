"""Differentiable LCP: implicit-function-theorem gradients through the
contact solve (SURVEY.md hard part #5 — differentiating the impact LCP for
MPC).

Forward: the production pivoting cascade (`solve_lcp`). Backward: at a
solution (z, w = Mz + q), the active set A = {i : z_i > 0} satisfies
M_AA z_A + q_A = 0. By the IFT, for perturbations (dM, dq):

    dz_A = -M_AA^{-1} (dM_A: z + dq_A),   dz_{A^c} = 0

so the VJP pulls cotangents back through one masked linear solve:

    gbar_A = -M_AA^{-T} zbar_A
    qbar   = gbar,    Mbar = gbar z^T      (restricted to active rows)

Degenerate contacts (z_i = 0, w_i = 0) get the subgradient with the active
side chosen by z > tol — the standard choice for contact-implicit trajectory
optimization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lcp as lcp_mod


@jax.custom_vjp
def solve_lcp_diff(M, q, mask, z0):
    z, ok = lcp_mod.solve_lcp(M, q, mask, z0=z0)
    return z


def _fwd(M, q, mask, z0):
    z = solve_lcp_diff(M, q, mask, z0)
    return z, (M, q, mask, z)


def _bwd(res, zbar):
    M, q, mask, z = res
    eps = jnp.asarray(1e-10, M.dtype)
    active = (z > eps) & mask

    # gbar_A = -M_AA^{-T} zbar_A  (masked solve on the transpose system)
    outer = active[:, None] & active[None, :]
    A = jnp.where(outer, M.T, 0.0) + jnp.diag(
        jnp.where(active, 0.0, 1.0).astype(M.dtype)
    )
    gbar = jnp.linalg.solve(A, jnp.where(active, -zbar, 0.0))
    gbar = jnp.where(active, gbar, 0.0)
    gbar = jnp.where(jnp.all(jnp.isfinite(gbar)), gbar, jnp.zeros_like(gbar))

    Mbar = gbar[:, None] * z[None, :]
    qbar = gbar
    return Mbar, qbar, None, None


solve_lcp_diff.defvjp(_fwd, _bwd)
