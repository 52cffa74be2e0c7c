"""Small batched linear-algebra kernels used by the constraint solvers.

The reference leans on LAPACK (via Ravelin's `LinAlgd`: Cholesky, SVD-based
least squares, LU `solve_fast` — see SURVEY.md L0). Here everything is
fixed-shape and mask-aware so it vmaps/jits cleanly:

* :func:`masked_solve` — solve a linear system restricted to a boolean subset
  of indices (the pivoting LCP's sub-system solve, reference: src/LCP.cpp:118).
* :func:`masked_cholesky` — Cholesky on a masked submatrix, reporting failure
  like LAPACK's info flag (used for greedy full-rank row selection, reference:
  src/Simulator.cpp:732-778, src/ImpactConstraintHandler.cpp:1698).
* :func:`solve_spd_masked` — SPD solve on a masked submatrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_solve(M, q, mask, rcond_probe=1e-13):
    """Solve M[mask,mask] x = q[mask]; zeros elsewhere.

    Returns (x, ok) where ok=False signals a (near-)singular system, mirroring
    the reference's SingularException path (src/LCP.cpp:122-127).
    """
    dtype = M.dtype
    outer = mask[..., :, None] & mask[..., None, :]
    # rows/cols outside the mask become identity rows
    A = jnp.where(outer, M, 0.0) + jnp.diag(jnp.where(mask, 0.0, 1.0).astype(dtype))
    b = jnp.where(mask, q, 0.0)
    x = jnp.linalg.solve(A, b)
    resid = A @ x - b
    scale = jnp.maximum(jnp.max(jnp.abs(A)), 1.0)
    ok = jnp.all(jnp.isfinite(x)) & (
        jnp.max(jnp.abs(resid)) <= jnp.sqrt(rcond_probe) * scale * jnp.maximum(jnp.max(jnp.abs(x)), 1.0)
    )
    return jnp.where(mask, x, 0.0), ok


def cholesky_ok(A, mask=None, jitter=0.0):
    """Whether the masked submatrix of A admits a Cholesky factorization.

    Masked-out rows/cols are replaced by identity. Mirrors
    `LinAlgd::factor_chol` success/failure used by greedy rank selection.
    """
    n = A.shape[-1]
    if mask is not None:
        outer = mask[..., :, None] & mask[..., None, :]
        A = jnp.where(outer, A, 0.0) + jnp.diag(jnp.where(mask, 0.0, 1.0))
    A = A + jitter * jnp.eye(n, dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    return jnp.all(jnp.isfinite(L))


def solve_spd_masked(A, b, mask):
    """Solve SPD system restricted to mask via Cholesky; zeros elsewhere."""
    outer = mask[..., :, None] & mask[..., None, :]
    Am = jnp.where(outer, A, 0.0) + jnp.diag(jnp.where(mask, 0.0, 1.0).astype(A.dtype))
    bm = jnp.where(mask, b, 0.0)
    L = jnp.linalg.cholesky(Am)
    y = jax.scipy.linalg.solve_triangular(L, bm, lower=True)
    x = jax.scipy.linalg.solve_triangular(jnp.swapaxes(L, -1, -2), y, lower=False)
    return jnp.where(mask, x, 0.0)


def solve_spd(A, b):
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(jnp.swapaxes(L, -1, -2), y, lower=False)
