"""Box-constrained gradient-projection QP.

Parity with the reference's header-only `QP::qp_gradproj`
(include/Moby/QP.h:15-30, QP.inl): minimize 1/2 x'Gx + c'x subject to
l <= x <= u by projected gradient descent with an exact line step along the
projected direction, fixed iteration count. The reference's one live use is
the box-box closest-point query (src/BoxPrimitive.cpp:222); here it is also
the generic small-QP utility.

Fixed-shape and jittable: `vmap` batches independent QPs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def qp_gradproj(G, c, l, u, x0=None, max_iters: int = 100, tol: float = 0.0):
    """Minimize 1/2 x'Gx + c'x s.t. l <= x <= u. Returns (x, n_iters_used).

    G must be symmetric PSD (the reference requires the same). `tol`
    terminates early when the projected-gradient norm falls below it
    (tol = 0 runs all iterations, matching a fixed-budget call).
    """
    n = c.shape[0]
    dtype = c.dtype
    if x0 is None:
        x0 = jnp.clip(jnp.zeros(n, dtype), l, u)
    else:
        x0 = jnp.clip(x0, l, u)

    def body(carry):
        x, it, done = carry
        g = G @ x + c
        # projected gradient: zero where pushing against an active bound
        pg = jnp.where((x <= l) & (g > 0), 0.0, g)
        pg = jnp.where((x >= u) & (pg < 0), 0.0, pg)
        d = -pg
        # exact minimizing step along d (before projection):
        # alpha = d'd / d'Gd
        dGd = d @ (G @ d)
        alpha = jnp.where(dGd > 1e-30, (d @ d) / jnp.where(dGd > 1e-30, dGd, 1.0), 0.0)
        x_new = jnp.clip(x + alpha * d, l, u)
        done_new = jnp.linalg.norm(pg) <= tol
        return jnp.where(done, x, x_new), it + 1, done | done_new

    def cond(carry):
        x, it, done = carry
        return (it < max_iters) & ~done

    x, it, _ = jax.lax.while_loop(
        cond, body, (x0, jnp.int32(0), jnp.array(False))
    )
    return x, it
