"""LP solver (reference LP::lp_seidel surface & convention, src/LP.cpp:32-295).

The reference maximizes c'x subject to A x <= b, l <= x <= u.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moby_tpu.solvers.lp import lp_seidel


def test_box_only_lp():
    # max c'x with only box bounds: optimum at the corner aligned with c
    c = jnp.array([1.0, -2.0, 0.5])
    A = jnp.zeros((1, 3))
    b = jnp.array([1e30])  # inert row
    l = jnp.array([-1.0, -1.0, -1.0])
    u = jnp.array([2.0, 3.0, 4.0])
    x, ok = lp_seidel(A, b, c, l, u)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x), [2.0, -1.0, 4.0], atol=1e-6)


def test_constrained_lp_2d():
    # max x+y s.t. x+y <= 1, 0 <= x,y <= 5
    c = jnp.array([1.0, 1.0])
    A = jnp.array([[1.0, 1.0]])
    b = jnp.array([1.0])
    l = jnp.zeros(2)
    u = jnp.full(2, 5.0)
    x, ok = lp_seidel(A, b, c, l, u)
    assert bool(ok)
    assert abs(float(x.sum()) - 1.0) < 1e-6
    assert float(c @ x) == pytest.approx(1.0, abs=1e-6)


def test_infeasible_lp():
    # x <= -1 with box 0 <= x <= 1
    c = jnp.array([1.0])
    A = jnp.array([[1.0]])
    b = jnp.array([-1.0])
    l = jnp.array([0.0])
    u = jnp.array([1.0])
    x, ok = lp_seidel(A, b, c, l, u)
    assert not bool(ok)


def test_masked_padding_matches_unpadded():
    c = jnp.array([1.0, 1.0, -7.0])
    A = jnp.array([[1.0, 1.0, 0.0], [9.0, 9.0, 9.0]])
    b = jnp.array([1.0, -123.0])
    l = jnp.array([0.0, 0.0, -9.0])
    u = jnp.array([5.0, 5.0, 9.0])
    cm = jnp.array([True, False])
    vm = jnp.array([True, True, False])
    x, ok = lp_seidel(A, b, c, l, u, con_mask=cm, var_mask=vm)
    assert bool(ok)
    assert float(x[2]) == 0.0
    assert abs(float(x[:2].sum()) - 1.0) < 1e-6


def test_vmapped_batch():
    keys = jax.random.split(jax.random.PRNGKey(3), 16)

    def solve(key):
        c = jax.random.normal(key, (4,))
        A = jnp.eye(4)
        b = jnp.full(4, 0.5)  # x <= 0.5
        l = jnp.full(4, -2.0)
        u = jnp.full(4, 2.0)
        return lp_seidel(A, b, c, l, u)

    xs, oks = jax.vmap(solve)(keys)
    assert bool(jnp.all(oks))
    # analytic: x_i = 0.5 if c_i > 0 else -2.0 (ties at 0 arbitrary)
    cs = jax.vmap(lambda k: jax.random.normal(k, (4,)))(keys)
    expect = jnp.where(cs > 0, 0.5, -2.0)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(expect), atol=1e-5)


def test_reference_convention_sign():
    """max 2x s.t. x <= 3, 0 <= x <= 10 -> x = 3 (a verbatim reference-style
    call must get the reference's optimum, not the sign-flipped one)."""
    x, ok = lp_seidel(
        jnp.array([[1.0]]), jnp.array([3.0]), jnp.array([2.0]),
        jnp.array([0.0]), jnp.array([10.0]),
    )
    assert bool(ok)
    assert float(x[0]) == pytest.approx(3.0, abs=1e-6)
