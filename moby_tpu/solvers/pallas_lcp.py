"""Pallas TPU kernel: batched principal-pivoting LCP solver.

The contact solve is the hot inner loop of the engine (BASELINE.json calls
for "Pallas kernels for the batched LCP pivots"). This kernel runs one LCP
per grid program with the whole problem resident in VMEM:

* the (n, n) matrix is padded to the 128-lane tile and loaded once;
* each pivot iteration solves the masked nonbasic system with an in-kernel
  Gauss–Jordan sweep whose eliminations are rank-1 outer products
  ((n,1)@(1,n) — MXU work), with no HBM traffic inside the loop;
* Mosaic constraints shape the code: no dynamic indexing and no 1-D vectors,
  so every vector lives as an (n,1) column, pivot selection / row extraction
  / basis updates are all first-minimum masks from broadcasted iota
  comparisons;
* the pivot rule is the same first-minimum principal pivoting as
  `solvers.lcp.lcp_fast` (reference src/LCP.cpp:41).

`ppm_lcp_batched` maps it over (B, n, n)/(B, n) problems; `interpret=True`
runs the same kernel on CPU for testing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _ppm_kernel(M_ref, q_ref, mask_ref, z_ref, ok_ref, *, n: int, max_piv: int):
    dtype = M_ref.dtype
    M = M_ref[0]                          # (n, n)
    q_row = q_ref[0]                      # (1, n)
    valid_row = mask_ref[0] > 0           # (1, n)

    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye_b = rows == cols

    def row_to_col(x_row):
        # (1, n) -> (n, 1) without tpu.reshape (masked diagonal reduction)
        return jnp.sum(jnp.where(eye_b, x_row, 0.0), axis=1, keepdims=True)

    def col_to_row(x_col):
        return jnp.sum(jnp.where(eye_b, x_col, 0.0), axis=0, keepdims=True)

    # column forms (all vectors are (n, 1))
    q = row_to_col(q_row)
    valid = row_to_col(valid_row.astype(dtype)) > 0

    eps = jnp.asarray(np.finfo(np.dtype(dtype)).eps, dtype)
    vout = valid & valid_row              # (n, n)
    rowsum = jnp.sum(jnp.abs(jnp.where(vout, M, 0.0)), axis=1, keepdims=True)
    norminf = jnp.max(jnp.where(valid, rowsum, 0.0))
    m_active = jnp.sum(valid.astype(dtype))
    ztol = m_active * norminf * eps

    ridx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)   # (n, 1)

    qv = jnp.where(valid, q, 1.0)                            # (n, 1)
    Mp = jnp.where(vout, M, 0.0) + jnp.where(
        eye_b & (~valid_row), jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype)
    )

    def first_min(v, sel):
        """(mask (n,1), min) of the first minimum of column v over sel."""
        vm = jnp.where(sel, v, jnp.inf)
        mn = jnp.min(vm)
        is_min = (vm == mn) & sel
        first_idx = jnp.min(jnp.where(is_min, ridx, jnp.int32(n)))
        return ridx == first_idx, mn

    start_mask, minq = first_min(qv, valid)
    trivial = minq > -ztol
    nonbas0 = start_mask & jnp.logical_not(trivial)
    # while-loop carries must avoid boolean vectors (Mosaic scf.yield
    # legalization) — carry the nonbasic set as int32

    def solve_masked(nb):
        """Branchless Gauss–Jordan of the nb-masked system A z = -q."""
        nb_row = col_to_row(nb.astype(dtype)) > 0
        nbout = nb & nb_row
        A = jnp.where(nbout, Mp, 0.0) + jnp.where(
            eye_b & (~nb_row),
            jnp.asarray(1.0, dtype),
            jnp.asarray(0.0, dtype),
        )
        b = jnp.where(nb, -qv, 0.0)                          # (n, 1)

        def gj_step(k, carry):
            A, b = carry
            rmask = ridx == k                                 # (n, 1)
            kcol = cols == k                                  # (n, n)
            pivot = jnp.sum(jnp.where(rmask & kcol, A, 0.0))
            piv_ok = jnp.abs(pivot) > 1e-30
            inv_p = 1.0 / jnp.where(piv_ok, pivot, 1.0)
            prow = jnp.sum(jnp.where(rmask, A, 0.0), axis=0, keepdims=True) * inv_p
            pb = jnp.sum(jnp.where(rmask, b, 0.0)) * inv_p
            col = jnp.sum(jnp.where(kcol, A, 0.0), axis=1, keepdims=True)
            factor = jnp.where(rmask, 0.0, col)               # (n, 1)
            A2 = A - jnp.dot(factor, prow, preferred_element_type=dtype)
            b2 = b - factor * pb
            A2 = jnp.where(rmask, prow, A2)
            b2 = jnp.where(rmask, pb, b2)
            return (
                jnp.where(piv_ok, A2, A),
                jnp.where(piv_ok, b2, b),
            )

        A, b = jax.lax.fori_loop(0, n, gj_step, (A, b))
        return jnp.where(nb, b, 0.0)

    def body(carry):
        nonbas_i, z, done_i, piv = carry
        nonbas = nonbas_i > 0
        z_nb = solve_masked(nonbas)                           # (n, 1)
        bas = valid & jnp.logical_not(nonbas)
        w = jnp.where(
            bas, jnp.dot(Mp, z_nb, preferred_element_type=dtype) + qv, 0.0
        )

        wmask, minw = first_min(w, bas)
        zmask, minz = first_min(z_nb, nonbas)

        w_ok = minw > -ztol
        z_neg = minz < -ztol
        solved = w_ok & jnp.logical_not(z_neg)

        nonbas2 = (nonbas | (wmask & jnp.logical_not(w_ok))) & jnp.logical_not(
            zmask & z_neg
        )
        # scalar-predicated select of boolean vectors is not legalizable on
        # Mosaic; use broadcasted boolean algebra instead
        nonbas_next = (nonbas & solved) | (nonbas2 & jnp.logical_not(solved))
        return (
            nonbas_next.astype(jnp.int32),
            z_nb,
            jnp.where(solved, jnp.int32(1), jnp.int32(0)),
            piv + 1,
        )

    def cond(carry):
        nonbas_i, z, done_i, piv = carry
        return (done_i == 0) & (piv < max_piv)

    zq = jnp.zeros((n, 1), dtype)
    nonbas_f, z_f, done_i, _ = jax.lax.while_loop(
        cond,
        body,
        (
            nonbas0.astype(jnp.int32),
            zq,
            jnp.where(trivial, jnp.int32(1), jnp.int32(0)),
            jnp.int32(0),
        ),
    )
    done = done_i > 0
    z_out = jnp.where(valid & jnp.logical_not(trivial) & done, z_f, 0.0)
    z_ref[0] = col_to_row(z_out)
    ok_ref[0] = jnp.zeros((1, 1), jnp.int32) + jnp.where(done, 1, 0)


def ppm_lcp_batched(Ms, qs, masks, max_piv: int | None = None,
                    interpret: bool = False):
    """Solve B LCPs with the Pallas kernel. Ms (B, n, n), qs (B, n),
    masks (B, n) bool -> (z (B, n), ok (B,))."""
    B, n, _ = Ms.shape
    npad = _round_up(max(n, 8), LANE)
    dtype = Ms.dtype
    if max_piv is None:
        max_piv = 2 * n + 8

    Mp = jnp.zeros((B, npad, npad), dtype).at[:, :n, :n].set(Ms)
    qp = jnp.zeros((B, 1, npad), dtype).at[:, 0, :n].set(qs)
    mp = jnp.zeros((B, 1, npad), jnp.int32).at[:, 0, :n].set(
        masks.astype(jnp.int32)
    )

    kernel = partial(_ppm_kernel, n=npad, max_piv=max_piv)
    z, ok = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, npad, npad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, npad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, npad), dtype),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(Mp, qp, mp)
    return z[:, 0, :n], ok[:, 0, 0] > 0
