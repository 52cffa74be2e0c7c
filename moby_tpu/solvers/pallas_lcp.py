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
_STOP_AFTER = 3  # debug bisection knob: 0..3 (3 = full kernel)
_NO_MURTY = False  # debug bisection knob
_BODY_PPM = False  # debug bisection knob


def _round_up(x, m):
    return (x + m - 1) // m * m


def _ppm_kernel(M_ref, q_ref, mask_ref, z_ref, ok_ref, *, n: int, max_piv: int):
    _ppm_kernel_impl(M_ref[0], q_ref[0], mask_ref[0], None,
                     lambda zr: z_ref.__setitem__(0, zr),
                     lambda okv: ok_ref.__setitem__(0, okv),
                     n=n, max_piv=max_piv)


def _ppm_warm_kernel(M_ref, q_ref, mask_ref, z0_ref, z_ref, ok_ref, *,
                     n: int, max_piv: int):
    """Warm-started single-problem variant (ungridded): `jax.vmap`'s pallas
    batching rule lifts it to a batched grid — the entry the per-scenario
    impact solve uses. Warm start seeds the nonbasic set from |z0| >= ztol,
    the `_zlast` warm start of the reference QP handler
    (src/ImpactConstraintHandlerQP.cpp:160-162)."""
    _ppm_kernel_impl(M_ref[...], q_ref[...], mask_ref[...], z0_ref[...],
                     lambda zr: z_ref.__setitem__(..., zr),
                     lambda okv: ok_ref.__setitem__(..., okv),
                     n=n, max_piv=max_piv)


def _ppm_kernel_impl(M, q_row, mask_row, z0_row, write_z, write_ok, *,
                     n: int, max_piv: int):
    dtype = M.dtype
    valid_row = mask_row > 0              # (1, n)

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
    if z0_row is not None:
        # warm start: seed the nonbasic set from the previous solution
        # (boolean any() is an unsupported lane broadcast — float-sum reduce)
        z0c = row_to_col(z0_row)
        warm = (jnp.abs(z0c) >= ztol) & valid
        any_warm = jnp.sum(warm.astype(dtype)) > 0.0
        nonbas0 = (warm & any_warm) | (nonbas0 & jnp.logical_not(any_warm))
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
    write_z(col_to_row(z_out))
    write_ok(jnp.zeros((1, 1), jnp.int32) + jnp.where(done, 1, 0))


def ppm_lcp_one(M, q, mask, z0=None, max_piv: int | None = None,
                interpret: bool = False):
    """Solve ONE LCP with the warm-started PPM Pallas kernel. M (n, n),
    q (n,), mask (n,) bool -> (z (n,), done ()).

    `jax.vmap` lifts the call to a batched grid where every problem runs
    exactly its own pivot count (no lock-step straggler serialization).
    `done` is the kernel's own convergence flag; callers verify the solution
    (complementarity residual) before accepting — `solve_lcp` routes failures
    to the XLA cascade, skip-gated."""
    n = q.shape[0]
    npad = _round_up(max(n, 8), LANE)
    dtype = M.dtype
    if max_piv is None:
        max_piv = 2 * n + 8
    if z0 is None:
        z0 = jnp.zeros(n, dtype)

    Mp = jnp.zeros((npad, npad), dtype).at[:n, :n].set(M)
    qp = jnp.zeros((1, npad), dtype).at[0, :n].set(q)
    mp = jnp.zeros((1, npad), jnp.int32).at[0, :n].set(mask.astype(jnp.int32))
    zp = jnp.zeros((1, npad), dtype).at[0, :n].set(z0)

    kernel = partial(_ppm_warm_kernel, n=npad, max_piv=max_piv)
    z, ok = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, npad), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(Mp, qp, mp, zp)
    return z[0, :n], ok[0, 0] > 0


def _bpp_kernel(M_ref, q_ref, mask_ref, z0_ref, z_ref, ok_ref, *, n: int,
                max_bpp: int, max_piv: int, p_budget: int = 3):
    _bpp_kernel_body(
        M_ref[0], q_ref[0], mask_ref[0], z0_ref[0],
        lambda z_col: z_ref.__setitem__(0, z_col),
        lambda ok_v: ok_ref.__setitem__(0, ok_v),
        n=n, max_bpp=max_bpp, max_piv=max_piv, p_budget=p_budget,
    )


def _bpp_kernel_single(M_ref, q_ref, mask_ref, z0_ref, z_ref, ok_ref, *,
                       n: int, max_bpp: int, max_piv: int, p_budget: int = 3):
    """Ungridded single-problem variant: vmap's pallas batching rule lifts it
    to a batched grid, which is how the per-scenario impact solve (called
    under `jax.vmap` in the stepper) reaches the kernel."""
    _bpp_kernel_body(
        M_ref[...], q_ref[...], mask_ref[...], z0_ref[...],
        lambda z_col: z_ref.__setitem__(..., z_col),
        lambda ok_v: ok_ref.__setitem__(..., ok_v),
        n=n, max_bpp=max_bpp, max_piv=max_piv, p_budget=p_budget,
    )


def _bpp_kernel_body(M, q_col, mask_col, z0_col, write_z, write_ok, *, n: int,
                     max_bpp: int, max_piv: int, p_budget: int = 3):
    """Block principal pivoting (Júdice–Pires) with PPM fallback, one LCP per
    grid program, fully VMEM-resident.

    Stage 1 — BPP: every iteration solves the F-masked principal system by a
    branchless Gauss–Jordan sweep and swaps *all* violating indices at once;
    converges in a handful of iterations for the monotone QP-derived impact
    LCPs (reference model: `ImpactConstraintHandlerQP::solve_qp_work`
    src/ImpactConstraintHandlerQP.cpp:94-263, solved here without the
    lock-step batch serialization of a vmapped `lax.while_loop` — each grid
    program runs exactly its own iteration count). Murty's least-index rule
    kicks in when the infeasibility count stops decreasing (finiteness).

    Stage 2 — PPM (the reference's `lcp_fast` pivot rule, src/LCP.cpp:41)
    warm-started from BPP's final basis, for the rare BPP non-convergence.

    The returned ok flag is a full complementarity verification (z >= -tol,
    w >= -tol, |z∘w| <= tol over active slots), so callers can route failures
    to the XLA Lemke cascade with everything else skip-gated.

    Warm start: basis seeded from |z0| >= ztol (the `_zlast` warm start of the
    reference QP handler). An all-false mask row is a trivially-solved empty
    problem (used for skip gating).
    """
    dtype = M.dtype

    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye_b = rows == cols

    def col_to_row(x_col):
        return jnp.sum(jnp.where(eye_b, x_col, 0.0), axis=0, keepdims=True)

    # COLUMN I/O throughout: converting (1, n) row inputs via the masked
    # diagonal reduction was the Mosaic "Lane broadcast" trigger — the
    # identical loop body compiles with native (n, 1) inputs but fails when
    # its operands are row-sourced (bisected 2026-08-22 via
    # /tmp-style standalone probes; the PPM body tolerates the row form,
    # the BPP flag algebra does not).
    q = q_col                                                # (n, 1)
    valid = mask_col > 0                                     # (n, 1)
    z0 = z0_col
    valid_row = col_to_row(valid.astype(dtype)) > 0          # (1, n)

    eps = jnp.asarray(np.finfo(np.dtype(dtype)).eps, dtype)
    vout = valid & valid_row
    rowsum = jnp.sum(jnp.abs(jnp.where(vout, M, 0.0)), axis=1, keepdims=True)
    norminf = jnp.max(jnp.where(valid, rowsum, 0.0))
    m_active = jnp.sum(valid.astype(dtype))
    ztol = m_active * norminf * eps
    check_tol = m_active * norminf * jnp.sqrt(eps)

    ridx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    qv = jnp.where(valid, q, 1.0)
    Mp = jnp.where(vout, M, 0.0) + jnp.where(
        eye_b & (~valid_row), jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype)
    )

    def first_min(v, sel):
        vm = jnp.where(sel, v, jnp.inf)
        mn = jnp.min(vm)
        is_min = (vm == mn) & sel
        first_idx = jnp.min(jnp.where(is_min, ridx, jnp.int32(n)))
        return ridx == first_idx, mn

    def solve_masked(nb):
        """Branchless Gauss–Jordan of the nb-masked system A z = -q."""
        nb_row = col_to_row(nb.astype(dtype)) > 0
        nbout = nb & nb_row
        A = jnp.where(nbout, Mp, 0.0) + jnp.where(
            eye_b & (~nb_row),
            jnp.asarray(1.0, dtype),
            jnp.asarray(0.0, dtype),
        )
        b = jnp.where(nb, -qv, 0.0)

        def gj_step(k, carry):
            A, b = carry
            rmask = ridx == k
            kcol = cols == k
            pivot = jnp.sum(jnp.where(rmask & kcol, A, 0.0))
            piv_ok = jnp.abs(pivot) > 1e-30
            inv_p = 1.0 / jnp.where(piv_ok, pivot, 1.0)
            prow = jnp.sum(jnp.where(rmask, A, 0.0), axis=0, keepdims=True) * inv_p
            pb = jnp.sum(jnp.where(rmask, b, 0.0)) * inv_p
            col = jnp.sum(jnp.where(kcol, A, 0.0), axis=1, keepdims=True)
            factor = jnp.where(rmask, 0.0, col)
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

    if _STOP_AFTER == 0:  # debug bisection: preamble only
        write_z(qv)
        write_ok(jnp.zeros((1, 1), jnp.int32))
        return

    # ---- stage 1: BPP ----
    # boolean any() lowers to an unsupported lane broadcast on Mosaic; use
    # float-sum reductions instead
    warm = (jnp.abs(z0) >= ztol) & valid
    cold = (qv < -ztol) & valid
    any_warm = jnp.sum(warm.astype(dtype)) > 0.0
    F0 = (warm & any_warm) | (cold & jnp.logical_not(any_warm))
    trivial = jnp.sum(F0.astype(dtype)) == 0.0

    def bpp_body(carry):
        F_i, z, done_i, it, ninf_i, p_i = carry
        F = F_i > 0
        z_nb = solve_masked(F)
        bas = valid & jnp.logical_not(F)
        w = jnp.where(
            bas, jnp.dot(Mp, z_nb, preferred_element_type=dtype) + qv, 0.0
        )
        if _BODY_PPM:  # debug bisection: run ppm update logic in this body
            wmask, minw = first_min(w, bas)
            zmask, minz = first_min(z_nb, F)
            w_ok = minw > -ztol
            z_neg = minz < -ztol
            solved1 = w_ok & jnp.logical_not(z_neg)
            F2 = (F | (wmask & jnp.logical_not(w_ok))) & jnp.logical_not(
                zmask & z_neg)
            F_o = (F & solved1) | (F2 & jnp.logical_not(solved1))
            return (F_o.astype(jnp.int32), z_nb,
                    jnp.where(solved1, jnp.int32(1), jnp.int32(0)),
                    it + 1, ninf_i, p_i)
        H1 = F & (z_nb < -ztol)
        H2 = bas & (w < -ztol)
        viol = H1 | H2
        # keep EVERY derived scalar in float: the original int algebra here
        # (float-reduce .astype(int32), int compares/where/maximum on the
        # infeasibility and Murty-budget counters) was what Mosaic rejected
        # with "Not implemented: Lane broadcast" (r4 bisection; the PPM body
        # below, whose scalars are float comparisons, always compiled)
        ninf = jnp.sum(viol.astype(dtype))
        solved = ninf == 0.0

        improved = ninf < ninf_i
        p_next = jnp.where(improved, jnp.asarray(float(p_budget), dtype),
                           p_i - 1.0)

        if _NO_MURTY:
            H1e, H2e = H1, H2
        else:
            fidx = jnp.min(jnp.where(viol, ridx.astype(dtype),
                                     jnp.asarray(float(n), dtype)))
            single = (ridx.astype(dtype) == fidx) & viol
            use_block = p_next > 0.0
            H1e = (H1 & use_block) | (single & H1 & jnp.logical_not(use_block))
            H2e = (H2 & use_block) | (single & H2 & jnp.logical_not(use_block))
        F_next = (F & jnp.logical_not(H1e)) | H2e
        F_out = (F & solved) | (F_next & jnp.logical_not(solved))
        return (
            F_out.astype(jnp.int32),
            z_nb,
            jnp.where(solved, jnp.int32(1), jnp.int32(0)),
            it + 1,
            jnp.where(improved, ninf, ninf_i),
            jnp.maximum(p_next, jnp.asarray(0.0, dtype)),
        )

    def bpp_cond(carry):
        F_i, z, done_i, it, ninf_i, p_i = carry
        return (done_i == 0) & (it < max_bpp)

    zq = jnp.zeros((n, 1), dtype)
    F_f, z_bpp, bpp_done_i, _, _, _ = jax.lax.while_loop(
        bpp_cond,
        bpp_body,
        (
            F0.astype(jnp.int32),
            zq,
            jnp.where(trivial, jnp.int32(1), jnp.int32(0)),
            jnp.int32(0),
            jnp.asarray(float(n + 1), dtype),
            jnp.asarray(float(p_budget), dtype),
        ),
    )
    bpp_done = bpp_done_i > 0

    if _STOP_AFTER == 1:  # debug bisection: BPP only
        write_z(jnp.where(valid, z_bpp, 0.0))
        write_ok(jnp.zeros((1, 1), jnp.int32) + jnp.where(bpp_done, 1, 0))
        return

    # ---- stage 2: PPM from BPP's final basis (only when BPP failed) ----
    def ppm_body(carry):
        nonbas_i, z, done_i, piv = carry
        nonbas = nonbas_i > 0
        z_nb = solve_masked(nonbas)
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
        nonbas_next = (nonbas & solved) | (nonbas2 & jnp.logical_not(solved))
        return (
            nonbas_next.astype(jnp.int32),
            z_nb,
            jnp.where(solved, jnp.int32(1), jnp.int32(0)),
            piv + 1,
        )

    def ppm_cond(carry):
        nonbas_i, z, done_i, piv = carry
        return (done_i == 0) & (piv < max_piv)

    _, z_ppm, ppm_done_i, _ = jax.lax.while_loop(
        ppm_cond,
        ppm_body,
        (
            F_f,
            z_bpp,
            jnp.where(bpp_done, jnp.int32(1), jnp.int32(0)),
            jnp.int32(0),
        ),
    )
    done = ppm_done_i > 0
    z_out = jnp.where(bpp_done, z_bpp, z_ppm)
    z_out = jnp.where(valid & jnp.logical_not(trivial) & done, z_out, 0.0)

    if _STOP_AFTER == 2:  # debug bisection: no verification
        write_z(z_out)
        write_ok(jnp.zeros((1, 1), jnp.int32) + jnp.where(done, 1, 0))
        return

    # ---- full verification (the `_verify` of the XLA cascade) ----
    w_all = jnp.where(
        valid, jnp.dot(Mp, z_out, preferred_element_type=dtype) + qv, 0.0
    )
    zw = z_out * w_all
    ver = (
        jnp.min(jnp.where(valid, z_out, 0.0)) >= -check_tol
    ) & (
        jnp.min(jnp.where(valid, w_all, 0.0)) >= -check_tol
    ) & (jnp.max(jnp.abs(jnp.where(valid, zw, 0.0))) <= check_tol)
    ok = (done & ver) | trivial

    write_z(z_out)
    write_ok(jnp.zeros((1, 1), jnp.int32) + jnp.where(ok, 1, 0))


def bpp_lcp_one(M, q, mask, z0=None, max_bpp: int = 24,
                max_piv: int | None = None, interpret: bool = False):
    """Solve ONE LCP with the BPP+PPM Pallas kernel. M (n, n), q (n,),
    mask (n,) bool, z0 optional warm start -> (z (n,), ok ()).

    `jax.vmap` lifts the call to a batched grid — this is the entry the
    per-scenario impact pipeline uses."""
    n = q.shape[0]
    npad = _round_up(max(n, 8), LANE)
    dtype = M.dtype
    if max_piv is None:
        max_piv = 2 * n + 8
    if z0 is None:
        z0 = jnp.zeros(n, dtype)

    # column I/O (see _bpp_kernel_body: row-sourced operands trip a Mosaic
    # "Lane broadcast" in the BPP flag algebra)
    Mp = jnp.zeros((npad, npad), dtype).at[:n, :n].set(M)
    qp = jnp.zeros((npad, 1), dtype).at[:n, 0].set(q)
    mp = jnp.zeros((npad, 1), jnp.int32).at[:n, 0].set(mask.astype(jnp.int32))
    zp = jnp.zeros((npad, 1), dtype).at[:n, 0].set(z0)

    kernel = partial(_bpp_kernel_single, n=npad, max_bpp=max_bpp,
                     max_piv=max_piv)
    z, ok = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(Mp, qp, mp, zp)
    return z[:n, 0], ok[0, 0] > 0


def bpp_lcp_batched(Ms, qs, masks, z0s=None, max_bpp: int = 24,
                    max_piv: int | None = None, interpret: bool = False):
    """Solve B LCPs with the BPP+PPM Pallas kernel. Ms (B, n, n), qs (B, n),
    masks (B, n) bool, z0s optional (B, n) warm starts -> (z (B, n), ok (B,)).

    ok includes full complementarity verification; callers fall back to the
    XLA cascade for failures (skip-gated)."""
    B, n, _ = Ms.shape
    npad = _round_up(max(n, 8), LANE)
    dtype = Ms.dtype
    if max_piv is None:
        max_piv = 2 * n + 8
    if z0s is None:
        z0s = jnp.zeros((B, n), dtype)

    # column I/O (see _bpp_kernel_body)
    Mp = jnp.zeros((B, npad, npad), dtype).at[:, :n, :n].set(Ms)
    qp = jnp.zeros((B, npad, 1), dtype).at[:, :n, 0].set(qs)
    mp = jnp.zeros((B, npad, 1), jnp.int32).at[:, :n, 0].set(
        masks.astype(jnp.int32)
    )
    zp = jnp.zeros((B, npad, 1), dtype).at[:, :n, 0].set(z0s)

    kernel = partial(_bpp_kernel, n=npad, max_bpp=max_bpp, max_piv=max_piv)
    z, ok = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, npad, npad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, npad, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, npad, 1), dtype),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(Mp, qp, mp, zp)
    return z[:, :n, 0], ok[:, 0, 0] > 0


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
