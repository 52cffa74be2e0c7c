"""Record/replay + hoisted-linearization MPC paths (round-4 perf work).

Parity oracle, two tiers (round-5 fix of the r4 shipped-failing oracle):

1. BIT-EXACT: with `rr_warm_start=False` the record/replay machinery is a
   pure restructuring — the backward pass replays the rollout's own LCP
   solutions through the IFT pullback instead of re-running the pivoting
   solve — and must match the plain path to the last bit (measured drift
   0.0 on CPU x64). Same for hoist_linearization, which only batches the
   same Jacobians differently.
2. SOLVER-TOLERANCE: with the default `rr_warm_start=True` the rollout
   warm-starts each step's BPP from the previous step's (zlast,
   zlast_active) — the reference's `_zlast` machinery
   (/root/reference/src/ImpactConstraintHandlerQP.cpp:111-162). A
   warm-started pivot path terminates at a solution equal to the cold
   one only up to the LCP termination tolerance, so trajectories/costs
   drift at the ~1e-8-relative level (measured 9.8e-9). The tolerance
   here is set to 1e-6 to cover that expected, documented drift with
   margin; it is NOT a bug in the replay machinery (tier 1 proves that).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moby_tpu.core import scene as sc
from moby_tpu.math import quaternion as quat
from moby_tpu.mpc import contact_mpc
from moby_tpu.solvers import difflcp, lcp as lcp_mod


def ball_scene():
    b = sc.SceneBuilder()
    b.set_gravity([0, 0, -9.81])
    b.add_body("ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.5),
               pos=np.array([0.0, 0.0, 0.5]))
    b.add_body("ground", enabled=False)
    b.add_geom("ball", sc.SPHERE, [0.5])
    pq = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))
    b.add_geom("ground", sc.PLANE, [0.0], quat=pq)
    b.set_contact_params(
        "ground", "ball", sc.ContactParams(epsilon=0.0, mu_coulomb=0.5, nk=4)
    )
    return b.compile()


def run_modes(B=4, H=12, n_iters=3):
    scene, st = ball_scene()
    prob = contact_mpc.MPCProblem(scene=scene, template=st, dt=0.02, horizon=H)
    target = jnp.array([0.4, 0.0], st.pos.dtype)

    def cost(x, u):
        return 1e-4 * jnp.sum(u[:6] ** 2)

    def cost_final(x):
        return 50.0 * jnp.sum((x[0:2] - target) ** 2)

    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), st)
    dx = jnp.linspace(-0.1, 0.1, B)
    batched = batched.replace(pos=batched.pos.at[:, 0, 0].add(dx))

    outs = {}
    for name, kw in [
        ("plain", dict(record_replay=False)),
        ("rr_cold", dict(record_replay=True, rr_warm_start=False)),
        ("rr", dict(record_replay=True)),
        ("rr_hoist", dict(record_replay=True, hoist_linearization=True)),
        ("hoist", dict(record_replay=False, hoist_linearization=True)),
    ]:
        outs[name] = contact_mpc.solve_batch(
            prob, batched, cost, cost_final, n_iters=n_iters, **kw)
    return outs


class TestRecordReplayParity:
    def test_all_modes_identical(self):
        outs = run_modes()
        ref = outs["plain"]
        assert np.all(np.isfinite(np.asarray(ref.cost)))
        # the ball must actually be pushed (contacts engaged)
        assert float(np.asarray(ref.cost).max()) < 10.0
        # Tier 1: replay machinery is bit-exact when warm start is off
        # (the oracle for "identical Jacobians"; see module docstring).
        for name in ("rr_cold", "hoist"):
            np.testing.assert_allclose(
                np.asarray(outs[name].cost), np.asarray(ref.cost),
                rtol=1e-12, atol=0.0, err_msg=name)
            np.testing.assert_allclose(
                np.asarray(outs[name].us), np.asarray(ref.us),
                rtol=1e-10, atol=1e-12, err_msg=name)
        # Tier 2: warm-started rollouts drift at LCP-termination-tolerance
        # level (~1e-8 rel, measured; documented in module docstring).
        for name in ("rr", "rr_hoist"):
            np.testing.assert_allclose(
                np.asarray(outs[name].cost), np.asarray(ref.cost),
                rtol=1e-6, atol=1e-9, err_msg=name)
            np.testing.assert_allclose(
                np.asarray(outs[name].us), np.asarray(ref.us),
                rtol=1e-4, atol=1e-7, err_msg=name)


class TestLamScaleParity:
    def test_ball_push_cost_invariant_to_lam_scale(self, monkeypatch):
        """ADVICE r4: MOBY_MPC_LAM_SCALE=10 (stage-2 Tikhonov of the MPC
        LCP cascade) was cost-validated only on ur10. Oracle check on the
        second MPC scene (ball-push): stage 2 only fires for members whose
        unregularized stage-1 BPP verified-failed, so the default must not
        move costs on healthy problems — and when it does fire, the
        regularized solution must stay within solver-tolerance of the
        deep-rescue answer."""
        def one(lam):
            monkeypatch.setenv("MOBY_MPC_LAM_SCALE", lam)
            jax.clear_caches()  # env is read at trace time
            scene, st = ball_scene()
            prob = contact_mpc.MPCProblem(
                scene=scene, template=st, dt=0.02, horizon=10)
            target = jnp.array([0.4, 0.0], st.pos.dtype)
            B = 3
            batched = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (B,) + x.shape), st)
            dx = jnp.linspace(-0.1, 0.1, B)
            batched = batched.replace(pos=batched.pos.at[:, 0, 0].add(dx))
            out = contact_mpc.solve_batch(
                prob, batched,
                lambda x, u: 1e-4 * jnp.sum(u[:6] ** 2),
                lambda x: 50.0 * jnp.sum((x[0:2] - target) ** 2),
                n_iters=3, record_replay=False)
            return np.asarray(out.cost)

        c10 = one("10.0")
        c1 = one("1.0")
        jax.clear_caches()
        np.testing.assert_allclose(c10, c1, rtol=1e-6, atol=1e-9)


class TestCompactedIFT:
    def test_compact_pullback_matches_full(self, monkeypatch):
        """The NA-compacted IFT inverse must reproduce the full masked
        inverse's pullback exactly when the active set fits the cap, and
        poison (NaN) when it does not."""
        monkeypatch.setattr(lcp_mod, "_GJ_OVERRIDE", True)
        monkeypatch.setenv("MOBY_IFT_COMPACT_NA", "16")
        rng = np.random.RandomState(0)
        n = 64
        G = rng.randn(n, n)
        M = jnp.asarray(G @ G.T + n * np.eye(n))
        mask = jnp.asarray(rng.rand(n) < 0.8)
        # a z with 10 positive entries (fits NA=16)
        z = jnp.asarray(np.where(rng.rand(n) < 10 / n, rng.rand(n) + 0.1, 0.0))
        z = jnp.where(mask, z, 0.0)
        zbar = jnp.asarray(rng.randn(n))

        act_c, res_c = difflcp._prep_bwd(M, z, mask)
        assert isinstance(res_c, tuple), "compaction should engage at n=64"
        Mbar_c, qbar_c = difflcp._ift_bwd(act_c, res_c, z, zbar)

        monkeypatch.setenv("MOBY_IFT_COMPACT_NA", str(n + 1))
        # cap >= n disables compaction entirely -> full inverse
        act_f, res_f = difflcp._prep_bwd(M, z, mask)
        assert not isinstance(res_f, tuple)
        Mbar_f, qbar_f = difflcp._ift_bwd(act_f, res_f, z, zbar)

        np.testing.assert_allclose(
            np.asarray(qbar_c), np.asarray(qbar_f), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(Mbar_c), np.asarray(Mbar_f), rtol=1e-5, atol=1e-7)

    def test_capped_bpp_matches_full(self, monkeypatch):
        """lcp_bpp with a working-set cap must produce the same solution as
        the full-width solve on PD LCPs (unique z), including when the cold
        start has more violations than the cap (capped seeding + capped
        block swaps converge to the same point)."""
        monkeypatch.setattr(lcp_mod, "_GJ_OVERRIDE", True)
        rng = np.random.RandomState(2)
        n = 88
        for qscale in (1.0, 5.0):
            G = rng.randn(n, 12)
            M = jnp.asarray(G @ G.T + 0.1 * np.eye(n))
            q = jnp.asarray(rng.randn(n) - qscale)   # many negatives
            mask = jnp.ones(n, bool)
            z_f, ok_f = lcp_mod.lcp_bpp(M, q, mask, max_iters=64)
            z_c, ok_c = lcp_mod.lcp_bpp(M, q, mask, max_iters=64, na_cap=48)
            assert bool(ok_f)
            if bool(ok_c):
                np.testing.assert_allclose(
                    np.asarray(z_c), np.asarray(z_f), rtol=1e-6, atol=1e-8)
            # capped solve never returns an unverified "solution": LCP
            # conditions hold whenever it reports ok
            if bool(ok_c):
                w = np.asarray(M @ z_c + q)
                zc = np.asarray(z_c)
                assert (zc > -1e-8).all() and (w > -1e-6).all()
                assert abs((zc * w)).max() < 1e-5

    def test_overflow_poisons_with_nan(self, monkeypatch):
        monkeypatch.setattr(lcp_mod, "_GJ_OVERRIDE", True)
        monkeypatch.setenv("MOBY_IFT_COMPACT_NA", "4")
        rng = np.random.RandomState(1)
        n = 64
        G = rng.randn(n, n)
        M = jnp.asarray(G @ G.T + n * np.eye(n))
        mask = jnp.ones(n, bool)
        z = jnp.asarray(rng.rand(n) + 0.1)  # 64 actives > cap 4
        act, res = difflcp._prep_bwd(M, z, mask)
        _, qbar = difflcp._ift_bwd(act, res, z, jnp.ones(n))
        assert np.all(np.isnan(np.asarray(qbar)[np.asarray(act)]))
