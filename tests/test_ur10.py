"""UR10 arm (SDF): loading, joint-limit respect, and the contact-MPC reach
task of the operational baseline (BASELINE.md configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moby_tpu.io import sdfio
from moby_tpu.sim import stepper, kinematics
from moby_tpu.mpc import contact_mpc

UR10 = "/root/reference/example/ur10/ur10/ur10.sdf"


@pytest.fixture(scope="module")
def ur10():
    return sdfio.load(UR10)


class TestUR10:
    def test_structure(self, ur10):
        scene, st, _ = ur10
        assert scene.nv_art == 6
        assert scene.n_limits == 12
        names = [l.name for l in scene.arts[0].model.links]
        assert "wrist_3_link" in names

    def test_gravity_sag_respects_limits(self, ur10):
        scene, st, _ = ur10
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.002))
        for _ in range(250):
            st = step_j(st)
        q = np.asarray(st.q_art)
        assert np.all(np.isfinite(q))
        lo = np.asarray(scene.lim_value)[~np.asarray(scene.lim_upper)]
        hi = np.asarray(scene.lim_value)[np.asarray(scene.lim_upper)]
        qlim = np.asarray(st.q_art)[np.asarray(scene.lim_q_idx)]
        viol_hi = qlim[np.asarray(scene.lim_upper)] - hi
        viol_lo = lo - qlim[~np.asarray(scene.lim_upper)]
        assert viol_hi.max() < 1e-2
        assert viol_lo.max() < 1e-2

    def test_mpc_reach(self, ur10):
        scene, st, _ = ur10
        ee_slot = [l.name for l in scene.arts[0].model.links].index("wrist_3_link")

        def ee_pos_of(q_art):
            s = st.replace(q_art=q_art)
            pt = kinematics.compute(scene, s)
            return pt.pos[ee_slot]

        p0 = np.asarray(ee_pos_of(st.q_art))
        target = jnp.asarray(p0 + np.array([-0.15, 0.1, 0.1]))

        dt = 0.01
        prob = contact_mpc.MPCProblem(scene=scene, template=st, dt=dt, horizon=20)

        nq = scene.nq_art

        def cost(x, u):
            ee = ee_pos_of(x[:nq])
            return (
                1e-6 * jnp.sum(u ** 2)
                + 0.01 * jnp.sum(x[nq:] ** 2)
                + 5.0 * jnp.sum((ee - target) ** 2)
            )

        def cost_final(x):
            ee = ee_pos_of(x[:nq])
            return 500.0 * jnp.sum((ee - target) ** 2) + 1.0 * jnp.sum(x[nq:] ** 2)

        # warm start with gravity-compensation torques (RNEA hold)
        from moby_tpu.dynamics import aba as art_dyn

        ent = scene.arts[0]
        tau_hold = art_dyn.rnea(
            ent.model, st.q_art, jnp.zeros(nq), jnp.zeros(nq), scene.gravity
        )
        us0 = jnp.tile(tau_hold[None, :], (prob.horizon, 1))

        res = contact_mpc.solve(prob, st, cost, cost_final, us0=us0, n_iters=15)
        ee_f = np.asarray(ee_pos_of(res.xs[-1][:nq]))
        err = np.linalg.norm(ee_f - np.asarray(target))
        assert err < 0.05, f"reach error {err:.3f} m"


class TestUR10XMLScene:
    def test_full_xml_scene_loads(self):
        """The reference's full ur10.xml (arm via the <SDF> embed tag + the
        free block + DisabledPairs + mu=100 ContactParameters) compiles and
        produces sane narrow-phase output at the initial pose."""
        from moby_tpu.io import mobyxml
        from moby_tpu.sim import kinematics
        from moby_tpu.geometry import narrowphase as nph

        scene, st, opts = mobyxml.load(
            "/root/reference/example/ur10/ur10.xml"
        )
        assert scene.nb == 1                      # the block
        assert scene.nv_art == 9                  # arm + gripper dofs
        assert scene.use_noslip                   # mu-coulomb = 100
        assert scene.n_pairs > 0
        pt = kinematics.compute(scene, st)
        pd, con = nph.narrow_phase(
            scene, pt.pos, pt.quat, scene.contact_dist_thresh
        )
        assert np.all(np.isfinite(np.asarray(pd.dist)))
